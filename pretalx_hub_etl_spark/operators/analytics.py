"""DataFrame-in/DataFrame-out bodies for the AN-family analytics queries.

Round-5 ADVICE: the unit tests re-implemented the query algebra inline on
literal frames, so a regression in a query body would pass unit tests and
only surface in the driver's oracle harness.  These helpers are the single
implementation — the ``@query`` wrappers in ``queries/analytics_q.py``
bind them to the parquet catalog, and ``tests/test_analytics.py`` calls
them directly on literal frames (the ``bigram_nll_scores`` pattern,
``llm/text.py``).

Scale notes live on each helper; the query docstrings keep the
per-query oracle-parity notes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def weekly_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention matrix from ``(user_id, ts)`` events.

    cohort = Monday of the user's FIRST active week; cell (cohort, k) =
    users of that cohort active k weeks later, plus cohort_size and the
    retention ratio.  Shape: one corpus shuffle for the (user, week)
    distinct, one user-keyed window shuffle for cohort_week, then all
    window math over the aggregated matrix (data-size-independent).
    """
    weekly = events.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    wu = Window.partitionBy("user_id")
    c = weekly.withColumn("cohort_week", F.min("week").over(wu))
    a = c.groupBy(
        "cohort_week",
        F.floor(F.datediff(F.col("week"), F.col("cohort_week")) / F.lit(7))
        .cast("long")
        .alias("week_offset"),
    ).agg(F.count(F.lit(1)).alias("active_users"))
    wc = Window.partitionBy("cohort_week")
    size = F.max(
        F.when(F.col("week_offset") == 0, F.col("active_users"))
    ).over(wc)
    return a.select(
        "cohort_week",
        "week_offset",
        "active_users",
        size.alias("cohort_size"),
        (F.col("active_users").cast("double") / size.cast("double")).alias(
            "retention"
        ),
    )


def _hourly_spine(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Per-(event_type, hour) last observation + densified hourly spine.

    The in-hour pick is max_by over a (ts, event_id) struct — a
    DeclarativeAggregate with map-side partial merge, one corpus shuffle
    on a high-cardinality composite key.  The spine explodes each type's
    [min, max] observed hour range (G1's sequence+explode shape), so
    every gap row sits between two observed anchors.
    """
    hour = F.date_trunc("hour", "ts")
    hourly = events.groupBy(F.col("event_type"), hour.alias("hour")).agg(
        F.max_by("value", F.struct(F.col("ts"), F.col("event_id"))).alias(
            "v"
        )
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour"
        ),
    )
    return hourly, spine


def locf_fill(events: DataFrame) -> DataFrame:
    """Gap-fill + last-observation-carried-forward over the hourly spine.

    Input: ``(event_type, ts, event_id, value)`` rows.  Output one row
    per (event_type, spine hour) with the forward-filled value and an
    ``observed`` flag.  The LOCF window partitions by event_type over
    the AGGREGATED spine (|types| x |hours| rows), so the
    single-task-per-type concern on raw data does not apply.
    """
    hourly, spine = _hourly_spine(events)
    filled = spine.join(hourly, ["event_type", "hour"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        "event_type",
        "hour",
        F.last("v", ignorenulls=True).over(w).alias("value_locf"),
        F.col("v").isNotNull().alias("observed"),
    )


def interpolate_fill(events: DataFrame) -> DataFrame:
    """Linear interpolation over the same hourly spine as :func:`locf_fill`.

    Unobserved hours blend the surrounding observations by time
    fraction.  Spine bounds are per-type min/max OBSERVED hours, so
    every gap row has both anchors — no divide-by-zero edge.  The four
    anchor columns are two forward and two backward ignorenulls passes
    over the SAME (event_type, hour) sort — Catalyst shares one
    Exchange+Sort across the two Window operators.
    """
    hourly, spine = _hourly_spine(events)
    joined = spine.join(hourly, ["event_type", "hour"], "left")
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_hour = F.when(F.col("v").isNotNull(), F.col("hour"))
    anchored = joined.select(
        "event_type",
        "hour",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(obs_hour, ignorenulls=True).over(w_prev).alias("prev_h"),
        F.first("v", ignorenulls=True).over(w_next).alias("next_v"),
        F.first(obs_hour, ignorenulls=True).over(w_next).alias("next_h"),
    )
    num = (F.unix_timestamp("hour") - F.unix_timestamp("prev_h")).cast(
        "double"
    )
    den = (F.unix_timestamp("next_h") - F.unix_timestamp("prev_h")).cast(
        "double"
    )
    return anchored.select(
        "event_type",
        "hour",
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * (num / den)
        )
        .alias("value_interp"),
        F.col("v").isNotNull().alias("observed"),
    )


def basket_rules(baskets: DataFrame, min_support: int = 10) -> DataFrame:
    """Association rules over ``(okey, brand)`` basket membership rows.

    Input must already be DISTINCT (okey, item) pairs.  support_n =
    co-occurring baskets, confidence = P(b|a), lift = P(a,b)/(P(a)P(b)).
    The pair self-join is ON THE BASKET KEY (co-partitioned; quadratic
    term bounded by items-per-basket², never corpus²); pair and item
    counts map-side combine to |items|²-sized tables; every ratio casts
    exact BIGINTs to double BEFORE the cross-multiply (the PMI
    overflow lesson).
    """
    baskets = baskets.persist()
    nb = baskets.select("okey").distinct().agg(F.count(F.lit(1)).alias("n"))
    items = baskets.groupBy("brand").agg(F.count(F.lit(1)).alias("c"))
    a = baskets.select("okey", F.col("brand").alias("brand_a"))
    b = baskets.select("okey", F.col("brand").alias("brand_b"))
    pair = (
        a.join(b, "okey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("support_n"))
        .filter(F.col("support_n") >= min_support)
    )
    ia = items.select(
        F.col("brand").alias("brand_a"), F.col("c").alias("count_a")
    )
    ib = items.select(
        F.col("brand").alias("brand_b"), F.col("c").alias("count_b")
    )
    return (
        pair.join(F.broadcast(ia), "brand_a")
        .join(F.broadcast(ib), "brand_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "brand_a",
            "brand_b",
            "support_n",
            "count_a",
            "count_b",
            (F.col("support_n").cast("double") / F.col("count_a")).alias(
                "confidence"
            ),
            (
                F.col("support_n").cast("double")
                * F.col("n")
                / (F.col("count_a").cast("double") * F.col("count_b"))
            ).alias("lift"),
        )
    )


def corr_matrix_exact(
    df: DataFrame, cols: list[tuple[str, Column]]
) -> DataFrame:
    """All pairwise Pearson correlations of integer-quantized columns in
    ONE aggregation pass.

    ``cols`` maps short names to already-quantized integer Columns; the
    output has one ``corr_<a>_<b>`` column per (i < j) pair in input
    order.  All sums/squares/cross-products accumulate as exact BIGINTs
    in a single map-side-combined agg (one scan, one 1-row shuffle);
    correlations derive via the E[xy] − E[x]E[y] double form over the
    exact integers — the n·sxx − sx² integer form would overflow int64
    (see q_corr_matrix docstring).
    """
    names = [n for n, _ in cols]
    aggs = [F.count(F.lit(1)).alias("n")]
    for n, c in cols:
        aggs.append(F.sum(c).alias(f"s_{n}"))
    for i, (na, ca) in enumerate(cols):
        for nb_, cb in cols[i:]:
            aggs.append(F.sum(ca * cb).alias(f"s_{na}_{nb_}"))
    m = df.agg(*aggs)

    n = F.col("n")
    der = [m["n"].alias("n")]
    for na in names:
        der.append((F.col(f"s_{na}").cast("double") / n).alias(f"m_{na}"))
    for i, na in enumerate(names):
        for nb_ in names[i:]:
            der.append(
                (F.col(f"s_{na}_{nb_}").cast("double") / n).alias(
                    f"e_{na}_{nb_}"
                )
            )
    d = m.select(*der)

    out = [F.col("n")]
    for i, na in enumerate(names):
        for nb_ in names[i + 1 :]:
            cov = F.col(f"e_{na}_{nb_}") - F.col(f"m_{na}") * F.col(f"m_{nb_}")
            vx = F.col(f"e_{na}_{na}") - F.col(f"m_{na}") * F.col(f"m_{na}")
            vy = (
                F.col(f"e_{nb_}_{nb_}") - F.col(f"m_{nb_}") * F.col(f"m_{nb_}")
            )
            out.append(
                (cov / (F.sqrt(vx) * F.sqrt(vy))).alias(f"corr_{na}_{nb_}")
            )
    return d.select(*out)


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    bin_width: int,
    n_bins: int,
) -> DataFrame:
    """Population Stability Index between two integer-valued samples
    (AN16): the standard model/data-drift monitor for a feature column
    between a reference corpus version and the current one.

    Fixed-width binning on the integer value (``bin = min(v // width,
    n_bins - 1)``, negatives clamped to bin 0), add-one smoothing so
    empty bins stay finite, and the per-bin PSI term

        (p - q) * ln(p / q),  p = (ca+1)/(na+n_bins), q = (cb+1)/(nb+n_bins)

    quantized to exact micro-units BEFORE any cross-bin total (the
    micro-nat pattern of ``llm/text.py:bigram_nll_scores``): the output
    is per-bin exact BIGINTs — ``(bin, ref_n, cur_n, psi_micro)`` — and
    a consumer's total PSI is an order-independent integer sum. The ln
    argument is formed as the pinned double expression
    ``(ca1 * nb1) / (cb1 * na1)`` (exact BIGINT products < 2^53, one
    division), identical in any external SQL replay.

    Scale shape: one map-side-combined groupBy per side (n_bins rows
    out), a 1-row count broadcast per side, and an n_bins-sized
    full-outer merge — the corpus is scanned once per side, nothing
    else grows with data.
    """
    def side(df: DataFrame, out: str):
        # NULL values produce a NULL bin that never joins the spine, so
        # they must not count toward the side's total either (they would
        # silently deflate every bin's p/q) — drop them from BOTH the
        # bin counts and the denominator (round-7 advice).
        df = df.filter(F.col(value_col).isNotNull())
        # clamp then exact floor-division via the pmod trick (the
        # operators/graph.py _fdiv shape) — never a double cast: DuckDB
        # CAST(double AS BIGINT) rounds while Spark's truncates, the
        # classic one-ulp bin-edge trap. Oracle twin: `least(greatest(v,
        # 0), hi) // width` (DuckDB // is exact BIGINT floor division).
        v = F.least(
            F.greatest(F.col(value_col).cast("long"), F.lit(0)),
            F.lit((n_bins - 1) * bin_width),
        )
        b = ((v - F.pmod(v, F.lit(bin_width))) / F.lit(bin_width)).cast(
            "long"
        )
        counts = (
            df.select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(out))
        )
        total = df.agg(F.count(F.lit(1)).alias(f"{out}_total"))
        return counts, total

    ca, na = side(ref, "ref_n")
    cb, nb = side(cur, "cur_n")
    spine = ref.sparkSession.range(n_bins).select(F.col("id").alias("bin"))
    merged = (
        spine.join(ca, "bin", "left")
        .join(cb, "bin", "left")
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            "bin",
            F.coalesce(F.col("ref_n"), F.lit(0)).alias("ref_n"),
            F.coalesce(F.col("cur_n"), F.lit(0)).alias("cur_n"),
            "ref_n_total",
            "cur_n_total",
        )
    )
    ca1 = F.col("ref_n") + 1
    cb1 = F.col("cur_n") + 1
    na1 = F.col("ref_n_total") + F.lit(n_bins)
    nb1 = F.col("cur_n_total") + F.lit(n_bins)
    p = ca1.cast("double") / na1.cast("double")
    q = cb1.cast("double") / nb1.cast("double")
    ratio = (ca1 * nb1).cast("double") / (cb1 * na1).cast("double")
    term = (p - q) * F.log(ratio)
    return merged.select(
        "bin",
        "ref_n",
        "cur_n",
        F.floor(term * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("psi_micro"),
    )
