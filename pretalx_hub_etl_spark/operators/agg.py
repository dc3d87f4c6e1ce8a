"""Aggregation operators beyond plain ``groupBy().agg()``.

Spark already plans partial (map-side) + final aggregation for every
``groupBy`` — that handles *data volume*. What it cannot fix alone is
*key skew in the final stage*: one hot key's partial results still all
land on one reducer. ``salted_two_level_agg`` is the standard fix —
spread each key over N salt buckets, aggregate, then aggregate the
buckets — for the aggregations where AQE's skew handling doesn't apply
(AQE splits skewed JOIN partitions, not aggregation state).

Only algebraic aggregates (reassociatable: sum/count/min/max, and avg as
sum+count) can be two-leveled; holistic ones (exact median, distinct
lists) cannot — use their approximate forms at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (first-level expr builder, second-level combiner) per supported agg.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    # decomposes ONLY because the salt is a hash of the full row: equal
    # (keys, value) rows collocate in one bucket, so per-bucket distinct
    # sets are disjoint and their counts SUM. Guarded below: any column
    # outside keys∪agg-inputs would scatter equal values across buckets
    # and double-count.
    "count_distinct": (F.count_distinct, F.sum),
}


def salted_two_level_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-resistant groupBy: per-(key, salt) partials, then per-key final.

    ``aggs`` maps output column -> (agg_name, input_col) with agg_name in
    {sum, count, min, max, count_distinct}. Results are identical to the
    plain groupBy (integer/min/max exactly; float sums up to
    reassociation, same caveat as Spark's own partial aggregation) — but
    the hot key's rows spread over ``salt_buckets`` reducers in the wide
    first stage, and the second stage only sees ``buckets`` rows per key.

    For the purely algebraic aggs, Spark's own map-side partial
    aggregation already collapses a hot key to one partial row per map
    task — salting buys little there (measured in ``SKEW.json``). The
    case this operator exists for is ``count_distinct``: Spark plans it
    as a distinct-(key, value) stream re-shuffled ON THE KEY for the
    final count, so a key with millions of distinct values lands on ONE
    reducer — and AQE's skew handling splits only JOIN partitions, not
    aggregation partitions. The full-row salt partitions each key's
    distinct-value set disjointly across buckets, so bucket counts sum
    exactly. ``count_distinct`` therefore requires ``df`` to carry no
    columns beyond the keys and the aggregated columns (enforced).
    """
    unknown = {a for a, _ in aggs.values()} - set(_ALGEBRAIC)
    if unknown:
        raise ValueError(f"non-algebraic aggs not supported: {sorted(unknown)}")
    distinct_cols = {c for name, c in aggs.values() if name == "count_distinct"}
    if distinct_cols:
        # the disjointness argument needs equal (keys, value) rows to
        # share a bucket, i.e. the salt must be a function of EXACTLY
        # (keys, value): one distinct column, and no extra columns (a
        # second distinct column — or any other column — would scatter
        # equal values across buckets and double-count them)
        if len(distinct_cols) > 1:
            raise ValueError(
                "count_distinct under salting supports ONE distinct "
                f"column per call (got {sorted(distinct_cols)}): a salt "
                "spanning two value columns breaks per-bucket "
                "disjointness for both — run one call per column"
            )
        allowed = set(keys) | distinct_cols
        extra = set(df.columns) - allowed
        if extra:
            raise ValueError(
                "count_distinct under salting needs every df column in "
                f"keys∪{{distinct col}} (equal values must share a salt "
                f"bucket); drop {sorted(extra)} first"
            )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    level1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                _ALGEBRAIC[name][0](col).alias(out)
                for out, (name, col) in aggs.items()
            ]
        )
    )
    return level1.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[name][1](out).alias(out)
            for out, (name, _) in aggs.items()
        ]
    )


def exact_group_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    fractions: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    out_prefix: str = "p",
) -> DataFrame:
    """EXACT discrete quantiles per group: the value at rank
    ``max(1, ceil(q·n))`` in each group's sorted multiset.

    ``approx_percentile`` (A5) trades error bounds for one pass; this is
    the exact complement for when the quantile IS the contract (SLA
    latency percentiles, quality-score cut lines). Discrete (an actual
    element, like DuckDB's ``quantile_disc``/SQL ``percentile_disc``)
    rather than interpolated: no arithmetic on values, so integer inputs
    stay integers and the result carries a full value hash. The selected
    value at a rank is well-defined even when row_number breaks ties of
    equal values arbitrarily — rank k of a sorted multiset is the same
    element either way.

    Scale shape: ONE shuffle on the group key + a per-group sort (the
    window), then all fractions resolve in the same pass via conditional
    aggregation — k quantiles cost the same as one. Hot groups
    single-task the sort, the same skew story as any per-group window;
    for a global (ungrouped) exact quantile prefer range partitioning +
    partition-offset ranks.
    """
    from pyspark.sql import Window

    w_sort = Window.partitionBy(*group_cols).orderBy(F.col(value_col).asc())
    w_all = Window.partitionBy(*group_cols)
    r = (
        df.select(*group_cols, value_col)
        .withColumn("__rn", F.row_number().over(w_sort))
        .withColumn("__n", F.count(F.lit(1)).over(w_all))
    )
    aggs = []
    for q in fractions:
        target = F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.lit(q) * F.col("__n")).cast("long"),
        )
        label = f"{out_prefix}{round(q * 100):02d}"
        aggs.append(
            F.max(F.when(F.col("__rn") == target, F.col(value_col))).alias(label)
        )
    return r.groupBy(*group_cols).agg(*aggs)


def mad_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: float = 1.5,
) -> DataFrame:
    """Rows whose value deviates from the group median by more than
    ``k`` × the group's median absolute deviation (MAD).

    The robust outlier gate (Hampel filter family): unlike z-scores,
    median/MAD don't move when the outliers themselves get extreme, so
    the threshold is stable under contamination. Both medians are the
    DISCRETE rank-``ceil(n/2)`` element (no interpolation), so integer
    inputs flow through exactly and the operator carries a full value
    hash.

    Scale shape: ONE shuffle. The median is computed as a windowed
    conditional max over the rank (no join-back), the absolute deviation
    rides the same partitioning, and the MAD's second rank window sorts
    within the SAME hash partitions — Catalyst plans sort-only (no
    Exchange) for the second window. Appends ``__med/__mad`` and returns
    the flagged rows.
    """
    from pyspark.sql import Window

    w_all = Window.partitionBy(*group_cols)
    w_v = Window.partitionBy(*group_cols).orderBy(F.col(value_col).asc())
    mid = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.lit(0.5) * F.count(F.lit(1)).over(w_all)).cast("long"),
    )
    with_med = df.withColumn(
        "__med",
        F.max(
            F.when(F.row_number().over(w_v) == mid, F.col(value_col))
        ).over(w_all),
    )
    dev = F.abs(F.col(value_col) - F.col("__med"))
    w_d = Window.partitionBy(*group_cols).orderBy(dev.asc())
    with_mad = with_med.withColumn(
        "__mad",
        F.max(F.when(F.row_number().over(w_d) == mid, dev)).over(w_all),
    )
    return with_mad.filter(dev > F.lit(k) * F.col("__mad"))


def exact_global_quantiles(
    df: DataFrame,
    value_col: str,
    fractions: Sequence[float] = (0.5, 0.9, 0.99),
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT global (ungrouped) discrete quantiles WITHOUT a global sort
    to one reducer.

    A global ``row_number() OVER (ORDER BY v)`` moves the whole column
    through a single partition — the classic scale-killer (Spark even
    warns "No Partition Defined for Window"). The distributed-exact
    algorithm instead:

    1. ``repartitionByRange`` on the value (sampled range boundaries,
       one shuffle — partitions hold disjoint value ranges in order);
    2. ``sortWithinPartitions`` (partition-local sort, no movement);
    3. per-partition row counts → driver-side prefix sums — a
       #partitions-sized list, never data;
    4. global rank = partition offset + local index (an Arrow-batched
       ``mapInPandas`` enumeration, zero shuffle);
    5. pick the rank-``max(1, ceil(q·n))`` element per fraction.

    Ties split across a range boundary don't matter: the value at a
    given rank of the sorted multiset is the same however equal values
    are ordered. Returns ``(fraction, value)`` rows.

    Precondition: ``value_col`` must be NULL-free (Spark ranks NULLs
    first, SQL oracles rank them last, and they inflate n — see
    :func:`exact_global_quantiles_cont`, which drops them instead;
    callers here feed derived non-null measures).
    """
    import pandas as pd

    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.select(F.col(value_col).alias("v"))
        .repartitionByRange(p, F.col("v"))
        .sortWithinPartitions("v")
    )
    ranged = ranged.persist()  # counted once, ranked once
    counts = {
        r.pid: r.cnt
        for r in ranged.groupBy(
            F.spark_partition_id().alias("pid")
        ).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    total = sum(counts.values())
    if total == 0:
        raise ValueError("exact_global_quantiles: empty input")
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    import math

    # two fractions can share a rank on small inputs: group by rank
    wanted: dict[int, list[float]] = {}
    for q in fractions:
        wanted.setdefault(max(1, math.ceil(float(q) * total)), []).append(
            float(q)
        )

    def pick(iterator):
        # partition-local enumeration: emits only the globally-wanted
        # ranks (at most len(fractions) rows per partition)
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        seen = 0
        for batch in iterator:
            n = len(batch)
            for rank, qs in wanted.items():
                local = rank - base - seen
                if 1 <= local <= n:
                    v = batch["v"].iloc[local - 1]
                    yield pd.DataFrame(
                        {"fraction": qs, "value": [v] * len(qs)}
                    )
            seen += n

    schema_v = dict(ranged.dtypes)["v"]
    out = ranged.mapInPandas(pick, schema=f"fraction double, value {schema_v}")
    return out


def global_row_number(
    df: DataFrame,
    order_cols: Sequence,
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """A 1-based global row number by ``order_cols`` WITHOUT the
    single-reducer global window.

    ``row_number() OVER (ORDER BY ...)`` funnels every row through one
    partition; this operator computes the identical column scale-safely
    (the same decomposition as :func:`exact_global_quantiles`):
    ``repartitionByRange`` on the order columns, partition-local sort,
    per-partition counts → driver-side prefix sums (#partitions values,
    never data), then each partition stamps ``offset + local index`` in
    one Arrow-batched pass. Total order requires ``order_cols`` to be a
    unique key tuple (append the primary key as tiebreak — same rule the
    window-function family documents); with ties the assignment within a
    tie group follows the range partitioner's placement.
    """
    import pandas as pd

    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = df.repartitionByRange(p, *cols).sortWithinPartitions(*cols)
    ranged = ranged.persist()  # counted once, stamped once
    counts = {
        r.pid: r.cnt
        for r in ranged.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = ", ".join(
        [f"`{name}` {dtype}" for name, dtype in ranged.dtypes]
        + [f"`{out_col}` bigint"]
    )

    def stamp(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        seen = 0
        for batch in iterator:
            n = len(batch)
            batch[out_col] = pd.RangeIndex(
                base + seen + 1, base + seen + n + 1
            ).astype("int64")
            seen += n
            yield batch

    return ranged.mapInPandas(stamp, schema=out_schema)


def exact_global_quantiles_cont(
    df: DataFrame,
    value_col: str,
    fractions: Sequence[float] = (0.5, 0.9, 0.99),
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT global INTERPOLATED (type-7 / numpy-linear) quantiles with
    the same scale-safe decomposition as :func:`exact_global_quantiles`.

    Discrete quantiles return an element of the multiset; the
    interpolated convention (numpy default, pandas, R type 7) blends the
    two elements bracketing rank ``h = (n-1)·q``:
    ``v_lo + (v_hi - v_lo) · (h - floor(h))``.  The bracketing RANKS and
    the blend fraction are driver-side constants (n comes from the
    per-partition counts already collected), so the data path is
    unchanged: range partition, local sort, offset-stamped rank pick of
    at most 2·|fractions| elements, then one pinned-double lerp per
    fraction.  Returns ``(fraction, value double)`` rows; an oracle
    replays the identical formula (never the engine's own
    ``quantile_cont`` — internal blend order differs).

    NULLs are dropped up front (the SQL-aggregate convention; numpy
    would propagate NaN instead): without the filter, Spark's range
    sort places NULLs FIRST while a SQL oracle's ORDER BY places them
    LAST, and NULL rows would inflate n — two silent rank shifts.
    Mirror the drop (``WHERE v IS NOT NULL``) in any oracle.
    """
    import math

    import pandas as pd

    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(value_col).alias("v"))
        .repartitionByRange(p, F.col("v"))
        .sortWithinPartitions("v")
    )
    # persist is LOAD-BEARING, not a cache hint: range-partition
    # boundaries come from a sample, so a recompute could re-draw them
    # and invalidate the partition offsets collected below. Do not
    # unpersist before the picked result is consumed.
    ranged = ranged.persist()  # counted once, picked once
    counts = {
        r.pid: r.cnt
        for r in ranged.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    total = sum(counts.values())
    if total == 0:
        raise ValueError("exact_global_quantiles_cont: empty input")
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    # per fraction: bracketing 1-based ranks + blend fraction (driver
    # constants; h computed in the same double expression the oracle uses)
    plan: dict[float, tuple[int, int, float]] = {}
    wanted: dict[int, list[tuple[float, str]]] = {}
    for q in fractions:
        h = (total - 1) * float(q)
        lo = int(math.floor(h)) + 1
        hi = min(lo + 1, total)
        frac = h - math.floor(h)
        plan[float(q)] = (lo, hi, frac)
        wanted.setdefault(lo, []).append((float(q), "lo"))
        if hi != lo:
            wanted.setdefault(hi, []).append((float(q), "hi"))

    def pick(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        seen = 0
        for batch in iterator:
            n = len(batch)
            for rank, tags in wanted.items():
                local = rank - base - seen
                if 1 <= local <= n:
                    v = batch["v"].iloc[local - 1]
                    yield pd.DataFrame(
                        {
                            "fraction": [t[0] for t in tags],
                            "kind": [t[1] for t in tags],
                            "value": [v] * len(tags),
                        }
                    )
            seen += n

    schema_v = dict(ranged.dtypes)["v"]
    picked = ranged.mapInPandas(
        pick, schema=f"fraction double, kind string, value {schema_v}"
    )
    pivoted = picked.groupBy("fraction").agg(
        F.max(F.when(F.col("kind") == "lo", F.col("value"))).alias("v_lo"),
        F.max(F.when(F.col("kind") == "hi", F.col("value"))).alias("v_hi"),
    )
    # hi absent (h integral or q == 1): blend collapses to v_lo
    frac_lit = F.element_at(
        F.create_map(
            *[
                x
                for q, (_, _, fr) in plan.items()
                for x in (F.lit(q), F.lit(fr))
            ]
        ),
        F.col("fraction"),
    )
    v_lo = F.col("v_lo").cast("double")
    v_hi = F.coalesce(F.col("v_hi"), F.col("v_lo")).cast("double")
    return pivoted.select(
        "fraction", (v_lo + (v_hi - v_lo) * frac_lit).alias("value")
    )


def histogram_quantile_rollup(
    df: DataFrame,
    cents_col: str,
    width_cents: int,
    q_pcts: list[int],
    partial_col: str | None = None,
) -> DataFrame:
    """Equi-width-histogram quantile estimation as a MERGEABLE rollup:
    ``(q_pct, est_cents)`` — for each requested percentage the lower
    edge of the first histogram bin whose cumulative count reaches
    ``ceil(q_pct% · total)``.

    The re-aggregatable-summary pattern (the exact-count sibling of the
    HLL rollup A5b and the bitmap rollup A14): the corpus-sized scan
    produces PARTIAL per-``partial_col`` histograms (one map-side-
    combined shuffle — at 100 TB these are the per-day / per-partition
    summaries a pipeline stores), the partials MERGE by summing bin
    counts (associative + commutative, so summaries roll up across
    days without re-scanning the corpus), and quantiles finalize from
    the merged cumulative counts — a bins-sized window, never a
    corpus-sized sort. Estimation error is bounded by the bin width
    (choose width per the value range / accuracy contract); the
    deterministic integer formulation (exact cents, floor-division
    binning, ``cum·100 ≥ q·total`` integer comparison) makes the
    estimate bit-identical across engines — no float quantile
    interpolation.
    """
    from pyspark.sql import Window

    parts = [F.col(partial_col)] if partial_col else []
    binned = df.select(
        *parts,
        ((F.col(cents_col) - F.pmod(F.col(cents_col), F.lit(width_cents)))
         / F.lit(width_cents)).cast("long").alias("bin"),
    )
    # partial per-partition histograms (stored summaries at scale) ...
    partial = binned.groupBy(*(parts + [F.col("bin")])).agg(
        F.count(F.lit(1)).alias("n")
    )
    # ... merged by summing counts: bins-sized, not corpus-sized
    merged = partial.groupBy("bin").agg(F.sum("n").alias("n"))
    wcum = Window.orderBy(F.col("bin").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = merged.select(
        "bin",
        F.sum("n").over(wcum).cast("long").alias("cum"),
        F.sum("n").over(Window.partitionBy()).cast("long").alias("total"),
    )
    # the requested percentages attach as an exploded literal array (a
    # generator over the bins-sized frame — no join operator at all, so
    # no BroadcastNestedLoopJoin for the plan sweep to flag)
    qs = F.explode(
        F.array(*[F.lit(int(q)).cast("long") for q in q_pcts])
    ).alias("q_pct")
    return (
        cum.select(qs, "bin", "cum", "total")
        .filter(F.col("cum") * 100 >= F.col("q_pct") * F.col("total"))
        .groupBy("q_pct")
        .agg((F.min("bin") * width_cents).cast("long").alias("est_cents"))
    )


def salted_group_topk(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    k: int,
    tiebreak: Sequence[str] = (),
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-resistant EXACT top-k per group, two-phase (the window
    sibling of :func:`salted_two_level_agg` / ``joins.salted_join``).

    A plain ``row_number() OVER (PARTITION BY keys ORDER BY ...)``
    ships each key's ENTIRE row set to one reducer and sorts it there —
    with few/hot groups (five event types over a 100 TB table ⇒ ~20 TB
    on one task) that single sort is the job. Neither AQE (skew splits
    cover joins, and a window partition cannot be split without
    breaking rank semantics) nor map-side combine (windows have none)
    helps.

    Phase 1 ranks within ``(keys, salt)`` — salt from a hash of the
    tiebreak columns (ANY assignment preserves exactness, see below,
    so when ``tiebreak`` is empty the salt widens to a hash of EVERY
    column: salting on ``order_col`` alone would send all heavy ties
    on the order value to one bucket and silently degrade to the
    plain-window behavior the operator exists to avoid; salt
    effectiveness therefore tracks the cardinality of the salted
    columns, and result *uniqueness* still requires a real
    ``tiebreak``, exactly as the plain window does) — and keeps k per
    bucket;
    the exactness argument is containment: every global top-k row lives
    in SOME bucket and is necessarily within that bucket's local top-k,
    so the union of per-bucket top-ks (≤ salt_buckets·k rows per key)
    contains the answer. Phase 2 re-ranks that bounded set per key.
    Reducer input drops from rows-per-key to rows-per-(key,bucket) in
    the wide stage and to salt_buckets·k rows in the final stage.
    Ties must be broken deterministically (``tiebreak``) for the result
    to be unique — the same requirement the plain window has.
    """
    from pyspark.sql import Window

    order = [F.col(order_col).desc()] + [F.col(c).asc() for c in tiebreak]
    # no tiebreak -> salt on the whole row, not order_col: hashing the
    # order value alone maps every tied hot row to ONE bucket (skew
    # mitigation silently off); the containment proof is salt-agnostic.
    salt_cols = list(tiebreak) if tiebreak else list(df.columns)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in salt_cols]),
        F.lit(salt_buckets),
    ).alias("__salt")
    w1 = Window.partitionBy(*keys, "__salt").orderBy(*order)
    stage1 = (
        df.select("*", salt)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__salt", "__r1")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        stage1.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
    )
