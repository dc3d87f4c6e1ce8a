"""Analytics batch 2 (round-8): robust / nonparametric statistics and
gaps-and-islands — Theil–Sen slope (AN21), CUSUM changepoint (AN22),
two-sample Kolmogorov–Smirnov (AN23), longest activity streak (W11).

Reference tie-in: none directly (the reference computes no statistics —
`main.py` hand-filters dict lists); these are the monitoring shapes a
100 TB corpus pipeline runs next to its drift/trend family (AN16–AN20).

Cross-engine determinism: everything is exact-integer. Slopes are
floor-quantized to micro-units BEFORE ordering (median of quantized
slopes — no float comparator anywhere); CUSUM is cross-multiplied to
clear the mean's division (D_k = n·prefix_k − k·total); KS distances
are kept as ``|n_t·F_base − n_base·F_t|`` scaled integers; argmax /
median element selection always carries a deterministic tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from . import query

# --- AN21: Theil–Sen robust slope (median of pairwise slopes) ---------------

_THEIL_SEN_ORACLE = """
WITH c AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
), win AS (
    SELECT user_id, ts, event_id, cents FROM c WHERE rn <= 12
), pairs AS (
    -- floor-quantized pairwise slope in micro-cents/second:
    -- floordiv(dv*1e6, dt) with a floor (not truncating) division.
    -- epoch() is floored PER TIMESTAMP before the difference: Spark's
    -- unix_timestamp truncates sub-second parts, while CAST(epoch(b)
    -- - epoch(a) AS BIGINT) would ROUND the fractional difference —
    -- off-by-one dt whenever the fractions straddle, which shifts the
    -- median slope (seen at sf0.001, user 8: dt 208815 vs 208816)
    SELECT a.user_id,
           (b.cents - a.cents) * 1000000 AS dvm,
           CAST(floor(epoch(b.ts)) - floor(epoch(a.ts)) AS BIGINT) AS dt
    FROM win a JOIN win b
      ON a.user_id = b.user_id AND a.ts < b.ts
), q AS (
    SELECT user_id,
           CAST((dvm - ((dvm % dt) + dt) % dt) / dt AS BIGINT)
               AS slope_micro
    FROM pairs
), ranked AS (
    SELECT user_id, slope_micro,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY slope_micro) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n_pairs
    FROM q
)
SELECT user_id, CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(slope_micro AS BIGINT) AS slope_micro_med
FROM ranked WHERE rn = (n_pairs + 1) // 2
"""


@query("q_trend_theil_sen", oracle=_THEIL_SEN_ORACLE)
def q_trend_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AN21: Theil–Sen estimator per user — the robust twin of the OLS
    # slope (AN18): median over all pairs i<j of (v_j−v_i)/(t_j−t_i),
    # insensitive to outliers that wreck least squares. Same bounded-
    # window production shape as Mann-Kendall (AN20): cap each user's
    # history at 12 events first, so the per-group pair join is ≤66
    # pairs regardless of history length — that cap is what keeps the
    # operator linear at 100 TB. Exactness: slopes are floor-quantized
    # to integer micro-cents/second BEFORE the median (floordiv via
    # pmod — Spark DIV truncates but the pmod subtraction makes the
    # numerator exactly divisible), and the median is the LOWER median
    # (element (n+1)//2 in slope order) — element selection, no
    # averaging, so the result is an exact integer on both engines.
    # Equal-timestamp pairs are excluded (slope undefined). Scale: one
    # user-keyed window shuffle + a user-keyed self-join with output
    # bounded by the cap, then one more user-keyed window for the
    # median — three stages sharing one partitioning.
    from ..functions.core import fixed_cents

    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    win = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            fixed_cents(F.col("value")).alias("cents"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 12)
        .drop("rn")
    )
    a, b = win.alias("a"), win.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.ts") < F.col("b.ts")),
    ).select(
        F.col("a.user_id").alias("user_id"),
        ((F.col("b.cents") - F.col("a.cents")) * F.lit(1000000)).alias(
            "dvm"
        ),
        (
            F.unix_timestamp(F.col("b.ts"))
            - F.unix_timestamp(F.col("a.ts"))
        ).alias("dt"),
    )
    slope = F.expr("(dvm - pmod(dvm, dt)) DIV dt").alias("slope_micro")
    q = pairs.select("user_id", slope)
    wr = Window.partitionBy("user_id").orderBy("slope_micro")
    ranked = q.select(
        "user_id",
        "slope_micro",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("user_id"))
        .alias("n_pairs"),
    )
    return ranked.filter(
        F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2)
    ).select(
        "user_id",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("slope_micro").cast("long").alias("slope_micro_med"),
    )


# --- AN22: CUSUM changepoint localization -----------------------------------

_CUSUM_ORACLE = """
WITH c AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
), win AS (
    SELECT user_id, ts, event_id, cents FROM c WHERE rn <= 16
), pref AS (
    SELECT user_id,
           row_number() OVER w AS k,
           sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS prefix,
           sum(cents) OVER (PARTITION BY user_id) AS total,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM win
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), d AS (
    SELECT user_id, k, n,
           abs(n * prefix - k * total) AS d_abs,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY abs(n * prefix - k * total) DESC,
                                       k ASC) AS pick
    FROM pref WHERE k < n
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       CAST(k AS BIGINT) AS cp_index, CAST(d_abs AS BIGINT) AS d_stat
FROM d WHERE pick = 1
"""


@query("q_changepoint_cusum", oracle=_CUSUM_ORACLE)
def q_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AN22: CUSUM changepoint localization per user — the classic
    # level-shift detector: over the last 16 events (time order), the
    # changepoint estimate is argmax_k |Σ_{i<=k}(v_i − mean)|. The
    # mean's division is cleared by cross-multiplication — D_k =
    # n·prefix_k − k·total — so the statistic stays an exact BIGINT
    # (cents × n, |D| < 16·16·10^7 ≪ 2^63); ties break to the smallest
    # k, and k = n is excluded (D_n ≡ 0 carries no information). Scale:
    # one user-keyed shuffle serves the cap window, the prefix sums,
    # and the argmax selection — the CUSUM recursion is just a running
    # sum, so what is sequential in the textbook is one window frame
    # here (cf. the rolling z-score AN19).
    from ..functions.core import fixed_cents

    ev = Catalog(spark, sf_dir).events
    wdesc = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    win = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            fixed_cents(F.col("value")).alias("cents"),
            F.row_number().over(wdesc).alias("rn"),
        )
        .filter(F.col("rn") <= 16)
        .drop("rn")
    )
    wasc = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = Window.partitionBy("user_id")
    pref = win.select(
        "user_id",
        F.row_number().over(wasc).alias("k"),
        F.sum("cents")
        .over(wasc.rowsBetween(Window.unboundedPreceding, 0))
        .alias("prefix"),
        F.sum("cents").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    d_abs = F.abs(
        F.col("n") * F.col("prefix") - F.col("k") * F.col("total")
    )
    d = pref.filter(F.col("k") < F.col("n")).select(
        "user_id",
        "k",
        "n",
        d_abs.alias("d_abs"),
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy(
                d_abs.desc(), F.col("k").asc()
            )
        )
        .alias("pick"),
    )
    return d.filter(F.col("pick") == 1).select(
        "user_id",
        F.col("n").cast("long").alias("n_events"),
        F.col("k").cast("long").alias("cp_index"),
        F.col("d_abs").cast("long").alias("d_stat"),
    )


# --- AN23: two-sample Kolmogorov–Smirnov distance ---------------------------

_KS_ORACLE = """
WITH ev AS (
    SELECT event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events
), base AS (
    SELECT cents FROM ev WHERE event_type = 'click'
), sides AS (
    SELECT t.event_type AS grp, b.cents, 0 AS side
    FROM (SELECT DISTINCT event_type FROM ev
          WHERE event_type <> 'click') t, base b
    UNION ALL
    SELECT event_type AS grp, cents, 1 AS side
    FROM ev WHERE event_type <> 'click'
), counts AS (
    SELECT grp, cents,
           sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS c0,
           sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1
    FROM sides GROUP BY grp, cents
), cum AS (
    SELECT grp, cents,
           sum(c0) OVER (PARTITION BY grp ORDER BY cents
                         ROWS UNBOUNDED PRECEDING) AS f0,
           sum(c1) OVER (PARTITION BY grp ORDER BY cents
                         ROWS UNBOUNDED PRECEDING) AS f1,
           sum(c0) OVER (PARTITION BY grp) AS n0,
           sum(c1) OVER (PARTITION BY grp) AS n1
    FROM counts
), dist AS (
    SELECT grp, cents, n0, n1,
           abs(n1 * f0 - n0 * f1) AS d_scaled,
           row_number() OVER (PARTITION BY grp
                              ORDER BY abs(n1 * f0 - n0 * f1) DESC,
                                       cents ASC) AS pick
    FROM cum
)
SELECT grp AS event_type, CAST(n0 AS BIGINT) AS n_base,
       CAST(n1 AS BIGINT) AS n_sample,
       CAST(d_scaled AS BIGINT) AS ks_scaled,
       CAST(cents AS BIGINT) AS ks_at_cents
FROM dist WHERE pick = 1
"""


@query("q_ks_two_sample", oracle=_KS_ORACLE)
def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AN23: two-sample Kolmogorov–Smirnov distance of each event type's
    # value distribution against the 'click' baseline — the
    # distribution-drift sibling of the binned PSI monitor (AN16): KS
    # needs no bin choice and is sensitive anywhere on the CDF. All-
    # integer: D = sup_x |F0(x) − F1(x)| is kept scaled as
    # |n1·cnt0(≤x) − n0·cnt1(≤x)| (the sup is attained at sample
    # points, so scanning distinct values is exact); ties in the sup
    # break to the smallest attaining value. Scale: pre-aggregate to
    # distinct (group, cents) BEFORE any window — the window then runs
    # over value-cardinality rows, not event rows — and the baseline
    # is fanned out per comparison group via a broadcast of the tiny
    # distinct-types frame (groups are few; the baseline replication
    # is groups × baseline, not a self-join).
    from ..functions.core import fixed_cents

    ev = Catalog(spark, sf_dir).events.select(
        "event_type", fixed_cents(F.col("value")).alias("cents")
    )
    types = (
        ev.select("event_type")
        .filter(F.col("event_type") != "click")
        .distinct()
        .withColumnRenamed("event_type", "grp")
    )
    base = ev.filter(F.col("event_type") == "click").crossJoin(
        F.broadcast(types)
    ).select("grp", "cents", F.lit(0).alias("side"))
    samp = ev.filter(F.col("event_type") != "click").select(
        F.col("event_type").alias("grp"), "cents", F.lit(1).alias("side")
    )
    counts = (
        base.unionByName(samp)
        .groupBy("grp", "cents")
        .agg(
            F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("c0"),
            F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("c1"),
        )
    )
    wc = (
        Window.partitionBy("grp")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("grp")
    cum = counts.select(
        "grp",
        "cents",
        F.sum("c0").over(wc).alias("f0"),
        F.sum("c1").over(wc).alias("f1"),
        F.sum("c0").over(wall).alias("n0"),
        F.sum("c1").over(wall).alias("n1"),
    )
    d_scaled = F.abs(
        F.col("n1") * F.col("f0") - F.col("n0") * F.col("f1")
    )
    dist = cum.select(
        "grp",
        "cents",
        "n0",
        "n1",
        d_scaled.alias("d_scaled"),
        F.row_number()
        .over(
            Window.partitionBy("grp").orderBy(
                d_scaled.desc(), F.col("cents").asc()
            )
        )
        .alias("pick"),
    )
    return dist.filter(F.col("pick") == 1).select(
        F.col("grp").alias("event_type"),
        F.col("n0").cast("long").alias("n_base"),
        F.col("n1").cast("long").alias("n_sample"),
        F.col("d_scaled").cast("long").alias("ks_scaled"),
        F.col("cents").cast("long").alias("ks_at_cents"),
    )


# --- AN24: exact integer EWMA (alpha = 1/2) ---------------------------------

_EWMA_ORACLE = """
WITH c AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rnd
    FROM events
), win AS (
    SELECT user_id, ts, event_id, cents,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM c WHERE rnd <= 16
), agg AS (
    SELECT user_id,
           count(*) AS k,
           sum(cents * (1::BIGINT << (rn - 1))) AS num
    FROM win GROUP BY user_id
)
SELECT user_id, CAST(k AS BIGINT) AS k,
       CAST(num AS BIGINT) AS ewma_num,
       CAST((1::BIGINT << k) - 1 AS BIGINT) AS ewma_den,
       CAST((num * 1000000 - ((num * 1000000 % ((1::BIGINT << k) - 1))
             + ((1::BIGINT << k) - 1)) % ((1::BIGINT << k) - 1))
            / ((1::BIGINT << k) - 1) AS BIGINT) AS ewma_micro
FROM agg
"""


@query("q_ewma", oracle=_EWMA_ORACLE)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AN24: exponentially-weighted moving average with alpha = 1/2 over
    # each user's last 16 events, EXACT: with a power-of-two decay the
    # weights are bit shifts, so the normalized finite-history EWMA
    #   Σ v_i·(1/2)^(k−i) / Σ (1/2)^(k−i)  =  Σ v_i·2^(i−1) / (2^k − 1)
    # is a ratio of two BIGINTs — numerator via shiftleft(cents, rn−1)
    # (≤ 2^15·10^7 ≪ 2^63), denominator 2^k − 1 — reported as the
    # exact (num, den) pair plus the floor-quantized micro-unit ratio
    # (the theil-sen pmod floordiv pattern, exact on both engines).
    # The smoothing recursion S_k = (v_k + S_{k−1})/2 is sequential in
    # the textbook; the closed form makes it ONE map-side-combinable
    # weighted sum — no iteration, one user-keyed shuffle shared by
    # the cap window, the re-rank, and the final agg.
    from ..functions.core import fixed_cents

    ev = Catalog(spark, sf_dir).events
    wdesc = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    win = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            fixed_cents(F.col("value")).alias("cents"),
            F.row_number().over(wdesc).alias("rnd"),
        )
        .filter(F.col("rnd") <= 16)
        .drop("rnd")
    )
    wasc = Window.partitionBy("user_id").orderBy("ts", "event_id")
    weighted = win.select(
        "user_id",
        F.call_function(
            "shiftleft",
            F.col("cents"),
            (F.row_number().over(wasc) - 1).cast("int"),
        ).alias("wv"),
    )
    agg = weighted.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("k"), F.sum("wv").alias("num")
    )
    den = (
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.col("k").cast("int")
        )
        - 1
    )
    staged = agg.select(
        "user_id",
        F.col("k").cast("long").alias("k"),
        F.col("num").cast("long").alias("ewma_num"),
        den.cast("long").alias("ewma_den"),
        (F.col("num") * F.lit(1000000)).alias("__ns"),
    )
    return staged.select(
        "user_id",
        "k",
        "ewma_num",
        "ewma_den",
        F.expr("(__ns - pmod(__ns, ewma_den)) DIV ewma_den")
        .cast("long")
        .alias("ewma_micro"),
    )


# --- AN25: exact rank-based AUC (Mann-Whitney) ------------------------------

_AUC_ORACLE = """
WITH c AS (
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events
), r AS (
    SELECT d, pos, cents,
           2 * rank() OVER (PARTITION BY d ORDER BY cents)
             + count(*) OVER (PARTITION BY d, cents) - 1 AS mr2
    FROM c
), s AS (
    SELECT d,
           sum(CASE WHEN pos = 1 THEN mr2 ELSE 0 END) AS r2_pos,
           sum(pos) AS n_pos,
           sum(1 - pos) AS n_neg
    FROM r GROUP BY d
)
SELECT d AS day, CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_neg AS BIGINT) AS n_neg,
       CAST(r2_pos - n_pos * (n_pos + 1) AS BIGINT) AS u2,
       CAST(((r2_pos - n_pos * (n_pos + 1)) * 500000
             - ((((r2_pos - n_pos * (n_pos + 1)) * 500000)
                 % (n_pos * n_neg)) + (n_pos * n_neg)) % (n_pos * n_neg))
            / (n_pos * n_neg) AS BIGINT) AS auc_micro
FROM s WHERE n_pos > 0 AND n_neg > 0
"""


@query("q_eval_auc", oracle=_AUC_ORACLE)
def q_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AN25: exact ROC-AUC per day via the rank identity (Mann-Whitney
    # U): AUC = (ΣR_pos − n_pos(n_pos+1)/2) / (n_pos·n_neg) with
    # midranks for ties — the model-eval primitive a training-data
    # pipeline runs on every scored candidate set (here: does event
    # value separate purchases from the rest, per day). All-integer:
    # 2·midrank = 2·rank() + tiecount − 1 is always integral, so
    # U2 = Σmr2_pos − n_pos(n_pos+1) = 2U stays a BIGINT and
    # auc_micro = floor(U2·5·10^5 / (n_pos·n_neg)) uses the pmod
    # floordiv pattern — no float division to drift the hash. Scale:
    # the rank windows PARTITION BY day (a global unpartitioned rank
    # would single-reduce at 100 TB — the per-group framing is the
    # scale-safety), tie counts share the same day-keyed shuffle, and
    # the final per-day sums are map-side combined.
    from ..functions.core import fixed_cents

    ev = Catalog(spark, sf_dir).events
    c = ev.select(
        F.to_date(F.col("ts")).alias("d"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("pos"),
        fixed_cents(F.col("value")).alias("cents"),
    )
    mr2 = (
        2 * F.rank().over(Window.partitionBy("d").orderBy("cents"))
        + F.count(F.lit(1)).over(Window.partitionBy("d", "cents"))
        - 1
    )
    r = c.select("d", "pos", mr2.alias("mr2"))
    s = r.groupBy("d").agg(
        F.sum(F.when(F.col("pos") == 1, F.col("mr2")).otherwise(0)).alias(
            "r2_pos"
        ),
        F.sum("pos").alias("n_pos"),
        F.sum(1 - F.col("pos")).alias("n_neg"),
    )
    u2 = F.col("r2_pos") - F.col("n_pos") * (F.col("n_pos") + 1)
    staged = s.filter(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    ).select(
        F.col("d").alias("day"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        u2.cast("long").alias("u2"),
        (u2 * F.lit(500000)).alias("__us"),
        (F.col("n_pos") * F.col("n_neg")).alias("__den"),
    )
    return staged.select(
        "day",
        "n_pos",
        "n_neg",
        "u2",
        F.expr("(__us - pmod(__us, __den)) DIV __den")
        .cast("long")
        .alias("auc_micro"),
    )


# --- W11: gaps-and-islands longest activity streak --------------------------

_STREAK_ORACLE = """
WITH days AS (
    SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
    FROM events
), isl AS (
    SELECT user_id, d,
           d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                    AS INTEGER) AS island
    FROM days
), runs AS (
    SELECT user_id, island, count(*) AS len
    FROM isl GROUP BY user_id, island
)
SELECT user_id,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(sum(len) AS BIGINT) AS n_active_days
FROM runs GROUP BY user_id
"""


@query("q_streaks", oracle=_STREAK_ORACLE)
def q_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W11: longest consecutive-day activity streak per user — the
    # gaps-and-islands identity ``island = day − row_number`` (constant
    # within a consecutive run, distinct across runs), the one window
    # shape the sessionization family (W10/ST3) doesn't cover: W10
    # splits on TIME GAPS between raw events, this collapses to
    # CALENDAR DAYS first and groups runs by the rank-difference key —
    # no lag/cumsum chain at all. Scale: distinct-day pre-aggregation
    # shrinks the window input to (user × active days), and every stage
    # — distinct, window, both groupBys — shares the user-keyed
    # partitioning, so it's one shuffle end-to-end.
    ev = Catalog(spark, sf_dir).events
    days = ev.select(
        "user_id", F.to_date(F.col("ts")).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("island"),
    )
    runs = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return runs.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.sum("len").cast("long").alias("n_active_days"),
    )
