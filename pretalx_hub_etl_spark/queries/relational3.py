"""Third relational batch: window distribution/frame shapes, hash and
bitwise scalar functions, and declared queries for the skew operators
(``salted_join`` / ``salted_two_level_agg``) whose oracles are the PLAIN
join/groupBy — salting is a physical rewrite, semantically a no-op.

Determinism notes (the usual cross-engine traps, pre-empted):
- every rank-based window orders by a UNIQUE key tuple (ties broken by
  the primary key), so ntile/percent_rank/cume_dist are exact rationals
  computed identically in both engines;
- the time-range frame sums fixed-point cents (exact BIGINTs, any
  summation order) and frames on epoch-second BIGINTs, not timestamps;
- bit ops compare as BIGINT on both sides (DuckDB's bit_count returns a
  narrow integer, Spark's an int — both pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.core import fixed_cents
from ..operators.agg import salted_two_level_agg
from ..operators.joins import salted_join
from . import query

# --- W6: distribution ranks (ntile / percent_rank / cume_dist) --------------


@query(
    "q_window_ntile",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(ntile(4) OVER w AS BIGINT) AS tile,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Quartile assignment + exact distribution ranks per nation. The order
    # key includes the primary key so every row has a unique rank — the
    # only way ntile/percent_rank hash identically across engines. One
    # shuffle on the partition key; no global sort.
    c = Catalog(spark, sf_dir).customer
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).cast("long").alias("tile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


# --- W7: first / last / nth value frames ------------------------------------


@query(
    "q_window_firstlast",
    oracle="""
    SELECT event_id, user_id,
           first_value(value) OVER w AS first_v,
           last_value(value) OVER w AS last_v,
           nth_value(value, 2) OVER w AS second_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Each user's first/last/second event value attached to every row.
    # The frame is explicitly unbounded-unbounded: last_value's DEFAULT
    # frame (unbounded preceding .. current row) silently returns the
    # current row's value — the classic window bug, pinned here on both
    # engines. Tie-broken by event_id for a unique order.
    e = Catalog(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(w).alias("last_v"),
        F.nth_value("value", 2).over(w).alias("second_v"),
    )


# --- W8: time-range frame (trailing-hour sum) -------------------------------


@query(
    "q_window_time_range",
    oracle="""
    SELECT event_id, user_id, ts_s,
           CAST(sum(v_c) OVER (
               PARTITION BY user_id ORDER BY ts_s
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS BIGINT) / 100.0 AS trail_hour_value
    FROM (
        SELECT event_id, user_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_s,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v_c
        FROM events
    )
    """,
)
def q_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Trailing 1-hour sum per user: a RANGE frame over epoch seconds, the
    # event-time rolling metric Structured Streaming's window() cannot
    # express (it buckets; this trails per row). Range frames include ALL
    # peers of the boundary values, so ties in ts_s are deterministic
    # without a tiebreak; summed values are exact cents.
    e = Catalog(spark, sf_dir).events
    base = e.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").cast("long").alias("ts_s"),
        fixed_cents(F.col("value")).alias("v_c"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_s").rangeBetween(-3600, 0)
    return base.select(
        "event_id",
        "user_id",
        "ts_s",
        (F.sum("v_c").over(w) / 100.0).alias("trail_hour_value"),
    )


# --- F13: cryptographic / fingerprint hashes --------------------------------


@query(
    "q_fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def q_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Content hashing is the backbone of exact dedup and cache keys at
    # 100 TB: both digests are JVM intrinsics (no UDF), hex-lowercase in
    # both engines. sha2(,256) is what llm.dedup recommends as the
    # shuffle key for multi-KB documents.
    d = Catalog(spark, sf_dir).documents
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        F.length("text").cast("long").alias("n_chars"),
    )


# --- F14: bitwise ops -------------------------------------------------------


@query(
    "q_fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT) AS lo_byte,
           CAST(o_orderkey | 4096 AS BIGINT) AS with_flag,
           CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS key_xor,
           CAST(o_orderkey << 2 AS BIGINT) AS shl2,
           CAST(o_orderkey >> 3 AS BIGINT) AS shr3,
           CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
    FROM orders
    """,
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bit manipulation (flag fields, bloom/bitmap membership words,
    # hash mixing) as pure codegen expressions.
    o = Catalog(spark, sf_dir).orders
    return o.select(
        "o_orderkey",
        F.expr("o_orderkey & 255").cast("long").alias("lo_byte"),
        F.expr("o_orderkey | 4096").cast("long").alias("with_flag"),
        F.expr("o_orderkey ^ o_custkey").cast("long").alias("key_xor"),
        F.shiftleft("o_orderkey", 2).cast("long").alias("shl2"),
        F.shiftright("o_orderkey", 3).cast("long").alias("shr3"),
        F.bit_count("o_orderkey").cast("long").alias("popcount"),
    )


# --- SK1: salted join (skew-resistant, semantically a plain join) -----------


@query(
    "q_join_salted",
    oracle="""
    SELECT l_orderkey, l_linenumber, s_name,
           CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) / 100.0
               AS price
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    WHERE l_quantity < 5
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The manual skew-spread join: the supplier dim is exploded across 8
    # salt buckets so a hot suppkey's rows land on 8 reducers instead of
    # one. Semantically identical to the plain join — which IS the oracle.
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.filter(F.col("l_quantity") < 5).select(
        F.col("l_suppkey").alias("s_suppkey"),
        "l_orderkey",
        "l_linenumber",
        (fixed_cents(F.col("l_extendedprice")) / 100.0).alias("price"),
    )
    supp = cat.supplier.select("s_suppkey", "s_name")
    return salted_join(li, supp, "s_suppkey", salt_buckets=8).select(
        "l_orderkey", "l_linenumber", "s_name", "price"
    )


# --- SK2: salted two-level aggregation --------------------------------------


@query(
    "q_agg_salted",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
               AS BIGINT) / 100.0 AS total_price,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(CAST(l_quantity AS BIGINT)) AS BIGINT) AS min_qty,
           CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-level skew-resistant aggregation over a deliberately low-
    # cardinality key (6 groups over 600k rows at sf0.1 — exactly the
    # "hot final reducer" regime). Partials are exact integers, so the
    # result is bit-identical to the plain groupBy oracle.
    li = Catalog(spark, sf_dir).lineitem.select(
        "l_returnflag",
        "l_linestatus",
        fixed_cents(F.col("l_extendedprice")).alias("price_c"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    out = salted_two_level_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "price_c_sum": ("sum", "price_c"),
            "n": ("count", "price_c"),
            "min_qty": ("min", "qty"),
            "max_qty": ("max", "qty"),
        },
        salt_buckets=16,
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("price_c_sum") / 100.0).alias("total_price"),
        "n",
        "min_qty",
        "max_qty",
    )


# --- A7: exact-integer statistical moments (corr / stddev without drift) ----


@query(
    "q_agg_stats",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
               CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                   AS BIGINT) AS sxx,
               CAST(sum(CAST(floor(l_extendedprice + 0.5) AS BIGINT))
                   AS BIGINT) AS sy,
               CAST(sum(CAST(floor(l_extendedprice + 0.5) AS BIGINT)
                      * CAST(floor(l_extendedprice + 0.5) AS BIGINT))
                   AS BIGINT) AS syy,
               CAST(sum(CAST(l_quantity AS BIGINT)
                      * CAST(floor(l_extendedprice + 0.5) AS BIGINT))
                   AS BIGINT) AS sxy
        FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, n,
           CAST(sx AS DOUBLE) / n AS mean_qty,
           sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) / n AS stddev_qty,
           CAST(n * sxy - sx * sy AS DOUBLE)
               / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_qty_price
    FROM m
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Built-in corr()/stddev() accumulate FLOATS whose partial-merge order
    # differs run to run and engine to engine — unusable under a value-
    # hash gate, and subtly nondeterministic at 1000 executors. The engine
    # form: quantize once, aggregate the five exact integer moments
    # (sums fit int64: qty<=50, price quantized to whole units <=~1e5,
    # squared 1e10, x 6e6 rows at sf1 = 6e16 << 2^63), derive the
    # statistics from exact integers in one final double expression.
    li = Catalog(spark, sf_dir).lineitem
    x = F.col("l_quantity").cast("long")
    y = F.floor(F.col("l_extendedprice") + F.lit(0.5)).cast("long")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(y).alias("sy"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return m.select(
        "l_returnflag",
        "n",
        (sx.cast("double") / n).alias("mean_qty"),
        (F.sqrt((n * sxx - sx * sx).cast("double")) / n).alias("stddev_qty"),
        (
            (n * sxy - sx * sy).cast("double")
            / (
                F.sqrt((n * sxx - sx * sx).cast("double"))
                * F.sqrt((n * syy - sy * sy).cast("double"))
            )
        ).alias("corr_qty_price"),
    )


# --- F15: date arithmetic ---------------------------------------------------


@query(
    "q_fn_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(last_day(o_orderdate) AS DATE) AS month_end,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus_30d,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1
               AS BIGINT) AS months_since_1995,
           CAST(isodow(o_orderdate) AS BIGINT) AS iso_weekday
    FROM orders
    """,
)
def q_fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Calendar arithmetic parity pack. Weekday numbering is the classic
    # trap (Spark dayofweek: Sun=1; DuckDB dayofweek: Sun=0) — both sides
    # use ISO numbering (Mon=1..Sun=7; Spark: weekday()+1). Month math is
    # integer year*12 arithmetic, not fractional months_between.
    o = Catalog(spark, sf_dir).orders
    return o.select(
        "o_orderkey",
        F.last_day("o_orderdate").alias("month_end"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus_30d"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        (
            (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
        ).cast("long").alias("months_since_1995"),
        (F.weekday("o_orderdate") + 1).cast("long").alias("iso_weekday"),
    )


# --- G1: generated time spine + gap-filled join (densification) -------------


@query(
    "q_time_spine",
    oracle="""
    WITH spine AS (
        SELECT CAST(unnest(generate_series(
            DATE '1995-01-01', DATE '2001-12-01', INTERVAL 1 MONTH
        )) AS DATE) AS month_start
    ),
    om AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 1
    )
    SELECT month_start, coalesce(n, 0) AS n_orders
    FROM spine LEFT JOIN om ON m = month_start
    """,
)
def q_time_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Row GENERATION (sequence + explode) and gap-filling: the calendar
    # spine left-joins the monthly aggregate so empty months surface as
    # zeros — the densification step every time-series report needs, and
    # the one shape a pure filter/agg pipeline cannot produce (rows that
    # exist in no input). The spine is generated, never scanned; the
    # aggregate side is months-sized, so the join broadcasts.
    o = Catalog(spark, sf_dir).orders
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("2001-12-01").cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("month_start")
    )
    om = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("m")
    ).agg(F.count(F.lit(1)).alias("n"))
    return spine.join(om, F.col("m") == F.col("month_start"), "left").select(
        "month_start", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_orders")
    )


# --- A11: deterministic mode (most frequent value per group) ----------------


@query(
    "q_agg_mode",
    oracle="""
    WITH counts AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               o_orderpriority,
               CAST(count(*) AS BIGINT) AS n
        FROM orders
        GROUP BY 1, 2
    )
    SELECT o_year, o_orderpriority AS mode_priority, n
    FROM (
        SELECT o_year, o_orderpriority, n,
               row_number() OVER (
                   PARTITION BY o_year ORDER BY n DESC, o_orderpriority
               ) AS rn
        FROM counts
    )
    WHERE rn = 1
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Built-in mode() breaks ties arbitrarily (engine- and run-dependent);
    # the engine form is count + rank with an explicit tiebreak (lowest
    # value wins) — deterministic everywhere. count-then-rank only ever
    # windows over |groups| x |distinct values| pre-aggregated rows.
    o = Catalog(spark, sf_dir).orders
    counts = o.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year"), "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("o_year").orderBy(
        F.col("n").desc(), F.col("o_orderpriority").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_year", F.col("o_orderpriority").alias("mode_priority"), "n")
    )


# --- LAY1: z-order clustering key (multi-dimensional layout) ----------------

from ..operators.layout import zorder_key, zorder_key_sql  # noqa: E402


@query(
    "q_layout_zorder",
    oracle=f"""
    SELECT l_orderkey, l_partkey,
           CAST({zorder_key_sql(['l_orderkey', 'l_partkey'], 16)} AS BIGINT)
               AS zkey
    FROM lineitem
    WHERE l_orderkey < 4096 AND l_partkey < 4096
    """,
)
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The Morton code behind OPTIMIZE ZORDER BY: bit-interleave two key
    # columns so a range sort on the z-value clusters BOTH dimensions —
    # parquet footer min/max then prunes scans filtering on either one.
    # Pure shift/mask arithmetic, generated identically for Spark and the
    # SQL oracle from one spec (operators/layout.py).
    li = Catalog(spark, sf_dir).lineitem.filter(
        (F.col("l_orderkey") < 4096) & (F.col("l_partkey") < 4096)
    )
    return li.select(
        "l_orderkey",
        "l_partkey",
        zorder_key(["l_orderkey", "l_partkey"], 16).alias("zkey"),
    )


# --- A12: exact discrete quantiles per group --------------------------------


@query(
    "q_agg_exact_quantiles",
    oracle="""
    WITH v AS (
        SELECT l_returnflag AS flag,
               CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM lineitem
    ), r AS (
        SELECT flag, cents,
               row_number() OVER (PARTITION BY flag ORDER BY cents) AS rn,
               count(*) OVER (PARTITION BY flag) AS n
        FROM v
    )
    SELECT flag,
           max(CASE WHEN rn = greatest(1, CAST(ceil(0.25 * n) AS BIGINT))
                    THEN cents END) AS p25,
           max(CASE WHEN rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
                    THEN cents END) AS p50,
           max(CASE WHEN rn = greatest(1, CAST(ceil(0.75 * n) AS BIGINT))
                    THEN cents END) AS p75,
           max(CASE WHEN rn = greatest(1, CAST(ceil(0.95 * n) AS BIGINT))
                    THEN cents END) AS p95
    FROM r
    GROUP BY flag
    """,
)
def q_agg_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact discrete quantiles (value at rank ceil(q·n)) of the price
    # distribution per return flag — the exact complement of A5's
    # approx_percentile. No arithmetic touches the values (discrete, not
    # interpolated), so the BIGINT cents hash exactly; both engines
    # compute ceil(q·n) from identical doubles. One shuffle + per-group
    # sort; all four fractions resolve in the same window pass.
    from ..operators.agg import exact_group_quantiles

    li = Catalog(spark, sf_dir).lineitem.select(
        F.col("l_returnflag").alias("flag"),
        fixed_cents(F.col("l_extendedprice")).alias("cents"),
    )
    return exact_group_quantiles(
        li, ["flag"], "cents", fractions=(0.25, 0.5, 0.75, 0.95)
    )


# --- A13: robust MAD outlier gate -------------------------------------------


@query(
    "q_outliers_mad",
    oracle="""
    WITH v AS (
        SELECT c_custkey, c_nationkey AS g,
               CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
        FROM customer
    ), m AS (
        SELECT c_custkey, g, cents,
               row_number() OVER (PARTITION BY g ORDER BY cents) AS rn,
               count(*) OVER (PARTITION BY g) AS n
        FROM v
    ), med AS (
        SELECT c_custkey, g, cents, n,
               max(CASE WHEN rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
                        THEN cents END) OVER (PARTITION BY g) AS med
        FROM m
    ), d AS (
        SELECT c_custkey, g, cents, med, abs(cents - med) AS dev, n,
               row_number() OVER (PARTITION BY g
                                  ORDER BY abs(cents - med)) AS rn2
        FROM med
    ), mad AS (
        SELECT c_custkey, g, cents, med, dev,
               max(CASE WHEN rn2 = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
                        THEN dev END) OVER (PARTITION BY g) AS mad
        FROM d
    )
    SELECT c_custkey, g, cents, med, mad
    FROM mad WHERE dev > 1.5 * mad
    """,
)
def q_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Robust per-nation account-balance outliers (Hampel filter): both
    # medians are discrete rank elements, deviations are exact BIGINT
    # differences, so the flagged set value-hashes exactly. One shuffle:
    # the MAD's second window sorts within the partitions the first
    # window already hashed (no second Exchange — asserted in
    # tests/test_plans.py for the window family).
    from ..operators.agg import mad_outliers

    c = Catalog(spark, sf_dir).customer.select(
        "c_custkey",
        F.col("c_nationkey").alias("g"),
        fixed_cents(F.col("c_acctbal")).alias("cents"),
    )
    return mad_outliers(c, ["g"], "cents", k=1.5).select(
        "c_custkey",
        "g",
        "cents",
        F.col("__med").alias("med"),
        F.col("__mad").alias("mad"),
    )


@query(
    "q_agg_global_quantiles",
    oracle="""
    WITH v AS (
        SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM lineitem
    ), r AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents) AS rn,
               count(*) OVER () AS n
        FROM v
    )
    SELECT CAST(0.5 AS DOUBLE) AS fraction,
           max(CASE WHEN rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
                    THEN cents END) AS value
    FROM r
    UNION ALL
    SELECT CAST(0.9 AS DOUBLE),
           max(CASE WHEN rn = greatest(1, CAST(ceil(0.9 * n) AS BIGINT))
                    THEN cents END)
    FROM r
    UNION ALL
    SELECT CAST(0.99 AS DOUBLE),
           max(CASE WHEN rn = greatest(1, CAST(ceil(0.99 * n) AS BIGINT))
                    THEN cents END)
    FROM r
    """,
)
def q_agg_global_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Global exact discrete quantiles WITHOUT the single-reducer global
    # window the oracle uses: repartitionByRange + partition-local sort +
    # driver-side prefix sums over per-partition counts (a
    # #partitions-sized list) + Arrow-batched rank pick. The oracle's
    # row_number() OVER (ORDER BY ...) expresses the same semantics the
    # scale-safe way would be wrong to copy.
    from ..operators.agg import exact_global_quantiles

    li = Catalog(spark, sf_dir).lineitem.select(
        fixed_cents(F.col("l_extendedprice")).alias("cents")
    )
    return exact_global_quantiles(li, "cents", fractions=(0.5, 0.9, 0.99))


# --- GR1: triangle enumeration over an edge list ----------------------------


@query(
    "q_graph_triangles",
    oracle="""
    WITH e AS (
        SELECT a.c_custkey AS u, b.c_custkey AS v
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey
         AND a.c_custkey < b.c_custkey
         AND b.c_custkey - a.c_custkey <= 100
    )
    SELECT a.u AS a, a.v AS b, b.v AS c
    FROM e a JOIN e b ON a.v = b.u
             JOIN e c ON c.u = a.u AND c.v = b.v
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Triangle enumeration (degree-oriented wedges, Suri-Vassilvitskii)
    # over a same-nation/banded-key customer graph. The oracle's naive
    # 3-way self-join is affordable single-node; the Spark side runs the
    # O(m^1.5)-bounded orientation that survives hub vertices at scale.
    # Exact integer triples -> full value hash.
    from ..operators.graph import banded_key_edges, triangle_enumerate

    c = Catalog(spark, sf_dir).customer.select("c_custkey", "c_nationkey")
    edges = banded_key_edges(c, "c_custkey", "c_nationkey", band=100)
    return triangle_enumerate(edges)


# --- A8b: ordered string aggregation (listagg / string_agg) -----------------


@query(
    "q_agg_listagg",
    oracle="""
    SELECT c_nationkey,
           string_agg(c_name, ',' ORDER BY c_name) AS names
    FROM customer
    WHERE c_custkey % 50 = 0
    GROUP BY c_nationkey
    """,
)
def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A8b: LISTAGG/string_agg WITH deterministic WITHIN-GROUP order —
    # the report-facing string rollup. Spark spells it
    # concat_ws(array_sort(collect_list(...))): collect_list alone is
    # partition-order-nondeterministic (the A8 lesson), array_sort
    # restores a total order, making the concatenation hash-stable on
    # any partitioning — same contract as the oracle's ORDER BY clause.
    c = Catalog(spark, sf_dir).customer.filter(F.col("c_custkey") % 50 == 0)
    return c.groupBy("c_nationkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("c_name"))).alias(
            "names"
        )
    )


@query(
    "q_agg_salted_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem
    GROUP BY 1
    """,
)
def q_agg_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A13b: skew-resistant EXACT count-distinct — the aggregation-skew
    # case that actually needs salting: map-side partials make sum/count
    # skew-immune, but Spark's distinct plan re-shuffles the distinct
    # (key, value) stream ON THE KEY for the final count, and AQE's skew
    # handling splits only join partitions. The full-row salt partitions
    # the one distinct column's value set disjointly per key (equal rows
    # share a bucket), so per-bucket counts sum exactly; ONE distinct
    # column per call — a salt spanning two value columns would break
    # disjointness for both (enforced in the operator). 3 hot groups
    # over the whole lineitem scan is the hot-final-reducer regime.
    # Measured on the 4M-row zipf fixture: salted max reducer 563k rows
    # vs plain 2.07M on the distinct-pair stream (SKEW.json agg section).
    from ..operators.agg import salted_two_level_agg

    li = Catalog(spark, sf_dir).lineitem.select("l_returnflag", "l_partkey")
    return salted_two_level_agg(
        li,
        ["l_returnflag"],
        {"n_parts": ("count_distinct", "l_partkey")},
        salt_buckets=16,
    )
