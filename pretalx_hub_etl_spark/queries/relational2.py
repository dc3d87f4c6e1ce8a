"""Second relational batch: range join, pivot/unpivot, grouping sets,
percentiles, pandas-UDF parity (SURVEY.md J6, A4/A5 extensions, §2.10)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.core import fixed_cents
from ..operators.joins import asof_join, range_join_bucketed
from . import query

# --- J6: range/interval join ------------------------------------------------


@query(
    "q_join_range",
    oracle="""
    SELECT l.event_id AS l_id, r.event_id AS r_id
    FROM events l JOIN events r
      ON l.ts >= r.ts AND l.ts < r.ts + INTERVAL 1 HOUR
    WHERE r.event_type = 'signup'
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # "events within one hour after each signup" — the bucketed equi-join
    # formulation (operators.joins.range_join_bucketed) instead of the
    # O(n·m) nested-loop a raw theta join would execute.
    e = Catalog(spark, sf_dir).events
    left = e.select(F.col("event_id").alias("l_id"), F.col("ts").alias("l_ts"))
    right = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("r_id"), F.col("ts").alias("r_ts")
    )
    joined = range_join_bucketed(left, right, "l_ts", "r_ts", window_seconds=3600)
    return joined.select("l_id", "r_id")


# --- J6b: as-of join (backward, per-user latest view before each click) -----


@query(
    "q_join_asof",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    views AS (
        SELECT user_id, ts, max(value) AS value
        FROM events WHERE event_type = 'view'
        GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id, c.ts,
           v.ts AS matched_ts, v.value AS matched_value
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    # For each click, the same user's most recent view at-or-before it —
    # the union-sort as-of join (operators.joins.asof_join): one shuffle on
    # user_id, never a per-key nested loop. DuckDB's native ASOF JOIN is
    # the oracle. The view side is pre-aggregated to one row per (user, ts)
    # so both engines' tie-breaking is vacuously identical.
    e = Catalog(spark, sf_dir).events
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    return asof_join(
        clicks, views, on="user_id", left_ts="ts", right_ts="ts",
        right_values=["value"],
    ).select("event_id", "user_id", "ts", "matched_ts", "matched_value")


# --- §2.10: pandas UDF ≡ built-in expression --------------------------------


@query(
    "q_udf_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)
               / 100.0 AS revenue
    FROM lineitem
    """,
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arrow-vectorized scalar pandas UDF computing the same fixed-point
    # revenue as the built-in expression in q_fn_math — numpy float64 ops are
    # the same IEEE ops, so the oracle hash-matches. Engine guidance stands:
    # built-ins first (they stay in codegen); this declares the escape hatch.
    import numpy as np

    @F.pandas_udf("double")
    def revenue_udf(price: pd.Series, disc: pd.Series) -> pd.Series:
        cents = np.floor(price.values * (1 - disc.values) * 100.0 + 0.5)
        return pd.Series(cents / 100.0)

    li = Catalog(spark, sf_dir).lineitem
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue_udf("l_extendedprice", "l_discount").alias("revenue"),
    )


# --- §2.10 UD3: grouped-agg pandas UDAF ≡ built-in aggregate ----------------


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
               AS BIGINT) AS total_cents,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The UDAF half of the UDF surface: GROUPED_AGG pandas UDFs
    # (Series -> scalar, Arrow-batched) used directly inside groupBy
    # .agg. Summing exact integer cents means numpy's pairwise float
    # summation cannot drift (ints < 2^53 are exact in any order), so
    # the custom aggregate value-hash-matches the SQL SUM. Spark
    # refuses to MIX pandas and non-pandas aggregates in one .agg
    # (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a second
    # pandas UDAF. Engine guidance unchanged — built-ins stay in
    # codegen and support partial aggregation; the UDAF forces a full
    # shuffle of raw rows to the group's partition, the documented cost
    # of the escape hatch.
    @F.pandas_udf("long")
    def sum_cents(c: pd.Series) -> int:
        return int(c.sum())

    @F.pandas_udf("long")
    def n_rows(c: pd.Series) -> int:
        return int(len(c))

    li = Catalog(spark, sf_dir).lineitem.select(
        "l_returnflag",
        "l_linestatus",
        F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        sum_cents("cents").alias("total_cents"),
        n_rows("cents").alias("n"),
    )


# --- pivot / unpivot --------------------------------------------------------


@query(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'O'
                         THEN CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) END)
                AS BIGINT) / 100.0 AS qty_open,
           CAST(sum(CASE WHEN l_linestatus = 'F'
                         THEN CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) END)
                AS BIGINT) / 100.0 AS qty_final
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    pivoted = (
        li.withColumn("qty_cents", fixed_cents(F.col("l_quantity")))
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("qty_cents"))
    )
    return pivoted.select(
        "l_returnflag",
        (F.col("O") / F.lit(100.0)).alias("qty_open"),
        (F.col("F") / F.lit(100.0)).alias("qty_final"),
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'quantity', l_quantity, 'discount', l_discount, 'tax', l_tax)"
        " AS (measure, value)",
    )


# --- A4 (SQL form): GROUPING SETS + GROUPING() ids --------------------------


@query(
    "q_agg_grouping_sets",
    oracle="""
    SELECT r_name, n_name,
           CAST(GROUPING(r_name) AS BIGINT) AS grp_r,
           CAST(GROUPING(n_name) AS BIGINT) AS grp_n,
           CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               / 100.0 AS total_bal,
           count(*) AS n
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (n_name), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cat.register_views()
    return spark.sql(
        """
        SELECT r_name, n_name,
               CAST(GROUPING(r_name) AS BIGINT) AS grp_r,
               CAST(GROUPING(n_name) AS BIGINT) AS grp_n,
               CAST(sum(CAST(floor(c_acctbal * 100.0D + 0.5D) AS BIGINT)) AS BIGINT)
                   / 100.0D AS total_bal,
               count(*) AS n
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (n_name), ())
        """
    )


# --- exact percentiles (linear interpolation in both engines) ---------------


@query(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.5) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("p25"),
        F.percentile("l_quantity", F.lit(0.5)).alias("p50"),
        F.percentile("l_quantity", F.lit(0.75)).alias("p75"),
    )


# --- sequence analytics: ordered funnel over events --------------------------


@query(
    "q_funnel",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS view_ts
               FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS click_ts
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.view_ts
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS purchase_ts
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
          GROUP BY e.user_id)
    SELECT v.user_id, view_ts, click_ts, purchase_ts
    FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ordered-sequence funnel: first view, first click AFTER that view,
    # first purchase AFTER that click, per user. Each stage is one
    # filtered aggregation joined back on user_id — every join/agg hashes
    # on the same key, so at scale the whole funnel runs in one partition
    # layout (and stage tables shrink monotonically).
    e = Catalog(spark, sf_dir).events
    # v feeds the c-stage join AND the final assembly (c feeds p + final):
    # without persisting these per-user aggregates each consumer re-derives
    # its whole subtree from the events scan (6 scans instead of 3). The
    # stage tables are per-user minima — tiny — so caching them is the
    # right call at any scale; the 3 remaining scans are column-pruned
    # and filter-pushed per stage.
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
        .persist()
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
        .persist()
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "view_ts", "click_ts", "purchase_ts")
    )


# --- J9: point-in-time (SCD2 / AS OF system time) join ----------------------


@query(
    "q_join_pit",
    oracle="""
    WITH versions AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS vts, max(value) AS value
        FROM events WHERE event_type = 'view'
        GROUP BY user_id, ts
    ), iv AS (
        SELECT user_id, vts, value,
               lead(vts) OVER (PARTITION BY user_id ORDER BY vts) AS vend
        FROM versions
    ), clicks AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS cts
        FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id,
           CAST(floor(epoch(c.cts)) AS BIGINT) AS ts_s,
           CAST(floor(epoch(iv.vts)) AS BIGINT) AS version_ts_s,
           iv.value AS version_value
    FROM clicks c LEFT JOIN iv
      ON c.user_id = iv.user_id AND iv.vts <= c.cts
         AND (iv.vend IS NULL OR c.cts < iv.vend)
    """,
)
def q_join_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J9: each click joined to the profile version (view events, one
    # row per (user, ts)) valid AT the click's timestamp — the SCD2
    # point-in-time / FOR SYSTEM_TIME AS OF join. The ORACLE runs the
    # naive formulation (build validity intervals with lead(), range
    # join on containment); the ENGINE exploits that SCD2 intervals
    # tile time — "containing interval" == "latest version at-or-
    # before" — and plans the union-sort as-of carry instead: one
    # shuffle on user_id, zero range joins
    # (operators/joins.point_in_time_join).
    from ..operators.joins import point_in_time_join

    e = Catalog(spark, sf_dir).events
    versions = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    pit = point_in_time_join(
        clicks, versions, key="user_id", fact_ts="ts", version_ts="ts",
        version_values=["value"],
    )
    return pit.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").cast("long").alias("ts_s"),
        F.unix_timestamp("version_ts").cast("long").alias("version_ts_s"),
        F.col("version_value"),
    )


# --- A7b: dynamic pivot (values discovered, not declared) -------------------


@query(
    "q_pivot_dynamic",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
                AS BIGINT) AS "1-URGENT",
           CAST(count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END)
                AS BIGINT) AS "2-HIGH",
           CAST(count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END)
                AS BIGINT) AS "3-MEDIUM",
           CAST(count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END)
                AS BIGINT) AS "4-NOT SPECIFIED",
           CAST(count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END)
                AS BIGINT) AS "5-LOW"
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_pivot_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A7b: pivot WITHOUT a declared value list — Spark runs a first pass
    # to collect the distinct pivot values (capped by
    # spark.sql.pivotMaxValues, default 10k) and then compiles the same
    # conditional-aggregate plan the explicit form gets. The oracle
    # spells the discovered columns out, so the row also pins that
    # discovery found exactly the expected domain. The two-pass cost is
    # the documented price of dynamism — q_pivot is the one-pass
    # declared-values form.
    o = Catalog(spark, sf_dir).orders
    out = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority")
        .agg(F.count(F.lit(1)))
    )
    # dynamic pivot leaves count columns nullable-null for absent cells;
    # normalize to the 0 the oracle's count(CASE...) produces
    return out.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(f"`{c}`"), F.lit(0)).cast("long").alias(c)
            for c in out.columns
            if c != "o_orderstatus"
        ],
    )
