"""Window-function declared queries (SURVEY.md §2.5, W1-W4).

Not present in the reference (no ranking/lag/frames in main.py) — engine
extensions required for deterministic first-match joins and analytics.
Computed rank integers are cast to BIGINT on both sides (DuckDB window
functions return BIGINT, Spark's return int).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.core import fixed_cents
from . import query


@query(
    "q_window_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@query(
    "q_window_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           first_value(value) OVER w AS first_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_val"),
    )


@query(
    "q_window_running_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                    OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) / 100.0 AS running_value,
           CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS running_n
    FROM events
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        (F.sum(fixed_cents(F.col("value"))).over(w) / F.lit(100.0)).alias("running_value"),
        F.count(F.lit(1)).over(w).cast("long").alias("running_n"),
    )


@query(
    "q_window_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               CAST(row_number() OVER (PARTITION BY c_mktsegment
                                       ORDER BY c_acctbal DESC, c_custkey ASC)
                    AS BIGINT) AS rn
        FROM customer
    ) WHERE rn <= 3
    """,
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_window_distribution",
    oracle="""
    SELECT event_id, user_id, value,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           nth_value(value, 2) OVER
               (PARTITION BY user_id ORDER BY value ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_lowest
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value ASC, event_id ASC)
    """,
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distribution analytics: ntile buckets, percent_rank/cume_dist (exact
    # integer-ratio doubles — identical IEEE divisions in both engines),
    # nth_value over the full-partition frame (the default running frame
    # would return NULL for the first row)
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("value", 2).over(wf).alias("second_lowest"),
    )


# --- W9: SCD2 validity intervals (record versioning) ------------------------


@query(
    "q_scd2_intervals",
    oracle="""
    SELECT event_id, user_id,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS valid_from_s,
           lead(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS valid_to_s,
           CAST(lead(event_id) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) IS NULL AS BOOLEAN) AS is_current
    FROM events
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Slowly-changing-dimension type 2 build: each event versions its
    # user's record; validity closes at the NEXT event's time (half-open
    # intervals, no gaps/overlaps by construction). One shuffle on the
    # entity key — the standard "latest + full history" table build,
    # which the reference approximates imperatively with its op_flag
    # create/update partition (main.py:134-148).
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = F.unix_timestamp("ts").cast("long")
    return e.select(
        "event_id",
        "user_id",
        ts_s.alias("valid_from_s"),
        F.lead(ts_s).over(w).alias("valid_to_s"),
        F.lead("event_id").over(w).isNull().alias("is_current"),
    )


# --- W10: batch sessionization (gap > 30 min starts a session) --------------


@query(
    "q_sessionize_batch",
    oracle="""
    WITH t AS (
        SELECT event_id, user_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_s,
               CASE WHEN CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                         - lag(CAST(floor(epoch(CAST(ts AS TIMESTAMP)))
                               AS BIGINT)) OVER w > 1800
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, ts_s,
           CAST(sum(is_start) OVER (
               PARTITION BY user_id ORDER BY ts_s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS session_idx
    FROM t
    """,
)
def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The lag-gap-cumsum sessionizer: assigns a per-user session INDEX to
    # every event (session_window aggregates away the events; this keeps
    # them — the form training pipelines need to group interaction
    # traces). Two window passes over ONE shuffle: both windows share the
    # user_id partitioning, so Catalyst plans a single exchange.
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = F.unix_timestamp("ts").cast("long")
    t = e.select(
        "event_id",
        "user_id",
        ts_s.alias("ts_s"),
        F.when(
            (ts_s - F.lag(ts_s).over(w) > 1800) | F.lag("ts").over(w).isNull(),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_start"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.select(
        "event_id",
        "user_id",
        "ts_s",
        F.sum("is_start").over(w2).alias("session_idx"),
    )
