"""Join operator tests: first-match determinism, range-join correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from pretalx_hub_etl_spark.operators.joins import (
    broadcast_lookup,
    first_match_left_join,
    range_join_bucketed,
)
from tests.conftest import SF_SMOKE


def test_first_match_under_duplicate_keys(spark):
    # reference takes the FIRST matching target row then breaks
    # (main.py:133-143); engine makes "first" deterministic via order_by.
    src = spark.createDataFrame([("a",), ("b",)], "k string")
    tgt = spark.createDataFrame(
        [("a", 2, "second"), ("a", 1, "first"), ("c", 9, "other")],
        "k string, ord int, label string",
    )
    out = first_match_left_join(src, tgt, on=["k"], order_by=["ord"])
    rows = {r.k: (r.label, r.op_flag) for r in out.collect()}
    assert rows["a"] == ("first", "update")
    assert rows["b"] == (None, "create")
    # exactly one output row per source row, even with duplicate targets
    assert out.count() == 2


def test_broadcast_lookup_plan_is_broadcast(spark):
    fact = spark.range(100).withColumnRenamed("id", "k")
    dim = spark.createDataFrame([(i, f"v{i}") for i in range(5)], "k long, v string")
    out = broadcast_lookup(fact, dim, "k")
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_range_join_matches_naive_theta_join(spark):
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    if dict(events.dtypes).get("ts") == "bigint":  # older corpus: int64 nanos
        events = events.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    events = events.limit(300).cache()
    left = events.select(F.col("event_id").alias("l_id"), F.col("ts").alias("l_ts"))
    right = events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("r_id"), F.col("ts").alias("r_ts")
    )
    bucketed = range_join_bucketed(left, right, "l_ts", "r_ts", window_seconds=3600)
    naive = left.join(
        right,
        (F.col("l_ts") >= F.col("r_ts"))
        & (F.col("l_ts") < F.col("r_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    got = {(r.l_id, r.r_id) for r in bucketed.collect()}
    want = {(r.l_id, r.r_id) for r in naive.collect()}
    assert got == want and len(want) > 0


def test_asof_join_picks_latest_at_or_before(spark):
    from pretalx_hub_etl_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 205), (3, 2, 50)], "event_id long, k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 90, "a"), (1, 100, "b"), (1, 300, "c"), (2, 60, "d")],
        "k long, ts long, v string",
    )
    out = {
        r.event_id: (r.matched_ts, r.matched_v)
        for r in asof_join(left, right, on="k", right_values=["v"]).collect()
    }
    # equal ts is inclusive (backward join): event 1 takes the ts=100 row
    assert out[1] == (100, "b")
    assert out[2] == (100, "b")
    # no right row at-or-before ts=50 for k=2 -> NULL match
    assert out[3] == (None, None)


def test_asof_join_tolerance_nulls_stale_matches(spark):
    from pyspark.sql import functions as F

    from pretalx_hub_etl_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00"), (2, 1, "2024-01-01 13:00:00")],
        "event_id long, k long, ts_s string",
    ).select("event_id", "k", F.to_timestamp("ts_s").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", 7.0)], "k long, ts_s string, v double"
    ).select("k", F.to_timestamp("ts_s").alias("ts"), "v")
    out = {
        r.event_id: r.matched_v
        for r in asof_join(
            left, right, on="k", right_values=["v"],
            tolerance=F.expr("INTERVAL 1 HOUR"),
        ).collect()
    }
    assert out[1] == 7.0   # 30 min old: within tolerance
    assert out[2] is None  # 3.5 h old: nulled out
