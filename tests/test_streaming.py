"""Streaming-shaped operator tests (batch-first windows)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from pretalx_hub_etl_spark.streaming import (
    late_filter,
    session_agg,
    sliding_agg,
    tumbling_agg,
)


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, 0) + datetime.timedelta(minutes=minute)


def test_tumbling_counts(spark):
    df = spark.createDataFrame(
        [(_ts(1), 1.0), (_ts(59), 1.0), (_ts(61), 1.0)], "ts timestamp, value double"
    )
    out = {
        r.window_start: r["count"]
        for r in tumbling_agg(df, "ts", "1 hour").collect()
    }
    assert out[datetime.datetime(2024, 1, 1, 0, 0)] == 2
    assert out[datetime.datetime(2024, 1, 1, 1, 0)] == 1


def test_sliding_window_membership(spark):
    df = spark.createDataFrame([(_ts(10), 1.0)], "ts timestamp, value double")
    out = sliding_agg(df, "ts", "1 hour", "15 minutes").collect()
    # one event lands in exactly width/slide = 4 windows
    assert len(out) == 4


def test_session_gap_splits(spark):
    rows = [(1, _ts(0)), (1, _ts(10)), (1, _ts(50)), (2, _ts(0))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = session_agg(df, "ts", "30 minutes", keys=["user_id"])
    per_user = {}
    for r in out.collect():
        per_user.setdefault(r.user_id, []).append((r.window_start, r["count"]))
    # user 1: events at 0,10 in one session; 50 is >30min after 10 -> new session
    assert sorted(per_user[1]) == [
        (datetime.datetime(2024, 1, 1, 0, 0), 2),
        (datetime.datetime(2024, 1, 1, 0, 50), 1),
    ]
    assert per_user[2] == [(datetime.datetime(2024, 1, 1, 0, 0), 1)]


def test_late_filter(spark):
    df = spark.createDataFrame(
        [(i, _ts(i)) for i in (0, 30, 100, 110)], "id long, ts timestamp"
    )
    kept = {r.id for r in late_filter(df, "ts", "15 MINUTES").collect()}
    assert kept == {100, 110}
