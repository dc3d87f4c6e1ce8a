"""Salted-join equivalence + stateful streaming operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pretalx_hub_etl_spark.operators.joins import salted_join
from pretalx_hub_etl_spark.streaming.stateful import running_totals


def test_salted_join_equals_plain_join(spark):
    # skewed: 90% of rows share key 7
    skewed = spark.range(1000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(0, 1000, 10)] + [(7, "dim7")],
        "k long, dim string",
    )
    plain = skewed.join(small, "k").select("k", "payload", "dim")
    salted = salted_join(skewed, small, "k").select("k", "payload", "dim")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_running_totals_accumulates_across_batches(spark, tmp_path):
    src = str(tmp_path / "stateful_src")
    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("value", T.DoubleType())]
    )
    # batch 1 on disk before the stream starts
    spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 1.0)], schema).coalesce(
        1
    ).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = running_totals(stream, "user_id", "value")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_state")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2 arrives: user 1 gains 2 more rows
        spark.createDataFrame([(1, 1.0), (1, 1.0), (3, 7.0)], schema).coalesce(
            1
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql(
        "SELECT key, max(n) AS n, max(total) AS total FROM t_state GROUP BY key"
    ).collect()
    got = {r.key: (r.n, r.total) for r in rows}
    # state persisted across batches: user 1 saw 2 then 2 more rows
    assert got[1] == (4, 17.0)
    assert got[2] == (1, 1.0)
    assert got[3] == (1, 7.0)


def test_upsert_flags_across_batches(spark, tmp_path):
    from pretalx_hub_etl_spark.streaming.stateful import upsert_flags

    src = str(tmp_path / "upsert_src")
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]
    )

    def stage(rows, mode):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(mode).parquet(src)

    stage([(1, 1.0), (2, 2.0)], "overwrite")
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        upsert_flags(stream, "k", "v")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_upsert")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            r.key: r.op_flag for r in spark.sql("SELECT * FROM t_upsert").collect()
        }
        # batch 2: k1 unchanged, k2 new value, k3 first seen
        stage([(1, 1.0), (2, 3.0), (3, 9.0)], "append")
        q.processAllAvailable()
    finally:
        q.stop()

    assert first == {1: "create", 2: "create"}
    rows = spark.sql(
        "SELECT * FROM t_upsert ORDER BY key, op_flag"
    ).collect()
    latest = {}
    for r in rows:
        latest.setdefault(r.key, []).append((r.op_flag, r.value))
    assert ("noop", 1.0) in latest[1]
    assert ("update", 3.0) in latest[2]
    assert latest[3] == [("create", 9.0)]


def test_salted_two_level_agg_matches_plain_groupby(spark):
    from pretalx_hub_etl_spark.operators.agg import salted_two_level_agg

    # 90% of rows share key 7 (the skew case the operator exists for)
    df = spark.range(2000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 100).cast("long").alias("v"),
    )
    salted = salted_two_level_agg(
        df, ["k"],
        {"total": ("sum", "v"), "n": ("count", "v"),
         "lo": ("min", "v"), "hi": ("max", "v")},
        salt_buckets=8,
    )
    plain = df.groupBy("k").agg(
        F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"), F.max("v").alias("hi"),
    )
    got = {r.k: (r.total, r.n, r.lo, r.hi) for r in salted.collect()}
    want = {r.k: (r.total, r.n, r.lo, r.hi) for r in plain.collect()}
    assert got == want


def test_salted_two_level_agg_count_distinct_matches_plain(spark):
    from pretalx_hub_etl_spark.operators.agg import salted_two_level_agg

    # hot key 7 carries many DISTINCT values (the agg-skew shape that
    # partial aggregation cannot collapse and AQE cannot split)
    df = spark.range(5000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 700).cast("long").alias("v"),
    )
    salted = salted_two_level_agg(
        df, ["k"], {"nv": ("count_distinct", "v")}, salt_buckets=8
    )
    plain = df.groupBy("k").agg(F.count_distinct("v").alias("nv"))
    got = {r.k: r.nv for r in salted.collect()}
    want = {r.k: r.nv for r in plain.collect()}
    assert got == want


def test_salted_count_distinct_rejects_extra_columns(spark):
    import pytest

    from pretalx_hub_etl_spark.operators.agg import salted_two_level_agg

    df = spark.range(10).select(
        F.col("id").alias("k"), F.col("id").alias("v"), F.col("id").alias("w")
    )
    with pytest.raises(ValueError, match="count_distinct under salting"):
        salted_two_level_agg(df, ["k"], {"nv": ("count_distinct", "v")})


def test_salted_two_level_agg_rejects_holistic(spark):
    import pytest

    from pretalx_hub_etl_spark.operators.agg import salted_two_level_agg

    df = spark.range(10).select(F.col("id").alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_two_level_agg(df, ["k"], {"m": ("median", "v")})


def test_running_totals_tws_accumulates_across_batches(spark, tmp_path):
    """Same contract as running_totals, on transformWithStateInPandas."""
    import pytest as _pytest

    from pretalx_hub_etl_spark.streaming.stateful import (
        running_totals_tws,
        tws_available,
    )

    if not tws_available():
        # API accepted + processor defined; execution needs protobuf
        # (absent here). Assert the documented failure mode instead.
        with _pytest.raises(NotImplementedError):
            running_totals_tws(
                spark.readStream.schema("user_id long, value double")
                .parquet(str(tmp_path)),
                "user_id",
                "value",
            )
        return

    src = str(tmp_path / "tws_src")
    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("value", T.DoubleType())]
    )
    spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 1.0)], schema).coalesce(
        1
    ).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = running_totals_tws(stream, "user_id", "value")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_tws")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame([(1, 1.0), (1, 1.0), (3, 7.0)], schema).coalesce(
            1
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql(
        "SELECT key, max(n) AS n, max(total) AS total FROM t_tws GROUP BY key"
    ).collect()
    got = {r.key: (r.n, r.total) for r in rows}
    assert got[1] == (4, 17.0)
    assert got[2] == (1, 1.0)
    assert got[3] == (1, 7.0)


def test_running_topn_tws_order_free(spark, tmp_path):
    """ListState top-n converges to the same answer for any batch order."""
    from pretalx_hub_etl_spark.streaming.protobuf_compat import tws_available
    from pretalx_hub_etl_spark.streaming.stateful import running_topn_tws

    if not tws_available():
        import pytest

        pytest.skip("no protobuf runtime discoverable on this host")

    src = str(tmp_path / "topn_src")
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
    )
    spark.createDataFrame(
        [(1, 10), (1, 50), (2, 7)], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = running_topn_tws(stream, "k", "v", n=2)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_topn")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: key 1 gains a new max and a low value
        spark.createDataFrame([(1, 99), (1, 1)], schema).coalesce(
            1
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql(
        """SELECT key, rank, value FROM (
               SELECT *, max(n_seen) OVER (PARTITION BY key) AS mx
               FROM t_topn
           ) WHERE n_seen = mx"""
    ).collect()
    got = {}
    for r in rows:
        got.setdefault(r.key, {})[r.rank] = r.value
    assert got[1] == {1: 99, 2: 50}
    assert got[2] == {1: 7}


def test_salted_count_distinct_rejects_two_distinct_columns(spark):
    import pytest

    from pretalx_hub_etl_spark.operators.agg import salted_two_level_agg

    df = spark.range(10).select(
        F.col("id").alias("k"), F.col("id").alias("v"), F.col("id").alias("w")
    )
    # a salt spanning two value columns double-counts both (found by the
    # first draft of q_agg_salted_distinct: 14348 vs the true 2000)
    with pytest.raises(ValueError, match="ONE distinct column"):
        salted_two_level_agg(
            df, ["k"],
            {"nv": ("count_distinct", "v"), "nw": ("count_distinct", "w")},
        )


def test_tws_event_time_timers_fire_on_watermark(spark, tmp_path):
    """ST9 family completeness: event-time timers — a key registers a
    timer; when a later batch advances the watermark past it,
    handleExpiredTimer emits the key's marker row."""
    import datetime

    import pandas as pd
    import pytest

    from pretalx_hub_etl_spark.streaming.protobuf_compat import (
        enable_tws,
        tws_available,
    )

    if not tws_available():
        pytest.skip("no protobuf runtime discoverable on this host")
    enable_tws(spark)
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class TimerProc(StatefulProcessor):
        def init(self, handle):
            self._handle = handle
            self._n = handle.getValueState("n", "n bigint")

        def handleInputRows(self, key, rows, timerValues):
            n = int(self._n.get()[0]) if self._n.exists() else 0
            mx = None
            for pdf in rows:
                n += len(pdf)
                ts = pd.to_datetime(pdf.iloc[:, -1]).max()
                mx = ts if mx is None else max(mx, ts)
            self._n.update((n,))
            # fire 1s after this key's newest event time
            expiry_ms = int(mx.timestamp() * 1000) + 1000
            self._handle.registerTimer(expiry_ms)
            yield pd.DataFrame(
                {"k": [key[0]], "kind": ["n"], "val": [n]}
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            yield pd.DataFrame(
                {
                    "k": [key[0]],
                    "kind": ["timer"],
                    "val": [expiredTimerInfo.getExpiryTimeInMs()],
                }
            )

        def close(self):
            pass

    src = str(tmp_path / "timer_src")
    schema = "k long, ts timestamp"
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def stage(rows, mode):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            mode
        ).parquet(src)

    stage([(1, t0)], "overwrite")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "0 seconds")
    )
    out = stream.groupBy("k").transformWithStateInPandas(
        TimerProc(),
        outputStructType="k bigint, kind string, val bigint",
        outputMode="Update",
        timeMode="EventTime",
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_timers")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a much later event on ANOTHER key advances the
        # watermark far past key 1's (t0 + 1s) timer
        stage([(2, t0 + datetime.timedelta(seconds=500))], "append")
        q.processAllAvailable()
        # one more batch so the fired-timer output is surfaced even if
        # the engine defers timer evaluation to the next microbatch
        stage([(2, t0 + datetime.timedelta(seconds=600))], "append")
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM t_timers").collect()
    kinds = {(r.k, r.kind) for r in rows}
    assert (1, "n") in kinds and (2, "n") in kinds
    timer_rows = [r for r in rows if r.kind == "timer" and r.k == 1]
    assert timer_rows, f"no expired-timer emission for key 1: {rows}"
    want_expiry = int(t0.timestamp() * 1000) + 1000
    assert timer_rows[0].val == want_expiry


def test_tws_state_survives_query_restart(spark, tmp_path):
    """RocksDB-backed TWS state is durable across a full query
    stop/start on the same checkpoint: totals keep accumulating."""
    import pytest

    from pretalx_hub_etl_spark.streaming.protobuf_compat import tws_available
    from pretalx_hub_etl_spark.streaming.stateful import running_totals_tws

    if not tws_available():
        pytest.skip("no protobuf runtime discoverable on this host")

    src = str(tmp_path / "restart_src")
    ckpt = str(tmp_path / "restart_ckpt")
    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("value", T.DoubleType())]
    )

    def stage(rows, mode):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            mode
        ).parquet(src)

    outdir = str(tmp_path / "restart_out")

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = running_totals_tws(stream, "user_id", "value")

        # memory sink cannot recover from a checkpoint; foreachBatch ->
        # parquet is the restartable sink shape
        def sink(bdf, bid):
            bdf.write.mode("append").parquet(outdir)

        return (
            out.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    stage([(1, 10.0), (2, 5.0)], "overwrite")
    q1 = start()
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()

    # second incarnation of the query on the SAME checkpoint: new file
    # arrives, per-key totals must CONTINUE from the stored state
    stage([(1, 7.0)], "append")
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    rows = {r.key: (r.n, r.total) for r in (
        spark.read.parquet(outdir)
        .groupBy("key")
        .agg(F.max("n").alias("n"), F.max("total").alias("total"))
        .collect()
    )}
    assert rows[1] == (2, 17.0)  # 10 before restart + 7 after


def test_idle_finalize_tws_timer_fires_once_per_key(spark, tmp_path):
    """ST9e: no emission on input; one timer-driven emission per key
    with finalize = last event + idle, re-registration replacing the
    stale timer when a later batch extends a key's history."""
    import pytest as _pytest

    from pretalx_hub_etl_spark.streaming.stateful import (
        idle_finalize_tws,
        tws_available,
    )

    if not tws_available():
        with _pytest.raises(NotImplementedError):
            idle_finalize_tws(
                spark.readStream.schema(
                    "user_id long, value double, ts timestamp"
                ).parquet(str(tmp_path)),
                "user_id",
                "value",
            )
        return

    src = str(tmp_path / "timer_src")
    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ])

    def stage(rows, mode):
        (spark.createDataFrame(rows, "user_id long, value double, ts_s string")
         .select("user_id", "value", F.to_timestamp("ts_s").alias("ts"))
         .coalesce(1).write.mode(mode).parquet(src))

    idle_ms = 30 * 60 * 1000
    base_ms = 1704103200000  # 2024-01-01 10:00:00 UTC
    stage([(1, 10.0, "2024-01-01 10:00:00"),
           (2, 5.0, "2024-01-01 10:00:00")], "overwrite")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
    )
    out = idle_finalize_tws(stream, "user_id", "value", idle_ms=idle_ms)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("t_timer").start())
    try:
        q.processAllAvailable()
        # batch 2 extends key 1 by an hour: its stale timer must be
        # REPLACED, and the batch's watermark (11:00 - 10min = 10:50)
        # fires key 2's 10:30 timer but not key 1's new 11:30 one
        stage([(1, 2.0, "2024-01-01 11:00:00")], "append")
        q.processAllAvailable()
        mid = {r.key: r for r in spark.sql(
            "SELECT * FROM t_timer").collect()}
        assert set(mid) == {2}
        assert mid[2].finalize_ms == base_ms + idle_ms
        # sentinel far past everything: key 1 fires exactly once, at
        # its EXTENDED expiry (replacement worked - no 10:30 emission)
        stage([(-1, 0.0, "2024-06-01 00:00:00")], "append")
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM t_timer WHERE key >= 0").collect()
    got = {r.key: (r.n, r.total, r.finalize_ms) for r in rows}
    assert len(rows) == 2  # one emission per key, ever
    assert got[1] == (2, 12.0, base_ms + 3600_000 + idle_ms)
    assert got[2] == (1, 5.0, base_ms + idle_ms)
