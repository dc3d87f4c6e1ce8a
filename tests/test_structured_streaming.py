"""Structured Streaming smoke: same window expressions, readStream path."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pretalx_hub_etl_spark.streaming.structured import (
    run_to_memory,
    sessionized_stream,
    stream_from_parquet_dir,
    windowed_counts_stream,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _stage_dir(spark, tmp_path):
    # stage a small parquet dir as the streaming source (events, µs ts)
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(src.dtypes).get("ts") == "bigint":  # older corpus: int64 nanos
        src = src.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    src = src.select("event_id", "ts", "user_id", "value").limit(500)
    d = str(tmp_path / "stream_src")
    src.coalesce(2).write.mode("overwrite").parquet(d)
    shutil.rmtree(f"{d}/_spark_metadata", ignore_errors=True)
    return d


def test_streaming_tumbling_matches_batch(spark, tmp_path):
    d = _stage_dir(spark, tmp_path)
    stream = stream_from_parquet_dir(spark, d, SCHEMA)
    agg = windowed_counts_stream(
        stream, "ts", "1 hour", watermark="90 days",
        aggs=[F.count(F.lit(1)).alias("n")],
    )
    # complete mode: append would hold every window back until the watermark
    # passes its end, which never happens on a bounded replay
    run_to_memory(agg, "t_tumbling", output_mode="complete")
    got = {
        r.window_start: r.n for r in spark.sql("SELECT * FROM t_tumbling").collect()
    }

    batch = (
        spark.read.schema(SCHEMA).parquet(d)
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "n")
    )
    want = {r.ws: r.n for r in batch.collect()}
    assert got == want and len(got) > 0


def test_streaming_session_runs(spark, tmp_path):
    d = _stage_dir(spark, tmp_path)
    stream = stream_from_parquet_dir(spark, d, SCHEMA)
    agg = sessionized_stream(
        stream, "ts", "30 minutes", watermark="1 minute", keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n")],
    )
    run_to_memory(agg, "t_session")
    rows = spark.sql("SELECT * FROM t_session").collect()
    assert len(rows) > 0
    assert all(r.window_end > r.window_start for r in rows)


def test_stream_stream_interval_join(spark, tmp_path):
    from pretalx_hub_etl_spark.streaming.structured import interval_join_streams

    # impressions⋈clicks: a click matches iff same user and within 1 hour
    # AFTER the impression
    imps = [(10, "2024-01-01 10:00:00", 1.0),
            (11, "2024-01-01 10:10:00", 2.0),
            (12, "2024-01-01 12:00:00", 3.0)]
    clicks = [(10, "2024-01-01 10:30:00", 7.0),   # within the hour -> match
              (11, "2024-01-01 11:30:00", 8.0),   # 80 min later -> no match
              (12, "2024-01-01 11:59:00", 9.0)]   # BEFORE the impression -> no match

    def stage(rows, name):
        d = str(tmp_path / name)
        (spark.createDataFrame(rows, "user_id long, ts_s string, value double")
         .select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")
         .coalesce(1).write.mode("overwrite").parquet(d))
        return d
    ld, rd = stage(imps, "imps"), stage(clicks, "clicks")
    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ])
    joined = interval_join_streams(
        spark.readStream.schema(schema).parquet(ld),
        spark.readStream.schema(schema).parquet(rd),
        key="user_id", left_ts="ts", right_ts="ts",
        left_watermark="10 minutes", right_watermark="10 minutes",
        max_delay="1 hour",
    )
    run_to_memory(joined, "t_ssjoin")
    rows = spark.sql("SELECT * FROM t_ssjoin").collect()
    assert [(r.user_id, r.l_value, r.r_value) for r in rows] == [(10, 1.0, 7.0)]


def test_streaming_dedup_within_watermark(spark, tmp_path):
    from pretalx_hub_etl_spark.streaming.structured import dedup_stream

    src = str(tmp_path / "dedup_src")
    rows1 = [(1, "2024-01-01 10:00:00", 10, 1.0),
             (1, "2024-01-01 10:00:30", 10, 2.0),   # dup key in batch 1
             (2, "2024-01-01 10:01:00", 11, 3.0)]
    rows2 = [(2, "2024-01-01 10:02:00", 11, 4.0),   # re-arrival in batch 2
             (3, "2024-01-01 10:03:00", 12, 5.0)]

    def stage(rows, mode):
        (spark.createDataFrame(rows, "event_id long, ts_s string, user_id long, value double")
         .select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id", "value")
         .coalesce(1).write.mode(mode).parquet(src))

    stage(rows1, "overwrite")
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = dedup_stream(stream, keys=["event_id"], ts="ts", watermark="10 minutes")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("t_dedup").start())
    try:
        q.processAllAvailable()
        stage(rows2, "append")
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r.event_id for r in spark.sql("SELECT * FROM t_dedup").collect()}
    n = spark.sql("SELECT count(*) AS n FROM t_dedup").first().n
    assert got == {1, 2, 3}
    assert n == 3  # each key emitted exactly once despite dup + re-arrival


def test_foreachbatch_merge_maintains_current_state(spark, tmp_path):
    """Stream microbatches upsert into the versioned MergeSink table."""
    from pretalx_hub_etl_spark.sinks.merge import MergeSink
    from pretalx_hub_etl_spark.streaming.structured import merge_stream_into

    src = str(tmp_path / "merge_src")
    table = str(tmp_path / "state")

    def stage(rows, mode):
        (spark.createDataFrame(rows, "k long, v double")
         .coalesce(1).write.mode(mode).parquet(src))

    sink = MergeSink(table, key="k")
    sink.init(spark.createDataFrame([(1, 0.0), (2, 0.0)], "k long, v double"))

    stage([(1, 10.0), (3, 30.0)], "overwrite")  # update k=1, insert k=3
    stream = (spark.readStream
              .schema("k long, v double")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = merge_stream_into(stream, sink, "t_merge_state")
    try:
        q.processAllAvailable()
        state1 = {r.k: r.v for r in sink.read(spark).collect()}
        assert state1 == {1: 10.0, 2: 0.0, 3: 30.0}
        stage([(2, 20.0)], "append")  # second microbatch updates k=2
        q.processAllAvailable()
    finally:
        q.stop()
    state2 = {r.k: r.v for r in sink.read(spark).collect()}
    assert state2 == {1: 10.0, 2: 20.0, 3: 30.0}


def test_stream_static_enrich_broadcast(spark, tmp_path):
    from pretalx_hub_etl_spark.streaming.structured import enrich_stream

    d = _stage_dir(spark, tmp_path)
    stream = stream_from_parquet_dir(spark, d, SCHEMA)
    # static dim: attributes for half the users; built as parquet so the
    # static side is a real re-readable source, not an in-memory frame
    users = (
        spark.read.schema(SCHEMA).parquet(d)
        .select("user_id").distinct()
        .filter(F.col("user_id") % 2 == 0)
        .withColumn("tier", F.lit("even"))
    )
    dim_path = str(tmp_path / "dim")
    users.write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path)

    joined = enrich_stream(stream, dim, "user_id", how="left")
    run_to_memory(joined, "t_enrich")
    got = spark.sql("SELECT * FROM t_enrich").collect()

    batch = spark.read.schema(SCHEMA).parquet(d).join(dim, "user_id", "left")
    assert len(got) == batch.count()  # left join: every event kept
    tiers = {r.user_id: r.tier for r in got}
    assert all(
        (t == "even") == (uid % 2 == 0) for uid, t in tiers.items() if t is not None
    )
    assert any(t is None for t in tiers.values())  # odd users unmatched

    # inner drops unmatched events
    inner = enrich_stream(stream, dim, "user_id", how="inner")
    run_to_memory(inner, "t_enrich_inner")
    n_inner = spark.sql("SELECT count(*) AS n FROM t_enrich_inner").collect()[0].n
    assert n_inner == spark.read.schema(SCHEMA).parquet(d).join(dim, "user_id").count()
    assert n_inner < len(got)


def test_streaming_checkpoint_restart_no_reprocessing(spark, tmp_path):
    # the exactly-once contract a production stream leans on: stop a
    # checkpointed file-source query, add new input, restart with the
    # SAME checkpoint dir — the restarted query must resume from the
    # recorded offsets (only the new file becomes a microbatch) and the
    # append sink must end up with each input row exactly once.
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.range(0, 100).selectExpr("id", "id * 2 AS v").coalesce(
        1
    ).write.mode("overwrite").parquet(src)

    def run_once():
        stream = spark.readStream.schema("id long, v long").parquet(src)
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    first = spark.read.parquet(out)
    assert first.count() == 100

    # second input file lands, restart from the same checkpoint
    spark.range(100, 150).selectExpr("id", "id * 2 AS v").coalesce(
        1
    ).write.mode("append").parquet(src)
    run_once()
    final = spark.read.parquet(out)
    assert final.count() == 150  # no batch-1 reprocessing, no loss
    assert final.select("id").distinct().count() == 150


def test_observe_metrics_batch(spark):
    # df.observe(): named aggregate metrics collected as a side effect
    # of the normal action — the zero-extra-pass way to get row counts /
    # quality tallies out of a production pipeline run (vs a second
    # .agg() job that re-reads the source)
    from pyspark.sql import Observation

    obs = Observation("quality")
    df = (
        spark.range(1000)
        .selectExpr("id", "id % 7 AS bucket")
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.expr("CAST(bucket = 0 AS LONG)")).alias("bucket0"),
        )
    )
    assert df.count() == 1000
    got = obs.get
    assert got["n_rows"] == 1000
    assert got["bucket0"] == len([i for i in range(1000) if i % 7 == 0])


def test_stream_stream_interval_join_left_outer_emits_unmatched(
    spark, tmp_path
):
    # ST8b: unmatched impressions must surface null-padded, but ONLY
    # once the global watermark passes their join window — before any
    # watermark movement the outer join returns exactly the inner rows
    from pretalx_hub_etl_spark.streaming.structured import (
        interval_join_streams,
    )

    imps = [(10, "2024-01-01 10:00:00", 1.0),
            (11, "2024-01-01 10:10:00", 2.0),   # click 80 min late
            (12, "2024-01-01 12:00:00", 3.0)]   # click precedes imp
    clicks = [(10, "2024-01-01 10:30:00", 7.0),
              (11, "2024-01-01 11:30:00", 8.0),
              (12, "2024-01-01 11:59:00", 9.0)]

    def stage(rows, name, mode="overwrite"):
        d = str(tmp_path / name)
        (spark.createDataFrame(
            rows, "user_id long, ts_s string, value double")
         .select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")
         .coalesce(1).write.mode(mode).parquet(d))
        return d

    ld, rd = stage(imps, "imps"), stage(clicks, "clicks")
    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ])
    joined = interval_join_streams(
        spark.readStream.schema(schema).parquet(ld),
        spark.readStream.schema(schema).parquet(rd),
        key="user_id", left_ts="ts", right_ts="ts",
        left_watermark="10 minutes", right_watermark="10 minutes",
        max_delay="1 hour", how="leftOuter",
    )
    q = (joined.writeStream.outputMode("append").format("memory")
         .queryName("t_ssjoin_outer").start())
    try:
        q.processAllAvailable()
        # after the first data batch the watermark sits at
        # max(real ts) - 10min = 11:49: imp 11's window ([10:10,
        # 11:10]) is already closed, so Spark's no-data batch evicts
        # and null-emits it — but imp 12's window ([12:00, 13:00]) is
        # still open, so its unmatched row must NOT have emitted yet
        early = spark.sql("SELECT * FROM t_ssjoin_outer").collect()
        assert sorted((r.user_id, r.r_value) for r in early) == [
            (10, 7.0), (11, None)
        ]

        # two sentinel batches: the first advances the watermark past
        # every real window, the second's microbatch evicts and emits
        for day in ("02", "03"):
            s = [(-1, f"2024-06-{day} 00:00:00", 0.0)]
            stage(s, "imps", mode="append")
            stage(s, "clicks", mode="append")
            q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql(
        "SELECT * FROM t_ssjoin_outer WHERE user_id >= 0"
    ).collect()
    got = sorted((r.user_id, r.l_value, r.r_value) for r in rows)
    assert got == [(10, 1.0, 7.0), (11, 2.0, None), (12, 3.0, None)]
