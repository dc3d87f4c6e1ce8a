"""Round-10 surface batch edge tests: table-argument UDTF partition
boundary semantics (UD7) and the partition-parallel streaming source's
restart replay + admission cap (ST10b)."""

from __future__ import annotations

import glob
import os
import uuid


def _register_sessionizer(spark, name):
    from pyspark.sql.functions import udtf

    @udtf(returnType="k bigint, seq bigint, n_seen bigint")
    class PerPartitionCounter:
        # counts rows per instance: if Spark ever splits one partition
        # key across instances, or merges two keys into one running
        # count, the per-key totals break
        def __init__(self):
            self.n = 0

        def eval(self, row):
            self.n += 1
            yield row["k"], row["seq"], self.n

    spark.udtf.register(name, PerPartitionCounter)


def test_udtf_table_arg_partition_isolation_and_order(spark):
    # 3 keys x 50 rows, shuffled input order; PARTITION BY k ORDER BY
    # (seq) must deliver each key's rows to ONE instance in seq order,
    # so n_seen must equal seq+1 for every row
    name = f"phe_counter_{uuid.uuid4().hex[:8]}"
    _register_sessionizer(spark, name)
    df = (
        spark.range(150)
        .selectExpr("id % 3 AS k", "CAST(id / 3 AS BIGINT) AS seq")
        .orderBy("seq", "k")  # interleaved arrival across keys
        .repartition(7)  # arbitrary physical layout pre-TABLE-arg
    )
    view = f"v_{name}"
    df.createOrReplaceTempView(view)
    rows = spark.sql(
        f"""
        SELECT * FROM {name}(
            TABLE(SELECT k, seq FROM {view})
            PARTITION BY k ORDER BY (seq)
        )
        """
    ).collect()
    assert len(rows) == 150
    for r in rows:
        assert r.n_seen == r.seq + 1, (
            f"key {r.k}: row seq={r.seq} saw n_seen={r.n_seen} — "
            "partition isolation or ordering broken"
        )


def test_parallel_pyds_plans_one_partition_per_page():
    # the tier's claim: a microbatch offset range splits into one scan
    # task per page — exercise partitions() directly
    from pretalx_hub_etl_spark.sources.pyds import (
        build_paged_parquet_parallel_source,
    )

    src_cls = build_paged_parquet_parallel_source()
    src = src_cls(
        options={
            "path": "/root/testdata/sf0.001/orders.parquet",
            "key": "o_orderkey",
            "page_size": "300",
            "max_pages_per_batch": "3",
        }
    )
    reader = src.streamReader(None)
    assert reader.initialOffset() == {"lo": 0}
    first = reader.latestOffset()
    assert first == {"lo": 900}  # admission cap: 3 pages, not all
    parts = reader.partitions({"lo": 0}, first)
    assert [(p.lo, p.hi) for p in parts] == [
        (0, 300), (300, 600), (600, 900)
    ]
    # replay of a committed range is deterministic (restart contract)
    a = sum(b.num_rows for b in reader.read(parts[0]))
    b = sum(b.num_rows for b in reader.read(parts[0]))
    assert a == b > 0


def test_mor_cdc_stream_start_after_and_live_pickup(spark, tmp_path):
    # start_after skips already-consumed commits; a commit made while
    # the stream is RUNNING arrives in the next microbatch
    from pretalx_hub_etl_spark.sinks.mor import MorTable
    from pretalx_hub_etl_spark.sources.mor_stream import register

    register(spark)
    t = MorTable(str(tmp_path / "m"), key="k")
    t.init(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
    t.merge(spark, spark.createDataFrame([(3, 30)], "k long, v long"))
    name = f"morcdc_t_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.format("mor_cdc")
        .option("path", t.path)
        .option("key", "k")
        .option("start_after", "1")  # consumer already saw the init
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["__op"], r["__commit"], r.k)
            for r in spark.table(name).collect()
        }
        assert got == {("upsert", 2, 3)}  # v1 skipped, v2 consumed
        # live commit while the stream runs
        t.merge(spark, deletes=spark.createDataFrame([(1,)], "k long"))
        q.processAllAvailable()
        got = {
            (r["__op"], r["__commit"], r.k)
            for r in spark.table(name).collect()
        }
        assert got == {("upsert", 2, 3), ("delete", 3, 1)}
    finally:
        q.stop()


def test_parallel_pyds_restart_resumes_from_checkpoint(spark, tmp_path):
    # stop after the first microbatch, restart on the SAME checkpoint:
    # the union of appended microbatch outputs must equal the full table
    # exactly once (a re-served page duplicates, a dropped page loses)
    from pyspark.sql import functions as F

    from pretalx_hub_etl_spark.sources.paginated import (
        parquet_key_upper_bound,
    )
    from pretalx_hub_etl_spark.sources.pyds import register

    register(spark)
    path = "/root/testdata/sf0.001/orders.parquet"
    upper = parquet_key_upper_bound(path, "o_orderkey")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def start():
        stream = (
            spark.readStream.format("paged_parquet_par")
            .option("path", path)
            .option("key", "o_orderkey")
            .option("page_size", str(max(1, upper // 6 + 1)))
            .option("max_pages_per_batch", "1")
            .option("columns", "o_orderkey")
            .load()
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .start()
        )

    q = start()
    # wait for at least one committed microbatch, then kill mid-stream
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        if glob.glob(os.path.join(out, "*.parquet")):
            break
        time.sleep(0.2)
    q.stop()
    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    got = sorted(
        r.o_orderkey for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        r.o_orderkey
        for r in spark.read.parquet(path).select("o_orderkey").collect()
    )
    assert got == want  # exactly-once across the restart
