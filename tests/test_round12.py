"""Round-12 regression tests: the five r11 ADVICE defects.

1. (high) a DataSource append blocked by a committed-but-unpublished
   v<N> (a writer crashed between rename-claim and manifest publish)
   must HEAL it and build on top — not step past and publish a version
   that silently drops the crashed commit's rows (lost update).
2. (medium) streaming exactly-once dedup is keyed on (run id, batch id):
   a NEW stream (new checkpoint) against a previously-streamed table
   restarts batch numbering at 0 and must NOT be silently dropped.
3. (medium) the SQL reader reconstructs hive partition columns on
   partitioned CoW tables (they live only in the directory names).
4. (low) healing a crashed STREAMING commit preserves its
   (stream_batch_id, stream_run_id) stamp via the _STREAM_BATCH marker.
5. (low) rolled log checkpoints drop vacuum-retired manifests when
   rolling — checkpoint size is bounded by LIVE history.

Plus the round-12 commit-timestamp layer: monotonic committed_at,
TIMESTAMP AS OF resolution, and age-based vacuum retention.
"""

from __future__ import annotations

import json
import os

import pytest

from pretalx_hub_etl_spark.sinks.manifest import CommitLog
from pretalx_hub_etl_spark.sinks.merge import MergeSink
from pretalx_hub_etl_spark.sources.lakehouse_ds import (
    register,
    write_table,
)


def _write(spark, df, path, mode):
    write_table(df, path, mode=mode)


# --- 1. (high) DataSource append heals a committed-but-unpublished claim ----


def test_ds_append_heals_unpublished_claim(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "t")
    _write(spark, spark.range(10).selectExpr("id AS k", "id AS v"), path, "overwrite")
    # simulate an engine writer that crashed between the v2 rename-claim
    # and the manifest publish: a committed directory (parquet +
    # _SUCCESS — spark.write.parquet creates both), no 2.json
    # (CoW versions are full snapshots: the crashed MERGE's v2 carries
    # v1's rows plus its upserts)
    crashed = spark.range(10).selectExpr("id AS k", "id AS v").union(
        spark.createDataFrame([(500, 500), (501, 501)], "k long, v long")
    )
    crashed.coalesce(1).write.parquet(os.path.join(path, "v2"))
    log = CommitLog(path)
    assert log.current_version() == 1  # invisible until published
    # the DataSource append must heal v2 (publish its manifest) and
    # commit ON TOP of it — before the fix it stepped past, built on v1,
    # and published v3 WITHOUT the crashed commit's rows (lost update)
    _write(spark, spark.createDataFrame([(900, 900)], "k long, v long"), path, "append")
    assert log.versions() == [1, 2, 3]
    cur = {r.k for r in MergeSink(path, key="k").read(spark).collect()}
    assert {500, 501, 900} <= cur and len(cur) == 13
    # and v2 is a live, readable commit (healed, not entombed)
    v2 = {r.k for r in MergeSink(path, key="k").read_version(spark, 2).collect()}
    assert {500, 501} <= v2 and len(v2) == 12


# --- 2. (medium) new-checkpoint stream restarts batch ids at 0 --------------


def _stream_into(spark, src, table, ckpt, schema="k long, v long"):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.format("lakehouse")
        .option("path", table)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_new_checkpoint_stream_not_deduped_away(spark, tmp_path):
    register(spark)
    table = str(tmp_path / "t")
    srcA, ckptA = str(tmp_path / "inA"), str(tmp_path / "ckA")
    srcB, ckptB = str(tmp_path / "inB"), str(tmp_path / "ckB")
    spark.range(20).selectExpr("id AS k", "id AS v").repartition(
        2, "k"
    ).write.parquet(srcA)
    _stream_into(spark, srcA, table, ckptA)  # run A: batches 0, 1
    log = CommitLog(table)
    assert log.versions() == [1, 2]
    sink = MergeSink(table, key="k")
    assert sink.read(spark).count() == 20
    # a SECOND stream with a NEW checkpoint appends to the same table:
    # its batch numbering restarts at 0 — before the fix, dedup on the
    # bare batch id silently dropped both of its batches (data loss)
    spark.range(100, 120).selectExpr("id AS k", "id AS v").repartition(
        2, "k"
    ).write.parquet(srcB)
    _stream_into(spark, srcB, table, ckptB)  # run B: batches 0, 1
    assert log.versions() == [1, 2, 3, 4]
    assert sink.read(spark).count() == 40
    # run stamps are distinct; each run's replay ledger is its own
    runs = {log.manifest(v).get("stream_run_id") for v in (1, 3)}
    assert len(runs) == 2 and None not in runs
    # and a restart replay WITHIN run B still dedups (same checkpoint,
    # one more input file -> exactly one new commit)
    spark.range(200, 205).selectExpr("id AS k", "id AS v").coalesce(
        1
    ).write.mode("append").parquet(srcB)
    _stream_into(spark, srcB, table, ckptB)
    assert log.versions() == [1, 2, 3, 4, 5]
    assert sink.read(spark).count() == 45


# --- 3. (medium) partition columns reconstructed in the SQL reader ----------


def test_sql_reader_serves_partition_columns(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    path = str(tmp_path / "pt")
    df = spark.range(40).selectExpr(
        "id AS k", "id % 4 AS region", "id * 2 AS v"
    )
    sink = MergeSink(path, key="k", partition_by=["region"])
    sink.init(df)
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("pt", path)
    # SELECT * must include the partition column (it lives only in the
    # directory names; before the fix it silently vanished), values intact
    out = cat.sql("SELECT k, region, v FROM pt").collect()
    assert len(out) == 40
    assert all(r.region == r.k % 4 for r in out)
    # schema includes the reconstructed column, typed (int-inferred)
    schema = dict(cat.sql("SELECT * FROM pt").dtypes)
    assert schema["region"] == "bigint"
    # predicates on the partition column work row-wise AND prune files
    # (manifest min=max=value envelopes)
    assert cat.sql("SELECT k FROM pt WHERE region = 2").count() == 10


def test_sql_reader_null_and_string_partitions(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    path = str(tmp_path / "pt2")
    df = spark.createDataFrame(
        [(1, "eu", 10), (2, "us", 20), (3, None, 30)],
        "k long, region string, v long",
    )
    MergeSink(path, key="k", partition_by=["region"]).init(df)
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("pt2", path)
    rows = {r.k: r.region for r in cat.sql("SELECT k, region FROM pt2").collect()}
    assert rows == {1: "eu", 2: "us", 3: None}


# --- 4. (low) heal preserves the streaming exactly-once stamp ---------------


def test_heal_preserves_stream_batch_stamp(spark, tmp_path):
    register(spark)
    table = str(tmp_path / "t")
    src, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    spark.range(5).selectExpr("id AS k", "id AS v").coalesce(1).write.parquet(src)
    _stream_into(spark, src, table, ckpt)  # v1, batch 0
    log = CommitLog(table)
    stamped = log.manifest(1)
    assert stamped["stream_batch_id"] == 0 and "stream_run_id" in stamped
    # crash between rename and publish: the manifest vanishes, the
    # committed dir (with its _STREAM_BATCH marker) remains
    os.remove(os.path.join(table, "_manifest", "1.json"))
    assert log.current_version() == 0
    log.heal(1)
    healed = log.manifest(1)
    assert healed["stream_batch_id"] == 0
    assert healed["stream_run_id"] == stamped["stream_run_id"]
    # the replay path sees the restored stamp: re-running the SAME
    # stream (same checkpoint, no new input) commits nothing
    _stream_into(spark, src, table, ckpt)
    assert log.versions() == [1]


# --- 5. (low) rolled checkpoints drop vacuum-retired manifests --------------


def test_log_checkpoint_prunes_vacuumed_versions(tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    log = CommitLog(root)
    big = [{"path": f"f{i}.parquet", "role": "data", "rows": 1} for i in range(50)]
    for v in range(1, 11):
        log.publish({"version": v, "files": list(big)})
    assert log._latest_log_ckpt() == 10
    # vacuum retires 1..8
    log.retire(list(range(1, 9)))
    for v in range(11, 21):
        log.publish({"version": v, "files": []})
    with open(os.path.join(root, "_manifest", "_ckpt_20.json")) as fh:
        rolled = json.load(fh)["manifests"]
    # retired versions' file lists are NOT carried forward forever
    assert set(map(int, rolled)) == {9, 10, *range(11, 21)}
    # manifests_range still serves exactly the live history
    assert sorted(log.manifests_range(1, 20)) == [9, 10, *range(11, 21)]


# --- commit timestamps: monotonic stamps, TIMESTAMP AS OF, retention --------


def test_committed_at_monotonic_and_version_at(tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    log = CommitLog(root)
    import time

    for v in (1, 2, 3):
        log.publish({"version": v, "files": []})
        time.sleep(0.01)  # real wall-clock gaps between commits
    ts = [log.manifest(v)["committed_at"] for v in (1, 2, 3)]
    assert ts[0] < ts[1] < ts[2]  # strictly increasing (clamped)
    assert log.version_at(ts[1]) == 2
    assert log.version_at(ts[1] + 1) == 2  # between commits -> floor
    assert log.version_at(ts[2] + 10_000) == 3  # future -> current
    with pytest.raises(FileNotFoundError, match="at or before"):
        log.version_at(ts[0] - 1)  # predates first commit
    # vacuumed history below: resolution refuses instead of serving a
    # version that was not current at that time
    log.retire([1])
    with pytest.raises(FileNotFoundError):
        log.version_at(ts[0])


def test_backfill_stamp_inherits_neighbor_era(tmp_path):
    # a heal/backfill publishing BELOW already-published versions must
    # not claim "now": stamps stay nondecreasing in version order
    root = str(tmp_path / "t")
    os.makedirs(root)
    log = CommitLog(root)
    log.publish({"version": 1, "files": []})
    log.publish({"version": 2, "files": []})
    log.publish({"version": 4, "files": []})
    log.publish({"version": 3, "files": []})  # late backfill
    ts = {v: log.manifest(v)["committed_at"] for v in (1, 2, 3, 4)}
    assert ts[1] < ts[2] <= ts[3] <= ts[4]
