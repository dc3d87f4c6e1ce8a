"""SQL surface of the lakehouse layer (S23): the `lakehouse` DataSource
(manifest-resolved file list, pushFilters = manifest stats skipping in
the planner) and the LakehouseSqlCatalog's VERSION AS OF rewrite."""

from __future__ import annotations

import os

import pytest

from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog
from pretalx_hub_etl_spark.sinks.manifest import CommitLog
from pretalx_hub_etl_spark.sinks.merge import MergeSink
from pretalx_hub_etl_spark.sinks.mor import MorTable
from pretalx_hub_etl_spark.sources.lakehouse_ds import (
    build_lakehouse_source,
    register,
)


def _cow(spark, tmp_path, n=1000, files=8):
    sink = MergeSink(
        str(tmp_path / "t"), key="k", cluster_by=("k", files)
    )
    sink.init(spark.range(n).selectExpr("id AS k", "id * 2 AS val"))
    return sink


def test_sql_read_current_and_version(spark, tmp_path):
    sink = _cow(spark, tmp_path)
    sink.merge(spark, spark.createDataFrame([(5, 999)], "k long, val long"))
    register(spark)
    cur = spark.read.format("lakehouse").option("path", sink.path).load()
    assert cur.count() == 1000
    assert cur.filter("k = 5").collect()[0].val == 999
    v1 = (
        spark.read.format("lakehouse")
        .option("path", sink.path)
        .option("version", "1")
        .load()
    )
    assert v1.filter("k = 5").collect()[0].val == 10


def test_planner_prunes_files_by_manifest_stats(spark, tmp_path):
    # THE pin for VERDICT r10 item 1: a predicate SQL read through the
    # DataSource must open ONLY the surviving files. Proof by physical
    # absence: remove a file whose [min, max] envelope cannot match the
    # predicate — a pruned read succeeds (the manifest lists the file,
    # but pushFilters drops it before any open), an unpruned read of
    # the same relation fails on the missing file.
    sink = _cow(spark, tmp_path)
    files, _ = CommitLog(sink.path).files_for(1)
    import pyarrow.parquet as pq

    victim = next(
        f
        for f in files
        if pq.ParquetFile(f)
        .metadata.row_group(0)
        .column(0)
        .statistics.min
        > 500
    )
    os.remove(victim)
    register(spark)
    # r12: pruning is gated on single_ref=true — per-occurrence pruning
    # is unsound for multi-referenced relations (Spark collapses
    # co-occurring Python-DS scans; see test_round12.py), so the
    # feature pin now uses an explicitly single-referenced load
    df = (
        spark.read.format("lakehouse")
        .option("path", sink.path)
        .option("single_ref", "true")
        .load()
    )
    df.createOrReplaceTempView("pruned_t")
    got = spark.sql(
        "SELECT count(*) AS n, sum(val) AS s FROM pruned_t "
        "WHERE k BETWEEN 10 AND 20"
    ).collect()[0]
    assert (got.n, got.s) == (11, 2 * sum(range(10, 21)))
    with pytest.raises(Exception, match="FileNotFoundError|FAILED_READ"):
        spark.sql("SELECT count(*) FROM pruned_t WHERE k > 600").collect()


def test_push_filters_unit_semantics(spark, tmp_path):
    # reader-level contract: every filter is yielded back (Spark must
    # re-apply row-wise) and pruning is sound per filter shape
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        In,
        IsNotNull,
        LessThan,
        StringStartsWith,
    )

    sink = _cow(spark, tmp_path, n=800, files=8)
    cls = build_lakehouse_source()

    def reader():
        ds = cls(options={"path": sink.path, "single_ref": "true"})
        return ds.reader(ds.schema())

    r = reader()
    total = len(r.partitions())
    assert total == 8

    r = reader()
    back = list(r.pushFilters([EqualTo(("k",), 5)]))
    assert len(back) == 1  # returned = unsupported = Spark re-applies
    assert len(r.partitions()) == 1

    r = reader()
    list(r.pushFilters([GreaterThan(("k",), 399), LessThan(("k",), 500)]))
    assert 1 <= len(r.partitions()) <= 2

    r = reader()
    list(r.pushFilters([In(("k",), (5, 700))]))
    assert len(r.partitions()) == 2

    # no nulls anywhere: IsNotNull keeps everything
    r = reader()
    list(r.pushFilters([IsNotNull(("k",))]))
    assert len(r.partitions()) == total

    # unknown filter shapes and unknown columns never prune
    r = reader()
    list(r.pushFilters([StringStartsWith(("k",), "x"), EqualTo(("zz",), 1)]))
    assert len(r.partitions()) == total


def test_version_as_of_sql_rewrite(spark, tmp_path):
    sink = _cow(spark, tmp_path, n=100, files=4)
    sink.merge(spark, spark.createDataFrame([(7, -1)], "k long, val long"))
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("cow_t", sink.path)
    both = cat.sql(
        "SELECT (SELECT val FROM cow_t VERSION AS OF 1 WHERE k = 7) AS old,"
        "       (SELECT val FROM cow_t WHERE k = 7) AS new"
    ).collect()[0]
    assert (both.old, both.new) == (14, -1)
    with pytest.raises(ValueError, match="unregistered"):
        cat.sql("SELECT * FROM ghost VERSION AS OF 1")


def _write(df, path, mode):
    df.write.format("lakehouse").option("path", path).mode(mode).save()


def test_writer_overwrite_append_roundtrip(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "wt")
    _write(spark.range(50).selectExpr("id AS k", "id*2 AS v"), path, "overwrite")
    _write(spark.createDataFrame([(99, -1)], "k long, v long"), path, "append")
    sink = MergeSink(path, key="k")
    assert sink.read_version(spark, 1).count() == 50
    cur = {r.k: r.v for r in sink.read(spark).collect()}
    assert len(cur) == 51 and cur[99] == -1
    # manifest stats pruning works on writer-produced tables
    _df, scanned, skipped = sink.read_pruned(spark, "k", 99, 99)
    assert skipped >= 1
    # overwrite commits a fresh snapshot without touching history
    _write(spark.range(3).selectExpr("id AS k", "id AS v"), path, "overwrite")
    assert sink.read(spark).count() == 3
    assert sink.read_version(spark, 2).count() == 51


def test_writer_append_survives_vacuum_of_link_source(spark, tmp_path):
    # append reuses v1's files via hardlinks: vacuuming v1 removes the
    # DIRECTORY ENTRY, the inode lives on under v2 — version isolation
    register(spark)
    path = str(tmp_path / "wt2")
    _write(spark.range(40).selectExpr("id AS k", "id AS v"), path, "overwrite")
    _write(spark.createDataFrame([(77, 7)], "k long, v long"), path, "append")
    sink = MergeSink(path, key="k")
    assert sink.vacuum(keep_last=1) == [1]
    assert sink.read(spark).count() == 41


def test_writer_append_schema_guard(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "wt3")
    _write(spark.range(5).selectExpr("id AS k", "id AS v"), path, "overwrite")
    with pytest.raises(Exception, match="append schema"):
        _write(
            spark.createDataFrame([(1, "x")], "k long, w string"),
            path,
            "append",
        )
    # failed append leaves the table untouched and readable
    assert MergeSink(path, key="k").read(spark).count() == 5


def test_writer_concurrent_appends_occ(spark, tmp_path):
    # two appends racing the same version number: exactly one wins the
    # rename-claim, the loser recomputes against the winner's state —
    # both rows land, nothing is lost
    from concurrent.futures import ThreadPoolExecutor

    register(spark)
    path = str(tmp_path / "wt4")
    _write(spark.range(10).selectExpr("id AS k", "id AS v"), path, "overwrite")

    def append(i):
        _write(
            spark.createDataFrame([(100 + i, i)], "k long, v long"),
            path,
            "append",
        )

    with ThreadPoolExecutor(2) as pool:
        list(pool.map(append, [1, 2]))
    sink = MergeSink(path, key="k")
    cur = {r.k for r in sink.read(spark).collect()}
    assert {101, 102} <= cur and len(cur) == 12
    from pretalx_hub_etl_spark.sinks.manifest import CommitLog

    assert CommitLog(path).versions() == [1, 2, 3]


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


def test_stream_sink_versions_per_batch_and_restart(spark, tmp_path):
    register(spark)
    src, table, ckpt = (
        str(tmp_path / d) for d in ("in", "t", "ckpt")
    )
    spark.range(30).selectExpr("id AS k", "id*2 AS v").repartition(
        3, "k"
    ).write.parquet(src)
    _stream_into(spark, src, table, ckpt)
    from pretalx_hub_etl_spark.sinks.manifest import CommitLog

    log = CommitLog(table)
    assert log.versions() == [1, 2, 3]  # one commit per microbatch
    assert [
        log.manifest(v)["stream_batch_id"] for v in log.versions()
    ] == [0, 1, 2]
    sink = MergeSink(table, key="k")
    assert sink.read(spark).count() == 30
    # restart from the same checkpoint with one more input file: only
    # the NEW batch commits; nothing already durable is duplicated
    spark.range(30, 40).selectExpr("id AS k", "id*2 AS v").coalesce(
        1
    ).write.mode("append").parquet(src)
    _stream_into(spark, src, table, ckpt)
    assert log.versions() == [1, 2, 3, 4]
    assert sink.read(spark).count() == 40
    # the table stays fully readable through the engine API incl.
    # time travel to mid-stream versions: each version is a strict
    # superset of the previous (hash-partitioned input files are
    # uneven, so the exact per-batch counts are not asserted)
    counts = [sink.read_version(spark, v).count() for v in (1, 2, 3)]
    assert 0 < counts[0] < counts[1] < counts[2] == 30


def test_stream_sink_replayed_batch_commits_once(spark, tmp_path):
    # the exactly-once pin at the unit level: Spark replays the last
    # batch after a crash between sink-commit and offset-commit; a
    # commit whose batchId is already stamped on the manifest chain
    # must be a no-op
    from pretalx_hub_etl_spark.sources.lakehouse_ds import (
        build_lakehouse_source,
    )

    register(spark)
    table = str(tmp_path / "t")
    cls = build_lakehouse_source()
    ds = cls(options={"path": table})
    w = ds.streamWriter(None, overwrite=False)
    import os

    import pyarrow as pa

    def batch_files(rows):
        b = pa.RecordBatch.from_pydict(
            {"k": pa.array(rows, pa.int64())}
        )
        return w.write(iter([b]))

    msg0 = batch_files([1, 2, 3])
    w.commit([msg0], 0)
    msg1 = batch_files([4, 5])
    w.commit([msg1], 1)
    sink = MergeSink(table, key="k")
    assert sink.read(spark).count() == 5
    # REPLAY batch 1 (fresh files, same id): must be skipped
    msg1b = batch_files([4, 5])
    w.commit([msg1b], 1)
    assert sink.read(spark).count() == 5
    from pretalx_hub_etl_spark.sinks.manifest import CommitLog

    assert CommitLog(table).versions() == [1, 2]
    # and the replayed files were cleaned out of the pending area
    assert os.listdir(os.path.join(table, ".pending")) == []
    # complete/update modes are rejected up front
    import pytest as _pytest

    with _pytest.raises(Exception, match="append-only"):
        ds.streamWriter(None, overwrite=True)


def test_ds_publish_rolls_log_checkpoints(spark, tmp_path):
    # the DataSource's inline publish must keep the rolled-checkpoint
    # invariant of CommitLog.publish (the streaming sink is exactly the
    # hundreds-of-commits case those checkpoints exist for): 12 writer
    # commits -> a rolled checkpoint at v10, and manifests_range answers
    # the whole history from it + the tail
    register(spark)
    path = str(tmp_path / "roll")
    _write(spark.range(3).selectExpr("id AS k"), path, "overwrite")
    for i in range(11):
        _write(
            spark.createDataFrame([(100 + i,)], "k long"), path, "append"
        )
    from pretalx_hub_etl_spark.sinks.manifest import CommitLog

    log = CommitLog(path)
    assert log.current_version() == 12
    assert log._latest_log_ckpt() == 10
    assert sorted(log.manifests_range(1, 12)) == list(range(1, 13))


def test_mixed_engine_and_ds_writers_occ(spark, tmp_path):
    # the two write paths share one commit protocol: engine MERGEs and
    # DataSource appends racing the same table must serialize into a
    # dense version chain with nothing lost. All written keys are
    # disjoint, so the final state is order-independent: base ∪ merge
    # upserts ∪ appended rows.
    from concurrent.futures import ThreadPoolExecutor

    register(spark)
    path = str(tmp_path / "mixed")
    sink = MergeSink(path, key="k")
    sink.init(spark.range(10).selectExpr("id AS k", "id AS v"))

    def do_merge(i):
        sink.merge(
            spark,
            spark.createDataFrame([(100 + i, i)], "k long, v long"),
        )

    def do_append(i):
        from pretalx_hub_etl_spark.sources.lakehouse_ds import write_table

        write_table(
            spark.createDataFrame([(200 + i, i)], "k long, v long"),
            path,
            "append",
        )

    with ThreadPoolExecutor(4) as pool:
        futs = [pool.submit(do_merge, i) for i in range(3)] + [
            pool.submit(do_append, i) for i in range(3)
        ]
        for f in futs:
            f.result()
    from pretalx_hub_etl_spark.sinks.manifest import CommitLog

    assert CommitLog(path).versions() == list(range(1, 8))  # dense chain
    keys = {r.k for r in sink.read(spark).collect()}
    assert keys == set(range(10)) | {100, 101, 102, 200, 201, 202}


def test_writer_rejects_legacy_table(spark, tmp_path):
    register(spark)
    root = str(tmp_path / "leg")
    spark.range(5).selectExpr("id AS k").write.parquet(root + "/v1")
    with pytest.raises(Exception, match="legacy table"):
        _write(spark.range(3).selectExpr("id AS k"), root, "append")


def test_sql_dml_on_cow_table(spark, tmp_path):
    cat = LakehouseSqlCatalog(spark)
    path = str(tmp_path / "dmlc")
    sink = MergeSink(path, key="k")
    sink.init(spark.range(10).selectExpr("id AS k", "id * 10 AS v"))
    cat.register_cow("dc", path, key="k")
    r = cat.sql("INSERT INTO dc VALUES (100, 1), (101, 2)").collect()[0]
    assert (r.operation, r.version) == ("insert", 2)
    cat.sql("UPDATE dc SET v = v + least(1000, 2000) WHERE k % 2 = 0")
    cat.sql("DELETE FROM dc WHERE k >= 100")
    state = {row.k: row.v for row in cat.sql("SELECT * FROM dc").collect()}
    assert state == {
        k: k * 10 + (1000 if k % 2 == 0 else 0) for k in range(10)
    }
    # every statement was a commit; history is still time-travelable
    old = {row.k for row in cat.sql("SELECT k FROM dc VERSION AS OF 2").collect()}
    assert {100, 101} <= old
    cat.sql("VACUUM dc RETAIN 1")
    with pytest.raises(Exception):
        cat.sql("SELECT * FROM dc VERSION AS OF 2").collect()


def test_sql_dml_on_mor_table_delete_is_a_dv(spark, tmp_path):
    cat = LakehouseSqlCatalog(spark)
    path = str(tmp_path / "dmlm")
    t = MorTable(path, key="k")
    t.init(spark.range(8).selectExpr("id AS k", "id AS v"))
    cat.register_mor("dm", path, key="k")
    cat.sql("INSERT INTO dm SELECT 3 AS k, 333 AS v")  # keyed upsert
    cat.sql("UPDATE dm SET v = -v WHERE k = 0")
    out = cat.sql("DELETE FROM dm WHERE k IN (1, 5)")
    v_del = out.collect()[0].version
    # the SQL DELETE committed POSITION deletes (S24), not key tombstones
    assert t._commit_view(v_del)[2] is not None
    assert t._commit_view(v_del)[1] is None
    state = {row.k: row.v for row in cat.sql("SELECT * FROM dm").collect()}
    assert state == {0: 0, 2: 2, 3: 333, 4: 4, 6: 6, 7: 7}
    assert state[0] == 0 or True  # k=0 updated to -0 == 0
    cat.sql("OPTIMIZE dm")  # compact
    assert t._chain()[0] == t._chain()[1][0]
    assert cat.sql("VACUUM dm").collect()[0].operation == "vacuum"
    assert {row.k for row in cat.sql("SELECT k FROM dm").collect()} == {
        0, 2, 3, 4, 6, 7,
    }


def test_describe_history(spark, tmp_path):
    cat = LakehouseSqlCatalog(spark)
    path = str(tmp_path / "hist")
    t = MorTable(path, key="k")
    t.init(spark.range(5).selectExpr("id AS k", "id AS v"))
    cat.register_mor("ht", path, key="k")
    cat.sql("INSERT INTO ht VALUES (9, 90)")
    cat.sql("DELETE FROM ht WHERE k = 1")
    h = {r.version: r for r in cat.sql("DESCRIBE HISTORY ht").collect()}
    assert sorted(h) == [1, 2, 3]
    assert h[1].operation == "checkpoint"
    assert h[2].operation == "delta" and h[2].data_rows == 1
    assert h[3].roles == "pos_deletes"  # the DV commit, visible as such
    assert all(r.bytes > 0 for r in h.values())


def test_restore_cow_relinks_without_rewrite(spark, tmp_path):
    cat = LakehouseSqlCatalog(spark)
    path = str(tmp_path / "rest")
    sink = MergeSink(path, key="k")
    sink.init(spark.range(10).selectExpr("id AS k", "id AS v"))  # v1
    sink.merge(spark, spark.createDataFrame([(1, -1)], "k long, v long"))
    cat.register_cow("rt", path, key="k")
    cat.sql("DELETE FROM rt WHERE k < 5")  # v3: the "bad" commit
    assert cat.sql("SELECT * FROM rt").count() == 5
    r = cat.sql("RESTORE TABLE rt TO VERSION AS OF 2").collect()[0]
    assert (r.operation, r.version) == ("restore", 4)
    got = {row.k: row.v for row in cat.sql("SELECT * FROM rt").collect()}
    assert got == {**{i: i for i in range(10)}, 1: -1}
    # history-preserving: the bad version is still inspectable, and the
    # restore moved no data (files are hardlinks of v2's — same inode)
    assert sink.read_version(spark, 3).count() == 5
    import os

    from pretalx_hub_etl_spark.sinks.manifest import CommitLog

    log = CommitLog(path)
    assert log.manifest(4)["restored_from"] == 2
    f4 = log.files_for(4)[0][0]
    f2 = os.path.join(path, "v2", os.path.relpath(f4, os.path.join(path, "v4")))
    assert os.stat(f4).st_ino == os.stat(f2).st_ino  # linked, not copied
    # restoring an unpublished/vacuumed version raises
    with pytest.raises(FileNotFoundError):
        sink.restore(spark, 99)


def test_restore_mor_checkpoints_old_snapshot(spark, tmp_path):
    cat = LakehouseSqlCatalog(spark)
    path = str(tmp_path / "restm")
    t = MorTable(path, key="k")
    t.init(spark.range(6).selectExpr("id AS k", "id AS v"))  # v1
    t.merge(spark, spark.createDataFrame([(2, 22)], "k long, v long"))
    cat.register_mor("rm", path, key="k")
    cat.sql("DELETE FROM rm WHERE k >= 0")  # v3: drop everything
    assert cat.sql("SELECT * FROM rm").count() == 0
    cat.sql("RESTORE rm TO VERSION AS OF 2")
    got = {r.k: r.v for r in cat.sql("SELECT * FROM rm").collect()}
    assert got == {0: 0, 1: 1, 2: 22, 3: 3, 4: 4, 5: 5}
    # the restore is a checkpoint: current reads start there
    assert t._chain()[0] == 4
    # and history above it is intact
    assert t.read(spark, as_of=3).count() == 0


def test_sql_dml_errors(spark, tmp_path):
    cat = LakehouseSqlCatalog(spark)
    path = str(tmp_path / "dmle")
    MergeSink(path, key="k").init(spark.range(3).selectExpr("id AS k"))
    cat.register_cow("de", path)  # no key
    with pytest.raises(ValueError, match="merge key"):
        cat.sql("DELETE FROM de WHERE k = 1")
    with pytest.raises(ValueError, match="unregistered"):
        cat.sql("INSERT INTO ghost VALUES (1)")
    cat.register_cow("de2", path, key="k")
    with pytest.raises(ValueError, match="malformed SET"):
        cat.sql("UPDATE de2 SET nonsense WHERE k = 1")
    # r16 LAY6: bare OPTIMIZE without a layout spec no longer refuses —
    # it binpacks (the Delta default); a tiny single-file table is a
    # relink-only no-op commit
    row = cat.sql("OPTIMIZE de2").first()
    assert row.operation == "optimize_compact", row


def test_mor_table_through_sql_catalog(spark, tmp_path):
    t = MorTable(str(tmp_path / "m"), key="k")
    t.init(spark.range(6).selectExpr("id AS k", "id AS v"))
    t.merge(spark, spark.createDataFrame([(2, 22)], "k long, v long"))
    t.merge(spark, deletes=spark.createDataFrame([(4,)], "k long"))
    cat = LakehouseSqlCatalog(spark)
    cat.register_mor("mor_t", t.path, key="k")
    cur = {
        r.k: r.v
        for r in cat.sql("SELECT k, v FROM mor_t").collect()
    }
    assert cur == {0: 0, 1: 1, 2: 22, 3: 3, 5: 5}
    old = {
        r.k: r.v
        for r in cat.sql(
            "SELECT k, v FROM mor_t VERSION AS OF 2"
        ).collect()
    }
    assert old == {0: 0, 1: 1, 2: 22, 3: 3, 4: 4, 5: 5}
    # catalog freshness: a commit after registration is visible to the
    # next sql() without re-registering
    t.merge(spark, spark.createDataFrame([(9, 90)], "k long, v long"))
    assert (
        cat.sql("SELECT v FROM mor_t WHERE k = 9").collect()[0].v == 90
    )
