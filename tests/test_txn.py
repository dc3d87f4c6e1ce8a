"""S45: multi-table atomic transactions (write-ahead intent +
roll-forward publication + committed-marker visibility flip).

A reader sees ALL of a transaction's table versions or NONE: pending
versions are invisible through every read surface (engine sinks, the
SQL catalog's native reads, the `lakehouse` DataSource) until the
one committed marker lands; a crash after prepare is completed by
heal() (roll-forward — never rolled back).
"""

from __future__ import annotations

import json
import os

import pytest

from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog
from pretalx_hub_etl_spark.sinks.manifest import CommitLog
from pretalx_hub_etl_spark.sinks.merge import MergeSink
from pretalx_hub_etl_spark.sinks.mor import MorTable
from pretalx_hub_etl_spark.sinks.txn import (
    LakehouseTransaction,
    _publish_one,
    heal,
)


def _mk_tables(spark, tmp_path):
    a = os.path.join(str(tmp_path), "a")
    b = os.path.join(str(tmp_path), "b")
    MergeSink(a, key="k").init(
        spark.createDataFrame([(1, 10)], "k INT, v INT")
    )
    MorTable(b, key="k").init(
        spark.createDataFrame([(1, 100)], "k INT, w INT")
    )
    coord = os.path.join(str(tmp_path), "_txn")
    return a, b, coord


def test_commit_is_atomic_across_tables(spark, tmp_path):
    a, b, coord = _mk_tables(spark, tmp_path)
    txn = LakehouseTransaction(coord)
    txn.stage_append(a, spark.createDataFrame([(2, 20)], "k INT, v INT"))
    txn.stage_mor_upsert(
        b, spark.createDataFrame([(2, 200)], "k INT, w INT")
    )
    # staged, not committed: NOTHING visible
    assert MergeSink(a, key="k").read(spark).count() == 1
    assert MorTable(b, key="k").read(spark).count() == 1
    versions = txn.commit()
    assert set(versions) == {os.path.abspath(a), os.path.abspath(b)}
    assert MergeSink(a, key="k").read(spark).count() == 2
    got = {
        (r.k, r.w) for r in MorTable(b, key="k").read(spark).collect()
    }
    assert got == {(1, 100), (2, 200)}


def test_pending_head_is_invisible_everywhere(spark, tmp_path):
    a, b, coord = _mk_tables(spark, tmp_path)
    txn = LakehouseTransaction(coord)
    txn.stage_append(a, spark.createDataFrame([(2, 20)], "k INT, v INT"))
    txn.stage_mor_upsert(
        b, spark.createDataFrame([(2, 200)], "k INT, w INT")
    )
    # simulate the mid-commit window: intent written, ONLY table a
    # published, committed marker absent
    os.makedirs(coord, exist_ok=True)
    intent = {"id": txn.id, "entries": txn._entries}
    with open(os.path.join(coord, f"{txn.id}.json"), "x") as fh:
        json.dump(intent, fh)
    _publish_one(coord, txn.id, 0, txn._entries[0])
    log_a = CommitLog(a)
    assert log_a.current_version() == 2  # physically committed...
    assert log_a.visible_version() == 1  # ...but not visible
    # every read surface serves the pre-txn state
    assert MergeSink(a, key="k").read(spark).count() == 1
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("txa", a)
    assert cat.sql("SELECT * FROM txa").count() == 1
    ds = (
        spark.read.format("lakehouse").option("path", a).load()
    )
    assert ds.count() == 1
    # heal completes the transaction: BOTH tables flip visible together
    healed = heal(coord)
    assert txn.id in healed
    assert log_a.visible_version() == 2
    assert cat.sql("SELECT * FROM txa").count() == 2
    assert MorTable(b, key="k").read(spark).count() == 2


def test_heal_is_idempotent(spark, tmp_path):
    a, b, coord = _mk_tables(spark, tmp_path)
    txn = LakehouseTransaction(coord)
    txn.stage_append(a, spark.createDataFrame([(2, 20)], "k INT, v INT"))
    txn.commit()
    assert heal(coord) == {}  # committed txns are skipped
    assert MergeSink(a, key="k").read(spark).count() == 2
    assert CommitLog(a).current_version() == 2  # no double publish


def test_heal_survives_lost_done_marker(spark, tmp_path):
    # crash window: entry published, .done marker never written ->
    # heal must find the published version via the manifest probe
    # instead of publishing AGAIN (duplicate data)
    a, b, coord = _mk_tables(spark, tmp_path)
    txn = LakehouseTransaction(coord)
    txn.stage_append(a, spark.createDataFrame([(2, 20)], "k INT, v INT"))
    os.makedirs(coord, exist_ok=True)
    with open(os.path.join(coord, f"{txn.id}.json"), "x") as fh:
        json.dump({"id": txn.id, "entries": txn._entries}, fh)
    _publish_one(coord, txn.id, 0, txn._entries[0])
    os.remove(os.path.join(coord, f"{txn.id}.e0.done"))
    heal(coord)
    assert CommitLog(a).current_version() == 2  # not 3
    assert MergeSink(a, key="k").read(spark).count() == 2


def test_abort_before_commit(spark, tmp_path):
    a, b, coord = _mk_tables(spark, tmp_path)
    txn = LakehouseTransaction(coord)
    txn.stage_append(a, spark.createDataFrame([(2, 20)], "k INT, v INT"))
    txn.abort()
    assert MergeSink(a, key="k").read(spark).count() == 1
    assert not [
        d for d in os.listdir(a) if d.startswith(".txn-")
    ]  # stages removed
    with pytest.raises(ValueError, match="aborted"):
        txn.commit()


def test_interleaved_commit_is_not_lost(spark, tmp_path):
    # a normal append lands BETWEEN stage and commit: the txn's publish
    # re-links the CURRENT base, so both rows survive
    from pretalx_hub_etl_spark.sources.lakehouse_ds import write_table

    a, b, coord = _mk_tables(spark, tmp_path)
    txn = LakehouseTransaction(coord)
    txn.stage_append(a, spark.createDataFrame([(2, 20)], "k INT, v INT"))
    write_table(
        spark.createDataFrame([(3, 30)], "k INT, v INT"), a, mode="append"
    )
    txn.commit()
    got = {
        (r.k, r.v) for r in MergeSink(a, key="k").read(spark).collect()
    }
    assert got == {(1, 10), (2, 20), (3, 30)}


def test_txn_respects_constraints_and_generated(spark, tmp_path):
    a, b, coord = _mk_tables(spark, tmp_path)
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("txc", a)
    cat.sql("ALTER TABLE txc ADD CONSTRAINT v_pos CHECK (v >= 0)")
    txn = LakehouseTransaction(coord)
    with pytest.raises(Exception, match="CHECK constraint 'v_pos'"):
        txn.stage_append(
            a, spark.createDataFrame([(2, -1)], "k INT, v INT")
        )
    # nothing staged -> still an empty txn
    with pytest.raises(ValueError, match="empty"):
        txn.commit()


def test_mor_tombstones_in_txn(spark, tmp_path):
    a, b, coord = _mk_tables(spark, tmp_path)
    txn = LakehouseTransaction(coord)
    txn.stage_mor_upsert(
        b, deletes=spark.createDataFrame([(1,)], "k INT")
    )
    assert MorTable(b, key="k").read(spark).count() == 1
    txn.commit()
    assert MorTable(b, key="k").read(spark).count() == 0


def test_mor_compact_refuses_pending_head(spark, tmp_path):
    a, b, coord = _mk_tables(spark, tmp_path)
    txn = LakehouseTransaction(coord)
    txn.stage_mor_upsert(
        b, spark.createDataFrame([(2, 200)], "k INT, w INT")
    )
    os.makedirs(coord, exist_ok=True)
    with open(os.path.join(coord, f"{txn.id}.json"), "x") as fh:
        json.dump({"id": txn.id, "entries": txn._entries}, fh)
    _publish_one(coord, txn.id, 0, txn._entries[0])
    with pytest.raises(RuntimeError, match="pending transaction"):
        MorTable(b, key="k").compact(spark)
    heal(coord)
    MorTable(b, key="k").compact(spark)  # healed: compaction fine
    assert MorTable(b, key="k").read(spark).count() == 2


def test_time_travel_ignores_visibility_for_pinned_versions(
    spark, tmp_path
):
    # an EXPLICIT version pin may read a pending version (the reader
    # asked for a physical version by number); only default "current"
    # resolution steps down
    a, b, coord = _mk_tables(spark, tmp_path)
    txn = LakehouseTransaction(coord)
    txn.stage_append(a, spark.createDataFrame([(2, 20)], "k INT, v INT"))
    os.makedirs(coord, exist_ok=True)
    with open(os.path.join(coord, f"{txn.id}.json"), "x") as fh:
        json.dump({"id": txn.id, "entries": txn._entries}, fh)
    _publish_one(coord, txn.id, 0, txn._entries[0])
    assert MergeSink(a, key="k").read_version(spark, 2).count() == 2
    assert MergeSink(a, key="k").read(spark).count() == 1
    heal(coord)


def test_txn_append_on_partitioned_table(spark, tmp_path):
    # staged files must merge into the base's hive layout (a side
    # subdir would give Spark conflicting directory structures)
    p = os.path.join(str(tmp_path), "pt")
    MergeSink(p, key="k", partition_by=["pk"]).init(
        spark.createDataFrame([(1, 1, 10), (2, 2, 20)], "k INT, pk INT, v INT")
    )
    coord = os.path.join(str(tmp_path), "_txn")
    txn = LakehouseTransaction(coord)
    txn.stage_append(
        p, spark.createDataFrame([(3, 1, 30)], "k INT, pk INT, v INT")
    )
    txn.commit()
    got = {
        (r.k, r.pk, r.v)
        for r in MergeSink(p, key="k").read(spark).collect()
    }
    assert got == {(1, 1, 10), (2, 2, 20), (3, 1, 30)}
    # partition column still prunable through the manifest
    df, scanned, skipped = MergeSink(p, key="k").read_pruned(
        spark, "pk", 2, 2
    )
    assert skipped >= 1 and df.count() >= 0


def test_txn_gc_reclaims_committed_coordinators(spark, tmp_path):
    from pretalx_hub_etl_spark.sinks.txn import gc as txn_gc

    a, b, coord = _mk_tables(spark, tmp_path)
    txn = LakehouseTransaction(coord)
    txn.stage_append(a, spark.createDataFrame([(2, 20)], "k INT, v INT"))
    txn.commit()
    assert os.listdir(coord)  # intent + done + committed present
    collected = txn_gc(coord)
    assert collected == [txn.id]
    assert os.listdir(coord) == []
    # the table stays fully readable: the manifest's txn marker was
    # REWRITTEN away (no marker == visible), not orphaned
    log = CommitLog(a)
    assert log.visible_version() == log.current_version() == 2
    assert "txn" not in log.manifest(2)
    assert MergeSink(a, key="k").read(spark).count() == 2
    # pending txns are never collected
    txn2 = LakehouseTransaction(coord)
    txn2.stage_append(a, spark.createDataFrame([(3, 30)], "k INT, v INT"))
    os.makedirs(coord, exist_ok=True)
    with open(os.path.join(coord, f"{txn2.id}.json"), "x") as fh:
        json.dump({"id": txn2.id, "entries": txn2._entries}, fh)
    assert txn_gc(coord) == []
    heal(coord)


def test_publish_one_surfaces_real_io_errors(spark, tmp_path):
    # a missing stage dir is a REAL error, not a version race: it must
    # surface immediately instead of retrying 50 relink passes
    import shutil as _sh

    a, b, coord = _mk_tables(spark, tmp_path)
    txn = LakehouseTransaction(coord)
    txn.stage_append(a, spark.createDataFrame([(2, 20)], "k INT, v INT"))
    _sh.rmtree(txn._entries[0]["stage"])
    os.makedirs(coord, exist_ok=True)
    with open(os.path.join(coord, f"{txn.id}.json"), "x") as fh:
        json.dump({"id": txn.id, "entries": txn._entries}, fh)
    with pytest.raises(FileNotFoundError):
        _publish_one(coord, txn.id, 0, txn._entries[0])


def test_vacuum_sweeps_orphan_stages(spark, tmp_path):
    from pretalx_hub_etl_spark.sinks.merge import sweep_orphan_stages

    a, b, coord = _mk_tables(spark, tmp_path)
    # a dead writer's stage (old), a live writer's stage (fresh), and a
    # txn stage (protocol-owned): only the first is swept
    dead = os.path.join(a, ".stage-deadbeef")
    live = os.path.join(a, ".stage-live")
    txns = os.path.join(a, ".txn-abc-e0")
    for d in (dead, live, txns):
        os.makedirs(d)
    old = __import__("time").time() - 100 * 3600
    os.utime(dead, (old, old))
    os.utime(txns, (old, old))
    swept = sweep_orphan_stages(a, 24.0)
    assert swept == [".stage-deadbeef"]
    assert os.path.isdir(live) and os.path.isdir(txns)
    # vacuum runs the sweep too (default horizon)
    MergeSink(a, key="k").vacuum(keep_last=5)
    assert os.path.isdir(live) and os.path.isdir(txns)


def test_catalog_transaction_convenience(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    a, b, _ = _mk_tables(spark, tmp_path)
    wh = os.path.join(str(tmp_path), "wh")
    cat = LakehouseSqlCatalog(spark, warehouse=wh)
    cat.register_path("ta", a)
    cat.register_path("tb", b)
    txn = cat.transaction()
    txn.stage_append(
        cat.table_path("ta"),
        spark.createDataFrame([(2, 20)], "k INT, v INT"),
    )
    txn.stage_mor_upsert(
        cat.table_path("tb"),
        spark.createDataFrame([(2, 200)], "k INT, w INT"),
    )
    txn.commit()
    assert cat.sql("SELECT * FROM ta").count() == 2
    assert cat.sql("SELECT * FROM tb").count() == 2
    # no warehouse and no coordinator: a clear error
    bare = LakehouseSqlCatalog(spark)
    with pytest.raises(ValueError, match="warehouse"):
        bare.transaction()


def test_commit_on_pending_base_inherits_invisibility_cow(spark, tmp_path):
    # the build-on-pending hole: an append on top of a pending txn
    # version HARDLINKS its files — without marker inheritance the
    # append would leak the pending data (torn cross-table read)
    from pretalx_hub_etl_spark.sources.lakehouse_ds import write_table

    a, b, coord = _mk_tables(spark, tmp_path)
    txn = LakehouseTransaction(coord)
    txn.stage_append(a, spark.createDataFrame([(2, 20)], "k INT, v INT"))
    os.makedirs(coord, exist_ok=True)
    with open(os.path.join(coord, f"{txn.id}.json"), "x") as fh:
        json.dump({"id": txn.id, "entries": txn._entries}, fh)
    _publish_one(coord, txn.id, 0, txn._entries[0])  # pending v2
    write_table(
        spark.createDataFrame([(3, 30)], "k INT, v INT"), a, mode="append"
    )  # v3, built on pending v2
    log = CommitLog(a)
    assert log.current_version() == 3
    assert log.manifest(3).get("txn_inherited"), (
        "the commit on a pending base did not inherit its marker"
    )
    # NEITHER the txn row nor the append is visible pre-commit
    assert log.visible_version() == 1
    got = {(r.k, r.v) for r in MergeSink(a, key="k").read(spark).collect()}
    assert got == {(1, 10)}
    ds = spark.read.format("lakehouse").option("path", a).load()
    assert ds.count() == 1
    heal(coord)  # txn commits -> BOTH appear at once
    assert log.visible_version() == 3
    got = {(r.k, r.v) for r in MergeSink(a, key="k").read(spark).collect()}
    assert got == {(1, 10), (2, 20), (3, 30)}


def test_commit_on_pending_base_inherits_invisibility_mor(spark, tmp_path):
    a, b, coord = _mk_tables(spark, tmp_path)
    txn = LakehouseTransaction(coord)
    txn.stage_mor_upsert(
        b, spark.createDataFrame([(2, 200)], "k INT, w INT")
    )
    os.makedirs(coord, exist_ok=True)
    with open(os.path.join(coord, f"{txn.id}.json"), "x") as fh:
        json.dump({"id": txn.id, "entries": txn._entries}, fh)
    _publish_one(coord, txn.id, 0, txn._entries[0])  # pending delta v2
    MorTable(b, key="k").merge(
        spark, source=spark.createDataFrame([(3, 300)], "k INT, w INT")
    )  # v3 delta on top of the pending one
    log = CommitLog(b)
    assert log.manifest(3).get("txn_inherited")
    got = {(r.k, r.w) for r in MorTable(b, key="k").read(spark).collect()}
    assert got == {(1, 100)}  # neither delta resolves yet
    heal(coord)
    got = {(r.k, r.w) for r in MorTable(b, key="k").read(spark).collect()}
    assert got == {(1, 100), (2, 200), (3, 300)}


def test_gc_scrubs_inherited_references(spark, tmp_path):
    from pretalx_hub_etl_spark.sinks.txn import gc as txn_gc
    from pretalx_hub_etl_spark.sources.lakehouse_ds import write_table

    a, b, coord = _mk_tables(spark, tmp_path)
    txn = LakehouseTransaction(coord)
    txn.stage_append(a, spark.createDataFrame([(2, 20)], "k INT, v INT"))
    os.makedirs(coord, exist_ok=True)
    with open(os.path.join(coord, f"{txn.id}.json"), "x") as fh:
        json.dump({"id": txn.id, "entries": txn._entries}, fh)
    _publish_one(coord, txn.id, 0, txn._entries[0])
    write_table(
        spark.createDataFrame([(3, 30)], "k INT, v INT"), a, mode="append"
    )
    heal(coord)
    assert txn_gc(coord) == [txn.id]
    log = CommitLog(a)
    # both the own marker AND the inherited reference are gone, so the
    # deleted committed-marker file can no longer hide any version
    assert "txn" not in log.manifest(2)
    assert "txn_inherited" not in log.manifest(3)
    assert log.visible_version() == 3
    assert MergeSink(a, key="k").read(spark).count() == 3


def test_stream_source_serves_only_visible_versions(spark, tmp_path):
    a, b, coord = _mk_tables(spark, tmp_path)
    txn = LakehouseTransaction(coord)
    txn.stage_append(a, spark.createDataFrame([(2, 20)], "k INT, v INT"))
    os.makedirs(coord, exist_ok=True)
    with open(os.path.join(coord, f"{txn.id}.json"), "x") as fh:
        json.dump({"id": txn.id, "entries": txn._entries}, fh)
    _publish_one(coord, txn.id, 0, txn._entries[0])  # pending v2
    from pretalx_hub_etl_spark.sources.lakehouse_ds import (
        cow_read_schema,
        register,
    )

    register(spark)
    out = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    def drain():
        q = (
            spark.readStream.format("lakehouse")
            .schema(cow_read_schema(a))
            .option("path", a)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert spark.read.parquet(out).count() == 1  # only v1 streamed
    heal(coord)
    drain()  # the committed txn version now streams
    got = {(r.k, r.v) for r in spark.read.parquet(out).collect()}
    assert got == {(1, 10), (2, 20)}


def test_concurrent_transactions_both_commit(spark, tmp_path):
    # two transactions over the SAME two tables, commits racing in
    # parallel threads: OCC publication serializes them per table
    # (relink-retry on claim loss), both land, nothing is lost
    import threading

    a, b, coord = _mk_tables(spark, tmp_path)
    t1 = LakehouseTransaction(coord)
    t1.stage_append(a, spark.createDataFrame([(10, 1)], "k INT, v INT"))
    t1.stage_mor_upsert(
        b, spark.createDataFrame([(10, 1)], "k INT, w INT")
    )
    t2 = LakehouseTransaction(coord)
    t2.stage_append(a, spark.createDataFrame([(20, 2)], "k INT, v INT"))
    t2.stage_mor_upsert(
        b, spark.createDataFrame([(20, 2)], "k INT, w INT")
    )
    errs: list[BaseException] = []

    def run(txn):
        try:
            txn.commit()
        except BaseException as e:  # pragma: no cover
            errs.append(e)

    th1 = threading.Thread(target=run, args=(t1,))
    th2 = threading.Thread(target=run, args=(t2,))
    th1.start(); th2.start(); th1.join(); th2.join()
    assert not errs, errs
    got_a = {
        (r.k, r.v) for r in MergeSink(a, key="k").read(spark).collect()
    }
    assert got_a == {(1, 10), (10, 1), (20, 2)}
    got_b = {
        (r.k, r.w) for r in MorTable(b, key="k").read(spark).collect()
    }
    assert got_b == {(1, 100), (10, 1), (20, 2)}
    # each table advanced exactly twice, all versions visible
    for p in (a, b):
        log = CommitLog(p)
        assert log.current_version() == 3
        assert log.visible_version() == 3


def test_gcd_marker_is_self_healing(spark, tmp_path):
    # a stale marker copy whose coordinator holds NEITHER intent nor
    # committed marker refers to a gc'd COMMITTED txn: VISIBLE (a
    # pending txn's intent always exists — the structural rule that
    # makes the gc race unable to pin a table invisible forever)
    import json as _json

    a, b, coord = _mk_tables(spark, tmp_path)
    log = CommitLog(a)
    m = log.manifest(1)
    m["txn_inherited"] = [{"id": "ghost123", "coord": coord}]
    mdir = os.path.join(a, "_manifest")
    with open(os.path.join(mdir, "1.json"), "w") as fh:
        _json.dump(m, fh)
    os.makedirs(coord, exist_ok=True)
    assert log.visible_version() == 1  # ghost marker: treated committed
    # but with the intent PRESENT (genuinely pending) it hides
    with open(os.path.join(coord, "ghost123.json"), "w") as fh:
        _json.dump({"id": "ghost123", "entries": []}, fh)
    assert log.visible_version() == 0


def test_retain_zero_hours_never_sweeps_fresh_stages(spark, tmp_path):
    a, b, coord = _mk_tables(spark, tmp_path)
    from pretalx_hub_etl_spark.sources.lakehouse_ds import write_table

    write_table(
        spark.createDataFrame([(2, 20)], "k INT, v INT"), a, mode="append"
    )
    live = os.path.join(a, ".stage-inflight")
    os.makedirs(live)
    MergeSink(a, key="k").vacuum(retention_hours=0.0)
    assert os.path.isdir(live), (
        "RETAIN 0 HOURS swept a live writer's stage"
    )


def test_fanout_aborts_failed_staging(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog
    from pretalx_hub_etl_spark.streaming.fanout import fanout_sink

    a, b, coord = _mk_tables(spark, tmp_path)
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("fo_a", a)
    cat.sql("ALTER TABLE fo_a ADD CONSTRAINT v_pos CHECK (v >= 0)")
    sink = fanout_sink(coord, {a: lambda df: df, b: lambda df: df})
    bad = spark.createDataFrame([(5, -1)], "k INT, v INT")
    with pytest.raises(Exception):
        sink(bad, 0)
    # the failed batch's stage dirs were aborted, not leaked
    assert not [d for d in os.listdir(a) if d.startswith(".txn-")]
    assert not [d for d in os.listdir(b) if d.startswith(".txn-")]


def test_every_crash_point_converges_via_heal(spark, tmp_path):
    # exhaustive crash matrix: stop the commit sequence after each of
    # its steps (intent, publish e0, publish e1, committed marker) and
    # assert (a) visibility is ALL-or-NOTHING at every point, and
    # (b) one heal() converges to the fully committed state
    import json as _json

    for stop_after in range(4):
        sub = os.path.join(str(tmp_path), f"cp{stop_after}")
        os.makedirs(sub)
        a = os.path.join(sub, "a")
        b = os.path.join(sub, "b")
        MergeSink(a, key="k").init(
            spark.createDataFrame([(1, 10)], "k INT, v INT")
        )
        MorTable(b, key="k").init(
            spark.createDataFrame([(1, 100)], "k INT, w INT")
        )
        coord = os.path.join(sub, "_txn")
        txn = LakehouseTransaction(coord)
        txn.stage_append(
            a, spark.createDataFrame([(2, 20)], "k INT, v INT")
        )
        txn.stage_mor_upsert(
            b, spark.createDataFrame([(2, 200)], "k INT, w INT")
        )
        os.makedirs(coord, exist_ok=True)
        steps = 0
        intent = {"id": txn.id, "entries": txn._entries}
        with open(os.path.join(coord, f"{txn.id}.json"), "x") as fh:
            _json.dump(intent, fh)
        if stop_after > 0:
            _publish_one(coord, txn.id, 0, txn._entries[0])
        if stop_after > 1:
            _publish_one(coord, txn.id, 1, txn._entries[1])
        if stop_after > 2:
            with open(
                os.path.join(coord, f"{txn.id}.committed"), "w"
            ) as fh:
                fh.write("")
        n_a = MergeSink(a, key="k").read(spark).count()
        n_b = MorTable(b, key="k").read(spark).count()
        if stop_after < 3:
            assert (n_a, n_b) == (1, 1), (
                f"crash point {stop_after}: partial visibility "
                f"({n_a}, {n_b})"
            )
        else:
            assert (n_a, n_b) == (2, 2)
        heal(coord)
        assert MergeSink(a, key="k").read(spark).count() == 2
        assert MorTable(b, key="k").read(spark).count() == 2
        # idempotent: a second heal changes nothing
        heal(coord)
        assert CommitLog(a).current_version() == 2
        assert CommitLog(b).current_version() == 2
