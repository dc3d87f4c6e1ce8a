"""MoR position deletes / deletion vectors (S24, VERDICT r10 item 2):
delete by (file, row-position) instead of key tombstones, with
tombstone-identical read semantics, CDC/stream surfacing, compaction
dropping applied DVs, and the write-amplification argument."""

from __future__ import annotations

import pytest

from pretalx_hub_etl_spark.sinks.mor import MorTable

from pyspark.sql import functions as F


def _table(spark, tmp_path, n=30):
    t = MorTable(str(tmp_path / "t"), key="k")
    t.init(spark.range(n).selectExpr("id AS k", "id * 10 AS v"))
    return t


def test_delete_where_matches_tombstone_semantics(spark, tmp_path):
    # twin tables, same history, commit 3 as DV vs tombstones: resolved
    # states must be identical
    dv_t = MorTable(str(tmp_path / "dv"), key="k")
    tb_t = MorTable(str(tmp_path / "tb"), key="k")
    base = spark.range(30).selectExpr("id AS k", "id * 10 AS v")
    upd = spark.range(30).filter("id % 5 = 0").selectExpr(
        "id AS k", "id * 10 + 1 AS v"
    )
    for t in (dv_t, tb_t):
        t.init(base)
        t.merge(spark, upd)
    dv_t.delete_where(spark, F.col("k") % 7 == 0)
    tb_t.merge(
        spark, deletes=base.filter("k % 7 = 0").select("k")
    )
    dv_state = {r.k: r.v for r in dv_t.read(spark).collect()}
    tb_state = {r.k: r.v for r in tb_t.read(spark).collect()}
    assert dv_state == tb_state
    assert 7 not in dv_state and 14 not in dv_state


def test_dv_does_not_resurrect_shadowed_history(spark, tmp_path):
    # k=0's winning row after v2 lives in v2's file; a DV targeting it
    # must DELETE the key, not fall back to v1's shadowed row
    t = _table(spark, tmp_path, n=10)
    t.merge(spark, spark.createDataFrame([(0, 999)], "k long, v long"))
    t.delete_where(spark, F.col("k") == 0)
    state = {r.k: r.v for r in t.read(spark).collect()}
    assert 0 not in state
    assert len(state) == 9


def test_upsert_after_dv_reinserts(spark, tmp_path):
    t = _table(spark, tmp_path, n=10)
    t.delete_where(spark, F.col("k") == 3)
    assert 3 not in {r.k for r in t.read(spark).collect()}
    t.merge(spark, spark.createDataFrame([(3, 333)], "k long, v long"))
    assert {r.k: r.v for r in t.read(spark).collect()}[3] == 333


def test_dv_time_travel(spark, tmp_path):
    t = _table(spark, tmp_path, n=10)  # v1
    v2 = t.delete_where(spark, F.col("k") < 3)  # v2: DV
    assert v2 == 2
    assert {r.k for r in t.read(spark, as_of=1).collect()} == set(range(10))
    assert {r.k for r in t.read(spark, as_of=2).collect()} == set(range(3, 10))


def test_dv_changes_since_emits_delete_events(spark, tmp_path):
    t = _table(spark, tmp_path, n=10)
    t.delete_where(spark, F.col("k").isin(2, 5))
    feed = t.changes_since(spark, 1).collect()
    got = {(r["__op"], r["__commit"], r["k"]) for r in feed}
    assert got == {("delete", 2, 2), ("delete", 2, 5)}
    assert all(r["v"] is None for r in feed)  # NULL payloads


def test_dv_streaming_cdc_matches_batch_feed(spark, tmp_path):
    from pretalx_hub_etl_spark.sources.mor_stream import register

    register(spark)
    t = _table(spark, tmp_path, n=12)
    t.merge(spark, spark.createDataFrame([(1, 111)], "k long, v long"))
    t.delete_where(spark, F.col("k").isin(1, 4))
    stream = (
        spark.readStream.format("mor_cdc")
        .option("path", t.path)
        .option("key", "k")
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dv_feed")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(timeout=120)
    finally:
        q.stop()
    got = {
        (r["__op"], r["__commit"], r["k"], r["v"])
        for r in spark.table("dv_feed").collect()
    }
    want = {
        (r["__op"], r["__commit"], r["k"], r["v"])
        for r in t.changes_since(spark, 0).collect()
    }
    assert got == want
    assert ("delete", 3, 1, None) in got and ("delete", 3, 4, None) in got


def test_compaction_drops_applied_dvs(spark, tmp_path):
    t = _table(spark, tmp_path, n=20)
    t.delete_where(spark, F.col("k") % 2 == 0)
    ckpt = t.compact(spark)
    # post-compaction chain starts at the checkpoint: no pos_deletes
    # files are scanned by a current read
    start, chain = t._chain()
    assert start == ckpt
    assert all(t._commit_view(v)[2] is None for v in chain)
    assert {r.k for r in t.read(spark).collect()} == set(range(1, 20, 2))
    # pre-checkpoint versions (incl. the applied DV commit) vacuum away
    assert t.vacuum() == [1, 2]


def test_dv_write_amplification_below_state_size(spark, tmp_path):
    # the DV selling point: a delete commit costs bytes proportional to
    # the DELETED ROW COUNT (two scalars per row), not to the table
    # state (CoW rewrite) nor to the key payload width
    t = MorTable(str(tmp_path / "t"), key="k")
    t.init(
        spark.range(5000).selectExpr(
            "id AS k", "repeat('x', 100) AS pad", "id * 2 AS v"
        )
    )
    dv_v = t.delete_where(spark, F.col("k") % 100 == 0)  # 50 rows
    assert t.delta_bytes(dv_v) < t.delta_bytes(1) / 10
    assert t.read(spark).count() == 4950


def test_dv_read_plan_broadcasts_dv_set(spark, tmp_path):
    # plan pin (PLANS.md marks the registered query n/a because it
    # returns a materialized result): the DV resolution joins the data
    # events against the position-delete set via BROADCAST — the DV set
    # is delete-sized, never data-sized — and adds no sort-merge join
    # (the only shuffle in a MoR read stays the latest-wins key window)
    t = _table(spark, tmp_path, n=50)
    t.merge(spark, spark.createDataFrame([(1, 111)], "k long, v long"))
    t.delete_where(spark, F.col("k") % 9 == 0)
    plan = t.read(spark)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_delete_positions_rejects_bad_schema(spark, tmp_path):
    t = _table(spark, tmp_path, n=5)
    with pytest.raises(Exception):
        t.delete_positions(
            spark, spark.createDataFrame([(1,)], "nope long")
        )
