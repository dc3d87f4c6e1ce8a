"""Commit-log/manifest layer (sinks/manifest.py): listing-free version
resolution (the round-9 verdict's top ask), crashed-writer heal,
stats-based file skipping, vacuum retirement, and MoR chain resolution
from manifests."""

from __future__ import annotations

import json
import os

import pytest

from pretalx_hub_etl_spark.sinks.manifest import (
    CommitLog,
    forget_committed,
)
from pretalx_hub_etl_spark.sinks.merge import MergeSink
from pretalx_hub_etl_spark.sinks.mor import MorTable


def _table(spark, tmp_path, n=100, cluster=None):
    sink = MergeSink(
        str(tmp_path / "t"), key="k", cluster_by=cluster
    )
    sink.init(
        spark.range(n).selectExpr("id AS k", "id * 10 AS v")
    )
    return sink


class _NoListing:
    """Forbid os.listdir/os.scandir/os.walk from OUR process during read
    paths — manifest resolution must touch only single files. (Spark's
    JVM lists on its side; the claim is about the Python metadata
    layer.)"""

    def __enter__(self):
        self.saved = (os.listdir, os.scandir, os.walk)

        def _boom(*a, **k):
            raise AssertionError(
                "directory listing on a manifest-table read path"
            )

        os.listdir = os.scandir = os.walk = _boom
        return self

    def __exit__(self, *exc):
        os.listdir, os.scandir, os.walk = self.saved


def test_reads_resolve_versions_without_listing(spark, tmp_path):
    sink = _table(spark, tmp_path)
    sink.merge(
        spark, spark.range(5).selectExpr("id AS k", "id * 100 AS v")
    )  # v2
    with _NoListing():
        cur = sink.read(spark)
        old = sink.read_version(spark, 1)
    assert cur.filter("k = 3").collect()[0].v == 300
    assert old.filter("k = 3").collect()[0].v == 30
    # version discovery itself is listing-free too
    with _NoListing():
        log = CommitLog(sink.path)
        assert log.exists()
        assert log.current_version() == 2
        assert log.versions() == [1, 2]


def test_manifest_records_files_stats_and_rows(spark, tmp_path):
    sink = _table(spark, tmp_path, n=1000, cluster=("k", 4))
    m = CommitLog(sink.path).manifest(1)
    assert m["version"] == 1 and not m["checkpoint"]
    assert len(m["files"]) == 4
    assert sum(f["rows"] for f in m["files"]) == 1000
    ks = sorted(
        (f["columns"]["k"]["min"], f["columns"]["k"]["max"])
        for f in m["files"]
    )
    # range clustering -> disjoint, ordered envelopes covering 0..999
    assert ks[0][0] == 0 and ks[-1][1] == 999
    for (lo1, hi1), (lo2, _hi2) in zip(ks, ks[1:]):
        assert hi1 < lo2


def test_stats_pruning_skips_files_and_keeps_answers(spark, tmp_path):
    sink = _table(spark, tmp_path, n=1000, cluster=("k", 8))
    df, scanned, skipped = sink.read_pruned(spark, "k", 0, 99)
    assert scanned + skipped == 8
    assert skipped >= 6  # bottom decile lives in 1 (maybe 2) of 8 ranges
    got = {r.k for r in df.filter("k <= 99").collect()}
    assert got == set(range(100))
    # pruning is sound on a non-clustered table too: envelopes overlap
    # everything, so nothing skips but nothing is lost
    loose = _table(spark, tmp_path / "loose", n=200)
    df2, scanned2, skipped2 = loose.read_pruned(spark, "k", 0, 10)
    assert skipped2 == 0 or {
        r.k for r in df2.filter("k <= 10").collect()
    } == set(range(11))


def test_multi_predicate_pruning_is_conjunctive_and_sound(spark, tmp_path):
    # two ANDed ranges: a file skips if EITHER is provably disjoint;
    # incomparable/missing stats keep the file (soundness)
    sink = MergeSink(
        str(tmp_path / "t"), key="k", cluster_by=("k", 8)
    )
    sink.init(
        spark.range(800).selectExpr("id AS k", "id % 10 AS grp")
    )
    log = CommitLog(sink.path)
    both, skipped = log.files_for(
        1, prune=[("k", 0, 99), ("grp", 0, 9)]
    )
    one, skipped_one = log.files_for(1, prune=("k", 0, 99))
    # grp spans 0..9 in every file -> adds no skipping; conjunction
    # must not over-prune
    assert (len(both), skipped) == (len(one), skipped_one)
    # a second conjunct that IS selective composes
    none, skipped_all = log.files_for(
        1, prune=[("k", 0, 99), ("k", 700, 799)]
    )
    assert none == [] and skipped_all == 8
    # unknown column: no stats -> keeps everything
    allf, sk = log.files_for(1, prune=("nope", 0, 1))
    assert sk == 0 and len(allf) == 8


def test_crashed_writer_heal_unblocks_next_commit(spark, tmp_path):
    sink = _table(spark, tmp_path)
    sink.merge(
        spark, spark.range(3).selectExpr("id AS k", "id AS v")
    )  # v2
    # simulate a writer that renamed v2 but died before publishing:
    # retract the manifest and regress the hint
    os.remove(os.path.join(sink.path, "_manifest", "2.json"))
    forget_committed(sink.path)  # a real crash loses the floor too
    with open(os.path.join(sink.path, "_manifest", "_latest"), "w") as fh:
        fh.write("1")
    assert CommitLog(sink.path).current_version() == 1
    # next merge heals v2 (publishes its manifest from the immutable
    # dir) and commits v3 computed against the healed state
    out = sink.merge(
        spark,
        spark.createDataFrame([(50, -1)], "k long, v long"),
    )
    assert CommitLog(sink.path).current_version() == 3
    rows = {r.k: r.v for r in out.collect()}
    assert rows[50] == -1 and rows[1] == 1  # v2's update visible


def test_torn_foreign_dir_is_stepped_over(spark, tmp_path):
    sink = _table(spark, tmp_path)
    torn = os.path.join(sink.path, "v2")
    os.makedirs(torn)
    with open(os.path.join(torn, "junk.parquet"), "wb") as fh:
        fh.write(b"garbage")
    out = sink.merge(
        spark, spark.createDataFrame([(0, 999)], "k long, v long")
    )
    assert {r.v for r in out.filter("k = 0").collect()} == {999}
    assert CommitLog(sink.path).current_version() == 3
    assert CommitLog(sink.path).versions() == [1, 3]


def test_vacuum_retires_manifests_and_time_travel_raises(spark, tmp_path):
    sink = _table(spark, tmp_path)
    for i in range(3):
        sink.merge(
            spark,
            spark.createDataFrame([(i, i * 1000)], "k long, v long"),
        )  # v2..v4
    assert sink.vacuum(keep_last=2) == [1, 2]
    log = CommitLog(sink.path)
    assert log.versions() == [3, 4]
    with _NoListing():
        assert sink.read(spark).count() == 100
    with pytest.raises(FileNotFoundError):
        sink.read_version(spark, 1)
    # manifest files for vacuumed versions are gone (no dangling ads)
    assert not os.path.exists(
        os.path.join(sink.path, "_manifest", "1.json")
    )


def test_mor_chain_resolves_from_manifests(spark, tmp_path):
    t = MorTable(str(tmp_path / "m"), key="k")
    t.init(spark.range(10).selectExpr("id AS k", "id AS v"))  # v1 ckpt
    t.merge(spark, spark.createDataFrame([(3, 33)], "k long, v long"))
    t.merge(spark, deletes=spark.createDataFrame([(5,)], "k long"))
    with _NoListing():
        state = {r.k: r.v for r in t.read(spark).collect()}
    assert state[3] == 33 and 5 not in state and len(state) == 9
    with _NoListing():
        changes = t.changes_since(spark, 1).collect()
    assert {(c["__op"], c["k"]) for c in changes} == {
        ("upsert", 3),
        ("delete", 5),
    }
    # compact publishes a checkpointed manifest; the chain restarts there
    v = t.compact(spark)
    m = CommitLog(t.path).manifest(v)
    assert m["checkpoint"]
    with _NoListing():
        assert t._chain()[0] == v
    assert t.delta_bytes(v) == sum(e["bytes"] for e in m["files"])


def test_partitioned_table_manifest_read_and_partition_pruning(
    spark, tmp_path
):
    # hive-partitioned table: the manifest records key=value path
    # segments as min=max stats, reads go through basePath so the
    # partition column survives the explicit-file-list scan, and
    # read_pruned can prune ON the partition column
    sink = MergeSink(
        str(tmp_path / "t"), key="k", partition_by=["grp"]
    )
    sink.init(
        spark.range(90).selectExpr(
            "id AS k", "CAST(id % 3 AS STRING) AS grp"
        )
    )
    m = CommitLog(sink.path).manifest(1)
    # TYPED partition stats: numeric-looking path values are stored as
    # numbers (raw strings would compare lexicographically — '10' < '2'
    # — and could unsoundly skip files for numeric predicates)
    grps = {f["columns"]["grp"]["min"] for f in m["files"]}
    assert grps == {0, 1, 2}
    assert all(
        f["columns"]["grp"]["min"] == f["columns"]["grp"]["max"]
        for f in m["files"]
    )
    with _NoListing():
        back = sink.read(spark)
    assert set(back.columns) == {"k", "grp"}
    assert back.filter("grp = '1'").count() == 30
    df, scanned, skipped = sink.read_pruned(spark, "grp", 2, 2)
    assert skipped > 0 and scanned < scanned + skipped
    # Spark's standard partition-column TYPE INFERENCE applies to the
    # basePath read exactly as it does to a plain directory scan: the
    # numeric-looking path value comes back as int (matching the typed
    # manifest stat the prune compared against)
    assert {r.grp for r in df.collect()} == {2}
    # mismatched predicate/stat types cannot skip (sound keep-path):
    # string bounds against the now-numeric partition stat scan all
    _, _, skipped_str = sink.read_pruned(spark, "grp", "2", "2")
    assert skipped_str == 0


def test_mor_as_of_read_replays_truncated_chain(spark, tmp_path):
    # the MoR face of time travel: as-of resolves the chain from the
    # newest checkpoint at-or-before the version, truncated at it —
    # and stays correct even after a LATER compaction checkpoints
    t = MorTable(str(tmp_path / "m"), key="k")
    t.init(spark.range(6).selectExpr("id AS k", "id AS v"))  # v1 ckpt
    t.merge(spark, spark.createDataFrame([(2, 22)], "k long, v long"))
    t.merge(spark, deletes=spark.createDataFrame([(4,)], "k long"))

    def state(as_of=None):
        return {r.k: r.v for r in t.read(spark, as_of=as_of).collect()}

    assert state(1) == {i: i for i in range(6)}
    assert state(2) == {0: 0, 1: 1, 2: 22, 3: 3, 4: 4, 5: 5}
    assert state(3) == state() == {0: 0, 1: 1, 2: 22, 3: 3, 5: 5}
    v4 = t.compact(spark)  # checkpoint AFTER the history
    assert state(2) == {0: 0, 1: 1, 2: 22, 3: 3, 4: 4, 5: 5}
    assert state(v4) == state()
    with pytest.raises(FileNotFoundError):
        t.read(spark, as_of=99)


def test_mor_chain_pointer_bounds_resolution_to_the_tail(spark, tmp_path):
    # the checkpoint_at pointer: resolving the chain after a compaction
    # must NOT probe every version since 1 — one manifest read + the
    # checkpoint..current tail
    t = MorTable(str(tmp_path / "m"), key="k")
    t.init(spark.range(5).selectExpr("id AS k", "id AS v"))  # v1 ckpt
    for i in range(6):
        t.merge(
            spark, spark.createDataFrame([(i, i * 7)], "k long, v long")
        )  # v2..v7
    v8 = t.compact(spark)
    t.merge(spark, spark.createDataFrame([(0, -1)], "k long, v long"))
    log = CommitLog(t.path)
    assert log.manifest(9)["checkpoint_at"] == v8
    start, chain = t._chain()
    assert (start, chain) == (8, [8, 9])
    # probe bound: count manifest-file existence checks during _chain —
    # with the pointer it touches only the tail, never versions 1..7
    probed = []
    orig = os.path.exists

    def counting_exists(p):
        if p.endswith(".json") and "_manifest" in p:
            probed.append(os.path.basename(p))
        return orig(p)

    os.path.exists = counting_exists
    try:
        t._chain()
    finally:
        os.path.exists = orig
    early = [p for p in probed if p in {f"{i}.json" for i in range(1, 8)}]
    assert early == [], f"probed pre-checkpoint versions: {early}"
    # state correctness unchanged
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got[0] == -1 and got[5] == 5 * 7


def test_optimize_restores_file_skipping_after_merges(spark, tmp_path):
    # unclustered table: MERGE output is hash-partitioned, envelopes
    # span the domain, pruning skips nothing; optimize() reclusters and
    # skipping returns — history untouched
    sink = MergeSink(str(tmp_path / "t"), key="k")
    sink.init(
        spark.range(1000)
        .selectExpr("id AS k", "id AS v")
        .repartition(8)
    )
    sink.merge(
        spark, spark.createDataFrame([(5, -5)], "k long, v long")
    )  # v2: hash-partitioned output
    _df, _scanned, skipped_before = sink.read_pruned(spark, "k", 0, 99)
    assert skipped_before == 0  # every file envelope spans the domain
    v = sink.optimize(spark, cluster_by=("k", 8))
    df, scanned, skipped = sink.read_pruned(spark, "k", 0, 99, version=v)
    assert skipped >= 6
    got = {r.k: r.v for r in df.filter("k <= 99").collect()}
    assert got[5] == -5 and len(got) == 100
    # history untouched: v2 still resolves with its own file set
    assert sink.read_version(spark, 2).count() == 1000


def test_zorder_layout_composes_with_manifest_pruning(spark, tmp_path):
    # LAY1 x S21: z-order the data BEFORE init, and the manifest's
    # per-file envelopes are tight on BOTH interleaved dimensions — so
    # read_pruned skips files on either column, and the two-conjunct
    # form skips at least as much as the better single dim. A
    # hash-partitioned layout of the same rows skips nothing.
    from pretalx_hub_etl_spark.operators.layout import cluster_by_zorder

    df = spark.range(4096).selectExpr(
        "CAST(id % 64 AS LONG) AS x", "CAST(id DIV 64 AS LONG) AS y",
        "id AS payload"
    )
    z = MergeSink(str(tmp_path / "z"), key="payload")
    z.init(cluster_by_zorder(df, ["x", "y"], num_partitions=16))
    _dfx, _sx, skip_x = z.read_pruned(spark, "x", 0, 7)
    _dfy, _sy, skip_y = z.read_pruned(spark, "y", 0, 7)
    assert skip_x > 0 and skip_y > 0  # BOTH dims skip under z-order
    log = CommitLog(z.path)
    files_both, skip_both = log.files_for(
        1, prune=[("x", 0, 7), ("y", 0, 7)]
    )
    assert skip_both >= max(skip_x, skip_y)
    # correctness: the pruned two-dim read still holds every matching row
    vdir = os.path.join(z.path, "v1")
    got = (
        spark.read.option("basePath", vdir).parquet(*files_both)
        .filter("x <= 7 AND y <= 7").count()
    )
    assert got == df.filter("x <= 7 AND y <= 7").count()
    # control: hash layout -> every file's envelope spans both domains
    h = MergeSink(str(tmp_path / "h"), key="payload")
    h.init(df.repartition(16))
    assert h.read_pruned(spark, "x", 0, 7)[2] == 0


def test_mor_crashed_publish_healed_by_next_delta(spark, tmp_path):
    # the CoW heal test's MoR twin: a delta whose publish crashed is
    # invisible until the next writer heals it; the healed manifest
    # lacks checkpoint_at (generic heal path) and _chain falls back to
    # the probe loop without losing the checkpoint
    t = MorTable(str(tmp_path / "m"), key="k")
    t.init(spark.createDataFrame([(1, 10)], "k long, v long"))
    t.merge(spark, spark.createDataFrame([(2, 20)], "k long, v long"))
    os.remove(os.path.join(t.path, "_manifest", "2.json"))
    forget_committed(t.path)  # a real crash loses the floor too
    with open(os.path.join(t.path, "_manifest", "_latest"), "w") as fh:
        fh.write("1")
    # crashed delta invisible
    assert {r.k for r in t.read(spark).collect()} == {1}
    t.merge(spark, spark.createDataFrame([(3, 30)], "k long, v long"))
    log = CommitLog(t.path)
    assert log.versions() == [1, 2, 3]  # v2 healed
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got == {1: 10, 2: 20, 3: 30}
    # healed manifest: no checkpoint_at -> _chain probe fallback works
    assert "checkpoint_at" not in log.manifest(2)
    assert t._chain() == (1, [1, 2, 3])


def test_mor_schema_evolution_union_across_chain(spark, tmp_path):
    # a later delta ADDS a column (append-only evolution): the resolved
    # read carries the union schema with NULL for rows that predate it
    # (pre-round-10 behavior silently DROPPED the new column), and the
    # change feed surfaces it the same way
    t = MorTable(str(tmp_path / "m"), key="k")
    t.init(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
    t.merge(
        spark,
        spark.createDataFrame(
            [(2, 22, "gold"), (3, 33, "new")],
            "k long, v long, tier string",
        ),
    )
    got = {r.k: (r.v, r.tier) for r in t.read(spark).collect()}
    assert got == {1: (10, None), 2: (22, "gold"), 3: (33, "new")}
    feed = t.changes_since(spark, 1).collect()
    assert {(r["__op"], r.k, r.tier) for r in feed} == {
        ("upsert", 2, "gold"),
        ("upsert", 3, "new"),
    }
    # tombstones still resolve against the evolved schema
    t.merge(spark, deletes=spark.createDataFrame([(2,)], "k long"))
    got = {r.k: (r.v, r.tier) for r in t.read(spark).collect()}
    assert got == {1: (10, None), 3: (33, "new")}


def test_mor_vacuum_removes_precheckpoint_history_only(spark, tmp_path):
    t = MorTable(str(tmp_path / "m"), key="k")
    t.init(spark.range(5).selectExpr("id AS k", "id AS v"))  # v1 ckpt
    t.merge(spark, spark.createDataFrame([(2, 22)], "k long, v long"))
    assert t.vacuum() == []  # newest checkpoint is v1: nothing below it
    v3 = t.compact(spark)
    t.merge(spark, spark.createDataFrame([(4, 44)], "k long, v long"))
    assert t.vacuum() == [1, 2]  # everything below the v3 checkpoint
    log = CommitLog(t.path)
    assert log.versions() == [3, 4]
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got == {0: 0, 1: 1, 2: 22, 3: 3, 4: 44}
    # history below the boundary is gone; at/above it still travels
    with pytest.raises(FileNotFoundError):
        t.read(spark, as_of=2)
    assert {r.k: r.v for r in t.read(spark, as_of=v3).collect()}[2] == 22


def test_concurrent_merges_no_lost_updates(spark, tmp_path):
    # the OCC + manifest claim under REAL concurrency: 4 threads race
    # 3 merges each (disjoint key ranges) against one table; rename
    # losers must recompute against the winner's state, so every one of
    # the 12 updates must survive into the final state and the commit
    # log must show one manifest per committed version with no gaps
    from concurrent.futures import ThreadPoolExecutor

    sink = MergeSink(str(tmp_path / "t"), key="k")
    sink.init(spark.range(100).selectExpr("id AS k", "CAST(0 AS LONG) AS v"))

    def writer(tid):
        for j in range(3):
            lo = tid * 25 + j * 5
            sink.merge(
                spark,
                spark.createDataFrame(
                    [(lo + i, tid * 1000 + j) for i in range(5)],
                    "k long, v long",
                ),
            )

    with ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(writer, range(4)))

    got = {r.k: r.v for r in sink.read(spark).collect()}
    for tid in range(4):
        for j in range(3):
            lo = tid * 25 + j * 5
            for i in range(5):
                assert got[lo + i] == tid * 1000 + j, (
                    f"lost update: key {lo + i}"
                )
    log = CommitLog(sink.path)
    assert log.current_version() == 13  # init + 12 merges
    assert log.versions() == list(range(1, 14))  # no gaps, all published


def test_mor_cdc_stream_restart_no_duplicates(spark, tmp_path):
    # checkpointed restart of the CDC stream: commits consumed before
    # the stop are not re-served, commits made while down are
    from pretalx_hub_etl_spark.sinks.mor import MorTable
    from pretalx_hub_etl_spark.sources.mor_stream import register

    register(spark)
    t = MorTable(str(tmp_path / "m"), key="k")
    t.init(spark.createDataFrame([(1, 10)], "k long, v long"))
    t.merge(spark, spark.createDataFrame([(2, 20)], "k long, v long"))
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def start():
        return (
            spark.readStream.format("mor_cdc")
            .option("path", t.path)
            .option("key", "k")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    # two commits while the consumer is down
    t.merge(spark, spark.createDataFrame([(3, 30)], "k long, v long"))
    t.merge(spark, deletes=spark.createDataFrame([(1,)], "k long"))
    q = start()
    q.processAllAvailable()
    q.stop()
    rows = spark.read.parquet(out).collect()
    got = sorted((r["__commit"], r["__op"], r.k) for r in rows)
    assert got == [
        (1, "upsert", 1),
        (2, "upsert", 2),
        (3, "upsert", 3),
        (4, "delete", 1),
    ]  # exactly once each — no re-serve, no gap


def test_manifest_json_is_small_and_self_contained(spark, tmp_path):
    # the 100-TB argument: resolution cost is one JSON object per
    # commit, independent of table size — pin the object's shape
    sink = _table(spark, tmp_path, n=500, cluster=("k", 4))
    p = os.path.join(sink.path, "_manifest", "1.json")
    with open(p) as fh:
        m = json.load(fh)
    assert set(m) == {"version", "checkpoint", "files", "committed_at"}
    for f in m["files"]:
        assert set(f) >= {"path", "role", "rows", "bytes", "columns"}
        assert not os.path.isabs(f["path"])  # relocatable table
    assert os.path.getsize(p) < 4096
