"""Round-15 pins: the read-your-own-writes fence (VERDICT r14 item 1),
the r14 ADVICE fixes — dense IDENTITY values (INT overflow / duplicate
wrap), merge()'s identity HWM scan fallback, the `_TXN` stamp on every
commit path's staged dir, the MoR optimize_zorder/compact lost-delta
window, and SHOW CREATE TABLE skipping `column_events`."""

from __future__ import annotations

import json
import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from pretalx_hub_etl_spark.sinks import mor as mor_mod
from pretalx_hub_etl_spark.sinks.manifest import (
    CommitLog,
    committed_floor,
    note_committed,
)
from pretalx_hub_etl_spark.sinks.merge import MergeSink
from pretalx_hub_etl_spark.sinks.mor import MorTable
from pretalx_hub_etl_spark.sinks.txn import LakehouseTransaction


def _mk(spark, path: str, lo: int, hi: int, key: str = "k") -> None:
    MergeSink(path, key=key).init(
        spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
    )


# --- ADVICE r14 (medium): IDENTITY via dense seq, not mid -------------------


def test_identity_int_multi_partition_no_overflow_no_dups(
    spark, tmp_path
):
    """monotonically_increasing_id() exceeds 2^33 on any >=2-partition
    frame: with ANSI on (the session default) every multi-partition
    INSERT into an INT identity table crashed with CAST_OVERFLOW, with
    ANSI off it wrapped mod 2^32 into duplicate ids. Dense per-partition
    offsets + local row_number fit the declared type whenever the row
    count does."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )

    path = str(tmp_path / "t")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE r15_idt (id INT GENERATED ALWAYS AS IDENTITY, "
        f"v BIGINT) USING lakehouse LOCATION '{path}' "
        f"TBLPROPERTIES (merge_key='v')"
    )
    spark.range(0, 400).selectExpr("id * 10 AS v").repartition(
        4
    ).createOrReplaceTempView("r15_src_a")
    cat.sql("INSERT INTO r15_idt (v) SELECT v FROM r15_src_a")
    spark.range(400, 700).selectExpr("id * 10 AS v").repartition(
        3
    ).createOrReplaceTempView("r15_src_b")
    cat.sql("INSERT INTO r15_idt (v) SELECT v FROM r15_src_b")
    row = cat.sql(
        "SELECT count(*) AS n, count(DISTINCT id) AS d, "
        "min(id) AS mn, max(id) AS mx FROM r15_idt"
    ).first()
    assert (row.n, row.d, row.mn, row.mx) == (700, 700, 1, 700)
    # merge-path inserts (NULL identity) stay unique and INT-ranged too
    MergeSink(path, key="v").merge(
        spark,
        spark.range(700, 760)
        .selectExpr("id * 10 AS v")
        .repartition(2),
    )
    row2 = cat.sql(
        "SELECT count(*) AS n, count(DISTINCT id) AS d, max(id) AS mx "
        "FROM r15_idt"
    ).first()
    assert row2.n == row2.d == 760
    assert row2.mx <= 2**31 - 1


def test_identity_merge_hwm_scan_fallback(spark, tmp_path):
    """ADVICE r14 (low): merge() derived the identity high-water mark
    from per-file stats only; a base file with LOST stats for the
    identity column silently lowered the HWM and new rows reused
    existing ids. The shared helper falls back to one scan."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )

    path = str(tmp_path / "t")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE r15_hwm (id BIGINT GENERATED ALWAYS AS IDENTITY,"
        f" v BIGINT) USING lakehouse LOCATION '{path}' "
        f"TBLPROPERTIES (merge_key='v')"
    )
    spark.range(0, 50).selectExpr("id * 10 AS v").createOrReplaceTempView(
        "r15_hwm_src"
    )
    cat.sql("INSERT INTO r15_hwm (v) SELECT v FROM r15_hwm_src")
    log = CommitLog(path)
    base = log.current_version()
    # strip the identity column's range stats from every file entry
    # (simulates a writer that couldn't compute them) — rows stay
    mpath = os.path.join(path, "_manifest", f"{base}.json")
    m = json.load(open(mpath))
    for ent in m["files"]:
        st = ent.get("columns", {}).get("id")
        if st is not None:
            st["min"] = None
            st["max"] = None
            st["null_count"] = 0
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    # merge-insert new keys: without the scan fallback the HWM reads 0
    # and ids 1.. duplicate the existing 1..50
    MergeSink(path, key="v").merge(
        spark, spark.range(50, 60).selectExpr("id * 10 AS v")
    )
    row = cat.sql(
        "SELECT count(*) AS n, count(DISTINCT id) AS d FROM r15_hwm"
    ).first()
    assert row.n == row.d == 60


# --- ADVICE r14 (low): _TXN stamp on every commit path ----------------------


def test_append_heal_keeps_inherited_txn_marker(
    spark, tmp_path, monkeypatch
):
    """append() (and the other non-merge commit paths) attached
    txn_inherited only to the in-memory manifest; a crash between the
    rename claim and publish, healed by the next writer, rebuilt the
    manifest WITHOUT the marker — making pending transaction data
    visible early. The `_TXN` stamp now rides in the staged dir."""
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    coord = str(tmp_path / "_txn")
    _mk(spark, a, 0, 10)
    _mk(spark, b, 100, 105)

    # pending txn head on table a (publish v2 with marker, no committed
    # marker: crash the coordinator right after the first publish)
    txn = LakehouseTransaction(coord)
    txn.stage_append(
        a,
        spark.range(50, 53).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ),
    )
    txn.stage_append(
        b,
        spark.range(150, 153).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ),
    )
    real_publish = CommitLog.publish
    state = {"published": 0}

    class _Boom(RuntimeError):
        pass

    def crash_after_first(self, manifest):
        real_publish(self, manifest)
        if manifest.get("txn"):
            state["published"] += 1
            if state["published"] == 1:
                raise _Boom("injected post-publish crash")

    monkeypatch.setattr(CommitLog, "publish", crash_after_first)
    with pytest.raises(_Boom):
        txn.commit()
    monkeypatch.setattr(CommitLog, "publish", real_publish)
    log = CommitLog(a)
    assert log.manifest(log.current_version()).get("txn")

    # a regular append on the pending head, crashed between rename and
    # publish; then a second writer heals it
    def crash_publish(self, manifest):
        raise _Boom("injected pre-publish crash")

    monkeypatch.setattr(CommitLog, "publish", crash_publish)
    with pytest.raises(_Boom):
        MergeSink(a, key="k").append(
            spark.range(60, 63).select(
                F.col("id").alias("k"), (F.col("id") * 10).alias("v")
            )
        )
    monkeypatch.setattr(CommitLog, "publish", real_publish)
    claimed = log._probe_version() + 1
    assert os.path.exists(os.path.join(a, f"v{claimed}", "_SUCCESS"))
    MergeSink(a, key="k").append(
        spark.range(70, 72).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
    )
    healed = log.manifest(claimed)
    assert any(
        t.get("id") == txn.id for t in healed.get("txn_inherited", [])
    ), healed
    # pending rows still invisible through the healed commit
    ks = sorted(
        r["k"] for r in MergeSink(a, key="k").read(spark).collect()
    )
    assert ks == list(range(10))


# --- ADVICE r14 (low): MoR optimize_zorder lost-delta window ----------------


def test_mor_optimize_zorder_includes_racing_delta(
    spark, tmp_path, monkeypatch
):
    """A delta committed between optimize_zorder's state read and its
    claim landed BELOW the claim: the checkpoint rename succeeded and
    silently excluded the delta's rows. The version is now re-checked
    at claim time and the state re-read."""
    path = str(tmp_path / "m")
    MorTable(path, key="k").init(
        spark.range(0, 20).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
    )
    t = MorTable(path, key="k")
    real_bc = mor_mod._base_and_claim
    fired = {"n": 0}

    def delta_then_claim(p):
        if fired["n"] == 0:
            fired["n"] = 1
            MorTable(path, key="k").merge(
                spark,
                source=spark.range(500, 503).select(
                    F.col("id").alias("k"), (F.col("id") * 10).alias("v")
                ),
            )
        return real_bc(p)

    monkeypatch.setattr(mor_mod, "_base_and_claim", delta_then_claim)
    t.optimize_zorder(spark, ["k"], bits=8)
    monkeypatch.setattr(mor_mod, "_base_and_claim", real_bc)
    ks = sorted(r["k"] for r in t.read(spark).collect())
    assert ks == list(range(20)) + [500, 501, 502]


def test_mor_compact_includes_racing_delta(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "m")
    MorTable(path, key="k").init(
        spark.range(0, 10).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
    )
    t = MorTable(path, key="k")
    real_bc = mor_mod._base_and_claim
    fired = {"n": 0}

    def delta_then_claim(p):
        if fired["n"] == 0:
            fired["n"] = 1
            MorTable(path, key="k").merge(
                spark,
                source=spark.range(900, 902).select(
                    F.col("id").alias("k"), (F.col("id") * 10).alias("v")
                ),
            )
        return real_bc(p)

    monkeypatch.setattr(mor_mod, "_base_and_claim", delta_then_claim)
    t.compact(spark)
    monkeypatch.setattr(mor_mod, "_base_and_claim", real_bc)
    ks = sorted(r["k"] for r in t.read(spark).collect())
    assert ks == list(range(10)) + [900, 901]


# --- VERDICT r14 item 1: read-your-own-writes fence --------------------------


def test_ryow_fence_retries_until_manifest_visible(spark, tmp_path):
    """Simulated lagging filesystem: the just-published head manifest
    is hidden (renamed away) after commit — exactly what a reader on a
    delayed-visibility FS sees. The fence must retry (listdir-busted
    probes) and serve the CORRECT version once the file appears,
    instead of silently serving the stale snapshot."""
    path = str(tmp_path / "t")
    _mk(spark, path, 0, 10)
    sink = MergeSink(path, key="k")
    sink.append(
        spark.range(50, 55).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
    )
    log = CommitLog(path)
    head = log.current_version()
    assert committed_floor(path) == head
    mpath = os.path.join(path, "_manifest", f"{head}.json")
    hidden = mpath + ".hidden"
    os.rename(mpath, hidden)

    def restore():
        time.sleep(0.4)
        os.rename(hidden, mpath)

    th = threading.Thread(target=restore)
    th.start()
    try:
        # current_version blocks behind the fence until restore lands
        assert log.current_version() == head
        ks = sorted(r["k"] for r in sink.read(spark).collect())
        assert ks == list(range(10)) + list(range(50, 55))
    finally:
        th.join()


def test_ryow_fence_raises_with_diagnostics_when_stale(tmp_path):
    """A floor violation that never resolves must raise (with the
    manifest listing in the message), never serve the stale snapshot."""
    path = str(tmp_path / "t")
    mdir = os.path.join(path, "_manifest")
    os.makedirs(mdir)
    log = CommitLog(path)
    log.publish({"version": 1, "checkpoint": False, "files": []})
    note_committed(path, 99)
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="read-your-own-writes"):
        log.current_version()
    assert time.monotonic() - t0 >= 5.0  # it really retried
    # evidence in-message: listing tail + the stale version
    note_committed(path, 0)  # no-op (floor never regresses via note)
    from pretalx_hub_etl_spark.sinks import manifest as man_mod

    man_mod._COMMITTED_FLOOR.pop(os.path.realpath(path), None)
    assert log.current_version() == 1


def test_ryow_floor_cleared_on_table_recreate(spark, tmp_path):
    """A dropped-and-recreated table at the same path must not inherit
    the old table's floor (tests/tools rmtree table roots directly)."""
    import shutil

    path = str(tmp_path / "t")
    _mk(spark, path, 0, 5)
    MergeSink(path, key="k").append(
        spark.range(5, 8).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
    )
    assert committed_floor(path) >= 2
    shutil.rmtree(path)
    _mk(spark, path, 100, 103)  # fresh table, same path
    ks = sorted(
        r["k"] for r in MergeSink(path, key="k").read(spark).collect()
    )
    assert ks == [100, 101, 102]


def test_datasource_read_passes_min_version_floor(spark, tmp_path):
    """The catalog attaches the floor to DataSource reads; a worker
    whose FS view lags retries until the manifest appears."""
    from pretalx_hub_etl_spark.sources.lakehouse_ds import (
        register,
        write_table,
    )

    path = str(tmp_path / "t")
    _mk(spark, path, 0, 10)
    register(spark)
    write_table(
        spark.range(50, 53).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ),
        path,
        mode="append",
    )
    # write_table fenced the writing process forward: floor == head
    log = CommitLog(path)
    assert committed_floor(path) == log.current_version()
    df = (
        spark.read.format("lakehouse")
        .option("path", path)
        .option("min_version", str(log.current_version()))
        .load()
    )
    assert df.count() == 13


# --- ADVICE r14 (low): SHOW CREATE skips column_events ----------------------


def test_show_create_skips_column_events(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )

    path = str(tmp_path / "t")
    _mk(spark, path, 0, 5)
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("r15_sc", path)
    cat.sql("ALTER TABLE r15_sc RENAME COLUMN v TO val")
    stmt = cat.sql("SHOW CREATE TABLE r15_sc").first()[0]
    assert "column_events" not in stmt
    # the emitted statement round-trips: re-executing it re-attaches
    # the table (props on disk keep the mapping) and reads still serve
    # the renamed column
    cat2 = LakehouseSqlCatalog(spark)
    cat2.sql(
        stmt.replace(
            "CREATE TABLE r15_sc",
            "CREATE TABLE IF NOT EXISTS r15_sc2",
        )
    )
    cols = cat2.sql("SELECT * FROM r15_sc2").columns
    assert "val" in cols and "v" not in cols
    evs = CommitLog(path).table_props().get("column_events")
    assert isinstance(evs, list) and all(
        isinstance(e, dict) for e in evs
    )


# --- round-15 features (VERDICT r14 items 2-5) -------------------------------


def test_racing_txns_never_mint_same_identity(spark, tmp_path):
    """S49b: two transactions staging appends into one IDENTITY table
    commit concurrently — publish-time assignment under the OCC claim
    re-stages the loser above the winner's high-water mark, so ids
    stay unique across both."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )

    path = str(tmp_path / "t")
    coord = str(tmp_path / "_txn")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE r15_race (id BIGINT GENERATED ALWAYS AS "
        f"IDENTITY, v BIGINT) USING lakehouse LOCATION '{path}' "
        f"TBLPROPERTIES (merge_key='v')"
    )
    spark.range(0, 20).selectExpr("id * 10 AS v").createOrReplaceTempView(
        "r15_race_seed"
    )
    cat.sql("INSERT INTO r15_race (v) SELECT v FROM r15_race_seed")

    txns = []
    for i in (1, 2):
        txn = LakehouseTransaction(coord)
        txn.stage_append(
            path,
            spark.range(1000 * i, 1000 * i + 15).selectExpr("id AS v"),
        )
        txns.append(txn)
    errs: list[BaseException] = []

    def commit(txn):
        try:
            txn.commit()
        except BaseException as exc:  # noqa: BLE001
            errs.append(exc)

    ts = [threading.Thread(target=commit, args=(t,)) for t in txns]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    assert not errs, errs
    row = cat.sql(
        "SELECT count(*) AS n, count(DISTINCT id) AS d, max(id) AS mx "
        "FROM r15_race"
    ).first()
    assert row.n == row.d == 50 and row.mx == 50, row


def test_cdf_span_with_maintenance_commit_stays_on_feed(spark, tmp_path):
    """S51 + r16: a span containing an OPTIMIZE commit stays on the
    O(changes) feed fast path — the maintenance rewrite is stamped
    ``data_change: false`` (same logical content), so it contributes
    zero events instead of forcing the O(table) snapshot fallback."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )
    from pretalx_hub_etl_spark.sinks.merge import version_diff

    path = str(tmp_path / "t")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE r15_cdf (k BIGINT, v BIGINT) USING lakehouse "
        f"LOCATION '{path}' TBLPROPERTIES (merge_key='k', cdf='true')"
    )
    spark.range(0, 30).selectExpr(
        "id AS k", "id * 10 AS v"
    ).createOrReplaceTempView("r15_cdf_seed")
    cat.sql("INSERT INTO r15_cdf SELECT k, v FROM r15_cdf_seed")  # v1
    cat.sql("UPDATE r15_cdf SET v = v + 1 WHERE k % 5 = 0")  # v2 (cdf)
    cat.sql("OPTIMIZE r15_cdf ZORDER BY (k)")  # v3: data_change=false
    cat.sql("DELETE FROM r15_cdf WHERE k >= 25")  # v4 (cdf)
    diff = version_diff(spark, path, "k", 1, 4)
    rows = {r["k"]: r["change"] for r in diff.collect()}
    exp = {k: "update" for k in range(0, 25, 5)}
    exp.update({k: "delete" for k in range(25, 30)})
    assert rows == exp, rows
    # the whole span (maintenance commit included) serves feed-only
    files = diff.inputFiles()
    assert files and all("/cdf/" in f for f in files), files[:3]
    # and a clean sub-span still does too
    sub = version_diff(spark, path, "k", 1, 2)
    files = sub.inputFiles()
    assert files and all("/cdf/" in f for f in files), files[:3]


def test_delete_subquery_condition_keeps_merge_route(spark, tmp_path):
    """S50: a DELETE whose condition carries a subquery resolves
    through the full read surface (MERGE route) and still deletes the
    right rows."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )

    path = str(tmp_path / "t")
    _mk(spark, path, 0, 30)
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("r15_delq", path)
    spark.range(10, 15).selectExpr("id AS k").createOrReplaceTempView(
        "r15_bad"
    )
    cat.sql(
        "DELETE FROM r15_delq WHERE k IN (SELECT k FROM r15_bad)"
    )
    ks = sorted(r["k"] for r in cat.sql("SELECT k FROM r15_delq").collect())
    assert ks == list(range(10)) + list(range(15, 30))


def test_update_condition_on_assigned_column_uses_pre_values(
    spark, tmp_path
):
    """S50: the file-granular UPDATE's predicate evaluates against
    PRE-update values even when it references an assigned column."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )

    path = str(tmp_path / "t")
    _mk(spark, path, 0, 10)  # v = k*10
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("r15_updpre", path)
    cat.sql("UPDATE r15_updpre SET v = v + 100 WHERE v < 50")
    got = {
        r["k"]: r["v"]
        for r in cat.sql("SELECT k, v FROM r15_updpre").collect()
    }
    exp = {k: k * 10 + (100 if k * 10 < 50 else 0) for k in range(10)}
    assert got == exp, got


def test_replace_where_writes_cdf_events(spark, tmp_path):
    """S51 on S48: replaceWhere with cdf='true' records the replaced
    region's net change; the feed serves the span without touching
    base data files."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )
    from pretalx_hub_etl_spark.sinks.merge import (
        MergeSink,
        version_diff,
    )

    path = str(tmp_path / "t")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE r15_rwcdf (k BIGINT, v BIGINT) USING lakehouse "
        f"LOCATION '{path}' TBLPROPERTIES (merge_key='k', cdf='true')"
    )
    spark.range(0, 30).selectExpr(
        "id AS k", "id * 10 AS v"
    ).createOrReplaceTempView("r15_rw_seed")
    cat.sql("INSERT INTO r15_rwcdf SELECT k, v FROM r15_rw_seed")  # v1
    repl = spark.createDataFrame(
        [(k, k * 10 + 1) for k in range(20, 26)] + [(35, 351)],
        "k long, v long",
    )
    MergeSink(path, key="k").replace_where(repl, "k >= 20")  # v2
    d = version_diff(spark, path, "k", 1, 2)
    files = d.inputFiles()
    assert files and all("/cdf/" in f for f in files), files[:3]
    rows = {r["k"]: (r["change"], r["new"]["v"] if r["new"] else None)
            for r in d.collect()}
    exp = {k: ("update", k * 10 + 1) for k in range(20, 26)}
    exp.update({k: ("delete", None) for k in range(26, 30)})
    exp[35] = ("insert", 351)
    assert rows == exp, rows
    # DESCRIBE HISTORY carries the replace metrics
    h = cat.sql("DESCRIBE HISTORY r15_rwcdf").collect()[0]
    assert h.operation == "replace_where" and h.files_rewritten >= 1


def test_widen_pruning_stays_sound_and_effective(spark, tmp_path):
    """S52: manifest stats written under the NARROW type still prune
    long-range predicates after the widen (python int compare is
    width-agnostic): narrow files skip for a wide-only range, and no
    wide row is lost."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )
    from pretalx_hub_etl_spark.sinks.manifest import UNBOUNDED_HI

    path = str(tmp_path / "t")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE r15_wprune (k BIGINT, v INT) USING lakehouse "
        f"LOCATION '{path}' TBLPROPERTIES (merge_key='k')"
    )
    spark.range(0, 20).selectExpr(
        "id AS k", "CAST(id AS INT) AS v"
    ).createOrReplaceTempView("r15_wp_narrow")
    cat.sql("INSERT INTO r15_wprune SELECT k, v FROM r15_wp_narrow")
    cat.sql("ALTER TABLE r15_wprune ALTER COLUMN v TYPE BIGINT")
    spark.range(20, 25).selectExpr(
        "id AS k", "id + 6000000000 AS v"
    ).createOrReplaceTempView("r15_wp_wide")
    cat.sql("INSERT INTO r15_wprune SELECT k, v FROM r15_wp_wide")
    log = CommitLog(path)
    cur = log.current_version()
    kept, skipped = log.files_for(
        cur, prune=[("v", 5_000_000_000, UNBOUNDED_HI)]
    )
    assert skipped >= 1, (kept, skipped)  # narrow files provably out
    got = {
        r["k"]: r["v"]
        for r in cat.sql(
            "SELECT k, v FROM r15_wprune WHERE v > 5000000000"
        ).collect()
    }
    assert got == {k: k + 6000000000 for k in range(20, 25)}, got


def test_cdf_stream_raises_on_feedless_version(spark, tmp_path):
    """ST19: a mid-stream version that CHANGED DATA without recording
    change events (here: a commit from before cdf='true' was enabled)
    fails LOUDLY — silently skipping it would drop changes. (An
    OPTIMIZE no longer triggers this: it is data_change=false and
    crosses as zero events — r16, pinned in test_round16.py.)"""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )
    from pretalx_hub_etl_spark.sinks.manifest import CommitLog
    from pretalx_hub_etl_spark.sources.lakehouse_ds import (
        cdf_read_schema,
        pin_active_session,
        register,
    )

    register(spark)
    pin_active_session(spark)
    path = str(tmp_path / "t")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE r15_sfeed (k BIGINT, v BIGINT) USING lakehouse "
        f"LOCATION '{path}' TBLPROPERTIES (merge_key='k')"
    )
    spark.range(0, 12).selectExpr(
        "id AS k", "id * 10 AS v"
    ).createOrReplaceTempView("r15_sf_seed")
    cat.sql("INSERT INTO r15_sfeed SELECT k, v FROM r15_sf_seed")  # v1
    cat.sql("UPDATE r15_sfeed SET v = v + 1 WHERE k < 3")  # v2: no feed
    log = CommitLog(path)
    props = log.table_props()
    props["cdf"] = "true"  # enabled AFTER history exists
    log.write_table_props(props)
    cat.sql("UPDATE r15_sfeed SET v = v + 1 WHERE k >= 9")  # v3 (cdf)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = (
        spark.readStream.format("lakehouse")
        .schema(cdf_read_schema(path))
        .option("path", path)
        .option("readChangeFeed", "true")
        .option("startingVersion", "2")  # v2 changed data, no events
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        with pytest.raises(Exception, match="no change data"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_file_granular_dml_on_partitioned_table(spark, tmp_path):
    """S50 on a hive-partitioned table: partition-disjoint files
    relink, the rewrite honors the stored layout, and values stay
    bound to the DECLARED column order."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )

    path = str(tmp_path / "t")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE r15_pdml (k BIGINT, p BIGINT, v BIGINT) USING "
        f"lakehouse LOCATION '{path}' TBLPROPERTIES (merge_key='k', "
        f"partition_by='p')"
    )
    spark.range(0, 40).selectExpr(
        "id AS k", "id % 4 AS p", "id * 10 AS v"
    ).createOrReplaceTempView("r15_pdml_src")
    cat.sql("INSERT INTO r15_pdml SELECT k, p, v FROM r15_pdml_src")
    cat.sql("DELETE FROM r15_pdml WHERE p = 1")
    cat.sql("UPDATE r15_pdml SET v = v + 5 WHERE p = 2")
    hist = {
        r.version: r
        for r in cat.sql("DESCRIBE HISTORY r15_pdml").collect()
    }
    # partition pruning makes both DMLs file-granular
    assert hist[2].operation == "delete" and hist[2].files_relinked >= 2
    assert hist[3].operation == "update" and hist[3].files_relinked >= 2
    got = {
        r["k"]: (r["p"], r["v"])
        for r in cat.sql("SELECT k, p, v FROM r15_pdml").collect()
    }
    exp = {
        k: (k % 4, k * 10 + (5 if k % 4 == 2 else 0))
        for k in range(40)
        if k % 4 != 1
    }
    assert got == exp, got


def test_file_granular_update_on_renamed_column(spark, tmp_path):
    """S50 + S46: the predicate and SET reference the LOGICAL (renamed)
    name; prune translation reaches old-name stats and old files'
    values survive the rewrite."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )

    path = str(tmp_path / "t")
    _mk(spark, path, 0, 20)  # columns (k, v)
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("r15_rdml", path)
    cat.sql("ALTER TABLE r15_rdml RENAME COLUMN v TO amount")
    cat.sql("UPDATE r15_rdml SET amount = amount + 3 WHERE k < 5")
    cat.sql("DELETE FROM r15_rdml WHERE amount >= 150")
    got = {
        r["k"]: r["amount"]
        for r in cat.sql("SELECT k, amount FROM r15_rdml").collect()
    }
    exp = {
        k: k * 10 + (3 if k < 5 else 0)
        for k in range(20)
        if k * 10 + (3 if k < 5 else 0) < 150
    }
    assert got == exp, got


def test_cdf_reconstruction_equals_snapshot_diff_randomized(
    spark, tmp_path
):
    """S51 equivalence property: for random DML lifecycles, the net
    diff reconstructed from per-commit feed files EQUALS the snapshot
    full-outer diff — same keys, same classification, same images."""
    import random

    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )
    from pretalx_hub_etl_spark.sinks.merge import (
        MergeSink,
        _diff_frames,
        version_diff,
    )

    rng = random.Random(4151)
    for trial in range(3):
        path = str(tmp_path / f"t{trial}")
        cat = LakehouseSqlCatalog(spark)
        name = f"r15_eq{trial}"
        cat.sql(
            f"CREATE TABLE {name} (k BIGINT, v BIGINT) USING lakehouse "
            f"LOCATION '{path}' TBLPROPERTIES (merge_key='k', "
            f"cdf='true')"
        )
        spark.range(0, 40).selectExpr(
            "id AS k", "id * 10 AS v"
        ).createOrReplaceTempView(f"r15_eq_seed{trial}")
        cat.sql(
            f"INSERT INTO {name} SELECT k, v FROM r15_eq_seed{trial}"
        )
        sink = MergeSink(path, key="k")
        for _c in range(4):
            op = rng.choice(["update", "delete", "merge", "insert"])
            a, b = sorted(rng.sample(range(0, 60), 2))
            if op == "update":
                cat.sql(
                    f"UPDATE {name} SET v = v + {rng.randint(1, 9)} "
                    f"WHERE k BETWEEN {a} AND {b}"
                )
            elif op == "delete":
                cat.sql(
                    f"DELETE FROM {name} WHERE k BETWEEN {a} AND {b}"
                )
            elif op == "insert":
                spark.range(a + 60, a + 66).selectExpr(
                    "id AS k", "id * 7 AS v"
                ).createOrReplaceTempView(f"r15_eq_ins{trial}")
                cat.sql(
                    f"INSERT INTO {name} SELECT k, v "
                    f"FROM r15_eq_ins{trial}"
                )
            else:
                sink.merge(
                    spark,
                    spark.range(a, a + 8).selectExpr(
                        "id AS k", f"id * 13 + {_c} AS v"
                    ),
                )
        log = CommitLog(path)
        hi = log.current_version()
        fast = version_diff(spark, path, "k", 1, hi)
        assert fast.inputFiles() and all(
            "/cdf/" in f for f in fast.inputFiles()
        ), "expected the feed fast path"
        slow = _diff_frames(
            sink.read_version(spark, 1),
            sink.read_version(spark, hi),
            "k",
        )
        f_rows = {
            r["k"]: (r["change"], r["old"], r["new"])
            for r in fast.collect()
        }
        s_rows = {
            r["k"]: (r["change"], r["old"], r["new"])
            for r in slow.collect()
        }
        assert f_rows == s_rows, (
            trial,
            {k: (f_rows.get(k), s_rows.get(k))
             for k in set(f_rows) ^ set(s_rows) or set(
                 k for k in f_rows if f_rows[k] != s_rows.get(k)
             )},
        )


def test_cdf_stream_restart_resumes_without_duplicates(
    spark, tmp_path
):
    """ST19: a stopped change-feed stream resumes from its checkpoint —
    later commits stream exactly once, nothing replays."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )
    from pretalx_hub_etl_spark.sources.lakehouse_ds import (
        cdf_read_schema,
        pin_active_session,
        register,
    )

    register(spark)
    pin_active_session(spark)
    path = str(tmp_path / "t")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE r15_sres (k BIGINT, v BIGINT) USING lakehouse "
        f"LOCATION '{path}' TBLPROPERTIES (merge_key='k', cdf='true')"
    )
    spark.range(0, 10).selectExpr(
        "id AS k", "id * 10 AS v"
    ).createOrReplaceTempView("r15_sres_seed")
    cat.sql("INSERT INTO r15_sres SELECT k, v FROM r15_sres_seed")
    cat.sql("UPDATE r15_sres SET v = v + 1 WHERE k < 3")

    def run_once():
        q = (
            spark.readStream.format("lakehouse")
            .schema(cdf_read_schema(path))
            .option("path", path)
            .option("readChangeFeed", "true")
            .load()
            .selectExpr("k", "change", "_commit_version AS cv")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()  # drains v1 (seed inserts) + v2 (updates)
    cat.sql("DELETE FROM r15_sres WHERE k >= 8")  # v3 after the stop
    run_once()  # must serve ONLY v3
    rows = [
        (r["k"], r["change"], r["cv"])
        for r in spark.read.parquet(out).collect()
    ]
    exp = (
        [(k, "insert", 1) for k in range(10)]
        + [(k, "update", 2) for k in range(3)]
        + [(k, "delete", 3) for k in (8, 9)]
    )
    assert sorted(rows) == sorted(exp), sorted(rows)


def test_restore_writes_cdf_and_never_replays_source_feed(
    spark, tmp_path
):
    """S51 on RESTORE: the rollback emits its own net-diff events and
    NEVER carries the restored version's cdf/ member forward (which
    would double-serve that commit's events)."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )
    from pretalx_hub_etl_spark.sinks.merge import (
        MergeSink,
        version_diff,
    )

    path = str(tmp_path / "t")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE r15_rst (k BIGINT, v BIGINT) USING lakehouse "
        f"LOCATION '{path}' TBLPROPERTIES (merge_key='k', cdf='true')"
    )
    spark.range(0, 12).selectExpr(
        "id AS k", "id * 10 AS v"
    ).createOrReplaceTempView("r15_rst_seed")
    cat.sql("INSERT INTO r15_rst SELECT k, v FROM r15_rst_seed")  # v1
    cat.sql("UPDATE r15_rst SET v = v + 1 WHERE k < 4")  # v2 (cdf)
    cat.sql("DELETE FROM r15_rst WHERE k >= 10")  # v3 (cdf)
    MergeSink(path, key="k").restore(spark, 2)  # v4: back to post-update
    log = CommitLog(path)
    m4 = log.manifest(4)
    assert m4.get("cdf") and m4.get("op") == "restore"
    # v4's events are the UNDO of v3 only (k 10, 11 re-inserted)
    d = version_diff(spark, path, "k", 3, 4)
    rows = {r["k"]: r["change"] for r in d.collect()}
    assert rows == {10: "insert", 11: "insert"}, rows
    # the whole feed span nets correctly across the restore
    d_all = version_diff(spark, path, "k", 1, 4)
    assert d_all.inputFiles() and all(
        "/cdf/" in f for f in d_all.inputFiles()
    )
    rows_all = {r["k"]: (r["change"], r["new"]["v"])
                for r in d_all.collect()}
    assert rows_all == {k: ("update", k * 10 + 1) for k in range(4)}, (
        rows_all
    )
    # no duplicated v2 member inside v4's file set
    assert all(
        e.get("role", "data") == "data" or "/v4/" not in e["path"]
        for e in m4["files"]
    )
    got = {
        r["k"]: r["v"]
        for r in cat.sql("SELECT k, v FROM r15_rst").collect()
    }
    exp = {k: k * 10 + (1 if k < 4 else 0) for k in range(12)}
    assert got == exp, got


def test_widen_matrix_edges(spark, tmp_path):
    """S52: float->double widens; cross-family and narrowing refuse."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )

    path = str(tmp_path / "t")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE r15_wm (k BIGINT, f FLOAT, s STRING) USING "
        f"lakehouse LOCATION '{path}' TBLPROPERTIES (merge_key='k')"
    )
    spark.sql(
        "SELECT id AS k, CAST(id AS FLOAT) / 4 AS f, "
        "CAST(id AS STRING) AS s FROM range(8)"
    ).createOrReplaceTempView("r15_wm_src")
    cat.sql("INSERT INTO r15_wm SELECT k, f, s FROM r15_wm_src")
    cat.sql("ALTER TABLE r15_wm ALTER COLUMN f TYPE DOUBLE")
    cur = cat.sql("SELECT * FROM r15_wm")
    assert cur.schema["f"].dataType.simpleString() == "double"
    assert cur.count() == 8
    for bad in (
        "ALTER TABLE r15_wm ALTER COLUMN s TYPE BIGINT",  # cross-family
        "ALTER TABLE r15_wm ALTER COLUMN f TYPE FLOAT",  # narrowing
        "ALTER TABLE r15_wm ALTER COLUMN k TYPE INT",  # narrowing
    ):
        with pytest.raises(ValueError, match="not a widening"):
            cat.sql(bad)


def test_file_granular_update_matches_ground_truth_randomized(
    spark, tmp_path
):
    """S50 equivalence property: random ranged UPDATEs/DELETEs through
    the file-granular route match an independently computed ground
    truth (dict replay)."""
    import random

    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )
    from pretalx_hub_etl_spark.sinks.merge import MergeSink

    rng = random.Random(515)
    path = str(tmp_path / "t")
    MergeSink(path, key="k", cluster_by=("k", 6)).init(
        spark.range(0, 120).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("r15_fuzz", path)
    truth = {k: k * 10 for k in range(120)}
    for _ in range(6):
        a, b = sorted(rng.sample(range(0, 120), 2))
        if rng.random() < 0.5:
            m = rng.randint(1, 9)
            cat.sql(
                f"UPDATE r15_fuzz SET v = v * 2 + {m} "
                f"WHERE k BETWEEN {a} AND {b}"
            )
            for k in list(truth):
                if a <= k <= b:
                    truth[k] = truth[k] * 2 + m
        else:
            cat.sql(
                f"DELETE FROM r15_fuzz WHERE k BETWEEN {a} AND {b} "
                f"AND v % 2 = 1"
            )
            for k in list(truth):
                if a <= k <= b and truth[k] % 2 == 1:
                    del truth[k]
    got = {
        r["k"]: r["v"]
        for r in cat.sql("SELECT k, v FROM r15_fuzz").collect()
    }
    assert got == truth, {
        k: (got.get(k), truth.get(k))
        for k in set(got) ^ set(truth)
        or [k for k in got if got[k] != truth.get(k)][:5]
    }
