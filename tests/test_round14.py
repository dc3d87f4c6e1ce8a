"""Round-14 pins: the r13 ADVICE txn-protocol fixes (heal keeps the txn
marker across the rename->publish crash window; atomic intent creation;
torn-intent quarantine), the pending-only-table read fallback, and the
TBLPROPERTIES family-prefix case fold."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pretalx_hub_etl_spark.sinks import txn as txn_mod
from pretalx_hub_etl_spark.sinks.manifest import CommitLog
from pretalx_hub_etl_spark.sinks.merge import MergeSink
from pretalx_hub_etl_spark.sinks.txn import (
    LakehouseTransaction,
    gc,
    heal,
)


def _mk_table(spark, path: str, lo: int, hi: int) -> None:
    MergeSink(path, key="k").init(
        spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
    )


def _keys(spark, path: str) -> list[int]:
    return sorted(
        r["k"] for r in MergeSink(path, key="k").read(spark).collect()
    )


class _CrashAtTxnPublish(RuntimeError):
    pass


def test_heal_keeps_txn_marker_across_rename_publish_crash(
    spark, tmp_path, monkeypatch
):
    """ADVICE r13 (high): a crash between the v<claim> rename and
    log.publish() in _publish_one, followed by a CONCURRENT writer whose
    _base_and_claim heals the claimed dir, must not (a) make the pending
    entry visible before the transaction commits, nor (b) wedge or
    duplicate data when the coordinator later heals."""
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    coord = str(tmp_path / "_txn")
    _mk_table(spark, a, 0, 10)
    _mk_table(spark, b, 100, 110)

    txn = LakehouseTransaction(coord)
    txn.stage_append(
        a, spark.range(50, 55).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
    )
    txn.stage_append(
        b, spark.range(150, 155).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
    )

    # crash EXACTLY between the rename-claim and the manifest publish of
    # the first entry: the work dir is already renamed to a/v2 (with
    # _SUCCESS and the _TXN stamp), no 2.json exists yet
    real_publish = CommitLog.publish
    fired = {"n": 0}

    def crashing(self, manifest):
        if manifest.get("txn") and fired["n"] == 0:
            fired["n"] = 1
            raise _CrashAtTxnPublish("injected")
        return real_publish(self, manifest)

    monkeypatch.setattr(CommitLog, "publish", crashing)
    with pytest.raises(_CrashAtTxnPublish):
        txn.commit()
    monkeypatch.setattr(CommitLog, "publish", real_publish)

    log_a = CommitLog(a)
    assert os.path.exists(os.path.join(a, "v2", "_SUCCESS"))
    assert not os.path.exists(os.path.join(a, "_manifest", "2.json"))

    # INTERLEAVED regular writer on table a: its _base_and_claim heals
    # the committed-but-unpublished v2 from the directory. The healed
    # manifest must CARRY the txn marker (restored from the _TXN stamp)
    # — before the fix it was rebuilt bare and the pending rows leaked.
    MergeSink(a, key="k").merge(
        spark,
        spark.range(70, 72).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ),
    )
    healed = log_a.manifest(2)
    assert healed.get("txn", {}).get("id") == txn.id
    assert healed["txn"]["entry"] == 0
    # the writer's own commit (v3) built on the pending base: inherited
    head = log_a.manifest(log_a.current_version())
    assert any(
        t.get("id") == txn.id for t in head.get("txn_inherited", [])
    )

    # torn cross-table read: NOTHING of the transaction (nor the
    # interleaved writer's rows, which build on a pending base) is
    # visible before the coordinator commits
    assert _keys(spark, a) == list(range(10))
    assert _keys(spark, b) == list(range(100, 110))

    # coordinator heal rolls forward: finds the already-published entry
    # via the marker probe (no duplicate, no FileExistsError wedge),
    # publishes entry b, flips the committed marker
    out = heal(coord)
    assert txn.id in out
    assert _keys(spark, a) == (
        list(range(10)) + list(range(50, 55)) + [70, 71]
    )
    assert _keys(spark, b) == list(range(100, 110)) + list(
        range(150, 155)
    )
    # staged dirs reclaimed, done markers present
    assert not [d for d in os.listdir(a) if d.startswith(".txn-")]
    assert os.path.exists(os.path.join(coord, f"{txn.id}.e0.done"))
    # idempotent: a second heal is a no-op
    assert heal(coord) == {}


def test_intent_write_is_atomic_and_torn_intents_quarantine(
    spark, tmp_path
):
    """ADVICE r13 (medium): the intent object is claimed atomically
    (tmp + fsync + link), and heal()/gc() quarantine an undecodable
    intent instead of crashing every later pass."""
    a = str(tmp_path / "a")
    coord = str(tmp_path / "_txn")
    _mk_table(spark, a, 0, 5)

    # seed a TORN intent (pre-atomic era / foreign garbage)
    os.makedirs(coord, exist_ok=True)
    torn = os.path.join(coord, "deadbeef00.json")
    with open(torn, "w") as fh:
        fh.write('{"id": "deadbeef00", "entr')  # truncated mid-dump

    # a healthy transaction still commits through the same coordinator
    txn = LakehouseTransaction(coord)
    txn.stage_append(
        a, spark.range(5, 8).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
    )
    txn.commit()
    assert _keys(spark, a) == list(range(8))
    # no leftover hidden tmp from the atomic claim
    assert not [
        f for f in os.listdir(coord) if f.startswith(".intent-")
    ]

    # heal() and gc() pass cleanly, quarantining the torn file once
    assert heal(coord) == {}
    assert not os.path.exists(torn)
    assert os.path.exists(torn + ".quarantined")
    collected = gc(coord)
    assert txn.id in collected
    # committed intent collected; the quarantined file left for forensics
    assert not os.path.exists(os.path.join(coord, f"{txn.id}.json"))
    assert os.path.exists(torn + ".quarantined")


def test_pending_only_table_reads_as_empty_declared_frame(
    spark, tmp_path
):
    """ADVICE r13 (low): a DDL-created table whose ONLY commit belongs
    to a pending multi-table transaction serves the pre-transaction
    state (empty frame under the declared schema), not a spurious
    'v0 is not published' error."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )

    path = str(tmp_path / "t")
    coord = str(tmp_path / "_txn")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE pend_t (k BIGINT, v BIGINT) USING lakehouse "
        f"LOCATION '{path}' TBLPROPERTIES (merge_key='k')"
    )
    txn = LakehouseTransaction(coord)
    txn.stage_append(
        path,
        spark.range(3).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ),
    )
    txn.commit()
    # re-open the pending window: intent without the committed marker
    os.remove(os.path.join(coord, f"{txn.id}.committed"))
    log = CommitLog(path)
    assert log.current_version() == 1
    assert log.visible_version() == 0

    df = MergeSink(path, key="k").read(spark)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k", "v"]
    # the catalog's SQL read surface serves the same empty frame
    assert cat.sql("SELECT * FROM pend_t").count() == 0
    # the DataSource schema resolver agrees (driver-side path)
    from pretalx_hub_etl_spark.sources.lakehouse_ds import (
        cow_read_schema,
    )

    assert [f.name for f in cow_read_schema(path).fields] == ["k", "v"]
    # roll forward: everything becomes visible again
    heal(coord)
    assert _keys(spark, path) == [0, 1, 2]


def test_tblproperties_family_prefix_folds_case(spark, tmp_path):
    """ADVICE r13 (low): TBLPROPERTIES ('Constraint.pos'=...) must be
    ENFORCED, not just stored-and-echoed — the family prefix folds to
    lowercase while the suffix (constraint name) keeps its case."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )

    path = str(tmp_path / "t")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE case_t (k BIGINT, v BIGINT) USING lakehouse "
        f"LOCATION '{path}' TBLPROPERTIES (merge_key='k', "
        f"'Constraint.Pos_Check'='v > 0', 'NotNull.v'='true')"
    )
    props = CommitLog(path).table_props()
    assert props.get("constraint.Pos_Check") == "v > 0"
    assert "Constraint.Pos_Check" not in props
    assert props.get("notnull.v") == "true"

    cat.sql("INSERT INTO case_t VALUES (1, 5)")
    with pytest.raises(Exception, match="Pos_Check"):
        cat.sql("INSERT INTO case_t VALUES (2, -1)")
    with pytest.raises(Exception, match="(?i)null"):
        cat.sql("INSERT INTO case_t VALUES (3, NULL)")
    assert _keys(spark, path) == [1]
    # round-trip: SHOW CREATE TABLE re-emits the enforced spelling
    stmt = cat.sql("SHOW CREATE TABLE case_t").first()[0]
    assert "constraint.Pos_Check" in stmt


def test_txn_stamp_rides_datasource_heal(spark, tmp_path, monkeypatch):
    """The INLINE healer in the DataSource writer (_manifest_from_dir)
    restores the _TXN stamp too: an interleaved `write_table` append —
    not just an engine MergeSink writer — keeps the crashed txn commit
    invisible until the coordinator commits."""
    from pretalx_hub_etl_spark.sources.lakehouse_ds import write_table

    a = str(tmp_path / "a")
    coord = str(tmp_path / "_txn")
    _mk_table(spark, a, 0, 4)

    txn = LakehouseTransaction(coord)
    txn.stage_append(
        a,
        spark.range(20, 23).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ),
    )
    real_publish = CommitLog.publish
    fired = {"n": 0}

    def crashing(self, manifest):
        if manifest.get("txn") and fired["n"] == 0:
            fired["n"] = 1
            raise _CrashAtTxnPublish("injected")
        return real_publish(self, manifest)

    monkeypatch.setattr(CommitLog, "publish", crashing)
    with pytest.raises(_CrashAtTxnPublish):
        txn.commit()
    monkeypatch.setattr(CommitLog, "publish", real_publish)

    # interleaved writer through the Python-DataSource path: its commit
    # heals v2 from the directory in a WORKER process (inline code)
    write_table(
        spark.range(30, 32).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ),
        a,
        mode="append",
    )
    healed = CommitLog(a).manifest(2)
    assert healed.get("txn", {}).get("id") == txn.id
    assert _keys(spark, a) == list(range(4))  # nothing visible yet
    heal(coord)
    assert _keys(spark, a) == list(range(4)) + [20, 21, 22, 30, 31]


def test_view_insert_visibility_stress(spark, tmp_path):
    """Compact pytest pin of the r13 q_sql_view investigation
    (RACE_r14.md): CREATE VIEW -> INSERT -> fresh-catalog read must see
    the insert EVERY time while a background thread commits to another
    table in the same session. The full-strength harness is
    tools/view_stress.py (250 iterations, 3 writers)."""
    import threading

    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )

    stop = threading.Event()
    errs: list[BaseException] = []

    def bg() -> None:
        try:
            p = str(tmp_path / "bg")
            cat = LakehouseSqlCatalog(
                spark, warehouse=str(tmp_path / "bgwh")
            )
            MergeSink(p, key="k").init(
                spark.range(50).select(
                    F.col("id").alias("k"), (F.col("id") * 2).alias("v")
                )
            )
            cat.register_path("bg_t", p)
            i = 0
            while not stop.is_set():
                i += 1
                cat.sql(f"INSERT INTO bg_t VALUES ({100 + i}, {i})")
                cat.sql("SELECT sum(v) AS s FROM bg_t").collect()
        except BaseException as exc:  # noqa: BLE001
            errs.append(exc)

    t = threading.Thread(target=bg, daemon=True)
    t.start()
    try:
        for it in range(8):
            root = tmp_path / f"it{it}"
            path = str(root / "t")
            wh = str(root / "wh")
            MergeSink(path, key="k").init(
                spark.range(40).select(
                    F.col("id").alias("k"),
                    (F.col("id") % 5).alias("ck"),
                    (F.col("id") * 7).alias("cents"),
                )
            )
            cat = LakehouseSqlCatalog(spark, warehouse=wh)
            cat.register_path("vt", path)
            cat.sql(
                "CREATE VIEW vs_high AS "
                "SELECT k, ck, cents FROM vt WHERE cents > 100"
            )
            cat.sql(
                "CREATE VIEW vs_agg AS SELECT ck, count(*) AS n, "
                "sum(cents) AS total FROM vs_high GROUP BY ck"
            )
            cat.sql("INSERT INTO vt VALUES (999, 1, 5000)")
            fresh = LakehouseSqlCatalog(spark, warehouse=wh)
            got = {
                r["ck"]: (r["n"], r["total"])
                for r in fresh.sql(
                    "SELECT ck, n, total FROM vs_agg"
                ).collect()
            }
            exp_rows = [
                (k % 5, k * 7) for k in range(40) if k * 7 > 100
            ] + [(1, 5000)]
            exp: dict[int, tuple[int, int]] = {}
            for ck, cents in exp_rows:
                n, tot = exp.get(ck, (0, 0))
                exp[ck] = (n + 1, tot + cents)
            assert got == exp, f"stale read at iteration {it}"
            cat.sql("DROP VIEW vs_high")
            cat.sql("DROP VIEW vs_agg")
    finally:
        stop.set()
        t.join(timeout=60)
    assert not errs, errs[:1]


def test_concurrent_merge_same_key(spark, tmp_path):
    """VERDICT r13 item 7: two racing MERGEs upserting the SAME key
    converge to a SERIALIZABLE result — one side's whole source row
    wins the contested key (never a torn blend, never a lost update on
    the keys only one side touched)."""
    import threading

    for rnd in range(4):
        path = str(tmp_path / f"t{rnd}")
        sink = MergeSink(path, key="k")
        sink.init(
            spark.range(10).select(
                F.col("id").alias("k"),
                (F.col("id") * 10).alias("v"),
                F.lit("base").alias("who"),
            )
        )
        barrier = threading.Barrier(2)
        errs: list[BaseException] = []

        def racer(tag: str, solo_key: int) -> None:
            try:
                src = spark.createDataFrame(
                    [(5, 1000 + solo_key, tag), (solo_key, 1, tag)],
                    "k long, v long, who string",
                )
                barrier.wait(timeout=60)
                MergeSink(path, key="k").merge(spark, src)
            except BaseException as exc:  # noqa: BLE001
                errs.append(exc)

        ts = [
            threading.Thread(target=racer, args=("A", 100)),
            threading.Thread(target=racer, args=("B", 200)),
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
        assert not errs, errs[:1]
        rows = {
            r["k"]: (r["v"], r["who"])
            for r in sink.read(spark).collect()
        }
        # disjoint keys: both sides' solo rows landed (no lost update)
        assert rows[100] == (1, "A") and rows[200] == (1, "B")
        # contested key: exactly one side's WHOLE row (serializable,
        # not a blend) — v and who agree on the winner
        v5, who5 = rows[5]
        assert (v5, who5) in ((1100, "A"), (1200, "B")), rows[5]
        # untouched keys intact
        assert all(rows[k] == (k * 10, "base") for k in range(10) if k != 5)
        assert len(rows) == 12


def test_concurrent_append_identity_unique(spark, tmp_path):
    """S49 pin: racing appends into an IDENTITY table re-derive the
    high-water mark against the new base when the OCC claim is lost —
    ids stay globally unique and above the base's maximum."""
    import threading

    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )

    path = str(tmp_path / "t")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE idt (id BIGINT GENERATED ALWAYS AS IDENTITY, "
        f"k BIGINT) USING lakehouse LOCATION '{path}' "
        f"TBLPROPERTIES (merge_key='k')"
    )
    cat.sql("INSERT INTO idt (k) VALUES (0), (1), (2)")
    barrier = threading.Barrier(3)
    errs: list[BaseException] = []

    def writer(lo: int) -> None:
        try:
            df = spark.range(lo, lo + 20).select(F.col("id").alias("k"))
            barrier.wait(timeout=60)
            MergeSink(path, key="k").append(df)
        except BaseException as exc:  # noqa: BLE001
            errs.append(exc)

    ts = [
        threading.Thread(target=writer, args=(100 * i,))
        for i in (1, 2, 3)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert not errs, errs[:1]
    rows = cat.sql(
        "SELECT count(*) AS n, count(DISTINCT id) AS d, min(id) AS lo "
        "FROM idt"
    ).first()
    assert rows["n"] == 63 and rows["d"] == 63, rows
    assert rows["lo"] >= 1


def test_mor_optimize_zorder_tightens_envelopes(spark, tmp_path):
    """LAY1c pin (the MoR twin of the r13 CoW envelope test): after
    OPTIMIZE ZORDER the chain restarts at a clustered CHECKPOINT whose
    per-file key envelopes are tight, so key-range pruning skips files
    the scattered layout could not — and content is intact through
    upsert + delete deltas."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )
    from pretalx_hub_etl_spark.sinks.mor import MorTable

    path = str(tmp_path / "zm")
    # hash-scattered: every file's [min,max] on the KEY spans the domain
    df = spark.range(4096).selectExpr(
        "pmod(id * 2654435761, 4096) AS a", "id AS b", "id AS v"
    )
    t = MorTable(path, key="a")
    t.init(df.repartition(8))
    t.merge(
        spark,
        source=spark.range(64).selectExpr(
            "id AS a", "id AS b", "id + 100000 AS v"
        ),
    )
    t.merge(spark, deletes=spark.range(4000, 4096).selectExpr("id AS a"))
    _d0, scanned0, skipped0 = t.read_pruned(spark, 0, 255)
    # pre-ZORDER: only the tight DELTA files prune (the 8 scattered
    # base files all span the key domain and must all scan)
    assert scanned0 >= 8
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("zm", path)
    cat.sql("OPTIMIZE zm ZORDER BY (a, b)")
    head = CommitLog(path)
    assert head.manifest(head.current_version()).get("checkpoint")
    _d1, scanned1, skipped1 = t.read_pruned(spark, 0, 255)
    assert skipped1 > skipped0 and scanned1 < scanned0
    # content intact: upserts applied, deletes stay deleted
    rows = {r["a"]: r["v"] for r in t.read(spark).collect()}
    assert len(rows) == 4000
    assert rows[10] == 100010 and 4050 not in rows
    # spec persisted: bare OPTIMIZE re-applies compact+cluster
    assert head.table_props()["zorder_by"] == ["a", "b"]
    cat.sql("OPTIMIZE zm")
    _d2, _s2, skipped2 = t.read_pruned(spark, 0, 255)
    assert skipped2 > 0


def test_defaults_show_create_round_trip(spark, tmp_path):
    """S49: DEFAULT + IDENTITY clauses survive SHOW CREATE TABLE and
    re-parse to an equivalent table."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )

    path = str(tmp_path / "t")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE rt (id BIGINT GENERATED ALWAYS AS IDENTITY, "
        f"k BIGINT, status STRING DEFAULT 'new' NOT NULL) "
        f"USING lakehouse LOCATION '{path}' TBLPROPERTIES (merge_key='k')"
    )
    stmt = cat.sql("SHOW CREATE TABLE rt").first()[0]
    assert "GENERATED ALWAYS AS IDENTITY" in stmt
    assert "DEFAULT 'new'" in stmt and "NOT NULL" in stmt
    # re-parse at a new location: equivalent props
    path2 = str(tmp_path / "t2")
    stmt2 = stmt.replace("TABLE rt", "TABLE rt2").replace(path, path2)
    cat.sql(stmt2)
    p2 = CommitLog(path2).table_props()
    assert p2.get("identity.id") == "true"
    assert p2.get("default.status") == "'new'"
    assert p2.get("notnull.status") == "true"
    # bad DEFAULT fails the CREATE, not the first INSERT
    with pytest.raises(ValueError, match="DEFAULT"):
        cat.sql(
            f"CREATE TABLE bad (k BIGINT, s BIGINT DEFAULT 'abc!(') "
            f"USING lakehouse LOCATION '{tmp_path / 'bad'}' "
            f"TBLPROPERTIES (merge_key='k')"
        )


def test_merge_assigns_identity_to_inserted_rows(spark, tmp_path):
    """S49 + MERGE: WHEN NOT MATCHED INSERT rows get engine-assigned
    identity values above the base's high-water mark; matched rows keep
    their existing ids through the update."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )

    path = str(tmp_path / "t")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE mi_t (id BIGINT GENERATED ALWAYS AS IDENTITY, "
        f"k BIGINT, v BIGINT) USING lakehouse LOCATION '{path}' "
        f"TBLPROPERTIES (merge_key='k')"
    )
    cat.sql("INSERT INTO mi_t (k, v) VALUES (1, 10), (2, 20)")
    before = {
        r["k"]: r["id"]
        for r in cat.sql("SELECT k, id FROM mi_t").collect()
    }
    spark.createDataFrame(
        [(2, 99), (3, 30)], "k long, v long"
    ).createOrReplaceTempView("mi_t_src")
    cat.sql(
        "MERGE INTO mi_t USING mi_t_src ON mi_t.k = mi_t_src.k "
        "WHEN MATCHED THEN UPDATE SET v = mi_t_src.v "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES "
        "(mi_t_src.k, mi_t_src.v)"
    )
    rows = {
        r["k"]: (r["v"], r["id"])
        for r in cat.sql("SELECT k, v, id FROM mi_t").collect()
    }
    assert rows[2] == (99, before[2])  # matched: id preserved
    assert rows[1] == (10, before[1])
    ids = [i for _v, i in rows.values()]
    assert all(i is not None for i in ids) and len(set(ids)) == 3
    assert rows[3][1] > max(before.values())  # above the high-water mark
    # engine API: a keyed upsert omitting the identity column entirely
    MergeSink(path, key="k").merge(
        spark, spark.createDataFrame([(4, 40)], "k long, v long")
    )
    rows2 = {
        r["k"]: r["id"]
        for r in cat.sql("SELECT k, id FROM mi_t").collect()
    }
    assert len(set(rows2.values())) == 4 and rows2[4] is not None


def test_heal_transactions_sql(spark, tmp_path, monkeypatch):
    """S47: `HEAL TRANSACTIONS` — crash recovery reachable from SQL.
    A transaction crashed mid-publish (after the intent) is completed
    by the statement; a fresh session against the same warehouse issues
    it and the data appears atomically."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )

    wh = str(tmp_path / "wh")
    path = str(tmp_path / "t")
    cat = LakehouseSqlCatalog(spark, warehouse=wh)
    _mk_table(spark, path, 0, 5)
    cat.register_path("ht", path)
    cat.sql("BEGIN TRANSACTION")
    cat.sql("INSERT INTO ht VALUES (50, 500)")
    real_publish = CommitLog.publish
    fired = {"n": 0}

    def crashing(self, manifest):
        if manifest.get("txn") and fired["n"] == 0:
            fired["n"] = 1
            raise _CrashAtTxnPublish("injected")
        return real_publish(self, manifest)

    monkeypatch.setattr(CommitLog, "publish", crashing)
    with pytest.raises(_CrashAtTxnPublish):
        cat.sql("COMMIT")
    monkeypatch.setattr(CommitLog, "publish", real_publish)
    assert _keys(spark, path) == list(range(5))  # still invisible
    fresh = LakehouseSqlCatalog(spark, warehouse=wh)
    out = fresh.sql("HEAL TRANSACTIONS").collect()
    assert len(out) == 1 and out[0]["tables"] == 1
    assert _keys(spark, path) == list(range(5)) + [50]
    # idempotent + empty-coordinator safe
    assert fresh.sql("HEAL TRANSACTIONS").count() == 0


def test_incremental_zorder_layers_prune_and_relink(spark, tmp_path):
    """LAY1d: after full ZORDER + append + INCREMENTAL, (a) clustered
    files relink byte-identical, (b) BOTH layers' envelopes prune a key
    range probe, (c) a spec change is refused, (d) content intact."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )

    path = str(tmp_path / "t")
    df = spark.range(4096).selectExpr(
        "id AS a", "pmod(id * 2654435761, 4096) AS b", "id AS v"
    )
    sink = MergeSink(path, key="a")
    sink.init(df.repartition(8))
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("zi", path, key="a")
    cat.sql("OPTIMIZE zi ZORDER BY (a, b)")  # v2 full
    assert CommitLog(path).table_props()["zorder_at"] == 2
    # scattered append layer
    spark.range(4096, 8192).selectExpr(
        "id AS a", "pmod(id * 2654435761, 4096) AS b", "id AS v"
    ).repartition(4).createOrReplaceTempView("zi_more")
    cat.sql("INSERT INTO zi SELECT a, b, v FROM zi_more")  # v3
    s = cat.sql("OPTIMIZE zi INCREMENTAL").first()
    assert s["files_reclustered"] >= 1 and s["files_relinked"] >= 1
    assert CommitLog(path).table_props()["zorder_at"] == s["version"]
    # pruning: a tight a-range touches few files across BOTH layers
    _d, scanned, skipped = sink.read_where(
        spark, [("a", 0, 255)], version=s["version"]
    )
    assert skipped > scanned  # most files skip after layering
    # content intact
    assert sink.read(spark).count() == 8192
    got = sink.read(spark).agg(F.sum("v").alias("s")).first()["s"]
    assert got == sum(range(8192))
    # spec change refused on the incremental path
    with pytest.raises(ValueError, match="full recluster"):
        cat.sql("OPTIMIZE zi ZORDER BY (b) INCREMENTAL")
    # vacuumed anchor: falls back to a FULL recluster, not an error
    MergeSink(path, key="a").vacuum(keep_last=1)
    cat.sql("INSERT INTO zi VALUES (9000, 1, 1)")
    s3 = cat.sql("OPTIMIZE zi INCREMENTAL").first()
    assert s3["files_reclustered"] >= 1
    assert sink.read(spark).count() == 8193
