"""Round-16 pins: maintenance commits vs streams/feeds (dataChange=false
+ skipChangeCommits), and the S43/S46 final-frame self-oracle."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pretalx_hub_etl_spark.sinks.manifest import CommitLog
from pretalx_hub_etl_spark.sinks.merge import MergeSink


def _mk_catalog(spark):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )

    return LakehouseSqlCatalog(spark)


def test_maintenance_commits_stamp_data_change_false(spark, tmp_path):
    """optimize / optimize_zorder / incremental / optimize_where all
    mark their manifests data_change=false + a named op — the marker
    streams and the CDC feed key off."""
    path = str(tmp_path / "t")
    sink = MergeSink(path, key="k", cluster_by=("k", 2))
    sink.init(spark.range(0, 20).selectExpr("id AS k", "id * 2 AS v"))
    v = sink.optimize(spark)
    m = CommitLog(path).manifest(v)
    assert m.get("data_change") is False and m.get("op") == "optimize", m

    path2 = str(tmp_path / "t2")
    sink2 = MergeSink(path2, key="k")
    sink2.init(spark.range(0, 20).selectExpr("id AS k", "id * 2 AS v"))
    v = sink2.optimize_zorder(spark, ["k"])
    m = CommitLog(path2).manifest(v)
    assert m.get("data_change") is False and m.get("op") == "zorder", m
    sink2.append(spark.range(20, 30).selectExpr("id AS k", "id * 2 AS v"))
    res = sink2.optimize_zorder_incremental(spark)
    m = CommitLog(path2).manifest(res["version"])
    assert (
        m.get("data_change") is False
        and m.get("op") == "zorder_incremental"
    ), m
    res = sink2.optimize_where(spark, "k >= 25")
    m = CommitLog(path2).manifest(res["version"])
    assert (
        m.get("data_change") is False and m.get("op") == "optimize_where"
    ), m


def test_cdf_stream_skip_change_commits_opt_in(spark, tmp_path):
    """ST19 escape hatch: skipChangeCommits=true crosses a feed-less
    DATA-CHANGING commit as zero events instead of dying (the Delta
    option name/semantics); the served events are exactly the
    feed-recorded ones."""
    from pretalx_hub_etl_spark.sources.lakehouse_ds import (
        cdf_read_schema,
        pin_active_session,
        register,
    )

    register(spark)
    pin_active_session(spark)
    path = str(tmp_path / "t")
    cat = _mk_catalog(spark)
    cat.sql(
        f"CREATE TABLE r16_skipcc (k BIGINT, v BIGINT) USING lakehouse "
        f"LOCATION '{path}' TBLPROPERTIES (merge_key='k')"
    )
    spark.range(0, 12).selectExpr(
        "id AS k", "id * 10 AS v"
    ).createOrReplaceTempView("r16_skipcc_seed")
    cat.sql("INSERT INTO r16_skipcc SELECT k, v FROM r16_skipcc_seed")
    cat.sql("UPDATE r16_skipcc SET v = v + 1 WHERE k < 3")  # v2: no feed
    log = CommitLog(path)
    props = log.table_props()
    props["cdf"] = "true"
    log.write_table_props(props)
    cat.sql("UPDATE r16_skipcc SET v = v + 1 WHERE k >= 9")  # v3 (cdf)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = (
        spark.readStream.format("lakehouse")
        .schema(cdf_read_schema(path))
        .option("path", path)
        .option("readChangeFeed", "true")
        .option("startingVersion", "2")
        .option("skipChangeCommits", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["k"], r["change"], r["_commit_version"])
        for r in spark.read.parquet(out).collect()
    }
    # only v3's recorded events — v2's unrecorded change is (by explicit
    # opt-in) skipped, never invented
    assert got == {(k, "update", 3) for k in (9, 10, 11)}, got


def test_append_stream_skips_data_change_false_commit(spark, tmp_path):
    """The append-only streaming source crosses an OPTIMIZE commit
    without ignoreChanges and without re-emitting rewritten rows —
    dataChange=false versions are skipped outright (the Delta rule)."""
    from pretalx_hub_etl_spark.sources.lakehouse_ds import (
        pin_active_session,
        register,
    )

    register(spark)
    pin_active_session(spark)
    path = str(tmp_path / "t")
    cat = _mk_catalog(spark)
    cat.sql(
        f"CREATE TABLE r16_astream (k BIGINT, v BIGINT) USING lakehouse "
        f"LOCATION '{path}' TBLPROPERTIES (merge_key='k')"
    )
    spark.range(0, 10).selectExpr(
        "id AS k", "id AS v"
    ).createOrReplaceTempView("r16_as_seed")
    cat.sql("INSERT INTO r16_astream SELECT k, v FROM r16_as_seed")  # v1
    cat.sql("OPTIMIZE r16_astream ZORDER BY (k)")  # v2: rewrite, no change
    spark.range(10, 15).selectExpr(
        "id AS k", "id AS v"
    ).createOrReplaceTempView("r16_as_seed2")
    cat.sql("INSERT INTO r16_astream SELECT k, v FROM r16_as_seed2")  # v3
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = (
        spark.readStream.format("lakehouse")
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.read.parquet(out).groupBy("k").count().collect()
    assert len(rows) == 15 and all(r["count"] == 1 for r in rows), (
        sorted((r["k"], r["count"]) for r in rows if r["count"] != 1)
    )


def test_time_travel_between_widen_anchors_serves_era_type(
    spark, tmp_path
):
    """S52 + r16: with TWO widen anchors on one column, a time-travel
    read BETWEEN them serves the FIRST widen's type (the era's declared
    type), not the current (widest) one — widen events record their
    "from" type and later widens are undone for older eras."""
    path = str(tmp_path / "t")
    cat = _mk_catalog(spark)
    cat.sql(
        f"CREATE TABLE r16_widen2 (k BIGINT, c SMALLINT) USING "
        f"lakehouse LOCATION '{path}' TBLPROPERTIES (merge_key='k')"
    )
    spark.sql(
        "SELECT id AS k, CAST(id AS SMALLINT) AS c FROM range(6)"
    ).createOrReplaceTempView("r16_w2_src")
    cat.sql("INSERT INTO r16_widen2 SELECT k, c FROM r16_w2_src")  # v1
    cat.sql("ALTER TABLE r16_widen2 ALTER COLUMN c TYPE INT")  # anchor v2
    spark.sql(
        "SELECT id AS k, CAST(id AS INT) AS c FROM range(6, 9)"
    ).createOrReplaceTempView("r16_w2_src2")
    cat.sql("INSERT INTO r16_widen2 SELECT k, c FROM r16_w2_src2")  # v3
    cat.sql(
        "ALTER TABLE r16_widen2 ALTER COLUMN c TYPE BIGINT"
    )  # anchor v4
    sink = MergeSink(path, key="k")
    between = sink.read_version(spark, 3)
    assert between.schema["c"].dataType.simpleString() == "int", (
        between.schema
    )
    assert between.count() == 9
    assert (
        sink.read_version(spark, 1).schema["c"].dataType.simpleString()
        == "smallint"
    )
    cur = cat.sql("SELECT * FROM r16_widen2")
    assert cur.schema["c"].dataType.simpleString() == "bigint"
    assert cur.count() == 9


def test_self_oracle_gate_raises_with_diff_artifact(spark, tmp_path):
    """The S43/S46 final-frame self-oracle: a divergent frame raises
    and dumps the named divergent rows; an equal frame passes through
    checkpointed."""
    from pretalx_hub_etl_spark.queries.lakehouse_q2 import (
        _self_oracle_gate,
    )

    base = spark.range(0, 5).selectExpr("id AS k", "id * 2 AS v")
    ok = _self_oracle_gate("r16_gate_ok", base, base, str(tmp_path))
    assert ok.count() == 5
    bad = spark.range(0, 5).selectExpr(
        "id AS k", "CAST(id * 2 + (CASE WHEN id = 3 THEN 1 ELSE 0 END) AS BIGINT) AS v"
    )
    repo = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    art = os.path.join(repo, "SELF_ORACLE_DIAG_r16_gate_bad.json")
    if os.path.exists(art):
        os.remove(art)
    with pytest.raises(RuntimeError, match="diverges"):
        _self_oracle_gate("r16_gate_bad", bad, base, str(tmp_path))
    assert os.path.exists(art)
    import json

    diag = json.load(open(art))
    assert diag["n_missing"] == 1 and diag["n_unexpected"] == 1, diag
    assert diag["missing_from_result"][0]["k"] == 3
    os.remove(art)


def _init_cow(spark, path, n=10):
    MergeSink(path, key="k").init(
        spark.range(0, n).selectExpr("id AS k", "id * 10 AS v")
    )


def test_txn_cow_merge_racing_writer_preserved(spark, tmp_path):
    """S53 equivalence pin: a writer that commits to the MERGE's target
    BETWEEN stage and COMMIT is never lost — the keyed delta applies
    under the claim against the racer's state (publish-time recompute),
    so the final state equals racer-then-merge serial order."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )

    path = str(tmp_path / "t")
    _init_cow(spark, path)
    cat = LakehouseSqlCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.register_path("r16_race_t", path)
    cat.sql("BEGIN TRANSACTION")
    cat.sql("UPDATE r16_race_t SET v = v + 1 WHERE k < 5")
    # racing writer commits while the delta is staged
    MergeSink(path, key="k").append(
        spark.createDataFrame([(100, 1000)], "k BIGINT, v BIGINT")
    )
    cat.sql("COMMIT")
    rows = {
        r["k"]: r["v"] for r in cat.sql(
            "SELECT k, v FROM r16_race_t"
        ).collect()
    }
    exp = {k: k * 10 + (1 if k < 5 else 0) for k in range(10)}
    exp[100] = 1000  # the racer's row survives the txn's merge
    assert rows == exp, rows


def test_txn_cow_merge_invisible_until_commit_and_heals(
    spark, tmp_path
):
    """S53 through the crash window: with the intent written and the
    cow_delta entry PUBLISHED but the committed marker absent, every
    read still serves the pre-txn state; heal() rolls forward and the
    merge + the sibling append flip visible at once."""
    import json

    from pretalx_hub_etl_spark.sinks.txn import (
        LakehouseTransaction,
        _publish_one,
        heal,
    )

    pa_ = str(tmp_path / "a")
    pb = str(tmp_path / "b")
    coord = str(tmp_path / "_txn")
    _init_cow(spark, pa_)
    _init_cow(spark, pb)
    txn = LakehouseTransaction(coord)
    txn.stage_cow_delta(
        pa_,
        source=spark.createDataFrame(
            [(1, 999), (50, 500)], "k BIGINT, v BIGINT"
        ),
        deletes=spark.createDataFrame([(2,)], "k BIGINT"),
    )
    txn.stage_append(
        pb, spark.createDataFrame([(60, 600)], "k BIGINT, v BIGINT")
    )
    os.makedirs(coord, exist_ok=True)
    with open(os.path.join(coord, f"{txn.id}.json"), "x") as fh:
        json.dump({"id": txn.id, "entries": txn._entries}, fh)
    _publish_one(coord, txn.id, 0, txn._entries[0])
    # published but uncommitted: both tables serve pre-txn state
    a = MergeSink(pa_, key="k").read(spark)
    assert a.count() == 10 and a.filter("k = 50").count() == 0
    assert MergeSink(pb, key="k").read(spark).count() == 10
    heal(coord)  # roll-forward completes the transaction
    rows = {
        r["k"]: r["v"]
        for r in MergeSink(pa_, key="k").read(spark).collect()
    }
    exp = {k: k * 10 for k in range(10) if k != 2}
    exp[1] = 999
    exp[50] = 500
    assert rows == exp, rows
    assert MergeSink(pb, key="k").read(spark).filter(
        "k = 60"
    ).count() == 1


def test_txn_second_dml_on_same_table_refuses(spark, tmp_path):
    """One keyed-delta statement per table per transaction: a second
    DML whose evaluation cannot see the first's staged effect refuses
    loudly instead of applying against a state it never read."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )

    path = str(tmp_path / "t")
    _init_cow(spark, path)
    cat = LakehouseSqlCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.register_path("r16_two_t", path)
    cat.sql("BEGIN TRANSACTION")
    cat.sql("UPDATE r16_two_t SET v = v + 1 WHERE k < 5")
    with pytest.raises(ValueError, match="already stages"):
        cat.sql("UPDATE r16_two_t SET v = v + 1 WHERE k < 5")
    cat.sql("ROLLBACK")


def test_txn_cow_delete_and_update_stage_and_commit(spark, tmp_path):
    """S53 SQL surface: CoW UPDATE and DELETE inside a transaction
    stage keyed deltas on TWO tables and flip atomically at COMMIT."""
    from pretalx_hub_etl_spark.plans.lakehouse_sql import (
        LakehouseSqlCatalog,
    )

    pa_ = str(tmp_path / "a")
    pb = str(tmp_path / "b")
    _init_cow(spark, pa_)
    _init_cow(spark, pb)
    cat = LakehouseSqlCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.register_path("r16_u_t", pa_)
    cat.register_path("r16_d_t", pb)
    cat.sql("BEGIN TRANSACTION")
    cat.sql("UPDATE r16_u_t SET v = v * 2 WHERE k % 2 = 0")
    cat.sql("DELETE FROM r16_d_t WHERE k >= 8")
    assert cat.sql("SELECT sum(v) AS s FROM r16_u_t").first()["s"] == 450
    assert cat.sql("SELECT count(*) AS n FROM r16_d_t").first()["n"] == 10
    cat.sql("COMMIT")
    got_u = {
        r["k"]: r["v"]
        for r in cat.sql("SELECT k, v FROM r16_u_t").collect()
    }
    assert got_u == {
        k: k * 10 * (2 if k % 2 == 0 else 1) for k in range(10)
    }, got_u
    assert cat.sql("SELECT count(*) AS n FROM r16_d_t").first()["n"] == 8


def test_mor_widen_chain_maintenance_and_time_travel(spark, tmp_path):
    """S52b: widen on a MoR chain — cross-era latest-wins resolution,
    a MIXED-era maintenance commit (optimize_where relinks pre-widen
    files next to rewritten wide ones: the scan must not depend on
    footer-inference order), compaction, and time travel below the
    anchor serving the original type."""
    from pretalx_hub_etl_spark.sinks.mor import MorTable

    path = str(tmp_path / "t")
    t = MorTable(path, key="k")
    t.init(
        spark.sql(
            "SELECT id AS k, CAST(id * 10 AS INT) AS v FROM range(10)"
        ).repartitionByRange(4, "k")
    )
    cat = _mk_catalog(spark)
    cat.register_path("r16_wmor", path)
    cat.sql("ALTER TABLE r16_wmor ALTER COLUMN v TYPE BIGINT")  # v2
    t.merge(
        spark,
        source=spark.sql(
            "SELECT id AS k, CAST(id * 10 + 5000000000 AS BIGINT) AS v "
            "FROM range(8, 12)"
        ).coalesce(1),
    )  # v3: wide delta, keys 8..11 (8, 9 shadow pre-widen rows)
    exp = {k: k * 10 for k in range(8)}
    exp.update({k: k * 10 + 5000000000 for k in range(8, 12)})
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got == exp, got
    assert (
        t.read(spark).schema["v"].dataType.simpleString() == "bigint"
    )
    # time travel below the anchor: original type, original values
    old = t.read(spark, as_of=1)
    assert old.schema["v"].dataType.simpleString() == "int"
    assert {r["k"]: r["v"] for r in old.collect()} == {
        k: k * 10 for k in range(10)
    }
    # mixed-era maintenance commit: narrow relinks + wide rewrites in
    # ONE file set — the explicit era schema makes the scan order-proof
    res = t.optimize_where(spark, "k >= 8 AND k <= 20")
    assert res["files_relinked"] >= 1 and res["files_rewritten"] >= 1, res
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got == exp, got
    # full compaction rewrites one era; reads stay identical
    t.compact(spark)
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got == exp, got


def test_table_changes_stays_on_feed_across_rename_and_widen(
    spark, tmp_path
):
    """r16 (VERDICT item 4): a cdf='true' table keeps the O(changes)
    table_changes() fast path AFTER RENAME COLUMN and ALTER COLUMN
    TYPE — per-commit feed members from before the events serve under
    the CURRENT logical schema (struct overlay), and the scan set is
    feed files only, never the table."""
    from pretalx_hub_etl_spark.sinks.merge import version_diff

    path = str(tmp_path / "t")
    cat = _mk_catalog(spark)
    cat.sql(
        f"CREATE TABLE r16_cmcdf (k BIGINT, cents INT) USING lakehouse "
        f"LOCATION '{path}' TBLPROPERTIES (merge_key='k', cdf='true')"
    )
    spark.range(0, 8).selectExpr(
        "id AS k", "CAST(id * 10 AS INT) AS cents"
    ).createOrReplaceTempView("r16_cm_seed")
    cat.sql("INSERT INTO r16_cmcdf SELECT k, cents FROM r16_cm_seed")
    cat.sql("UPDATE r16_cmcdf SET cents = cents + 1 WHERE k = 1")  # v2
    cat.sql("ALTER TABLE r16_cmcdf RENAME COLUMN cents TO amount")
    cat.sql("ALTER TABLE r16_cmcdf ALTER COLUMN amount TYPE BIGINT")
    cat.sql(
        "UPDATE r16_cmcdf SET amount = amount + 5000000000 WHERE k = 2"
    )
    log = CommitLog(path)
    d = version_diff(spark, path, "k", 1, log.current_version())
    files = d.inputFiles()
    assert files and all(os.sep + "cdf" + os.sep in f for f in files), (
        files[:5]
    )
    rows = {r["k"]: r for r in d.collect()}
    assert set(rows) == {1, 2}, rows
    # pre-rename event (v2) serves under the CURRENT logical name
    assert rows[1]["old"]["amount"] == 10
    assert rows[1]["new"]["amount"] == 11
    assert rows[2]["old"]["amount"] == 20
    assert rows[2]["new"]["amount"] == 5000000020
    # SQL face agrees
    cat.register_path("r16_cmcdf", path)
    n = cat.sql(
        "SELECT count(*) AS n FROM table_changes('r16_cmcdf', 1)"
    ).first()["n"]
    assert n == 2


def test_cdf_feed_equals_snapshot_diff_across_schema_events(
    spark, tmp_path
):
    """r16 equivalence property: random DML lifecycles INTERLEAVED with
    RENAME COLUMN and ALTER COLUMN TYPE — the net diff reconstructed
    from per-commit feed files (with the struct overlay mapping old-era
    members to current logical names) EQUALS the snapshot full-outer
    diff over era-mapped reads: same keys, same classification, same
    images, and the fast path stays on feed files only."""
    import random

    from pretalx_hub_etl_spark.sinks.colmap import (
        apply_events_df,
        column_events,
    )
    from pretalx_hub_etl_spark.sinks.merge import (
        MergeSink,
        _diff_frames,
        version_diff,
    )

    rng = random.Random(1616)
    for trial in range(3):
        path = str(tmp_path / f"t{trial}")
        cat = _mk_catalog(spark)
        name = f"r16_eqcm{trial}"
        cat.sql(
            f"CREATE TABLE {name} (k BIGINT, v INT) USING lakehouse "
            f"LOCATION '{path}' TBLPROPERTIES (merge_key='k', "
            f"cdf='true')"
        )
        spark.range(0, 40).selectExpr(
            "id AS k", "CAST(id * 10 AS INT) AS v"
        ).createOrReplaceTempView(f"r16_eqcm_seed{trial}")
        cat.sql(
            f"INSERT INTO {name} SELECT k, v FROM r16_eqcm_seed{trial}"
        )
        sink = MergeSink(path, key="k")
        col = "v"
        widened = False
        ops = ["update", "delete", "insert", "rename", "widen"]
        for _c in range(5):
            op = rng.choice(ops)
            a, b = sorted(rng.sample(range(0, 60), 2))
            if op == "update":
                cat.sql(
                    f"UPDATE {name} SET {col} = {col} + "
                    f"{rng.randint(1, 9)} WHERE k BETWEEN {a} AND {b}"
                )
            elif op == "delete":
                cat.sql(
                    f"DELETE FROM {name} WHERE k BETWEEN {a} AND {b}"
                )
            elif op == "insert":
                spark.range(a + 60, a + 66).selectExpr(
                    "id AS k", f"CAST(id * 7 AS INT) AS {col}"
                ).createOrReplaceTempView(f"r16_eqcm_ins{trial}")
                cat.sql(
                    f"INSERT INTO {name} SELECT k, {col} "
                    f"FROM r16_eqcm_ins{trial}"
                )
            elif op == "rename":
                new = "w" if col == "v" else "v"
                cat.sql(
                    f"ALTER TABLE {name} RENAME COLUMN {col} TO {new}"
                )
                col = new
            else:  # widen
                if widened:
                    continue
                cat.sql(
                    f"ALTER TABLE {name} ALTER COLUMN {col} TYPE BIGINT"
                )
                widened = True
        # guarantee the property is exercised: at least one rename AND
        # one widen must sit mid-lifecycle with DML after them
        if col == "v":
            cat.sql(f"ALTER TABLE {name} RENAME COLUMN v TO w")
            col = "w"
        if not widened:
            cat.sql(f"ALTER TABLE {name} ALTER COLUMN {col} TYPE BIGINT")
        cat.sql(f"UPDATE {name} SET {col} = {col} + 1 WHERE k < 5")
        log = CommitLog(path)
        hi = log.current_version()
        fast = version_diff(spark, path, "k", 1, hi)
        assert fast.inputFiles() and all(
            "/cdf/" in f for f in fast.inputFiles()
        ), "expected the feed fast path"
        evs = column_events(log.table_props())
        assert evs, "lifecycle produced no column events"

        def logical(v: int):
            df = sink.read_version(spark, v)
            later = [e for e in evs if int(e.get("since", 0)) > v]
            return apply_events_df(df, later) if later else df

        slow = _diff_frames(logical(1), logical(hi), "k")
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
            {
                k: (f_rows.get(k), s_rows.get(k))
                for k in (set(f_rows) ^ set(s_rows))
                or {k for k in f_rows if f_rows[k] != s_rows.get(k)}
            },
        )


def test_cdf_stream_seed_serves_payloads_across_rename(spark, tmp_path):
    """ST19c seed branch: a change-feed stream from v1 where v1
    PRE-DATES cdf (served as snapshot insert events from its data
    files) on a since-RENAMED + WIDENED table maps the era columns —
    pre-fix, the seed built the payload struct by CURRENT name against
    OLD-name files and silently emitted NULL payloads."""
    from pretalx_hub_etl_spark.sources.lakehouse_ds import (
        cdf_read_schema,
        pin_active_session,
        register,
    )

    register(spark)
    pin_active_session(spark)
    path = str(tmp_path / "t")
    MergeSink(path, key="k").init(
        spark.sql(
            "SELECT id AS k, CAST(id * 10 AS INT) AS cents FROM range(8)"
        )
    )  # v1: no cdf member
    log = CommitLog(path)
    props = log.table_props()
    props["cdf"] = "true"
    log.write_table_props(props)
    cat = _mk_catalog(spark)
    cat.register_path("r16_seedren", path)
    cat.sql("ALTER TABLE r16_seedren RENAME COLUMN cents TO amount")
    cat.sql(
        "ALTER TABLE r16_seedren ALTER COLUMN amount TYPE BIGINT"
    )
    cat.sql(
        "UPDATE r16_seedren SET amount = amount + 5000000000 "
        "WHERE k = 3"
    )
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = (
        spark.readStream.format("lakehouse")
        .schema(cdf_read_schema(path))
        .option("path", path)
        .option("readChangeFeed", "true")
        .load()
        .selectExpr(
            "k", "change", "new.amount AS new_amount",
            "CAST(_commit_version AS INT) AS commit_v",
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(out).collect()
    seed = {
        r["k"]: r["new_amount"] for r in rows if r["commit_v"] == 1
    }
    assert seed == {k: k * 10 for k in range(8)}, seed
    upd = [r for r in rows if r["change"] == "update"]
    assert len(upd) == 1 and upd[0]["new_amount"] == 30 + 5000000000


def test_cdf_stream_raises_when_schema_evolves_past_pinned(
    spark, tmp_path
):
    """A member whose columns map PAST the running stream's pinned
    schema (rename AFTER stream start) fails loudly naming the restart
    remedy — never silently NULL-fills or misaligns."""
    from pretalx_hub_etl_spark.sources.lakehouse_ds import (
        cdf_read_schema,
        pin_active_session,
        register,
    )

    register(spark)
    pin_active_session(spark)
    path = str(tmp_path / "t")
    cat = _mk_catalog(spark)
    cat.sql(
        f"CREATE TABLE r16_evolve (k BIGINT, v BIGINT) USING lakehouse "
        f"LOCATION '{path}' TBLPROPERTIES (merge_key='k', cdf='true')"
    )
    spark.range(0, 6).selectExpr(
        "id AS k", "id * 10 AS v"
    ).createOrReplaceTempView("r16_ev_seed")
    cat.sql("INSERT INTO r16_evolve SELECT k, v FROM r16_ev_seed")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = (
        spark.readStream.format("lakehouse")
        .schema(cdf_read_schema(path))  # pins the 'v' era
        .option("path", path)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()  # drains v1 under the pinned schema
        cat.sql("ALTER TABLE r16_evolve RENAME COLUMN v TO w")
        cat.sql("UPDATE r16_evolve SET w = w + 1 WHERE k = 2")
        with pytest.raises(Exception, match="restart the stream"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_binpack_relinks_big_files_and_groups_per_partition(
    spark, tmp_path
):
    """LAY6 mechanics: with a small target, files at-or-above half the
    target RELINK byte-identical (inode-asserted), small files merge
    PER PARTITION DIRECTORY (never across), and a column-mapped table
    refuses."""
    path = str(tmp_path / "t")
    sink = MergeSink(path, key="k", partition_by=["p"])
    sink.init(
        spark.sql(
            "SELECT id AS k, CAST(id % 2 AS INT) AS p, "
            "CAST(id * 10 AS BIGINT) AS v FROM range(20000)"
        ).repartition(2)
    )
    for lo in (20000, 20010):  # two tiny appends per partition dir
        sink.append(
            spark.sql(
                f"SELECT id AS k, CAST(id % 2 AS INT) AS p, "
                f"CAST(id * 10 AS BIGINT) AS v "
                f"FROM range({lo}, {lo + 10})"
            ).coalesce(1)
        )
    log = CommitLog(path)
    v_before = log.current_version()
    before = log.manifest(v_before)["files"]
    sizes = sorted(int(e.get("bytes") or 0) for e in before)
    # target = largest file size: the big init files sit above the
    # half-target threshold and relink; the tiny append files merge
    target = sizes[-1]
    big = [e for e in before if int(e["bytes"]) >= target // 2]
    small = [e for e in before if int(e["bytes"]) < target // 2]
    assert big and len(small) >= 4, sizes
    res = sink.compact_small(spark, target_bytes=target)
    assert res["files_rewritten"] >= 4 and res["files_relinked"] >= 2, (
        res
    )
    assert res["files_out"] < len(before), (res, len(before))
    after = log.manifest(res["version"])["files"]
    by_rel = {e["path"]: e for e in after}
    vdir_b = os.path.join(path, f"v{v_before}")
    for e in big:
        assert e["path"] in by_rel, e["path"]
        a = os.stat(
            os.path.join(path, f"v{res['version']}", e["path"])
        )
        b = os.stat(os.path.join(vdir_b, e["path"]))
        assert a.st_ino == b.st_ino, e["path"]
    # merged outputs stay inside their partition directories
    for e in after:
        assert e["path"].split(os.sep)[0].startswith("p="), e["path"]
    got = {
        (r["k"], r["p"], r["v"])
        for r in sink.read(spark).collect()
    }
    assert got == {(k, k % 2, k * 10) for k in range(20020)}, len(got)
    # column-mapped tables refuse the binpack route
    cat = _mk_catalog(spark)
    p2 = str(tmp_path / "t2")
    MergeSink(p2, key="k").init(
        spark.range(5).selectExpr("id AS k", "id AS c")
    )
    cat.register_path("r16_bp_cm", p2)
    cat.sql("ALTER TABLE r16_bp_cm RENAME COLUMN c TO d")
    with pytest.raises(ValueError, match="column-mapping"):
        MergeSink(p2, key="k").compact_small(spark)
