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
