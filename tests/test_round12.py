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

from pretalx_hub_etl_spark.sinks.manifest import (
    CommitLog,
    forget_committed,
)
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
    # the DataSource (compat) path is where the column silently vanished
    cat.register_cow("pt", path, use_datasource=True)
    # SELECT * must include the partition column (it lives only in the
    # directory names; before the fix it silently vanished), values intact
    out = cat.sql("SELECT k, region, v FROM pt").collect()
    assert len(out) == 40
    assert all(r.region == r.k % 4 for r in out)
    # schema includes the reconstructed column, typed (int-inferred)
    schema = dict(cat.sql("SELECT * FROM pt").dtypes)
    assert schema["region"] == "bigint"
    # predicates on the partition column work row-wise
    assert cat.sql("SELECT k FROM pt WHERE region = 2").count() == 10
    # the native (default) path serves them too, same values
    cat.register_cow("ptn", path)
    out2 = cat.sql("SELECT k, region, v FROM ptn").collect()
    assert len(out2) == 40 and all(r.region == r.k % 4 for r in out2)


def test_sql_reader_null_and_string_partitions(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    path = str(tmp_path / "pt2")
    df = spark.createDataFrame(
        [(1, "eu", 10), (2, "us", 20), (3, None, 30)],
        "k long, region string, v long",
    )
    MergeSink(path, key="k", partition_by=["region"]).init(df)
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("pt2", path, use_datasource=True)
    rows = {r.k: r.region for r in cat.sql("SELECT k, region FROM pt2").collect()}
    assert rows == {1: "eu", 2: "us", 3: None}


# --- same-view multi-reference correctness (the scan-collapse bug) ----------


def test_one_view_multi_reference_union_correct(spark, tmp_path):
    # Spark 4.1 collapses co-occurring scans of ONE Python-DS relation
    # to a single partition list; with per-occurrence file pruning that
    # silently emptied one branch of `SELECT .. WHERE k=1 UNION ALL
    # SELECT .. WHERE k=2` over one view. Pinned here on BOTH catalog
    # paths: native (default) and DataSource (pruning now gated on
    # single_ref, so co-occurring scans stay identical and harmless).
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    path = str(tmp_path / "u")
    MergeSink(path, key="k", cluster_by=("k", 4)).init(
        spark.range(40).selectExpr("id AS k", "id * 10 AS cents")
    )
    cat = LakehouseSqlCatalog(spark)
    for name, ds in (("un", False), ("ud", True)):
        cat.register_cow(name, path, use_datasource=ds)
        got = sorted(
            r.k
            for r in cat.sql(
                f"SELECT k FROM {name} WHERE k = 1 "
                f"UNION ALL SELECT k FROM {name} WHERE k = 33"
            ).collect()
        )
        assert got == [1, 33], (name, got)
        # and a self-join through one view
        n = cat.sql(
            f"SELECT a.k FROM {name} a JOIN {name} b ON a.k = b.k + 1"
        ).count()
        assert n == 39, name


def test_single_ref_load_still_prunes(spark, tmp_path):
    # the DataSource keeps manifest file skipping for explicitly
    # single-referenced loads: with a filter disjoint from a removed
    # file's envelope, the pruned load never opens it
    import shutil

    register(spark)
    path = str(tmp_path / "p")
    MergeSink(path, key="k", cluster_by=("k", 4)).init(
        spark.range(40).selectExpr("id AS k", "id * 10 AS cents")
    )
    log = CommitLog(path)
    files, _ = log.files_for(1)
    # find the file whose envelope holds the TOP keys and remove it
    import pyarrow.parquet as pq

    top = max(files, key=lambda f: pq.read_table(f, columns=["k"])["k"][0].as_py())
    os.remove(top)
    df = (
        spark.read.format("lakehouse")
        .option("path", path)
        .option("single_ref", "true")
        .load()
        .filter("k < 5")
    )
    assert df.count() == 5  # pruned scan never touches the removed file
    # without single_ref the same read fails loudly on the missing file
    import pytest as _pytest

    with _pytest.raises(Exception):
        spark.read.format("lakehouse").option("path", path).load().filter(
            "k < 5"
        ).count()
    shutil.rmtree(path, ignore_errors=True)


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
    forget_committed(table)  # a real crash loses the floor too
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


# --- SQL MERGE INTO (verdict r11 item 1) ------------------------------------


def _cow_fixture(spark, tmp_path, name, cat):
    path = str(tmp_path / name)
    base = spark.range(10).selectExpr("id AS k", "id * 10 AS cents")
    MergeSink(path, key="k").init(base)
    cat.register_cow(name, path, key="k")
    return path


def test_sql_merge_cow_full_statement(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    cat = LakehouseSqlCatalog(spark)
    _cow_fixture(spark, tmp_path, "mt", cat)
    src = spark.createDataFrame(
        [(2, 999), (3, 333), (20, 200), (21, 210)], "k long, cents long"
    )
    src.createOrReplaceTempView("mt_src")
    out = cat.sql(
        """
        MERGE INTO mt AS t USING mt_src AS s ON t.k = s.k
        WHEN MATCHED AND s.cents > 500 THEN UPDATE SET cents = s.cents + 1
        WHEN MATCHED THEN DELETE
        WHEN NOT MATCHED THEN INSERT *
        WHEN NOT MATCHED BY SOURCE AND t.k = 7 THEN DELETE
        """
    ).collect()
    assert out[0].operation == "merge"
    got = {r.k: r.cents for r in cat.sql("SELECT k, cents FROM mt").collect()}
    # k=2 matched, cents 999>500 -> updated to 1000; k=3 matched, 333<=500
    # -> second clause deletes; k=20/21 inserted; k=7 unmatched-by-source
    # deleted; everything else untouched
    expect = {k: k * 10 for k in range(10) if k not in (2, 3, 7)}
    expect.update({2: 1000, 20: 200, 21: 210})
    assert got == expect
    # one MERGE = one commit, visible in DESCRIBE HISTORY
    hist = cat.sql("DESCRIBE HISTORY mt").collect()
    assert [r.version for r in hist] == [2, 1]
    assert hist[0].committed_at is not None


def test_sql_merge_mor_routing_and_subquery_source(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog
    from pretalx_hub_etl_spark.sinks.mor import MorTable

    cat = LakehouseSqlCatalog(spark)
    path = str(tmp_path / "mmt")
    MorTable(path, key="k").init(
        spark.range(10).selectExpr("id AS k", "id * 10 AS cents")
    )
    cat.register_mor("mmt", path, key="k")
    out = cat.sql(
        """
        MERGE INTO mmt t
        USING (SELECT k, cents + 5 AS cents FROM mmt WHERE k % 2 = 0) s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET cents = s.cents
        """
    ).collect()
    assert out[0].operation == "merge"
    got = {r.k: r.cents for r in cat.sql("SELECT k, cents FROM mmt").collect()}
    assert got == {k: k * 10 + (5 if k % 2 == 0 else 0) for k in range(10)}
    # MoR routing: the merge was one DELTA commit, not a rewrite
    hist = cat.sql("DESCRIBE HISTORY mmt").collect()
    assert hist[0].operation == "delta" and hist[0].version == 2


def test_sql_merge_schema_evolution_and_guards(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    cat = LakehouseSqlCatalog(spark)
    _cow_fixture(spark, tmp_path, "evt", cat)
    spark.createDataFrame(
        [(1, 11, "gold"), (30, 300, "new")], "k long, cents long, tier string"
    ).createOrReplaceTempView("ev_src")
    # without the opt-in, a schema-evolving merge raises
    with pytest.raises(ValueError, match="WITH SCHEMA EVOLUTION"):
        cat.sql(
            "MERGE INTO evt t USING ev_src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET cents = s.cents, tier = s.tier "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    out = cat.sql(
        "MERGE WITH SCHEMA EVOLUTION INTO evt t USING ev_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET cents = s.cents, tier = s.tier "
        "WHEN NOT MATCHED THEN INSERT *"
    ).collect()
    assert out[0].operation == "merge"
    got = {r.k: (r.cents, r.tier) for r in cat.sql("SELECT * FROM evt").collect()}
    assert got[1] == (11, "gold") and got[30] == (300, "new")
    assert got[5] == (50, None)  # untouched rows: new column NULL
    # the SQL-MERGE multiple-match precondition is enforced
    spark.createDataFrame(
        [(1, 1), (1, 2)], "k long, cents long"
    ).createOrReplaceTempView("dup_src")
    with pytest.raises(ValueError, match="multiple source rows"):
        cat.sql(
            "MERGE INTO evt t USING dup_src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET cents = s.cents"
        )
    # updating the merge key is rejected up front
    with pytest.raises(ValueError, match="merge key"):
        cat.sql(
            "MERGE INTO evt t USING dup_src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET k = s.k + 1"
        )


def test_sql_merge_insert_values_form(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    cat = LakehouseSqlCatalog(spark)
    _cow_fixture(spark, tmp_path, "ivt", cat)
    spark.createDataFrame(
        [(3, 7), (40, 8)], "k long, n long"
    ).createOrReplaceTempView("iv_src")
    cat.sql(
        "MERGE INTO ivt t USING iv_src s ON t.k = s.k "
        "WHEN NOT MATCHED THEN INSERT (k, cents) VALUES (s.k, s.n * 100)"
    )
    got = {r.k: r.cents for r in cat.sql("SELECT k, cents FROM ivt").collect()}
    assert got[40] == 800 and got[3] == 30  # matched row untouched


# --- DDL + path-discovered registration (verdict r11 item 4) ----------------


def test_create_table_insert_and_register_path(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    cat = LakehouseSqlCatalog(spark)
    path = str(tmp_path / "ddl_t")
    out = cat.sql(
        f"CREATE TABLE ddl_t (k BIGINT, cents BIGINT) USING lakehouse "
        f"LOCATION '{path}' TBLPROPERTIES (merge_key='k')"
    ).collect()
    assert out[0].operation == "create" and out[0].version == 0
    # the empty table is readable with its declared schema
    assert cat.sql("SELECT * FROM ddl_t").columns == ["k", "cents"]
    assert cat.sql("SELECT * FROM ddl_t").count() == 0
    cat.sql("INSERT INTO ddl_t VALUES (1, 100), (2, 200)")
    cat.sql("UPDATE ddl_t SET cents = cents + 1 WHERE k = 2")
    # a FRESH catalog discovers kind + merge key from the path alone
    cat2 = LakehouseSqlCatalog(spark)
    cat2.register_path("t2", path)
    assert cat2._tables["t2"][0] == "cow" and cat2._tables["t2"][2] == "k"
    got = {r.k: r.cents for r in cat2.sql("SELECT * FROM t2").collect()}
    assert got == {1: 100, 2: 201}
    # DML through the path-registered name (key came from table props)
    cat2.sql("DELETE FROM t2 WHERE k = 1")
    assert cat2.sql("SELECT count(*) AS n FROM t2").collect()[0].n == 1
    # duplicate CREATE raises; IF NOT EXISTS registers quietly
    with pytest.raises(FileExistsError):
        cat2.sql(
            f"CREATE TABLE x (k BIGINT) USING lakehouse LOCATION '{path}'"
        )
    cat2.sql(
        f"CREATE TABLE IF NOT EXISTS x (k BIGINT) USING lakehouse "
        f"LOCATION '{path}'"
    )
    assert cat2._tables["x"][2] == "k"


def test_create_table_mor_and_first_insert(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    cat = LakehouseSqlCatalog(spark)
    path = str(tmp_path / "ddl_m")
    cat.sql(
        f"CREATE TABLE ddl_m (k BIGINT, v STRING) USING lakehouse "
        f"LOCATION '{path}' TBLPROPERTIES (merge_key='k', kind='mor')"
    )
    cat.sql("INSERT INTO ddl_m VALUES (1, 'a')")  # init (v1 checkpoint)
    cat.sql("INSERT INTO ddl_m VALUES (1, 'b'), (2, 'c')")  # upsert delta
    got = {r.k: r.v for r in cat.sql("SELECT * FROM ddl_m").collect()}
    assert got == {1: "b", 2: "c"}
    assert cat.sql("DESCRIBE HISTORY ddl_m").collect()[0].operation == "delta"


def test_engine_created_tables_are_path_discoverable(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog
    from pretalx_hub_etl_spark.sinks.mor import MorTable

    cow, mor = str(tmp_path / "c"), str(tmp_path / "m")
    MergeSink(cow, key="k").init(spark.range(3).selectExpr("id AS k"))
    MorTable(mor, key="k").init(spark.range(3).selectExpr("id AS k"))
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("c", cow)
    cat.register_path("m", mor)
    assert cat._tables["c"] == ("cow", cow, "k")
    assert cat._tables["m"] == ("mor", mor, "k")


# --- TIMESTAMP AS OF + age-based retention ----------------------------------


def test_sql_timestamp_as_of_and_retention_vacuum(spark, tmp_path):
    import time

    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    cat = LakehouseSqlCatalog(spark)
    path = str(tmp_path / "tt")
    sink = MergeSink(path, key="k")
    sink.init(spark.range(5).selectExpr("id AS k", "id AS v"))  # v1
    time.sleep(0.05)
    mid_ms = int(time.time() * 1000)
    time.sleep(0.05)
    sink.merge(spark, spark.createDataFrame([(9, 9)], "k long, v long"))  # v2
    cat.register_cow("tt", path, key="k")
    # a timestamp between the commits resolves to v1 (the Delta rule)
    n = cat.sql(
        f"SELECT count(*) AS n FROM tt TIMESTAMP AS OF '{mid_ms}'"
    ).collect()[0].n
    assert n == 5
    # ISO form too
    import datetime as dt

    iso = (
        dt.datetime.fromtimestamp(mid_ms / 1000, tz=dt.timezone.utc)
        .replace(tzinfo=None)
        .isoformat()
    )
    assert (
        cat.sql(f"SELECT count(*) AS n FROM tt TIMESTAMP AS OF '{iso}'")
        .collect()[0]
        .n
        == 5
    )
    # DESCRIBE HISTORY surfaces monotone timestamps
    hist = cat.sql("DESCRIBE HISTORY tt").collect()
    assert hist[0].committed_at > hist[1].committed_at
    # age-based retention: a 0-hour horizon reclaims everything but the
    # current version; time travel below then refuses loudly
    cat.sql("VACUUM tt RETAIN 0 HOURS")
    from pretalx_hub_etl_spark.sinks.manifest import CommitLog

    assert CommitLog(path).versions() == [2]
    with pytest.raises(Exception, match="at or before|not published"):
        cat.sql(f"SELECT * FROM tt TIMESTAMP AS OF '{mid_ms}'").collect()


def test_sql_merge_by_source_update(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    cat = LakehouseSqlCatalog(spark)
    _cow_fixture(spark, tmp_path, "bst", cat)
    spark.createDataFrame([(2, 999)], "k long, cents long").createOrReplaceTempView(
        "bs_src"
    )
    cat.sql(
        """
        MERGE INTO bst t USING bs_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET cents = s.cents
        WHEN NOT MATCHED BY SOURCE AND t.k < 3 THEN UPDATE SET cents = 0
        WHEN NOT MATCHED BY SOURCE AND t.k >= 8 THEN DELETE
        """
    )
    got = {r.k: r.cents for r in cat.sql("SELECT k, cents FROM bst").collect()}
    # k=2 matched->999; k=0,1 by-source-updated to 0; k=8,9 deleted;
    # 3..7 untouched (first-match-wins: the <3 clause shields them from
    # nothing, the >=8 delete has its own condition)
    assert got == {0: 0, 1: 0, 2: 999, 3: 30, 4: 40, 5: 50, 6: 60, 7: 70}


def test_show_tables_and_describe(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog
    from pretalx_hub_etl_spark.sinks.mor import MorTable

    cat = LakehouseSqlCatalog(spark)
    cow = str(tmp_path / "c")
    mor = str(tmp_path / "m")
    MergeSink(cow, key="k", partition_by=["p"]).init(
        spark.createDataFrame([(1, 0, 10)], "k long, p long, v long")
    )
    MorTable(mor, key="k").init(spark.createDataFrame([(1, 5)], "k long, v long"))
    cat.register_path("ct", cow)
    cat.register_path("mt2", mor)
    st = {r.table: r for r in cat.sql("SHOW TABLES").collect()}
    assert st["ct"].kind == "cow" and st["ct"].merge_key == "k"
    assert st["mt2"].kind == "mor" and st["mt2"].current_version == 1
    desc = cat.sql("DESCRIBE TABLE ct").collect()
    names = [r.col_name for r in desc]
    assert "k" in names and "v" in names and "p" in names
    assert ("# merge_key", "k") in {(r.col_name, r.data_type) for r in desc}
    assert ("# partition_by", "p") in {(r.col_name, r.data_type) for r in desc}


def test_sql_merge_into_empty_ddl_table(spark, tmp_path):
    # MERGE INTO a freshly CREATEd (zero-commit) table: everything is an
    # insert and the statement's commit INITIALIZES the table
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    cat = LakehouseSqlCatalog(spark)
    path = str(tmp_path / "e")
    cat.sql(
        f"CREATE TABLE et (k BIGINT, cents BIGINT) USING lakehouse "
        f"LOCATION '{path}' TBLPROPERTIES (merge_key='k')"
    )
    spark.createDataFrame([(1, 10), (2, 20)], "k long, cents long")\
        .createOrReplaceTempView("et_src")
    cat.sql(
        "MERGE INTO et t USING et_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET cents = s.cents "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = {r.k: r.cents for r in cat.sql("SELECT k, cents FROM et").collect()}
    assert got == {1: 10, 2: 20}
    # and the second MERGE is a normal keyed commit on v1
    cat.sql(
        "MERGE INTO et t USING et_src s ON t.k = s.k "
        "WHEN MATCHED AND s.k = 1 THEN UPDATE SET cents = s.cents + 5"
    )
    got = {r.k: r.cents for r in cat.sql("SELECT k, cents FROM et").collect()}
    assert got == {1: 15, 2: 20}


def test_shallow_clone_links_and_independence(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    cat = LakehouseSqlCatalog(spark)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    MergeSink(src, key="k").init(
        spark.range(20).selectExpr("id AS k", "id * 10 AS cents")
    )
    cat.register_cow("cs", src, key="k")
    out = cat.sql(
        f"CREATE TABLE cd SHALLOW CLONE cs LOCATION '{dst}'"
    ).collect()
    assert out[0].operation == "clone" and out[0].version == 1
    # zero data copy: every clone file IS the source file (same inode)
    src_files, _ = CommitLog(src).files_for(1)
    dst_files, _ = CommitLog(dst).files_for(1)
    src_inodes = {os.path.basename(f): os.stat(f).st_ino for f in src_files}
    for f in dst_files:
        assert os.stat(f).st_ino == src_inodes[os.path.basename(f)]
    # independence: mutate the clone, vacuum the source — both intact
    cat.sql("DELETE FROM cd WHERE k >= 10")
    assert cat.sql("SELECT count(*) AS n FROM cd").collect()[0].n == 10
    assert cat.sql("SELECT count(*) AS n FROM cs").collect()[0].n == 20
    MergeSink(src, key="k").merge(
        spark, spark.createDataFrame([(100, 1)], "k long, cents long")
    )
    MergeSink(src, key="k").vacuum(keep_last=1)  # drops source v1
    assert cat.sql("SELECT count(*) AS n FROM cd").collect()[0].n == 10
    # the clone is path-discoverable (props copied) and clone-of-clone works
    cat2 = LakehouseSqlCatalog(spark)
    cat2.register_path("cd2", dst)
    assert cat2._tables["cd2"] == ("cow", dst, "k")
    # guards: existing target, MoR source
    with pytest.raises(FileExistsError):
        cat.sql(f"CREATE TABLE x SHALLOW CLONE cs LOCATION '{dst}'")
    from pretalx_hub_etl_spark.sinks.mor import MorTable

    mor = str(tmp_path / "m")
    MorTable(mor, key="k").init(spark.range(3).selectExpr("id AS k"))
    cat.register_path("cm", mor)
    with pytest.raises(ValueError, match="SHALLOW CLONE of MoR"):
        cat.sql(
            f"CREATE TABLE y SHALLOW CLONE cm LOCATION '{tmp_path / 'y'}'"
        )


def test_table_changes_mor_and_default_hi(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog
    from pretalx_hub_etl_spark.sinks.mor import MorTable

    cat = LakehouseSqlCatalog(spark)
    path = str(tmp_path / "m")
    t = MorTable(path, key="k")
    t.init(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))  # v1
    t.merge(spark, source=spark.createDataFrame([(1, 11)], "k long, v long"))  # v2
    t.merge(spark, deletes=spark.createDataFrame([(2,)], "k long"))  # v3
    cat.register_path("mtc", path)
    # MoR: per-commit events in (lo, hi]
    rows = sorted(
        (r["__commit"], r["__op"], r.k)
        for r in cat.sql("SELECT * FROM table_changes('mtc', 1, 2)").collect()
    )
    assert rows == [(2, "upsert", 1)]
    # hi defaults to the current version
    rows = sorted(
        (r["__commit"], r["__op"], r.k)
        for r in cat.sql("SELECT * FROM table_changes('mtc', 1)").collect()
    )
    assert rows == [(2, "upsert", 1), (3, "delete", 2)]
    with pytest.raises(ValueError, match="unregistered"):
        cat.sql("SELECT * FROM table_changes('ghost', 1)")


# --- S33: per-file Bloom index ------------------------------------------------


def test_bloom_point_lookup_skips_files(spark, tmp_path):
    path = str(tmp_path / "b")
    sink = MergeSink(path, key="k", bloom_on="k")
    # hash-scattered 8-file layout: every file's [min,max] spans the
    # domain, so range stats alone skip nothing
    sink.init(spark.range(4000).selectExpr("id AS k", "id*3 AS v").repartition(8, "k"))
    log = CommitLog(path)
    m = log.manifest(1)
    assert all("bloom" in e and "k" in e["bloom"] for e in m["files"])
    df, scanned, skipped = sink.read_pruned(spark, "k", 1234, 1234)
    # the bloom skips (almost) every file that lacks the key; min/max
    # alone would have scanned all 8
    assert scanned <= 2 and skipped >= 6
    assert df.filter("k = 1234").count() == 1
    # a RANGE predicate ignores blooms (membership is point-only)
    _df, scanned2, _sk = sink.read_pruned(spark, "k", 0, 4000)
    assert scanned2 == 8
    # absent keys: provably-absent files all skipped; the value may
    # still false-positive into a file or two (sound, never required)
    _df3, scanned3, _sk3 = sink.read_pruned(spark, "k", 99_999_999, 99_999_999)
    assert scanned3 <= 2
    # merges keep the index fresh (bloom_on travels through _write) and
    # the table props make it heal-safe
    sink.merge(spark, spark.createDataFrame([(50_000, 1)], "k long, v long"))
    assert log.table_props()["bloom_on"] == "k"
    assert all("bloom" in e for e in log.manifest(2)["files"])
    df4, _scanned4, _sk4 = sink.read_pruned(spark, "k", 50_000, 50_000)
    assert df4.filter("k = 50000").count() == 1
    # heal rebuilds blooms from the declared column
    os.remove(os.path.join(path, "_manifest", "2.json"))
    forget_committed(path)  # a real crash loses the floor too
    log.heal(2)
    assert any("bloom" in e for e in log.manifest(2)["files"])


def test_bloom_soundness_exhaustive(spark, tmp_path):
    # every present key must keep its file (no false negatives, the
    # min/max soundness contract) — checked for all 500 keys
    from pretalx_hub_etl_spark.sinks.manifest import (
        bloom_might_contain,
        build_file_bloom,
    )

    vals = list(range(0, 1000, 2))
    bl = build_file_bloom(vals)
    assert all(bloom_might_contain(bl, v) for v in vals)
    # false-positive rate on absent keys stays small at 10 bits/key
    fp = sum(bloom_might_contain(bl, v) for v in range(1, 1000, 2))
    assert fp < 25  # ~1% expected; generous bound


# --- ST17: the table as an append-only streaming source ----------------------


def test_stream_source_resume_and_guards(spark, tmp_path):
    register(spark)
    from pretalx_hub_etl_spark.sources.lakehouse_ds import cow_read_schema

    table = str(tmp_path / "t")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    _write(spark, spark.range(10).selectExpr("id AS k", "id AS v"), table, "overwrite")
    _write(spark, spark.range(100, 105).selectExpr("id AS k", "id AS v"), table, "append")

    def run_stream():
        q = (
            spark.readStream.format("lakehouse")
            .schema(cow_read_schema(table))
            .option("path", table)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_stream()
    assert spark.read.parquet(out).count() == 15
    # resume from the checkpoint: only the NEW version's rows arrive
    _write(spark, spark.createDataFrame([(999, 9)], "k long, v long"), table, "append")
    run_stream()
    got = {r.k for r in spark.read.parquet(out).collect()}
    assert len(got) == 16 and 999 in got
    # a non-append commit (MERGE rewrite) fails the stream loudly
    MergeSink(table, key="k").merge(
        spark, spark.createDataFrame([(0, 777)], "k long, v long")
    )
    with pytest.raises(Exception, match="not an append"):
        run_stream()
    # ignoreChanges=true serves the rewrite's new files (duplicates
    # allowed by contract) instead of failing
    q = (
        spark.readStream.format("lakehouse")
        .schema(cow_read_schema(table))
        .option("path", table)
        .option("ignoreChanges", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out2"))
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(str(tmp_path / "out2")).count() >= 16
