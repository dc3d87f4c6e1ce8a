"""Round-13 regression tests: the five r12 ADVICE defects.

1. (medium) bloom keys canonicalize numerics across Python types:
   probing an int-keyed bloom with 5.0 / True / Decimal('5.00') must
   not produce a FALSE NEGATIVE (silently dropped rows).
2. (medium) _version_at / _last_stream_batch_id step OVER torn-claim
   holes (v{N} dir with no manifest) instead of aborting the walk —
   the abort wrongly raised on resolvable timestamps and could
   double-commit a replayed streaming batch.
3. (low) the streaming source's startingVersion option is INCLUSIVE
   (the Delta contract): startingVersion=N serves version N onward.
4. (low) cloning a keyless-registered table must not persist the
   placeholder merge_key='_' into the clone's table props.
5. (low) a MERGE that fails parse/validation drops its scaffolding
   temp views (no per-failure view leak into the shared session).
"""

from __future__ import annotations

import decimal
import os
import time

import pytest

from pretalx_hub_etl_spark.sinks.manifest import (
    forget_committed,
    CommitLog,
    bloom_might_contain,
    build_file_bloom,
)
from pretalx_hub_etl_spark.sinks.merge import MergeSink
from pretalx_hub_etl_spark.sources.lakehouse_ds import (
    register,
    write_table,
)


# --- 1. bloom numeric canonicalization ---------------------------------------


def test_bloom_cross_type_numeric_probe_no_false_negative():
    bl = build_file_bloom([5, 7, 1])
    # numerically equal probes of ANY Python type must hit (before the
    # fix, str(5.0) == '5.0' != '5' hashed differently -> false negative)
    assert bloom_might_contain(bl, 5)
    assert bloom_might_contain(bl, 5.0)
    assert bloom_might_contain(bl, decimal.Decimal("5.00"))
    assert bloom_might_contain(bl, True)  # == 1
    # and the symmetric direction: floats at build time, int probes
    bl2 = build_file_bloom([5.0, 2.5])
    assert bloom_might_contain(bl2, 5)
    assert bloom_might_contain(bl2, decimal.Decimal("2.5"))
    assert bloom_might_contain(bl2, 2.5)
    # strings are NOT coerced: '5' and 5 stay distinct values
    bl3 = build_file_bloom(["5"])
    assert bloom_might_contain(bl3, "5")


def test_bloom_point_probe_float_literal_on_int_column(spark, tmp_path):
    # end-to-end: files_for's point probe with a float literal against
    # an int key column must keep the file that contains the value
    path = str(tmp_path / "b")
    sink = MergeSink(path, key="k", bloom_on="k")
    sink.init(
        spark.range(4000)
        .selectExpr("id AS k", "id * 3 AS v")
        .repartition(8, "k")
    )
    df, scanned, _ = sink.read_pruned(spark, "k", 1234.0, 1234.0)
    assert df.filter("k = 1234").count() == 1  # was 0 before the fix
    assert scanned <= 2  # the bloom still skips non-containing files


# --- 2. torn-claim holes in downward manifest walks --------------------------


def test_version_at_steps_over_torn_claim_hole(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "t")
    write_table(
        spark.range(5).selectExpr("id AS k", "id AS v"), path, "overwrite"
    )
    time.sleep(0.01)
    write_table(
        spark.range(5, 8).selectExpr("id AS k", "id AS v"), path, "append"
    )
    time.sleep(0.01)
    write_table(
        spark.range(8, 9).selectExpr("id AS k", "id AS v"), path, "append"
    )
    log = CommitLog(path)
    ts1 = log.manifest(1)["committed_at"]
    assert log.manifest(3)["committed_at"] > ts1
    # tear v2: directory present, manifest gone (the shape a writer
    # leaves dying between rename-claim and publish)
    os.remove(os.path.join(path, "_manifest", "2.json"))
    forget_committed(path)  # a real crash loses the floor too
    assert os.path.isdir(os.path.join(path, "v2"))
    got = (
        spark.read.format("lakehouse")
        .option("path", path)
        .option("timestamp", str(ts1))
        .load()
    )
    # before the fix the walk broke at the v2 hole and raised even
    # though v1 satisfies the timestamp
    assert got.count() == 5


def test_replayed_stream_batch_dedups_across_torn_hole(spark, tmp_path):
    register(spark)
    table = str(tmp_path / "t")
    src, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    spark.range(10).selectExpr("id AS k", "id AS v").coalesce(
        1
    ).write.parquet(src)
    stream = spark.readStream.schema("k long, v long").parquet(src)
    q = (
        stream.writeStream.format("lakehouse")
        .option("path", table)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    log = CommitLog(table)
    assert log.versions() == [1]
    assert log.manifest(1)["stream_batch_id"] == 0
    # a non-stream append on top, then torn: dir stays, manifest gone
    write_table(
        spark.createDataFrame([(99, 99)], "k long, v long"), table, "append"
    )
    os.remove(os.path.join(table, "_manifest", "2.json"))
    forget_committed(table)  # a real crash loses the floor too
    # force Spark to REPLAY batch 0 (sink committed, checkpoint didn't)
    os.remove(os.path.join(ckpt, "commits", "0"))
    crc = os.path.join(ckpt, "commits", ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)
    q = (
        spark.readStream.schema("k long, v long")
        .parquet(src)
        .writeStream.format("lakehouse")
        .option("path", table)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # before the fix the dedup walk returned -1 at the v2 hole and
    # re-committed batch 0 as a duplicate version
    assert log.versions() == [1]


# --- 3. startingVersion is inclusive (Delta contract) ------------------------


def test_stream_source_starting_version_inclusive(spark, tmp_path):
    register(spark)
    from pretalx_hub_etl_spark.sources.lakehouse_ds import cow_read_schema

    table = str(tmp_path / "t")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    write_table(
        spark.range(10).selectExpr("id AS k", "id AS v"), table, "overwrite"
    )
    write_table(
        spark.range(100, 105).selectExpr("id AS k", "id AS v"), table, "append"
    )
    write_table(
        spark.range(200, 202).selectExpr("id AS k", "id AS v"), table, "append"
    )
    q = (
        spark.readStream.format("lakehouse")
        .schema(cow_read_schema(table))
        .option("path", table)
        .option("startingVersion", "2")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    ks = {r.k for r in spark.read.parquet(out).collect()}
    # version 2's rows INCLUDED (Delta's startingVersion=N serves N
    # onward; the old exclusive reading silently lost them), v1's not
    assert ks == set(range(100, 105)) | {200, 201}


# --- 4. clone of a keyless registration stores no fake merge key -------------


def test_clone_keyless_table_omits_merge_key(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    src = str(tmp_path / "src")
    dest = str(tmp_path / "clone")
    MergeSink(src, key="k").init(
        spark.range(10).selectExpr("id AS k", "id AS v")
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("src_t", src)  # keyless (read-only) registration
    cat.sql(f"CREATE TABLE c SHALLOW CLONE src_t LOCATION '{dest}'")
    props = CommitLog(dest).table_props()
    assert props.get("kind") == "cow"
    assert "merge_key" not in props  # was merge_key='_' before the fix
    # path-only discovery of the clone yields a keyless registration,
    # and DML through it refuses with the explicit needs-a-key error
    cat2 = LakehouseSqlCatalog(spark)
    cat2.register_path("c2", dest)
    assert cat2.sql("SELECT count(*) AS n FROM c2").collect()[0].n == 10
    with pytest.raises(ValueError, match="merge key"):
        cat2.sql("DELETE FROM c2 WHERE k = 1")
    # a KEYED source still persists its real key into the clone
    dest2 = str(tmp_path / "clone2")
    cat.register_cow("src_k", src, key="k")
    cat.sql(f"CREATE TABLE ck SHALLOW CLONE src_k LOCATION '{dest2}'")
    assert CommitLog(dest2).table_props().get("merge_key") == "k"


# --- 5. failed MERGE drops its scaffolding temp views ------------------------


def test_failed_merge_leaks_no_temp_views(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    path = str(tmp_path / "t")
    MergeSink(path, key="k").init(
        spark.range(5).selectExpr("id AS k", "id AS v")
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("t", path, key="k")

    def merge_views():
        return [
            t.name
            for t in spark.catalog.listTables()
            if t.name.startswith("__merge_")
        ]

    before = merge_views()
    # multiple-match guard fires AFTER view creation
    spark.createDataFrame(
        [(1, 10), (1, 11)], "k long, v long"
    ).createOrReplaceTempView("dup_src")
    with pytest.raises(ValueError, match="multiple source rows"):
        cat.sql(
            "MERGE INTO t USING dup_src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.v"
        )
    assert merge_views() == before
    # unparseable clause fires during clause parsing
    with pytest.raises(ValueError, match="cannot parse clause"):
        cat.sql(
            "MERGE INTO t USING dup_src s ON t.k = s.k "
            "WHEN MATCHED THEN FROBNICATE"
        )
    assert merge_views() == before
    # and a SUCCESSFUL merge still cleans up
    spark.createDataFrame([(1, 42)], "k long, v long").createOrReplaceTempView(
        "ok_src"
    )
    cat.sql(
        "MERGE INTO t USING ok_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v"
    )
    assert merge_views() == before
    got = cat.sql("SELECT v FROM t WHERE k = 1").collect()[0].v
    assert got == 42


# --- verdict r12 item 1: manifest file skipping for DEFAULT SQL reads --------


def test_prune_extractor_shapes():
    from pretalx_hub_etl_spark.plans.prune_sql import extract_prunes
    from pretalx_hub_etl_spark.sinks.manifest import (
        UNBOUNDED_HI,
        UNBOUNDED_LO,
    )

    cols = {"k", "v", "region"}
    ex = lambda q: extract_prunes(q, "t", cols)
    assert ex("SELECT * FROM t WHERE k < 5") == [("k", UNBOUNDED_LO, 5)]
    assert ex("SELECT * FROM t WHERE 5 >= k") == [("k", UNBOUNDED_LO, 5)]
    assert ex("SELECT * FROM t a WHERE a.k >= 3 AND v = 7") == [
        ("k", 3, UNBOUNDED_HI),
        ("v", 7, 7),
    ]
    assert ex("SELECT * FROM t WHERE k BETWEEN 2 AND 4 ORDER BY k") == [
        ("k", 2, 4)
    ]
    assert ex("SELECT * FROM t WHERE region IN ('eu', 'us')") == [
        ("region", "eu", "us")
    ]
    # unextractable conjuncts are skipped, extractable kept
    assert ex("SELECT * FROM t WHERE upper(region) = 'EU' AND k = 9") == [
        ("k", 9, 9)
    ]
    # soundness bails: top-level OR, two occurrences, subquery-only WHERE
    assert ex("SELECT * FROM t WHERE k = 1 OR v = 2") == []
    assert (
        ex("SELECT * FROM t WHERE k=1 UNION ALL SELECT * FROM t WHERE k=2")
        == []
    )
    assert ex("SELECT * FROM (SELECT max(v) AS m FROM t) WHERE m < 5") == []
    # the subquery's own WHERE binds when the occurrence is inside it
    assert ex("SELECT * FROM (SELECT * FROM t WHERE k = 3) s") == [
        ("k", 3, 3)
    ]
    # qualifier of ANOTHER relation never binds to t
    assert ex("SELECT * FROM u JOIN t ON u.k = t.k WHERE u.k < 5") == []
    # bare column not in t's stats is ignored
    assert ex("SELECT * FROM t WHERE other_col = 5") == []
    # a WHERE above t's block does not bind to t
    assert ex("SELECT * FROM u WHERE x < 5") == []


def test_sql_native_read_prunes_files(spark, tmp_path):
    # the round-13 headline pin: a DEFAULT-path SQL read with an
    # extractable predicate never opens a file whose envelope cannot
    # match — proof by physical absence (test_round12 pattern, but
    # through the native catalog path instead of the DataSource)
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    path = str(tmp_path / "p")
    MergeSink(path, key="k", cluster_by=("k", 4)).init(
        spark.range(40).selectExpr("id AS k", "id * 10 AS cents")
    )
    log = CommitLog(path)
    files, _ = log.files_for(1)
    import pyarrow.parquet as pq

    top = max(
        files, key=lambda f: pq.read_table(f, columns=["k"])["k"][0].as_py()
    )
    os.remove(top)
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("p", path)  # NATIVE default path
    # pruned: the k<5 files survive, the removed top-range file is
    # never opened
    assert cat.sql("SELECT k FROM p WHERE k < 5").count() == 5
    assert cat.sql("SELECT k FROM p WHERE k BETWEEN 1 AND 3").count() == 3
    # same via alias-qualified conjunct
    assert cat.sql("SELECT a.k FROM p a WHERE a.k < 5").count() == 5
    # an unextractable predicate falls back to the FULL list and fails
    # loudly on the missing file (proves the pruned runs really skipped)
    with pytest.raises(Exception):
        cat.sql("SELECT k FROM p WHERE k + 0 < 5").collect()


def test_sql_native_prune_is_sound_on_overlap(spark, tmp_path):
    # files whose envelopes overlap the predicate stay; result rows
    # identical with and without pruning
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    path = str(tmp_path / "s")
    MergeSink(path, key="k").init(
        spark.range(1000)
        .selectExpr("id AS k", "id % 7 AS v")
        .repartition(8)  # round-robin: every file spans the domain
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("s", path)
    got = cat.sql("SELECT sum(k) AS s FROM s WHERE k < 100").collect()[0].s
    assert got == sum(range(100))
    # partitioned table: partition columns survive a pruned read
    path2 = str(tmp_path / "sp")
    MergeSink(path2, key="k", partition_by=["region"]).init(
        spark.range(40).selectExpr("id AS k", "id % 4 AS region")
    )
    cat.register_cow("sp", path2)
    rows = cat.sql(
        "SELECT k, region FROM sp WHERE region = 2 AND k < 100"
    ).collect()
    assert len(rows) == 10 and all(r.region == 2 for r in rows)


# --- verdict r12 item 2: CTAS -------------------------------------------------


def test_ctas_round_trip(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    cat = LakehouseSqlCatalog(spark)
    spark.range(20).selectExpr(
        "id AS k", "id % 3 AS grp", "id * 10 AS cents"
    ).createOrReplaceTempView("ctas_src")
    path = str(tmp_path / "t")
    out = cat.sql(
        f"CREATE TABLE ct USING lakehouse LOCATION '{path}' "
        "TBLPROPERTIES (merge_key='k') AS "
        "SELECT k, grp, cents FROM ctas_src WHERE k < 15"
    ).collect()
    assert out[0].operation == "create" and out[0].version == 1
    assert cat.sql("SELECT count(*) AS n FROM ct").collect()[0].n == 15
    # discovered schema + key are stored: a fresh catalog registers
    # from the path alone and runs keyed DML
    props = CommitLog(path).table_props()
    assert props["kind"] == "cow" and props["merge_key"] == "k"
    assert "k bigint" in props["schema_ddl"]
    cat2 = LakehouseSqlCatalog(spark)
    cat2.register_path("ct2", path)
    cat2.sql("INSERT INTO ct2 VALUES (100, 1, 999)")
    cat2.sql("UPDATE ct2 SET cents = 0 WHERE k = 3")
    rows = {r.k: r.cents for r in cat2.sql("SELECT k, cents FROM ct2").collect()}
    assert rows[100] == 999 and rows[3] == 0 and len(rows) == 16
    # existing location: plain CTAS raises, IF NOT EXISTS registers
    # without evaluating the payload
    with pytest.raises(FileExistsError):
        cat.sql(
            f"CREATE TABLE ct3 USING lakehouse LOCATION '{path}' "
            "AS SELECT k FROM ctas_src"
        )
    cat.sql(
        f"CREATE TABLE IF NOT EXISTS ct3 USING lakehouse LOCATION '{path}' "
        "AS SELECT k FROM ctas_src"
    )
    assert cat.sql("SELECT count(*) AS n FROM ct3").collect()[0].n == 16


def test_ctas_mor_and_partitioned(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    cat = LakehouseSqlCatalog(spark)
    spark.range(12).selectExpr(
        "id AS k", "id % 2 AS region", "id AS v"
    ).createOrReplaceTempView("ctas_src2")
    # MoR kind routes through MorTable.init; DML produces deltas
    mpath = str(tmp_path / "m")
    cat.sql(
        f"CREATE TABLE cm USING lakehouse LOCATION '{mpath}' "
        "TBLPROPERTIES (merge_key='k', kind='mor') AS "
        "SELECT k, v FROM ctas_src2"
    )
    assert CommitLog(mpath).table_props()["kind"] == "mor"
    cat.sql("UPDATE cm SET v = 77 WHERE k = 5")
    assert cat.sql("SELECT v FROM cm WHERE k = 5").collect()[0].v == 77
    # partition_by property lays out hive dirs; partition col readable
    ppath = str(tmp_path / "p")
    cat.sql(
        f"CREATE TABLE cp USING lakehouse LOCATION '{ppath}' "
        "TBLPROPERTIES (merge_key='k', partition_by='region') AS "
        "SELECT k, region, v FROM ctas_src2"
    )
    import glob

    assert glob.glob(os.path.join(ppath, "v1", "region=*"))
    rows = cat.sql("SELECT k, region FROM cp WHERE region = 1").collect()
    assert len(rows) == 6 and all(r.region == 1 for r in rows)
    # keyless CTAS: readable, no fake merge key persisted, DML refuses
    kpath = str(tmp_path / "kless")
    cat.sql(
        f"CREATE TABLE ck USING lakehouse LOCATION '{kpath}' AS "
        "SELECT k, v FROM ctas_src2"
    )
    assert "merge_key" not in CommitLog(kpath).table_props()
    cat3 = LakehouseSqlCatalog(spark)
    cat3.register_path("ck2", kpath)
    assert cat3.sql("SELECT count(*) AS n FROM ck2").collect()[0].n == 12
    with pytest.raises(ValueError, match="merge key"):
        cat3.sql("DELETE FROM ck2 WHERE k = 1")


# --- verdict r12 item 3: persistent warehouse catalog -------------------------


def test_persistent_catalog_new_session_discovery(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    wh = str(tmp_path / "wh")
    cat = LakehouseSqlCatalog(spark, warehouse=wh)
    spark.range(10).selectExpr("id AS k", "id AS v").createOrReplaceTempView(
        "pc_src"
    )
    cat.sql(
        f"CREATE TABLE pt USING lakehouse LOCATION '{wh}/pt' "
        "TBLPROPERTIES (merge_key='k') AS SELECT k, v FROM pc_src"
    )
    cat.sql(
        f"CREATE TABLE pm (k BIGINT, v BIGINT) USING lakehouse "
        f"LOCATION '{wh}/pm' TBLPROPERTIES (merge_key='k', kind='mor')"
    )
    # a FRESH catalog instance (new session shape) discovers both BY
    # NAME from the warehouse alone
    cat2 = LakehouseSqlCatalog(spark, warehouse=wh)
    names = {r.table: (r.kind, r.merge_key) for r in cat2.sql("SHOW TABLES").collect()}
    assert names["pt"] == ("cow", "k") and names["pm"] == ("mor", "k")
    assert cat2.sql("SELECT count(*) AS n FROM pt").collect()[0].n == 10
    # DML routes through the discovered key
    cat2.sql("UPDATE pt SET v = 99 WHERE k = 3")
    assert cat2.sql("SELECT v FROM pt WHERE k = 3").collect()[0].v == 99
    # register_* also persists; a third session sees it
    p3 = str(tmp_path / "ext")
    MergeSink(p3, key="k").init(spark.range(5).selectExpr("id AS k"))
    cat2.register_cow("ext_t", p3, key="k")
    cat3 = LakehouseSqlCatalog(spark, warehouse=wh)
    assert cat3.sql("SELECT count(*) AS n FROM ext_t").collect()[0].n == 5
    # kind/key re-resolve from the table's own props (snapshot is the
    # fallback): a clone of pt registered by another session keeps cow
    # without a fake key
    assert ("pt", "cow", "k") in {
        (r.table, r.kind, r.merge_key)
        for r in cat3.sql("SHOW TABLES").collect()
    }


def test_persistent_catalog_occ_no_lost_update(spark, tmp_path):
    # two catalog instances interleave updates: OCC version claims mean
    # neither registration is lost (a bare read-modify-write of one
    # JSON object would drop one)
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    wh = str(tmp_path / "wh")
    a = LakehouseSqlCatalog(spark, warehouse=wh)
    b = LakehouseSqlCatalog(spark, warehouse=wh)
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    MergeSink(pa, key="k").init(spark.range(3).selectExpr("id AS k"))
    MergeSink(pb, key="k").init(spark.range(4).selectExpr("id AS k"))
    a.register_cow("ta", pa, key="k")
    b.register_cow("tb", pb, key="k")  # b never saw a's update
    fresh = LakehouseSqlCatalog(spark, warehouse=wh)
    got = {r.table for r in fresh.sql("SHOW TABLES").collect()}
    assert {"ta", "tb"} <= got
    # catalog history is bounded: many updates retire old versions
    for i in range(15):
        a.register_cow(f"t{i}", pa, key="k")
    import glob

    assert len(glob.glob(os.path.join(wh, "_catalog", "*.json"))) <= 10


# --- verdict r12 item 6: OPTIMIZE ... ZORDER BY -------------------------------


def test_sql_optimize_zorder_tightens_envelopes(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    path = str(tmp_path / "z")
    # hash-scattered layout: every file's [min,max] envelope on BOTH
    # columns spans the whole domain, so stats pruning skips nothing
    df = spark.range(4096).selectExpr(
        "id AS a", "pmod(id * 2654435761, 4096) AS b", "id AS v"
    )
    sink = MergeSink(path, key="a")
    sink.init(df.repartition(8))
    _df0, scanned0, skipped0 = sink.read_where(
        spark, [("b", 0, 255)]
    )
    assert skipped0 == 0  # pre-ZORDER: nothing prunable on b
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("z", path, key="a")
    out = cat.sql("OPTIMIZE z ZORDER BY (a, b)").collect()
    assert out[0].operation == "optimize" and out[0].version == 2
    # post-ZORDER: the same probe skips files the old layout could not
    _df1, scanned1, skipped1 = sink.read_where(spark, [("b", 0, 255)])
    assert skipped1 > 0 and scanned1 < scanned0
    # ... on BOTH interleaved columns, from ONE layout
    _df2, _sc2, skipped_a = sink.read_where(spark, [("a", 0, 255)])
    assert skipped_a > 0
    # rows intact (a maintenance op never changes content)
    assert sink.read(spark).count() == 4096
    assert (
        cat.sql("SELECT sum(v) AS s FROM z").collect()[0].s
        == sum(range(4096))
    )
    # the spec persisted: bare OPTIMIZE re-applies ZORDER (v3), and the
    # envelopes stay tight
    assert CommitLog(path).table_props()["zorder_by"] == ["a", "b"]
    cat.sql("OPTIMIZE z")
    assert CommitLog(path).current_version() == 3
    _df3, _sc3, skipped3 = sink.read_where(spark, [("b", 0, 255)])
    assert skipped3 > 0
    # and the SQL read path itself prunes via the extractor
    assert cat.sql("SELECT count(*) AS n FROM z WHERE b < 256").collect()[
        0
    ].n == 256


# --- verdict r12 item 9: TIMESTAMP bounds for CDC + streaming source ---------


def test_table_changes_timestamp_bounds(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog
    from pretalx_hub_etl_spark.sinks.mor import MorTable

    path = str(tmp_path / "m")
    t = MorTable(path, key="k")
    t.init(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
    time.sleep(0.01)
    t.merge(spark, source=spark.createDataFrame([(1, 11)], "k long, v long"))
    time.sleep(0.01)
    t.merge(spark, deletes=spark.createDataFrame([(2,)], "k long"))
    log = CommitLog(path)
    ts1 = log.manifest(1)["committed_at"]
    ts2 = log.manifest(2)["committed_at"]
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("mt", path)
    # timestamp bounds resolve via version_at: the diff between the
    # two timestamp snapshots == the numeric (1, 2] range
    rows = sorted(
        (r["__commit"], r["__op"], r.k)
        for r in cat.sql(
            f"SELECT * FROM table_changes('mt', '{ts1}', '{ts2}')"
        ).collect()
    )
    assert rows == [(2, "upsert", 1)]
    # lo-only timestamp: everything after that snapshot
    rows = sorted(
        (r["__commit"], r["__op"], r.k)
        for r in cat.sql(
            f"SELECT * FROM table_changes('mt', '{ts1}')"
        ).collect()
    )
    assert rows == [(2, "upsert", 1), (3, "delete", 2)]


def test_stream_source_starting_timestamp(spark, tmp_path):
    register(spark)
    from pretalx_hub_etl_spark.sources.lakehouse_ds import cow_read_schema

    table = str(tmp_path / "t")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    write_table(
        spark.range(10).selectExpr("id AS k", "id AS v"), table, "overwrite"
    )
    time.sleep(0.01)
    write_table(
        spark.range(100, 103).selectExpr("id AS k", "id AS v"), table,
        "append",
    )
    ts2 = CommitLog(table).manifest(2)["committed_at"]
    q = (
        spark.readStream.format("lakehouse")
        .schema(cow_read_schema(table))
        .option("path", table)
        .option("startingTimestamp", str(ts2))
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    ks = {r.k for r in spark.read.parquet(out).collect()}
    # the first version committed AT OR AFTER ts2 is v2 itself —
    # included (Delta's startingTimestamp contract); v1 is not
    assert ks == {100, 101, 102}
    # both options together refuse (streaming errors surface when the
    # query runs, not at start())
    q2 = (
        spark.readStream.format("lakehouse")
        .schema(cow_read_schema(table))
        .option("path", table)
        .option("startingTimestamp", str(ts2))
        .option("startingVersion", "1")
        .load()
        .writeStream.format("noop")
        .start()
    )
    with pytest.raises(Exception, match="not both"):
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()


# --- verdict r12 item 7: Bloom index on the MoR delta chain -------------------


def test_mor_bloom_point_lookup_skips_files(spark, tmp_path):
    from pretalx_hub_etl_spark.sinks.mor import MorTable

    path = str(tmp_path / "m")
    t = MorTable(path, key="k", bloom_on="k")
    # checkpoint: 8 hash-scattered files — min/max alone skips nothing
    t.init(
        spark.range(4000)
        .selectExpr("id AS k", "id * 3 AS v")
        .repartition(8, "k")
    )
    # deltas keep the index fresh (bloom_on resolves from stored props
    # even through a FRESH handle)
    t2 = MorTable(path, key="k")
    t2.merge(
        spark, source=spark.createDataFrame([(50_000, 1)], "k long, v long")
    )
    t2.merge(spark, deletes=spark.createDataFrame([(1234,)], "k long"))
    log = CommitLog(path)
    assert log.table_props()["bloom_on"] == "k"
    assert all("bloom" in e for e in log.manifest(2)["files"])
    # tombstone files carry the index too
    assert all(
        "bloom" in e
        for e in log.manifest(3)["files"]
        if e.get("role") == "deletes"
    )
    # point lookup: only the containing checkpoint file + the tiny
    # deltas that might hold the key are opened
    df, scanned, skipped = t2.read_pruned(spark, 777, 777)
    assert skipped >= 6, (scanned, skipped)
    assert [r.k for r in df.collect()] == [777]
    # the tombstoned key resolves to EMPTY (the surviving tombstone
    # file shadows the checkpoint row — pruning kept both)
    df2, _sc2, _sk2 = t2.read_pruned(spark, 1234, 1234)
    assert df2.count() == 0
    # the upserted key found in its delta
    df3, _sc3, _sk3 = t2.read_pruned(spark, 50_000, 50_000)
    assert [(r.k, r.v) for r in df3.collect()] == [(50_000, 1)]
    # absent key: provably-absent everywhere -> empty, few files opened
    df4, scanned4, _sk4 = t2.read_pruned(spark, 99_999_999, 99_999_999)
    assert df4.count() == 0 and scanned4 <= 3


def test_mor_bloom_soundness_exhaustive(spark, tmp_path):
    # every live key must survive a point probe (no false negatives
    # anywhere on the chain) — checked for all keys across checkpoint,
    # upsert delta, and tombstones
    from pretalx_hub_etl_spark.sinks.mor import MorTable

    path = str(tmp_path / "m")
    t = MorTable(path, key="k", bloom_on="k")
    t.init(
        spark.range(200).selectExpr("id AS k", "id AS v").repartition(4, "k")
    )
    t.merge(
        spark,
        source=spark.range(200, 250).selectExpr("id AS k", "id + 1 AS v"),
    )
    t.merge(
        spark,
        deletes=spark.range(0, 200, 10).selectExpr("id AS k"),
    )
    expected = {
        **{k: k for k in range(200) if k % 10 != 0},
        **{k: k + 1 for k in range(200, 250)},
    }
    # full resolved read agrees
    got_all = {r.k: r.v for r in t.read(spark).collect()}
    assert got_all == expected
    # and EVERY key's point probe agrees with the full read
    for k in range(0, 250, 7):
        df, _sc, _sk = t.read_pruned(spark, k, k)
        rows = df.collect()
        if k in expected:
            assert [(r.k, r.v) for r in rows] == [(k, expected[k])], k
        else:
            assert rows == [], k


def test_mor_changes_since_key_range_prunes(spark, tmp_path):
    from pretalx_hub_etl_spark.sinks.mor import MorTable

    path = str(tmp_path / "m")
    t = MorTable(path, key="k", bloom_on="k")
    t.init(
        spark.range(1000).selectExpr("id AS k", "id AS v").repartition(4, "k")
    )
    t.merge(
        spark, source=spark.createDataFrame([(7, 70)], "k long, v long")
    )
    t.merge(spark, deletes=spark.createDataFrame([(7,)], "k long"))
    feed = t.changes_since(spark, 1, key_range=(7, 7))
    rows = sorted((r["__commit"], r["__op"]) for r in feed.collect())
    assert rows == [(2, "upsert"), (3, "delete")]
    # range form: events for keys in [0, 9] only
    feed2 = t.changes_since(spark, 0, key_range=(0, 9))
    assert feed2.count() > 0
    assert all(0 <= r.k <= 9 for r in feed2.select("k").collect())


# --- S35 per-occurrence pruned scan views -------------------------------------


def test_sql_prune_per_occurrence_union(spark, tmp_path):
    # two occurrences of one table with DIFFERENT predicates prune
    # independently — each branch gets its own scan view (contrast the
    # pinned Python-DS scan collapse, where shared relations made this
    # unsound). Proof by physical absence again: the removed top-range
    # file is never needed by either branch.
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    path = str(tmp_path / "p")
    MergeSink(path, key="k", cluster_by=("k", 4)).init(
        spark.range(40).selectExpr("id AS k", "id * 10 AS cents")
    )
    files, _ = CommitLog(path).files_for(1)
    import pyarrow.parquet as pq

    top = max(
        files, key=lambda f: pq.read_table(f, columns=["k"])["k"][0].as_py()
    )
    os.remove(top)
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("p", path)
    got = sorted(
        r.k
        for r in cat.sql(
            "SELECT k FROM p WHERE k = 1 "
            "UNION ALL SELECT k FROM p WHERE k = 12"
        ).collect()
    )
    assert got == [1, 12]
    # aliased + qualified references survive the rewrite
    got2 = cat.sql(
        "SELECT a.k, a.cents FROM p a WHERE a.k BETWEEN 2 AND 4 "
        "UNION ALL SELECT p.k, p.cents FROM p WHERE p.k = 8"
    ).collect()
    assert sorted(r.k for r in got2) == [2, 3, 4, 8]
    # scan views are dropped after analysis (no per-statement leak)
    leftovers = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("p__scan_")
    ]
    assert leftovers == []


def test_sql_prune_never_leaks_into_plain_view(spark, tmp_path):
    # the plain view keeps the FULL file list even right after a
    # heavily-pruned statement — pruning lives only in the
    # per-occurrence scan views
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    path = str(tmp_path / "s")
    MergeSink(path, key="k", cluster_by=("k", 4)).init(
        spark.range(100).selectExpr("id AS k", "id AS v")
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("s", path)
    # a full read registers the plain view...
    assert cat.sql("SELECT count(*) AS n FROM s").collect()[0].n == 100
    # ...which a heavily-pruned statement must not narrow
    assert cat.sql("SELECT k FROM s WHERE k < 5").count() == 5
    assert spark.table("s").count() == 100
    assert cat.sql("SELECT count(*) AS n FROM s").collect()[0].n == 100
    # and a same-statement mix of pruned + full references is coherent
    n = cat.sql(
        "SELECT count(*) AS n FROM (SELECT k FROM s WHERE k < 10) x "
        "JOIN s full_side ON x.k = full_side.k"
    ).collect()[0].n
    assert n == 10


# --- DROP TABLE + streaming rate limiting -------------------------------------


def test_drop_table_metadata_only(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    wh = str(tmp_path / "wh")
    path = str(tmp_path / "t")
    MergeSink(path, key="k").init(spark.range(7).selectExpr("id AS k"))
    cat = LakehouseSqlCatalog(spark, warehouse=wh)
    cat.register_cow("dt", path, key="k")
    assert cat.sql("SELECT count(*) AS n FROM dt").collect()[0].n == 7
    out = cat.sql("DROP TABLE dt").collect()
    assert out[0].operation == "drop"
    # unregistered + session view dropped: the name resolves nowhere
    with pytest.raises(Exception, match="dt"):
        cat.sql("SELECT * FROM dt").collect()
    # persistent catalog entry removed: a fresh session doesn't see it
    fresh = LakehouseSqlCatalog(spark, warehouse=wh)
    assert "dt" not in {r.table for r in fresh.sql("SHOW TABLES").collect()}
    # the DATA survives (external-table semantics): re-attachable
    fresh.register_path("dt2", path)
    assert fresh.sql("SELECT count(*) AS n FROM dt2").collect()[0].n == 7
    # IF EXISTS tolerates unknown names; bare DROP raises
    fresh.sql("DROP TABLE IF EXISTS ghost")
    with pytest.raises(ValueError, match="unregistered"):
        fresh.sql("DROP TABLE ghost")


def test_stream_source_max_versions_per_trigger(spark, tmp_path):
    # CONTRACT (documented on the reader): the FIRST microbatch of a
    # run is uncapped (Spark asks latestOffset before initialOffset and
    # never reveals a restart's restored offset — capping it could plan
    # a backwards batch); every LATER batch consumes at most
    # maxVersionsPerTrigger commits. The 5-version backlog lands within
    # one slow trigger interval, so the cap provably BINDS (per-batch
    # offset deltas of 2), and the whole backlog still drains.
    register(spark)
    import json as _json

    from pretalx_hub_etl_spark.sources.lakehouse_ds import cow_read_schema

    table = str(tmp_path / "t")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    write_table(spark.range(3).selectExpr("id AS k"), table, "overwrite")
    q = (
        spark.readStream.format("lakehouse")
        .schema(cow_read_schema(table))
        .option("path", table)
        .option("maxVersionsPerTrigger", "2")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="4 seconds")
        .start()
    )
    q.processAllAvailable()  # batch 0: v1 (first batch of the run)
    for i in range(1, 6):  # a 5-version backlog inside one interval
        write_table(
            spark.range(i * 10, i * 10 + 3).selectExpr("id AS k"),
            table,
            "append",
        )
    q.processAllAvailable()
    q.stop()
    # complete: rate limiting bounds batches, never truncates
    ks = {r.k for r in spark.read.parquet(out).collect()}
    assert ks == {i * 10 + j for i in range(6) for j in range(3)}
    # per-batch version consumption: never more than the cap after the
    # first batch, and the cap BOUND at least once (a delta of 2)
    offs = {}
    odir = os.path.join(ckpt, "offsets")
    for f in os.listdir(odir):
        if f.startswith("."):
            continue
        last = open(os.path.join(odir, f)).read().splitlines()[-1]
        offs[int(f)] = _json.loads(last)["v"]
    seq = [offs[i] for i in sorted(offs)]
    deltas = [b - a for a, b in zip(seq, seq[1:])]
    assert all(d <= 2 for d in deltas), seq
    assert 2 in deltas, seq
    assert seq[-1] == 6


# --- DESCRIBE DETAIL + ANALYZE TABLE (manifest-served metadata) ---------------


def test_describe_detail_and_analyze(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog
    from pretalx_hub_etl_spark.sinks.mor import MorTable

    path = str(tmp_path / "t")
    MergeSink(path, key="k", bloom_on="k").init(
        spark.range(100).selectExpr("id AS k", "id AS v").repartition(4)
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("t", path, key="k")
    d = cat.sql("DESCRIBE DETAIL t").collect()[0]
    assert d.format == "lakehouse" and d.kind == "cow"
    assert d.merge_key == "k" and d.bloom_on == "k"
    assert d.current_version == 1 and d.num_files == 4
    assert d.num_rows == 100 and d.size_bytes > 0
    assert d.created_at and d.last_modified >= d.created_at
    a = cat.sql("ANALYZE TABLE t COMPUTE STATISTICS").collect()[0]
    assert (a.num_rows, a.num_files, a.rows_are_upper_bound) == (100, 4, False)
    assert a.size_bytes == d.size_bytes
    # MoR: chain totals, rows flagged as an upper bound
    mpath = str(tmp_path / "m")
    t = MorTable(mpath, key="k")
    t.init(spark.range(10).selectExpr("id AS k", "id AS v"))
    t.merge(spark, deletes=spark.createDataFrame([(1,)], "k long"))
    cat.register_path("mt", mpath)
    am = cat.sql("ANALYZE TABLE mt COMPUTE STATISTICS").collect()[0]
    assert am.rows_are_upper_bound and am.num_rows >= 10
    dm = cat.sql("DESCRIBE DETAIL mt").collect()[0]
    assert dm.kind == "mor" and dm.current_version == 2
    # plain DESCRIBE still routes to the column form
    cols = {r.col_name for r in cat.sql("DESCRIBE t").collect()}
    assert "k" in cols and "v" in cols


# --- VACUUM DRY RUN + RESTORE TO TIMESTAMP ------------------------------------


def test_vacuum_dry_run_and_restore_to_timestamp(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    path = str(tmp_path / "t")
    sink = MergeSink(path, key="k")
    sink.init(spark.range(5).selectExpr("id AS k", "id AS v"))
    time.sleep(0.01)
    sink.merge(spark, spark.createDataFrame([(1, 99)], "k long, v long"))
    time.sleep(0.01)
    sink.merge(spark, spark.createDataFrame([(2, 88)], "k long, v long"))
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("t", path, key="k")
    # DRY RUN reports victims, deletes NOTHING
    rows = cat.sql("VACUUM t RETAIN 1 DRY RUN").collect()
    assert sorted(r.version for r in rows) == [1, 2]
    assert all(r.operation == "vacuum_dry_run" for r in rows)
    assert CommitLog(path).versions() == [1, 2, 3]  # untouched
    # nothing eligible -> one NULL-version row, still nothing deleted
    none_rows = cat.sql("VACUUM t RETAIN 3 DRY RUN").collect()
    assert [r.version for r in none_rows] == [None]
    # RESTORE ... TO TIMESTAMP AS OF resolves via version_at
    ts2 = CommitLog(path).manifest(2)["committed_at"]
    cat.sql(f"RESTORE t TO TIMESTAMP AS OF '{ts2}'")
    assert CommitLog(path).current_version() == 4
    got = {r.k: r.v for r in cat.sql("SELECT k, v FROM t").collect()}
    assert got[1] == 99 and got[2] == 2  # v2's state: first merge only
    # real vacuum still works after the dry runs
    cat.sql("VACUUM t RETAIN 1")
    assert CommitLog(path).versions() == [4]


# --- S38: CONVERT TO LAKEHOUSE -------------------------------------------------


def test_convert_to_lakehouse_zero_copy(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog
    from pretalx_hub_etl_spark.sinks.convert import convert_to_lakehouse

    plain = str(tmp_path / "estate")
    spark.range(100).selectExpr(
        "id AS k", "id % 4 AS region", "id * 2 AS v"
    ).write.partitionBy("region").parquet(plain)
    sink = convert_to_lakehouse(plain, key="k", bloom_on="k")
    # zero copy: every v1 file shares its inode with an adopted original
    log = CommitLog(plain)
    m = log.manifest(1)
    assert m["files"]
    import glob

    for e in m["files"]:
        linked = os.path.join(plain, "v1", e["path"])
        orig = os.path.join(plain, e["path"])
        assert os.stat(linked).st_ino == os.stat(orig).st_ino
        assert "bloom" in e  # index built during conversion
    # partition columns adopted: stats tagged, props recorded, reads
    # reconstruct them
    assert log.table_props()["partition_by"] == ["region"]
    df = sink.read(spark)
    assert df.count() == 100
    assert df.filter("region = 2").count() == 25
    # blooms + stats prune the ADOPTED layout (before any rewrite)
    _dfp, _scanned, skipped = sink.read_pruned(spark, "k", 7, 7)
    assert skipped > 0
    # the table is a full citizen: keyed DML + time travel
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("conv", plain)
    cat.sql("UPDATE conv SET v = 0 WHERE k = 7")
    assert cat.sql("SELECT v FROM conv WHERE k = 7").collect()[0].v == 0
    assert (
        cat.sql("SELECT count(*) AS n FROM conv VERSION AS OF 1")
        .collect()[0].n
        == 100
    )
    # double conversion refuses
    with pytest.raises(FileExistsError):
        convert_to_lakehouse(plain)
    # empty/non-parquet dir refuses
    os.makedirs(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        convert_to_lakehouse(str(tmp_path / "empty"))


# --- ALTER TABLE: ADD COLUMNS / RENAME / SET TBLPROPERTIES --------------------


def test_alter_add_columns_metadata_only(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    path = str(tmp_path / "t")
    MergeSink(path, key="k").init(
        spark.range(10).selectExpr("id AS k", "id AS v")
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("t", path, key="k")
    cat.sql("ALTER TABLE t ADD COLUMNS (score DOUBLE, tag STRING)")
    # metadata-only: no new version, no file rewritten
    assert CommitLog(path).versions() == [1]
    # reads overlay the declared columns as typed NULLs
    row = cat.sql("SELECT k, v, score, tag FROM t WHERE k = 3").collect()[0]
    assert (row.score, row.tag) == (None, None)
    assert dict(cat.sql("SELECT * FROM t").dtypes)["score"] == "double"
    # pruned reads resolve them too (scan views get the overlay)
    assert (
        cat.sql("SELECT score FROM t WHERE k < 5").count() == 5
    )
    # duplicate column refuses
    with pytest.raises(ValueError, match="already exist"):
        cat.sql("ALTER TABLE t ADD COLUMNS (v BIGINT)")
    # writes materialize the column; mixed-schema versions still read
    cat.sql("UPDATE t SET score = 1.5 WHERE k = 3")
    cat.sql("INSERT INTO t VALUES (100, 100, 2.5, 'x')")
    got = {
        r.k: (r.score, r.tag)
        for r in cat.sql("SELECT k, score, tag FROM t").collect()
    }
    assert got[3] == (1.5, None) and got[100] == (2.5, "x")
    assert got[1] == (None, None)
    assert len(got) == 11
    # MERGE against the evolved table works without explicit evolution
    spark.createDataFrame(
        [(1, 7, 9.9, "m")], "k long, v long, score double, tag string"
    ).createOrReplaceTempView("alter_src")
    cat.sql(
        "MERGE INTO t USING alter_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET score = s.score, tag = s.tag "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert cat.sql("SELECT tag FROM t WHERE k = 1").collect()[0].tag == "m"
    # UPDATE of a genuinely unknown column still refuses
    with pytest.raises(ValueError, match="unknown column"):
        cat.sql("UPDATE t SET nope = 1")


def test_alter_rename_and_set_tblproperties(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    wh = str(tmp_path / "wh")
    path = str(tmp_path / "t")
    MergeSink(path, key="k").init(
        spark.range(5).selectExpr("id AS k", "id AS v")
    )
    cat = LakehouseSqlCatalog(spark, warehouse=wh)
    cat.register_cow("old_t", path)  # keyless
    # RENAME: catalog-level, persists, old name gone everywhere
    cat.sql("ALTER TABLE old_t RENAME TO new_t")
    assert cat.sql("SELECT count(*) AS n FROM new_t").collect()[0].n == 5
    with pytest.raises(Exception, match="old_t"):
        cat.sql("SELECT * FROM old_t").collect()
    fresh = LakehouseSqlCatalog(spark, warehouse=wh)
    names = {r.table for r in fresh.sql("SHOW TABLES").collect()}
    assert "new_t" in names and "old_t" not in names
    # SET TBLPROPERTIES retrofits the merge key -> DML now routes
    with pytest.raises(ValueError, match="merge key"):
        cat.sql("DELETE FROM new_t WHERE k = 0")
    cat.sql("ALTER TABLE new_t SET TBLPROPERTIES (merge_key='k')")
    cat.sql("DELETE FROM new_t WHERE k = 0")
    assert cat.sql("SELECT count(*) AS n FROM new_t").collect()[0].n == 4
    # the key persisted: discoverable by a fresh session
    fresh2 = LakehouseSqlCatalog(spark, warehouse=wh)
    fresh2.sql("UPDATE new_t SET v = 9 WHERE k = 1")
    assert fresh2.sql("SELECT v FROM new_t WHERE k = 1").collect()[0].v == 9
    # a non-column key refuses; kind is immutable
    with pytest.raises(ValueError, match="not a column"):
        cat.sql("ALTER TABLE new_t SET TBLPROPERTIES (merge_key='zz')")
    with pytest.raises(ValueError, match="immutable"):
        cat.sql("ALTER TABLE new_t SET TBLPROPERTIES (kind='mor')")


def test_zorder_arbitrary_domains(spark, tmp_path):
    # strings / negative ints normalize to equi-depth range buckets —
    # without normalization a string dimension casts to NULL and the
    # layout silently collapses
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    path = str(tmp_path / "z")
    df = spark.range(2048).selectExpr(
        "id - 1024 AS k",  # NEGATIVE domain
        "concat('user_', lpad(cast(pmod(id * 2654435761, 2048) as string), 5, '0')) AS name",
        "id AS v",
    )
    sink = MergeSink(path, key="k")
    sink.init(df.repartition(8))
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("z", path, key="k")
    cat.sql("OPTIMIZE z ZORDER BY (k, name)")
    # content identical
    assert sink.read(spark).count() == 2048
    assert (
        cat.sql("SELECT sum(v) AS s FROM z").collect()[0].s
        == sum(range(2048))
    )
    # post-ZORDER: BOTH dimensions prune — the negative int by range,
    # the string by lexicographic range
    _d1, _s1, sk_k = sink.read_where(spark, [("k", -1024, -900)])
    assert sk_k > 0
    _d2, _s2, sk_n = sink.read_where(spark, [("name", "user_00000", "user_00200")])
    assert sk_n > 0
    # and the rows coming back are right (spot check through SQL)
    n = cat.sql(
        "SELECT count(*) AS n FROM z WHERE name BETWEEN 'user_00000' AND 'user_00200'"
    ).collect()[0].n
    assert n == 201


def test_prune_hardening_edges(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog
    from pretalx_hub_etl_spark.plans.prune_sql import extract_scan_prunes

    # backquoted aliases bail pruning (the rewrite would inject a
    # second alias) but the query still runs on the plain view
    occs = extract_scan_prunes(
        "SELECT `a b`.k FROM t `a b` WHERE k < 5", "t", {"k"}
    )
    assert len(occs) == 1 and occs[0].prunes == []
    occs2 = extract_scan_prunes(
        "SELECT x.k FROM t AS `x` WHERE k < 5", "t", {"k"}
    )
    assert occs2[0].prunes == []
    path = str(tmp_path / "t")
    MergeSink(path, key="k").init(
        spark.range(20).selectExpr("id AS k", "id AS v")
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("t", path, key="k")
    got = cat.sql("SELECT `a b`.k FROM t `a b` WHERE `a b`.k < 5").count()
    assert got == 5
    # ZORDER BY resolves columns case-insensitively
    cat.sql("OPTIMIZE t ZORDER BY (K, V)")
    assert CommitLog(path).current_version() == 2
    assert cat.sql("SELECT count(*) AS n FROM t").collect()[0].n == 20


# --- adversarial-review regressions (round-13 self-review) --------------------


def test_sql_comments_never_extract_prunes(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.prune_sql import extract_prunes
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    cols = {"k", "j"}
    # a commented-out WHERE/conjunct must never prune (it is not part
    # of the statement Spark executes)
    assert extract_prunes("SELECT * FROM t -- WHERE k < 5", "t", cols) == []
    assert [
        c for c, _lo, _hi in extract_prunes(
            "SELECT * FROM t WHERE k < 5 -- AND j > 100", "t", cols
        )
    ] == ["k"]
    assert [
        c for c, _lo, _hi in extract_prunes(
            "SELECT * FROM t WHERE k < 5 /* AND j > 100 */", "t", cols
        )
    ] == ["k"]
    # end-to-end: the commented predicate does NOT narrow the result
    path = str(tmp_path / "t")
    MergeSink(path, key="k", cluster_by=("k", 4)).init(
        spark.range(40).selectExpr("id AS k", "id AS j")
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("t", path, key="k")
    assert cat.sql("SELECT k FROM t -- WHERE k < 5").count() == 40
    assert (
        cat.sql("SELECT k FROM t WHERE k < 10 /* AND j > 35 */").count()
        == 10
    )


def test_optimize_preserves_altered_column(spark, tmp_path):
    # the rewrite ops must read evolved mixed-schema versions with
    # mergeSchema, or a materialized ALTER column silently drops and
    # the overlay masks the loss with NULLs forever
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    path = str(tmp_path / "t")
    MergeSink(path, key="k").init(
        spark.range(40).selectExpr("id AS k", "id AS v")
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("t", path, key="k")
    cat.sql("ALTER TABLE t ADD COLUMNS (score DOUBLE)")
    cat.sql("INSERT INTO t VALUES (100, 100, 7.5)")  # mixed version
    cat.sql("OPTIMIZE t ZORDER BY (k, v)")  # full relayout rewrite
    assert (
        cat.sql("SELECT score FROM t WHERE k = 100").collect()[0].score
        == 7.5
    )
    # bare OPTIMIZE re-applies and still preserves it
    cat.sql("OPTIMIZE t")
    assert (
        cat.sql("SELECT score FROM t WHERE k = 100").collect()[0].score
        == 7.5
    )
    # zorder_by persisted as a STRING via SET TBLPROPERTIES still works
    cat.sql("ALTER TABLE t SET TBLPROPERTIES (zorder_by='k,v')")
    cat.sql("OPTIMIZE t")
    assert cat.sql("SELECT count(*) AS n FROM t").collect()[0].n == 41


def test_ds_path_serves_altered_column(spark, tmp_path):
    # the DataSource (compat) path on an evolved mixed-schema table:
    # schema unions the declared column, pre-ALTER files fill typed
    # NULLs, post-ALTER files serve their real values
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    register(spark)
    path = str(tmp_path / "t")
    MergeSink(path, key="k").init(
        spark.range(10).selectExpr("id AS k", "id AS v")
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("t", path, key="k")
    cat.sql("ALTER TABLE t ADD COLUMNS (score DOUBLE)")
    cat.sql("INSERT INTO t VALUES (100, 100, 7.5)")
    cat.register_cow("td", path, use_datasource=True)
    rows = {r.k: r.score for r in cat.sql("SELECT k, score FROM td").collect()}
    assert rows[100] == 7.5 and rows[1] is None and len(rows) == 11


def test_ctas_failed_payload_does_not_wedge_location(spark, tmp_path):
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    cat = LakehouseSqlCatalog(spark)
    spark.range(5).selectExpr("id AS k").createOrReplaceTempView("cts")
    path = str(tmp_path / "t")
    with pytest.raises(Exception):
        cat.sql(
            f"CREATE TABLE bad USING lakehouse LOCATION '{path}' AS "
            "SELECT assert_true(k < 2) AS x, k FROM cts"
        )
    # the location is NOT wedged: the corrected CTAS succeeds
    cat.sql(
        f"CREATE TABLE good USING lakehouse LOCATION '{path}' AS "
        "SELECT k FROM cts"
    )
    assert cat.sql("SELECT count(*) AS n FROM good").collect()[0].n == 5


def test_bloom_probe_type_family_gate(spark, tmp_path):
    # SQL implicit casts: WHERE strcol = 5 matches '05' after the cast,
    # so a numeric probe against a STRING column's bloom must not skip
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog

    path = str(tmp_path / "b")
    sink = MergeSink(path, key="k", bloom_on="code")
    sink.init(
        spark.range(400)
        .selectExpr("id AS k", "lpad(cast(id as string), 4, '0') AS code")
        .repartition(4, "k")
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("b", path, key="k")
    # numeric literal against the string column: Spark casts and finds
    # '0005'; the bloom must keep the file (family mismatch -> no probe)
    assert cat.sql("SELECT k FROM b WHERE code = '0005'").count() == 1
    got = cat.sql("SELECT k FROM b WHERE code = 0005").collect()
    assert [r.k for r in got] == [5]
    # matched-family point probes still skip (no regression)
    _df, scanned, skipped = sink.read_where(spark, [("code", "0005", "0005")])
    assert skipped > 0
