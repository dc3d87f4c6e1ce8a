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
