"""Round-18 pins: optimization-round invariants.

Covers the r18 fixes: schema_ddl evolution on SQL MERGE WITH SCHEMA
EVOLUTION into a DECLARED table (the explicit-schema current-read fast
path serves exactly schema_ddl + prior physical names, so the DDL must
follow the physical evolution), the multi-version footer guard in
mor._rp, and the single-partition literal-frame helper.
"""

from __future__ import annotations

import os


def test_sql_merge_evolution_updates_declared_schema(spark, tmp_path):
    # DDL-created table (schema_ddl set) + MERGE WITH SCHEMA EVOLUTION:
    # the new physical column must survive a CURRENT read, which takes
    # the explicit-schema path built FROM schema_ddl — so the MERGE has
    # to evolve the declaration too (r17 ADVICE on merge.py:651).
    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog
    from pretalx_hub_etl_spark.sinks.manifest import CommitLog

    path = str(tmp_path / "decl_evt")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE decl_evt (k BIGINT, cents BIGINT) USING lakehouse "
        f"LOCATION '{path}' TBLPROPERTIES (merge_key='k')"
    )
    spark.createDataFrame(
        [(1, 100), (2, 200)], "k long, cents long"
    ).createOrReplaceTempView("decl_src0")
    cat.sql("INSERT INTO decl_evt SELECT * FROM decl_src0")
    spark.createDataFrame(
        [(1, 111, "gold"), (3, 300, "new")],
        "k long, cents long, tier string",
    ).createOrReplaceTempView("decl_src1")
    cat.sql(
        "MERGE WITH SCHEMA EVOLUTION INTO decl_evt t USING decl_src1 s "
        "ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET cents = s.cents, tier = s.tier "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    ddl = CommitLog(path).table_props().get("schema_ddl", "")
    assert "tier" in ddl.lower(), f"declaration did not evolve: {ddl!r}"
    got = {
        r.k: (r.cents, r.tier)
        for r in cat.sql("SELECT * FROM decl_evt").collect()
    }
    assert got[1] == (111, "gold")
    assert got[3] == (300, "new")
    assert got[2] == (200, None)


def test_rp_multi_version_footer_mismatch_falls_back(spark, tmp_path):
    # _rp pins sorted(files)[0]'s footer schema on the whole list; when
    # the list spans versions whose footers DIFFER (a later commit
    # widened a type) it must fall back to per-file reads instead of
    # forcing the donor's narrower type (r17 ADVICE on mor.py:48).
    from pretalx_hub_etl_spark.sinks.mor import _rp

    d1 = str(tmp_path / "v1")
    d2 = str(tmp_path / "v2")
    spark.createDataFrame([(1, 10)], "k int, v int").coalesce(1).write.parquet(d1)
    spark.createDataFrame([(2, 2**40)], "k int, v long").coalesce(1).write.parquet(d2)
    files = sorted(
        os.path.join(d, f)
        for d in (d1, d2)
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )
    got = _rp(spark, *files)
    rows = {r.k: r.v for r in got.collect()}
    assert rows == {1: 10, 2: 2**40}
    assert dict(got.dtypes)["v"] == "bigint"


def test_local_rows_single_partition_and_fidelity(spark):
    from pretalx_hub_etl_spark.operators.partitioning import local_rows

    df = local_rows(spark, [(1, [1.0, 2.0], None)], "a int, v array<double>, s string")
    assert df.rdd.getNumPartitions() == 1
    ref = spark.createDataFrame(
        [(1, [1.0, 2.0], None)], "a int, v array<double>, s string"
    )
    assert df.schema == ref.schema
    assert df.collect() == ref.collect()
    empty = local_rows(spark, [], "k INT, cents BIGINT")
    assert empty.rdd.getNumPartitions() == 1
    assert empty.count() == 0


def test_oracle_dtype_lint_green():
    # VERDICT r16 item 2: DuckDB widens sum(BIGINT) to HUGEINT, which
    # Arrow surfaces as decimal128 and reds the driver's type-tagged
    # hash even when values match. Every oracle must DESCRIBE clean.
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_parity import lint_oracles

    assert lint_oracles("/root/testdata/sf0.001") == 0
