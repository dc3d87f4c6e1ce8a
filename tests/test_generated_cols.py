"""S44: GENERATED ALWAYS AS columns, computed/validated at write time.

A generated column omitted from the written data is computed from its
expression inside the write job; a supplied value must equal the
expression (null-safe) or the commit aborts. Declared in CREATE TABLE,
stored as `generated.<col>` table props, enforced at the same protocol
seam as CHECK/NOT NULL (all sinks + SQL DML + COPY INTO).
"""

from __future__ import annotations

import os

import pytest

from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog
from pretalx_hub_etl_spark.sinks.manifest import CommitLog
from pretalx_hub_etl_spark.sinks.merge import _versions


def _mk(spark, tmp_path, name="gt", kind="cow"):
    path = os.path.join(str(tmp_path), "t")
    cat = LakehouseSqlCatalog(spark)
    props = f"merge_key='k'" + (", kind='mor'" if kind == "mor" else "")
    cat.sql(
        f"CREATE TABLE {name} (k INT, cents BIGINT, "
        f"dollars BIGINT GENERATED ALWAYS AS (cents DIV 100)) "
        f"USING lakehouse LOCATION '{path}' TBLPROPERTIES ({props})"
    )
    return cat, path


def test_create_persists_generation_expr(spark, tmp_path):
    _, path = _mk(spark, tmp_path)
    props = CommitLog(path).table_props()
    assert props["generated.dollars"] == "cents DIV 100"
    # the stored schema DDL is plain (parsable), with the column present
    assert "GENERATED" not in props["schema_ddl"].upper()
    assert "dollars" in props["schema_ddl"]


def test_omitted_generated_column_is_computed(spark, tmp_path):
    cat, _ = _mk(spark, tmp_path)
    cat.sql("INSERT INTO gt (k, cents) VALUES (1, 250)")
    cat.sql("INSERT INTO gt VALUES (2, 999)")  # positional, no gen col
    got = {
        (r.k, r.cents, r.dollars)
        for r in cat.sql("SELECT * FROM gt").collect()
    }
    assert got == {(1, 250, 2), (2, 999, 9)}


def test_supplied_value_must_match_expression(spark, tmp_path):
    cat, path = _mk(spark, tmp_path)
    cat.sql("INSERT INTO gt (k, cents) VALUES (1, 250)")
    before = len(_versions(path))
    with pytest.raises(Exception, match="GENERATED column 'dollars'"):
        cat.sql("INSERT INTO gt VALUES (2, 999, 42)")  # 42 != 9
    assert len(_versions(path)) == before
    cat.sql("INSERT INTO gt VALUES (2, 999, 9)")  # correct value: fine
    assert cat.sql("SELECT * FROM gt").count() == 2


def test_update_recomputes_generated_column(spark, tmp_path):
    cat, _ = _mk(spark, tmp_path)
    cat.sql("INSERT INTO gt (k, cents) VALUES (1, 250)")
    # UPDATE only sets cents: the generated dollars column is
    # RECOMPUTED from the updated row (the Delta UPDATE contract)
    cat.sql("UPDATE gt SET cents = 700 WHERE k = 1")
    r = cat.sql("SELECT * FROM gt").first()
    assert (r.k, r.cents, r.dollars) == (1, 700, 7)
    # explicitly assigning a WRONG value still fails validation
    with pytest.raises(Exception, match="GENERATED column 'dollars'"):
        cat.sql("UPDATE gt SET dollars = 99 WHERE k = 1")


def test_mor_table_generates_too(spark, tmp_path):
    cat, _ = _mk(spark, tmp_path, name="gm", kind="mor")
    cat.sql("INSERT INTO gm (k, cents) VALUES (1, 250)")
    cat.sql("INSERT INTO gm (k, cents) VALUES (1, 500)")  # upsert
    r = cat.sql("SELECT * FROM gm").first()
    assert (r.k, r.cents, r.dollars) == (1, 500, 5)


def test_copy_into_computes_generated(spark, tmp_path):
    cat, _ = _mk(spark, tmp_path)
    stage = os.path.join(str(tmp_path), "stage")
    spark.createDataFrame(
        [(1, 250), (2, 999)], "k INT, cents BIGINT"
    ).coalesce(1).write.parquet(os.path.join(stage, "b1"))
    cat.sql(f"COPY INTO gt FROM '{stage}' FILEFORMAT = PARQUET")
    got = {
        (r.k, r.cents, r.dollars)
        for r in cat.sql("SELECT * FROM gt").collect()
    }
    assert got == {(1, 250, 2), (2, 999, 9)}


def test_copy_into_csv_never_carries_generated(spark, tmp_path):
    cat, _ = _mk(spark, tmp_path)
    stage = os.path.join(str(tmp_path), "csvstage")
    os.makedirs(stage)
    with open(os.path.join(stage, "a.csv"), "w") as fh:
        fh.write("k,cents\n7,701\n")
    cat.sql(f"COPY INTO gt FROM '{stage}' FILEFORMAT = CSV")
    r = cat.sql("SELECT * FROM gt").first()
    assert (r.k, r.cents, r.dollars) == (7, 701, 7)


def test_check_constraint_may_reference_generated(spark, tmp_path):
    # generation runs BEFORE invariants at the protocol seam, so a
    # CHECK over the generated column sees the computed value
    cat, _ = _mk(spark, tmp_path)
    cat.sql("INSERT INTO gt (k, cents) VALUES (1, 250)")
    cat.sql(
        "ALTER TABLE gt ADD CONSTRAINT d_cap CHECK (dollars < 100)"
    )
    with pytest.raises(Exception, match="CHECK constraint 'd_cap'"):
        cat.sql("INSERT INTO gt (k, cents) VALUES (2, 99999)")
    cat.sql("INSERT INTO gt (k, cents) VALUES (2, 9999)")
    assert cat.sql("SELECT * FROM gt").count() == 2
