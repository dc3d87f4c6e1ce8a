"""S41: CHECK / NOT NULL table constraints.

Enforcement model (sinks/constraints.py): constraints live in the table
properties and every commit path (CoW MergeSink, MoR MorTable, the
write_table DataSource entry, and therefore all SQL DML) evaluates them
IN-FLIGHT inside the write job — a violating row aborts the staged
commit and the version never advances. ADD CONSTRAINT / SET NOT NULL
validate the current table state first, so "all live rows satisfy all
active constraints" is a maintained invariant.
"""

from __future__ import annotations

import os

import pytest

from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog
from pretalx_hub_etl_spark.sinks.manifest import CommitLog
from pretalx_hub_etl_spark.sinks.merge import MergeSink, _versions
from pretalx_hub_etl_spark.sinks.mor import MorTable
from pretalx_hub_etl_spark.sources.lakehouse_ds import write_table


def _mk_cow(spark, path, rows=((1, 10), (2, 20))):
    df = spark.createDataFrame(list(rows), "k INT, v INT")
    MergeSink(path, key="k").init(df)
    return df


def _cat(spark, name, path):
    cat = LakehouseSqlCatalog(spark)
    cat.register_path(name, path)
    return cat


def test_add_check_validates_existing_rows(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    _mk_cow(spark, path, rows=((1, 10), (2, -5)))
    cat = _cat(spark, "tc1", path)
    with pytest.raises(ValueError, match="existing row violates"):
        cat.sql("ALTER TABLE tc1 ADD CONSTRAINT v_pos CHECK (v >= 0)")
    # nothing persisted on failure
    assert "constraint.v_pos" not in CommitLog(path).table_props()


def test_insert_violating_check_aborts_commit(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    _mk_cow(spark, path)
    cat = _cat(spark, "tc2", path)
    cat.sql("ALTER TABLE tc2 ADD CONSTRAINT v_pos CHECK (v >= 0)")
    before = _versions(path)
    with pytest.raises(Exception, match="CHECK constraint 'v_pos'"):
        cat.sql("INSERT INTO tc2 VALUES (3, -1)")
    # the staged commit aborted: no version advance, no partial data
    assert _versions(path) == before
    got = {
        (r.k, r.v) for r in cat.sql("SELECT k, v FROM tc2").collect()
    }
    assert got == {(1, 10), (2, 20)}
    cat.sql("INSERT INTO tc2 VALUES (3, 7)")  # valid row still goes in
    assert cat.sql("SELECT * FROM tc2").count() == 3


def test_update_violating_check_aborts(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    _mk_cow(spark, path)
    cat = _cat(spark, "tc3", path)
    cat.sql("ALTER TABLE tc3 ADD CONSTRAINT v_cap CHECK (v < 100)")
    with pytest.raises(Exception, match="CHECK constraint 'v_cap'"):
        cat.sql("UPDATE tc3 SET v = v + 1000 WHERE k = 1")
    got = {(r.k, r.v) for r in cat.sql("SELECT * FROM tc3").collect()}
    assert got == {(1, 10), (2, 20)}


def test_null_check_result_passes(spark, tmp_path):
    # ANSI CHECK: UNKNOWN (NULL) accepts — only FALSE rejects
    path = os.path.join(str(tmp_path), "t")
    _mk_cow(spark, path)
    cat = _cat(spark, "tc4", path)
    cat.sql("ALTER TABLE tc4 ADD CONSTRAINT v_pos CHECK (v >= 0)")
    cat.sql("INSERT INTO tc4 VALUES (9, NULL)")  # v NULL -> UNKNOWN -> pass
    assert cat.sql("SELECT * FROM tc4 WHERE k = 9").count() == 1


def test_not_null_set_and_enforce(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    _mk_cow(spark, path)
    cat = _cat(spark, "tc5", path)
    cat.sql("ALTER TABLE tc5 ALTER COLUMN v SET NOT NULL")
    with pytest.raises(Exception, match="NOT NULL constraint"):
        cat.sql("INSERT INTO tc5 VALUES (9, NULL)")
    cat.sql("ALTER TABLE tc5 ALTER COLUMN v DROP NOT NULL")
    cat.sql("INSERT INTO tc5 VALUES (9, NULL)")
    assert cat.sql("SELECT * FROM tc5 WHERE v IS NULL").count() == 1


def test_set_not_null_validates_existing(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    df = spark.createDataFrame([(1, 10), (2, None)], "k INT, v INT")
    MergeSink(path, key="k").init(df)
    cat = _cat(spark, "tc6", path)
    with pytest.raises(ValueError, match="existing row violates"):
        cat.sql("ALTER TABLE tc6 ALTER COLUMN v SET NOT NULL")
    assert "notnull.v" not in CommitLog(path).table_props()


def test_drop_constraint_reopens_the_gate(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    _mk_cow(spark, path)
    cat = _cat(spark, "tc7", path)
    cat.sql("ALTER TABLE tc7 ADD CONSTRAINT v_pos CHECK (v >= 0)")
    cat.sql("ALTER TABLE tc7 DROP CONSTRAINT v_pos")
    cat.sql("INSERT INTO tc7 VALUES (3, -1)")  # now legal again
    assert cat.sql("SELECT * FROM tc7 WHERE v < 0").count() == 1
    with pytest.raises(ValueError, match="no constraint"):
        cat.sql("ALTER TABLE tc7 DROP CONSTRAINT v_pos")
    cat.sql("ALTER TABLE tc7 DROP CONSTRAINT IF EXISTS v_pos")  # no-op


def test_duplicate_constraint_name_rejected(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    _mk_cow(spark, path)
    cat = _cat(spark, "tc8", path)
    cat.sql("ALTER TABLE tc8 ADD CONSTRAINT v_pos CHECK (v >= 0)")
    with pytest.raises(ValueError, match="already exists"):
        cat.sql("ALTER TABLE tc8 ADD CONSTRAINT v_pos CHECK (v >= 1)")


def test_engine_api_merge_enforced_cow_and_mor(spark, tmp_path):
    # enforcement is protocol-level: the ENGINE sinks reject too
    cow = os.path.join(str(tmp_path), "cow")
    _mk_cow(spark, cow)
    cat = _cat(spark, "tc9", cow)
    cat.sql("ALTER TABLE tc9 ADD CONSTRAINT v_pos CHECK (v >= 0)")
    bad = spark.createDataFrame([(5, -3)], "k INT, v INT")
    with pytest.raises(Exception, match="CHECK constraint 'v_pos'"):
        MergeSink(cow, key="k").merge(spark, bad)

    mor = os.path.join(str(tmp_path), "mor")
    MorTable(mor, key="k").init(
        spark.createDataFrame([(1, 10)], "k INT, v INT")
    )
    catm = _cat(spark, "tc9m", mor)
    catm.sql("ALTER TABLE tc9m ADD CONSTRAINT v_pos CHECK (v >= 0)")
    with pytest.raises(Exception, match="CHECK constraint 'v_pos'"):
        MorTable(mor, key="k").merge(spark, source=bad)
    # tombstones carry no rows to check: deletes still commit
    MorTable(mor, key="k").merge(
        spark, deletes=spark.createDataFrame([(1,)], "k INT")
    )
    assert MorTable(mor, key="k").read(spark).count() == 0


def test_write_table_entry_enforced(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    _mk_cow(spark, path)
    cat = _cat(spark, "tc10", path)
    cat.sql("ALTER TABLE tc10 ADD CONSTRAINT v_pos CHECK (v >= 0)")
    bad = spark.createDataFrame([(7, -1)], "k INT, v INT")
    with pytest.raises(Exception, match="CHECK constraint 'v_pos'"):
        write_table(bad, path, mode="append")
    assert len(_versions(path)) == 1


def test_merge_sql_enforced(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    _mk_cow(spark, path)
    cat = _cat(spark, "tc11", path)
    cat.sql("ALTER TABLE tc11 ADD CONSTRAINT v_pos CHECK (v >= 0)")
    spark.createDataFrame(
        [(1, -50), (3, 30)], "k INT, v INT"
    ).createOrReplaceTempView("tc11_src")
    with pytest.raises(Exception, match="CHECK constraint 'v_pos'"):
        cat.sql(
            "MERGE INTO tc11 t USING tc11_src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)"
        )
    got = {(r.k, r.v) for r in cat.sql("SELECT * FROM tc11").collect()}
    assert got == {(1, 10), (2, 20)}


def test_create_table_not_null_declaration(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE tc12 (k INT NOT NULL, v INT) USING lakehouse "
        f"LOCATION '{path}' TBLPROPERTIES (merge_key='k')"
    )
    assert CommitLog(path).table_props().get("notnull.k") == "true"
    cat.sql("INSERT INTO tc12 VALUES (1, NULL)")  # v nullable: fine
    with pytest.raises(Exception, match="NOT NULL constraint"):
        cat.sql("INSERT INTO tc12 VALUES (NULL, 2)")
    assert cat.sql("SELECT * FROM tc12").count() == 1


def test_constraint_on_missing_column_is_clear_error(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    _mk_cow(spark, path)
    cat = _cat(spark, "tc13", path)
    with pytest.raises(ValueError, match="does not evaluate"):
        cat.sql("ALTER TABLE tc13 ADD CONSTRAINT bad CHECK (nope > 0)")
