"""S42: COPY INTO — exactly-once file ingestion across re-runs.

The loaded-file set persists in _manifest/_copy_state.json; re-running
the same statement loads only files not yet seen (by path), PATTERN
filters on the staging-relative path, FORCE reloads everything, and
row counts come from an Observation inside the write job.
"""

from __future__ import annotations

import os

import pytest

from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog
from pretalx_hub_etl_spark.sinks.merge import MergeSink, _versions
from pretalx_hub_etl_spark.sinks.mor import MorTable


def _stage(spark, root, name, rows):
    out = os.path.join(root, name)
    spark.createDataFrame(rows, "k INT, v INT").coalesce(1).write.parquet(
        out
    )
    # one visible data file per staged batch
    return out


def _cow(spark, tmp_path, name):
    path = os.path.join(str(tmp_path), "t")
    MergeSink(path, key="k").init(
        spark.createDataFrame([(0, 0)], "k INT, v INT")
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_path(name, path)
    return cat, path


def test_copy_into_is_idempotent(spark, tmp_path):
    cat, path = _cow(spark, tmp_path, "cp1")
    stage = os.path.join(str(tmp_path), "stage")
    _stage(spark, stage, "b1", [(1, 10), (2, 20)])

    r1 = cat.sql(
        f"COPY INTO cp1 FROM '{stage}' FILEFORMAT = PARQUET"
    ).first()
    assert r1.files_loaded >= 1 and r1.rows_loaded == 2
    v1 = len(_versions(path))

    # re-run: nothing new -> zero files, zero rows, NO version advance
    r2 = cat.sql(
        f"COPY INTO cp1 FROM '{stage}' FILEFORMAT = PARQUET"
    ).first()
    assert r2.files_loaded == 0 and r2.rows_loaded == 0
    assert r2.files_skipped == r1.files_loaded
    assert len(_versions(path)) == v1
    got = {(r.k, r.v) for r in cat.sql("SELECT * FROM cp1").collect()}
    assert got == {(0, 0), (1, 10), (2, 20)}


def test_copy_into_loads_only_new_files(spark, tmp_path):
    cat, _ = _cow(spark, tmp_path, "cp2")
    stage = os.path.join(str(tmp_path), "stage")
    _stage(spark, stage, "b1", [(1, 10)])
    cat.sql(f"COPY INTO cp2 FROM '{stage}' FILEFORMAT = PARQUET")
    _stage(spark, stage, "b2", [(2, 20), (3, 30)])
    r = cat.sql(
        f"COPY INTO cp2 FROM '{stage}' FILEFORMAT = PARQUET"
    ).first()
    assert r.rows_loaded == 2  # only the second batch
    assert cat.sql("SELECT * FROM cp2").count() == 4


def test_copy_into_pattern_filters(spark, tmp_path):
    cat, _ = _cow(spark, tmp_path, "cp3")
    stage = os.path.join(str(tmp_path), "stage")
    _stage(spark, stage, "keep", [(1, 10)])
    _stage(spark, stage, "drop", [(2, 20)])
    r = cat.sql(
        f"COPY INTO cp3 FROM '{stage}' FILEFORMAT = PARQUET "
        "PATTERN = 'keep/*'"
    ).first()
    assert r.rows_loaded == 1
    got = {(x.k, x.v) for x in cat.sql("SELECT * FROM cp3").collect()}
    assert got == {(0, 0), (1, 10)}


def test_copy_into_force_reloads(spark, tmp_path):
    cat, _ = _cow(spark, tmp_path, "cp4")
    stage = os.path.join(str(tmp_path), "stage")
    _stage(spark, stage, "b1", [(1, 10)])
    cat.sql(f"COPY INTO cp4 FROM '{stage}' FILEFORMAT = PARQUET")
    r = cat.sql(
        f"COPY INTO cp4 FROM '{stage}' FILEFORMAT = PARQUET FORCE = true"
    ).first()
    assert r.rows_loaded == 1  # reloaded despite being recorded
    # CoW append-only: the forced reload duplicates the row (documented)
    assert cat.sql("SELECT * FROM cp4 WHERE k = 1").count() == 2


def test_copy_into_csv_under_table_schema(spark, tmp_path):
    cat, _ = _cow(spark, tmp_path, "cp5")
    stage = os.path.join(str(tmp_path), "csvstage")
    os.makedirs(stage)
    with open(os.path.join(stage, "a.csv"), "w") as fh:
        fh.write("k,v\n7,70\n8,80\n")
    r = cat.sql(
        f"COPY INTO cp5 FROM '{stage}' FILEFORMAT = CSV"
    ).first()
    assert r.rows_loaded == 2
    got = {(x.k, x.v) for x in cat.sql("SELECT * FROM cp5").collect()}
    assert got == {(0, 0), (7, 70), (8, 80)}


def test_copy_into_mor_is_keyed_upsert(spark, tmp_path):
    path = os.path.join(str(tmp_path), "m")
    MorTable(path, key="k").init(
        spark.createDataFrame([(1, 1)], "k INT, v INT")
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("cp6", path)
    stage = os.path.join(str(tmp_path), "stage")
    _stage(spark, stage, "b1", [(1, 99), (2, 20)])
    cat.sql(f"COPY INTO cp6 FROM '{stage}' FILEFORMAT = PARQUET")
    got = {(x.k, x.v) for x in cat.sql("SELECT * FROM cp6").collect()}
    assert got == {(1, 99), (2, 20)}  # upserted, not duplicated


def test_copy_into_schema_mismatch_rejected(spark, tmp_path):
    cat, path = _cow(spark, tmp_path, "cp7")
    stage = os.path.join(str(tmp_path), "stage")
    out = os.path.join(stage, "bad")
    spark.createDataFrame([(1, "x")], "k INT, other STRING").write.parquet(
        out
    )
    before = len(_versions(path))
    with pytest.raises(ValueError, match="source columns"):
        cat.sql(f"COPY INTO cp7 FROM '{stage}' FILEFORMAT = PARQUET")
    assert len(_versions(path)) == before
    # the failed statement must NOT mark the files as loaded
    from pretalx_hub_etl_spark.sinks.copy_into import loaded_files

    assert loaded_files(path) == {}


def test_copy_into_respects_constraints(spark, tmp_path):
    cat, path = _cow(spark, tmp_path, "cp8")
    cat.sql("ALTER TABLE cp8 ADD CONSTRAINT v_pos CHECK (v >= 0)")
    stage = os.path.join(str(tmp_path), "stage")
    _stage(spark, stage, "b1", [(5, -1)])
    before = len(_versions(path))
    with pytest.raises(Exception, match="CHECK constraint 'v_pos'"):
        cat.sql(f"COPY INTO cp8 FROM '{stage}' FILEFORMAT = PARQUET")
    assert len(_versions(path)) == before
    from pretalx_hub_etl_spark.sinks.copy_into import loaded_files

    assert loaded_files(path) == {}  # aborted load stays retryable


def test_copy_into_ddl_created_empty_table(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE cp9 (k INT, v INT) USING lakehouse "
        f"LOCATION '{path}' TBLPROPERTIES (merge_key='k')"
    )
    stage = os.path.join(str(tmp_path), "stage")
    _stage(spark, stage, "b1", [(1, 10)])
    cat.sql(f"COPY INTO cp9 FROM '{stage}' FILEFORMAT = PARQUET")
    assert cat.sql("SELECT * FROM cp9").count() == 1


def test_copy_into_crash_window_cannot_double_load(spark, tmp_path):
    # the loaded-file record rides the COMMIT: simulate a crash right
    # after the data publish (before the committed marker / any side
    # bookkeeping) — the re-run heals the pending copy-txn and must
    # load ZERO new rows
    import json

    from pretalx_hub_etl_spark.sinks.copy_into import list_source_files
    from pretalx_hub_etl_spark.sinks.txn import (
        LakehouseTransaction,
        _publish_one,
    )

    cat, path = _cow(spark, tmp_path, "cp10")
    stage = os.path.join(str(tmp_path), "stage")
    _stage(spark, stage, "b1", [(1, 10), (2, 20)])
    coord = os.path.join(path, "_manifest", "_copytxn")
    todo = list_source_files(stage, None)
    txn = LakehouseTransaction(coord)
    df = spark.read.parquet(*sorted(todo))
    txn.stage_append(path, df, copy_files=todo)
    os.makedirs(coord, exist_ok=True)
    with open(os.path.join(coord, f"{txn.id}.json"), "x") as fh:
        json.dump({"id": txn.id, "entries": txn._entries}, fh)
    _publish_one(coord, txn.id, 0, txn._entries[0])
    # CRASH here: no committed marker, no _copy_state.json update
    r = cat.sql(
        f"COPY INTO cp10 FROM '{stage}' FILEFORMAT = PARQUET"
    ).first()
    assert r.files_loaded == 0 and r.rows_loaded == 0, (
        "crash window double-loaded the staged files"
    )
    got = {(x.k, x.v) for x in cat.sql("SELECT * FROM cp10").collect()}
    assert got == {(0, 0), (1, 10), (2, 20)}  # healed, once


def test_copy_into_merge_schema_evolution(spark, tmp_path):
    cat, path = _cow(spark, tmp_path, "cp11")
    stage = os.path.join(str(tmp_path), "stage")
    _stage(spark, stage, "b1", [(1, 10)])
    cat.sql(f"COPY INTO cp11 FROM '{stage}' FILEFORMAT = PARQUET")
    # a new column arrives in the staging area
    spark.createDataFrame(
        [(2, 20, "x")], "k INT, v INT, w STRING"
    ).coalesce(1).write.parquet(os.path.join(stage, "b2"))
    # without the option: a clear error, nothing marked loaded
    with pytest.raises(ValueError, match="mergeSchema"):
        cat.sql(f"COPY INTO cp11 FROM '{stage}' FILEFORMAT = PARQUET")
    r = cat.sql(
        f"COPY INTO cp11 FROM '{stage}' FILEFORMAT = PARQUET "
        f"FORMAT_OPTIONS ('mergeSchema' = 'true')"
    ).first()
    assert r.rows_loaded == 1
    got = {
        (x.k, x.v, x.w)
        for x in cat.sql("SELECT k, v, w FROM cp11").collect()
    }
    # pre-evolution rows overlay the new column as NULL
    assert got == {(0, 0, None), (1, 10, None), (2, 20, "x")}


def test_merge_schema_rolls_back_on_failed_load(spark, tmp_path):
    from pretalx_hub_etl_spark.sinks.manifest import CommitLog

    cat, path = _cow(spark, tmp_path, "cp12")
    cat.sql("ALTER TABLE cp12 ADD CONSTRAINT v_pos CHECK (v >= 0)")
    stage = os.path.join(str(tmp_path), "stage")
    spark.createDataFrame(
        [(1, -5, "x")], "k INT, v INT, w STRING"
    ).coalesce(1).write.parquet(os.path.join(stage, "b1"))
    ddl_before = CommitLog(path).table_props().get("schema_ddl")
    with pytest.raises(Exception, match="CHECK constraint"):
        cat.sql(
            f"COPY INTO cp12 FROM '{stage}' FILEFORMAT = PARQUET "
            f"FORMAT_OPTIONS ('mergeSchema' = 'true')"
        )
    # no phantom declared column from the failed load
    assert CommitLog(path).table_props().get("schema_ddl") == ddl_before


def test_merge_schema_never_drops_requirements(spark, tmp_path):
    cat, path = _cow(spark, tmp_path, "cp13")
    stage = os.path.join(str(tmp_path), "stage")
    # source has a NEW column but is MISSING the table column v
    spark.createDataFrame(
        [(1, "x")], "k INT, w STRING"
    ).coalesce(1).write.parquet(os.path.join(stage, "b1"))
    with pytest.raises(ValueError, match="missing table column"):
        cat.sql(
            f"COPY INTO cp13 FROM '{stage}' FILEFORMAT = PARQUET "
            f"FORMAT_OPTIONS ('mergeSchema' = 'true')"
        )


def test_merge_schema_rejected_for_text_formats(spark, tmp_path):
    cat, _ = _cow(spark, tmp_path, "cp14")
    stage = os.path.join(str(tmp_path), "csvstage")
    os.makedirs(stage)
    with open(os.path.join(stage, "a.csv"), "w") as fh:
        fh.write("k,v\n1,10\n")
    with pytest.raises(ValueError, match="PARQUET"):
        cat.sql(
            f"COPY INTO cp14 FROM '{stage}' FILEFORMAT = CSV "
            f"FORMAT_OPTIONS ('mergeSchema' = 'true')"
        )
