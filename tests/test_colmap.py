"""S46 column mapping: metadata-only RENAME COLUMN / DROP COLUMN
(sinks/colmap.py + the lakehouse SQL surface), time-travel name
fidelity, resurrection guards, and the mixed-version MERGE target fix."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog
from pretalx_hub_etl_spark.sinks.manifest import CommitLog
from pretalx_hub_etl_spark.sinks.merge import MergeSink


def _cat(spark, tmp_path):
    return LakehouseSqlCatalog(spark, warehouse=str(tmp_path / "wh"))


def test_rename_column_end_to_end(spark, tmp_path):
    path = str(tmp_path / "t")
    cat = _cat(spark, tmp_path)
    MergeSink(path, key="k").init(
        spark.range(10).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).alias("ck"),
            (F.col("id") * 100).alias("cents"),
        )
    )
    cat.register_path("rc_t", path)
    cat.sql("INSERT INTO rc_t VALUES (10, 1, 1000)")  # v2
    cat.sql("ALTER TABLE rc_t RENAME COLUMN cents TO amount")  # v3 meta
    # current read: logical name, all values (old files under mergeSchema)
    cur = cat.sql("SELECT k, amount FROM rc_t").collect()
    assert {r["k"]: r["amount"] for r in cur} == {
        **{i: i * 100 for i in range(10)},
        10: 1000,
    }
    # mixed version: INSERT writes the NEW physical name
    cat.sql("INSERT INTO rc_t VALUES (11, 2, 1100)")  # v4
    got = {
        r["k"]: r["amount"]
        for r in cat.sql("SELECT k, amount FROM rc_t").collect()
    }
    assert got[11] == 1100 and got[0] == 0 and got[10] == 1000
    # UPDATE over the mixed version (MERGE reads the manifest path)
    cat.sql("UPDATE rc_t SET amount = amount + 7 WHERE k = 3")
    got = {
        r["k"]: r["amount"]
        for r in cat.sql("SELECT k, amount FROM rc_t").collect()
    }
    assert got[3] == 307 and got[11] == 1100 and len(got) == 12
    # predicate through the scan-rewrite path stays correct
    n = cat.sql(
        "SELECT count(*) AS n FROM rc_t WHERE amount > 900"
    ).first()["n"]
    assert n == 2  # 1000 and 1100 (900 itself is not > 900)
    # time travel BELOW the rename anchor: original name, no 'amount'
    old = cat.sql("SELECT * FROM rc_t VERSION AS OF 2")
    assert "cents" in old.columns and "amount" not in old.columns
    assert old.filter("k = 10").first()["cents"] == 1000
    # time travel AT/ABOVE the anchor: new name
    anchored = cat.sql("SELECT * FROM rc_t VERSION AS OF 3")
    assert "amount" in anchored.columns and "cents" not in anchored.columns


def test_drop_column_and_resurrection_guards(spark, tmp_path):
    path = str(tmp_path / "t")
    cat = _cat(spark, tmp_path)
    cat.sql(
        f"CREATE TABLE dc_t (k BIGINT, ck BIGINT, v BIGINT) USING "
        f"lakehouse LOCATION '{path}' TBLPROPERTIES (merge_key='k')"
    )
    cat.sql("INSERT INTO dc_t VALUES (1, 10, 100), (2, 20, 200)")
    cat.sql("ALTER TABLE dc_t DROP COLUMN ck")
    cur = cat.sql("SELECT * FROM dc_t")
    assert sorted(cur.columns) == ["k", "v"]
    # pre-drop snapshot still carries it
    old = cat.sql("SELECT * FROM dc_t VERSION AS OF 1")
    assert "ck" in old.columns
    assert old.filter("k = 1").first()["ck"] == 10
    # DROP COLUMN IF EXISTS on a gone column: summary, no raise
    cat.sql("ALTER TABLE dc_t DROP COLUMN IF EXISTS ck")
    with pytest.raises(ValueError, match="not a column"):
        cat.sql("ALTER TABLE dc_t DROP COLUMN ck")
    # resurrection guards: ADD COLUMNS and RENAME-to refuse retired names
    with pytest.raises(ValueError, match="resurrect"):
        cat.sql("ALTER TABLE dc_t ADD COLUMNS (ck BIGINT)")
    cat.sql("ALTER TABLE dc_t RENAME COLUMN v TO w")
    with pytest.raises(ValueError, match="resurrect|previous physical"):
        cat.sql("ALTER TABLE dc_t RENAME COLUMN w TO v")
    # INSERT after the drop writes the narrow schema; reads stay clean
    cat.sql("INSERT INTO dc_t VALUES (3, 300)")
    got = {
        r["k"]: r["w"] for r in cat.sql("SELECT k, w FROM dc_t").collect()
    }
    assert got == {1: 100, 2: 200, 3: 300}


def test_protected_and_referenced_columns_block(spark, tmp_path):
    path = str(tmp_path / "t")
    cat = _cat(spark, tmp_path)
    cat.sql(
        f"CREATE TABLE pr_t (k BIGINT, p BIGINT, v BIGINT, "
        f"d BIGINT GENERATED ALWAYS AS (v DIV 100)) USING lakehouse "
        f"LOCATION '{path}' TBLPROPERTIES (merge_key='k', "
        f"partition_by='p', 'constraint.pos'='v > 0')"
    )
    cat.sql("INSERT INTO pr_t (k, p, v) VALUES (1, 1, 100)")
    with pytest.raises(ValueError, match="merge key"):
        cat.sql("ALTER TABLE pr_t RENAME COLUMN k TO kk")
    with pytest.raises(ValueError, match="partition column"):
        cat.sql("ALTER TABLE pr_t DROP COLUMN p")
    with pytest.raises(ValueError, match="referenced by"):
        cat.sql("ALTER TABLE pr_t RENAME COLUMN v TO vv")
    with pytest.raises(ValueError, match="GENERATED"):
        cat.sql("ALTER TABLE pr_t RENAME COLUMN d TO dd")
    # dropping the generated column itself is allowed and removes its rule
    cat.sql("ALTER TABLE pr_t DROP COLUMN d")
    props = CommitLog(path).table_props()
    assert "generated.d" not in props
    cat.sql("INSERT INTO pr_t VALUES (2, 1, 200)")
    got = {
        r["k"]: (r["p"], r["v"])
        for r in cat.sql("SELECT k, p, v FROM pr_t").collect()
    }
    # value-level assert: the positional VALUES row binds (k, p, v) in
    # DECLARED order, not the scan's partition-column-last order
    assert got == {1: (1, 100), 2: (1, 200)}, got


def test_notnull_follows_rename(spark, tmp_path):
    path = str(tmp_path / "t")
    cat = _cat(spark, tmp_path)
    cat.sql(
        f"CREATE TABLE nn_t (k BIGINT, v BIGINT) USING lakehouse "
        f"LOCATION '{path}' TBLPROPERTIES (merge_key='k', "
        f"'notnull.v'='true')"
    )
    cat.sql("INSERT INTO nn_t VALUES (1, 10)")
    cat.sql("ALTER TABLE nn_t RENAME COLUMN v TO val")
    props = CommitLog(path).table_props()
    assert props.get("notnull.val") == "true"
    assert "notnull.v" not in props
    with pytest.raises(Exception, match="(?i)null"):
        cat.sql("INSERT INTO nn_t VALUES (2, NULL)")


def test_mor_rename_column(spark, tmp_path):
    from pretalx_hub_etl_spark.sinks.mor import MorTable

    path = str(tmp_path / "t")
    cat = _cat(spark, tmp_path)
    MorTable(path, key="k").init(
        spark.range(5).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
    )
    cat.register_path("mr_t", path)
    cat.sql("INSERT INTO mr_t VALUES (2, 99)")  # delta under old name
    cat.sql("ALTER TABLE mr_t RENAME COLUMN v TO val")
    cat.sql("INSERT INTO mr_t VALUES (7, 70)")  # delta under new name
    got = {
        r["k"]: r["val"]
        for r in cat.sql("SELECT k, val FROM mr_t").collect()
    }
    assert got == {0: 0, 1: 10, 2: 99, 3: 30, 4: 40, 7: 70}
    # as-of BELOW the anchor: original name
    old = cat.sql("SELECT * FROM mr_t VERSION AS OF 2")
    assert "v" in old.columns and "val" not in old.columns
    assert {r["k"]: r["v"] for r in old.collect()}[2] == 99


def test_merge_target_reads_mixed_version_through_manifest(
    spark, tmp_path
):
    """The MERGE/UPDATE target scan of a DECLARED mixed version goes
    through the manifest read (mergeSchema): an UPDATE that matches a
    few rows must not NULL out other rows' values of a column only some
    files carry (the raw one-footer directory scan did exactly that)."""
    path = str(tmp_path / "t")
    cat = _cat(spark, tmp_path)
    cat.sql(
        f"CREATE TABLE mx_t (k BIGINT, v BIGINT) USING lakehouse "
        f"LOCATION '{path}' TBLPROPERTIES (merge_key='k')"
    )
    cat.sql("INSERT INTO mx_t VALUES (1, 10), (2, 20)")
    cat.sql("ALTER TABLE mx_t ADD COLUMNS (w BIGINT)")
    cat.sql("INSERT INTO mx_t VALUES (3, 30, 333)")  # mixed version now
    cat.sql("UPDATE mx_t SET v = v + 1 WHERE k = 1")
    got = {
        (r["k"]): (r["v"], r["w"])
        for r in cat.sql("SELECT k, v, w FROM mx_t").collect()
    }
    # k=3's w survived the UPDATE that didn't touch it
    assert got == {1: (11, None), 2: (20, None), 3: (30, 333)}


def test_rename_prunes_old_and_new_files(spark, tmp_path):
    """Stats pruning on a renamed column: conjuncts translate to prior
    physical names, so files written BEFORE the rename still skip."""
    path = str(tmp_path / "t")
    cat = _cat(spark, tmp_path)
    MergeSink(path, key="k").init(
        spark.range(100).repartition(4).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("cents")
        )
    )
    cat.register_path("pz_t", path)
    cat.sql("ALTER TABLE pz_t RENAME COLUMN cents TO amount")
    cat.sql("INSERT INTO pz_t VALUES (200, 99999)")
    # correctness through the rewrite path (old files pruned or not)
    n = cat.sql(
        "SELECT count(*) AS n FROM pz_t WHERE amount > 50000"
    ).first()["n"]
    assert n == 1
    got = cat.sql(
        "SELECT sum(amount) AS s FROM pz_t WHERE amount >= 980"
    ).first()["s"]
    assert got == 980 + 990 + 99999
    # engine-level: the translated conjunct list skips by old-name stats
    sink = MergeSink(path, key="k")
    v = CommitLog(path).visible_version()
    _df, scanned, skipped = sink.read_where(
        spark,
        [("amount", 99000, None), ("cents", 99000, None)],
        version=v,
    )
    assert skipped >= 1  # pre-rename files skipped via their cents stats


def test_clone_rebases_column_events(spark, tmp_path):
    """SHALLOW CLONE of a column-mapped table: the events' `since`
    anchors reference SOURCE versions — the clone's history restarts at
    v1, so they rebase to 0 (the clone's v1 files ARE the post-event
    state, including pre-rename physical names)."""
    path = str(tmp_path / "src")
    cat = _cat(spark, tmp_path)
    MergeSink(path, key="k").init(
        spark.range(5).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("cents")
        )
    )
    cat.register_path("cl_src", path)
    cat.sql("ALTER TABLE cl_src RENAME COLUMN cents TO amount")
    dest = str(tmp_path / "dst")
    MergeSink(path, key="k").clone_to(dest)
    ev = CommitLog(dest).table_props()["column_events"]
    assert ev[0]["since"] == 0
    cat.register_path("cl_dst", dest)
    # clone's v1 (pre-rename physical files) reads under the NEW name,
    # both current and AS OF 1
    cur = cat.sql("SELECT * FROM cl_dst")
    assert "amount" in cur.columns and "cents" not in cur.columns
    v1 = cat.sql("SELECT * FROM cl_dst VERSION AS OF 1")
    assert "amount" in v1.columns and "cents" not in v1.columns
    assert {r["k"]: r["amount"] for r in v1.collect()} == {
        i: i * 10 for i in range(5)
    }


def test_version_diff_across_rename_and_add(spark, tmp_path):
    """table_changes()/version_diff across a RENAME COLUMN (and an ADD
    COLUMNS) boundary compares the LOGICAL column under its current
    name, NULL-filling the era that predates an added column."""
    path = str(tmp_path / "t")
    cat = _cat(spark, tmp_path)
    MergeSink(path, key="k").init(
        spark.range(4).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("cents")
        )
    )
    cat.register_path("vd_t", path)  # v1
    cat.sql("ALTER TABLE vd_t RENAME COLUMN cents TO amount")  # v2 meta
    cat.sql("ALTER TABLE vd_t ADD COLUMNS (tag STRING)")
    cat.sql("UPDATE vd_t SET amount = amount + 5 WHERE k = 2")  # v3
    from pretalx_hub_etl_spark.sinks.merge import version_diff

    log = CommitLog(path)
    d = version_diff(spark, path, "k", 1, log.current_version())
    rows = {r["k"]: r for r in d.collect()}
    assert set(rows) == {2}
    assert rows[2]["change"] == "update"
    assert rows[2]["old"]["amount"] == 20 and rows[2]["new"]["amount"] == 25
    assert rows[2]["old"]["tag"] is None
    # the SQL CDC face resolves the same way
    n = cat.sql(
        "SELECT count(*) AS n FROM table_changes('vd_t', 1)"
    ).first()["n"]
    assert n == 1


def test_partitioned_positional_insert_binds_declared_order(
    spark, tmp_path
):
    """Spark scans hive-partitioned tables with partition columns LAST;
    positional INSERT binding must follow the DECLARED order (k, p, v),
    or a VALUES row silently writes v's value into p (observed: the
    payload's cents landed in the partition column)."""
    path = str(tmp_path / "t")
    cat = _cat(spark, tmp_path)
    # DDL table (schema_ddl ordering)
    cat.sql(
        f"CREATE TABLE po_t (k BIGINT, p BIGINT, v BIGINT) USING "
        f"lakehouse LOCATION '{path}' TBLPROPERTIES (merge_key='k', "
        f"partition_by='p')"
    )
    cat.sql("INSERT INTO po_t VALUES (1, 1, 100)")  # first commit
    cat.sql("INSERT INTO po_t VALUES (2, 2, 200)")  # committed table
    cat.sql("INSERT INTO po_t SELECT k + 10, p, v + 1 FROM po_t WHERE k = 1")
    rows = {
        r["k"]: (r["p"], r["v"])
        for r in cat.sql("SELECT k, p, v FROM po_t").collect()
    }
    assert rows == {1: (1, 100), 2: (2, 200), 11: (1, 101)}, rows
    # SELECT * serves the declared order, not partition-cols-last
    assert cat.sql("SELECT * FROM po_t").columns == ["k", "p", "v"]
    # init-created table (column_order prop, no schema_ddl)
    path2 = str(tmp_path / "t2")
    MergeSink(path2, key="k", partition_by=["p"]).init(
        spark.createDataFrame([(1, 1, 100)], "k long, p long, v long")
    )
    cat.register_path("po_t2", path2)
    cat.sql("INSERT INTO po_t2 VALUES (2, 2, 200)")
    rows2 = {
        r["k"]: (r["p"], r["v"])
        for r in cat.sql("SELECT k, p, v FROM po_t2").collect()
    }
    assert rows2 == {1: (1, 100), 2: (2, 200)}, rows2
    assert MergeSink(path2, key="k").read(spark).columns == [
        "k",
        "p",
        "v",
    ]
