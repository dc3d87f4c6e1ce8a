"""S43b: SHOW CREATE TABLE round trip, TRUNCATE TABLE, MERGE via views."""

from __future__ import annotations

import os

import pytest

from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog
from pretalx_hub_etl_spark.sinks.manifest import CommitLog
from pretalx_hub_etl_spark.sinks.merge import MergeSink
from pretalx_hub_etl_spark.sinks.mor import MorTable


def test_show_create_round_trips_full_semantics(spark, tmp_path):
    p1 = os.path.join(str(tmp_path), "t1")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE sc1 (k INT NOT NULL, cents BIGINT, "
        f"dollars BIGINT GENERATED ALWAYS AS (cents DIV 100)) "
        f"USING lakehouse LOCATION '{p1}' "
        f"TBLPROPERTIES (merge_key='k', bloom_on='k')"
    )
    cat.sql("ALTER TABLE sc1 ADD CONSTRAINT c_pos CHECK (cents >= 0)")
    stmt = cat.sql("SHOW CREATE TABLE sc1").first().createtab_stmt
    assert "NOT NULL" in stmt and "GENERATED ALWAYS AS" in stmt
    assert "constraint.c_pos" in stmt and "bloom_on" in stmt
    # the emitted statement RECREATES the table at a new location with
    # identical declared semantics
    p2 = os.path.join(str(tmp_path), "t2")
    cat.sql(stmt.replace(f"'{p1}'", f"'{p2}'").replace("sc1", "sc2", 1))
    a = CommitLog(p1).table_props()
    b = CommitLog(p2).table_props()
    assert a == b
    # and the recreated table ENFORCES what it declares
    with pytest.raises(Exception, match="CHECK constraint 'c_pos'"):
        cat.sql("INSERT INTO sc2 (k, cents) VALUES (1, -5)")
    cat.sql("INSERT INTO sc2 (k, cents) VALUES (1, 250)")
    r = cat.sql("SELECT * FROM sc2").first()
    assert (r.k, r.cents, r.dollars) == (1, 250, 2)


def test_show_create_for_view(spark, tmp_path):
    p = os.path.join(str(tmp_path), "t")
    MergeSink(p, key="k").init(
        spark.createDataFrame([(1, 10)], "k INT, v INT")
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("scv", p)
    cat.sql("CREATE VIEW scv_big AS SELECT k FROM scv WHERE v > 5")
    stmt = cat.sql("SHOW CREATE TABLE scv_big").first().createtab_stmt
    assert stmt == "CREATE VIEW scv_big AS SELECT k FROM scv WHERE v > 5"


def test_truncate_cow_keeps_schema_and_history(spark, tmp_path):
    p = os.path.join(str(tmp_path), "t")
    MergeSink(p, key="k").init(
        spark.createDataFrame([(1, 10), (2, 20)], "k INT, v INT")
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("tr1", p)
    cat.sql("TRUNCATE TABLE tr1")
    assert cat.sql("SELECT * FROM tr1").count() == 0
    assert [f.name for f in cat.sql("SELECT * FROM tr1").schema] == [
        "k",
        "v",
    ]
    # history intact: time travel reaches the pre-truncate snapshot
    assert cat.sql("SELECT * FROM tr1 VERSION AS OF 1").count() == 2
    cat.sql("INSERT INTO tr1 VALUES (9, 90)")  # still writable
    assert cat.sql("SELECT * FROM tr1").count() == 1


def test_truncate_mor_restarts_the_chain(spark, tmp_path):
    p = os.path.join(str(tmp_path), "m")
    t = MorTable(p, key="k")
    t.init(spark.createDataFrame([(1, 10)], "k INT, v INT"))
    t.merge(spark, source=spark.createDataFrame([(2, 20)], "k INT, v INT"))
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("tr2", p)
    cat.sql("TRUNCATE TABLE tr2")
    assert cat.sql("SELECT * FROM tr2").count() == 0
    # deltas after the truncate-checkpoint apply to the empty state
    t.merge(spark, source=spark.createDataFrame([(3, 30)], "k INT, v INT"))
    got = {(r.k, r.v) for r in cat.sql("SELECT * FROM tr2").collect()}
    assert got == {(3, 30)}


def test_merge_using_persistent_view(spark, tmp_path):
    p = os.path.join(str(tmp_path), "t")
    src = os.path.join(str(tmp_path), "s")
    MergeSink(p, key="k").init(
        spark.createDataFrame([(1, 10), (2, 20)], "k INT, v INT")
    )
    MergeSink(src, key="k").init(
        spark.createDataFrame([(1, 99), (3, 30), (4, -1)], "k INT, v INT")
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("mt", p)
    cat.register_path("ms", src)
    cat.sql("CREATE VIEW ms_pos AS SELECT k, v FROM ms WHERE v >= 0")
    cat.sql(
        "MERGE INTO mt t USING ms_pos s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)"
    )
    got = {(r.k, r.v) for r in cat.sql("SELECT * FROM mt").collect()}
    assert got == {(1, 99), (2, 20), (3, 30)}  # 4/-1 filtered by the view


def test_analyze_for_columns_from_manifest(spark, tmp_path):
    p = os.path.join(str(tmp_path), "t")
    MergeSink(p, key="k").init(
        spark.createDataFrame(
            [(1, 10), (2, None), (3, 30)], "k INT, v INT"
        ).coalesce(1)
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("an1", p)
    rows = {
        r.column: r
        for r in cat.sql(
            "ANALYZE TABLE an1 COMPUTE STATISTICS FOR COLUMNS k, v"
        ).collect()
    }
    assert rows["k"].min == "1" and rows["k"].max == "3"
    assert rows["k"].null_count == 0 and rows["k"].approx_ndv == 3
    assert rows["v"].null_count == 1
    assert rows["v"].min == "10" and rows["v"].max == "30"
    with pytest.raises(ValueError, match="unknown column"):
        cat.sql("ANALYZE TABLE an1 COMPUTE STATISTICS FOR COLUMNS nope")


def test_show_create_quotes_and_case_round_trip(spark, tmp_path):
    # CHECK expressions containing string literals escape as doubled
    # quotes and survive the round trip; constraint-name case persists
    p1 = os.path.join(str(tmp_path), "q1")
    p2 = os.path.join(str(tmp_path), "q2")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE qt1 (k INT, status STRING) USING lakehouse "
        f"LOCATION '{p1}' TBLPROPERTIES (merge_key='k')"
    )
    cat.sql(
        "ALTER TABLE qt1 ADD CONSTRAINT Status_Ok "
        "CHECK (status IN ('a','b'))"
    )
    props1 = CommitLog(p1).table_props()
    assert "constraint.Status_Ok" in props1  # case preserved
    stmt = cat.sql("SHOW CREATE TABLE qt1").first().createtab_stmt
    cat.sql(stmt.replace(f"'{p1}'", f"'{p2}'").replace("qt1", "qt2", 1))
    assert CommitLog(p2).table_props() == props1
    with pytest.raises(Exception, match="Status_Ok"):
        cat.sql("INSERT INTO qt2 VALUES (1, 'z')")
    cat.sql("INSERT INTO qt2 VALUES (1, 'a')")
    assert cat.sql("SELECT * FROM qt2").count() == 1


def test_create_partition_by_is_honored(spark, tmp_path):
    p = os.path.join(str(tmp_path), "pt")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE pt1 (k INT, pk INT, v INT) USING lakehouse "
        f"LOCATION '{p}' TBLPROPERTIES (merge_key='k', "
        f"partition_by='pk')"
    )
    props = CommitLog(p).table_props()
    assert props["partition_by"] == ["pk"]  # normalized to a list
    cat.sql("INSERT INTO pt1 VALUES (1, 7, 10), (2, 8, 20)")
    # the first INSERT physically partitioned the commit
    v1 = os.path.join(p, "v1")
    assert any(d.startswith("pk=") for d in os.listdir(v1))


def test_analyze_mor_folds_the_chain(spark, tmp_path):
    p = os.path.join(str(tmp_path), "m")
    t = MorTable(p, key="k")
    t.init(
        spark.createDataFrame([(1, 10), (2, 20)], "k INT, v INT").coalesce(1)
    )
    t.merge(
        spark,
        source=spark.createDataFrame([(3, 99)], "k INT, v INT").coalesce(1),
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("anm", p)
    rows = {
        r.column: r
        for r in cat.sql(
            "ANALYZE TABLE anm COMPUTE STATISTICS FOR COLUMNS v"
        ).collect()
    }
    # the head manifest alone would say min=max=99; the chain fold
    # must see the checkpoint too
    assert rows["v"].min == "10" and rows["v"].max == "99"
    assert rows["v"].bounds_are_chain is True


def test_insert_column_list_is_case_insensitive(spark, tmp_path):
    p = os.path.join(str(tmp_path), "t")
    cat = LakehouseSqlCatalog(spark)
    cat.sql(
        f"CREATE TABLE ci1 (k INT, cents BIGINT) USING lakehouse "
        f"LOCATION '{p}' TBLPROPERTIES (merge_key='k')"
    )
    cat.sql("INSERT INTO ci1 (K, CENTS) VALUES (1, 100)")
    r = cat.sql("SELECT * FROM ci1").first()
    assert (r.k, r.cents) == (1, 100)


def test_dml_where_with_subqueries(spark, tmp_path):
    # UPDATE/DELETE conditions resolve through the full read surface:
    # subqueries over OTHER registered tables and views work
    t = os.path.join(str(tmp_path), "t")
    q = os.path.join(str(tmp_path), "q")
    MergeSink(t, key="k").init(
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], "k INT, v INT"
        )
    )
    MergeSink(q, key="k").init(
        spark.createDataFrame([(2,), (3,)], "k INT")
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("dml_t", t)
    cat.register_path("dml_q", q)
    cat.sql("CREATE VIEW dml_qv AS SELECT k FROM dml_q WHERE k > 2")
    cat.sql(
        "UPDATE dml_t SET v = v + 100 "
        "WHERE k IN (SELECT k FROM dml_qv)"
    )
    got = {(r.k, r.v) for r in cat.sql("SELECT * FROM dml_t").collect()}
    assert got == {(1, 10), (2, 20), (3, 130)}
    cat.sql("DELETE FROM dml_t WHERE k IN (SELECT k FROM dml_q)")
    got = {(r.k, r.v) for r in cat.sql("SELECT * FROM dml_t").collect()}
    assert got == {(1, 10)}


def test_mor_delete_where_subquery(spark, tmp_path):
    t = os.path.join(str(tmp_path), "m")
    q = os.path.join(str(tmp_path), "q")
    MorTable(t, key="k").init(
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], "k INT, v INT"
        )
    )
    MergeSink(q, key="k").init(
        spark.createDataFrame([(2,)], "k INT")
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("mdel_t", t)
    cat.register_path("mdel_q", q)
    cat.sql("DELETE FROM mdel_t WHERE k IN (SELECT k FROM mdel_q)")
    got = {(r.k, r.v) for r in cat.sql("SELECT * FROM mdel_t").collect()}
    assert got == {(1, 10), (3, 30)}


def test_mor_delete_self_referential_subquery(spark, tmp_path):
    p = os.path.join(str(tmp_path), "m2")
    MorTable(p, key="k").init(
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], "k INT, v INT"
        )
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("msr", p)
    # read msr first so a temp view snapshot exists, then mutate, then
    # a self-referential DELETE must see the FRESH state
    cat.sql("SELECT * FROM msr").collect()
    cat.sql("INSERT INTO msr VALUES (4, 40)")
    cat.sql(
        "DELETE FROM msr WHERE k IN "
        "(SELECT k FROM msr WHERE v >= 30)"
    )
    got = {(r.k, r.v) for r in cat.sql("SELECT * FROM msr").collect()}
    assert got == {(1, 10), (2, 20)}  # 3 AND the post-snapshot 4 gone


def test_mor_delete_with_time_travel_subquery(spark, tmp_path):
    p = os.path.join(str(tmp_path), "m3")
    MorTable(p, key="k").init(
        spark.createDataFrame([(1, 10), (2, 20)], "k INT, v INT")
    )
    cat = LakehouseSqlCatalog(spark)
    cat.register_path("mtt", p)
    cat.sql("INSERT INTO mtt VALUES (3, 30)")
    # delete exactly the keys that existed at version 1
    cat.sql(
        "DELETE FROM mtt WHERE k IN "
        "(SELECT k FROM mtt VERSION AS OF 1)"
    )
    got = {(r.k, r.v) for r in cat.sql("SELECT * FROM mtt").collect()}
    assert got == {(3, 30)}
