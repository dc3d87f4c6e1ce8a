"""S43: persistent late-binding views in the warehouse catalog.

CREATE VIEW stores SQL text (not a snapshot) in the warehouse catalog;
every statement referencing the name re-runs it against the CURRENT
table state, nested views resolve depth-first, cycles raise, and a
fresh session against the same warehouse discovers views by name.
"""

from __future__ import annotations

import os

import pytest

from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog
from pretalx_hub_etl_spark.sinks.merge import MergeSink


def _setup(spark, tmp_path, with_warehouse=False):
    path = os.path.join(str(tmp_path), "t")
    MergeSink(path, key="k").init(
        spark.createDataFrame([(1, 10), (2, 20)], "k INT, v INT")
    )
    wh = os.path.join(str(tmp_path), "wh") if with_warehouse else None
    cat = LakehouseSqlCatalog(spark, warehouse=wh)
    cat.register_path("vt", path)
    return cat, path, wh


def test_view_is_late_binding(spark, tmp_path):
    cat, _, _ = _setup(spark, tmp_path)
    cat.sql("CREATE VIEW big AS SELECT k, v FROM vt WHERE v >= 15")
    assert cat.sql("SELECT * FROM big").count() == 1
    cat.sql("INSERT INTO vt VALUES (3, 30)")
    # the view re-binds to the CURRENT state, not creation-time state
    assert cat.sql("SELECT * FROM big").count() == 2


def test_view_persists_across_sessions(spark, tmp_path):
    cat, path, wh = _setup(spark, tmp_path, with_warehouse=True)
    cat.sql("CREATE VIEW big AS SELECT k, v FROM vt WHERE v >= 15")
    fresh = LakehouseSqlCatalog(spark, warehouse=wh)
    got = {(r.k, r.v) for r in fresh.sql("SELECT * FROM big").collect()}
    assert got == {(2, 20)}
    views = fresh.sql("SHOW VIEWS").collect()
    assert [r.view for r in views] == ["big"]
    # and SHOW TABLES does not list the view
    tables = [r for r in fresh.sql("SHOW TABLES").collect()]
    assert all(getattr(r, "table", "") != "big" for r in tables)


def test_nested_views_and_or_replace(spark, tmp_path):
    cat, _, _ = _setup(spark, tmp_path)
    cat.sql("CREATE VIEW lvl1 AS SELECT k, v * 2 AS v2 FROM vt")
    cat.sql("CREATE VIEW lvl2 AS SELECT k FROM lvl1 WHERE v2 > 30")
    assert cat.sql("SELECT * FROM lvl2").count() == 1
    with pytest.raises(ValueError, match="already exists"):
        cat.sql("CREATE VIEW lvl1 AS SELECT 1 AS x")
    cat.sql("CREATE OR REPLACE VIEW lvl2 AS SELECT k FROM lvl1")
    assert cat.sql("SELECT * FROM lvl2").count() == 2


def test_view_cycle_raises(spark, tmp_path):
    cat, _, wh = _setup(spark, tmp_path, with_warehouse=True)
    cat.sql("CREATE VIEW a1 AS SELECT k FROM vt")
    cat.sql("CREATE VIEW b1 AS SELECT k FROM a1")
    # redefine a1 to read b1 -> a1 -> b1 cycle; the replace validates
    # the body, which must detect the cycle instead of recursing forever
    with pytest.raises(ValueError, match="cycle"):
        cat.sql("CREATE OR REPLACE VIEW a1 AS SELECT k FROM b1")


def test_drop_view(spark, tmp_path):
    cat, _, wh = _setup(spark, tmp_path, with_warehouse=True)
    cat.sql("CREATE VIEW big AS SELECT k FROM vt")
    cat.sql("DROP VIEW big")
    assert cat.sql("SHOW VIEWS").count() == 0
    with pytest.raises(ValueError, match="no view"):
        cat.sql("DROP VIEW big")
    cat.sql("DROP VIEW IF EXISTS big")  # no-op
    fresh = LakehouseSqlCatalog(spark, warehouse=wh)
    assert fresh.sql("SHOW VIEWS").count() == 0


def test_name_collisions_rejected(spark, tmp_path):
    cat, path, _ = _setup(spark, tmp_path)
    with pytest.raises(ValueError, match="table with that name"):
        cat.sql("CREATE VIEW vt AS SELECT 1 AS x")
    cat.sql("CREATE VIEW myview AS SELECT k FROM vt")
    other = os.path.join(str(tmp_path), "t2")
    with pytest.raises(ValueError, match="view with that name"):
        cat.sql(
            f"CREATE TABLE myview (k INT) USING lakehouse "
            f"LOCATION '{other}'"
        )


def test_insert_payload_reads_view(spark, tmp_path):
    cat, path, _ = _setup(spark, tmp_path)
    other = os.path.join(str(tmp_path), "t2")
    cat.sql("CREATE VIEW big AS SELECT k, v FROM vt WHERE v >= 15")
    cat.sql(
        f"CREATE TABLE dst (k INT, v INT) USING lakehouse "
        f"LOCATION '{other}' TBLPROPERTIES (merge_key='k')"
    )
    cat.sql("INSERT INTO dst SELECT k, v FROM big")
    assert cat.sql("SELECT * FROM dst").count() == 1


def test_view_over_time_travel(spark, tmp_path):
    cat, _, _ = _setup(spark, tmp_path)
    cat.sql("INSERT INTO vt VALUES (9, 90)")
    cat.sql("CREATE VIEW v1snap AS SELECT k, v FROM vt VERSION AS OF 1")
    assert cat.sql("SELECT * FROM v1snap").count() == 2
    assert cat.sql("SELECT * FROM vt").count() == 3
