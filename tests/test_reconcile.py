"""Reconcile/merge planner tests incl. the SURVEY.md §5.2.4 invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from pretalx_hub_etl_spark.operators.reconcile import reconcile


def plan_of(spark, src_rows, tgt_rows, **kw):
    src = spark.createDataFrame(src_rows, "k string, payload string")
    tgt = spark.createDataFrame(tgt_rows, "k string, payload string")
    return reconcile(src, tgt, key=["k"], compare=["payload"], **kw)


def test_all_four_flags(spark):
    plan = plan_of(
        spark,
        [("a", "p1"), ("b", "p2"), ("c", "p3")],
        [("b", "p2"), ("c", "CHANGED"), ("d", "p4")],
    )
    flags = {r.k: r.op_flag for r in plan.collect()}
    assert flags == {"a": "create", "b": "noop", "c": "update", "d": "delete"}


def test_normalized_key_lowers_both_sides(spark):
    # reference lowers its tag keys on both sides (main.py:135-155)
    plan = plan_of(spark, [("TALK-A", "x")], [("talk-a", "x")], normalize_key=True)
    rows = plan.collect()
    assert len(rows) == 1 and rows[0].op_flag == "noop"


def test_null_payload_comparison_is_null_safe(spark):
    plan = plan_of(spark, [("a", None)], [("a", None)])
    assert plan.collect()[0].op_flag == "noop"
    plan = plan_of(spark, [("a", None)], [("a", "x")])
    assert plan.collect()[0].op_flag == "update"


def test_invariants_cover_and_idempotence(spark):
    src_rows = [(f"k{i}", f"p{i % 7}") for i in range(50)]
    tgt_rows = [(f"k{i}", f"p{i % 5}") for i in range(20, 70)]
    plan = plan_of(spark, src_rows, tgt_rows)

    # create ∪ update ∪ noop covers all source rows exactly once
    n_src_side = plan.filter(F.col("op_flag").isin("create", "update", "noop")).count()
    assert n_src_side == len(src_rows)
    # delete rows are disjoint from the source key set
    deletes = {r.k for r in plan.filter(F.col("op_flag") == "delete").collect()}
    assert deletes.isdisjoint({k for k, _ in src_rows})

    # idempotence: applying the plan makes target == source; re-reconciling
    # yields only noops
    new_tgt = [
        (r.k, r.src_payload)
        for r in plan.collect()
        if r.op_flag in ("create", "update", "noop")
    ]
    plan2 = plan_of(spark, src_rows, new_tgt)
    assert plan2.filter(F.col("op_flag") != "noop").count() == 0
