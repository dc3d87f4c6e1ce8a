"""Flagship query: q_reconcile_merge (SURVEY.md ST5 / §7 stage 0).

The reference's whole Transform phase (main.py:105-166) as one full-outer
join. Source and target snapshots are carved deterministically out of
``orders`` so the plan exercises all four op flags:

- src  = orders with o_orderkey % 3 != 0 (payload: o_orderpriority)
- tgt  = orders with o_orderkey % 5 != 0, with every 7th payload stale
- create: in src only; delete: in tgt only; update: payload drifted;
  noop: identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..operators.reconcile import reconcile
from . import query

_ORACLE = """
WITH src AS (
    SELECT o_orderkey AS order_id, o_orderpriority AS payload
    FROM orders WHERE o_orderkey % 3 <> 0
),
tgt AS (
    SELECT o_orderkey AS order_id,
           CASE WHEN o_orderkey % 7 = 0 THEN 'STALE' ELSE o_orderpriority END AS payload
    FROM orders WHERE o_orderkey % 5 <> 0
)
SELECT
    COALESCE(s.order_id, t.order_id) AS order_id,
    s.payload AS src_payload,
    t.payload AS tgt_payload,
    CASE
        WHEN t.order_id IS NULL THEN 'create'
        WHEN s.order_id IS NULL THEN 'delete'
        WHEN s.payload IS DISTINCT FROM t.payload THEN 'update'
        ELSE 'noop'
    END AS op_flag
FROM src s FULL OUTER JOIN tgt t ON s.order_id = t.order_id
"""


def _snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = Catalog(spark, sf_dir).orders
    src = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderpriority").alias("payload"),
    )
    tgt = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("order_id"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("STALE"))
        .otherwise(F.col("o_orderpriority"))
        .alias("payload"),
    )
    return src, tgt


@query("q_reconcile_merge", oracle=_ORACLE)
def q_reconcile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    src, tgt = _snapshots(spark, sf_dir)
    plan = reconcile(src, tgt, key=["order_id"], compare=["payload"])
    return plan.select("order_id", "src_payload", "tgt_payload", "op_flag")
