"""TPC-H-style composite queries over the synthetic corpus.

Engine demonstrations of multi-way join + aggregation + top-k plans (the
shapes Catalyst must get right at 100 TB: dim broadcasts, one fact shuffle,
partial aggregation, TakeOrderedAndProject). Monetary sums use the
fixed-cents pattern (ARCHITECTURE.md) so the DuckDB oracles hash-match.

The corpus is TPC-H-ish, not TPC-H: predicates are adapted to its value
distributions (dates 1995-2001, regions AFRICA..MIDDLE EAST).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.core import fixed_cents
from . import query

_REV_CENTS = "CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)"


def _rev_cents() -> F.Column:
    return fixed_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))


# --- Q3 shape: shipping priority (3-way join + agg + top-k) -----------------


@query(
    "q_tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           CAST(sum({_REV_CENTS}) AS BIGINT) / 100.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cust = cat.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = cat.orders.filter(F.col("o_orderdate") < "1998-01-01").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = cat.lineitem.filter(F.col("l_shipdate") > "1998-01-01").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # no broadcast hint: customer SCALES with SF — under the threshold
        # Catalyst broadcasts it anyway; at 100 TB it degrades to a
        # sort-merge join instead of OOMing the executors
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(_rev_cents()) / F.lit(100.0)).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# --- Q5 shape: local-supplier revenue per nation (6-way join) ---------------


@query(
    "q_tpch_q5",
    oracle=f"""
    SELECT n_name,
           CAST(sum({_REV_CENTS}) AS BIGINT) / 100.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.join(cat.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(cat.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        # supplier scales with SF: hint only the fixed-size dims below and
        # let the threshold decide here
        .join(
            cat.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(cat.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg((F.sum(_rev_cents()) / F.lit(100.0)).alias("revenue"))
    )


# --- Q6 shape: forecast revenue change (single-scan filter + agg) -----------


@query(
    "q_tpch_q6",
    oracle="""
    SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100.0 + 0.5)
                         AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 25
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            (F.sum(fixed_cents(F.col("l_extendedprice") * F.col("l_discount"))) / F.lit(100.0)).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- Q14 shape: promo revenue share (conditional agg over a dim join) -------


@query(
    "q_tpch_q14",
    oracle=f"""
    SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_CENTS} ELSE 0 END)
                AS DOUBLE) * 100.0
           / sum({_REV_CENTS}) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    promo = F.when(F.col("p_type") == "PROMO", _rev_cents()).otherwise(F.lit(0))
    return (
        # part scales with SF — no forced broadcast (threshold decides)
        li.join(cat.part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.sum(promo).cast("double")
                * F.lit(100.0)
                / F.sum(_rev_cents())
            ).alias("promo_pct")
        )
    )


# --- Q17 shape: small-quantity revenue (correlated scalar subquery) ---------


_Q17_SQL = """
SELECT CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
       / 100.0 / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#4'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem l2
                    WHERE l2.l_partkey = part.p_partkey)
"""


@query("q_tpch_q17", oracle=_Q17_SQL)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deliberately written as SQL with the correlated scalar subquery
    # intact: Catalyst decorrelates it into an aggregate + equi-join
    # (per-part avg, then join on l_partkey) — the same plan the hand-
    # decorrelated DataFrame version would build. One SQL text serves as
    # both the Spark query and the DuckDB oracle. test_plans asserts no
    # nested-loop join survives.
    cat = Catalog(spark, sf_dir)
    cat.register_views()
    return cat.spark.sql(_Q17_SQL)


# --- Q18 shape: large-volume orders (HAVING subquery + semi-join + top-k) ---


@query(
    "q_tpch_q18",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 260)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    big_orders = (
        cat.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 260)
        .select("l_orderkey")
    )
    # sum(l_quantity) is exact: quantities are integral doubles, so the
    # HAVING threshold and sum_qty hash-match DuckDB bit-for-bit
    return (
        cat.lineitem.join(
            big_orders.withColumnRenamed("l_orderkey", "o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        )
        .join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


# --- Q10 shape: returned-item customers (join + agg + top-k) ----------------


@query(
    "q_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(sum({_REV_CENTS}) AS BIGINT) / 100.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.lineitem.filter(F.col("l_returnflag") == "R")
        .join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(_rev_cents()) / F.lit(100.0)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )
