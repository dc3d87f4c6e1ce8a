"""TPC-H composite shapes, part 2: Q4/Q7/Q12/Q13/Q19/Q21/Q22 adaptations.

Each query exercises a distinct plan shape the engine must get right at
100 TB (SURVEY.md §2 "TPC-H composite shapes"):

- Q4  — EXISTS decorrelated to a left-semi join feeding an aggregate
- Q7  — two aliased joins against the SAME dim (nation as supplier-side
        and customer-side), disjunctive pair filter, per-year rollup
- Q12 — conditional (CASE) aggregation over a fact-fact join
- Q13 — left OUTER join with a join-side predicate, then a two-level
        aggregate (count per customer, then distribution of counts)
- Q19 — OR-of-ANDs predicate spanning both join sides: Catalyst must
        push the single-side conjuncts below the join and keep the
        residual disjunction as the join filter
- Q21 — semi-join AND anti-join against the same fact with a non-equi
        residual (same order, different supplier)
- Q22 — scalar-subquery threshold + NOT EXISTS anti-join + aggregate

The corpus is TPC-H-ish, not TPC-H (FIXTURES.md): lineitem carries no
commitdate/receiptdate/shipmode, so Q4/Q12/Q21's "late delivery" style
predicates are re-expressed over l_returnflag / o_orderpriority — the
plan shapes (the point of these queries) are unchanged.

Money aggregates use the fixed-cents pattern (ARCHITECTURE.md): quantize
per row to integer cents, sum exactly in any order, divide once — the
only way double sums hash-match DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.core import fixed_cents
from . import query

_REV_CENTS = "CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)"
_BAL_CENTS = "CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)"


def _rev_cents() -> F.Column:
    return fixed_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))


# --- Q4 shape: order-priority checking (EXISTS -> semi-join + agg) ----------


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    orders = cat.orders.filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    returned = cat.lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- Q7 shape: volume shipping (same dim joined twice, pair filter) ---------


@query(
    "q_tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(sum({_REV_CENTS}) AS BIGINT) / 100.0 AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    # the SAME tiny dim broadcast twice under different roles; filtering the
    # dim copies BEFORE the join prunes the fact rows at the join, not after
    n1 = cat.nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = cat.nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        cat.lineitem.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(cat.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg((F.sum(_rev_cents()) / F.lit(100.0)).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- Q12 shape: shipping modes / priority split (CASE agg over join) --------


@query(
    "q_tpch_q12",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        cat.orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --- Q13 shape: customer order-count distribution (outer join, 2-level agg) -


@query(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
               ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
          GROUP BY c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    # the orders-side predicate must live IN the join condition: a WHERE
    # after a left join would silently turn it inner (and drop the
    # zero-order customers the query exists to count)
    joined = cat.customer.join(
        cat.orders,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderpriority") != "5-LOW"),
        "left",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --- Q19 shape: discounted revenue (OR-of-ANDs across both join sides) ------


@query(
    "q_tpch_q19",
    oracle=f"""
    SELECT CAST(sum({_REV_CENTS}) AS BIGINT) / 100.0 AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
           AND l_quantity BETWEEN 25 AND 50)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    # written as one disjunctive filter AFTER the join, exactly like the
    # SQL: Catalyst infers the implied single-side filters
    # (p_brand IN (...) AND p_size BETWEEN 1 AND 50; l_quantity BETWEEN 1
    # AND 50) and pushes them into both parquet scans, keeping only the
    # cross-side disjunction as the join residual — test_plans asserts the
    # PushedFilters show up
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 50)
            & F.col("l_quantity").between(25, 50)
        )
    )
    return (
        cat.lineitem.join(cat.part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            (F.sum(_rev_cents()) / F.lit(100.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- Q21 shape: sole-fault supplier (semi + anti join, non-equi residual) ---


@query(
    "q_tpch_q21",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.select("l_orderkey", "l_suppkey", "l_returnflag")
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    returned_others = (
        li.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("o3_orderkey"),
            F.col("l_suppkey").alias("o3_suppkey"),
        )
    )
    # semi/anti joins are equi on the order key with the supplier
    # inequality as a residual — hash-partitioned on l_orderkey, never a
    # nested loop; all three legs shuffle on the same key so AQE can reuse
    # the exchange
    sole_fault = (
        l1.join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        ).join(
            returned_others,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    fin_orders = cat.orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    return (
        sole_fault.join(fin_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


# --- Q22 shape: dormant rich customers (scalar subquery + anti-join) --------


@query(
    "q_tpch_q22",
    oracle=f"""
    SELECT c_nationkey AS cntry, count(*) AS numcust,
           CAST(sum({_BAL_CENTS}) AS BIGINT) / 100.0 AS totacctbal
    FROM customer
    WHERE {_BAL_CENTS} > (SELECT CAST(sum({_BAL_CENTS}) AS DOUBLE) / count(*)
                          FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY cntry
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    bal_cents = fixed_cents(F.col("c_acctbal"))
    # the threshold is an exact-integer cents sum divided once — the same
    # IEEE division in both engines, so the > comparison can't flake at
    # the boundary the way a float avg() would (summation-order ulps)
    thresh = (
        cat.customer.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(bal_cents).cast("double") / F.count(F.lit(1))).alias("__thresh")
        )
    )
    return (
        cat.customer.join(F.broadcast(thresh))
        .filter(bal_cents > F.col("__thresh"))
        # anti-join against urgent orders only (the synthetic corpus gives
        # every customer SOME order, so TPC-H's "no orders at all" predicate
        # would be vacuously empty — this keeps the same plan shape with a
        # non-trivial result)
        .join(
            cat.orders.filter(F.col("o_orderpriority") == "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(bal_cents) / F.lit(100.0)).alias("totacctbal"),
        )
        .orderBy("cntry")
    )
