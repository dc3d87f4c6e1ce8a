"""TPC-H composite shapes, part 3: Q1, Q8, Q9 (adapted), Q15.

Q2/Q11/Q16/Q20 are out of scope for this corpus — they are partsupp-table
queries and the synthetic testdata ships no partsupp. Q9's supply cost is
derived from ``p_retailprice`` (documented below) for the same reason; its
PLAN shape (6-way join + per-nation-per-year profit rollup) is the point.

All monetary aggregates use the fixed-cents integer pattern
(ARCHITECTURE.md): sums happen on exact BIGINT cents on both engines; the
only doubles are final divisions of exact integers, which are IEEE-
deterministic and hash-stable.
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


# --- Q1: pricing summary (the canonical scan + full hash agg) ---------------


@query(
    "q_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
               AS BIGINT) / 100.0 AS sum_base_price,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0
               + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_disc_price,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
               * (1 + l_tax) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0
               AS sum_charge,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
               / CAST(count(*) AS DOUBLE) AS avg_qty,
           CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
               AS BIGINT) / (100.0 * count(*)) AS avg_price,
           CAST(sum(CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))
               AS BIGINT) / (100.0 * count(*)) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One scan, one partial+final hash agg, 6 measures over 2 group keys:
    # the query whose plan must be "scan -> partial agg -> tiny exchange
    # -> final agg" and nothing else at any scale.
    li = Catalog(spark, sf_dir).lineitem.filter(
        F.col("l_shipdate") <= "2001-06-01"
    )
    qty = F.col("l_quantity").cast("long")
    base_c = fixed_cents(F.col("l_extendedprice"))
    disc_c = _rev_cents()
    charge_c = fixed_cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )
    dpc = fixed_cents(F.col("l_discount"))
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            (F.sum(base_c) / 100.0).alias("sum_base_price"),
            (F.sum(disc_c) / 100.0).alias("sum_disc_price"),
            (F.sum(charge_c) / 100.0).alias("sum_charge"),
            (F.sum(qty) / n.cast("double")).alias("avg_qty"),
            (F.sum(base_c) / (F.lit(100.0) * n)).alias("avg_price"),
            (F.sum(dpc) / (F.lit(100.0) * n)).alias("avg_disc"),
            n.cast("long").alias("count_order"),
        )
    )


# --- Q8: national market share (7-way join + conditional share ratio) -------


@query(
    "q_tpch_q8",
    oracle=f"""
    WITH vol AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               {_REV_CENTS} AS rev_c,
               s_nationkey
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
          AND o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                              AND TIMESTAMP '1996-12-31'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN s_nationkey = 3 THEN rev_c ELSE 0 END)
               AS BIGINT) / CAST(sum(rev_c) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Market-share shape: the target nation's volume over total volume per
    # year. Joins order so each one is fact-side once: part and the
    # nation/region dims broadcast; lineitem shuffles once on l_orderkey.
    cat = Catalog(spark, sf_dir)
    part = cat.part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    nations_in_region = (
        cat.nation.join(
            F.broadcast(cat.region.filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey")
    )
    orders = cat.orders.filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") <= "1996-12-31")
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").cast("long").alias("o_year"))
    cust = cat.customer.join(
        F.broadcast(nations_in_region),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey")
    vol = (
        cat.lineitem.select(
            "l_orderkey", "l_partkey", "l_suppkey", _rev_cents().alias("rev_c")
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            cat.supplier.select("s_suppkey", "s_nationkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
    )
    return vol.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("s_nationkey") == 3, F.col("rev_c")).otherwise(0))
            / F.sum("rev_c").cast("double")
        ).alias("mkt_share")
    )


# --- Q9: product-type profit (adapted: cost derived from retail price) ------

_COST_CENTS = "CAST(floor(p_retailprice * 60.0 + 0.5) AS BIGINT)"


@query(
    "q_tpch_q9",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum({_REV_CENTS}
               - {_COST_CENTS} * CAST(l_quantity AS BIGINT)) AS BIGINT)
               / 100.0 AS sum_profit
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q9's plan shape with supply cost := 60% of p_retailprice (the corpus
    # has no partsupp table). Profit accumulates in exact integer cents.
    cat = Catalog(spark, sf_dir)
    part = cat.part.filter(F.col("p_name").like("%red%")).select(
        "p_partkey", fixed_cents(F.col("p_retailprice") * 0.6).alias("cost_c")
    )
    li = cat.lineitem.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        _rev_cents().alias("rev_c"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    orders = cat.orders.select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            cat.supplier.select("s_suppkey", "s_nationkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(
            (F.sum(F.col("rev_c") - F.col("cost_c") * F.col("qty")) / 100.0).alias(
                "sum_profit"
            )
        )
    )


# --- Q15: top supplier (agg + scalar-subquery max equality) -----------------


@query(
    "q_tpch_q15",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sum({_REV_CENTS}) AS BIGINT) AS total_c
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_c / 100.0 AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_c = (SELECT max(total_c) FROM rev)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The view + scalar-subquery shape: quarterly revenue per supplier,
    # keep the max. A naive `rev.join(rev.agg(max))` duplicates the whole
    # rev SUBTREE — Spark plans (and executes) the lineitem scan twice,
    # verified in tests/test_plans.py. Instead the max comes from an
    # unpartitioned window over the ALREADY-AGGREGATED side: one fact
    # scan, and the single-task window only ever sees |distinct suppkey|
    # pre-aggregated rows, not lineitem. Equality compares exact cent
    # longs, never floats.
    from pyspark.sql import Window

    cat = Catalog(spark, sf_dir)
    rev = (
        cat.lineitem.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_cents()).alias("total_c"))
    )
    best = rev.withColumn(
        "max_c", F.max("total_c").over(Window.partitionBy())
    ).filter(F.col("total_c") == F.col("max_c"))
    return (
        best.join(
            cat.supplier.select("s_suppkey", "s_name"),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey", "s_name", (F.col("total_c") / 100.0).alias("total_revenue")
        )
    )
