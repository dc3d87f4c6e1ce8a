"""TPC-H composite shapes, part 4: Q2, Q11, Q16, Q20 — ADAPTED.

The synthetic corpus ships no ``partsupp`` table, so these four queries run
over a *pseudo-partsupp* derived deterministically from lineitem (one
groupBy on the (partkey, suppkey) pair):

    ps_availqty     := sum(l_quantity)                 -- exact BIGINT
    ps_supplycost_c := min(revenue cents)              -- exact BIGINT cents

In a real deployment partsupp is a stored table and the derivation
disappears; here it costs one extra shuffle that both engines pay
identically. What these queries exercise is the four PLAN shapes the rest
of the TPC-H suite lacks:

- **Q2**: correlated per-group MIN subquery (min-cost supplier per part in
  a region) — planned as a single pass with a window-min over the eligible
  set, never a self-join that would re-scan the fact side.
- **Q11**: group value vs a GLOBAL scalar threshold — the scalar comes
  from an unpartitioned window over the ALREADY-AGGREGATED rows (the Q15
  trick), so lineitem is scanned once; the comparison is exact integer
  (``value_c * 1000 > total_c``), never float.
- **Q16**: count(DISTINCT supplier) per part attribute with a NOT-IN
  exclusion — planned as a broadcast LEFT ANTI join (supplier is the tiny
  side by construction). Adapted exclusion: suppliers with negative
  account balance stand in for the reference's comment-matched
  "Customer Complaints" suppliers (the corpus supplier table has no
  comment column).
- **Q20**: nested IN-subqueries — planned as a LEFT SEMI join chain, the
  shape Spark turns correlated EXISTS/IN into without materializing
  either subquery result.

Reference parity: the reference (main.py:150-163) expresses "rows present
in A but not matched in B" imperatively; Q16/Q20's anti/semi shapes are
the declarative equivalents at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.core import fixed_cents
from . import query

_REV_CENTS = "CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)"

#: Shared pseudo-partsupp CTE (DuckDB side).
_PARTSUPP_CTE = f"""
    partsupp AS (
        SELECT l_partkey AS ps_partkey,
               l_suppkey AS ps_suppkey,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ps_availqty,
               min({_REV_CENTS}) AS ps_supplycost_c
        FROM lineitem
        GROUP BY 1, 2
    )
"""


def _pseudo_partsupp(cat: Catalog) -> DataFrame:
    """Spark twin of the pseudo-partsupp CTE: one shuffle on the pair key."""
    rev_c = fixed_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        cat.lineitem.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
            F.col("l_quantity").cast("long").alias("qty"),
            rev_c.alias("rev_c"),
        )
        .groupBy("ps_partkey", "ps_suppkey")
        .agg(
            F.sum("qty").alias("ps_availqty"),
            F.min("rev_c").alias("ps_supplycost_c"),
        )
    )


# --- Q2: min-cost supplier per part in region (correlated MIN) --------------


@query(
    "q_tpch_q2",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    eligible AS (
        SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
               ps_supplycost_c
        FROM part
        JOIN partsupp ON p_partkey = ps_partkey
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE p_size < 10 AND p_type = 'ECONOMY' AND r_name = 'EUROPE'
    )
    SELECT p_partkey, p_name, s_name, n_name, s_acctbal,
           ps_supplycost_c / 100.0 AS supplycost
    FROM eligible e
    WHERE ps_supplycost_c = (
        SELECT min(ps_supplycost_c) FROM eligible e2
        WHERE e2.p_partkey = e.p_partkey
    )
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The correlated "cost = min cost for this part" subquery is a window
    # min over the eligible set — one pass; a naive self-join would plan
    # (and execute) the partsupp derivation twice. Dims broadcast; the
    # pair-keyed partsupp side shuffles once for its own groupBy and the
    # min-window rides that same partitioning by p_partkey after one
    # exchange of the *aggregated* (small) eligible set.
    cat = Catalog(spark, sf_dir)
    part = cat.part.filter(
        (F.col("p_size") < 10) & (F.col("p_type") == "ECONOMY")
    ).select("p_partkey", "p_name")
    region_nations = (
        cat.nation.join(
            F.broadcast(cat.region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    supp = cat.supplier.join(
        F.broadcast(region_nations),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    eligible = (
        _pseudo_partsupp(cat)
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        eligible.withColumn("min_c", F.min("ps_supplycost_c").over(w))
        .filter(F.col("ps_supplycost_c") == F.col("min_c"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            "s_acctbal",
            (F.col("ps_supplycost_c") / 100.0).alias("supplycost"),
        )
    )


# --- Q11: important supply value (global scalar threshold) ------------------


@query(
    "q_tpch_q11",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    byp AS (
        SELECT ps_partkey,
               CAST(sum(ps_supplycost_c * ps_availqty) AS BIGINT) AS value_c
        FROM partsupp
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_3', 'NATION_7')
        GROUP BY 1
    )
    SELECT ps_partkey, value_c / 100.0 AS value
    FROM byp
    WHERE value_c * 1000 > (SELECT CAST(sum(value_c) AS BIGINT) FROM byp)
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    # "Parts worth more than 0.1% of the tracked nations' total supply
    # value." The global total is a window-sum over the already-aggregated
    # per-part rows (|parts| rows, not |partsupp|) — lineitem is scanned
    # once; the threshold compare is integer-exact on both engines.
    cat = Catalog(spark, sf_dir)
    nat = cat.nation.filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    ).select("n_nationkey")
    supp = cat.supplier.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    byp = (
        _pseudo_partsupp(cat)
        .join(F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_supplycost_c") * F.col("ps_availqty")).alias("value_c")
        )
    )
    total = F.sum("value_c").over(Window.partitionBy())
    return (
        byp.withColumn("total_c", total)
        .filter(F.col("value_c") * 1000 > F.col("total_c"))
        .select("ps_partkey", (F.col("value_c") / 100.0).alias("value"))
    )


# --- Q16: supplier count by part attrs with NOT-IN exclusion ----------------


@query(
    "q_tpch_q16",
    oracle=f"""
    WITH {_PARTSUPP_CTE}
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT IN over a tiny exclusion set -> broadcast LEFT ANTI join (never
    # a filter against a collected list: the anti join stays a join at any
    # exclusion-set size). count(DISTINCT) shuffles once on the group keys
    # with Spark's two-phase distinct-aggregate expansion.
    cat = Catalog(spark, sf_dir)
    part = cat.part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_suppliers = cat.supplier.filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    ps = _pseudo_partsupp(cat).join(
        F.broadcast(bad_suppliers),
        F.col("ps_suppkey") == F.col("s_suppkey"),
        "left_anti",
    )
    return (
        ps.join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


# --- Q20: excess-stock suppliers (nested IN -> semi-join chain) -------------


@query(
    "q_tpch_q20",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    shipped AS (
        SELECT l_partkey, l_suppkey,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty96
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1, 2
    ),
    excess AS (
        SELECT ps_suppkey
        FROM partsupp
        JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        WHERE ps_partkey IN (
                  SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
              )
          AND ps_availqty * 10 > qty96 * 66
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_2', 'NATION_5', 'NATION_11')
      AND s_suppkey IN (SELECT ps_suppkey FROM excess)
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both IN-subqueries become LEFT SEMI joins: parts filter the
    # pair-keyed side via broadcast semi, the surviving supplier keys
    # semi-filter the supplier dim. Threshold adapted to the corpus'
    # 7-year span: availqty (all-time qty) > 6.6 x one year's shipments
    # flags above-average stock, compared in exact integers.
    cat = Catalog(spark, sf_dir)
    red_parts = cat.part.filter(F.col("p_name").like("red%")).select("p_partkey")
    shipped = (
        cat.lineitem.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty96"))
    )
    excess = (
        _pseudo_partsupp(cat)
        .join(
            F.broadcast(red_parts),
            F.col("ps_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") * 10 > F.col("qty96") * 66)
        .select("ps_suppkey")
    )
    nat = cat.nation.filter(
        F.col("n_name").isin("NATION_2", "NATION_5", "NATION_11")
    ).select("n_nationkey", "n_name")
    return (
        cat.supplier.join(
            F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            excess, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name", "n_name")
    )
