"""Core relational declared queries (SURVEY.md §2.2-2.7).

Projections / filters (P1-P4), joins (J1-J5), aggregations (A1-A6),
sorts/limits, set ops. All pure built-in DataFrame ops — each one's plan is
a single scan (+ shuffle where semantically required) with pushdown intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions import falsy_coalesce
from ..functions.core import fixed_cents
from ..operators.joins import broadcast_lookup, first_match_left_join
from . import query

# --- P1: projection + rename (reference main.py:115-132) -------------------


@query(
    "q_project_rename",
    oracle="""
    SELECT l_orderkey AS order_id, l_linenumber AS line_no,
           l_quantity AS qty, l_returnflag AS flag
    FROM lineitem
    """,
)
def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_quantity").alias("qty"),
        F.col("l_returnflag").alias("flag"),
    )


# --- P2: literal columns (reference main.py:118,121,124) --------------------


@query(
    "q_project_literals",
    oracle="""
    SELECT n_nationkey, n_name, 'CDC' AS location, 'en' AS language,
           '' AS description_de
    FROM nation
    """,
)
def q_project_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = Catalog(spark, sf_dir).nation
    return nation.select(
        "n_nationkey",
        "n_name",
        F.lit("CDC").alias("location"),
        F.lit("en").alias("language"),
        F.lit("").alias("description_de"),
    )


# --- P3: falsy-coalesce (reference `x or ""`, main.py:116) ------------------


@query(
    "q_coalesce_falsy",
    oracle="""
    SELECT o_orderkey AS order_id,
           CASE WHEN raw IS NULL OR raw = '' THEN 'N/A' ELSE raw END AS priority
    FROM (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN NULL
                    WHEN o_orderkey % 5 = 1 THEN ''
                    ELSE o_orderpriority END AS raw
        FROM orders
    )
    """,
)
def q_coalesce_falsy(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).orders
    raw = (
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None).cast("string"))
        .when(F.col("o_orderkey") % 5 == 1, F.lit(""))
        .otherwise(F.col("o_orderpriority"))
    )
    return orders.select(
        F.col("o_orderkey").alias("order_id"),
        falsy_coalesce(raw, "N/A").alias("priority"),
    )


# --- P4: filters ------------------------------------------------------------


@query(
    "q_filter_eq",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag
    FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )


@query(
    "q_filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_linestatus
    FROM lineitem
    WHERE ((l_quantity > 30 AND l_discount <= 0.05) OR NOT (l_linestatus = 'F'))
      AND l_returnflag IS DISTINCT FROM 'A'
    """,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    pred = (
        ((F.col("l_quantity") > 30) & (F.col("l_discount") <= 0.05))
        | (~(F.col("l_linestatus") == "F"))
    ) & (~F.col("l_returnflag").eqNullSafe("A"))
    return li.filter(pred).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_linestatus"
    )


# --- J1: broadcast lookup join (reference dict lookups, main.py:120,123) ----


@query(
    "q_join_broadcast_lookup",
    oracle="""
    SELECT n_nationkey, n_name, r_name AS region_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_join_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    joined = broadcast_lookup(
        cat.nation, cat.region, cat.nation.n_regionkey == cat.region.r_regionkey
    )
    return joined.select("n_nationkey", "n_name", F.col("r_name").alias("region_name"))


# --- J5: inner equi-join chain ---------------------------------------------


@query(
    "q_join_inner",
    oracle="""
    SELECT o_orderkey, c_custkey, c_name, n_name AS nation_name, o_totalprice
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "o_orderkey",
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation_name"),
            "o_totalprice",
        )
    )


# --- J4: semi-join (reference exists-branch, main.py:156-157) ---------------


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return cat.customer.join(
        cat.orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


# --- J3: anti-join (reference deletion pass, main.py:150-163) ---------------


@query(
    "q_join_anti",
    # "customers with no big final order" — non-empty on this corpus (a plain
    # customer-without-orders anti-join returns 0 rows, too weak a check).
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000
    )
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    big = cat.orders.filter(F.col("o_totalprice") > 150000)
    return cat.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


# --- J2: left join with first-match semantics (main.py:133-143) -------------


@query(
    "q_join_left_firstmatch",
    oracle="""
    WITH first_order AS (
        SELECT o_custkey, o_orderkey, o_orderdate
        FROM (
            SELECT o_custkey, o_orderkey, o_orderdate,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS rn
            FROM orders
        ) WHERE rn = 1
    )
    SELECT c.c_custkey, c.c_name, f.o_orderkey AS first_order_id,
           CASE WHEN f.o_custkey IS NULL THEN 'create' ELSE 'update' END AS op_flag
    FROM customer c LEFT JOIN first_order f ON c.c_custkey = f.o_custkey
    """,
)
def q_join_left_firstmatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    src = cat.customer.select(F.col("c_custkey").alias("o_custkey"), "c_name")
    tgt = cat.orders.select("o_custkey", "o_orderkey", "o_orderdate")
    joined = first_match_left_join(
        src, tgt, on=["o_custkey"], order_by=["o_orderdate", "o_orderkey"]
    )
    return joined.select(
        F.col("o_custkey").alias("c_custkey"),
        "c_name",
        F.col("o_orderkey").alias("first_order_id"),
        "op_flag",
    )


# --- A1: counts -------------------------------------------------------------


@query(
    "q_agg_count",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem
    """,
)
def q_agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


# --- A2: group-by aggregation (TPC-H Q1 shape) ------------------------------


@query(
    "q_agg_groupby",
    # Double sums are quantized to integer cents per row and summed exactly
    # (order-independent) — see functions.core.fixed_point for why round()
    # is banned in cross-engine-compared outputs.
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               / 100.0 AS sum_qty,
           CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               / 100.0 AS sum_price,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                         AS BIGINT)) AS BIGINT) / 100.0 AS sum_disc_price,
           CAST(sum(CAST(floor(l_discount * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
               / (count(*) * 1000000.0) AS avg_disc,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(fixed_cents(F.col("l_quantity"))) / F.lit(100.0)).alias("sum_qty"),
        (F.sum(fixed_cents(F.col("l_extendedprice"))) / F.lit(100.0)).alias("sum_price"),
        (
            F.sum(fixed_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            / F.lit(100.0)
        ).alias("sum_disc_price"),
        (
            F.sum(fixed_cents(F.col("l_discount"), 6))
            / (F.count(F.lit(1)) * F.lit(1000000.0))
        ).alias("avg_disc"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# --- A3: distinct -----------------------------------------------------------


@query(
    "q_agg_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.select("l_returnflag", "l_linestatus").distinct()


# --- A4: rollup / cube ------------------------------------------------------


@query(
    "q_agg_rollup",
    oracle="""
    SELECT r_name, n_name,
           CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               / 100.0 AS total_bal,
           count(*) AS n
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    joined = cat.customer.join(
        F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey"))
    return joined.rollup("r_name", "n_name").agg(
        (F.sum(fixed_cents(F.col("c_acctbal"))) / F.lit(100.0)).alias("total_bal"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               / 100.0 AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.cube("l_returnflag", "l_linestatus").agg(
        (F.sum(fixed_cents(F.col("l_quantity"))) / F.lit(100.0)).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# --- A5: approximate count-distinct (rows-only: HLL impls differ) -----------


@query("q_agg_approx_distinct", oracle=None)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rows-only BY DEFINITION (HLL internals differ across engines; the
    # exact twin A12 is fully oracled) — but the documented error bound
    # is asserted INLINE on every run, not just in a unit test: each
    # group's sketch estimate must sit within a 5-sigma envelope of the
    # exact distinct count at rsd=0.02 (HLL estimates are approximately
    # normal around the truth; 5 sigma = 10% here, astronomically
    # conservative for a correct sketch, instantly fatal for a broken
    # one). The check is one extra aggregate over the same scan and one
    # driver-bounded scalar.
    li = Catalog(spark, sf_dir).lineitem
    out = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.count(F.lit(1)).alias("n"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts")
    )
    bad = (
        out.join(exact, "l_returnflag")
        .filter(
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            > 5 * 0.02 * F.col("exact_parts")
        )
        .count()
    )
    assert bad == 0, f"{bad} group(s) outside the 5*rsd HLL envelope"
    return out


@query("q_agg_approx_percentile", oracle=None)
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # KLL/GK-style mergeable quantile sketch (percentile_approx): rank
    # error <= 1/accuracy, one pass, fixed memory per group — the shape
    # that replaces exact percentile's full sort at 100 TB. Rows-only:
    # sketch internals differ across engines — but the GK RANK contract
    # is asserted INLINE on every run, in its exact form: the returned
    # value v must have rank within eps*n of the target, i.e.
    # |{x < v}| <= (p+eps)*n and |{x <= v}| >= (p-eps)*n per group
    # (+/-1 row of boundary slack), with eps = 1/accuracy. One extra
    # broadcast join + aggregate over the same scan, one driver-bounded
    # scalar.
    li = Catalog(spark, sf_dir).lineitem
    out = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", F.lit(0.5), F.lit(10000)).alias("ap50"),
        F.percentile_approx("l_quantity", F.lit(0.95), F.lit(10000)).alias("ap95"),
    )
    eps = 1.0 / 10000

    def rank_ok(p: float, v: str):
        lt = F.sum((F.col("l_quantity") < F.col(v)).cast("long"))
        le = F.sum((F.col("l_quantity") <= F.col(v)).cast("long"))
        n = F.count(F.lit(1))
        return (lt <= (p + eps) * n + 1) & (le >= (p - eps) * n - 1)

    bad = (
        li.join(F.broadcast(out), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            (rank_ok(0.5, "ap50") & rank_ok(0.95, "ap95")).alias("ok")
        )
        .filter(~F.col("ok"))
        .count()
    )
    assert bad == 0, f"{bad} group(s) outside the 1/accuracy rank envelope"
    return out


# --- A6: conditional aggregation (reference tally pattern, main.py:242-247) -


@query(
    "q_agg_conditional",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_big,
           CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_final,
           count(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).orders
    return orders.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0))
        .cast("long")
        .alias("n_big"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_final"),
        F.count(F.lit(1)).alias("n"),
    )


# --- sorts / limits / top-k (SURVEY.md §2.6) --------------------------------


@query(
    "q_sort_multi_key",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM customer
    ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey ASC
    """,
)
def q_sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    return c.select("c_custkey", "c_mktsegment", "c_acctbal").orderBy(
        F.col("c_mktsegment").asc(), F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition top-k,
    # then a k-row merge on the driver — no global sort at any scale.
    orders = Catalog(spark, sf_dir).orders
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


# --- set operations (SURVEY.md §2.7) ----------------------------------------


@query(
    "q_set_union",
    oracle="""
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey")
    return a.union(b).distinct()


@query(
    "q_set_intersect",
    oracle="""
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    return a.intersect(b)


@query(
    "q_set_except",
    oracle="""
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT ALL
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    return a.exceptAll(b)


@query(
    "q_filter_null_safe",
    oracle="""
    SELECT doc_id,
           nullif(lang, 'en') AS lang_or_null,
           nullif(lang, 'en') IS NOT DISTINCT FROM NULL AS en_bucket,
           nullif(lang, 'en') IS NOT DISTINCT FROM 'de' AS de_bucket
    FROM documents
    WHERE nullif(lang, 'en') IS DISTINCT FROM 'fr'
    """,
)
def q_filter_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # null-safe equality (<=> / IS NOT DISTINCT FROM): NULL <=> NULL is
    # TRUE, never NULL — the semantics plain '=' can't express and the
    # reference's Python '==' has implicitly (None == None)
    d = Catalog(spark, sf_dir).documents
    lang_or_null = F.nullif(F.col("lang"), F.lit("en"))
    return d.select(
        "doc_id",
        lang_or_null.alias("lang_or_null"),
        lang_or_null.eqNullSafe(F.lit(None)).alias("en_bucket"),
        lang_or_null.eqNullSafe(F.lit("de")).alias("de_bucket"),
    ).filter(~lang_or_null.eqNullSafe(F.lit("fr")))
