"""SQL-surface queries: the engine reached through ``spark.sql`` over
``Catalog.register_views()`` (round-6 review Next #8).

Everything else in the registry drives the DataFrame API; these rows
gate the OTHER half of the public surface — a user who writes SQL
against the registered catalog views. The flagship rows use ONE shared
ANSI SQL text as both the Spark body and the DuckDB oracle: the
strongest portability statement the gate can make (if the dialects
drift, the row fails — no translation layer to hide behind).

Dialect-shared SQL rules (the intersection that hashes identically):
- exact integer cents via ``CAST(floor(x * 100.0 + 0.5) AS BIGINT)``
  (never ``round()`` — HALF_UP vs HALF_EVEN);
- every aggregate wrapped in ``CAST(... AS BIGINT)`` (DuckDB's
  ``sum(BIGINT)`` is HUGEINT, Spark's is LONG — pin both);
- no engine-specific functions (no ``list_*``/``array_*``, no ``//``);
- joins/filters/group-by/having/case/subqueries are fully shared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import Catalog
from . import query

#: One SQL text, two engines: revenue by nation over the 4-way join,
#: finished orders only. Runs verbatim under Spark ANSI mode and DuckDB.
_SQL_REVENUE_BY_NATION = """
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0
                           + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
GROUP BY n_name
"""

#: Correlated scalar subquery + HAVING — the SQL shapes a DataFrame-only
#: surface makes awkward, exercised through the same shared-text gate.
_SQL_ABOVE_SEGMENT_AVG = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_above
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
                   WHERE c2.c_mktsegment = c.c_mktsegment)
GROUP BY c_mktsegment
HAVING count(*) > 0
"""


@query("q_sql_entry", oracle=_SQL_REVENUE_BY_NATION)
def q_sql_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The catalog/SQL entry point: register_views() publishes every
    # fixture table as a temp view, then the query is pure spark.sql —
    # same text the oracle runs. Catalyst treats the parsed SQL exactly
    # like the DataFrame plans (same pushdown/broadcast/AQE path), so
    # scale behavior is identical to q_join_inner-family rows; what this
    # gates is the VIEW REGISTRATION + parser surface.
    Catalog(spark, sf_dir).register_views()
    return spark.sql(_SQL_REVENUE_BY_NATION)


@query("q_sql_subquery", oracle=_SQL_ABOVE_SEGMENT_AVG)
def q_sql_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Correlated scalar subquery through the SQL surface. Catalyst
    # decorrelates this into an aggregate + join (no per-row re-scan);
    # the float avg() is comparison-only (a filter, not an output), so
    # cross-engine float summation order cannot flip the hash unless a
    # value sits within one ulp of its segment mean — the fixture's
    # acctbal spread makes that impossible.
    Catalog(spark, sf_dir).register_views()
    return spark.sql(_SQL_ABOVE_SEGMENT_AVG)


#: Recursive CTE (Spark 4 WITH RECURSIVE == DuckDB's): walk the implicit
#: decimal-tree hierarchy parent(c) = floor(c / 10) from every customer
#: to the root and aggregate the path — a transitive-closure shape no
#: single join chain of fixed length can express. Division is spelled
#: CAST(floor(x / 10) AS BIGINT): exact for these magnitudes and safe on
#: both engines (a bare double CAST would round in DuckDB and truncate
#: in Spark — floor first makes them agree).
_SQL_RECURSIVE_HIERARCHY = """
WITH RECURSIVE chain(start_key, cur, depth) AS (
    SELECT c_custkey, c_custkey, CAST(0 AS BIGINT)
    FROM customer
    UNION ALL
    SELECT start_key, CAST(floor(cur / 10) AS BIGINT), depth + 1
    FROM chain WHERE cur > 0
)
SELECT start_key AS c_custkey,
       CAST(max(depth) AS BIGINT) AS depth_to_root,
       CAST(sum(cur) AS BIGINT) AS path_key_sum
FROM chain
GROUP BY start_key
"""


@query("q_sql_recursive", oracle=_SQL_RECURSIVE_HIERARCHY)
def q_sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL2: WITH RECURSIVE through the SQL surface — Spark 4's recursive
    # CTE executes as an iterative union-all loop (each step one join/
    # projection over the frontier, AQE-planned), the same shape the
    # engine's hand-rolled iterations (PageRank, label propagation) use;
    # DuckDB runs the identical text. Frontier shrinks as keys hit 0, so
    # work is O(rows x depth), depth = O(log10(maxkey)).
    Catalog(spark, sf_dir).register_views()
    return spark.sql(_SQL_RECURSIVE_HIERARCHY)


@query(
    "q_sql_registered_udf",
    oracle="""
    SELECT o_orderkey,
           concat(lower(regexp_replace(o_orderpriority, '[^a-zA-Z0-9]+',
                                       '-', 'g')),
                  '-', CAST(o_orderkey % 97 AS VARCHAR)) AS slug
    FROM orders
    """,
)
def q_sql_registered_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL3: a Python scalar UDF registered into the SQL catalog
    # (spark.udf.register) and invoked from a plain spark.sql text —
    # the surface a SQL-first consumer extends the engine through. The
    # UDF body is pure string/int ops with one deterministic SQL twin
    # in the oracle, so the escape hatch itself is value-hash-gated.
    # Cost note unchanged from UD1: registered Python UDFs run
    # row-at-a-time outside codegen — register pandas_udfs for hot
    # paths; this row gates the REGISTRATION surface, not a perf claim.
    import re as _re

    def slugify(s: str, k: int) -> str:
        return _re.sub(r"[^a-zA-Z0-9]+", "-", s).lower() + "-" + str(k % 97)

    spark.udf.register("phe_slugify", slugify, "string")
    Catalog(spark, sf_dir).register_views()
    return spark.sql(
        "SELECT o_orderkey, phe_slugify(o_orderpriority, o_orderkey) AS slug"
        " FROM orders"
    )


@query(
    "q_sql_pipe",
    oracle="""
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_custs,
           CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS bal_cents
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > 0
    GROUP BY n_name
    HAVING count(*) > 5
    """,
)
def q_sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL4: Spark 4's SQL pipe syntax (|>) — the linear FROM-first form
    # (GoogleSQL pipes / PRQL lineage) that reads like the DataFrame
    # chain it compiles to; same Catalyst plan as the classic text the
    # oracle runs. Gates that the parser surface accepts the pipe
    # dialect end-to-end over registered views.
    Catalog(spark, sf_dir).register_views()
    return spark.sql("""
        FROM customer
        |> WHERE c_acctbal > 0
        |> JOIN nation ON c_nationkey = n_nationkey
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n_custs,
                     CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))
                          AS BIGINT) AS bal_cents
           GROUP BY n_name
        |> WHERE n_custs > 5
        |> SELECT n_name, n_custs, bal_cents
    """)


#: The body both engines run; Spark receives it with :min_bal /
#: :segments bound server-side, the oracle with literals inlined.
_SQL_PARAM_BODY = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))
            AS BIGINT) AS balance_cents
FROM customer
WHERE c_acctbal >= {min_bal} AND c_mktsegment IN {segments}
GROUP BY c_mktsegment
"""


@query(
    "q_sql_parameterized",
    oracle=_SQL_PARAM_BODY.format(
        min_bal="1000.0", segments="('BUILDING', 'MACHINERY')"
    ),
)
def q_sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL5: parameterized SQL (Spark 4 named-parameter binding) — the
    # injection-safe surface a SQL-first user templates queries with:
    # values bind as literals AT ANALYSIS time (:min_bal folds into the
    # parquet pushdown exactly like an inline literal — parameterization
    # costs nothing at the scan), and the array parameter expands
    # through array_contains for the IN-list. The oracle is the same
    # body with the parameters inlined, so binding ≡ inlining is the
    # property under test.
    Catalog(spark, sf_dir).register_views()
    return spark.sql(
        """
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS balance_cents
        FROM customer
        WHERE c_acctbal >= :min_bal
          AND array_contains(:segments, c_mktsegment)
        GROUP BY c_mktsegment
        """,
        args={"min_bal": 1000.0, "segments": ["BUILDING", "MACHINERY"]},
    )


#: Shared text (Spark 4 and DuckDB both parse JOIN LATERAL ... ON TRUE):
#: top-2 orders per customer via a correlated lateral subquery.
_SQL_LATERAL = """
SELECT c.c_custkey, t.o_orderkey, t.price_cents
FROM customer c
JOIN LATERAL (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t ON TRUE
"""


@query("q_sql_lateral", oracle=_SQL_LATERAL)
def q_sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL6: correlated LATERAL join — the top-k-per-group shape
    # expressed the way a SQL-first user writes it. ONE shared ANSI
    # text runs verbatim on both engines (the q_sql_entry portability
    # gate). Catalyst decorrelates the lateral subquery into a
    # customer-keyed join + per-key ordering rather than re-running the
    # inner query per outer row, so the plan scales like the DataFrame
    # twin q_window_topk_per_group (one key-partitioned shuffle) — a
    # per-row re-scan would be the nested-loop the plan sweep forbids.
    Catalog(spark, sf_dir).register_views()
    return spark.sql(_SQL_LATERAL)
