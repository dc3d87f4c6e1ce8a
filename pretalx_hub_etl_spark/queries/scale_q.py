"""Scale-technique batch (round-8): explicit Bloom runtime-filter join
(J10), bounded Bellman-Ford shortest paths (GR5), sorted-neighborhood
dedup blocking (L43), and the Arrow-optimized scalar Python UDF (UD5).

Reference tie-in: none directly (the reference joins and dedups Python
dict lists row-at-a-time, `main.py:136-157`); these are the techniques
those loops turn into at corpus scale — prefilter the fact stream
before it shuffles, block candidate pairs by sort order instead of
enumerating them, and batch any unavoidable Python through Arrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from . import query

# --- J10: Bloom runtime-filter join -----------------------------------------

_BLOOM_JOIN_ORACLE = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderpriority
"""


@query("q_join_bloom_prefilter", oracle=_BLOOM_JOIN_ORACLE)
def q_join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J10: the explicit runtime-filter join — before shuffling the fact
    # table (orders) into the join, drop rows whose key cannot be in
    # the selective dim side (BUILDING-segment customers) using a
    # Bloom filter BUILT AS A DATAFRAME AGGREGATION (operators/
    # bloom.py): keys explode into k=3 xxhash64 bit positions, per-word
    # masks bit_or-combine map-side (shuffle cardinality = m/64 words,
    # not keys), and the 2048-word map broadcasts as one row. The probe
    # is a scan-fused JVM expression, so at 100 TB the exchange moves
    # only ~segment-fraction of the fact table (plus Bloom false
    # positives). FPs are part of the contract: the exact join after
    # the prefilter removes them, which is why the oracle is the plain
    # join — the Bloom stage must be invisible in the answer. Spark's
    # own injected bloom runtime filter fires only on its internal
    # heuristics; this is the always-available explicit form.
    from ..functions.core import fixed_cents
    from ..operators.bloom import bloom_prefilter

    cat = Catalog(spark, sf_dir)
    dim = cat.customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    fact = cat.orders.select(
        "o_custkey", "o_orderpriority",
        fixed_cents(F.col("o_totalprice")).alias("cents"),
    )
    pre = bloom_prefilter(fact, "o_custkey", dim, "c_custkey")
    return (
        pre.join(dim, pre["o_custkey"] == dim["c_custkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
    )


# --- GR5: bounded Bellman-Ford shortest paths -------------------------------

_SSSP_ROUNDS = 3


def _sssp_oracle(rounds: int) -> str:
    # relaxation rounds unrolled into CTEs (the pagerank/BFS oracle
    # policy — DuckDB has no mutable state, each round is one join +
    # union + min-groupBy CTE); the banded edge fixture is symmetric
    # by explicit union, weight = key distance.
    ctes = [
        """e0 AS (
        SELECT a.c_custkey AS u, b.c_custkey AS v,
               b.c_custkey - a.c_custkey AS w
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey
         AND a.c_custkey < b.c_custkey
         AND b.c_custkey - a.c_custkey <= 100
    )""",
        "e AS (SELECT u, v, w FROM e0 UNION ALL SELECT v, u, w FROM e0)",
        """d0 AS (
        SELECT CAST(min(c_custkey) AS BIGINT) AS x,
               CAST(0 AS BIGINT) AS dist
        FROM customer GROUP BY c_nationkey
    )""",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""d{r} AS (
        SELECT x, min(dist) AS dist FROM (
            SELECT x, dist FROM d{r - 1}
            UNION ALL
            SELECT e.v AS x, d.dist + e.w AS dist
            FROM e JOIN d{r - 1} d ON e.u = d.x
        ) GROUP BY x
    )"""
        )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT x AS vertex, CAST(dist AS BIGINT) AS dist"
        f" FROM d{rounds}"
    )


@query("q_graph_sssp", oracle=_sssp_oracle(_SSSP_ROUNDS))
def q_graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GR5: multi-source weighted shortest paths over the banded
    # same-nation customer graph (the BFS/pagerank fixture) with
    # weight = key distance, 3 Bellman-Ford relaxation rounds —
    # exact min cost over paths of <= 3 edges from each nation's
    # minimum-key source. Unlike hop-BFS (GR3), first-discovery is NOT
    # minimal under weights, so each round re-mins the whole tentative
    # table instead of anti-joining a visited set (operators/graph.py
    # sssp_rounds): per round one edge⋈tentative equi-join + one
    # map-side-combined min-groupBy, all vertex-keyed — the integer
    # weights keep every min exact cross-engine.
    from ..operators.graph import banded_key_edges, sssp_rounds

    c = Catalog(spark, sf_dir).customer.select("c_custkey", "c_nationkey")
    edges = banded_key_edges(c, "c_custkey", "c_nationkey", band=100).select(
        "u", "v", (F.col("v") - F.col("u")).alias("w")
    )
    sources = c.groupBy("c_nationkey").agg(
        F.min("c_custkey").cast("long").alias("x")
    ).select("x")
    return sssp_rounds(edges, sources, rounds=_SSSP_ROUNDS)


# --- L43: sorted-neighborhood dedup blocking --------------------------------

_SNM_WINDOW = 8
_SNM_MAXDIST = 8

_SNM_ORACLE = f"""
WITH norm AS (
    SELECT doc_id, lang,
           substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
                  1, 24) AS bk,
           substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
                  1, 40) AS pf
    FROM documents
), r AS (
    SELECT doc_id, lang, pf,
           row_number() OVER (PARTITION BY lang ORDER BY bk, doc_id)
               AS rn
    FROM norm
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.pf, b.pf) AS BIGINT) AS prefix_dist
FROM r a JOIN r b
  ON a.lang = b.lang AND b.rn > a.rn AND b.rn - a.rn < {_SNM_WINDOW}
WHERE levenshtein(a.pf, b.pf) <= {_SNM_MAXDIST}
"""


@query("q_dedup_snm", oracle=_SNM_ORACLE)
def q_dedup_snm(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L43: sorted-neighborhood-method blocking (Hernandez & Stolfo) —
    # the third classic dedup candidate generator next to hash-band
    # LSH (L2) and inverted-index postings (L3): sort the corpus by a
    # normalized blocking key, slide a fixed window of w=8 ranks, and
    # compare only neighbors — candidates are LINEAR in corpus size
    # (≤ w−1 per row) regardless of how values cluster, the property
    # band-hash blocking loses when a band gets hot. Spark shape: the
    # rank is a per-lang window (partitioned — no global single-reducer
    # sort), and the neighbor pairing is the bucketized band join
    # (banded_key_edges policy): bucket rank DIV w, explode the right
    # side into {bucket, bucket−1}, equi-join on (lang, bucket), then
    # the exact 0 < Δrank < w residual — never a rank-range theta-join.
    # The survivor check is the built-in JVM levenshtein on 40-char
    # normalized prefixes (both engines implement unit-cost
    # Wagner-Fischer, so distances hash exactly; Spark's
    # regexp_replace is global by default = DuckDB's 'g' flag).
    docs = Catalog(spark, sf_dir).documents
    norm = F.substring(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", ""), 1, 40
    )
    base = docs.select(
        "doc_id",
        "lang",
        F.substring(norm, 1, 24).alias("bk"),
        norm.alias("pf"),
    )
    w = Window.partitionBy("lang").orderBy("bk", "doc_id")
    ranked = base.select(
        "doc_id", "lang", "pf", F.row_number().over(w).alias("rn")
    )
    bucket = F.floor((F.col("rn") - 1) / _SNM_WINDOW).cast("long")
    a = ranked.select(
        F.col("lang").alias("__g"),
        F.col("doc_id").alias("doc_a"),
        F.col("pf").alias("pf_a"),
        F.col("rn").alias("ra"),
        bucket.alias("__b"),
    )
    b = ranked.select(
        F.col("lang").alias("__g"),
        F.col("doc_id").alias("doc_b"),
        F.col("pf").alias("pf_b"),
        F.col("rn").alias("rb"),
        F.explode(F.array(bucket, bucket - 1)).alias("__b"),
    )
    pairs = a.join(b, ["__g", "__b"]).filter(
        (F.col("rb") > F.col("ra"))
        & (F.col("rb") - F.col("ra") < _SNM_WINDOW)
    )
    dist = F.levenshtein(F.col("pf_a"), F.col("pf_b"))
    return pairs.filter(dist <= _SNM_MAXDIST).select(
        "doc_a", "doc_b", dist.cast("long").alias("prefix_dist")
    )


# --- UD5: Arrow-optimized scalar Python UDF ---------------------------------

_ARROW_UDF_ORACLE = """
SELECT doc_id,
       CAST(length(text) - length(replace(text, 'e', '')) AS BIGINT)
           AS n_e,
       CAST(length(text) AS BIGINT) AS n_chars_txt
FROM documents
"""


@query("q_udf_arrow_scalar", oracle=_ARROW_UDF_ORACLE)
def q_udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UD5: the Spark-4 Arrow-optimized scalar Python UDF
    # (``F.udf(..., useArrow=True)``) — completes the declared UDF
    # matrix: row-pickled scalar (SQL3, cost-annotated), pandas scalar
    # (UD1), pandas UDAF (UD3), mapInPandas/applyInPandas (L-family),
    # mapInArrow (UD4), arrow-scalar (this). Same per-row Python-call
    # semantics as a classic UDF but the transport is Arrow record
    # batches instead of pickled rows — measurably cheaper
    # serialization while keeping plain-Python (non-vectorized)
    # author ergonomics. The function body is trivially re-expressible
    # in SQL (count of 'e' + length) — deliberately, so the oracle
    # pins the execution path rather than the math.
    @F.udf("long", useArrow=True)
    def count_e(s: str) -> int:
        return s.count("e") if s is not None else 0

    docs = Catalog(spark, sf_dir).documents
    return docs.select(
        "doc_id",
        count_e(F.col("text")).alias("n_e"),
        F.length("text").cast("long").alias("n_chars_txt"),
    )
