"""Semantic deduplication (SemDeDup) — cluster-local embedding dedup.

The published recipe (Abbas et al., 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", arXiv:2303.09540):
cluster the embedding space, then search for near-duplicate pairs ONLY
within each cluster — semantic duplicates land in the same cluster, so
the quadratic pairwise work shrinks from n² to Σ_k n_k² ≈ n²/K, and K
grows with the corpus (FAISS-clustered shards at web scale). This is the
semantic sibling of the lexical near-dup family (MinHash/SimHash): it
catches paraphrases and re-renderings that share no shingles.

Engine mapping: the deterministic exact-integer k-means
(:mod:`.kmeans`) assigns clusters — replayable in SQL, so the WHOLE
pipeline (clustering included) value-hashes against an oracle, unlike
float-kmeans SemDeDup implementations. The within-cluster pair join is
an equi-join on the cluster id (never a global cross join); the verify
cosine is the fixed-point pinned-double form shared with the other
embedding witnesses.

Keep rule: a vector is dropped iff SOME lower-id vector in the same
cluster is ≥ threshold similar — deterministic, one pass, and the rule
the oracle replays. (Chains a~b~c with a≁c drop both b and c; use
``llm.dedup.duplicate_clusters`` on the emitted pairs when
connected-component grouping is wanted instead.)

Scale shape: k-means cost is corpus-linear (broadcast centroids);
pair generation is cluster-local; output is (corpus + dropped pairs)
sized. At 100 TB, n_centroids scales with the corpus to hold per-cluster
membership roughly constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.core import fixed_point
from ..operators.partitioning import fan_out
from .kmeans import _nearest, _quantize, _quantized, _train
from .similarity import _dot, _norm


def semantic_dedup(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cosine_threshold: float = 0.7,
    n_centroids: int = 8,
    iterations: int = 3,
) -> DataFrame:
    """``(vec_id, cluster, kept)`` — SemDeDup keep/drop per vector.

    ``kept = false`` iff a lower-id member of the same k-means cluster
    has fixed-point cosine ≥ ``cosine_threshold``.

    Execution shape (round-17): the trained centroids are K×dim
    literals, so membership is ONE scan-fused projection over the
    corpus — (id, vector, norm, cluster) with no assignment join.  The
    cluster-local pair join is salted when K < cluster cores: the
    id_b side buckets by ``pmod(xxhash64(id_b), S)`` and the id_a side
    replicates S ways, so the quadratic verify work spreads over K·S ≈
    cores tasks instead of K (each (a, b) pair still meets exactly
    once, at b's salt).  S = ceil(cores / K) degrades to 1 — byte-
    identical to the unsalted join — as K grows with the corpus (the
    documented K∝n contract), so at scale the salt is a no-op and the
    replication factor is bounded by cores/K.  Norms are computed once
    per member, not once per pair (bit-identical float result).
    """
    wide = fan_out(corpus)  # 1-split scans must widen BEFORE the
    # scan-fused argmin/explode passes (no exchange creates width now)
    q = _quantized(wide, vec_col, id_col).persist()
    cents = _train(q, n_centroids, iterations)
    q.unpersist()
    # persisted: consumed THREE times (assign + both pair-join sides),
    # and each consumer would otherwise re-run the K-literal argmin +
    # norm over the whole corpus (r17 ADVICE). Same intra-query reuse
    # convention as the LSH postings cache; the bench's clearCache()
    # drops it between runs so every timed run recomputes.
    members = wide.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("n"),
        _nearest(_quantize(F.col(vec_col)), cents)
        .getField("cid")
        .alias("cluster"),
    ).persist()
    assign = members.select(F.col("id").alias(id_col), "cluster")
    par = corpus.sparkSession.sparkContext.defaultParallelism
    n_salts = max(1, -(-par // max(1, n_centroids)))
    a = members.select(
        "cluster",
        F.col("id").alias("id_a"),
        F.col("v").alias("__va"),
        F.col("n").alias("__na"),
        F.explode(
            F.array(*[F.lit(s) for s in range(n_salts)])
        ).alias("__salt"),
    )
    b = members.select(
        "cluster",
        F.col("id").alias("id_b"),
        F.col("v").alias("__vb"),
        F.col("n").alias("__nb"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(n_salts)).alias("__salt"),
    )
    dropped = (
        a.join(b, ["cluster", "__salt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            fixed_point(
                _dot(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb")),
                6,
            )
            >= F.lit(cosine_threshold)
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return (
        assign.join(
            dropped.withColumn("__drop", F.lit(True)), id_col, "left"
        )
        .select(
            id_col,
            "cluster",
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("kept"),
        )
    )
