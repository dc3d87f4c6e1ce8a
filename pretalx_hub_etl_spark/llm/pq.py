"""Product-quantization ANN (the fourth ANN path, after brute-force,
LSH, and IVF in ``llm/similarity.py``).

PQ (Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — the FAISS ``PQx`` index) compresses each vector
into ``m`` one-byte codes: split the dimension into ``m`` subspaces,
k-means each subspace independently, and store each subvector as the id
of its nearest sub-centroid. A 64-dim float32 vector becomes 8 bytes —
32× less memory traffic — and approximate distances are computed from
the codes alone via ADC (asymmetric distance computation): per query,
precompute the ``m × k`` table of squared distances from the query's
subvectors to every sub-centroid, then a candidate's distance is just
``m`` table lookups summed.

Scale shape, stage by stage:

- **train** — driver-side Lloyd iterations on a bounded deterministic
  sample (hash-ordered top-``sample_size``). Codebook fitting is always
  sample-sized, never corpus-sized (FAISS trains on ~100k vectors for
  billion-vector indexes); the driver holds ``m·k·(dim/m)`` floats.
- **encode** — one Arrow-batched numpy pass over the corpus
  (``pandas_udf``: one ``(batch, m, 1, dsub) - (m, k, dsub)`` distance
  broadcast + argmin per batch), the same vectorized-over-interpreted
  choice as the LSH bucketizer (measured ~10× there). One scan, no
  shuffle; the codes table is what gets stored and scanned thereafter.
- **search** — broadcast the (query-count-sized) distance tables,
  ADC-score the codes table with a JVM-side ``m``-lookup fold, take
  ``refine·k`` candidates per query, then join ONLY those ids back to
  the full vectors for an exact cosine rerank. The full-vector table is
  touched id-wise for ~``refine·k`` rows per query — the memory-traffic
  win PQ exists for.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.partitioning import fan_out
from .similarity import _rerank_topk, cosine


def pq_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    seed: int = 42,
    sample_size: int = 10_000,
    iterations: int = 20,
) -> np.ndarray:
    """Fit the ``(m, k, dim/m)`` PQ codebooks on a deterministic sample.

    The sample is the ``sample_size`` lowest xxhash64(id, seed) rows —
    uniform under hash mixing, reproducible, and bounded regardless of
    corpus size. Lloyd runs a fixed ``iterations`` count with
    first-k-points init per subspace (deterministic; empty clusters keep
    their previous centroid), so the same (corpus, seed) always yields
    the same codebooks.
    """
    sample = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))
        .limit(sample_size)
        .collect()
    )
    X = np.array([row[1] for row in sample], dtype=np.float64)
    n, dim = X.shape
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if n < k:
        raise ValueError(f"sample ({n}) smaller than k={k}")
    dsub = dim // m
    books = np.zeros((m, k, dsub))
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[:k].copy()
        for _ in range(iterations):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    C[c] = S[mask].mean(axis=0)
        books[j] = C
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``(id, codes array<int>)``: each vector's nearest sub-centroid id
    per subspace. Ties resolve to the lowest centroid id (numpy argmin),
    deterministically."""
    from pyspark.sql.functions import pandas_udf

    m, k, dsub = codebooks.shape
    books = codebooks.copy()

    @pandas_udf("array<int>")
    def encode(col: pd.Series) -> pd.Series:
        X = np.array(col.tolist(), dtype=np.float64)  # (n, m*dsub)
        S = X.reshape(len(X), m, 1, dsub)
        d2 = ((S - books[None, :, :, :]) ** 2).sum(axis=3)  # (n, m, k)
        codes = d2.argmin(axis=2).astype(np.int32)
        return pd.Series(list(codes))

    return fan_out(corpus).select(
        F.col(id_col), encode(F.col(vec_col)).alias("codes")
    )


def pq_topk(
    codes: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    refine: int = 4,
) -> DataFrame:
    """Approximate top-k cosine neighbors from PQ codes + exact rerank.

    ADC tables are computed driver-side — they are query-count-sized
    (``n_queries × m × k`` doubles), never data-sized — and broadcast
    with the query set. The ADC fold itself is a JVM-side ``m``-element
    lookup sum over the codes array (no Python in the corpus-sized
    path); ``refine·k`` candidates per query then rerank by exact
    cosine against the full vectors, fetched by id.
    """
    m, kk, dsub = codebooks.shape
    qrows = queries.select(query_id_col, vec_col).collect()
    spark = queries.sparkSession
    table_rows = []
    for row in qrows:
        q = np.asarray(row[1], dtype=np.float64).reshape(m, 1, dsub)
        dt = ((q - codebooks) ** 2).sum(axis=2)  # (m, k)
        table_rows.append((row[0], [list(map(float, r)) for r in dt]))
    from ..operators.partitioning import local_rows

    tables = local_rows(
        spark, table_rows, f"{query_id_col} long, dt array<array<double>>"
    )
    # ADC: zip each code with its subspace index, look both up in the
    # broadcast table, sum — m interpreted lookups per (row, query),
    # cheap because m is small and fixed
    adist = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, j: F.element_at(F.element_at("dt", j + 1), c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("adist").asc(), F.col(id_col).asc()
    )
    cands = (
        codes.crossJoin(F.broadcast(tables))
        .select(query_id_col, id_col, adist.alias("adist"))
        .withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= refine * k)
        .select(query_id_col, id_col)
    )
    qvecs = queries.select(
        query_id_col, F.col(vec_col).alias("__qvec")
    )
    scored = (
        cands.join(corpus.select(id_col, vec_col), id_col)
        .join(F.broadcast(qvecs), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col("__qvec"), F.col(vec_col)), 6).alias(
                "cos_sim"
            ),
        )
    )
    return _rerank_topk(scored, query_id_col, id_col, k)
