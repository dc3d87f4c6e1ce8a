"""Product-quantization unit tests (llm/pq.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pretalx_hub_etl_spark.llm.pq import pq_encode, pq_topk, pq_train


def _toy(spark, n=64, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, dim))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    rows = [(i, [float(v) for v in X[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        X,
    )


def test_train_is_deterministic_and_shaped(spark):
    df, _ = _toy(spark)
    a = pq_train(df, m=4, k=8, seed=1)
    b = pq_train(df, m=4, k=8, seed=1)
    assert a.shape == (4, 8, 2)
    assert np.array_equal(a, b)


def test_train_rejects_bad_m(spark):
    df, _ = _toy(spark, dim=8)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, m=3, k=4)


def test_encode_matches_numpy_argmin(spark):
    df, X = _toy(spark)
    books = pq_train(df, m=4, k=8)
    got = {
        r.vec_id: list(r.codes) for r in pq_encode(df, books).collect()
    }
    m, k, dsub = books.shape
    for i, x in enumerate(X):
        S = np.asarray(x, dtype=np.float64).reshape(m, 1, dsub)
        want = ((S - books) ** 2).sum(axis=2).argmin(axis=1)
        assert got[i] == list(want)


def test_pq_topk_exact_when_codebook_is_lossless(spark):
    # with k >= n every subvector can be its own centroid after Lloyd
    # converges on this tiny set, so ADC distances are near-exact and
    # the top-k equals brute force
    from pretalx_hub_etl_spark.llm.similarity import (
        brute_force_cosine_topk,
    )

    df, _ = _toy(spark, n=12, dim=8)
    queries = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    books = pq_train(df, m=4, k=12, sample_size=12, iterations=30)
    codes = pq_encode(df, books)
    got = {
        (r.query_id, r.vec_id)
        for r in pq_topk(
            codes, df, queries, books, k=5, refine=2
        ).collect()
    }
    want = {
        (r.query_id, r.vec_id)
        for r in brute_force_cosine_topk(df, queries, k=5).collect()
    }
    assert len(got & want) / len(want) >= 0.9
