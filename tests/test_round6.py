"""Round-6 operators: substring-level dedup spans, portable MinHash,
mixture interleave. Each test drives the SHIPPED operator body (the
helpers the @query wrappers call), per the one-implementation rule."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pretalx_hub_etl_spark.llm.spans import duplicate_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_spans_planted_cross_doc(spark):
    # docs 1 and 2 share an 8-token run; doc 3 is unrelated.
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    d = _docs(
        spark,
        [
            (1, f"one two {shared} tail1 tail2"),
            (2, f"{shared} other words here now"),
            (3, "completely different text with no repeats at all ok"),
        ],
    )
    out = {
        r.doc_id: (r.span_start, r.span_end, r.span_tokens, r.n_windows)
        for r in duplicate_spans(d, k=8).collect()
    }
    # doc 1: tokens 3..10 hold the shared run (1-based); doc 2: 1..8
    assert out == {1: (3, 10, 8, 1), 2: (1, 8, 8, 1)}


def test_duplicate_spans_merges_overlapping_windows(spark):
    # a 10-token shared run with k=8 yields 3 overlapping windows that
    # must merge into ONE maximal span
    run = "a b c d e f g h i j"
    d = _docs(spark, [(1, f"x {run} y"), (2, f"{run} z w")])
    out = {
        r.doc_id: (r.span_start, r.span_end, r.span_tokens, r.n_windows)
        for r in duplicate_spans(d, k=8).collect()
    }
    assert out == {1: (2, 11, 10, 3), 2: (1, 10, 10, 3)}


def test_duplicate_spans_ignores_within_doc_repeats(spark):
    # the same 8-gram twice in ONE doc is not a cross-doc duplicate
    run = "p q r s t u v w"
    d = _docs(
        spark,
        [
            (1, f"{run} mid1 mid2 mid3 {run}"),
            (2, "nothing shared with the first document here at all"),
        ],
    )
    assert duplicate_spans(d, k=8, min_doc_freq=2).count() == 0


def test_duplicate_spans_short_docs_are_safe(spark):
    # sub-k docs yield no windows (and must not trip Spark's descending
    # sequence() when n < k)
    d = _docs(spark, [(1, "too short"), (2, "too short")])
    assert duplicate_spans(d, k=8).count() == 0


def test_portable_minhash_finds_planted_near_dup(spark):
    from pretalx_hub_etl_spark.llm.dedup import minhash_near_duplicates

    base = (
        "the quick brown fox jumps over the lazy dog and runs far "
        "away into the deep green forest tonight without a sound"
    )
    near = base.replace("green", "dark")
    d = _docs(
        spark,
        [
            (1, base),
            (2, near),
            (3, "entirely unrelated content about spark physical plans "
                "and shuffle partitions in a distributed engine runtime"),
        ],
    )
    pairs = minhash_near_duplicates(
        d, "text", "doc_id", jaccard_threshold=0.5, portable=True
    ).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]
    assert 0.5 <= pairs[0].jaccard < 1.0


def test_portable_minhash_identical_docs_jaccard_one(spark):
    from pretalx_hub_etl_spark.llm.dedup import minhash_near_duplicates

    t = "same text in both documents word for word exactly here"
    d = _docs(spark, [(1, t), (2, t)])
    pairs = minhash_near_duplicates(
        d, "text", "doc_id", portable=True
    ).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in pairs] == [(1, 2, 1.0)]


def test_mixture_interleave_keep_and_rank_replay(spark):
    # the keep decision and the interleave rank must be pure functions of
    # the row (md5), replayable outside Spark — recompute both in Python
    from pretalx_hub_etl_spark.queries import load_all

    out = (
        load_all()["q_mixture_interleave"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )

    def u32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    # 1) every kept row satisfies the integer keep inequality
    for r in out:
        w = 1 + u32(r.source) % 8
        assert r.weight_tenths == w
        assert u32(f"mix:{r.doc_id}") * 10 < w * (1 << 32)
    # 2) ranks are a dense permutation 1..n
    ranks = sorted(r.interleave_rank for r in out)
    assert ranks == list(range(1, len(out) + 1))
    # 3) rank order == (md5 order key, doc_id) order
    by_rank = [
        r.doc_id for r in sorted(out, key=lambda r: r.interleave_rank)
    ]
    by_key = [
        r.doc_id
        for r in sorted(
            out,
            key=lambda r: (
                hashlib.md5(f"ord:{r.doc_id}".encode()).hexdigest(),
                r.doc_id,
            ),
        )
    ]
    assert by_rank == by_key


def test_remove_duplicate_spans_keep_first_owner(spark):
    from pretalx_hub_etl_spark.llm.spans import remove_duplicate_spans

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    d = _docs(
        spark,
        [
            (1, f"one two {shared}"),
            (2, f"{shared} other words"),
            (3, "an unrelated document with entirely different token text"),
        ],
    )
    out = {r.doc_id: r for r in remove_duplicate_spans(d, k=8).collect()}
    # doc 1 is the lowest-id owner: keeps everything
    assert out[1].clean_text == f"one two {shared}"
    assert (out[1].n_tokens, out[1].n_removed) == (10, 0)
    # doc 2 loses the shared 8-token run, keeps its tail
    assert out[2].clean_text == "other words"
    assert (out[2].n_tokens, out[2].n_removed) == (10, 8)
    # doc 3 untouched
    assert out[3].n_removed == 0


def test_remove_duplicate_spans_fully_duplicated_doc(spark):
    from pretalx_hub_etl_spark.llm.spans import remove_duplicate_spans

    t = "a b c d e f g h"  # exactly one 8-gram
    d = _docs(spark, [(1, t), (2, t)])
    out = {r.doc_id: r for r in remove_duplicate_spans(d, k=8).collect()}
    assert out[1].clean_text == t and out[1].n_removed == 0
    assert out[2].clean_text == "" and out[2].n_removed == 8


def test_kmeans_exact_separates_planted_clusters(spark):
    from pretalx_hub_etl_spark.llm.kmeans import kmeans_exact

    rows = []
    for i in range(10):           # cluster around (1, 1, 1)
        rows.append((i, [1.0 + 0.01 * i, 1.0, 1.0]))
    for i in range(10, 20):       # cluster around (-1, -1, -1)
        rows.append((i, [-1.0 - 0.01 * i, -1.0, -1.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r.cluster for r in kmeans_exact(df, k=2, iterations=3).collect()}
    a = {out[i] for i in range(10)}
    b = {out[i] for i in range(10, 20)}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_kmeans_exact_is_deterministic_across_partitionings(spark):
    from pretalx_hub_etl_spark.llm.kmeans import kmeans_exact

    rows = [(i, [float((i * 7) % 5) - 2.0, float((i * 3) % 4) - 1.5]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r1 = sorted(map(tuple, kmeans_exact(df.repartition(1), k=4, iterations=2).collect()))
    r2 = sorted(map(tuple, kmeans_exact(df.repartition(13), k=4, iterations=2).collect()))
    assert r1 == r2


def test_expectation_report_math(spark):
    from pretalx_hub_etl_spark.operators.expectations import (
        completeness, expectation_report, in_range, unique,
    )

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 15.0), (3, None, 7.0), (3, "d", 9.0)],
        "id long, name string, v double",
    )
    rep = {
        (r.check_name, r.col_name): (r.metric, r.passed)
        for r in expectation_report(
            df,
            [
                completeness("name", 1.0),
                unique("id", 1.0),
                in_range("v", 0.0, 10.0, 0.7),
            ],
        ).collect()
    }
    assert rep[("completeness", "name")] == (0.75, False)
    assert rep[("unique", "id")] == (0.75, False)
    assert rep[("in_range", "v")] == (0.75, True)


def test_cont_quantiles_match_numpy(spark):
    import numpy as np

    from pretalx_hub_etl_spark.operators.agg import (
        exact_global_quantiles_cont,
    )

    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r.fraction: r.value
        for r in exact_global_quantiles_cont(
            df, "v", fractions=(0.25, 0.5, 0.75, 1.0)
        ).collect()
    }
    for q in (0.25, 0.5, 0.75, 1.0):
        assert abs(got[q] - float(np.quantile(vals, q))) < 1e-12


def test_kmeans_rejects_out_of_range_components(spark):
    import pytest

    from pretalx_hub_etl_spark.llm.kmeans import kmeans_exact

    df = spark.createDataFrame(
        [(1, [0.5, 0.5]), (2, [10.5, 0.0]), (3, [0.1, 0.2])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="positivity invariant"):
        kmeans_exact(df, k=2, iterations=1).collect()
