"""Curation operators: PII scrub, repetition, contamination, packing,
deterministic shuffle (llm/curation.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pretalx_hub_etl_spark.llm.curation import (
    contamination_overlap,
    pack_sequences,
    pii_scrub,
    repetition_stats,
    shuffle_order,
)


def test_pii_scrub_redacts_all_three_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@test.org and 12-345-678-9012 at 192.168.0.1 end"),
            (2, "no pii here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert out[1].clean_text == "mail <EMAIL> and <PHONE> at <IP> end"
    assert (out[1].n_emails, out[1].n_phones, out[1].n_ips) == (1, 1, 1)
    assert out[2].clean_text == "no pii here"
    assert (out[2].n_emails, out[2].n_phones, out[2].n_ips) == (0, 0, 0)


def test_repetition_stats_boilerplate_vs_unique(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c a b c"),  # pure loop -> high ratio
            (2, "one two three four five six"),  # all distinct -> 0
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(df, n=3).collect()}
    assert out[2].rep_ratio == 0.0
    assert out[1].rep_ratio > 0.6
    assert out[1].max_gram_count == 4  # "a b c" 4 times
    assert out[1].total_grams == 10  # 12 words -> 10 trigrams


def test_contamination_flags_only_overlapping_docs(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox sleeps"),  # shares 2 trigrams? no: 1
            (2, "entirely different words here"),
        ],
        "doc_id long, text string",
    )
    hits = {
        r.doc_id: r.n_overlapping_grams
        for r in contamination_overlap(docs, bench, n=3, min_overlap=1).collect()
    }
    # doc 1 shares "the quick brown" and "quick brown fox"
    assert hits == {1: 2}


@pytest.mark.parametrize("mode", ["chunk", "greedy"])
def test_pack_sequences_covers_every_doc_once(spark, mode):
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * (10 + i % 7))) for i in range(40)],
        "doc_id long, text string",
    )
    out = pack_sequences(df, budget=50, n_buckets=4, mode=mode)
    rows = out.collect()
    assert sorted(r.doc_id for r in rows) == list(range(40))


def test_pack_greedy_budget_invariant(spark):
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * (10 + (i * 13) % 30))) for i in range(60)]
        + [(99, " ".join(["w"] * 200))],  # oversize singleton
        "doc_id long, text string",
    )
    out = pack_sequences(df, budget=64, n_buckets=4, mode="greedy").collect()
    totals: dict[tuple, int] = {}
    sizes: dict[tuple, int] = {}
    for r in out:
        totals[(r.bucket, r.pack_id)] = totals.get((r.bucket, r.pack_id), 0) + r.n_tokens
        sizes[(r.bucket, r.pack_id)] = sizes.get((r.bucket, r.pack_id), 0) + 1
    for key, tot in totals.items():
        # a pack only exceeds the budget when a single oversize doc is alone
        assert tot <= 64 or sizes[key] == 1
    # true greedy property: a pack closes only because the NEXT doc (in id
    # order) would not fit — no pack is lazily under-filled
    by_bucket: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.bucket, r.doc_id)):
        by_bucket.setdefault(r.bucket, []).append(r)
    for rows in by_bucket.values():
        for prev, cur in zip(rows, rows[1:]):
            if cur.pack_id != prev.pack_id:
                assert totals[(prev.bucket, prev.pack_id)] + cur.n_tokens > 64


def test_shuffle_order_deterministic_and_total(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    a = [r.doc_id for r in shuffle_order(df).select("doc_id").collect()]
    b = [r.doc_id for r in shuffle_order(df).select("doc_id").collect()]
    assert a == b  # reproducible across runs
    assert a != list(range(100))  # actually shuffled
    assert sorted(a) == list(range(100))
    # keys are unique for distinct ids < 2^31 (odd KNUTH is bijective mod
    # 2^32; above the 2^31 input mask, the id secondary sort breaks ties)
    keys = [r.shuffle_key for r in shuffle_order(df).collect()]
    assert len(set(keys)) == 100


def test_cap_per_group_deterministic_subset(spark):
    from pretalx_hub_etl_spark.llm.curation import cap_per_group

    df = spark.createDataFrame(
        [(i, "hot" if i < 50 else "cold") for i in range(60)],
        "doc_id long, source string",
    )
    out = cap_per_group(df, "source", cap=10, id_col="doc_id")
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, set()).add(r.doc_id)
    assert len(by_src["hot"]) == 10          # capped
    assert len(by_src["cold"]) == 10         # under cap -> all kept
    assert by_src["cold"] == set(range(50, 60))
    # deterministic: rerun picks the identical subset
    rerun = {r.doc_id for r in cap_per_group(df, "source", 10, "doc_id").collect()}
    assert rerun == by_src["hot"] | by_src["cold"]
    # hash-ordered, not id-ordered: the kept hot docs are not just 0..9
    assert by_src["hot"] != set(range(10))


def test_chunk_documents_overlap_and_tail(spark):
    from pretalx_hub_etl_spark.llm.curation import chunk_documents

    text = " ".join(f"w{i}" for i in range(11))  # 11 tokens
    df = spark.createDataFrame([(1, text), (2, "solo"), (3, "  ")],
                               "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=4, stride=2)
    rows = {(r.doc_id, r.chunk_id): (r.chunk_text, r.n_tokens) for r in out.collect()}
    # doc 1: starts 0,2,4,6,8,10 -> 6 chunks; last two are tails
    assert {(d, c) for d, c in rows if d == 1} == {(1, i) for i in range(6)}
    assert rows[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert rows[(1, 1)] == ("w2 w3 w4 w5", 4)
    assert rows[(1, 4)] == ("w8 w9 w10", 3)
    assert rows[(1, 5)] == ("w10", 1)
    # single-token doc -> one chunk; whitespace-only doc -> no rows
    assert rows[(2, 0)] == ("solo", 1)
    assert {d for d, _ in rows} == {1, 2}


def test_thin_hot_groups_identical_output_and_real_thinning(spark):
    """One group holds 50% of all rows: the pre-filter must drop >= 90%
    of its rows before the rank window, and the capped output must be
    byte-identical to the exact (thin_out=False) form."""
    from pretalx_hub_etl_spark.llm.curation import (
        cap_per_group,
        thin_hot_groups,
    )

    n_hot = 4000
    rows = [(i, "hot") for i in range(n_hot)]
    rows += [(n_hot + i, f"cold{i % 40}") for i in range(n_hot)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    cap = 20

    thinned = thin_hot_groups(df, "source", cap=cap, id_col="doc_id")
    hot_before = n_hot
    hot_after = thinned.filter(F.col("source") == "hot").count()
    assert hot_after >= cap  # guard: winners provably retained
    assert hot_after <= hot_before * 0.10  # >= 90% dropped pre-window
    # cold groups (100 rows each, under the hot threshold) pass untouched
    assert thinned.filter(F.col("source") != "hot").count() == n_hot

    exact = cap_per_group(df, "source", cap, "doc_id", thin_out=False)
    fast = cap_per_group(df, "source", cap, "doc_id", thin_out=True)
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, exact.collect())
    )


def test_thin_hot_groups_guard_widens_or_passes_through(spark):
    """With a pathologically low overshoot the guard must still return a
    frame containing every true winner (widened or exact passthrough)."""
    from pretalx_hub_etl_spark.llm.curation import (
        cap_per_group,
        thin_hot_groups,
    )

    df = spark.createDataFrame(
        [(i, "hot") for i in range(500)], "doc_id long, source string"
    )
    cap = 30
    thinned = thin_hot_groups(
        df, "source", cap=cap, id_col="doc_id", overshoot=1.05
    )
    exact = {
        r.doc_id
        for r in cap_per_group(df, "source", cap, "doc_id", thin_out=False)
        .collect()
    }
    kept = {r.doc_id for r in thinned.collect()}
    assert exact <= kept


def test_exact_group_quantiles_reference(spark):
    """Rank-formula quantiles equal a driver-side sorted-list reference,
    including the all-ties and single-element groups."""
    import math

    from pretalx_hub_etl_spark.operators.agg import exact_group_quantiles

    rows = [("a", v) for v in [5, 1, 9, 3, 7, 3, 3]]
    rows += [("b", v) for v in [10]]
    rows += [("c", v) for v in [2, 2, 2, 2]]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r.g: r for r in exact_group_quantiles(
        df, ["g"], "v", fractions=(0.25, 0.5, 0.9)
    ).collect()}

    def ref(vals, q):
        s = sorted(vals)
        return s[max(1, math.ceil(q * len(s))) - 1]

    data = {"a": [5, 1, 9, 3, 7, 3, 3], "b": [10], "c": [2, 2, 2, 2]}
    for g, vals in data.items():
        assert (out[g].p25, out[g].p50, out[g].p90) == (
            ref(vals, 0.25), ref(vals, 0.5), ref(vals, 0.9)
        ), g


def test_mad_outliers_flags_planted_extremes(spark):
    from pretalx_hub_etl_spark.operators.agg import mad_outliers

    # tight cluster around 100 plus two planted extremes
    vals = [98, 99, 100, 100, 101, 102, 100, 99, 500, -300]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "id long, g string, v long"
    )
    out = {r.id for r in mad_outliers(df, ["g"], "v", k=3.0).collect()}
    assert out == {8, 9}  # exactly the planted extremes
    row = mad_outliers(df, ["g"], "v", k=3.0).collect()[0]
    assert row["__med"] == 100  # rank-5 element of the sorted 10 values
    # deviations sorted: 0,0,0,1,1,1,2,2,400,400 -> rank-5 element = 1
    assert row["__mad"] == 1


def test_exact_global_quantiles_matches_sorted_reference(spark):
    import math
    import random

    from pretalx_hub_etl_spark.operators.agg import exact_global_quantiles

    rng = random.Random(7)
    vals = [rng.randrange(-10_000, 10_000) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    out = {r.fraction: r.value
           for r in exact_global_quantiles(
               df, "x", fractions=(0.01, 0.5, 0.9, 0.99), num_partitions=8
           ).collect()}
    s = sorted(vals)
    for q in (0.01, 0.5, 0.9, 0.99):
        assert out[q] == s[max(1, math.ceil(q * len(s))) - 1], q
    # duplicate-rank edge: two fractions landing on the same element
    tiny = spark.createDataFrame([(1,), (2,)], "x long")
    got = {r.fraction: r.value
           for r in exact_global_quantiles(
               tiny, "x", fractions=(0.4, 0.5), num_partitions=4
           ).collect()}
    assert got == {0.4: 1, 0.5: 1}


def test_global_row_number_equals_window_form(spark):
    from pyspark.sql import Window

    from pretalx_hub_etl_spark.operators.agg import global_row_number

    df = spark.createDataFrame(
        [((i * 37) % 101, i) for i in range(500)], "v long, id long"
    )
    got = {
        (r.v, r.id): r.rn
        for r in global_row_number(
            df, [F.col("v").asc(), F.col("id").asc()], num_partitions=8
        ).collect()
    }
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    want = {
        (r.v, r.id): r.rn
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_build_vocab_dense_frequency_ranked_ids(spark):
    from pretalx_hub_etl_spark.llm.text import build_vocab

    df = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a b z")], "doc_id long, text string"
    )
    out = {r.term: (r.n, r.vocab_id) for r in build_vocab(df).collect()}
    # b:4, a:3, c:1, z:1 (c before z lexically at equal count)
    assert out == {"b": (4, 1), "a": (3, 2), "c": (1, 3), "z": (1, 4)}
    cut = {r.term for r in build_vocab(df, min_count=2).collect()}
    assert cut == {"a", "b"}



def test_triangle_enumerate_matches_naive(spark):
    """Degree-oriented wedges equal the naive triple-join on a graph with
    a hub vertex (the case the orientation exists for) plus disconnected
    and triangle-free parts."""
    import itertools

    from pretalx_hub_etl_spark.operators.graph import triangle_enumerate

    edges = [(0, i) for i in range(1, 8)]          # hub 0
    edges += [(1, 2), (3, 4), (5, 6)]              # hub triangles
    edges += [(10, 11), (11, 12)]                  # path: no triangle
    edges += [(2, 1), (4, 4)]                      # dup reversed + self-loop
    df = spark.createDataFrame(edges, "u long, v long")
    got = {(r.a, r.b, r.c) for r in triangle_enumerate(df).collect()}

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({x for e in und for x in e})
    want = {
        (a, b, c)
        for a, b, c in itertools.combinations(nodes, 3)
        if {(a, b), (a, c), (b, c)} <= und
    }
    assert got == want
    assert (0, 1, 2) in got and (0, 5, 6) in got
    assert len(got) == 3


def test_exact_group_quantiles_hypothesis(spark):
    """Property: rank-formula quantiles == sorted-list reference on
    adversarial small multisets (ties, negatives, singletons)."""
    import math

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pretalx_hub_etl_spark.operators.agg import exact_group_quantiles

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.lists(st.integers(min_value=-5, max_value=5),
                    min_size=1, max_size=12),
           st.floats(min_value=0.01, max_value=1.0,
                     allow_nan=False, allow_infinity=False))
    def inner(vals, q):
        df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
        out = exact_group_quantiles(df, ["g"], "v", fractions=(q,)).collect()[0]
        s = sorted(vals)
        want = s[max(1, math.ceil(q * len(s))) - 1]
        assert out[1] == want, (vals, q)

    inner()
