"""Edge tests for the round-8 final-batch operators (VERDICT r8 task 3):
Bloom FP behavior + word-count sizing (J10), SSSP bounded-horizon /
unreachable vertices (GR5), SNM window-boundary pairs (L43), EWMA k=1
and full-16 histories (AN24), AUC all-ties / single-class days (AN25).

The query-level tests write tiny fixture parquet dirs and call the REAL
query functions (Catalog is lazy, so only the tables a query touches
need to exist) — same edge-test policy as AN19/AN20 (582f366)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pretalx_hub_etl_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_prefilter,
)
from pretalx_hub_etl_spark.operators.graph import banded_key_edges, sssp_rounds

EVENTS_SCHEMA = (
    "event_id long, user_id long, event_type string, value double, "
    "props string, ts_s string"
)


def _write_events(spark, tmp, rows):
    (
        spark.createDataFrame(rows, EVENTS_SCHEMA)
        .selectExpr(
            "event_id", "user_id", "event_type", "value", "props",
            "CAST(ts_s AS TIMESTAMP) AS ts",
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/events.parquet")
    )
    return str(tmp)


# --- J10: Bloom filter ------------------------------------------------------


def test_bloom_never_false_negative_and_tiny_filter_false_positives(spark):
    # geometry forced tiny (m=64 bits, 1 word) so 40 keys * k=2 probes
    # saturate the bitmap: every member MUST still pass (no false
    # negatives, the correctness half of the contract) and some
    # nonmember WILL pass (the false-positive half — expected, removed
    # by the exact join downstream).
    members = spark.range(0, 40).withColumnRenamed("id", "k")
    bloom = bloom_build(members, "k", m_bits=64, k=2)
    probe = (
        spark.range(0, 4000)
        .withColumnRenamed("id", "k")
        .join(F.broadcast(bloom))
        .filter(bloom_might_contain(F.col("__bloom"), F.col("k"), 64, 2))
    )
    passed = {r.k for r in probe.collect()}
    assert set(range(40)) <= passed  # no false negatives, ever
    assert len(passed) > 40  # saturated filter must false-positive


def test_bloom_build_word_count_bounded_by_geometry(spark):
    # the build's shuffle cardinality claim: the aggregated bitmap has
    # at most m_bits/64 words no matter how many keys went in, and
    # every stored word mask is nonzero (empty words are absent, not
    # zero-filled — that's what keeps the broadcast ~m/8 bytes).
    bloom = bloom_build(
        spark.range(0, 10_000).withColumnRenamed("id", "k"),
        "k",
        m_bits=1 << 12,
        k=3,
    ).collect()[0]["__bloom"]
    assert len(bloom) <= (1 << 12) // 64
    assert all(mask != 0 for mask in bloom.values())


def test_bloom_prefilter_is_invisible_after_exact_join(spark):
    # forced-FP geometry again: prefilter keeps nonmembers, but the
    # exact join after it must produce exactly the plain-join answer
    fact = spark.range(0, 500).select(
        F.col("id").alias("fk"), (F.col("id") % 7).alias("payload")
    )
    dim = spark.range(0, 500, 13).withColumnRenamed("id", "dk")
    pre = bloom_prefilter(fact, "fk", dim, "dk", m_bits=64, k=2)
    assert pre.count() > dim.count()  # FPs present before the join
    got = sorted(
        (r.fk, r.payload)
        for r in pre.join(dim, F.col("fk") == F.col("dk")).collect()
    )
    want = sorted(
        (r.fk, r.payload)
        for r in fact.join(dim, F.col("fk") == F.col("dk")).collect()
    )
    assert got == want


# --- GR5: bounded Bellman-Ford SSSP -----------------------------------------


def test_sssp_horizon_unreachable_and_cheaper_long_path(spark):
    # chain 0-1-2-3 at w=1 each plus a direct 0-3 shortcut at w=10,
    # plus a disconnected component {8,9}: round 1 can only see the
    # expensive direct edge (bounded horizon), round 3 finds the
    # cheaper 3-hop path (the re-min property hop-BFS lacks), and the
    # disconnected pair never appears at any horizon.
    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 3, 10), (8, 9, 1)],
        "u long, v long, w long",
    )
    sources = spark.createDataFrame([(0,)], "x long")

    def dists(rounds):
        return {
            r.vertex: r.dist
            for r in sssp_rounds(edges, sources, rounds=rounds).collect()
        }

    one = dists(1)
    assert one == {0: 0, 1: 1, 3: 10}
    three = dists(3)
    assert three == {0: 0, 1: 1, 2: 2, 3: 3}
    assert 8 not in three and 9 not in three


# --- L43: sorted-neighborhood window boundaries -----------------------------


def test_snm_pairs_exact_window_boundary(spark, tmp_path):
    # 10 identical docs in one lang: ranks follow doc_id, every
    # neighbor pair has prefix_dist 0, so the survivor set is exactly
    # the rank-window pairs 0 < delta < 8 — delta=7 (cross-bucket via
    # the exploded {b, b-1} join) included, delta=8 excluded
    from pretalx_hub_etl_spark.queries.scale_q import q_dedup_snm

    rows = [(i, "same text body", "en", "web", 14) for i in range(1, 11)]
    (
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/documents.parquet")
    )
    pairs = {
        (r.doc_a, r.doc_b)
        for r in q_dedup_snm(spark, str(tmp_path)).collect()
    }
    want = {
        (a, b)
        for a in range(1, 11)
        for b in range(a + 1, 11)
        if b - a < 8
    }
    assert pairs == want
    assert (1, 8) in pairs  # delta = 7: last in-window neighbor
    assert (1, 9) not in pairs  # delta = 8: first out-of-window
    assert (2, 9) in pairs  # delta = 7 crossing the rank-8 bucket edge


# --- AN24: exact EWMA -------------------------------------------------------


def test_ewma_k1_and_capped_16_history(spark, tmp_path):
    from pretalx_hub_etl_spark.queries.analytics_q2 import q_ewma

    rows = [(100, 1, "click", 3.21, "{}", "2024-01-01 00:00:00")]
    # user 2: 17 events, values 1.00, 2.00, ... 17.00 — the cap must
    # drop the OLDEST (value 1.00) and weight the remaining 16
    rows += [
        (200 + i, 2, "click", float(i + 1), "{}", f"2024-01-01 01:{i:02d}:00")
        for i in range(17)
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r.user_id: r for r in q_ewma(spark, sf).collect()}

    # k=1: EWMA of a single sample is the sample, den = 2^1 - 1 = 1
    assert (got[1].k, got[1].ewma_num, got[1].ewma_den) == (1, 321, 1)
    assert got[1].ewma_micro == 321 * 1_000_000

    kept = [(i + 1) * 100 for i in range(1, 17)]  # cents, oldest first
    num = sum(c << rn for rn, c in enumerate(kept))  # 2^(rank-1) weights
    den = (1 << 16) - 1
    assert (got[2].k, got[2].ewma_num, got[2].ewma_den) == (16, num, den)
    assert got[2].ewma_micro == (num * 1_000_000) // den


# --- AN25: exact AUC --------------------------------------------------------


def test_auc_single_class_all_ties_and_perfect_separation(spark, tmp_path):
    from pretalx_hub_etl_spark.queries.analytics_q2 import q_eval_auc

    rows = [
        # day 1: positives only -> undefined AUC, row must be absent
        (1, 1, "purchase", 5.0, "{}", "2024-03-01 10:00:00"),
        (2, 2, "purchase", 7.0, "{}", "2024-03-01 11:00:00"),
        # day 2: one pos one neg, SAME value (all ties) -> AUC 1/2
        (3, 1, "purchase", 4.0, "{}", "2024-03-02 10:00:00"),
        (4, 2, "click", 4.0, "{}", "2024-03-02 11:00:00"),
        # day 3: positive strictly above negative -> AUC 1
        (5, 1, "purchase", 9.0, "{}", "2024-03-03 10:00:00"),
        (6, 2, "click", 1.0, "{}", "2024-03-03 11:00:00"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {str(r.day): r for r in q_eval_auc(spark, sf).collect()}

    assert "2024-03-01" not in got  # single-class day filtered
    assert got["2024-03-02"].auc_micro == 500_000  # all-ties midrank
    assert got["2024-03-02"].u2 == 1  # 2U stays integral on ties
    assert got["2024-03-03"].auc_micro == 1_000_000
    assert set(got) == {"2024-03-02", "2024-03-03"}


# --- banded_key_edges sanity used by GR5's fixture --------------------------


def test_sssp_fixture_edges_are_symmetric_free(spark):
    # the SSSP fixture derives weights v-u > 0; banded_key_edges must
    # emit each unordered pair once with u < v so weights stay positive
    c = spark.createDataFrame(
        [(1, 10), (5, 10), (8, 10)], "c_custkey long, c_nationkey long"
    )
    e = banded_key_edges(c, "c_custkey", "c_nationkey", band=100).collect()
    assert all(r.u < r.v for r in e)
    assert {(r.u, r.v) for r in e} == {(1, 5), (1, 8), (5, 8)}
