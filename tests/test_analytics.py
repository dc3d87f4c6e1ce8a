"""Skyline, exact-k sampling, and transition-matrix unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from pretalx_hub_etl_spark.operators.skyline import skyline_2d


def _naive_skyline(pts, min_x=True, max_y=True):
    def dominates(q, p):
        qx, qy = (q[0] if min_x else -q[0]), (q[1] if max_y else -q[1])
        px, py = (p[0] if min_x else -p[0]), (p[1] if max_y else -p[1])
        return qx <= px and qy >= py and (qx < px or qy > py)

    pts = [p for p in pts if p[0] is not None and p[1] is not None]
    return sorted(
        {
            p
            for p in pts
            if not any(dominates(q, p) for q in pts if q != p)
        }
    )


def test_skyline_matches_naive(spark):
    pts = [
        (1.0, 5),
        (1.0, 3),  # same x, lower y -> dominated
        (2.0, 7),  # higher x but higher y -> survives
        (2.0, 7),  # duplicate point -> one output row
        (3.0, 7),  # same y as a cheaper point -> dominated
        (0.5, 1),  # cheapest overall -> survives
        (4.0, 6),  # dominated by (2.0, 7)
        (5.0, 9),
        (None, 4),
        (6.0, None),
    ]
    df = spark.createDataFrame(pts, "x double, y int")
    got = sorted(
        (r.x, r.y) for r in skyline_2d(df, "x", "y").collect()
    )
    assert got == _naive_skyline(pts)
    assert got == [(0.5, 1), (1.0, 5), (2.0, 7), (5.0, 9)]


def test_skyline_orientations(spark):
    pts = [(1.0, 5), (2.0, 3), (3.0, 1), (2.0, 6)]
    df = spark.createDataFrame(pts, "x double, y int")
    # maximize x, minimize y: survivors are the opposite frontier
    got = sorted(
        (r.x, r.y)
        for r in skyline_2d(
            df, "x", "y", minimize_x=False, maximize_y=False
        ).collect()
    )
    assert got == _naive_skyline(pts, min_x=False, max_y=False)


def test_skyline_anticorrelated_full_set(spark):
    # worst case: every point on the frontier (cost and payoff rise
    # together, so nothing dominates anything) -> all survive
    pts = [(float(i), i) for i in range(50)]
    df = spark.createDataFrame(pts, "x double, y int")
    assert skyline_2d(df, "x", "y").count() == 50


def test_skyline_local_prune_shrinks_candidates(spark):
    # random-ish data: the per-partition prune must cut the global
    # window's input far below the per-x candidate count (the scale
    # guarantee: phase 3 sees ~P * local-skyline rows, not the data)
    n = 2000
    df = (
        spark.range(n)
        .select(
            (F.pmod(F.col("id") * 2654435761, F.lit(9973)) / 10.0).alias(
                "x"
            ),
            F.pmod(F.col("id") * 40503, F.lit(7919)).alias("y"),
        )
        .repartition(4)
    )
    out = skyline_2d(df, "x", "y")
    naive = _naive_skyline([(r.x, r.y) for r in df.collect()])
    assert sorted((r.x, r.y) for r in out.collect()) == naive
    # the frontier of ~uniform 2-D data is tiny relative to n
    assert out.count() < 100


def test_exact_k_sample_deterministic(spark):
    from pretalx_hub_etl_spark.queries.analytics_q import q_sample_exact_k

    a = q_sample_exact_k(spark, "/root/testdata/sf0.001")
    b = q_sample_exact_k(spark, "/root/testdata/sf0.001")
    ra = sorted(r.doc_id for r in a.collect())
    rb = sorted(r.doc_id for r in b.collect())
    assert ra == rb
    assert len(ra) == 500


def test_transition_probs_sum_to_one(spark):
    from pretalx_hub_etl_spark.queries.analytics_q import (
        q_event_transitions,
    )

    out = q_event_transitions(spark, "/root/testdata/sf0.001")
    sums = (
        out.groupBy("prev_type")
        .agg(F.sum("prob").alias("s"))
        .collect()
    )
    assert sums and all(abs(r.s - 1.0) < 1e-9 for r in sums)
