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


def test_grid_join_matches_naive(spark):
    from pretalx_hub_etl_spark.operators.spatial import (
        grid_distance_self_join,
    )

    import itertools

    # clustered + scattered points, including exact-radius boundary and
    # cross-cell neighbors
    pts = [
        (1, 0, 0),
        (2, 5, 0),       # dist2 25
        (3, 0, 5),       # dist2 25 from 1
        (4, 100, 100),
        (5, 104, 103),   # dist2 25 from 4
        (6, 9, 9),       # cross-cell from 1 at radius 5? dist2 162 > 25
        (7, 3, 4),       # dist2 25 from 1 (exact boundary)
        (8, 1000, 1000),
    ]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    r = 5
    got = sorted(
        (row.id_a, row.id_b, row.dist2)
        for row in grid_distance_self_join(df, "id", "x", "y", r).collect()
    )
    want = sorted(
        (a[0], b[0], (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2)
        for a, b in itertools.combinations(pts, 2)
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= r * r
    )
    assert got == want and len(want) >= 4


def test_pagerank_matches_reference(spark):
    from pretalx_hub_etl_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]  # cycle + feeder
    df = spark.createDataFrame(edges, "u long, v long")
    scale, iters = 1_000_000, 5
    got = {
        r.vertex: r.pr for r in pagerank(df, iterations=iters).collect()
    }

    # driver-side integer replay
    outd = {}
    for u, v in edges:
        outd[u] = outd.get(u, 0) + 1
    verts = {x for e in edges for x in e}
    ranks = {x: scale for x in verts}
    base = (15 * scale) // 100
    for _ in range(iters):
        s = {x: 0 for x in verts}
        for u, v in edges:
            s[v] += ranks[u] // outd[u]
        ranks = {x: base + (85 * s[x]) // 100 for x in verts}
    assert got == ranks
    # dangling vertex 4 receives nothing: floor(0.15 * scale)
    assert got[4] == base


def test_prefix_jaccard_equals_exact(spark):
    from pretalx_hub_etl_spark.catalog import Catalog
    from pretalx_hub_etl_spark.llm.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    d = Catalog(spark, "/root/testdata/sf0.001").documents
    kw = dict(
        text_col="text",
        id_col="doc_id",
        k=3,
        jaccard_threshold=0.5,
        max_doc_freq=100,
    )
    exact = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in ngram_jaccard_pairs(d, **kw).collect()
    }
    prefix = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in ngram_jaccard_pairs_prefix(d, **kw).collect()
    }
    assert prefix == exact and len(exact) > 0


def test_misra_gries_guarantee():
    from pretalx_hub_etl_spark.operators.heavy import _misra_gries

    # 'a' has freq 40 > 100/5=20 -> must hold a counter
    stream = ["a"] * 40 + [f"x{i}" for i in range(60)]
    got = _misra_gries(iter(stream), k=5)
    assert "a" in got


def test_heavy_hitters_exact(spark):
    import random

    from pretalx_hub_etl_spark.operators.heavy import heavy_hitters

    rng = random.Random(7)
    vals = (
        ["hot"] * 300
        + ["warm"] * 120
        + ["cool"] * 99
        + [f"tail{rng.randrange(5000)}" for _ in range(2000)]
    )
    rng.shuffle(vals)
    df = spark.createDataFrame(
        [(v,) for v in vals], "term string"
    ).repartition(4)
    got = {
        (r.value, r.n)
        for r in heavy_hitters(df, "term", min_count=100).collect()
    }
    from collections import Counter

    want = {
        (v, n) for v, n in Counter(vals).items() if n >= 100
    }
    assert got == want
    assert ("hot", 300) in got and ("cool", 99) not in got


def test_bitmap_pages_merge_like_a_sketch(spark):
    # the re-aggregatable claim behind q_distinct_bitmap: bitmap pages
    # built on DISJOINT SLICES of the data OR-merge to the same exact
    # distinct count as one pass over the whole — what lets a 100 TB
    # pipeline persist per-partition pages and re-aggregate later
    from pyspark.sql import functions as F

    rows = [(i % 7, i % 40) for i in range(400)]
    df = spark.createDataFrame(rows, "g int, uid long")

    def pages(frame):
        return frame.groupBy(
            "g", F.bitmap_bucket_number("uid").alias("bucket")
        ).agg(
            F.bitmap_construct_agg(F.bitmap_bit_position("uid")).alias("bm")
        )

    a, b = df.filter("uid % 2 = 0"), df.filter("uid % 2 = 1")
    merged = (
        pages(a)
        .unionByName(pages(b))
        .groupBy("g", "bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .groupBy("g")
        .agg(F.sum(F.bitmap_count("bm")).alias("n"))
    )
    whole = (
        pages(df)
        .groupBy("g")
        .agg(F.sum(F.bitmap_count("bm")).alias("n"))
    )
    exact = df.groupBy("g").agg(F.countDistinct("uid").alias("n"))
    as_map = lambda d: {r.g: r.n for r in d.collect()}  # noqa: E731
    assert as_map(merged) == as_map(whole) == as_map(exact)


def test_interval_coverage_matches_naive(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ivs = [
        # user 1: overlapping, nested, disjoint
        (1, 1, 0, 10),
        (1, 2, 5, 15),    # overlap -> union [0,15)
        (1, 3, 7, 9),     # nested -> no new coverage
        (1, 4, 20, 25),   # disjoint
        # user 2: zero-length and touching intervals
        (2, 5, 0, 0),
        (2, 6, 0, 5),
        (2, 7, 5, 8),     # touching, no overlap
    ]
    df = spark.createDataFrame(ivs, "user_id long, event_id long, s long, e long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    covered = F.greatest(
        F.lit(0).cast("long"),
        F.col("e")
        - F.greatest(F.col("s"), F.coalesce(F.max("e").over(w), F.col("s"))),
    )
    got = {
        r.user_id: r.c
        for r in df.select("user_id", covered.alias("cv"))
        .groupBy("user_id")
        .agg(F.sum("cv").alias("c"))
        .collect()
    }

    def naive(uid):
        secs = set()
        for u, _, s, e in ivs:
            if u == uid:
                secs.update(range(s, e))
        return len(secs)

    assert got == {1: naive(1), 2: naive(2)}
    assert got[1] == 20 and got[2] == 8


def test_incremental_distinct_idempotent_under_redelivery(spark):
    # the at-least-once property: folding the SAME delta twice must not
    # change the counts (bitmap OR is idempotent) — the guarantee a
    # CDC/stream consumer actually relies on
    from pyspark.sql import functions as F

    from pretalx_hub_etl_spark.operators.incremental import (
        apply_distinct_delta,
        distinct_counts,
        distinct_state,
    )

    base = spark.createDataFrame(
        [(i % 3, i) for i in range(50)], "g int, id long"
    )
    delta = spark.createDataFrame(
        [(i % 3, i) for i in range(40, 70)], "g int, id long"
    )
    st = distinct_state(base, F.col("g"), F.col("id"))
    d = distinct_state(delta, F.col("g"), F.col("id"))
    once = apply_distinct_delta(st, d)
    twice = apply_distinct_delta(once, d)
    as_map = lambda s: {  # noqa: E731
        r.grp: r.n_distinct for r in distinct_counts(s).collect()
    }
    want = {
        g: len({i for i in range(70) if i % 3 == g}) for g in range(3)
    }
    assert as_map(once) == as_map(twice) == want



def test_retention_cohort_small(spark):
    # Two cohorts: users 1-2 start week of Jan 6 (Mon Jan 6 2025),
    # user 3 starts the next week. User 1 returns in weeks +1 and +2,
    # user 2 never returns, user 3 returns in week +1.
    # Calls the SAME body the query wrapper runs (operators/analytics.py)
    # so a regression in the query surfaces here, not only in the
    # driver's oracle harness (round-5 ADVICE).
    from pretalx_hub_etl_spark.operators.analytics import weekly_retention

    rows = [
        (1, "2025-01-07 10:00:00"),
        (1, "2025-01-08 11:00:00"),  # same week: dedup'd
        (2, "2025-01-09 12:00:00"),
        (1, "2025-01-14 10:00:00"),  # +1 week
        (1, "2025-01-21 10:00:00"),  # +2 weeks
        (3, "2025-01-15 09:00:00"),  # second cohort
        (3, "2025-01-22 09:00:00"),  # +1 week
    ]
    df = spark.createDataFrame(
        [(uid, ts) for uid, ts in rows], "user_id long, ts string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))

    out = weekly_retention(df).collect()
    got = {
        (str(r.cohort_week), r.week_offset): (
            r.active_users,
            r.cohort_size,
            r.retention,
        )
        for r in out
    }
    assert got == {
        ("2025-01-06", 0): (2, 2, 1.0),
        ("2025-01-06", 1): (1, 2, 0.5),
        ("2025-01-06", 2): (1, 2, 0.5),
        ("2025-01-13", 0): (1, 1, 1.0),
        ("2025-01-13", 1): (1, 1, 1.0),
    }


def _events_frame(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, ts string, event_id long, value double"
    ).select(
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
        "value",
    )


def test_fill_locf_semantics(spark):
    # One type with a 4-hour span observed only at hours 0 and 3:
    # hours 1-2 must be spine-generated and carry hour 0's value; the
    # in-hour pick must take the LAST observation by (ts, event_id).
    # Runs the shipped query body (operators/analytics.py:locf_fill).
    from pretalx_hub_etl_spark.operators.analytics import locf_fill

    df = _events_frame(
        spark,
        [
            ("a", "2025-03-01 00:10:00", 1, 10.0),
            ("a", "2025-03-01 00:50:00", 2, 11.0),  # later ts wins hour 0
            ("a", "2025-03-01 03:05:00", 3, 40.0),
        ],
    )
    out = locf_fill(df).orderBy("hour").collect()
    assert [(r.value_locf, r.observed) for r in out] == [
        (11.0, True),   # hour 0: later observation (11.0) wins
        (11.0, False),  # hour 1: filled
        (11.0, False),  # hour 2: filled
        (40.0, True),   # hour 3
    ]


def test_interpolate_blend_math(spark):
    # observations at hour 0 (10.0) and hour 3 (40.0): hours 1 and 2
    # interpolate to exactly 20.0 and 30.0 (fractions 1/3, 2/3).
    # Runs the shipped query body (operators/analytics.py).
    from pretalx_hub_etl_spark.operators.analytics import interpolate_fill

    df = _events_frame(
        spark,
        [
            ("a", "2025-03-01 00:00:00", 1, 10.0),
            ("a", "2025-03-01 03:00:00", 2, 40.0),
        ],
    )
    out = interpolate_fill(df).orderBy("hour").collect()
    assert [r.value_interp for r in out] == [10.0, 20.0, 30.0, 40.0]
    assert [r.observed for r in out] == [True, False, False, True]


def test_basket_rules_lift_math(spark):
    # 4 baskets: A,B together twice, A alone once, B alone once.
    # P(A)=3/4, P(B)=3/4, P(A,B)=2/4 -> lift = (2*4)/(3*3) = 8/9;
    # confidence(A->B) = 2/3. Runs the shipped query body
    # (operators/analytics.py:basket_rules) with min_support=1.
    from pretalx_hub_etl_spark.operators.analytics import basket_rules

    baskets = spark.createDataFrame(
        [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (4, "B")],
        "okey long, brand string",
    )
    out = basket_rules(baskets, min_support=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.brand_a, r.brand_b) == ("A", "B")
    assert r.support_n == 2
    assert (r.count_a, r.count_b) == (3, 3)
    assert abs(r.confidence - 2 / 3) < 1e-15
    assert abs(r.lift - 8 / 9) < 1e-15


def test_corr_matrix_perfect_and_anti(spark):
    # y = 2x -> corr +1; z = -x -> corr(x,z) = -1; all in one agg pass.
    # Runs the shipped generic helper (operators/analytics.py:
    # corr_matrix_exact) that q_corr_matrix binds to lineitem.
    from pretalx_hub_etl_spark.operators.analytics import corr_matrix_exact

    rows = [(float(x), float(2 * x), float(-x)) for x in range(1, 9)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    r = corr_matrix_exact(
        df,
        [
            ("x", F.col("x").cast("long")),
            ("y", F.col("y").cast("long")),
            ("z", F.col("z").cast("long")),
        ],
    ).collect()[0]
    assert r.n == 8
    assert abs(r.corr_x_y - 1.0) < 1e-12
    assert abs(r.corr_x_z + 1.0) < 1e-12
    assert abs(r.corr_y_z + 1.0) < 1e-12


def test_psi_drift_identical_distributions_near_zero(spark):
    from pretalx_hub_etl_spark.operators.analytics import psi_drift

    a = spark.range(1000).select((F.col("id") % 40).alias("v"))
    rows = psi_drift(a, a, "v", bin_width=10, n_bins=4).collect()
    assert len(rows) == 4
    # identical samples: p == q per bin, every term exactly 0
    assert all(r.psi_micro == 0 for r in rows)
    assert sum(r.ref_n for r in rows) == 1000
    assert all(r.ref_n == r.cur_n for r in rows)


def test_psi_drift_matches_hand_formula(spark):
    import math

    from pretalx_hub_etl_spark.operators.analytics import psi_drift

    # ref: 60 rows in bin0, 40 in bin1; cur: 20 in bin0, 80 in bin1
    ref = spark.range(100).select(
        F.when(F.col("id") < 60, F.lit(5)).otherwise(F.lit(15)).alias("v")
    )
    cur = spark.range(100).select(
        F.when(F.col("id") < 20, F.lit(5)).otherwise(F.lit(15)).alias("v")
    )
    rows = {r.bin: r for r in psi_drift(ref, cur, "v", 10, 2).collect()}
    for b, (ca, cb) in {0: (60, 20), 1: (40, 80)}.items():
        p, q = (ca + 1) / 102, (cb + 1) / 102
        want = math.floor(
            (p - q) * math.log(((ca + 1) * 102) / ((cb + 1) * 102)) * 1e6
            + 0.5
        )
        assert rows[b].psi_micro == want, (b, rows[b].psi_micro, want)
    # clamping: values below 0 and above the top edge land in edge bins
    lo = spark.range(10).select(F.lit(-5).alias("v"))
    hi = spark.range(10).select(F.lit(999).alias("v"))
    out = {r.bin: r for r in psi_drift(lo, hi, "v", 10, 2).collect()}
    assert out[0].ref_n == 10 and out[1].cur_n == 10


def test_psi_drift_null_values_excluded_from_totals(spark):
    from pretalx_hub_etl_spark.operators.analytics import psi_drift

    # NULLs bin nowhere, so they must not inflate the denominators
    # either: a side with NULLs mixed in must equal the same side with
    # the NULL rows pre-dropped (round-7 advice).
    clean = spark.range(100).select((F.col("id") % 20).alias("v"))
    noisy = clean.unionAll(
        spark.range(37).select(F.lit(None).cast("long").alias("v"))
    )
    want = {
        (r.bin, r.ref_n, r.cur_n, r.psi_micro)
        for r in psi_drift(clean, clean, "v", 10, 2).collect()
    }
    got = {
        (r.bin, r.ref_n, r.cur_n, r.psi_micro)
        for r in psi_drift(noisy, clean, "v", 10, 2).collect()
    }
    assert got == want


def test_pagerank_sink_redistribution_conserves_mass(spark):
    from pretalx_hub_etl_spark.operators.graph import pagerank

    # graph WITH dangling mass: 3 -> nothing, 4 -> nothing
    edges = [(1, 2), (2, 3), (1, 4), (2, 4)]
    df = spark.createDataFrame(edges, "u long, v long")
    scale, iters = 1_000_000, 5
    got = {
        r.vertex: r.pr
        for r in pagerank(
            df, iterations=iters, redistribute_dangling=True
        ).collect()
    }

    # driver-side integer replay of the sink-closure recursion
    outd = {}
    for u, v in edges:
        outd[u] = outd.get(u, 0) + 1
    verts = sorted({x for e in edges for x in e})
    n = len(verts)
    ranks = {x: scale for x in verts}
    base = (15 * scale) // 100
    for _ in range(iters):
        dangling = sum(r for x, r in ranks.items() if x not in outd)
        share = dangling // n
        s = {x: 0 for x in verts}
        for u, v in edges:
            s[v] += ranks[u] // outd[u]
        ranks = {x: base + (85 * (s[x] + share)) // 100 for x in verts}
    assert got == ranks

    # mass conservation: without redistribution the dangling pair leaks
    # most of its mass; with it, total mass stays near n*scale (each
    # floor division loses < 1 unit per vertex/edge per iteration)
    leaky = {
        r.vertex: r.pr for r in pagerank(df, iterations=iters).collect()
    }
    assert sum(got.values()) > sum(leaky.values())
    assert sum(got.values()) >= int(n * scale * 0.93)


def test_bfs_hops_matches_driver_replay(spark):
    from pretalx_hub_etl_spark.operators.graph import bfs_hops

    # path 1-2-3-4-5, branch 3-6, isolated pair 8-9 (unreachable)
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (3, 6), (8, 9)]
    e = spark.createDataFrame(edges, "u long, v long")
    srcs = spark.createDataFrame([(1,)], "x long")
    got = {
        r.vertex: r.hops
        for r in bfs_hops(e, srcs, max_hops=3, undirected=True).collect()
    }
    # driver-side BFS replay
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want, frontier = {1: 0}, {1}
    for h in range(1, 4):
        frontier = {
            v for u in frontier for v in adj.get(u, ()) if v not in want
        }
        want.update({v: h for v in frontier})
    assert got == want
    assert 5 not in got and 8 not in got  # beyond max_hops / unreachable


def test_bfs_hops_directed_and_multi_source(spark):
    from pretalx_hub_etl_spark.operators.graph import bfs_hops

    edges = [(1, 2), (2, 3), (3, 1), (4, 3)]
    e = spark.createDataFrame(edges, "u long, v long")
    srcs = spark.createDataFrame([(1,), (4,)], "x long")
    got = {
        r.vertex: r.hops
        for r in bfs_hops(e, srcs, max_hops=2, undirected=False).collect()
    }
    # directed: 4->3 only; 1 reaches 2 then 3, but 3 is closer via 4
    assert got == {1: 0, 4: 0, 2: 1, 3: 1}


def test_histogram_quantile_rollup_matches_replay(spark):
    from pretalx_hub_etl_spark.operators.agg import histogram_quantile_rollup

    vals = [(g, c) for g in ("a", "b") for c in range(0, 1000, 7)]
    df = spark.createDataFrame(vals, "g string, c long")
    got = {
        r.q_pct: r.est_cents
        for r in histogram_quantile_rollup(
            df, "c", width_cents=100, q_pcts=[50, 95], partial_col="g"
        ).collect()
    }
    # driver replay: bin = c // 100, est = lower edge of first bin with
    # cum*100 >= q*total
    from collections import Counter

    bins = Counter(c // 100 for _, c in vals)
    total = sum(bins.values())
    want = {}
    for q in (50, 95):
        cum = 0
        for b in sorted(bins):
            cum += bins[b]
            if cum * 100 >= q * total:
                want[q] = b * 100
                break
    assert got == want
    # negative values bin by floor division (exactness guard)
    neg = spark.createDataFrame([("a", -150), ("a", 50)], "g string, c long")
    est = histogram_quantile_rollup(
        neg, "c", width_cents=100, q_pcts=[25]
    ).collect()
    assert est[0].est_cents == -200  # floor(-150/100) = -2


def test_k_core_peel_matches_driver_replay(spark):
    from pretalx_hub_etl_spark.operators.graph import k_core_peel

    # triangle {1,2,3} plus pendant chain 3-4-5: 2-core keeps only the
    # triangle (4 and 5 peel off over two rounds)
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    e = spark.createDataFrame(edges, "u long, v long")
    got = {
        r.vertex: r.deg
        for r in k_core_peel(e, k=2, rounds=3).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}
    # k=3 empties the graph entirely
    assert k_core_peel(e, k=3, rounds=3).count() == 0


def test_anomaly_zscore_zero_variance_excluded(spark):
    # a constant history then a jump: zero sample variance makes the
    # z-score undefined — the query's n*ss - s*s > 0 guard must drop it
    from pretalx_hub_etl_spark.queries.analytics_q import _ANOMALY_ORACLE  # noqa: F401

    rows = [(i, 1, float(10), f"2024-01-01 00:0{i}:00") for i in range(5)]
    rows.append((5, 1, 999.0, "2024-01-01 00:05:30"))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, value double, ts_s string"
    ).selectExpr(
        "event_id", "user_id", "value", "CAST(ts_s AS TIMESTAMP) AS ts"
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pretalx_hub_etl_spark.functions.core import fixed_cents

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-8, -1)
    )
    c = df.select(
        "event_id", "user_id", fixed_cents(F.col("value")).alias("cents"), "ts"
    )
    stats = c.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("cents").over(w).alias("s"),
        F.sum(F.col("cents") * F.col("cents")).over(w).alias("ss"),
        "cents",
    )
    n, s, ss, cc = F.col("n"), F.col("s"), F.col("ss"), F.col("cents")
    flagged = stats.filter(
        (n >= 4)
        & (n * ss - s * s > 0)
        & ((cc * n - s) * (cc * n - s) * (n - 1) > F.lit(9) * n * (n * ss - s * s))
    )
    # the jump lands on a zero-variance window: excluded, not flagged
    assert flagged.count() == 0


def test_mann_kendall_replay_with_ties(spark):
    from pretalx_hub_etl_spark.queries.analytics_q import q_trend_mann_kendall  # noqa: F401

    # direct replay of the pair-sign sum on a tiny frame with ties
    vals = [10, 20, 20, 15, 30]
    want_s = sum(
        (1 if vals[j] > vals[i] else -1 if vals[j] < vals[i] else 0)
        for i in range(len(vals))
        for j in range(i + 1, len(vals))
    )
    rows = [
        (i, 7, float(v), f"2024-01-01 00:00:0{i}") for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, value double, ts_s string"
    ).selectExpr(
        "event_id", "user_id", "value", "CAST(ts_s AS TIMESTAMP) AS ts"
    )
    df.createOrReplaceTempView("__mk_fixture")
    from pyspark.sql import functions as F

    from pretalx_hub_etl_spark.functions.core import fixed_cents

    win = df.select(
        "user_id", "ts", "event_id", fixed_cents(F.col("value")).alias("cents")
    )
    a, b = win.alias("a"), win.alias("b")
    earlier = (F.col("a.ts") < F.col("b.ts")) | (
        (F.col("a.ts") == F.col("b.ts"))
        & (F.col("a.event_id") < F.col("b.event_id"))
    )
    sgn = (
        F.when(F.col("b.cents") > F.col("a.cents"), 1)
        .when(F.col("b.cents") < F.col("a.cents"), -1)
        .otherwise(0)
    )
    got = (
        a.join(b, (F.col("a.user_id") == F.col("b.user_id")) & earlier)
        .agg(F.sum(sgn).alias("s"))
        .collect()[0]
        .s
    )
    assert got == want_s == 5


def test_banded_key_edges_matches_naive(spark):
    from pretalx_hub_etl_spark.operators.graph import banded_key_edges

    rows = [(k, k % 3) for k in range(0, 400, 7)]  # keys spread over bands
    df = spark.createDataFrame(rows, "k long, g long")
    got = sorted(
        (r.u, r.v)
        for r in banded_key_edges(df, "k", "g", band=50).collect()
    )
    want = sorted(
        (a, b)
        for a, ga in rows
        for b, gb in rows
        if ga == gb and a < b and b - a <= 50
    )
    assert got == want and len(want) > 20
