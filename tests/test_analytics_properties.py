"""Property tests: skyline / spatial join / PageRank vs naive references.

Each new analytics operator runs a non-obvious distributed
decomposition (distributive prune, grid blocking, integer-arithmetic
iteration); the reference model is the 10-line quadratic/driver-side
form. Random small inputs must agree exactly — including duplicate
points, grid-boundary pairs, self-loops, and dangling vertices.
"""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pretalx_hub_etl_spark.operators.graph import pagerank
from pretalx_hub_etl_spark.operators.skyline import skyline_2d
from pretalx_hub_etl_spark.operators.spatial import (
    grid_distance_self_join,
)

_SETTINGS = settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)


@_SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_skyline_property(spark, pts):
    rows = [(float(x), y) for x, y in pts]
    df = spark.createDataFrame(rows, "x double, y int")
    got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
    uniq = set(rows)
    want = sorted(
        p
        for p in uniq
        if not any(
            q[0] <= p[0]
            and q[1] >= p[1]
            and (q[0] < p[0] or q[1] > p[1])
            for q in uniq
        )
    )
    assert got == want


@_SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),
            st.integers(min_value=0, max_value=25),
        ),
        min_size=2,
        max_size=20,
        unique=True,
    ),
    st.integers(min_value=1, max_value=9),
)
def test_grid_join_property(spark, pts, radius):
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = sorted(
        (r.id_a, r.id_b, r.dist2)
        for r in grid_distance_self_join(
            df, "id", "x", "y", radius
        ).collect()
    )
    want = sorted(
        (a[0], b[0], (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2)
        for a, b in itertools.combinations(rows, 2)
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= radius * radius
    )
    assert got == want


@_SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_pagerank_property(spark, edges):
    edges = [(u, v) for u, v in edges if u != v]
    if not edges:
        return
    df = spark.createDataFrame(edges, "u long, v long")
    iters, scale = 3, 1_000_000
    got = {
        r.vertex: r.pr for r in pagerank(df, iterations=iters).collect()
    }
    dedup = sorted(set(edges))
    outd: dict[int, int] = {}
    for u, _ in dedup:
        outd[u] = outd.get(u, 0) + 1
    verts = {x for e in dedup for x in e}
    ranks = {x: scale for x in verts}
    base = (15 * scale) // 100
    for _ in range(iters):
        s = {x: 0 for x in verts}
        for u, v in dedup:
            s[v] += ranks[u] // outd[u]
        ranks = {x: base + (85 * s[x]) // 100 for x in verts}
    assert got == ranks
