"""Graph operators over edge-list DataFrames.

Connected components (min-label propagation + pointer doubling) lives
with the dedup family (`llm/dedup.py duplicate_clusters`) because its
consumer is near-dup clustering; this module holds the general-purpose
graph shapes. Everything is DataFrame joins over (u, v) edge lists — no
driver-side graph, no GraphX/RDD.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def triangle_enumerate(
    edges: DataFrame, src: str = "u", dst: str = "v"
) -> DataFrame:
    """Every triangle {a, b, c} of an undirected graph, one row each,
    as an ascending (a, b, c) triple.

    The degree-oriented wedge algorithm (the MapReduce classic —
    Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
    Reducer", WWW 2011): orient each edge from its (degree, id)-smaller
    endpoint to the larger, generate wedges only from each vertex's
    OUT-neighbors, and close them against the edge set. Every vertex's
    out-degree is O(√m), so wedge count — the quadratic term a naive
    neighbor self-join leaves unbounded on hub vertices (the "last
    reducer" that kills the naive plan at scale) — is bounded by
    O(m^1.5) total, spread evenly.

    Each triangle has exactly one vertex with out-edges to the other two
    (the unique (degree, id)-minimum), and the wedge (b < c canonical)
    is generated once there — so no post-dedup is needed.

    Shape: normalize + distinct (one shuffle), degree count (map-side
    combined), two broadcasts-or-shuffles on vertex keys for the
    orientation, a wedge self-join on the pivot vertex, and a closing
    join against the normalized edge set.
    """
    u, v = F.col(src), F.col(dst)
    e = (
        edges.select(
            F.least(u, v).alias("u"), F.greatest(u, v).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    e = e.persist()  # feeds degrees, orientation, and the closing join
    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    with_deg = e.join(
        deg.select(F.col("x").alias("u"), F.col("d").alias("du")), "u"
    ).join(deg.select(F.col("x").alias("v"), F.col("d").alias("dv")), "v")
    smaller_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(smaller_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(smaller_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    wedges = (
        oriented.join(
            oriented.select(F.col("a"), F.col("b").alias("c")), "a"
        )
        .filter(F.col("b") < F.col("c"))
    )
    closed = wedges.join(
        e.select(F.col("u").alias("b"), F.col("v").alias("c")), ["b", "c"]
    )
    tri = F.array_sort(F.array("a", "b", "c"))
    return closed.select(
        tri.getItem(0).alias("a"),
        tri.getItem(1).alias("b"),
        tri.getItem(2).alias("c"),
    )


def _fdiv(a: Column, b: Column) -> Column:
    # exact floor division for nonnegative integers: subtracting the
    # remainder makes the numerator exactly divisible, so the double
    # division is exact for any value < 2^53 (no float-rounding floor
    # traps, unlike floor(a/b) at large magnitudes)
    return ((a - F.pmod(a, b)) / b).cast("long")


def pagerank(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    iterations: int = 5,
    scale: int = 1_000_000,
    checkpoint_every: int | None = 2,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list, in exact
    integer arithmetic: ``(vertex, pr)`` with ``pr`` in ``scale`` units.

    The float formulation is summation-order-nondeterministic (partial
    aggregation merges in shuffle order), so a value-hash gate — or any
    two runs on different partitionings — would disagree in the last
    ulps. Integer ranks make every run and every engine bit-identical:

        pr0(v)   = scale
        contrib  = pr(u) // outdeg(u)          (exact floor division)
        pr'(v)   = (15*scale)//100 + (85 * sum(contrib)) // 100

    which is standard damping-0.85 PageRank with deterministic
    truncation (each division loses < 1 unit = 1/scale of rank mass;
    by default dangling vertices leak their mass, as in the uncorrected
    classic formulation). With ``redistribute_dangling=True`` the leak
    is closed: each iteration adds one scalar aggregate over the rank
    vector (sum of rank where the contribution column is NULL — exactly
    the dangling set) and spreads ``dangling_mass // n_vertices`` to
    every vertex inside the damped term:

        pr'(v) = (15*scale)//100
               + (85 * (sum(contrib) + dangling_mass // n)) // 100

    Cost: one extra 1-row aggregation job per iteration, broadcast back
    via a literal-sized cross join — the edge-sized dataflow is
    unchanged, so the scaling exponent is unaffected.

    Shape per iteration: ONE join of the edge list against the rank
    vector on the source key, one map-side-combined sum on the
    destination key, one left join back to the (vertex, out-degree)
    table — all hashing on vertex ids. The rank table carries the
    already-floor-divided contribution ``c = r // d`` computed at rank-
    update time (where the out-degree is in hand anyway), so the loop
    never re-joins the EDGE-sized stream against out-degrees — that was
    a second edge-cardinality join per iteration (round-5 review, Next
    #6); the (vertex ⋈ outdeg) table is iteration-invariant and
    persisted once. On local[32] at sf0.1 this is wall-clock NEUTRAL
    (the out-degree table is tiny there, so the removed join was a
    broadcast); the win is at cluster scale, where a billion-vertex
    out-degree table exceeds any broadcast threshold and the removed
    join would be a second shuffle of the full edge stream per
    iteration. The edge list is persisted once and reused by every
    iteration; iteration count is fixed (no driver-side
    convergence reads). ``checkpoint_every``
    lazily ``localCheckpoint``s the rank vector every N iterations
    (as ``llm.dedup.duplicate_clusters`` does) so plan depth — and with
    it Catalyst/AQE replanning cost — stays constant instead of growing
    per iteration (measured ~15-25% at 5 iterations; essential at
    PageRank-typical 20+). The classic localCheckpoint caveat applies
    on a real cluster: blocks pin to executors unreplicated, so a lost
    executor fails the job — pass ``None`` to disable.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    verts = (
        e.select(F.col("u").alias("x"))
        .union(e.select(F.col("v").alias("x")))
        .distinct()
    )
    outd = e.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    # iteration-invariant (vertex, out-degree) table; d is NULL for
    # dangling vertices, whose contribution column is never consumed
    # (they appear as no edge's source)
    vd = verts.join(outd.withColumnRenamed("u", "x"), "x", "left").persist()
    base = (15 * scale) // 100

    def with_contrib(r: Column) -> list[Column]:
        return [
            F.col("x"),
            r.alias("r"),
            F.when(F.col("d").isNotNull(), _fdiv(r, F.col("d"))).alias("c"),
        ]

    # Vertex count for the dangling share as a driver-side literal: it's
    # one scalar, iteration-invariant, and already bounded (k-means holds
    # k centroids on the driver under the same policy). The previous
    # persisted 1-row DataFrame pinned a cache entry for the session
    # lifetime (round-7 advice) and cost a broadcast per iteration.
    n_verts = int(vd.count()) if redistribute_dangling else 0
    ranks = vd.select(*with_contrib(F.lit(scale).cast("long")))
    for it in range(iterations):
        contribs = (
            e.join(ranks.select(F.col("x").alias("u"), "c"), "u")
            .groupBy("v")
            .agg(F.sum("c").alias("s"))
        )
        joined = vd.join(contribs.withColumnRenamed("v", "x"), "x", "left")
        if redistribute_dangling:
            # dangling set == rows whose contribution column is NULL;
            # one scalar agg, broadcast back as a 1-row cross join
            share = (
                ranks.filter(F.col("c").isNull())
                .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dm"))
                .select(_fdiv(F.col("dm"), F.lit(n_verts)).alias("share"))
            )
            joined = joined.crossJoin(F.broadcast(share))
            new_r = F.lit(base) + _fdiv(
                F.lit(85)
                * (F.coalesce(F.col("s"), F.lit(0)) + F.col("share")),
                F.lit(100),
            )
        else:
            new_r = F.lit(base) + _fdiv(
                F.lit(85) * F.coalesce(F.col("s"), F.lit(0)), F.lit(100)
            )
        ranks = joined.select(*with_contrib(new_r))
        if (
            checkpoint_every
            and (it + 1) % checkpoint_every == 0
            and it + 1 < iterations
        ):
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(F.col("x").alias("vertex"), F.col("r").alias("pr"))


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "u",
    dst: str = "v",
    max_hops: int = 3,
    undirected: bool = True,
    checkpoint_every: int | None = 2,
) -> DataFrame:
    """Multi-source breadth-first search: ``(vertex, hops)`` — the exact
    minimum hop count from the nearest source, for every vertex within
    ``max_hops`` (sources themselves at 0).

    Pregel-style frontier expansion, expressed as DataFrame joins:

        frontier(0) = sources
        frontier(h) = distinct(neighbors(frontier(h-1))) \\ visited
        visited     = union of all frontiers so far, tagged with h

    Per iteration the dataflow is ONE equi-join of the edge list
    against the CURRENT frontier on the source key (shuffle keyed on
    vertex id — at scale this is the frontier-sized probe of a
    hash-partitioned edge table, never an all-vertex scan), one
    ``distinct`` on the candidate set, and one anti-join against the
    visited set to drop already-labelled vertices — the monotone-BFS
    invariant (a vertex's first discovery is at its minimum hop count)
    is what lets min-distance be computed WITHOUT a min-aggregation
    over all paths. Iteration count is fixed (no driver-side
    convergence read); the edge list is persisted once; each frontier
    is persisted for its two consumers (expand + next anti-join) and
    released after; the growing visited set is lazily
    ``localCheckpoint``-ed every ``checkpoint_every`` iterations so
    plan depth stays constant (same policy as :func:`pagerank`).

    ``undirected=True`` symmetrizes the edge list first (one
    union+distinct, done once, inside the same persist).
    """
    u, v = F.col(src), F.col(dst)
    e = edges.select(u.alias("u"), v.alias("v")).filter(
        F.col("u") != F.col("v")
    )
    if undirected:
        e = e.unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
    e = e.distinct().persist()
    dist = (
        sources.select(F.col(sources.columns[0]).alias("x"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("int"))
    )
    frontier = dist.select("x").persist()
    for h in range(1, max_hops + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("x", "u"), "u")
            .select(F.col("v").alias("x"))
            .distinct()
            .join(dist.select("x"), "x", "left_anti")
            .persist()
        )
        dist = dist.unionAll(
            nxt.withColumn("hops", F.lit(h).cast("int"))
        )
        if (
            checkpoint_every
            and h % checkpoint_every == 0
            and h < max_hops
        ):
            dist = dist.localCheckpoint(eager=False)
        frontier.unpersist()
        frontier = nxt
    return dist.select(F.col("x").alias("vertex"), F.col("hops"))


def sssp_rounds(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int,
    src: str = "u",
    dst: str = "v",
    weight: str = "w",
    undirected: bool = True,
) -> DataFrame:
    """Multi-source single-source-shortest-path, ``rounds`` Bellman-Ford
    relaxation rounds: ``(vertex, dist)`` — for every reachable vertex,
    the exact minimum total edge weight over paths of at most
    ``rounds`` edges from the nearest source (sources at 0).

    The weighted sibling of :func:`bfs_hops`: hop-BFS's monotone
    invariant (first discovery == minimum) does NOT hold under weights
    — a later, longer-hop path can be cheaper — so instead of a
    frontier \\ visited anti-join, each round RELAXES every edge out of
    the current tentative-distance table and keeps the per-vertex min:

        dist(0) = sources at 0
        dist(r) = min by vertex over dist(r-1) ∪
                  { (v, d(u) + w(u,v)) : (u,v,w) ∈ E, u ∈ dist(r-1) }

    Per round: one equi-join of the (persisted, vertex-partitioned)
    edge list against the tentative table on the source key, one
    union, one map-side-combined min-groupBy — all shuffles keyed on
    vertex id, never vertex-quadratic. A fixed round count keeps the
    driver out of the convergence decision (the :func:`pagerank`
    policy): round ``r``'s output is exact for the ≤``r``-edge
    horizon, and textbook-complete once ``r`` ≥ the graph's weighted
    diameter in hops. Each round's table is lazily
    ``localCheckpoint``-ed so plan depth stays constant. Weights must
    be non-negative (Bellman-Ford relaxation is still correct with
    negatives, but the bounded-horizon reading of intermediate rounds
    is not); integer weights keep the min exact cross-engine.
    """
    u, v, w = F.col(src), F.col(dst), F.col(weight)
    e = edges.select(u.alias("u"), v.alias("v"), w.alias("w")).filter(
        F.col("u") != F.col("v")
    )
    if undirected:
        e = e.unionAll(
            e.select(
                F.col("v").alias("u"), F.col("u").alias("v"), F.col("w")
            )
        )
    e = e.distinct().persist()
    dist = (
        sources.select(F.col(sources.columns[0]).alias("x"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
    )
    for r in range(1, rounds + 1):
        relaxed = e.join(dist.withColumnRenamed("x", "u"), "u").select(
            F.col("v").alias("x"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("x")
            .agg(F.min("dist").alias("dist"))
        )
        if r < rounds:
            dist = dist.localCheckpoint(eager=False)
    e.unpersist()
    return dist.select(
        F.col("x").alias("vertex"), F.col("dist").cast("long").alias("dist")
    )


def k_core_peel(
    edges: DataFrame,
    k: int,
    rounds: int,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """k-core decomposition by iterative peeling, ``rounds`` rounds:
    ``(vertex, deg)`` — the surviving vertices with their degree in the
    surviving subgraph.

    Each round removes every vertex whose CURRENT degree is below
    ``k`` (Matula & Beck's peeling, the standard graph-cleaning /
    community-core primitive): degrees are one map-side-combined
    count over the live edge set, and the edge set shrinks by two
    semi-joins (both endpoints must survive) — all shuffles keyed on
    vertex id, nothing vertex-quadratic. The edge list is symmetrized
    once up front (each undirected edge stored in both directions, so
    degree == out-degree and one groupBy suffices). A fixed round
    count keeps the driver out of the convergence decision (the
    pagerank policy); peeling is monotone, so round ``r``'s output is
    exact for every graph whose peel sequence stabilizes within ``r``
    rounds, and each extra round costs one agg + two semi-joins over
    the (shrinking) live set. The symmetrized base is persisted once;
    each round's live set is lazily ``localCheckpoint``-ed so plan
    depth stays constant (the :func:`pagerank` policy — no eager
    driver-side action per round).
    """
    u, v = F.col(src), F.col(dst)
    base = edges.select(u.alias("u"), v.alias("v")).filter(
        F.col("u") != F.col("v")
    )
    e = (
        base.unionAll(
            base.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        .distinct()
        .persist()
    )
    live = e
    for _ in range(rounds):
        keep = (
            live.groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= k)
            .select("u")
        )
        live = (
            live.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
    return live.groupBy(F.col("u").alias("vertex")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )


def banded_key_edges(
    df: DataFrame,
    key_col: str,
    group_col: str,
    band: int,
) -> DataFrame:
    """``(u, v)`` pairs within the same ``group_col`` with
    ``0 < v − u ≤ band`` — the banded self-join, built scale-safe.

    A direct self-join on the group key alone (with the band as a
    residual predicate) generates |group|² candidate pairs per group —
    quadratic in group size, exactly the shape that measured ~1.2
    scaling exponents on the graph fixtures at the synthetic sf1
    decade. Bucketizing fixes it (the range_join_bucketed pattern,
    operators/joins.py): bucket keys by ``band``; a partner ``v`` in
    ``(u, u+band]`` can only live in ``u``'s bucket or the next, so
    explode the v-side into {bucket, bucket−1}, equi-join on
    ``(group, bucket)``, and filter the exact band predicate — work is
    linear in true matches per bucket and the shuffle hash-partitions
    on (group, bucket), whose cardinality grows WITH the data (no
    25-key group-only shuffle to skew).
    """
    kb = F.floor(F.col(key_col) / band).cast("long")
    a = df.select(
        F.col(group_col).alias("__g"),
        F.col(key_col).alias("u"),
        kb.alias("__b"),
    )
    b = df.select(
        F.col(group_col).alias("__g"),
        F.col(key_col).alias("v"),
        F.explode(F.array(kb, kb - 1)).alias("__b"),
    )
    return (
        a.join(b, ["__g", "__b"])
        .filter(
            (F.col("v") > F.col("u")) & (F.col("v") - F.col("u") <= band)
        )
        .select("u", "v")
    )
