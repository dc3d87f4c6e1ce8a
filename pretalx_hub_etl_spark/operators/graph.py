"""Graph operators over edge-list DataFrames.

Connected components (min-label propagation + pointer doubling) lives
with the dedup family (`llm/dedup.py duplicate_clusters`) because its
consumer is near-dup clustering; this module holds the general-purpose
graph shapes. Everything is DataFrame joins over (u, v) edge lists — no
driver-side graph, no GraphX/RDD.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
