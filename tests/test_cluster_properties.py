"""Property test: distributed connected components ≡ union-find reference.

duplicate_clusters runs min-label propagation as Spark joins; the
reference model is a 15-line union-find. On random small graphs both must
produce the identical min-id-per-component labeling — including isolated
nodes, self-loops, chains (where labels must propagate through middle
nodes), and multi-component graphs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pretalx_hub_etl_spark.llm.dedup import duplicate_clusters

N_NODES = 10


def reference_clusters(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {i: i for i in range(N_NODES)}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict[int, int] = {}
    for i in range(N_NODES):
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    return {i: comp_min[find(i)] for i in range(N_NODES)}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=N_NODES - 1),
            st.integers(min_value=0, max_value=N_NODES - 1),
        ),
        max_size=12,
    )
)
def test_clusters_match_union_find(spark, edges):
    docs = spark.createDataFrame([(i,) for i in range(N_NODES)], "doc_id long")
    pairs = spark.createDataFrame(edges, "id_a long, id_b long") if edges else (
        spark.createDataFrame([], "id_a long, id_b long")
    )
    got = {r.id: r.cluster for r in duplicate_clusters(docs, pairs, "doc_id").collect()}
    assert got == reference_clusters(edges)


def test_path_graph_1000_nodes_converges_logarithmically(spark):
    """A planted 1000-node path is the worst case for neighbor-min
    propagation (diameter 999). Pointer doubling must converge it well
    inside the default round budget (simulated bound: 12 rounds; the
    default max_iterations is 20) and label every node with cluster 0 —
    a wrong-but-converged or unconverged run would leave middle nodes
    holding intermediate labels."""
    from pyspark.sql import functions as F

    n = 1000
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    out = duplicate_clusters(nodes, pairs, "doc_id", max_iterations=15)
    rows = out.collect()
    assert len(rows) == n
    assert {r.cluster for r in rows} == {0}
