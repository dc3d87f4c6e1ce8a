"""Scale-proof SemDeDup's centroid count (round-8 review, Next #4).

``q_dedup_semantic``'s fixture pins ``n_centroids=8``; the operator's
docstring pins the SCALE rule instead: K grows with the corpus so
per-cluster membership (and thus the cluster-local pair join's work,
Σ_k n_k² over clusters) stays roughly constant per row. This tool
MEASURES that rule at the synthetic 10× corpus (scale_smoke's sf1
replication, disjoint-by-construction embeddings):

- sf0.1, K=8           — the fixture point;
- sf1 (10×), K=8       — the WRONG scaling (K held fixed): per-cluster
  membership grows ~10×, pair work per row grows ~10×;
- sf1 (10×), K=80      — the documented K∝n rule: per-cluster
  membership and pair work per row stay ~flat vs the fixture point.

Reported per point: corpus size, wall time of the full semantic_dedup
noop write, per-cluster membership max/mean (the reducer spread of the
cluster-keyed shuffle), and pairwork_per_row = Σ n_k² / n — the
quantity that must stay O(1) for corpus-linear total work.

Writes SEMDEDUP_SCALE.json at the repo root.

Usage: python tools/semdedup_scale.py [--iterations 3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_smoke import SF1_DIR, build_sf1  # noqa: E402


def measure(spark, sf_dir: str, k: int, iterations: int) -> dict:
    from pyspark.sql import functions as F

    from pretalx_hub_etl_spark.catalog import Catalog
    from pretalx_hub_etl_spark.llm.kmeans import kmeans_exact
    from pretalx_hub_etl_spark.llm.semdedup import semantic_dedup

    e = Catalog(spark, sf_dir).embeddings
    n = e.count()

    spark.catalog.clearCache()
    t0 = time.time()
    semantic_dedup(
        e, cosine_threshold=0.5, n_centroids=k, iterations=iterations
    ).write.mode("overwrite").format("noop").save()
    wall = round(time.time() - t0, 3)

    sizes = (
        kmeans_exact(e, "embedding", "vec_id", k=k, iterations=iterations)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_k"))
        .agg(
            F.count(F.lit(1)).alias("clusters_nonempty"),
            F.max("n_k").alias("max_members"),
            F.avg("n_k").alias("mean_members"),
            F.sum(F.col("n_k") * F.col("n_k")).alias("pair_work"),
        )
        .collect()[0]
    )
    return {
        "sf_dir": sf_dir,
        "k": k,
        "corpus_rows": n,
        "wall_sec": wall,
        "clusters_nonempty": sizes.clusters_nonempty,
        "max_cluster_members": sizes.max_members,
        "mean_cluster_members": round(sizes.mean_members, 1),
        # Σ n_k² / n: per-row pair-join work — must stay ~O(1) under
        # the K∝n rule for the total to stay corpus-linear
        "pairwork_per_row": round(sizes.pair_work / n, 1),
    }


def main() -> None:
    iterations = 3
    if "--iterations" in sys.argv:
        iterations = int(sys.argv[sys.argv.index("--iterations") + 1])

    build_sf1()

    from pretalx_hub_etl_spark.session import get_spark

    spark = get_spark("semdedup_scale")
    base = "/root/testdata/sf0.1"
    points = [
        ("fixture", measure(spark, base, 8, iterations)),
        ("10x_fixed_K(anti-pattern)", measure(spark, SF1_DIR, 8, iterations)),
        ("10x_scaled_K(documented rule)",
         measure(spark, SF1_DIR, 80, iterations)),
    ]
    fixture, fixed, scaled = (p[1] for p in points)
    out = {
        "method": (
            "semantic_dedup wall (noop write) + kmeans cluster-size "
            "stats at sf0.1 (K=8) vs synthetic 10x sf1 with K fixed at "
            "8 (anti-pattern) and K scaled to 80 (the docstring's K∝n "
            "rule); pairwork_per_row = sum(n_k^2)/n must stay ~flat "
            "under the rule"
        ),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "points": dict(points),
        "summary": {
            "pairwork_per_row_growth_fixed_K": round(
                fixed["pairwork_per_row"] / fixture["pairwork_per_row"], 2
            ),
            "pairwork_per_row_growth_scaled_K": round(
                scaled["pairwork_per_row"] / fixture["pairwork_per_row"], 2
            ),
            "max_reducer_growth_fixed_K": round(
                fixed["max_cluster_members"]
                / fixture["max_cluster_members"], 2
            ),
            "max_reducer_growth_scaled_K": round(
                scaled["max_cluster_members"]
                / fixture["max_cluster_members"], 2
            ),
        },
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SEMDEDUP_SCALE.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["summary"], indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
