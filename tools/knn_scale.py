"""Scale-proof the kNN graph's hash width (round-10: SCALING.json showed
q_knn_graph at exponent 1.62 per decade with the fixture's n_bits=4).

``q_knn_graph`` pins ``n_bits=4`` (16 buckets/table) for its oracle; the
operator's scale contract is the standard LSH dial: n_bits grows with
log2(corpus) so per-bucket occupancy — and therefore the banded
self-join's candidate pairwork Σ_b occ_b² per table — stays constant per
row. This is the same fixed-parameter-vs-contract situation SemDeDup's
K∝n rule had (SEMDEDUP_SCALE.json); this tool measures it the same way:

- sf0.1,  n_bits=4      — the fixture point;
- sf1(10×), n_bits=4    — the WRONG scaling: 10× occupancy per bucket,
  ~10× candidate pairs PER ROW (~100× total);
- sf1(10×), n_bits=7    — the documented n_bits ≈ 4 + log2(10) rule:
  occupancy and per-row pairwork return to ~the fixture point.

Reported per point: corpus size, wall of the full knn_graph noop write,
candidate pairs, and pairs_per_row — the quantity that must stay O(1)
for corpus-linear total work.

Writes KNN_SCALE.json at the repo root.

Usage: python tools/knn_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_smoke import SF1_DIR, build_sf1  # noqa: E402


def measure(spark, sf_dir: str, n_bits: int) -> dict:
    from pyspark.sql import functions as F

    from pretalx_hub_etl_spark.catalog import Catalog
    from pretalx_hub_etl_spark.llm.similarity import (
        _portable_buckets,
        _probe_dim,
        knn_graph,
    )

    e = Catalog(spark, sf_dir).embeddings
    n = e.count()

    spark.catalog.clearCache()
    t0 = time.time()
    knn_graph(e, k=3, n_bits=n_bits, n_tables=8, portable=True).write.mode(
        "overwrite"
    ).format("noop").save()
    wall = round(time.time() - t0, 3)

    # candidate pairwork = Σ over (table, bucket) of occ·(occ−1): the
    # exact row count the banded self-join feeds the cosine scorer
    dim = _probe_dim(e, "embedding")
    occ = (
        e.select(
            F.posexplode(
                _portable_buckets(F.col("embedding"), dim, n_bits, 8)
            ).alias("table_id", "bucket")
        )
        .groupBy("table_id", "bucket")
        .count()
    )
    pairs = occ.select(
        F.sum(F.col("count") * (F.col("count") - 1)).alias("p")
    ).collect()[0].p
    return {
        "rows": n,
        "n_bits": n_bits,
        "wall_s": wall,
        "candidate_pairs": int(pairs),
        "pairs_per_row": round(pairs / n, 1),
    }


def main() -> None:
    build_sf1()

    from pretalx_hub_etl_spark.session import get_spark

    spark = get_spark("knn-scale")
    out = {
        "method": "pairs = sum over (table,bucket) of occ*(occ-1) — the "
        "exact candidate-join input; pairs_per_row must stay ~flat for "
        "corpus-linear work. n_bits rule: n_bits(n) = n_bits(n0) + "
        "log2(n/n0).",
        "points": {
            "sf0.1_bits4_fixture": measure(
                spark, "/root/testdata/sf0.1", 4
            ),
            "sf1_bits4_antipattern": measure(spark, SF1_DIR, 4),
            "sf1_bits7_contract": measure(spark, SF1_DIR, 7),
        },
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "KNN_SCALE.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["points"], indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
