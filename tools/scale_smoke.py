"""Scale smoke: measure how the heavy-tail headliners GROW, not just how
fast they are at one size (round-5 review, Next #8 — "the 100× design
claims are currently argued from plans, not measured").

Builds a synthetic 10×-sf0.1 corpus ("sf1") in /tmp by replicating the
three tables the heavy tail reads — the official testdata tops out at
sf0.1 and is read-only, so the extra decade is manufactured, with each
replica made DISJOINT so the duplicate/graph/density structure scales
the way a real bigger corpus would instead of degenerating into 10×
copies of itself:

- ``customer``: custkey shifted by i·10⁷ per replica — PageRank's
  same-nation ±100 edge rule can't cross replicas (10⁷ apart), so the
  graph grows as 10 disjoint components (linear edges, like real data);
- ``documents``: doc_id shifted; every TOKEN suffixed ``_i`` and source
  suffixed, so no shingle/gram is shared across replicas — dedup
  candidate structure per replica matches sf0.1's instead of every doc
  gaining 9 planted near-identical twins;
- ``embeddings``: vec_id shifted, first component nudged by i·10⁻⁴ to
  break exact ties.

Then times each query at sf0.01 → sf0.1 → sf1 (min of ``--runs``
noop-write runs, cache cleared between) and reports per-decade scaling
exponents  alpha = log10(t_big / t_small)  — alpha 1.0 = linear, 2.0 =
quadratic. The sf0.01→sf0.1 decade under-reads (fixed JVM/planning
overhead dominates sub-second times); the sf0.1→sf1 decade is the
meaningful one. Caveat noted in-row: ``q_spatial_pairs``'s OUTPUT is
inherently ~quadratic in point density at fixed radius, so its exponent
measures the workload, not a plan defect.

Writes SCALING.json at the repo root; bench.py attaches it to the BENCH
record so the driver's artifact carries the exponents.

Usage: python tools/scale_smoke.py [--runs 2] [--rebuild]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1_DIR = "/tmp/phe_sf1"
BASE = "/root/testdata/sf0.1"
REPLICAS = 10

QUERIES = [
    "q_dedup_clusters",
    "q_graph_pagerank",
    "q_pipeline_curation",
    "q_dedup_ngram_jaccard",
    "q_sim_topk_pq",
    "q_spatial_pairs",
    "q_incremental_agg",
    "q_text_perplexity",
    "q_dedup_substrings",
    "q_dedup_near_md5",
    "q_dedup_substrings_clean",
    "q_kmeans_exact",
    # round-7 heavy additions (round-7 review, Next #4)
    "q_graph_pagerank_sink",
    "q_pipeline_entity_resolution",
    "q_sim_topk_ivf_exact",
    "q_sim_topk_pq_exact",
    "q_dedup_embed_md5",
    "q_stream_tumbling_equiv",
    "q_stream_dedup_equiv",
    "q_stream_session_equiv",
    "q_stream_merge_equiv",
    "q_stream_stateful_totals",
    # round-8 graph additions (customer-derived, so the replica shift
    # gives them a genuine 10x disjoint graph)
    "q_graph_bfs",
    "q_graph_kcore",
    # round-8 final batch + round-9 additions (round-8 review, Next #9):
    # SSSP/bloom ride the disjoint customer graph, SNM the suffixed
    # documents, the robust-stats rows the replicated events (10x
    # history per user under the same per-user window caps)
    "q_graph_sssp",
    "q_join_bloom_prefilter",
    "q_dedup_snm",
    "q_trend_theil_sen",
    "q_ks_two_sample",
    "q_autocorr",
    # round-9 heavy additions (round-9 review, Next #8): kNN graph rides
    # the md5-offset embeddings (genuine 10x vector corpus); the other
    # three ride the replicated events (10x rows per type/user)
    "q_knn_graph",
    "q_stream_chained_agg",
    "q_window_topk_salted",
    "q_agg_weighted_median",
    # round-13 lakehouse lifecycle additions: CTAS, zero-copy CONVERT,
    # ZORDER maintenance, MoR bloom point lookups — commit-protocol
    # bound; their walls should track the fixture write, not the corpus
    "q_sql_ctas",
    "q_sql_convert",
    "q_sql_zorder",
    "q_sink_bloom_mor",
    # round-13 second wave: constraints/generated/copy/txn lifecycles
    # ride the ORDERS table, which build_sf1 copies 1x (not replicated)
    # — the sf0.1->sf1 decade is therefore a fixture artifact for these
    # rows (noted per-row); the 0.01->0.1 decade is the real input
    # decade. Write-path invariant checks are fused into the commit
    # scans (input-linear by design); COPY stages the input as files
    # (listing + load); the view query is read-path filter+agg
    "q_sql_constraints",
    "q_sql_copy_into",
    "q_sql_view",
    "q_sql_generated",
    "q_txn_multi_table",
    "q_sql_show_create",
    "q_sql_analyze_cols",
    "q_stream_txn_fanout",
    # round-10 additions: the lakehouse batch rides the replicated
    # customer/orders tables (commit+manifest cost per version is file-
    # count-bound, data cost input-linear); avro rides supplier; the
    # UDTF rides events; the streaming sources ride orders/customer
    "q_sink_manifest_read",
    "q_sink_time_travel_mor",
    "q_sink_merge_evolve",
    "q_stream_cdc_mor",
    "q_sink_roundtrip_avro",
    "q_fn_udtf_table_arg",
    "q_stream_pyds_parallel",
    # round-11 additions: the SQL surface + DV queries ride the
    # replicated customer/orders tables — per-commit cost is file-count
    # bound, data cost input-linear; the DV read adds one broadcast join
    # of a delete set that grows with the matched rows
    "q_sql_time_travel",
    "q_sink_merge_mor_dv",
    "q_sink_sql_write",
    "q_sql_dml",
    "q_stream_sink_lakehouse",
    "q_sql_restore",
    # round-12 additions: MERGE INTO compiles to the same one-commit
    # MERGE/delta the engine API pays (joins input-linear on the key);
    # TIMESTAMP AS OF adds one manifest walk (commit-count, not
    # data-bound); DDL lifecycle is commit-protocol fixed cost over the
    # replicated customer table
    "q_sql_merge",
    "q_sql_merge_mor",
    "q_sql_time_travel_ts",
    "q_sql_ddl",
    "q_sql_clone",
    "q_sql_table_changes",
    "q_sink_bloom_read",
    "q_stream_source_lakehouse",
    # round-14 additions: all five ride the replicated-1x orders table
    # (fixture note below) — commit-protocol fixed cost + input-linear
    # data jobs; replace_where adds one stats split + partial rewrite
    "q_sql_alter_columns",
    "q_sql_txn",
    "q_sink_replace_where",
    "q_sql_defaults",
    "q_sql_zorder_mor",
    "q_sql_zorder_inc",
    # round-15 additions: all ride the replicated-1x orders/customer
    # tables — file-granular DML is stats-split + partial-rewrite
    # (touched-slice bound), the CDF feed write is one extra diff join
    # per commit and its read is O(changes), MoR OPTIMIZE WHERE
    # rewrites the in-range slice only, widening is metadata-only (the
    # read pays one cast), txn identity adds one re-stage pass over the
    # staged payload
    "q_sql_delete_pruned",
    "q_cdc_cow_feed",
    "q_sql_widen",
    "q_sql_merge_nmbs",
    "q_sql_txn_identity",
    "q_sql_optimize_where_mor",
    "q_stream_cdc_cow",
    "q_pipeline_cdc_replica",
    "q_sql_optimize_where",
    # round-16 additions: same replicated-1x orders fixture — the txn
    # MERGE pays the keyed-delta stage + one publish-time merge, MoR
    # widen pays per-commit era-schema scans (footer reads bounded by
    # chain length), the maintenance-crossing feed adds one ZORDER
    # rewrite to the ST19 lifecycle
    "q_sql_txn_merge",
    "q_sql_widen_mor",
    "q_stream_cdc_optimize",
    "q_stream_cdc_rename",
    "q_sql_optimize_compact",
]

# inherently super-linear OUTPUT at fixed parameters (not a plan defect)
_ORDERS_FIXTURE_NOTE = (
    "rides the orders table, which the synthetic sf1 corpus copies 1x "
    "(only customer/documents/embeddings are replicated) — the "
    "sf0.1->sf1 exponent is a fixture artifact (~0 input growth), not "
    "a scaling measurement; read the 0.01->0.1 decade for this row"
)

WORKLOAD_NOTES = {
    "q_sql_constraints": _ORDERS_FIXTURE_NOTE,
    "q_sql_copy_into": _ORDERS_FIXTURE_NOTE,
    "q_sql_view": _ORDERS_FIXTURE_NOTE,
    "q_sql_generated": _ORDERS_FIXTURE_NOTE,
    "q_txn_multi_table": _ORDERS_FIXTURE_NOTE,
    "q_sql_show_create": _ORDERS_FIXTURE_NOTE,
    "q_sql_analyze_cols": _ORDERS_FIXTURE_NOTE,
    "q_stream_txn_fanout": _ORDERS_FIXTURE_NOTE,
    "q_sql_alter_columns": _ORDERS_FIXTURE_NOTE,
    "q_sql_txn": _ORDERS_FIXTURE_NOTE,
    "q_sink_replace_where": _ORDERS_FIXTURE_NOTE,
    "q_sql_defaults": _ORDERS_FIXTURE_NOTE,
    "q_sql_zorder_mor": _ORDERS_FIXTURE_NOTE,
    "q_sql_zorder_inc": _ORDERS_FIXTURE_NOTE,
    "q_sql_optimize_where": _ORDERS_FIXTURE_NOTE,
    "q_sql_txn_merge": _ORDERS_FIXTURE_NOTE,
    "q_sql_widen_mor": _ORDERS_FIXTURE_NOTE,
    "q_stream_cdc_optimize": _ORDERS_FIXTURE_NOTE,
    "q_stream_cdc_rename": _ORDERS_FIXTURE_NOTE,
    "q_sql_optimize_compact": _ORDERS_FIXTURE_NOTE,
    "q_spatial_pairs": "output grows ~density^2 at fixed radius "
    "(verified: 10x input -> 100.6x output pairs) — an output-linear plan "
    "necessarily shows exponent ~2 here",
    "q_dedup_substrings": "cross-replica grams disjoint; within-replica "
    "duplicate mass grows with corpus",
    "q_dedup_semantic": "workload-quadratic at FIXED n_centroids by "
    "construction: cluster-local pair work is ~n^2/K and this query pins "
    "K=8 for its oracle, so 10x input -> ~100x pair evaluations (wall "
    "grew only 22.6x - per-pair cost fell); the operator's documented "
    "production contract scales K with the corpus to hold per-cluster "
    "membership constant, which restores linearity",
    "q_dedup_embed_md5": "output-bound on this fixture (measured: 10x "
    "input -> 1001x output pairs, 10,333 -> 10,350,090): every base "
    "pair under the 0.3 threshold multiplies across 10x10 replica "
    "combinations and each 10-replica family adds its own 45 pairs; "
    "wall grew only 24.8x, so per-pair cost FELL — the plan is "
    "output-sublinear",
    "q_graph_bfs": "sources are per-nation minima, which all land in "
    "replica 0 of the synthetic corpus — frontier work is constant while "
    "the scan/symmetrize is input-linear, so the exponent under-reads by "
    "design (real 10x corpora grow the source set with the data)",
    "q_knn_graph": "workload-quadratic at FIXED n_bits by construction: "
    "16 buckets/table at n_bits=4, so 10x corpus -> ~10x bucket occupancy "
    "-> ~13x candidate pairs PER ROW (measured, KNN_SCALE.json: 1030 -> "
    "13680); the operator's documented contract scales n_bits with "
    "log2(corpus) — n_bits=7 at 10x returns pairs/row to 2187 and wall "
    "from ~218s to ~62s — which restores ~linearity, exactly the SemDeDup "
    "K-rule situation; the query pins n_bits=4 for its oracle",
}


def build_sf1(rebuild: bool = False) -> None:
    import glob
    import shutil

    import duckdb

    if os.path.isdir(SF1_DIR) and not rebuild:
        if glob.glob(os.path.join(SF1_DIR, "*.parquet")):
            return
    shutil.rmtree(SF1_DIR, ignore_errors=True)
    os.makedirs(SF1_DIR, exist_ok=True)
    con = duckdb.connect()
    rng = f"range({REPLICAS}) t(i)"

    def copy(table: str, select: str | None = None) -> None:
        src = f"read_parquet('{BASE}/{table}.parquet')"
        out = f"{SF1_DIR}/{table}.parquet"
        q = select.format(src=src, rng=rng) if select else f"SELECT * FROM {src}"
        con.sql(f"COPY ({q}) TO '{out}' (FORMAT PARQUET)")

    copy(
        "customer",
        "SELECT c_custkey + i*10000000 AS c_custkey, c_name, c_nationkey,"
        " c_acctbal, c_mktsegment FROM {src}, {rng}",
    )
    copy(
        "documents",
        "SELECT doc_id + i*10000000 AS doc_id,"
        " array_to_string(list_transform(string_split(text, ' '),"
        "   w -> w || '_' || i), ' ') AS text,"
        " lang, source || '_' || CAST(i AS VARCHAR) AS source,"
        " CAST(len(array_to_string(list_transform(string_split(text, ' '),"
        "   w -> w || '_' || i), ' ')) AS BIGINT) AS n_chars"
        " FROM {src}, {rng}",
    )
    copy(
        # every component gets a replica-and-dim-keyed md5-derived offset
        # in [0, 0.1): cross-replica vectors are genuinely distinct, so
        # embedding-similarity structure (LSH buckets, near-dup pairs,
        # centroid geometry) scales like a real 10x corpus instead of 10
        # near-identical shells (round-6 advice — the old first-component
        # +i*1e-4 nudge left replicas ~colinear)
        "embeddings",
        "SELECT vec_id + i*10000000 AS vec_id,"
        " CAST(list_transform(embedding, (x, d) -> CAST(x"
        "   + (CAST(('0x' || substr(md5("
        "        CAST(i AS VARCHAR) || ':' || CAST(d AS VARCHAR) || ':'"
        "        || CAST(vec_id AS VARCHAR)), 1, 6)) AS BIGINT)"
        "      % 1000000) * 0.0000001 AS FLOAT)) AS FLOAT[])"
        "   AS embedding,"
        " label FROM {src}, {rng}",
    )
    for t in ("region", "nation", "part", "supplier", "orders", "lineitem",
              "events"):
        copy(t)
    con.close()


def main() -> None:
    runs = 2
    rebuild = "--rebuild" in sys.argv
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    # --only a,b,c: measure a subset and MERGE its rows into the existing
    # SCALING.json (new heavy queries get exponents without re-paying the
    # full 3-SF sweep for rows that have not changed)
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")

    build_sf1(rebuild)

    from pretalx_hub_etl_spark.queries import load_all
    from pretalx_hub_etl_spark.session import get_spark

    spark = get_spark("scale-smoke")
    registry = load_all()
    sfs = [
        ("sf0.01", "/root/testdata/sf0.01"),
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1(synthetic)", SF1_DIR),
    ]

    def run_once(name: str, sf_dir: str) -> float:
        spark.catalog.clearCache()
        t0 = time.time()
        registry[name].fn(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return time.time() - t0

    out: dict[str, dict] = {}
    for name in (only if only else QUERIES):
        row: dict = {}
        for label, sf_dir in sfs:
            row[label] = round(min(run_once(name, sf_dir) for _ in range(runs)), 3)
        row["exp_001_01"] = round(
            math.log10(max(row["sf0.1"], 1e-3) / max(row["sf0.01"], 1e-3)), 2
        )
        row["exp_01_1"] = round(
            math.log10(
                max(row["sf1(synthetic)"], 1e-3) / max(row["sf0.1"], 1e-3)
            ),
            2,
        )
        if name in WORKLOAD_NOTES:
            row["note"] = WORKLOAD_NOTES[name]
        out[name] = row
        print(name, row, flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.json",
    )
    if only and os.path.exists(path):
        with open(path) as fh:
            prior = json.load(fh).get("queries", {})
        prior.update(out)
        out = prior
    worst = max(
        (r["exp_01_1"], n) for n, r in out.items() if "note" not in r
    )
    doc = {
        "method": "min of %d noop-write runs per point; exponent = "
        "log10(t_big/t_small) per input decade; 1.0=linear 2.0=quadratic; "
        "sf1 is a synthetic 10x replication of sf0.1 with disjoint "
        "replicas (see tools/scale_smoke.py)" % runs,
        "summary": "worst un-noted input exponent %.2f (%s); rows with a "
        "'note' are output-bound workloads where an output-linear plan "
        "necessarily tracks output growth" % worst,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "queries": out,
    }
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
