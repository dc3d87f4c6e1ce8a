"""Declared-query registry (SURVEY.md §2 inventory).

Every operator the engine claims is declared here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) a DuckDB oracle SQL string over the same parquet tables.
``__spark_entry__.py`` re-exports this registry to the verify driver.

Parity rules (SURVEY.md §7 "genuinely hard"):
- every computed column is aliased IDENTICALLY in Spark and oracle SQL;
- computed integers are cast to BIGINT on both sides (DuckDB's sum(int)
  returns HUGEINT, Spark's returns long — pin them);
- money/double aggregates are rounded (2-4 dp) on both sides;
- ``events.ts`` outputs go through ``CAST(ts AS TIMESTAMP)`` in DuckDB
  (ns -> µs) to match Spark's microsecond timestamps.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> rows-only check


REGISTRY: dict[str, QuerySpec] = {}

def _verified_prior_rounds() -> dict[str, int]:
    """Map query name -> the LATEST round whose ``CORRECTNESS_r*.json``
    artifact has a green (or rows-only-by-design) row for it.

    The per-round driver records only the first ~50 registry entries, so
    :func:`load_all` enumerates never-verified queries FIRST and then the
    verified ones ordered oldest-verification-round first (VERDICT.md
    round 3, "Next round" item 1): code drifts between rounds, so the
    stalest green rows are the ones most worth re-checking. Derived at
    import time from the artifacts themselves so the set can never go
    stale (round-2 ADVICE). A query that errored (``err`` other than
    ``no_oracle``) is NOT counted verified — it re-enumerates first.
    """
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    last_round: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            if row.get("hash_match") or err == "no_oracle":
                last_round[name] = max(rnd, last_round.get(name, 0))
    return last_round


#: Queries whose BODY or ORACLE changed since their last green driver row
#: (green then ≠ green now). Subtracting them from the verified map makes
#: load_all() enumerate them with the never-verified group, so the
#: driver's 50-query sample re-checks them THIS round instead of whenever
#: their old round goes stale. Maintain by hand when editing a
#: previously-verified query; clear entries once a newer CORRECTNESS
#: artifact shows them green again (the artifact scan then re-ranks them
#: automatically).
FORCE_REVERIFY: set[str] = {
    # (r06 entries cleared: CORRECTNESS_r06.json shows them green, so the
    # artifact scan ranks them automatically again.)
    "q_kmeans_exact",         # r07: eager-checkpoint + unpersist refactor
    "q_sim_topk_ivf_exact",   # r07: same kmeans.py refactor
    "q_agg_global_quantiles_cont",  # r07: filter-before-project fix
    "q_stream_dedup_equiv",   # r07: one-split-per-file assertion added
    "q_pipeline_curation",    # r07: fan_out(by=doc_id) stage partitioning
    "q_sim_topk_pq_exact",    # r09: witness geometry m=4 x 8 codes
    "q_stream_mor_equiv",     # r09: 4 delta commits + fixture session
    "q_stream_stateful_totals_tws",  # r09: 2 microbatches + fixture session
    "q_stream_topn_tws",      # r09: 2 microbatches + fixture session
    "q_stream_mapstate_tws",  # r09: 2 microbatches + fixture session
    # r09: streaming fixtures moved onto an isolated child session with
    # 8 shuffle partitions (state stores per microbatch), see
    # streaming/structured.py:fixture_session
    "q_stream_merge_equiv",
    "q_stream_stateful_totals",
    "q_stream_dedup_equiv",
    "q_stream_tumbling_equiv",
    "q_stream_session_equiv",
    "q_stream_interval_join",
    "q_stream_pyds",
    # r10: manifest/commit-log layer under the versioned tables
    # (sinks/manifest.py) — every sink-backed query re-verifies
    "q_sink_merge_upsert",
    "q_sink_time_travel",
    "q_sink_vacuum",
    "q_sink_merge_mor",
    "q_cdc_mor_feed",
    "q_cdc_version_diff",
    "q_stream_mor_equiv",
    # r10 ADVICE fixes
    "q_autocorr",
    "q_window_topk_salted",
    "q_stream_available_now",
    # r10 parity-tail trim: fixture_session 8->4 state partitions,
    # q_stream_pyds 4->3 pages — every fixture-session streaming query
    # re-verifies
    "q_stream_chained_agg",
    "q_stream_timer_tws",
    "q_stream_state_reader",
    "q_stream_interval_join_outer",
    # r12: catalog CoW reads default to the native manifest-file-list
    # parquet scan (Python-DS scan-collapse fix); committed_at stamps in
    # every manifest; q_sql_dml re-registers via register_path — every
    # catalog-read query re-verifies
    "q_sql_time_travel",
    "q_sql_restore",
    "q_sql_dml",
    "q_sink_sql_write",
    "q_stream_sink_lakehouse",
    "q_sink_manifest_read",
    # r12: watermark-eviction drain added to the sentinel fixtures (a
    # rare under-load flake: processAllAvailable returning before the
    # no-data batch emitted outer/timer rows)
    "q_stream_interval_join_outer",
    "q_stream_timer_tws",
    "q_stream_chained_agg",
    # r12: PQ witness per-subspace training coalesce
    "q_sim_topk_pq_exact",
    "q_sim_topk_pq",
    # r16: final-frame self-oracle restructure of the driver-red pair —
    # MUST be in this round's driver sample for the experiment to decide
    "q_sql_view",
    "q_sql_alter_columns",
}

VERIFIED_PRIOR_ROUNDS: dict[str, int] = {
    n: r for n, r in _verified_prior_rounds().items()
    if n not in FORCE_REVERIFY
}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registry population).

    The returned dict enumerates queries that have never appeared in a
    driver CORRECTNESS artifact FIRST (the round-1 driver stopped after 50
    entries), then the already-verified ones ordered by the round they
    were last verified in, oldest first (ties keep registration order) —
    so each round's 50-query sample re-checks the stalest green rows.
    """
    from . import (  # noqa: F401
        analytics_q,
        analytics_q2,
        curation_q,
        curation_q2,
        lakehouse_q,
        lakehouse_q2,
        lakehouse_q3,
        llm_q,
        llm_q2,
        llm_q3,
        llm_q4,
        modern_q,
        modern_q2,
        pipeline_q,
        reconcile_q,
        relational,
        relational2,
        relational3,
        scale_q,
        scalar_fns,
        sources_sinks,
        sql_q,
        stream,
        tpch,
        tpch2,
        tpch3,
        tpch4,
        window_fns,
    )

    unverified = {
        n: s for n, s in REGISTRY.items() if n not in VERIFIED_PRIOR_ROUNDS
    }
    order = {n: i for i, n in enumerate(REGISTRY)}
    verified = {
        n: REGISTRY[n]
        for n in sorted(
            (n for n in REGISTRY if n in VERIFIED_PRIOR_ROUNDS),
            key=lambda n: (VERIFIED_PRIOR_ROUNDS[n], order[n]),
        )
    }
    return {**unverified, **verified}
