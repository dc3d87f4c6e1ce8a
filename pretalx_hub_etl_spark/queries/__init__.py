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

# Names with a green (or rows-only-by-design) row in CORRECTNESS_r01.json.
# The round-1 driver recorded only the FIRST 50 registry entries, so round 2
# enumerates every never-verified query first and pushes these 50 to the back
# (VERDICT.md round 1, "Next round" item 1). Keep this set in sync with the
# union of CORRECTNESS_r{N}.json keys as rounds verify more of the registry.
VERIFIED_PRIOR_ROUNDS: frozenset[str] = frozenset(
    {
        "q_dedup_exact", "q_dedup_near", "q_dedup_ngram_jaccard",
        "q_dedup_clusters", "q_sim_topk", "q_text_termfreq", "q_text_tfidf",
        "q_text_quality", "q_text_tokens", "q_text_fingerprint",
        "q_dedup_simhash", "q_sim_topk_lsh", "q_sim_topk_ivf",
        "q_dedup_embed", "q_sample_stratified", "q_sample_split",
        "q_text_langid", "q_multimodal_join", "q_pipeline_curation",
        "q_reconcile_merge", "q_project_rename", "q_project_literals",
        "q_coalesce_falsy", "q_filter_eq", "q_filter_compound",
        "q_join_broadcast_lookup", "q_join_inner", "q_join_semi",
        "q_join_anti", "q_join_left_firstmatch", "q_agg_count",
        "q_agg_groupby", "q_agg_distinct", "q_agg_rollup", "q_agg_cube",
        "q_agg_approx_distinct", "q_agg_approx_percentile",
        "q_agg_conditional", "q_sort_multi_key", "q_topk", "q_set_union",
        "q_set_intersect", "q_set_except", "q_filter_null_safe",
        "q_join_range", "q_join_asof", "q_udf_pandas", "q_pivot",
        "q_unpivot", "q_agg_grouping_sets",
    }
)


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
    entries), then the already-verified ones in registration order.
    """
    from . import (  # noqa: F401
        llm_q,
        pipeline_q,
        reconcile_q,
        relational,
        relational2,
        scalar_fns,
        sources_sinks,
        stream,
        tpch,
        tpch2,
        window_fns,
    )

    unverified = {
        n: s for n, s in REGISTRY.items() if n not in VERIFIED_PRIOR_ROUNDS
    }
    verified = {n: s for n, s in REGISTRY.items() if n in VERIFIED_PRIOR_ROUNDS}
    return {**unverified, **verified}
