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


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registry population)."""
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

    return REGISTRY
