"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All declared queries live in ``pretalx_hub_etl_spark.queries`` (one module
per SURVEY.md §2 operator family); this file just re-exports the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pretalx_hub_etl_spark.queries import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q_reconcile_merge, SURVEY.md ST5) on sf0.001."""
    registry = load_all()
    return registry["q_reconcile_merge"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted -> rows-only check)."""
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }


def declared_checks() -> dict[str, str]:
    """Per-query DECLARED check level: ``"oracle"`` (full row-count +
    schema + value-hash vs the DuckDB oracle) or ``"rows_only"`` (no
    oracle BY DESIGN — float-internal/approximate operators, each
    covered by an oracled exact/md5 witness twin or an inline error
    envelope). Lets the driver's CORRECTNESS artifact distinguish
    "rows-only by declaration" from "oracle missing/broken": a
    rows-only query with matching rows is a PASS, not an err."""
    return {
        name: "oracle" if spec.oracle is not None else "rows_only"
        for name, spec in load_all().items()
    }
