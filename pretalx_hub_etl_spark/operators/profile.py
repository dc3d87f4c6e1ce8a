"""Single-pass column profiling (data-quality summary per column).

The "what is in this table" primitive every ingestion pipeline runs before
trusting 100 TB of parquet: per column — row count, null count, exact
distinct count, min and max. The whole profile is ONE aggregate pass over
the scan: every metric for every requested column is computed in a single
``agg`` (map-side partial aggregation, one tiny shuffle of per-partition
partials), then pivoted to one row per column with ``stack``. Never one
job per column, never a driver-side loop.

Exact ``count_distinct`` over C columns in one pass uses Spark's expand
(C× row multiplication before the agg) — the honest cost of exactness.
For 100 TB interactive profiling swap ``exact_distinct=False`` to HLL
``approx_count_distinct`` which keeps the pass expand-free; the switch
changes only that metric's expression, not the plan shape.

Min/max are rendered to strings so mixed column types fit one output
schema; numeric formatting is plain ``CAST(x AS STRING)`` which DuckDB
reproduces for integers and exact decimals (the oracle-checked cases).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """One row per column: (column, n_rows, n_null, n_distinct, min, max).

    ``n_distinct`` counts non-null distinct values (SQL ``COUNT(DISTINCT
    c)`` semantics). Output ordered by the requested column order via an
    explicit ``ord`` column (the stack output has no inherent order).
    """
    cols = cols or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise KeyError(f"unknown columns {missing}; have {df.columns}")

    distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"),
            distinct(c).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)

    # stack(n, lit(name), ord, null, nd, min, max, ...) -> row per column
    stack_args: list[F.Column] = []
    for i, c in enumerate(cols):
        stack_args += [
            F.lit(c),
            F.lit(i).cast("long"),
            F.col(f"__null_{c}"),
            F.col(f"__nd_{c}"),
            F.col(f"__min_{c}"),
            F.col(f"__max_{c}"),
        ]
    return (
        one.select(
            F.col("__rows").alias("n_rows"),
            F.stack(F.lit(len(cols)), *stack_args).alias(
                "column", "ord", "n_null", "n_distinct", "min_val", "max_val"
            ),
        )
        .select(
            "column",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_null").cast("long").alias("n_null"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            "min_val",
            "max_val",
            "ord",
        )
        .orderBy("ord")
        .drop("ord")
    )
