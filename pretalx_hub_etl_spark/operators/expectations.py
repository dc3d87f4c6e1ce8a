"""Declarative data-quality expectations in ONE aggregation pass (the
deequ/Great-Expectations shape, Spark-native).

A check list compiles to a single ``df.agg(...)`` — every numerator
(non-null count, distinct count, predicate-satisfying count) is one
DeclarativeAggregate with map-side partial merge, so N checks cost ONE
corpus scan and a 1-row shuffle regardless of N.  The 1-row result then
explodes into a per-check report frame: ``(check_name, col_name, metric,
threshold, passed)``.

Scale notes: ``unique`` uses ``countDistinct`` — multiple distinct
aggregates in one pass trigger Catalyst's Expand (one duplicated row per
distinct agg); keep the number of ``unique`` checks per suite small, or
split them into a second pass at 100 TB.  Everything else is a plain
sum/count.  The metric is a pinned double division of exact BIGINTs, so
a report row hashes identically on any engine.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str          # e.g. "completeness"
    col_name: str      # column under test (reporting only)
    numerator: Column  # aggregate producing the exact BIGINT numerator
    threshold: float   # passed = metric >= threshold


def completeness(col: str, threshold: float = 1.0) -> Check:
    """Fraction of rows with a non-null value."""
    return Check("completeness", col, F.count(F.col(col)), threshold)


def unique(col: str, threshold: float = 1.0) -> Check:
    """Distinct values / rows (1.0 = the column is a key)."""
    return Check("unique", col, F.countDistinct(F.col(col)), threshold)


def satisfies(
    name: str, col: str, predicate: Column, threshold: float
) -> Check:
    """Fraction of rows satisfying ``predicate`` (NULL counts as fail)."""
    num = F.sum(
        F.when(predicate, F.lit(1)).otherwise(F.lit(0)).cast("long")
    )
    return Check(name, col, num, threshold)


def in_range(col: str, lo: float, hi: float, threshold: float = 1.0) -> Check:
    return satisfies(
        "in_range", col, F.col(col).between(lo, hi), threshold
    )


def in_set(col: str, values: list, threshold: float = 1.0) -> Check:
    return satisfies("in_set", col, F.col(col).isin(values), threshold)


def expectation_report(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run every check in one aggregation pass; one report row each."""
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")] + [
        c.numerator.cast("long").alias(f"__m{i}")
        for i, c in enumerate(checks)
    ]
    row = df.agg(*aggs)
    n = F.col("__n")
    entries = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check_name"),
                F.lit(c.col_name).alias("col_name"),
                (F.col(f"__m{i}").cast("double") / n).alias("metric"),
                F.lit(float(c.threshold)).alias("threshold"),
            )
            for i, c in enumerate(checks)
        ]
    )
    e = row.select(F.explode(entries).alias("r")).select("r.*")
    return e.select(
        "check_name",
        "col_name",
        "metric",
        "threshold",
        (F.col("metric") >= F.col("threshold")).alias("passed"),
    )
