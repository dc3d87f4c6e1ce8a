"""Bucketed-table layout: pre-shuffled joins (SURVEY.md §4.1 scan notes).

At 100 TB, the single biggest join cost is shuffling the fact table every
time it joins on the same key. Bucketing pays that shuffle ONCE at write
time: both tables are hash-partitioned into the same number of buckets on
the join key, so a later equi-join on that key is a zero-exchange
sort-merge join — every bucket pair joins locally. This is the batch
engine's answer to co-located storage; the verification is a plan
assertion (tests/test_plans.py): no ``Exchange`` above the bucketed scans.

Spark specifics encoded here:
- bucketed tables must go through ``saveAsTable`` (bucket metadata lives
  in the catalog, not the parquet footer); an explicit ``path`` keeps the
  data in caller-controlled storage (external table),
- both sides must agree on bucket count (or be integer multiples, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``),
- ``sortBy`` on the bucket key additionally removes the per-task sort
  from the sort-merge join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_by)
    if sort:
        w = w.sortBy(*bucket_by)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join two same-bucketed tables — no exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
