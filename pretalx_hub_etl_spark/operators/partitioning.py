"""Parallelism repair for CPU-heavy per-row operators.

A Parquet scan's task count is driven by input SPLITS
(``spark.sql.files.maxPartitionBytes``, default 128 MB), not by how much
CPU the downstream expressions burn. A few-MB documents table arrives as
ONE split, so shingling / MinHash folds / cosine products — the most
CPU-intensive expressions in the engine — run on one core while the rest
of the cluster idles. The same under-parallelization appears at 100 TB
after a selective filter, a coalesced shuffle read, or a small-dim scan
feeding an expensive projection.

``fan_out`` widens such inputs to cluster parallelism. The guard makes it
a no-op on inputs that are already wide (a 100 TB scan is thousands of
splits) — a blind ``repartition`` THERE would add a full shuffle of the
fact table and become the bottleneck itself. The round-robin shuffle it
does add on narrow inputs moves only the raw rows (cheap) and is repaid
many times over by parallelizing the expensive projection that follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to cluster parallelism if it is narrow.

    ``min_partitions`` defaults to ``sparkContext.defaultParallelism``
    (= total cores). No-op when the input already has at least half that
    many partitions, so wide scans pass through shuffle-free.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 >= target:
        return df
    return df.repartition(target)
