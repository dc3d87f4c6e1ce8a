"""SparkSession factory + engine config baseline.

Config decisions (SURVEY.md §4.3):

- ANSI mode ON: replicates the reference's strict-lookup / crash-on-bad-data
  semantics (Python ``KeyError`` on a missing map key, reference
  ``main.py:120,123``) instead of silently producing NULLs.
- Session timezone pinned UTC: required for DuckDB-oracle parity (DuckDB
  timestamps are naive-UTC).
- AQE ON (+ skew-join handling): at the 100 TB design point, runtime
  re-planning of shuffle partition counts and skewed joins matters more than
  any static tuning we could do here.
- ``spark.sql.legacy.parquet.nanosAsLong``: the ``events`` table stores
  TIMESTAMP(NANOS) which Spark's vectorized parquet reader refuses; reading
  nanos as int64 keeps the native columnar scan (no pyarrow detour) and the
  catalog converts to TimestampType with one cheap projection.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Session-level (runtime-settable) confs. Applied both at build time and
#: defensively onto externally-created sessions (the verify driver builds its
#: own SparkSession; `ensure_engine_conf` upgrades it in place).
RUNTIME_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # answer unfiltered COUNT/MIN/MAX from parquet footer statistics
    # instead of scanning row groups (exact for the types this corpus
    # uses; a no-op for aggregations the pushdown cannot fully cover,
    # e.g. anything with count_distinct or non-partition GROUP BY)
    "spark.sql.parquet.aggregatePushdown": "true",
    # let Python DataSources receive the query's WHERE conjuncts — the
    # lakehouse SQL reader (sources/lakehouse_ds.py) turns them into
    # manifest-level file skipping inside the planner
    "spark.sql.python.filterPushdown.enabled": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "pretalx-hub-etl-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Local-mode defaults come from ``SPARK_GRAFT_CPUS``; on a real cluster the
    caller passes ``master`` and executor sizing via ``extra_conf``. Shuffle
    partitions default to the core count — AQE coalesces from there, which is
    the right shape both at local[32] and (with a larger starting number) at
    1000 executors.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an externally-created session.

    Safe to call repeatedly; silently skips confs the running session refuses
    to change at runtime.
    """
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark
