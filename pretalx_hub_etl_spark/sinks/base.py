"""Sink interface (S4) — the engine's replacement for the reference's
effectful per-row browser sink.

The reference loads rows by driving a real browser one form-submit at a
time, serial and sleep-throttled (main.py:192-230; ≤0.5 rows/s). The engine
ships a ``Sink`` interface whose implementations are partition-parallel:
``foreachPartition`` gives one writer/session per partition, which is the
idiomatic shape for any effectful target (HTTP API, JDBC, message bus) —
N partitions load concurrently, and per-partition rate limiting replaces the
reference's global sleeps.

No real browser/HTTP sink is shipped (out of scope per SURVEY.md §7); the
parquet sink is the durable path and ``CollectingSink`` is the test mock.
"""

from __future__ import annotations

from typing import Protocol

from pyspark.sql import DataFrame, SparkSession


class Sink(Protocol):
    def write(self, df: DataFrame) -> None: ...


class ParquetSink:
    """Durable columnar sink; ``read_back`` for roundtrip verification."""

    def __init__(self, path: str, mode: str = "overwrite", partition_by: list[str] | None = None):
        self.path = path
        self.mode = mode
        self.partition_by = partition_by or []

    def write(self, df: DataFrame) -> None:
        w = df.write.mode(self.mode)
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(self.path)

    def read_back(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)


class CollectingSink:
    """Test mock: accumulates rows driver-side (small data only).

    Mirrors the reference's observable effect (an ordered list of submitted
    rows) without a browser. Uses ``toLocalIterator`` so only one partition
    is resident at a time.
    """

    def __init__(self) -> None:
        self.rows: list[dict] = []

    def write(self, df: DataFrame) -> None:
        self.rows.extend(r.asDict(recursive=True) for r in df.toLocalIterator())


def two_phase_sink(
    df: DataFrame,
    submit_factory,
    publish_factory,
    auto_publish: bool,
    invalid_col: str = "is_invalid",
) -> None:
    """S6: submit every row, then publish the valid ones if the flag is on.

    The reference's conditional publish side-effect (main.py:251-256: if
    ``AUTO_PUBLISH`` and the form wasn't flagged invalid, click publish) as
    a config-gated SECOND sink pass over the filtered DataFrame. Both
    passes are partition-parallel ``foreachPartition``; the publish pass
    re-filters declaratively instead of branching per row inside the
    writer, so the filter prunes at the scan and the publish writer sees
    only rows it will act on.
    """
    submit_df = df.drop(invalid_col)
    foreach_partition_write(submit_df, submit_factory)
    if auto_publish:
        from pyspark.sql import functions as F

        foreach_partition_write(
            df.filter(~F.col(invalid_col)).drop(invalid_col), publish_factory
        )


def foreach_partition_write(
    df: DataFrame,
    writer_factory,
    rate_limit_rows_per_sec: float | None = None,
):
    """Generic effectful sink: one writer per partition.

    ``writer_factory() -> (write_row: dict -> None, close: () -> None)``;
    the factory runs on the executor (e.g. opens one HTTP session per
    partition — the engine's answer to the reference's single global
    browser session, main.py:171).

    ``rate_limit_rows_per_sec`` throttles each PARTITION's writer with a
    token bucket — the engine's replacement for the reference's global
    fixed sleeps (main.py:179,188,232: ~0.5 rows/s serial). Aggregate
    throughput is limit × partitions, so size the limit to the target's
    per-connection budget; the bucket allows a 1-token burst and then
    paces, and rows that take longer than their token to write cost no
    extra wait (unlike a fixed sleep per row).
    """

    def handle(rows) -> None:
        import time

        write_row, close = writer_factory()
        interval = (
            1.0 / rate_limit_rows_per_sec if rate_limit_rows_per_sec else 0.0
        )
        next_slot = time.monotonic()
        try:
            for row in rows:
                if interval:
                    now = time.monotonic()
                    if now < next_slot:
                        time.sleep(next_slot - now)
                    next_slot = max(now, next_slot) + interval
                write_row(row.asDict(recursive=True))
        finally:
            close()

    df.foreachPartition(handle)


def compact_parquet_dir(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Small-file compaction (S9): rewrite a fragmented parquet directory
    into ``ceil(total_bytes / target_file_bytes)`` right-sized files.

    The 100 TB maintenance op every streaming/incremental sink needs:
    per-microbatch and per-task writes accumulate kilobyte files whose
    open/footer cost comes to dominate scans (a 128 MB scan of 10 000
    files pays 10 000 opens), and whose row groups are too small for
    predicate pushdown to skip anything. This is the OPTIMIZE/rewrite
    shape: size the output from the parquet FOOTER byte totals (no data
    scan), one round-robin shuffle to exactly that many writers, write,
    and hand back the compacted table.

    Row-group sizing rides on ``parquet.block.size`` inside each output
    file; ordering within files is not preserved (parquet table
    semantics are set-oriented — pair with ``operators/layout.py``
    z-ordering when scan locality matters).
    """
    import math

    src = spark.read.parquet(src_path)
    total = _total_input_bytes(spark, src.inputFiles())
    n_out = max(1, math.ceil(total / target_file_bytes))
    src.repartition(n_out).write.mode("overwrite").parquet(dst_path)
    return spark.read.parquet(dst_path)


def _total_input_bytes(spark: SparkSession, files: list[str]) -> int:
    """Sum file sizes through the Hadoop FileSystem API.

    Resolves each URI against the session's Hadoop conf, so sizes come
    back correctly on ANY supported filesystem (file://, hdfs://,
    s3a://...) — a driver-side ``os.path.getsize`` would silently see 0
    bytes for every non-local URI and collapse the compaction to a
    single output file (round-7 advice). Raises when no input size could
    be determined for a non-empty file list: writing ONE arbitrarily
    sized file is worse than failing loudly.
    """
    jvm = spark._jvm
    hadoop_conf = spark._jsc.hadoopConfiguration()
    total = 0
    resolved = 0
    for f in files:
        try:
            path = jvm.org.apache.hadoop.fs.Path(f)
            fs = path.getFileSystem(hadoop_conf)
            total += fs.getFileStatus(path).getLen()
            resolved += 1
        except Exception:
            continue
    if files and not resolved:
        raise OSError(
            f"could not determine the size of any of {len(files)} input "
            "files; refusing to guess an output file count"
        )
    return total
