"""Structured Streaming variants of the windowed operators (SURVEY.md §2.9).

The batch operators in ``windows.py`` use the same ``F.window`` /
``F.session_window`` expressions; these helpers wire them into a streaming
query: ``readStream`` source -> watermark -> windowed agg -> sink. The
planned streaming job at scale reads Kafka/file sources; tests drive the
same code path with a file source + memory sink synchronously
(``processAllAvailable``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def fixture_session(
    spark: SparkSession, shuffle_partitions: int = 4
) -> SparkSession:
    """Isolated child session for small bounded streaming fixtures.

    A stateful streaming operator commits one state store per shuffle
    partition (per side, for joins) per microbatch, so the engine's
    session default (`cpus` partitions — right for the 100 TB design
    point) is pure fixed overhead on a replay fixture of a few thousand
    rows. 4 partitions (round-10, down from 8 — the parity-tail trim,
    VERDICT r9 item 7): every fixture oracle is partition-count
    independent by construction, so this is purely a state-store-count
    knob. ``newSession`` shares the JVM/SparkContext but owns its
    SQLConf, so the fixture can size its state partitioning without
    leaking the setting into concurrently-planned queries (the parity
    sweep runs threaded). ``ensure_engine_conf`` re-applies the engine
    baseline (UTC, ANSI, nanos) to the fresh conf."""
    from ..session import ensure_engine_conf

    s2 = ensure_engine_conf(spark.newSession())
    s2.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return s2


def stream_from_parquet_dir(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based streaming source (one-file-per-microbatch semantics).

    ``max_files_per_trigger`` bounds each microbatch to that many files —
    set it to 1 to force one-batch-per-file replay (the deterministic
    multi-batch shape the batch≡streaming equivalence query relies on).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_counts_stream(
    events: DataFrame,
    ts: str,
    width: str,
    watermark: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Watermarked tumbling-window aggregation (ST1 + ST4, streaming form).

    The watermark bounds state: windows older than max(event time) -
    watermark are finalized and dropped — the streaming equivalent of the
    batch ``late_filter``.
    """
    g = events.withWatermark(ts, watermark).groupBy(F.window(F.col(ts), width), *keys)
    out = g.agg(*aggs) if aggs else g.count()
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def sessionized_stream(
    events: DataFrame,
    ts: str,
    gap: str,
    watermark: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Watermarked session-window aggregation (ST3, streaming form)."""
    g = events.withWatermark(ts, watermark).groupBy(
        F.session_window(F.col(ts), gap), *keys
    )
    out = g.agg(*aggs) if aggs else g.count()
    return out.select(
        F.col("session_window.start").alias("window_start"),
        F.col("session_window.end").alias("window_end"),
        *[c for c in out.columns if c != "session_window"],
    )


def dedup_stream(
    events: DataFrame,
    keys: Sequence[str],
    ts: str,
    watermark: str,
) -> DataFrame:
    """Streaming exact dedup (L1, streaming form).

    ``dropDuplicatesWithinWatermark``: keeps the first row per key and
    drops re-arrivals within the watermark horizon. Unlike plain
    ``dropDuplicates`` on a stream (whose state grows forever), state here
    is bounded — keys older than the watermark are evicted, which is the
    only shape that survives an unbounded 100 TB/day stream. Exactly-once
    dedup beyond the horizon belongs to the sink's idempotency key.
    """
    return events.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    left_watermark: str,
    right_watermark: str,
    max_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join (the impressions⋈clicks shape).

    Equi-join on ``key`` plus the interval constraint
    ``left_ts <= right_ts <= left_ts + max_delay``. BOTH watermarks plus
    the time-range conjunct are what make unbounded-stream state finite:
    the range tells Spark how long a buffered left row can still match
    (``max_delay`` past its event time) and the watermarks bound how late
    either side may arrive — buffered state older than
    ``watermark + max_delay`` is evicted. An equi-join without the time
    bound would buffer both streams forever.

    ``how``: ``inner`` (default) or the watermark-gated outer forms
    (``leftOuter``/``rightOuter``/``fullOuter``). Outer semantics are
    watermark-DRIVEN, not just watermark-bounded: an unmatched buffered
    row produces its null-padded result only when the global watermark
    (the MIN across both sides) passes the end of its join window and
    the row is evicted from state — so outer rows trail the data that
    proves them unmatched by up to watermark + max_delay, and a stream
    whose watermark never advances past a row's window never emits its
    null form at all. That late-unmatched contract is exactly the CDC
    enrichment case: "orders with no matching click within 10 minutes"
    is only decidable once both streams have moved 10 minutes past the
    order.

    Columns are prefixed ``l_``/``r_`` (except the shared key) so the
    joined schema is collision-free.
    """
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    lsel = lw.select(
        F.col(key),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c != key],
    )
    rsel = rw.select(
        F.col(key).alias("__rkey"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != key],
    )
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (F.col(f"r_{right_ts}") >= F.col(f"l_{left_ts}"))
        & (
            F.col(f"r_{right_ts}")
            <= F.col(f"l_{left_ts}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    return lsel.join(rsel, cond, how).drop("__rkey")


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: each microbatch ⋈ a broadcast dim.

    The "attach user attributes to the event stream" pattern. The static
    side's plan is re-executed per microbatch, but for file-based dims
    Spark caches the resolved FileIndex with the plan: files added to the
    dim directory AFTER this DataFrame was created are NOT discovered —
    refreshing the dim requires re-creating the static DataFrame and
    restarting the query. The dim is explicitly ``broadcast`` — a stream-static
    join must never shuffle the stream side on the key, or every trigger
    pays a full exchange; with the dim broadcast the stream partitioning
    is untouched and the join is stateless (no watermark needed, unlike
    stream-stream joins). ``how``: "left" keeps unmatched events with
    null attributes; "inner" drops them; left_semi/left_anti filter
    without widening (the streaming-supported subset for a static right
    side).
    """
    if how not in ("left", "inner", "left_semi", "left_anti"):
        raise ValueError(f"unsupported stream-static join type {how!r}")
    return stream.join(F.broadcast(dim), key, how)


def drain_watermark_eviction(q, count_fn, timeout_s: float = 30.0) -> int:
    """Wait until watermark-driven NO-DATA batches have finished
    emitting. ``processAllAvailable`` only guarantees the DATA is
    consumed; the extra batch Spark schedules when a watermark movement
    requires state eviction (the one that emits outer-join null rows /
    fires expired timers) can still be pending when it returns — under
    a loaded box, stopping the query there silently loses those rows
    (observed once in ~10 concurrent parity sweeps: an outer interval
    join returned 4998/5000 rows). Deterministic fix: re-enter
    processAllAvailable and poll ``count_fn()`` until two consecutive
    rounds agree — eviction output is finite (bounded by state), so
    stability IS completion. Returns the stable count."""
    import time

    deadline = time.monotonic() + timeout_s
    prev = -1
    while True:
        q.processAllAvailable()
        cur = count_fn()
        if cur == prev:
            return cur
        prev = cur
        if time.monotonic() > deadline:
            return cur  # bounded: callers' oracles catch a real loss
        time.sleep(0.2)


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming DataFrame to completion into an in-memory table.

    Synchronous (``processAllAvailable``): for tests and bounded backfills.
    Returns the StreamingQuery (already stopped); read results from
    ``spark.sql(f"SELECT * FROM {name}")``.
    """
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


def merge_stream_into(
    stream_df: DataFrame,
    sink,  # sinks.merge.MergeSink
    name: str,
    order_by: str | None = None,
):
    """Incremental MERGE sink: each microbatch upserts into a versioned
    parquet table via ``foreachBatch`` (the pattern for maintaining a
    queryable "current state" table off an unbounded stream — the
    streaming form of the reference's re-sync loop, which recomputes the
    same state by re-running, README.md:170-173).

    ``MergeSink.merge`` requires at most one row per key, but a microbatch
    routinely carries several updates for the same key (bursty sources,
    ``maxFilesPerTrigger > 1``) — feeding those straight in would multiply
    rows through the full-outer join and durably corrupt the state table
    (round-3 ADVICE item 2). Each batch is therefore deduped per key
    first: keep-LAST by ``order_by`` descending (ties and the no-column
    case fall back to arbitrary-but-single via ``row_number``), which is
    the source-wins "latest update applies" contract.

    foreachBatch gives exactly-once per-batch semantics against the
    versioned table: a replayed batch re-merges idempotently because the
    merge is keyed (source-wins on the same keys). Returns the started
    StreamingQuery; callers drive it with ``processAllAvailable``.
    """
    from pyspark.sql.window import Window

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ordering = (
            F.col(order_by).desc_nulls_last()
            if order_by
            else F.monotonically_increasing_id().desc()
        )
        w = Window.partitionBy(sink.key).orderBy(ordering)
        deduped = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        sink.merge(batch_df.sparkSession, deduped)

    return (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(apply_batch)
        .queryName(name)
        .start()
    )
