"""Streaming-shaped declared queries on ``events`` (SURVEY.md ST1-ST4).

Window boundaries are returned as epoch-second BIGINTs on both sides (Spark
``unix_timestamp`` truncates; DuckDB ``floor(epoch(...))`` matches), which
sidesteps ns-vs-µs timestamp hashing differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.core import fixed_cents
from ..streaming import late_filter, session_agg, sliding_agg, tumbling_agg
from . import query


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT)
               AS bucket_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               / 100.0 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    out = tumbling_agg(
        e,
        "ts",
        "1 hour",
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            (F.sum(fixed_cents(F.col("value"))) / F.lit(100.0)).alias("total_value"),
        ],
    )
    return out.select(
        F.unix_timestamp("window_start").cast("long").alias("bucket_start"),
        "event_type",
        "n",
        "total_value",
    )


@query(
    "q_stream_sliding",
    oracle="""
    -- Each event belongs to exactly 4 one-hour windows sliding by 15 min
    -- (epoch-aligned, matching Spark's window() alignment).
    SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900) * 900 - i * 900 AS BIGINT)
               AS window_start_s,
           count(*) AS n,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               / 100.0 AS total_value
    FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i)
    GROUP BY 1
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    out = sliding_agg(
        e,
        "ts",
        "1 hour",
        "15 minutes",
        aggs=[
            F.count(F.lit(1)).alias("n"),
            (F.sum(fixed_cents(F.col("value"))) / F.lit(100.0)).alias("total_value"),
        ],
    )
    return out.select(
        F.unix_timestamp("window_start").cast("long").alias("window_start_s"),
        "n",
        "total_value",
    )


@query(
    "q_stream_session",
    oracle="""
    -- lag-gap-cumsum sessionization (30-minute idle gap per user)
    WITH gapped AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
               -- >= : Spark's session_window is END-EXCLUSIVE ([start,
               -- start+gap)), so a pair exactly gap apart starts a NEW
               -- session; the oracle split must agree at the boundary
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM gapped
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_s,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               / 100.0 AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    out = session_agg(
        e,
        "ts",
        "30 minutes",
        keys=["user_id"],
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(fixed_cents(F.col("value"))) / F.lit(100.0)).alias("total_value"),
        ],
    )
    return out.select(
        "user_id",
        F.unix_timestamp("window_start").cast("long").alias("session_start_s"),
        "n_events",
        "total_value",
    )


@query(
    "q_stream_late_filter",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_s
    FROM events
    WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 3 DAY
    """,
)
def q_stream_late_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    kept = late_filter(e, "ts", "3 DAYS")
    return kept.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("ts_s"),
    )


@query(
    "q_stream_dedup",
    oracle="""
    SELECT user_id, event_type,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS first_ts_s,
           event_id
    FROM (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id
               ) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Batch-deterministic twin of streaming.structured.dedup_stream
    # (dropDuplicatesWithinWatermark keeps the FIRST arrival per key;
    # in batch "first" must be pinned to event time + id or the result
    # is whatever partition wins the race). One shuffle on the dedup key;
    # at scale this is the keep-earliest exact-dedup shape (L1) applied
    # to an event stream.
    from pyspark.sql import Window

    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.unix_timestamp("ts").cast("long").alias("first_ts_s"),
            "event_id",
        )
    )


@query(
    "q_stream_interval_join",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events
    )
    SELECT l.user_id,
           l.event_id AS l_event_id, r.event_id AS r_event_id,
           l.ts AS l_ts, r.ts AS r_ts
    FROM e l JOIN e r
      ON l.user_id = r.user_id
     AND l.event_id % 2 = 0 AND r.event_id % 2 = 1
     AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 10 MINUTE
    """,
)
def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ST8: the stream-stream interval join (impressions⋈clicks) run as a
    # REAL pair of streaming sources through
    # streaming.structured.interval_join_streams into a memory sink —
    # the second driver-gated row for the streaming layer after
    # q_stream_merge_equiv. Each side is ONE file → one microbatch, so
    # the watermark never advances past unseen data and nothing is
    # dropped as late: the streaming answer provably equals the batch
    # range join the oracle runs. (Multi-batch late-drop behavior is
    # exercised separately in tests/test_structured_streaming.py — that
    # semantics is deliberately watermark-dependent and not oracle-able.)
    # At scale: the equi-key+time-range conjunct is what bounds join
    # state (see interval_join_streams docstring).
    import os
    import tempfile
    import uuid

    from ..streaming.structured import (
        fixture_session,
        interval_join_streams,
        run_to_memory,
        stream_from_parquet_dir,
    )

    e = Catalog(spark, sf_dir).events.select("user_id", "event_id", "ts")
    tmp = tempfile.mkdtemp(prefix="phe_ivj_")
    ldir, rdir = os.path.join(tmp, "l"), os.path.join(tmp, "r")
    e.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(ldir)
    e.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(rdir)

    s2 = fixture_session(spark)
    # watermarks require session-tz TIMESTAMP; the parquet roundtrip
    # yields TIMESTAMP_NTZ, so re-cast on the stream side
    left = stream_from_parquet_dir(s2, ldir, e.schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    right = stream_from_parquet_dir(s2, rdir, e.schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    joined = interval_join_streams(
        left,
        right,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        left_watermark="10 minutes",
        right_watermark="10 minutes",
        max_delay="10 minutes",
    )
    name = f"ivj_{uuid.uuid4().hex}"
    run_to_memory(joined, name, output_mode="append")
    import shutil

    # the memory sink holds the result; drop the input copies immediately
    shutil.rmtree(tmp, ignore_errors=True)
    return s2.table(name).select(
        "user_id", "l_event_id", "r_event_id", "l_ts", "r_ts"
    )


@query(
    "q_stream_interval_join_outer",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events
    )
    SELECT l.user_id,
           l.event_id AS l_event_id, r.event_id AS r_event_id,
           l.ts AS l_ts, r.ts AS r_ts
    FROM (SELECT * FROM e WHERE event_id % 2 = 0) l
    LEFT JOIN (SELECT * FROM e WHERE event_id % 2 = 1) r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 10 MINUTE
    """,
)
def q_stream_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ST8b: the stream-stream LEFT OUTER interval join — ST8's inner
    # form answers "which impressions got a click within 10 minutes";
    # the outer form also answers "which did NOT", and that negative is
    # only decidable once BOTH streams' watermarks pass the end of the
    # impression's join window (interval_join_streams docstring). To
    # make the watermark-driven null emission deterministic (and thus
    # batch-oracle-able), the replay appends ONE far-future sentinel
    # batch to each side after the real data: its event time advances
    # the global watermark past every real join window at batch end,
    # and Spark's automatic NO-DATA batch (fired because the watermark
    # moved and state needs cleanup) performs the eviction that emits
    # every remaining unmatched row null-padded — pinned in
    # tests/test_structured_streaming.py, where a closed-window row
    # null-emits from the real data's own watermark with no sentinel
    # at all. The sentinel (user_id -1) matches nothing, outlives the
    # final watermark, and is filtered from the result — so the
    # streaming answer provably equals the batch LEFT JOIN the oracle
    # runs.
    # At scale this sentinel is unnecessary: a live stream's watermark
    # advances on its own; the outer rows simply trail by
    # watermark + max_delay.
    # Fixture-cost control (round-8 review, Next #8 shape): the
    # stateful join runs on an ISOLATED child session (newSession:
    # same JVM/context, own SQLConf) with 8 shuffle partitions — a
    # stream-stream join commits one state store per shuffle partition
    # per side per microbatch, so the session-default 32 partitions
    # are pure fixed overhead at sf0.01 fixture size (at 100 TB the
    # default is right; state partitioning is a per-query sizing knob
    # exactly like this). The sentinel is one pyarrow file write, not
    # a Spark job.
    import datetime
    import os
    import shutil
    import tempfile
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..streaming.structured import (
        fixture_session,
        interval_join_streams,
        stream_from_parquet_dir,
    )

    e = Catalog(spark, sf_dir).events.select("user_id", "event_id", "ts")
    tmp = tempfile.mkdtemp(prefix="phe_ivjo_")
    ldir, rdir = os.path.join(tmp, "l"), os.path.join(tmp, "r")
    e.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(ldir)
    e.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(rdir)

    def write_sentinel(d: str) -> None:
        table = pa.table(
            {
                "user_id": pa.array([-1], pa.int64()),
                "event_id": pa.array([-1], pa.int64()),
                "ts": pa.array(
                    [datetime.datetime(2100, 1, 1)], pa.timestamp("us")
                ),
            }
        )
        pq.write_table(table, os.path.join(d, "part-sentinel.parquet"))

    s2 = fixture_session(spark)
    left = stream_from_parquet_dir(s2, ldir, e.schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    right = stream_from_parquet_dir(s2, rdir, e.schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    joined = interval_join_streams(
        left,
        right,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        left_watermark="10 minutes",
        right_watermark="10 minutes",
        max_delay="10 minutes",
        how="leftOuter",
    )
    name = f"ivjo_{uuid.uuid4().hex}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1: all real data, watermark ~0
        write_sentinel(ldir)
        write_sentinel(rdir)
        # sentinel batch advances the watermark; the trailing NO-DATA
        # batch evicts remaining state and emits the null-padded rows.
        # processAllAvailable alone does NOT guarantee that batch ran
        # (observed flake under a loaded box: 2 rows short) — drain
        # until the memory sink stabilizes.
        from ..streaming.structured import drain_watermark_eviction

        drain_watermark_eviction(q, lambda: s2.table(name).count())
    finally:
        q.stop()
    shutil.rmtree(tmp, ignore_errors=True)
    return (
        s2.table(name)
        .filter(F.col("user_id") >= 0)
        .select("user_id", "l_event_id", "r_event_id", "l_ts", "r_ts")
    )


# --- ST11: dynamic-gap session windows (per-event gap expression) -----------


@query(
    "q_stream_session_dynamic",
    oracle="""
    -- dynamic-gap sessionization: an event opens [ts, ts + gap(event));
    -- overlapping intervals merge. The constant-gap lag test is WRONG
    -- here (a long-gap event can bridge over a short-gap successor's
    -- idle window), so the split is the general interval-merge rule:
    -- new session iff ts >= running max of every PREVIOUS event's end
    -- (>= : Spark session windows are end-exclusive).
    WITH ev AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN event_type = 'purchase' THEN INTERVAL 40 MINUTE
                    ELSE INTERVAL 20 MINUTE END AS gap
        FROM events
    ), marked AS (
        SELECT user_id, ts,
               CASE WHEN max(ts + gap) OVER w IS NULL
                      OR ts >= max(ts + gap) OVER w
                    THEN 1 ELSE 0 END AS new_session
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), sess AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_s,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def q_stream_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ST11: session_window with a PER-EVENT gap expression (purchases
    # hold the session open 40 minutes, everything else 20) — the
    # Spark-4 dynamic-gap surface. The gap must be CalendarIntervalType
    # (make_interval), not the ANSI DayTimeInterval a bare INTERVAL
    # literal produces. Scale shape identical to the constant-gap ST3
    # (one user-keyed shuffle into the session operator); what changes
    # is the SEMANTICS — sessions are general interval merges, so the
    # oracle replays the running-max-of-ends rule, not the lag test.
    e = Catalog(spark, sf_dir).events
    gap = F.when(
        F.col("event_type") == "purchase", F.make_interval(mins=F.lit(40))
    ).otherwise(F.make_interval(mins=F.lit(20)))
    out = (
        e.groupBy(F.session_window(F.col("ts"), gap), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    return out.select(
        "user_id",
        F.unix_timestamp(F.col("session_window.start"))
        .cast("long")
        .alias("session_start_s"),
        "n_events",
    )
