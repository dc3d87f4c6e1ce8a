"""Streaming-shaped windowed operators (SURVEY.md §2.9, ST1-ST4).

The reference is a batch re-sync job with no time windows; these are the
engine's analytics extensions over event-time data. Batch-first: each
operator takes a plain DataFrame and uses the same ``F.window`` /
``F.session_window`` expressions a Structured Streaming query would, so
switching to ``readStream`` + ``withWatermark`` reuses the code path
unchanged (see ``structured.py``).

Scale notes: all three window aggs shuffle on (window, keys) with map-side
partial aggregation; tumbling/sliding windows are pure expressions (no
state), and the session window is Spark's built-in merging-session agg.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts: str,
    width: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Tumbling event-time window aggregation (ST1).

    Output includes ``window_start``/``window_end`` timestamps.
    """
    g = df.groupBy(F.window(F.col(ts), width), *keys)
    out = g.agg(*aggs) if aggs else g.count()
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def sliding_agg(
    df: DataFrame,
    ts: str,
    width: str,
    slide: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Sliding (hopping) event-time window aggregation (ST2)."""
    g = df.groupBy(F.window(F.col(ts), width, slide), *keys)
    out = g.agg(*aggs) if aggs else g.count()
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def session_agg(
    df: DataFrame,
    ts: str,
    gap: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Session-window aggregation (ST3): sessions close after ``gap`` idle.

    ``window_start`` is the first event's timestamp; ``window_end`` is
    last-event + gap (Spark session semantics).
    """
    g = df.groupBy(F.session_window(F.col(ts), gap), *keys)
    out = g.agg(*aggs) if aggs else g.count()
    return out.select(
        F.col("session_window.start").alias("window_start"),
        F.col("session_window.end").alias("window_end"),
        *[c for c in out.columns if c != "session_window"],
    )


def late_filter(df: DataFrame, ts: str, tolerance: str) -> DataFrame:
    """Batch emulation of a watermark's late-data drop (ST4).

    Keeps rows with ``ts >= max(ts) - tolerance``. The max is computed as a
    1-row aggregate broadcast back over the data — two passes over the scan
    but no global shuffle (a window-over-everything would serialize on one
    partition, which dies at scale).
    """
    mx = df.agg(F.max(F.col(ts)).alias("__max_ts"))
    return (
        df.crossJoin(F.broadcast(mx))
        .filter(F.col(ts) >= F.col("__max_ts") - F.expr(f"INTERVAL {tolerance}"))
        .drop("__max_ts")
    )
