"""Streaming windowed aggregation + stateful dedup.

The reference has NO stateful streaming (SURVEY T8) — its streams only
append files. These are the capability extensions for event streams at
scale: watermark-bounded tumbling/sliding/session windows and
drop-duplicates-with-state, all on built-in Structured Streaming
operators so state lives in the checkpointed state store (RocksDB on a
real cluster), not in Python.

Every function takes either a streaming or a batch DataFrame — the
plans are identical; batch runs give the exact expected output of the
streaming run after watermark closure (that's how the tests oracle it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Count/sum per (tumbling window, key) with late-data bound.

    NULL-ts rows are dropped explicitly (missing-observation contract,
    uniform across the window family): F.window() silently skips them,
    but a SQL twin's date_trunc would emit a NULL-window group.
    """
    events = events.filter(F.col(ts_col).isNotNull())
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
            "total_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Overlapping windows: each event lands in window/slide buckets.
    NULL-ts rows dropped (same contract as tumbling_window_agg)."""
    events = events.filter(F.col(ts_col).isNotNull())
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window, slide).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), key_col, "n")
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Native session windows (dynamic-length, gap-closed).

    The streaming twin of ``operators.windows.sessionize`` — state-store
    backed, merges sessions across micro-batches.

    NULL-ts rows are dropped explicitly (same missing-observation
    contract as ``sessionize``): Spark's session_window silently skips
    them, but SQL gaps-and-islands twins would fold them into the
    predecessor's session — the filter makes the contract visible and
    engine-independent.
    """
    events = events.filter(F.col(ts_col).isNotNull())
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` bounds state by event time, so the
    state store does not grow forever — the requirement for a 100 TB/day
    stream. Batch frames fall back to plain dropDuplicates (same
    semantics over a bounded input).
    """
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)
