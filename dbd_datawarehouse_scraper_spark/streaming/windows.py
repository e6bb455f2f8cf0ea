"""Event-time windowed transforms for Structured Streaming (SURVEY §2.9).

The same column expressions work on batch and streaming DataFrames —
these helpers are the engine's streaming-shaped operator surface:
tumbling / sliding / session windows with watermarks for late data,
and streaming dedup with bounded state.

At scale: watermarks bound the state store (without one, a windowed agg
on an unbounded stream grows state forever); session windows merge
per-key state and need the watermark to emit. Shuffle partitioning of
the state store follows ``spark.sql.shuffle.partitions`` at FIRST run
of a checkpointed query and is then fixed — size it for the target
throughput before the first deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window count+sum per key; append-mode compatible."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), key_col)
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n",
            "total",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide), key_col)
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("window.start").alias("window_start"),
            key_col,
            "n",
            "total",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows (gap-based). The batch gaps-and-islands analog is
    queries.session_window_batch_q — same sessions, same counts."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), key_col)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str],
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates arriving
    within the watermark horizon are dropped; older state is evicted."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
