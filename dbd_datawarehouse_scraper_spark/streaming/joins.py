"""[EXT] Watermarked stream–stream join (SURVEY §2.9 extension).

The reference never joins two live feeds, but a streaming engine's join
surface is incomplete without the interval join Spark supports
natively: two watermarked streams equi-joined on a key with an
event-time proximity bound.

At scale the TIME BOUND is what makes this runnable: both sides buffer
rows in the state store only until the watermark passes the join
range, so state is bounded by (rate × (watermark + tolerance)) per
side. An unbounded stream–stream join (no time condition) buffers
everything forever — never deploy one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    tolerance: str = "10 minutes",
    watermark: str = "30 minutes",
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """Join events from two streams on ``key`` where the right event
    lands within ``[left_ts - tolerance, left_ts]`` — the streaming
    analog of a bounded as-of lookup (enrich each left event with the
    recent matching right event).

    Works identically on batch DataFrames (watermarks are a no-op in
    batch), which is how the equivalence test pins semantics. Outer
    variants require BOTH watermarks so Spark can emit unmatched rows
    once the range is closed.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rt <= lt)
        & (rt >= lt - F.expr(f"INTERVAL {tolerance}"))
    )
    return l.join(r, cond, how)
