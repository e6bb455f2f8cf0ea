"""Window / top-k operators (SURVEY §2.5).

The reference's "sort candidates, take [0]" and "first strategy rank
wins" patterns (scraper_v2.py:1019-1028, 1057-1059) are both
``row_number() == 1`` over a per-group ordering. At scale this is one
shuffle on the group key; no global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k rows per group by the given ordering. Always pass a
    deterministic tiebreaker in ``order_cols`` — at 100 TB a
    nondeterministic top-k is a silent correctness bug across retries."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
    return out if keep_rank else out.drop(rank_col)


def top1_per_group(
    df: DataFrame, group_cols: Sequence[str], order_cols: Sequence[Column]
) -> DataFrame:
    """``candidates.sort(...)[0]`` parity (scraper_v2.py:1057-1059)."""
    return topk_per_group(df, group_cols, order_cols, 1)
