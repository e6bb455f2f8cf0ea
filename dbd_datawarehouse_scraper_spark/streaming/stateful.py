"""Custom stateful streaming operators via ``applyInPandasWithState``.

The engine's arbitrary-stateful surface (SURVEY §2.9): per-key state
that outlives micro-batches, with explicit state schemas so the state
store stays compact and typed. The example operator here is a per-key
running profile (count + sum + last-seen), the shape a dedup cursor,
rate limiter, or incremental aggregation all share.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_total", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("batch_rows", T.LongType()),
    ]
)

RUNNING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)


def _update_running(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, s = state.get if state.exists else (0, 0.0)
    batch_rows = 0
    for pdf in pdfs:
        batch_rows += len(pdf)
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_total": n, "sum_value": s, "batch_rows": batch_rows}]
    )


def stateful_running_counts(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running count+sum across micro-batches. One output row
    per key per batch; state is two scalars per key (bounded by key
    cardinality, not stream length)."""
    return events.groupBy(key_col).applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
