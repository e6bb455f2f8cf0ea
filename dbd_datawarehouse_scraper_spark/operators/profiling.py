"""[EXT] One-pass table profiling — the ANALYZE-style statistics
sweep every warehouse runs before planning work over an unfamiliar
table: per-column null counts, approximate distinct counts, and
min/max, all from ONE aggregate over one scan.

Scale shape: a single ``df.agg(...)`` with 3-4 expressions per column
— every one map-side partial-combinable (count, min, max, HLL++
sketch), so the shuffle is one row of sketches per partition
regardless of table size. The driver-side collect is that one agg row
(O(columns) scalars — a bounded collect by the package's rules), which
is then reshaped into the one-row-per-column report relation.

``approx_count_distinct`` is the HLL++ sketch: its merges are
commutative and associative over hashed values, so the estimate is
deterministic for a fixed dataset regardless of partitioning — safe
for the package's rerun-invariance conventions (the ESTIMATE has
relative error ~``rsd``, the determinism does not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: dtypes whose min/max are meaningful and safely string-renderable
_ORDERED_PREFIXES = (
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "decimal", "string", "date", "timestamp", "boolean",
)


def _orderable(dtype: str) -> bool:
    """True iff min()/max() are supported and meaningful. The prefix
    check alone would let 'interval…' match the 'int' prefix — and
    Spark rejects min() over calendar intervals outright (reviewed),
    so intervals get NULL min/max like the complex types."""
    return dtype.startswith(_ORDERED_PREFIXES) and not dtype.startswith(
        "interval"
    )


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    rsd: float = 0.05,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` in ONE pass.
    Returns one row per column:

    - ``column``, ``dtype``;
    - ``n_rows`` — table row count (same for every row);
    - ``n_nulls`` — NULL count in the column;
    - ``approx_ndv`` — HLL++ distinct estimate (relative std-dev
      ``rsd``); exact at low cardinalities by construction;
    - ``min_value`` / ``max_value`` — stringified min/max for
      orderable atomic types, NULL for complex types (arrays, maps,
      structs, binary — ordering them is rarely meaningful and the
      rendering unbounded).

    The report is tiny (``len(columns)`` rows) and deterministic for
    a fixed input regardless of partitioning."""
    dtypes = dict(df.dtypes)
    if columns is None:
        columns = list(df.columns)
    missing = [c for c in columns if c not in dtypes]
    if missing:
        raise ValueError(f"profile_table: no such columns {missing}")
    if not columns:
        raise ValueError("profile_table: no columns to profile")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(columns):
        aggs.append(F.count(F.col(c)).alias(f"__nn_{i}"))
        aggs.append(
            F.approx_count_distinct(F.col(c), rsd=rsd).alias(f"__ndv_{i}")
        )
        if _orderable(dtypes[c]):
            aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{i}"))
            aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{i}"))
    row = df.agg(*aggs).head()  # ONE row, O(columns) scalars
    out = []
    for i, c in enumerate(columns):
        has_mm = _orderable(dtypes[c])
        out.append(
            (
                c,
                dtypes[c],
                row["__n"],
                row["__n"] - row[f"__nn_{i}"],
                row[f"__ndv_{i}"],
                row[f"__min_{i}"] if has_mm else None,
                row[f"__max_{i}"] if has_mm else None,
            )
        )
    return df.sparkSession.createDataFrame(
        out,
        "column STRING, dtype STRING, n_rows BIGINT, n_nulls BIGINT, "
        "approx_ndv BIGINT, min_value STRING, max_value STRING",
    )
