"""[EXT] Data-layout optimization for parquet at scale: range-sorted
and Z-ordered writes, so multi-dimensional filters prune ROW GROUPS
instead of scanning everything.

At 100 TB the scan is the query: parquet readers skip a row group when
its column min/max statistics exclude the filter, but statistics only
exclude anything if the data is LAID OUT so each row group covers a
narrow value range. A shuffled table has every row group spanning
nearly the full domain of every column — statistics prune nothing.

- ``sorted_write``: linear layout — repartitionByRange + in-partition
  sort on the given columns, then write. Optimal for one leading
  column (and prefixes); a filter on a non-leading column prunes
  nothing.
- ``zorder_key`` / ``zorder_write``: interleave the bits of N
  quantized columns into one BIGINT sort key (Morton / Z-order
  curve). Sorting by the key makes every row group cover a small
  HYPER-RECTANGLE of the combined domain, so single-column and
  conjunctive range filters on ANY of the participating columns
  prune — the standard multi-dimensional clustering recipe
  (Delta/Iceberg OPTIMIZE ZORDER does the same thing server-side).

Everything is pure built-in expressions. The only driver-side data is
the per-column (min, max) pair used for quantization — 2N scalars from
one aggregate (a bounded collect by the package's rules). The
quantization domain is recorded nowhere: Z-order affects LAYOUT only,
values are written unchanged, so readers need no metadata and a
re-layout with different bounds is always safe.

Scale notes: ``repartitionByRange`` samples the sort key to build
balanced range boundaries — one extra pass, the same cost profile as
``pack_shards``'s range exchange. Writes preserve the in-partition
sort through the final projection (column drop is narrow). Pruning
effectiveness is pinned in tests/test_layout.py by reading the files'
actual row-group statistics with pyarrow and measuring the fraction of
row groups a rectangle filter would touch — Z-ordered layout must
touch a small fraction where the shuffled layout touches ~all.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into [0, 2**bits) as a LONG. Degenerate
    domains (lo == hi) and NULLs land in bucket 0 — layout-only, so
    correctness is unaffected."""
    levels = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    q = F.floor(scaled * F.lit(float(levels)))
    return F.coalesce(
        F.least(F.greatest(q, F.lit(0)), F.lit(levels)), F.lit(0)
    ).cast("long")


def zorder_key(
    quantized: list[Column],
    bits: int,
) -> Column:
    """Interleave the low ``bits`` bits of each already-quantized LONG
    column into one Morton key: bit ``i`` of column ``j`` lands at
    position ``i*N + j``. Pure shift/and/or expressions — codegen'd,
    ``N*bits`` terms (bounded: ``N*bits <= 63``)."""
    n = len(quantized)
    if n * bits > 63:
        raise ValueError(f"{n} columns x {bits} bits exceeds a signed long")
    terms = [
        F.shiftleft(
            F.shiftright(q, i).bitwiseAND(F.lit(1)).cast("long"), i * n + j
        )
        for j, q in enumerate(quantized)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def _with_bloom(writer, bloom_cols, options=None):
    """Attach parquet bloom-filter write options: ``bloom_cols`` is a
    list of column names or a {column: expected_ndv} dict. Bloom
    filters answer POINT lookups (`col = x`) on columns the sort/
    Z-order key doesn't cover — statistics prune ranges, blooms prune
    memberships. Costs a few bits/value in the file; readers that
    don't know blooms simply ignore them. ``options`` passes raw
    writer options through (e.g. ``parquet.block.size`` to control
    ROW-GROUP size — pruning granularity is the row group, so a
    compacted file still needs several groups to prune within)."""
    for k, v in (options or {}).items():
        writer = writer.option(k, str(v))
    if not bloom_cols:
        return writer
    items = (
        bloom_cols.items()
        if isinstance(bloom_cols, dict)
        else [(c, None) for c in bloom_cols]
    )
    for c, ndv in items:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
        if ndv is not None:
            writer = writer.option(
                f"parquet.bloom.filter.expected.ndv#{c}", str(int(ndv))
            )
    return writer


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    num_files: int | None = None,
    mode: str = "overwrite",
    bloom_cols=None,
    options: dict | None = None,
) -> None:
    """Write ``df`` as parquet Z-ordered on ``cols``: quantize each
    column against its global (min, max) — one aggregate, 2N scalars —
    build the Morton key, range-partition into ``num_files`` (default:
    the session's shuffle parallelism), sort within partitions by the
    key, drop it, write. Values are unchanged; only ROW ORDER differs,
    which is what makes the files' row-group min/max statistics
    selective for filters on any participating column."""
    if not cols:
        raise ValueError("zorder_write needs at least one column")
    bits = min(bits, 63 // len(cols))
    stats = df.agg(
        *[F.min(c).alias(f"_lo_{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"_hi_{i}") for i, c in enumerate(cols)],
    ).head()
    quantized = [
        _quantize(
            F.col(c),
            float(stats[f"_lo_{i}"]) if stats[f"_lo_{i}"] is not None else 0.0,
            float(stats[f"_hi_{i}"]) if stats[f"_hi_{i}"] is not None else 0.0,
            bits,
        )
        for i, c in enumerate(cols)
    ]
    key = zorder_key(quantized, bits)
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    _with_bloom(
        df.withColumn("_zkey", key)
        .repartitionByRange(n, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode),
        bloom_cols,
        options,
    ).parquet(path)


def sorted_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
    bloom_cols=None,
    options: dict | None = None,
) -> None:
    """Write ``df`` as parquet globally range-sorted on ``cols`` —
    the single-dimension layout: filters on the LEADING column (and
    prefixes) prune row groups; trailing-only filters don't. Use
    :func:`zorder_write` when more than one filter column matters,
    ``bloom_cols`` for point lookups on non-sorted columns."""
    if not cols:
        raise ValueError("sorted_write needs at least one column")
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    _with_bloom(
        df.repartitionByRange(n, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .write.mode(mode),
        bloom_cols,
        options,
    ).parquet(path)


def optimize_table(
    spark,
    path: str,
    zorder_cols: list[str],
    target_mb: int = 512,
    bits: int = 12,
    bloom_cols=None,
    options: dict | None = None,
) -> int:
    """Compact AND Z-order an existing parquet directory in place —
    the table-format-less equivalent of ``OPTIMIZE ... ZORDER BY``:
    one rewrite fixes both the small-files problem (accumulated
    micro-batch appends) and the layout problem (row groups spanning
    the full domain). Runs through :func:`..sinks._compact_swap` —
    THE shared rewrite-then-swap protocol (``recover_compaction``
    crash recovery, same marker names, flat-data-directory guard:
    hive-partitioned, nested, or marker-bearing directories refuse
    instead of being irreversibly flattened) — with
    :func:`zorder_write` as the rewrite. The LOCAL-POSIX/
    exclusive-writer constraints of :func:`..sinks.compact_output`
    apply unchanged: on a cluster, rewrite through a transactional
    table format instead, and run per partition directory at 100 TB.
    Returns the new file count."""
    from .sinks import _compact_swap

    def _write(tmp: str, n_files: int) -> None:
        zorder_write(
            spark.read.parquet(path),
            tmp,
            zorder_cols,
            bits=bits,
            num_files=n_files,
            bloom_cols=bloom_cols,
            options=options,
        )

    return _compact_swap(path, target_mb, _write)
