"""Sinks (SURVEY §2.1): batched writes, side outputs, combine, backup.

The reference hand-rolls batched CSV durability (flush every 20 rows,
scraper_v2.py:1334-1435). Spark's task-level write commit protocol IS
the batch mechanism — one file per partition, atomic job commit — so
``batched_sink`` is a thin wrapper that controls partition count (file
size) instead of reimplementing batching.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime

from pyspark.sql import DataFrame


def batched_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    target_files: int | None = None,
) -> None:
    """Write one file per partition (the reference's 'batch files',
    scraper_v2.py:1334-1353). ``target_files`` coalesces small outputs;
    leave None at scale and let AQE size partitions."""
    out = df.coalesce(target_files) if target_files else df
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer.option("header", True).csv(path)
    else:
        writer.parquet(path)


def side_output_sink(
    main: DataFrame,
    side: DataFrame,
    main_path: str,
    side_path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Two-channel sink: fact table + not-found reject channel
    (scraper_v2.py:1346-1353). In streaming the same pair writes from
    one ``foreachBatch``."""
    batched_sink(main, main_path, fmt=fmt, mode=mode)
    batched_sink(side, side_path, fmt=fmt, mode=mode)


def backup_on_overwrite(path: str, force: bool = False) -> str | None:
    """Timestamped copy before overwrite unless forced
    (scraper_v2.py:1371-1383). Returns the backup path if one was made."""
    if force or not os.path.exists(path):
        return None
    stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    backup = f"{path}.backup_{stamp}"
    if os.path.isdir(path):
        shutil.copytree(path, backup)
    else:
        shutil.copy2(path, backup)
    return backup


def compact_output(
    spark,
    path: str,
    target_mb: int = 512,
    fmt: str = "parquet",
) -> int:
    """[EXT] Small-file compaction: rewrite an output directory into
    ~``target_mb``-sized files. Incremental sinks (micro-batch appends,
    streaming epochs) accumulate many small files; at scale that
    degrades every downstream scan (per-file open cost, tiny row
    groups, starved vectorized readers). Returns the new file count.

    Rewrite-then-swap keeps the directory readable until the atomic-ish
    rename; at 100 TB run this per partition directory, not per table."""
    import glob

    files = [
        f for f in glob.glob(os.path.join(path, "**", "*"), recursive=True)
        if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
    ]
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_files = max(1, -(-total_bytes // (target_mb * 1024 * 1024)))
    reader = (
        spark.read.option("header", True).csv(path)
        if fmt == "csv"
        else spark.read.parquet(path)
    )
    tmp = f"{path}.__compact_tmp__"
    batched_sink(reader, tmp, fmt=fmt, target_files=int(n_files))
    old = f"{path}.__compact_old__"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return int(n_files)


def combine_batches(
    spark, batches_path: str, out_path: str, fmt: str = "parquet"
) -> int:
    """Glob batch files → one combined output (+ row count), the
    reference's --combine-only utility (scraper_v2.py:1356-1420).
    Reading a directory is already a union; the single output file is a
    deliberate small-result convenience (coalesce(1))."""
    df = (
        spark.read.option("header", True).csv(batches_path)
        if fmt == "csv"
        else spark.read.parquet(batches_path)
    )
    batched_sink(df, out_path, fmt=fmt, target_files=1)
    return df.count()
