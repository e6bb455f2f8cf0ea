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
from pyspark.sql import functions as F


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
        # static overwrite: replays must truncate the target, not merge
        # with stale partitions under an ambient dynamic default (no-op
        # for non-overwrite modes)
        writer = writer.partitionBy(*partition_by).option(
            "partitionOverwriteMode", "static"
        )
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
    target_files: int | None = None,
) -> None:
    """Two-channel sink: fact table + not-found reject channel
    (scraper_v2.py:1346-1353). In streaming the same pair writes from
    one ``foreachBatch``. ``target_files`` bounds the file count of the
    main channel (the CLI's --batch-size); the reject channel is small
    and always coalesces to one file when a target is set."""
    batched_sink(main, main_path, fmt=fmt, mode=mode, target_files=target_files)
    batched_sink(
        side, side_path, fmt=fmt, mode=mode,
        target_files=1 if target_files else None,
    )


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

    CONSTRAINTS (explicit, not implied): this utility is for a LOCAL
    POSIX filesystem with an exclusive writer — ``os.rename``/``glob``
    do not exist as atomic operations on object stores, and the
    two-rename swap below has a window where readers see no directory
    at all. On a cluster, compact via the table format's own rewrite
    (e.g. a transactional file-format compaction) or swap a versioned
    directory pointer; at 100 TB run this per partition directory, not
    per table. A crash between the two renames strands the data at
    ``path.__compact_old__`` — call :func:`recover_compaction` at
    startup to roll back.

    FLAT DATA DIRECTORIES ONLY: the rewrite reads with a plain
    ``spark.read`` and writes flat, so a hive-partitioned layout
    (``col=value`` subdirs) would be flattened, any other nested
    directory silently dropped, and sidecar markers (a streaming
    store's ``_schema``) lost — all irreversibly once the swap's
    ``rmtree`` runs. Structured directories are refused up front;
    compact their leaf directories individually (epoch stores have
    :func:`fold_epoch_dirs`, which preserves their protocol)."""

    def _write(tmp: str, n_files: int) -> None:
        reader = (
            spark.read.option("header", True).csv(path)
            if fmt == "csv"
            else spark.read.parquet(path)
        )
        batched_sink(reader, tmp, fmt=fmt, target_files=n_files)

    return _compact_swap(path, target_mb, _write)


def _assert_flat_data_dir(path: str) -> None:
    """Refuse to rewrite-and-swap a directory whose structure the flat
    rewrite would destroy: hive partition subdirs get flattened into a
    column, other subdirs are silently dropped by ``spark.read``, and
    sidecar markers (underscore-prefixed, e.g. a streaming out_path's
    ``_schema``) are not carried over — each a permanent loss after
    the swap deletes the original."""
    for entry in sorted(os.listdir(path)):
        if entry.startswith("."):
            continue
        # underscore check FIRST: this package's markers (_schema,
        # _FOLDED_GEN) are themselves small json DIRECTORIES
        if entry.startswith("_") and entry != "_SUCCESS":
            raise ValueError(
                f"refusing to compact {path}: sidecar marker {entry!r} "
                "would be dropped by the rewrite (the directory looks "
                "like a versioned store output, not a plain table)."
            )
        if os.path.isdir(os.path.join(path, entry)):
            kind = (
                "a hive-partitioned (col=value) layout"
                if "=" in entry
                else "nested directories"
            )
            raise ValueError(
                f"refusing to compact {path}: it contains {kind} "
                f"({entry!r}) which a flat rewrite-and-swap would "
                "destroy. Compact leaf directories individually; for "
                "streaming epoch stores use fold_epoch_dirs, which "
                "preserves the store protocol."
            )


def _compact_swap(path: str, target_mb: int, write_tmp) -> int:
    """The shared rewrite-and-swap protocol behind
    :func:`compact_output` and ``layout.optimize_table``: recover a
    crashed prior attempt, refuse structured directories, size the
    target file count from the current bytes, write the replacement
    via ``write_tmp(tmp_path, n_files)``, then two-rename swap and
    delete the original. Kept in ONE place so the crash-safety
    contract (marker names, rename order, :func:`recover_compaction`)
    cannot drift between callers."""
    import glob

    if target_mb <= 0:
        raise ValueError(f"target_mb must be positive, got {target_mb}")
    recover_compaction(path)  # roll back any crashed prior attempt
    _assert_flat_data_dir(path)
    files = [
        f for f in glob.glob(os.path.join(path, "**", "*"), recursive=True)
        if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
    ]
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_files = int(max(1, -(-total_bytes // (target_mb * 1024 * 1024))))
    tmp = f"{path}.__compact_tmp__"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)  # stale tmp from a crash before the swap
    write_tmp(tmp, n_files)
    old = f"{path}.__compact_old__"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files


def recover_compaction(path: str) -> bool:
    """Roll back a compaction that crashed mid-swap.

    ``compact_output`` renames ``path`` → ``path.__compact_old__`` then
    ``path.__compact_tmp__`` → ``path``; a crash between the renames
    leaves only ``__compact_old__`` (the intact original). Restore it.
    Returns True if a recovery happened. Idempotent; called by
    ``compact_output`` itself, and safe to call at process startup."""
    old = f"{path}.__compact_old__"
    if os.path.exists(old):
        if os.path.exists(path):
            # swap completed; old is just debris from a crash before
            # the final cleanup rmtree
            shutil.rmtree(old)
            return False
        os.rename(old, path)
        return True
    return False


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


def recover_epoch_fold(spark, path: str) -> bool:
    """Complete or roll back an epoch fold (:func:`fold_epoch_dirs`)
    that crashed mid-protocol, over the Hadoop FS API so streaming
    stores on any filesystem recover. Returns True if any repair
    happened. Idempotent.

    The tiered fold moves COMMITTED carried generations into the tmp
    dir before the swap, so tmp contents can no longer be dropped
    blindly (round-5 review — the pre-tiering recovery deleted a
    leftover tmp, which with carried dirs inside would have destroyed
    committed dedup history). A commit marker (``<path>.__fold_commit__``,
    written only once tmp is COMPLETE) decides direction:

    - marker present → roll FORWARD: finish the swap (path→old,
      tmp→path, drop old, drop marker). Every state along the forward
      sequence is distinguishable: tmp existing means path is still
      the pre-swap dir.
    - marker absent → roll BACK: tmp is incomplete. Each ``epoch=*``
      under tmp either does not exist under path (a carried dir —
      rename it back) or collides with a live source dir (a freshly
      written, possibly partial, fold generation — its sources are
      intact in path, so drop it; a new generation is always named
      ``epoch=<max folded>``, which is a source still in path). Then
      drop tmp. Legacy ``old`` debris without a marker is handled as
      before (restore if path vanished, else drop)."""
    from ..fsutil import fs_delete, fs_exists, fs_list_names, fs_rename

    old = f"{path}.__fold_old__"
    tmp = f"{path}.__fold_tmp__"
    commit = f"{path}.__fold_commit__"
    repaired = False
    if fs_exists(spark, commit):
        # FORWARD: tmp was complete when the marker was written
        if fs_exists(spark, tmp):
            if fs_exists(spark, path):
                fs_rename(spark, path, old)
            fs_rename(spark, tmp, path)
            repaired = True
        if fs_exists(spark, old):
            fs_delete(spark, old)
            repaired = True
        fs_delete(spark, commit)
        return repaired
    if fs_exists(spark, old):
        if fs_exists(spark, path):
            fs_delete(spark, old)
        else:
            fs_rename(spark, old, path)
        repaired = True
    if fs_exists(spark, tmp):
        # BACKWARD: restore carried dirs, drop partial generations
        if fs_exists(spark, path):
            for n in fs_list_names(spark, tmp):
                if not n.startswith("epoch="):
                    continue
                if fs_exists(spark, f"{path}/{n}"):
                    fs_delete(spark, f"{tmp}/{n}")
                else:
                    fs_rename(spark, f"{tmp}/{n}", f"{path}/{n}")
        fs_delete(spark, tmp)
        repaired = True
    return repaired


def fold_epoch_dirs(
    spark,
    path: str,
    below_epoch: int,
    min_dirs: int = 8,
    target_files: int = 8,
    partition_cols: tuple = (),
    merge=None,
) -> bool:
    """[EXT] Fold committed ``epoch=K`` generations of a streaming
    store into ONE — the store-lifecycle counterpart of
    :func:`compact_output`. Incremental stores (the near-dup signature
    store, the shard packer's output) append one parquet directory per
    epoch; after thousands of epochs every history probe is a
    small-files scan. This folds committed ``epoch=K`` dirs
    (``K < below_epoch``) into ``epoch=<max folded K>`` generations
    of ~``target_files`` files each, preserving rows exactly — unless
    the caller passes ``merge`` (a ``DataFrame -> DataFrame`` reducer),
    in which case each folded generation is the MERGE of its members.
    For delta stores whose consumers re-aggregate the whole history per
    epoch (the segment/substring frequency stores: union of deltas →
    groupBy-sum), an ASSOCIATIVE merge shrinks every folded generation
    to one row per key while every downstream total is bit-unchanged —
    without it, folding bounds the store's file count but not its ROW
    count, and the per-epoch re-aggregation still shuffles every delta
    ever written (the round-11 verdict's striking-cost class, round
    12). ``merge`` must be associative and idempotent over regrouping
    (groupBy-sum / min / max are; averages and raw counts of rows are
    NOT — keep sums and derive ratios downstream).

    Replay safety: ``foreachBatch`` can replay at most the CURRENT
    epoch, so callers pass ``below_epoch=<current epoch_id>`` — a
    replayed epoch's own (uncommitted, about-to-be-rewritten) dir is
    never folded, and re-folding on replay is a no-op-shaped rewrite
    of already-folded generations. No-op below ``min_dirs`` eligible
    dirs so steady-state epochs don't pay a rewrite.

    Tiered (round-5 review): folding ALL eligible dirs every time
    re-reads and rewrites the ever-growing folded generation on every
    cycle — O(N²/min_dirs) total I/O over the store's life. Folded
    generations therefore carry a ``_FOLDED_GEN`` marker and fold in
    two tiers, LSM-style:

    - **minor** — when ≥ ``min_dirs`` UNMARKED eligible dirs exist,
      fold only those into one new marked generation (the big old
      generations are not touched);
    - **major** — when the marked eligible generations themselves
      number ≥ ``min_dirs``, fold those into one.

    A row is rewritten once by a minor fold and once per major cycle —
    total I/O ~N²/(2·min_dirs²) over the store's life versus
    ~N²/(2·min_dirs) untiered (a min_dirs× reduction; truly
    log-amortized folding needs unbounded LSM levels, deliberately not
    built — two tiers keep recovery enumerable).

    Crash safety mirrors :func:`compact_output`'s two-rename swap
    (write tmp → move aside → move in → drop old) with
    :func:`recover_epoch_fold` run first; on POSIX/HDFS the renames
    are atomic, on object stores use the table format's own compaction
    instead. A crash mid-fold can drop a REPLAYING current epoch's
    leftover dir with the tmp — harmless by the replay contract: that
    dir was uncommitted and the replay rewrites it with overwrite.
    Committed generations are never exposed to that window (they move
    in one rename). Returns True iff a fold happened."""
    from ..fsutil import fs_delete, fs_exists, fs_list_names, fs_rename, fs_touch

    recover_epoch_fold(spark, path)
    if not fs_exists(spark, path):
        return False
    epochs = sorted(
        int(n.split("=", 1)[1])
        for n in fs_list_names(spark, path)
        if n.startswith("epoch=")
    )
    eligible = [e for e in epochs if e < below_epoch]
    marked = [
        e for e in eligible
        if fs_exists(spark, f"{path}/epoch={e}/_FOLDED_GEN")
    ]
    unmarked = [e for e in eligible if e not in set(marked)]
    fold_minor = len(unmarked) >= min_dirs
    fold_major = len(marked) >= min_dirs
    if not (fold_minor or fold_major):
        return False
    tmp, old = f"{path}.__fold_tmp__", f"{path}.__fold_old__"
    commit = f"{path}.__fold_commit__"

    def write_gen(group):
        kmax = max(group)
        # hash-partitioned stores (the link-graph store's bucket= dirs)
        # can hold fully-struck epochs whose dir carries only commit
        # markers — no parquet files, unreadable; fold from the
        # data-bearing members only, and when none exist the folded
        # generation is just its markers (still one dir replacing many)
        data = [
            e
            for e in group
            if any(
                not n.startswith("_")
                for n in fs_list_names(spark, f"{path}/epoch={e}")
            )
        ]
        if data:
            if merge is not None:
                merged = merge(
                    spark.read.parquet(*[f"{path}/epoch={e}" for e in data])
                )
                merged.coalesce(target_files).write.mode("overwrite").parquet(
                    f"{tmp}/epoch={kmax}"
                )
            elif partition_cols:
                # partitioned epoch dirs need the table root declared
                # (basePath) for a multi-dir read; the epoch partition
                # column that surfaces alongside is dropped before the
                # rewrite. Repartition ON the partition values so each
                # value lands in one task → one file per value per
                # generation.
                df = spark.read.option("basePath", path).parquet(
                    *[f"{path}/epoch={e}" for e in data]
                ).drop("epoch")
                # static overwrite: a crashed fold's partial generation
                # dir must be truncated on replay, not merged with (a
                # cluster-wide dynamic partitionOverwriteMode would
                # keep partitions the rewrite no longer produces)
                df.repartition(
                    *[F.col(c) for c in partition_cols]
                ).write.mode("overwrite").option(
                    "partitionOverwriteMode", "static"
                ).partitionBy(*partition_cols).parquet(
                    f"{tmp}/epoch={kmax}"
                )
            else:
                spark.read.parquet(
                    *[f"{path}/epoch={e}" for e in data]
                ).coalesce(target_files).write.mode("overwrite").parquet(
                    f"{tmp}/epoch={kmax}"
                )
        else:
            fs_touch(spark, f"{tmp}/epoch={kmax}/_SUCCESS")
        fs_touch(spark, f"{tmp}/epoch={kmax}/_FOLDED_GEN")
        return kmax

    carried = set()
    if fold_minor:
        write_gen(unmarked)
    else:
        carried.update(unmarked)
    if fold_major:
        write_gen(marked)
    else:
        carried.update(marked)
    # carry untouched dirs (live replay-window dirs + the non-folding
    # tier) across the swap by rename — no rewrite
    for e in epochs:
        if e >= below_epoch or e in carried:
            fs_rename(spark, f"{path}/epoch={e}", f"{tmp}/epoch={e}")
    # tmp is COMPLETE: the commit marker flips recovery from roll-back
    # to roll-forward — from here every crash finishes the swap instead
    # of undoing it (carried committed dirs now live only in tmp, so
    # backward recovery past this point would lose them)
    fs_touch(spark, commit)
    fs_rename(spark, path, old)
    fs_rename(spark, tmp, path)
    fs_delete(spark, old)
    fs_delete(spark, commit)
    return True


def jsonl_sink(
    df,
    path: str,
    mode: str = "overwrite",
    target_files: int | None = None,
    compression: str | None = "gzip",
    partition_by: tuple[str, ...] = (),
) -> None:
    """[EXT] JSONL export — the shard format training loaders consume.
    Defaults to gzip (the public corpora ship .jsonl.gz); pass
    ``compression=None`` for plain text. ``partition_by`` pairs with
    pack_shards' shard column so each token-budget shard lands in its
    own directory; ``target_files`` is for small outputs only — at
    scale leave it None and let the upstream partitioning (range
    exchange, AQE) decide file counts."""
    out = df.coalesce(target_files) if target_files else df
    writer = out.write.mode(mode)
    if partition_by:
        # static overwrite: a replayed epoch whose repack emits fewer
        # shard= dirs must truncate the epoch dir, not merge with the
        # stale shards under an ambient dynamic default (round-12
        # review — the same phantom-partition class as the stores)
        writer = writer.partitionBy(*partition_by).option(
            "partitionOverwriteMode", "static"
        )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
