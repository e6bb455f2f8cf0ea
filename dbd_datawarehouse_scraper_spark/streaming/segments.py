"""[EXT] Incremental passage/boilerplate removal: a segment-frequency
store fed by ``foreachBatch``.

The streaming counterpart of :func:`..operators.segments.segment_dedup`.
Documents arrive in epochs; a segment is boilerplate once it has been
seen in ≥ ``min_docs`` distinct documents ACROSS ALL EPOCHS SO FAR, and
every epoch must be cleaned against that cumulative count without
re-scanning historical text.

State = one (segment-hash → doc-count) DELTA per epoch under
``store_path/freq/epoch=N`` — 16 bytes a row, never segment text. The
cumulative doc-frequency of a segment is the SUM of its per-epoch
deltas (document ids never repeat across epochs of an append-only
ingestion, so per-epoch distinct counts add exactly).

Prefix-consistency contract (test-pinned): epoch N's cleaned output is
IDENTICAL to running the batch operator over the union of epochs ≤ N
and restricting to epoch N's documents. The corollary every incremental
cleaner shares: a segment that only CROSSES the threshold at epoch N
stays in the already-written outputs of epochs < N (they were correct
prefixes when written); re-cleaning history is a batch re-run over the
union, not an epoch operation.

Store integrity mirrors streaming/near_dedup.py, same rationale:

- explicit ``fs_exists`` history detection — only genuine absence
  skips the history leg; a real FS error fails the epoch and the
  checkpoint replays it;
- a format marker pins (mode, k): stored hashes are
  ``xxhash64(segment)`` of a SPECIFIC segmentation — counts from a
  different chunk size would merge apples with oranges silently.
  ``min_docs`` is a read-time threshold (not baked into stored data),
  so it may vary per run;
- history = committed epochs STRICTLY BELOW the current one (a
  replayed epoch's own delta is already under ``epoch=N`` — reading
  the whole dir would double-count the replayed batch and could flip
  threshold decisions);
- epoch-suffixed overwrites keep replays idempotent; committed
  generations fold via sources/sinks.py ``fold_epoch_dirs`` with an
  AGGREGATING merge (round 12): each folded generation is the
  groupBy-sum of its member deltas — one row per segment hash instead
  of one per (epoch, hash). Without the merge, folding bounded the
  store's FILE count but not its ROW count, and the per-epoch
  cumulative re-aggregation still shuffled every delta ever written
  (the round-11 verdict's striking-cost class); per-epoch sums are
  associative, so every downstream total is bit-unchanged
  (prefix-consistency test runs with folding forced on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..caching import pool_mark, release_since, tracked_persist

#: Bump when the segment hashing or store layout changes incompatibly.
STORE_FORMAT_VERSION = 1

#: Batches whose distinct-hash relation stays at or below this many
#: rows broadcast it into the history-prefilter semi join (8-byte
#: hashes — ~32 MB at the bound), so the history scan streams through
#: unshuffled; larger batches take the plain semi join.
BROADCAST_KEYS_MAX_ROWS = 4_000_000

_MARKER_SCHEMA = "format_version INT, mode STRING, k INT"


def _merge_freq(df: DataFrame) -> DataFrame:
    """Associative reducer for frequency deltas: summed doc counts per
    segment hash. Used by the per-epoch cumulative total AND as the
    fold merge — one definition so they cannot drift."""
    from ..operators.segments import _HS

    return df.groupBy(_HS).agg(F.sum("doc_count").alias("doc_count"))


def _validate_or_init_store(
    spark: SparkSession, store_path: str, mode: str, k: int
) -> None:
    from ._store import validate_or_init_marker

    validate_or_init_marker(
        spark, store_path, _MARKER_SCHEMA,
        (STORE_FORMAT_VERSION, mode, k),
        "segment store",
        "Counts from different segmentations never combine correctly",
    )


def stream_segment_dedup(
    stream_docs: DataFrame,
    out_path: str,
    store_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "chunk",
    k: int = 8,
    min_docs: int = 2,
    available_now: bool = True,
    fold_store_after: int | None = 16,
) -> StreamingQuery:
    """Start the incremental passage-dedup stream. Cleaned epochs land
    in ``out_path/epoch=N`` (all input columns, ``text_col`` rewritten,
    plus ``n_segs``/``n_dropped``); the frequency store grows under
    ``store_path/freq/epoch=N``. Returns the StreamingQuery."""
    spark = stream_docs.sparkSession
    _validate_or_init_store(spark, store_path, mode, k)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        segment_dedup_epoch(
            spark, batch_df, epoch_id, out_path, store_path,
            id_col=id_col, text_col=text_col, mode=mode, k=k,
            min_docs=min_docs, fold_store_after=fold_store_after,
        )

    writer = stream_docs.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def segment_dedup_epoch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    out_path: str,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "chunk",
    k: int = 8,
    min_docs: int = 2,
    fold_store_after: int | None = 16,
) -> bool:
    """One epoch of incremental passage dedup, as a plain function so
    composed incremental pipelines can run it inside their own
    ``foreachBatch``. Cleans ``batch_df`` against cumulative history +
    in-epoch counts, writes the cleaned rows to
    ``out_path/epoch=<epoch_id>`` and the epoch's frequency delta to
    the store. Epoch-suffixed overwrites keep replays idempotent.
    Releases exactly the caches it pins (pool-scoped). Returns True iff the epoch had rows."""
    _validate_or_init_store(spark, store_path, mode, k)
    # unconditional crash recovery + scoped release — same rationale as
    # near_dedup_epoch (round-5 review): a mid-fold crash must not read
    # as "no history", and a composable epoch function must never
    # release a caller's pinned state.
    from ..sources.sinks import fold_epoch_dirs, recover_epoch_fold

    if fold_store_after:
        # fold runs recovery itself, first thing; the aggregating merge
        # keeps folded generations at one row per segment hash
        fold_epoch_dirs(
            spark, f"{store_path}/freq",
            below_epoch=epoch_id, min_dirs=fold_store_after,
            merge=_merge_freq,
        )
    else:
        recover_epoch_fold(spark, f"{store_path}/freq")
    mark = pool_mark()
    try:
        batch = tracked_persist(batch_df)
        if batch.count() == 0:
            return False

        from ..operators.segments import (
            _HS,
            explode_segments,
            mark_and_reassemble,
        )

        ex = tracked_persist(explode_segments(batch, id_col, text_col, mode, k))
        epoch_freq = tracked_persist(
            ex.filter(F.col(_HS).isNotNull())
            .groupBy(_HS)
            .agg(F.count_distinct(F.col("_sd_id")).alias("doc_count"))
        )

        # cumulative counts: committed history deltas (strictly below this
        # epoch) + this epoch's own — see module docstring for why the
        # replay window must be excluded from the history read. An epoch
        # ABOVE the current id in the store means the checkpoint was reset
        # against a populated store: the new run would overwrite committed
        # deltas epoch by epoch and silently undercount boilerplate — fail
        # loudly instead (streaming epoch ids are monotone; a legitimate
        # replay is only ever of the store's MAX epoch).
        freq_root = f"{store_path}/freq"
        from ._store import committed_epochs_below

        hist_epochs = committed_epochs_below(
            spark, freq_root, epoch_id, "segment store",
            "overwriting committed frequency deltas silently readmits "
            "boilerplate",
        )
        total = epoch_freq
        if hist_epochs:
            hist = spark.read.parquet(
                *[f"{freq_root}/epoch={e}" for e in hist_epochs]
            )
            # only hashes present in THIS batch can affect the epoch's
            # output (the verdict joins back against the batch's
            # exploded segments, and the store delta below is
            # epoch-only): prefilter history with a semi join on the
            # batch's key set — broadcast for micro-batches so the
            # history scan STREAMS — and the cumulative merge
            # aggregates O(batch keys), not O(every key the store has
            # ever seen) (round 12; the aggregating folds bounded the
            # history's ROW count, this bounds the per-epoch shuffle)
            keys = epoch_freq.select(_HS)
            if epoch_freq.count() <= BROADCAST_KEYS_MAX_ROWS:
                keys = F.broadcast(keys)
            hist = hist.join(keys, _HS, "left_semi")
            total = _merge_freq(epoch_freq.unionByName(hist))
        frequent = total.filter(F.col("doc_count") >= min_docs).select(
            _HS, F.lit(True).alias("_sd_dup")
        )

        cleaned = mark_and_reassemble(ex, frequent, id_col, mode).withColumnRenamed(
            "clean_text", "_clean"
        )
        out = (
            batch.drop(text_col)
            .join(cleaned, id_col)
            .withColumnRenamed("_clean", text_col)
        )
        out.write.mode("overwrite").parquet(f"{out_path}/epoch={epoch_id}")
        epoch_freq.write.mode("overwrite").parquet(f"{freq_root}/epoch={epoch_id}")
        return True
    finally:
        release_since(mark)
