"""[EXT] Incremental near-dup dedup: a MinHash signature store fed by
``foreachBatch``.

The 100 TB ingestion story is incremental — documents arrive in epochs
and each epoch must be deduplicated against everything already
accepted, without re-scanning the historical corpus text. The classic
shape (and this module's):

- per epoch, MinHash-sign the incoming batch (codegen'd explode+agg
  form, operators/dedup.py);
- dedup WITHIN the batch exactly like the batch operator — banded LSH
  candidates, exact shingle-Jaccard verify, one survivor per connected
  component;
- dedup AGAINST HISTORY by joining the batch's band buckets to the
  persisted band index, then verifying candidates with the
  **signature-estimated** Jaccard (mean of equal MinHash components).
  History stores signatures, not shingle sets — storing shingles would
  re-store the corpus; the estimate's error is ~1/sqrt(num_hashes),
  the standard trade;
- append the epoch's SURVIVORS (rows, signatures, band buckets) to the
  store. Epoch-suffixed subdirectories written with overwrite make
  replays idempotent: a failed epoch rewrites its own output instead
  of duplicating rows (same pattern as micro_batch.py's two-sink).

State is bounded by the store on disk, not the streaming state store —
the foreachBatch body is ordinary batch Spark, so AQE, broadcast, and
the tracked-cache pool all apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..caching import release_caches, tracked_persist
from ..operators.dedup import minhash_lsh_pairs, minhash_signatures
from ..operators.graph import component_survivors


def _banded(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(_id, _band, _bucket) — same band hashing as the batch operator
    (dedup.py minhash_lsh_pairs), so cross-epoch candidates collide on
    identical buckets."""
    rows_per_band = num_hashes // bands
    return sig.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.hash(F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band))
                    for b in range(bands)
                ]
            )
        ).alias("_band", "_bucket"),
    )


def _estimated_jaccard(a, b, num_hashes: int):
    """Fraction of equal MinHash components ≈ Jaccard (unbiased)."""
    return (
        F.aggregate(
            F.zip_with(a, b, lambda x, y: F.when(x == y, 1).otherwise(0)),
            F.lit(0),
            lambda acc, v: acc + v,
        ).cast("double")
        / num_hashes
    )


def stream_near_dedup(
    stream_docs: DataFrame,
    out_path: str,
    store_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    threshold: float = 0.8,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the incremental near-dedup stream. Survivor rows land in
    ``out_path/epoch=N``; the signature store grows under
    ``store_path/{sigs,bands}/epoch=N``. Returns the StreamingQuery.

    Earliest-epoch-wins: a document near-duplicating any already-
    accepted document is dropped; within an epoch, one survivor per
    connected component (minimum id), matching the batch curation
    funnel. A batch run over the union of all epochs keeps the same
    survivors whenever epoch order agrees with id order (the estimate
    vs exact-verify difference aside)."""
    spark = stream_docs.sparkSession

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        batch = tracked_persist(batch_df.select(id_col, text_col))
        if batch.count() == 0:
            release_caches()
            return

        # within-batch: exact-verified pairs, component-min survivors
        pairs = minhash_lsh_pairs(
            batch, id_col=id_col, text_col=text_col,
            num_hashes=num_hashes, bands=bands, k=k, threshold=threshold,
        )
        in_batch_losers = component_survivors(pairs).withColumnRenamed(
            "id", id_col
        )
        kept = batch.join(in_batch_losers, id_col, "left_anti")

        sig = tracked_persist(
            minhash_signatures(kept, id_col, text_col, num_hashes, k)
        )
        new_banded = _banded(sig, num_hashes, bands)

        # against history: band-bucket candidates, estimated verify
        try:
            hist_bands = spark.read.parquet(f"{store_path}/bands")
            hist_sigs = spark.read.parquet(f"{store_path}/sigs")
            have_history = True
        except Exception:  # first epoch: no store yet
            have_history = False
        if have_history:
            cand = (
                new_banded.join(
                    hist_bands.select(
                        F.col("_id").alias("_old"), "_band", "_bucket"
                    ),
                    ["_band", "_bucket"],
                )
                .select("_id", "_old")
                .dropDuplicates(["_id", "_old"])
            )
            dup_ids = (
                cand.join(sig, "_id")
                .join(
                    hist_sigs.select(
                        F.col("_id").alias("_old"), F.col("_sig").alias("_osig")
                    ),
                    "_old",
                )
                .filter(
                    _estimated_jaccard(F.col("_sig"), F.col("_osig"), num_hashes)
                    >= threshold
                )
                .select(F.col("_id").alias(id_col))
                .distinct()
            )
            survivors = kept.join(dup_ids, id_col, "left_anti")
        else:
            survivors = kept

        survivors = tracked_persist(survivors)
        # epoch-suffixed overwrites: replayed epochs rewrite themselves
        survivors.write.mode("overwrite").parquet(f"{out_path}/epoch={epoch_id}")
        surv_sig = sig.join(
            survivors.select(F.col(id_col).alias("_id")), "_id"
        )
        surv_sig.write.mode("overwrite").parquet(
            f"{store_path}/sigs/epoch={epoch_id}"
        )
        _banded(surv_sig, num_hashes, bands).write.mode("overwrite").parquet(
            f"{store_path}/bands/epoch={epoch_id}"
        )
        release_caches()

    writer = stream_docs.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
