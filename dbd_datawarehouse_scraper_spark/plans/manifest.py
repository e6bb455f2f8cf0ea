"""[EXT] Export manifest — the audit record of a training-set export.

A 100 TB export is consumed by trainers that cannot re-derive what
they were given; the manifest is the contract: one row per
(split[, epoch], shard) with row/token/char totals and an
ORDER-INVARIANT content checksum, plus per-split totals. With it a
consumer can verify a copied shard tree bit-for-bit-equivalent
(checksums), budget a training run (token totals), and detect a
silently dropped or duplicated shard (row counts) — the dataset-card
numbers, derived from the data instead of asserted.

Shape: ONE scan of the exported JSONL, one groupBy on the partition
columns (shuffle = number of shards — tiny), one write. The checksum
is the EXACT decimal(38,0) sum of each row's 60-bit sha256-prefix
signature over (id, token count, text) — ANSI mode forbids wrapping
long sums; a decimal-38 sum cannot overflow below ~8.7e19 rows per
shard — so it is independent of row order and file layout:
recompaction preserves it, any audited-column change breaks it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Checksum-format version, stamped into every manifest row. A
#: checksum-algorithm change bumps this, and verify REFUSES a manifest
#: written under another version instead of reporting every shard as
#: drift (a false corruption report, indistinguishable from the real
#: thing). v2 = sha256 over (id, token count, text).
MANIFEST_VERSION = 2


def _row_sig(id_col: str, text_col: str, token_col: str) -> F.Column:
    """Order-invariant per-row signature: the first 15 hex chars of
    sha256 over ALL audited fields — id, token count, and text (a
    checksum that skipped ``token_col`` would bless compensating
    token-count edits). 60 bits, never negative; the caller sums into
    decimal(38,0), exact at any shard size."""
    # every field coalesced: concat_ws SKIPS null args, so an
    # unguarded NULL id would both collapse distinct rows onto one
    # signature and let a wrong id_col silently degrade the audit to
    # token+text
    payload = F.concat_ws(
        "\x1f",
        F.coalesce(F.col(id_col).cast("string"), F.lit("\x00null")),
        F.coalesce(F.col(token_col).cast("string"), F.lit("\x00null")),
        F.coalesce(F.col(text_col), F.lit("\x00null")),
    )
    return F.conv(
        F.substring(F.sha2(payload, 256), 1, 15), 16, 10
    ).cast("long")


def export_manifest(
    spark: SparkSession,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str = "n_tokens",
    streaming_layout: bool | None = None,
) -> DataFrame:
    """Compute the manifest of an :func:`..plans.training_export
    .export_training_set` (or ``stream_export_training_set``) output
    directory. Returns one row per (split[, epoch], shard):
    ``(split[, epoch], shard, n_rows, n_tokens, n_chars,
    content_checksum)`` ordered by the partition columns.

    ``streaming_layout`` selects ``split=*/epoch=*/shard=*`` (True)
    vs the batch ``split=*/shard=*`` (False); ``None`` autodetects by
    probing for an ``epoch=`` directory under the first split. The
    read uses an explicit schema over exactly the three audited
    columns — extra columns in the rows (``doc_ids`` lineage, etc.)
    are ignored, so packed and plain exports audit alike.
    """
    from ..fsutil import fs_list_names

    splits = [
        n for n in fs_list_names(spark, out_path) if n.startswith("split=")
    ]
    if not splits:
        raise ValueError(
            f"no split=* directories under {out_path} — not a training-set "
            f"export (or an empty one); nothing to audit"
        )
    if streaming_layout is None:
        first = f"{out_path}/{splits[0]}"
        streaming_layout = any(
            n.startswith("epoch=") for n in fs_list_names(spark, first)
        )
    part_cols = ["split", "epoch", "shard"] if streaming_layout else [
        "split", "shard",
    ]
    glob = (
        f"{out_path}/split=*/epoch=*/shard=*"
        if streaming_layout
        else f"{out_path}/split=*/shard=*"
    )
    rows = (
        spark.read.option("basePath", out_path)
        # FAILFAST: an audit that silently folded malformed lines into
        # the totals as null rows would BLESS a corrupt tree — a torn
        # shard must fail the audit, not pad the dataset card
        .option("mode", "FAILFAST")
        .schema(f"{id_col} STRING, {text_col} STRING, {token_col} LONG")
        .json(glob)
    )
    return (
        rows.groupBy(*part_cols)
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.coalesce(F.sum(token_col), F.lit(0).cast("long")).alias(
                "n_tokens"
            ),
            F.coalesce(
                F.sum(F.length(F.col(text_col)).cast("long")),
                F.lit(0).cast("long"),
            ).alias("n_chars"),
            F.sum(
                _row_sig(id_col, text_col, token_col).cast("decimal(38,0)")
            ).alias("content_checksum"),
        )
        .withColumn("manifest_version", F.lit(MANIFEST_VERSION))
        .orderBy(*part_cols)
    )


def write_manifest(
    spark: SparkSession,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str = "n_tokens",
) -> dict:
    """Compute and persist the manifest under ``out_path/_manifest``
    (parquet, one file — it is shards-count sized) and return the
    per-split totals ``{split: {"n_rows": ..., "n_tokens": ...,
    "n_shards": ...}}`` for logging/dataset cards. Overwrites any
    previous manifest — the manifest describes the CURRENT tree."""
    m = export_manifest(
        spark, out_path, id_col=id_col, text_col=text_col,
        token_col=token_col,
    )
    m.repartition(1).write.mode("overwrite").parquet(f"{out_path}/_manifest")
    totals: dict = {}
    for r in spark.read.parquet(f"{out_path}/_manifest").collect():
        t = totals.setdefault(
            r["split"], {"n_rows": 0, "n_tokens": 0, "n_shards": 0}
        )
        t["n_rows"] += r["n_rows"]
        t["n_tokens"] += r["n_tokens"]
        t["n_shards"] += 1
    return totals


def verify_manifest(
    spark: SparkSession,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Recompute the manifest and diff it against the persisted one:
    returns the rows that DISAGREE (empty = the tree still matches its
    manifest). Any added/removed/modified row in any shard changes
    that shard's n_rows/n_tokens/checksum; a vanished or new shard
    appears as a one-sided row. The consumer-side integrity check.

    A manifest written under another checksum-format version REFUSES
    loudly (re-run :func:`write_manifest`) instead of reporting every
    shard as drift — a false corruption report would be
    indistinguishable from the real thing.

    The result is MATERIALIZED internally (it is bounded: at most
    2 × shard-count rows) and returned as a local relation, so the
    tree is scanned exactly once, no persist outlives the call, and a
    later write/verify over a changed tree can never be served a
    stale cached aggregate."""
    from ..caching import pool_mark, release_since, tracked_persist

    stored = spark.read.parquet(f"{out_path}/_manifest")
    if "manifest_version" not in stored.columns:
        raise ValueError(
            f"manifest at {out_path}/_manifest predates checksum-format "
            f"versioning — re-run write_manifest (current format: "
            f"v{MANIFEST_VERSION})"
        )
    versions = [r[0] for r in stored.select("manifest_version").distinct().collect()]
    if versions != [MANIFEST_VERSION]:
        raise ValueError(
            f"manifest at {out_path}/_manifest has checksum-format "
            f"version(s) {versions}, expected {MANIFEST_VERSION} — "
            f"re-run write_manifest before verifying"
        )
    mark = pool_mark()
    try:
        # both exceptAll legs consume the recomputed manifest — pin it
        # so the verify scans the (100 TB) tree once, not twice
        fresh = tracked_persist(
            export_manifest(
                spark, out_path, id_col=id_col, text_col=text_col,
                token_col=token_col,
            )
        )
        drift = stored.exceptAll(fresh).withColumn(
            "side", F.lit("manifest")
        ).unionByName(
            fresh.exceptAll(stored).withColumn("side", F.lit("tree"))
        )
        rows = drift.collect()  # bounded: <= 2 x shard count
        schema = drift.schema
    finally:
        release_since(mark)
    return spark.createDataFrame(rows, schema)
