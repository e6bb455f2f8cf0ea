"""[EXT] Cross-document segment-level deduplication (boilerplate
removal).

Whole-document dedup (exact / MinHash) keeps one copy of a duplicated
DOCUMENT, but the dominant contamination in web-scale corpora is a
duplicated PASSAGE inside otherwise-distinct documents — navigation
chrome, license footers, templated disclaimers (the CCNet /
RefinedWeb-style line-level filter, and the passage analog of exact
substring dedup à la "Deduplicating Training Data Makes Language
Models Better"). This module removes segments that occur in ≥
``min_docs`` distinct documents and reassembles the surviving text in
original order.

Segmentation modes:

- ``"line"`` — split on newlines (the classic line-dedup for web text);
- ``"chunk"`` — non-overlapping ``k``-token windows (passage dedup for
  text without line structure; also the mode the driver oracle
  exercises, since the synthetic corpus is single-line).

Scale shape (100 TB honest):

- one Generate (posexplode) per document — narrow;
- segment frequency counts shuffle 16-byte (hash, doc) pairs, never
  segment text, and combine map-side;
- the frequent-segment relation is Zipf-small (only segments repeated
  across ≥min_docs docs) — AQE broadcasts the mark join when it fits,
  falls back to a narrow-payload shuffle join when it doesn't;
- reassembly is one groupBy(doc) whose state is bounded by the
  segments of a single document.

The exploded/hashed relation and the mark/reassemble aggregation are
shared with the incremental form (streaming/segments.py) via
:func:`explode_segments` / :func:`mark_and_reassemble` — the streaming
prefix-consistency contract (epoch output == batch over the prefix)
holds BY CONSTRUCTION because both run the same expressions, not two
copies that must be kept in sync.

Driver-side traffic: none (no collect anywhere).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ID, _POS, _SEG, _HS, _DUP = "_sd_id", "_sd_pos", "_sd_seg", "_sd_hs", "_sd_dup"


def _tokens(text: Column) -> Column:
    """Whitespace tokens, empty strings dropped (token_count parity)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def segment_columns(text: Column, mode: str = "chunk", k: int = 8) -> Column:
    """Array of segments for one document's text.

    ``line`` mode splits on ``\\n``; ``chunk`` mode joins consecutive
    ``k``-token windows back into strings (last chunk may be short).
    The empty-input guard matters: ``F.sequence(1, 0)`` yields the
    DESCENDING array [1, 0] in Spark (not an empty array), so a
    zero-token document must short-circuit to an empty segment list.
    """
    if mode == "line":
        return F.filter(F.split(text, r"\n"), lambda s: F.trim(s) != "")
    if mode != "chunk":
        raise ValueError(f"unknown segmentation mode: {mode!r}")
    if k < 1:
        raise ValueError(f"chunk size k must be >= 1, got {k}")
    toks = _tokens(text)
    n_seg = F.ceil(F.size(toks) / F.lit(float(k))).cast("int")
    return F.when(
        n_seg >= 1,
        F.transform(
            F.sequence(F.lit(1), n_seg),
            lambda i: F.array_join(F.slice(toks, (i - 1) * k + 1, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def explode_segments(
    docs: DataFrame, id_col: str, text_col: str, mode: str, k: int
) -> DataFrame:
    """(_sd_id, _sd_pos, _sd_seg, _sd_hs) — one row per segment, plus
    ONE (null pos/seg/hash) marker row for a zero-segment document so
    downstream aggregation preserves every input row.

    posexplode_outer (not inner): InferFiltersFromGenerate would clone
    the whole segmentation tree into an inferred ``size() > 0``
    pre-filter (see BENCH_NOTES.md, the generate_search_terms round-4
    regression). ``_sd_hs`` is null exactly for the marker rows — null
    join keys never match, so marker rows can't collide with a real
    frequent segment (``xxhash64(NULL)`` would be a constant shared by
    every empty doc)."""
    from .skew import widen_partitions

    return widen_partitions(docs).select(
        F.col(id_col).alias(_ID),
        F.posexplode_outer(segment_columns(F.col(text_col), mode, k)).alias(
            _POS, _SEG
        ),
    ).withColumn(_HS, F.when(F.col(_SEG).isNotNull(), F.xxhash64(F.col(_SEG))))


def frequent_segments(ex: DataFrame, min_docs: int) -> DataFrame:
    """(_sd_hs, _sd_dup=true) for segments in ≥ ``min_docs`` distinct
    docs of ``ex`` (marker rows excluded)."""
    return (
        ex.filter(F.col(_HS).isNotNull())
        .groupBy(_HS)
        .agg(F.count_distinct(F.col(_ID)).alias("_sd_df"))
        .filter(F.col("_sd_df") >= min_docs)
        .select(_HS, F.lit(True).alias(_DUP))
    )


def mark_and_reassemble(
    ex: DataFrame, frequent: DataFrame, id_col: str, mode: str
) -> DataFrame:
    """Left-join the frequent set onto the exploded relation and rebuild
    each document: (id_col, clean_text, n_segs, n_dropped). Zero-segment
    documents survive with ``clean_text = ''`` and ``n_segs = 0`` —
    their marker row has a null join key (no match) and null seg
    (excluded from the collect and the counts)."""
    marked = ex.join(frequent, _HS, "left")
    kept_struct = F.when(
        F.col(_DUP).isNull() & F.col(_SEG).isNotNull(),
        F.struct(F.col(_POS).alias("pos"), F.col(_SEG).alias("seg")),
    )
    return (
        marked.groupBy(_ID)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda x: x["seg"]
                ),
                " " if mode == "chunk" else "\n",
            ).alias("clean_text"),
            F.count(F.col(_SEG)).alias("n_segs"),
            F.count(F.col(_DUP)).alias("n_dropped"),
        )
        .withColumnRenamed(_ID, id_col)
    )


def segment_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "chunk",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Remove segments that appear in ≥ ``min_docs`` distinct documents;
    reassemble each document from its surviving segments in original
    order.

    Returns (id_col, clean_text, n_segs, n_dropped) with EXACTLY one
    output row per input row: a fully-boilerplate document survives
    with ``clean_text = ''``, and a zero-segment (empty/whitespace
    text) document with ``clean_text = ''``/``n_segs = 0`` — callers
    gate on the counts if they want to drop either; deleting rows here
    would silently change corpus counts downstream.

    Frequency is counted on ``xxhash64(segment)`` so the counting
    shuffle carries 8-byte keys instead of segment text; a 64-bit
    collision merges two segments' doc-frequencies (P ≈ n²/2⁶⁴ —
    negligible, and the same exposure every hash-based dedup in this
    package accepts).

    The persisted exploded relation carries segment TEXT (reassembly
    needs it), so its cache is O(corpus) — MEMORY_AND_DISK spills
    rather than OOMs. On a cluster where even disk cache is too dear,
    drop the persist and let the segmentation run twice (compute-for-
    storage trade; the counting leg alone could cache the narrow
    (hash, doc) projection instead).
    """
    from ..caching import tracked_persist

    # the exploded relation feeds BOTH the frequency count and the mark
    # join — persist it (tracked; callers release via
    # caching.release_caches()) so the segmentation runs once
    ex = tracked_persist(explode_segments(docs, id_col, text_col, mode, k))
    return mark_and_reassemble(ex, frequent_segments(ex, min_docs), id_col, mode)
