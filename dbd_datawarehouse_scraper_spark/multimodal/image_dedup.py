"""[EXT] Perceptual image near-dedup: dHash + Hamming-LSH blocking.

Exact (byte-hash) dedup misses duplicate IMAGES whose bytes differ —
re-encoded (different PNG filter/compressor), resized, or slightly
brightness-shifted copies, the dominant duplicate classes in web
image corpora. The standard cheap answer is a perceptual difference
hash (dHash, Krawetz 2013 "Kind of Like That"):

1. decode + grayscale + downsample to a ``(HASH_W+1) × HASH_H`` luma
   grid (9×8 → 64 bits) — this is exactly the package's existing
   resize kernel family (:mod:`.media`: ``_png_resize`` stdlib
   decode+luma+nearest-neighbor, ``_pil_resize`` Pillow,
   ``_fake_resize`` deterministic stub), so every codec the media
   surface supports hashes through the same plumbing;
2. bit(r, c) = luma[r][c+1] > luma[r][c] — horizontal gradient signs,
   invariant to encoding, global brightness/contrast shifts that
   preserve gradient ORDER, and (via the shared downsample) scale;
3. near-duplicates are pairs within small Hamming distance — found
   with THE package's block-permutation machinery
   (:func:`..operators.dedup.hamming_pairs`, shared with SimHash):
   pigeonhole-exact candidate coverage at Hamming ≤ d, one
   bit_count(xor) verification, merge-hinted self-join (the
   compile-time-broadcast guard class).

Scale shape (100 TB honest): hashing is one Arrow-batched pandas UDF
over the payload column — partition-local, no shuffle, payloads read
once and never moved; the join operates on (id, 64-bit hash) rows
only (~16 B); survivor selection reuses the near-dup connected-
component machinery (operators/graph.py min-label propagation).
Decode failures flow through the per-row error channel (NULL hash +
message), never failing a partition — the decode_media contract.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .media import _fake_resize, _pil_resize, _png_resize, _resolve_codec

#: dHash grid: HASH_H rows × (HASH_W+1) columns of luma, HASH_W
#: horizontal gradient bits per row → HASH_W × HASH_H = 64 bits.
HASH_W = 8
HASH_H = 8

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("dhash", T.LongType(), True),
        T.StructField("dhash_error", T.StringType(), True),
    ]
)

_RESIZERS = {"pil": _pil_resize, "png": _png_resize, "fake": _fake_resize}


def _dhash_bits(luma_bytes: bytes) -> int:
    """Pack the row-major (HASH_W+1)×HASH_H luma grid into the 64-bit
    gradient-sign hash. Vectorized numpy — no per-bit Python loop."""
    g = np.frombuffer(luma_bytes, dtype=np.uint8).reshape(HASH_H, HASH_W + 1)
    bits = (g[:, 1:] > g[:, :-1]).flatten()
    # signed view: the bit pattern as a Spark LONG (top bit intact)
    return int(np.packbits(bits).view(">i8")[0])


def dhash_media(
    media: DataFrame, codec: str = "fake", id_col: str = "media_id"
) -> DataFrame:
    """Per-image perceptual hash: ``(<id_col>, dhash LONG,
    dhash_error STRING)`` via mapInPandas — one Arrow batch in/out,
    per-row try/except (one corrupt payload NULLs its own hash, never
    the partition). ``codec`` picks the decode+luma+downsample kernel:
    'png' (stdlib real-bytes), 'pil' (Pillow, import-gated), 'fake'
    (deterministic stub — exercises the plumbing without image
    libraries), 'auto'."""
    chosen = _resolve_codec(codec)
    resize = _RESIZERS.get(chosen, _fake_resize)
    schema = T.StructType(
        [T.StructField(id_col, T.LongType(), False)] + DHASH_SCHEMA.fields[1:]
    )
    cols = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                try:
                    luma = resize(row["payload"] or b"", HASH_W + 1, HASH_H)
                    out.append((row[id_col], _dhash_bits(luma), None))
                except Exception as exc:  # noqa: BLE001
                    out.append((row[id_col], None, str(exc)[:200]))
            yield pd.DataFrame(out, columns=cols)

    return media.select(id_col, "payload").mapInPandas(run, schema)


def image_near_dup_pairs(
    media: DataFrame,
    codec: str = "fake",
    max_hamming: int = 3,
    id_col: str = "media_id",
) -> DataFrame:
    """Perceptual near-duplicate pairs: dHash then the shared
    block-permutation Hamming join. Returns ``(id_a, id_b, hamming)``
    with id_a < id_b — EVERY pair within ``max_hamming`` bits, exactly
    (the blocking is pigeonhole-exhaustive, not probabilistic).
    Undecodable images have NULL hashes and never pair."""
    from ..operators.dedup import hamming_pairs

    return hamming_pairs(
        dhash_media(media, codec=codec, id_col=id_col),
        id_col,
        "dhash",
        max_hamming,
    )


def image_near_dedup(
    media: DataFrame,
    codec: str = "fake",
    max_hamming: int = 3,
    id_col: str = "media_id",
) -> DataFrame:
    """Drop all but one image per perceptual-duplicate cluster: one
    survivor per connected component of the near-dup pair graph, the
    component's minimum id (the text near-dedup survivor rule —
    operators/graph.py min-label propagation, so A~B, B~C collapses
    to ONE image even when A~C exceeds ``max_hamming``). Undecodable
    images are KEPT (they never pair; dropping data an operator could
    not read would be silent loss). Returns the input rows minus the
    non-survivors."""
    from ..operators.graph import component_survivors

    pairs = image_near_dup_pairs(
        media, codec=codec, max_hamming=max_hamming, id_col=id_col
    )
    losers = component_survivors(pairs, "id_a", "id_b")
    return media.join(
        losers.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )
