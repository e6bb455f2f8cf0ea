"""[EXT] Quality-quantile bucketing + per-bucket deterministic sampling.

The CCNet recipe: score every document with a cheap quality heuristic,
cut the corpus into score quantiles (head/middle/tail), and keep each
quantile at its own rate — aggressive on the low-quality tail, lossless
on the head — instead of one global threshold that either starves the
corpus or keeps the junk.

Two properties are non-negotiable at 100 TB and drive the design:

1. **Bucketing must not global-sort.** ``ntile() OVER (ORDER BY score)``
   is the textbook definition and a single-reducer sort of the corpus.
   Here buckets are VALUE-based quantiles computed with the same
   two-level trick as ``pack_shards``: quantize the score to a bigint,
   aggregate a per-score histogram (small — the score space is bounded),
   prefix-sum the HISTOGRAM (the only single-partition exchange, over
   ≤|distinct scores| rows), and broadcast the (score → bucket) map
   back. Ties share a bucket by construction, which also makes the
   assignment partition- and rerun-invariant (ntile splits ties by
   physical position).

   The bucket of a document with quantized score s is

       bucket(s) = ceil(B · |{docs with score ≤ s}| / N)

   computed in pure 64-bit integer arithmetic
   (``(B·cum + N - 1) div N``) — no float quantile boundaries to
   diverge across engines. Equivalent to
   ``ceil(B * cume_dist() OVER (ORDER BY score_q))`` (the oracle form).

2. **Sampling must be content-keyed.** Per-bucket membership is a pure
   function of the document fingerprint (hex window [9, 16] of the
   sha256 — a window DISJOINT from the one ``content_split`` uses, so
   sampling never correlates with the train/val/test assignment),
   bucketed to [0, 10000) basis points: rerun-stable, cluster-stable,
   and auditable, like every other selection in this package.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BP = 10_000  # basis points: rates are integers in [0, 10000]

#: Default per-bucket keep rates (basis points), low → high quality.
#: The CCNet-ish shape: drop most of the tail, keep the head whole.
DEFAULT_RATES_BP: tuple[int, ...] = (1000, 2500, 5000, 10000)


def sample_bucket(fingerprint: Column) -> Column:
    """[0, 10000) sampling bucket from hex chars 9-16 of a sha256-hex
    fingerprint (chars 1-8 belong to ``content_split`` — disjoint
    windows keep the two assignments independent)."""
    return F.conv(F.substring(fingerprint, 9, 8), 16, 10).cast("long") % _BP


def quality_bucket_sample(
    docs: DataFrame,
    score_q: Column,
    fingerprint: Column,
    id_cols: Sequence[str] = ("doc_id",),
    rates_bp: Sequence[int] = DEFAULT_RATES_BP,
) -> DataFrame:
    """Keep each quality-quantile bucket of ``docs`` at its own rate.

    ``score_q`` must be an integer-quantized quality score (e.g.
    ``round(quality_score(text)·1e6)``) — integer so histogram keys and
    bucket arithmetic are exact. ``rates_bp`` lists keep-rates in basis
    points for buckets 1..B, lowest quality first.

    Returns the KEPT rows: (*id_cols, score_q, q_bucket). Output size
    ≈ Σ_b rate_b·|bucket_b|; the dropped mass is recoverable by anti-
    joining the input (not materialized here).
    """
    n_buckets = len(rates_bp)
    for r in rates_bp:
        if not (0 <= int(r) <= _BP):
            raise ValueError(f"rate out of [0, {_BP}]: {r}")
    from ..caching import tracked_persist

    # The scored relation feeds the histogram AND the final join, and
    # the score/fingerprint expressions are regex/sha-heavy — persist
    # (tracked; callers release via caching.release_caches()) so they
    # evaluate once per row, not once per consumer.
    scored = tracked_persist(
        docs.select(
            *[F.col(c) for c in id_cols],
            score_q.cast("long").alias("score_q"),
            sample_bucket(fingerprint).alias("_samp"),
        )
    )
    # Histogram → prefix sum → bucket map. The window's single-partition
    # exchange runs over the histogram (≤ |distinct score_q| rows), not
    # the corpus — the pack_shards pattern.
    hist = scored.groupBy("score_q").agg(F.count("*").alias("_n"))
    w = Window.orderBy("score_q").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "score_q",
        F.sum("_n").over(w).alias("_cum"),
        F.sum("_n").over(Window.partitionBy()).alias("_total"),
    )
    bucket_map = cum.select(
        "score_q",
        F.expr(f"({n_buckets}L * _cum + _total - 1L) div _total")
        .cast("int")
        .alias("q_bucket"),
    )
    rate_of_bucket = F.element_at(
        F.array(*[F.lit(int(r)) for r in rates_bp]), F.col("q_bucket")
    )
    return (
        scored.join(F.broadcast(bucket_map), "score_q")
        .filter(F.col("_samp") < rate_of_bucket)
        .select(*id_cols, "score_q", "q_bucket")
    )
