"""[EXT] Curated corpus → trainer-ready sharded JSONL, end to end.

The last mile of the training-data story: everything after curation is
deterministic layout, and each stage is one of this engine's own
verified operators —

    documents
      → curation funnel              (plans/curation.py: lang/quality
                                      gates, exact + near dedup)
      → corpus mixing                (operators/mixing.py: per-source
                                      token proportions, never upsample)
      → content-hash split           (functions/splits.py: leakage-safe
                                      train/val/test, rerun-stable)
      → PII redaction                (functions/pii.py, optional)
      → sliding-window chunking      (operators/chunking.py, optional:
                                      over-context docs → overlapping
                                      windows, split-safe by ordering)
      → token-budget shard packing   (operators/sharding.py: two-level
                                      prefix sum, per split)
      → gzip JSONL shards            (sources/sinks.py jsonl_sink,
                                      partitioned by shard id)

Layout: ``out/split=<label>/shard=<n>/part-*.json.gz`` — exactly the
directory shape training loaders glob. Shard ids restart per split (a
trainer never mixes splits in one stream).

Determinism end to end: every stage keys its decisions on content
(fingerprints, salted content hashes, the order column), so the same
corpus produces byte-stable membership on any cluster, partitioning,
or rerun — the property that makes a 100 TB export auditable.

The per-split loop is a driver-side loop over ≤ a handful of labels,
each iteration one independent distributed job (packing + write); the
splits could equally run concurrently from separate threads — they
share no state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.pii import redact_pii
from ..functions.splits import DEFAULT_FRACTIONS, content_split
from ..functions.text_analysis import doc_fingerprint
from ..operators.mixing import mix_corpora
from ..operators.sharding import pack_shards
from ..sources.sinks import jsonl_sink
from .curation import curate_documents


def export_training_set(
    docs: DataFrame,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    mix_weights: dict[str, float] | None = None,
    mix_temperature: float | None = None,
    source_col: str = "source",
    split_fractions: dict[str, float] | None = None,
    shard_token_budget: int = 1_000_000,
    redact: bool = True,
    curate_kwargs: dict | None = None,
    chunk_opts: dict | None = None,
    pack_opts: dict | None = None,
    shuffle_salt: str | None = None,
    token_counter: str = "whitespace",
) -> dict[str, int]:
    """Run the full export; returns {split label: exported row count}
    (documents — CHUNKS when ``chunk_opts`` is set, where one document
    fans out to several rows — packed SEQUENCES when ``pack_opts`` is
    set, where several rows collapse to one).

    ``mix_weights=None`` skips mixing (single-source corpora);
    ``mix_temperature`` is the weightless alternative (mutually
    exclusive): flatten the CURATED per-source proportions with
    ``total**alpha`` normalization (``operators.mixing
    .temperature_mix`` — mT5-style low-resource up-weighting, one
    totals scan). ``redact=False`` keeps original text. The curation funnel's knobs
    pass through ``curate_kwargs``. ``chunk_opts`` (kwargs for
    ``operators.chunking.chunk_documents``, e.g. ``{"window": 512,
    "stride": 384}``) splits over-context documents into overlapping
    token windows AFTER split assignment and redaction — every chunk
    inherits its document's split (chunking cannot leak content
    across splits) and chunks carry redacted text; ids become
    ``<doc id>#<zero-padded chunk idx>`` so shard packing keeps a
    deterministic per-document order, and ``n_tokens`` is recomputed
    per chunk. ``pack_opts`` (kwargs for ``operators.packing
    .pack_sequences`` plus an optional ``separator``, e.g.
    ``{"context": 2048}``) additionally packs the (chunked) rows into
    context-length training sequences — best-fit-decreasing per
    content-hash group — and collapses each sequence to ONE exported
    row (joined text, summed ``n_tokens``, member ids under
    ``doc_ids``); packing runs PER SPLIT, after the split filter, so a
    sequence never mixes splits.

    ``shuffle_salt`` (string) replaces the id-ordered shard layout
    with a DETERMINISTIC shuffle: the packing order key becomes
    ``sha256(salt || id)``, so shard contents and within-shard order
    are pseudo-random with respect to source/document order (trainers
    reading shards sequentially see an i.i.d.-ish stream without a
    shuffle buffer the size of the corpus) yet bit-stable for a given
    salt — rerun-identical, and a different salt is a fresh
    permutation. No extra pass: the key feeds the same range sort
    shard packing already does.

    ``token_counter`` names the counter that METERS the export —
    shard budgets, packed-sequence contexts, the exported ``n_tokens``
    column: ``"whitespace"`` (default), ``"bpe_ish"`` (sub-word-ish
    proxy: word pieces/numbers/punctuation counted separately — shard
    sizes land closer to a real tokenizer's, but still ±15-30% off on
    code/CJK), or ``"vocab:<merges path>"`` (EXACT byte-level BPE
    under a GPT-2-style merges file, functions/bpe.py — use this when
    the context budget must hold in the trainer's true token units;
    proxies can over-pack). The curation
    gates and chunk WINDOW boundaries stay whitespace-defined either
    way (they are corpus semantics, not budget units); under
    ``bpe_ish``, chunk text is recounted after chunking, and a
    ``pack_opts`` context is in bpe-ish units — size it accordingly
    (a whitespace window of W words can exceed W bpe-ish tokens, and
    the packing kernel refuses over-context rows loudly). Consumes
    its own intermediate
    persists (the funnel's) via the standard pool discipline — callers
    still call ``caching.release_caches()`` after, like any consuming
    action in this package.
    """
    if mix_weights and mix_temperature is not None:
        raise ValueError(
            "mix_weights and mix_temperature are mutually exclusive — "
            "explicit proportions or temperature-flattened ones, not both"
        )
    if mix_temperature is not None and mix_temperature < 0:
        # refuse before the funnel runs, not after hours of curation
        raise ValueError(f"mix_temperature must be >= 0, got {mix_temperature}")
    mixing = bool(mix_weights) or mix_temperature is not None
    curated = curate_documents(
        docs,
        id_col=id_col,
        text_col=text_col,
        carry_cols=(source_col,) if mixing else (),
        **(curate_kwargs or {}),
    )
    from ..caching import tracked_persist

    # the fingerprint feeds BOTH the mix selection and the split
    # assignment — compute it once per row and let every consumer read
    # the column (one full-text hash pass instead of two)
    curated = curated.withColumn("_fp", doc_fingerprint(F.col(text_col)))
    curated_cache = None
    if mixing:
        # mixing AFTER curation: the proportions are over the mass that
        # actually survives dedup/gating, which is what the trainer sees.
        # Persist FIRST: mix_rates collects per-source totals eagerly,
        # and without the cache that probe would execute the whole
        # funnel once for the totals and again for the packing pass
        # (round-5 review).
        curated_cache = tracked_persist(curated)
        if mix_weights:
            curated = mix_corpora(
                curated_cache, mix_weights, source_col=source_col,
                text_col=text_col, fingerprint_col="_fp",
            ).drop(source_col)
        else:
            from ..operators.mixing import temperature_mix

            curated = temperature_mix(
                curated_cache, mix_temperature, source_col=source_col,
                text_col=text_col, fingerprint_col="_fp",
            ).drop(source_col)
    from ..functions.text_analysis import resolve_token_counter

    counter = resolve_token_counter(token_counter)
    prepared = curated.withColumn(
        "split", content_split(F.col("_fp"), split_fractions)
    ).drop("_fp").withColumn(
        "n_tokens", counter(F.col(text_col)).cast("long")
    )
    if redact:
        prepared = prepared.withColumn(text_col, redact_pii(F.col(text_col)))
    if chunk_opts:
        from ..operators.chunking import apply_chunk_stage

        prepared = apply_chunk_stage(
            prepared, id_col, text_col, chunk_opts,
            # whitespace chunk counts are free (identity); any other
            # counter re-measures the chunk text
            recount=None if token_counter == "whitespace" else counter,
        )

    # one pass computes curation + split for every label; each split's
    # packing job then reads the cached relation instead of re-running
    # the funnel per label
    prepared = tracked_persist(prepared)

    if curated_cache is not None:
        # prepared subsumes curated — materialize it, then drop the
        # curated cache so the corpus isn't held twice through the
        # per-split packing loop (round-5 review)
        from ..caching import release_these

        prepared.count()
        release_these([curated_cache])

    counts: dict[str, int] = {}
    for label in (split_fractions or DEFAULT_FRACTIONS):
        subset = prepared.filter(F.col("split") == label).drop("split")
        pack_mark = None
        if pack_opts:
            from ..caching import pool_mark, release_since
            from ..operators.packing import apply_pack_stage

            # per split — a packed sequence must never mix splits.
            # Persist: the pack shuffle + BFD kernel feed pack_shards'
            # range sampling, its materialization, AND the count below
            # — without the barrier the stage would run three times
            pack_mark = pool_mark()
            subset = tracked_persist(
                apply_pack_stage(subset, id_col, text_col, pack_opts)
            )
        order_col = id_col
        if shuffle_salt is not None:
            from ..operators.sharding import shuffle_order_key

            # deterministic shuffle: pack in THE shared key's order
            order_col = "_shuffle_key"
            subset = subset.withColumn(
                order_col, shuffle_order_key(id_col, shuffle_salt)
            )
        packed = pack_shards(
            subset,
            token_col="n_tokens",
            budget=shard_token_budget,
            order_col=order_col,
        )
        if shuffle_salt is not None:
            packed = packed.drop(order_col)  # bookkeeping only
        jsonl_sink(
            packed, f"{out_path}/split={label}", partition_by=("shard",)
        )
        counts[label] = subset.count()
        if pack_mark is not None:
            release_since(pack_mark)
    return counts
