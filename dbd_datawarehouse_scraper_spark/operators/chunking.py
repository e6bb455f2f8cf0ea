"""[EXT] Sliding-window document chunking for training-data prep:
split each document into overlapping token windows with provenance —
the step between curation and ``pack_shards`` when documents exceed
the model's context length.

Pure built-in expressions end to end: whitespace tokenization
(``split``), window starts via ``sequence``, one ``posexplode_outer``
fan-out, ``slice`` + ``array_join`` per chunk. No UDF, no shuffle —
the operator is embarrassingly row-parallel and the output is
~``n_tokens/stride`` rows per document.

Window-start semantics (the common LM-prep convention, test-pinned
against a pure-Python model):

- starts are ``0, stride, 2·stride, …`` while they produce a USEFUL
  chunk: a chunk is emitted iff it is the document's first chunk, OR
  a full window fits (``start + window <= n``), OR it is the one
  tail chunk a shorter previous window did not already cover
  (``start - stride + window < n``). This kills the strict-subset
  tails a naive ``sequence(0, n-1, stride)`` emits (a 500-token doc
  at window 512 / stride 384 yields ONE chunk, not a chunk plus its
  own suffix);
- ``min_tokens`` additionally drops non-first tail chunks shorter
  than the floor — a quality knob (tiny tails are mostly padding);
  the FIRST chunk always survives, so no non-empty document vanishes;
- empty/whitespace-only documents yield zero chunks (posexplode_outer
  + an output-attribute null filter — the explode_outer form keeps
  Catalyst's InferFiltersFromGenerate from cloning the producing
  expression into an inferred filter, the round-4 plan trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 512,
    stride: int = 384,
    min_tokens: int | None = None,
) -> DataFrame:
    """Explode each document into overlapping token-window chunks.
    Returns the input columns MINUS ``text_col`` plus ``chunk_idx``
    (0-based, in document order), ``chunk_tokens`` (token count) and
    ``chunk_text``. Tokens are whitespace-delimited — the same cheap
    convention as the package's token counting; swap in a real
    tokenizer upstream by pre-tokenizing to an array column if exact
    BPE windows matter."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if not (1 <= stride <= window):
        raise ValueError(
            f"stride must be in [1, window]: stride={stride}, window={window}"
        )
    if min_tokens is None:
        min_tokens = min(32, window)  # adaptive default for tiny windows
    if not (1 <= min_tokens <= window):
        # min_tokens above the window would silently drop every
        # non-first chunk (full middle windows included) — a whole
        # corpus truncated to first chunks with no error (reviewed)
        raise ValueError(
            f"min_tokens must be in [1, window]: min_tokens={min_tokens}, "
            f"window={window}"
        )
    # strip ALL edge whitespace (trim() strips only spaces — a
    # trailing newline would otherwise leave a phantom '' token after
    # split, shifting every boundary and emitting junk tail chunks;
    # reviewed with a repro), then split: no-edge-whitespace input
    # cannot produce empty tokens, so token counts match len(s.split())
    cleaned = F.regexp_replace(F.col(text_col), r"^\s+|\s+$", "")
    toks = F.when(
        cleaned == "", F.array().cast("array<string>")
    ).otherwise(F.split(cleaned, r"\s+"))
    n = F.size(toks)
    # guard the n==0 case BEFORE sequence: sequence(0, -1, s) is a
    # DESCENDING [0, -1]-style surprise, not empty
    starts = F.when(n <= 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    )
    with_toks = df.withColumn("_ct", toks).withColumn("_cn", n)
    # posexplode_outer + null filter on the OUTPUT attribute — never
    # a bare explode (InferFiltersFromGenerate clones the producing
    # expression tree into an inferred size()>0 filter otherwise)
    exploded = with_toks.select(
        *df.columns, "_ct", "_cn",
        F.posexplode_outer(starts).alias("_cidx", "_cstart"),
    ).filter(F.col("_cstart").isNotNull())
    full_fits = F.col("_cstart") + F.lit(window) <= F.col("_cn")
    needed_tail = F.col("_cstart") - F.lit(stride) + F.lit(window) < F.col("_cn")
    piece = F.slice(F.col("_ct"), F.col("_cstart") + 1, window)
    kept = exploded.filter(
        (F.col("_cidx") == 0) | full_fits | needed_tail
    ).withColumn("_cpiece", piece)
    sized = kept.withColumn("_clen", F.size("_cpiece")).filter(
        (F.col("_cidx") == 0) | (F.col("_clen") >= min_tokens)
    )
    out_cols = [c for c in df.columns if c != text_col]
    return sized.select(
        *out_cols,
        F.col("_cidx").alias("chunk_idx"),
        F.col("_clen").alias("chunk_tokens"),
        F.array_join("_cpiece", " ").alias("chunk_text"),
    )


def apply_chunk_stage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_opts: dict,
    recount=None,
) -> DataFrame:
    """The export-pipeline chunk stage, shared VERBATIM by the batch
    plan (plans/training_export.py) and the incremental exporter
    (streaming/export.py) so their outputs cannot drift: run
    :func:`chunk_documents`, put the chunk text back under
    ``text_col``, replace the id with ``<doc>#<zero-padded idx>``
    (deterministic per-document shard order under a single string
    sort key), drop the chunk bookkeeping columns, and recount
    ``n_tokens`` on the final text. Stateless per-row — trivially
    replay-idempotent in the streaming composition.

    ``recount`` (a Column-producing callable, e.g.
    ``bpe_ish_token_count``) re-measures ``n_tokens`` on the chunk
    text with a DIFFERENT counter than the whitespace one the window
    boundaries use — for exporters metering shard budgets in
    sub-word-ish units. ``None`` keeps the free identity (chunk text
    is the whitespace-token slice re-joined, so ``chunk_tokens``
    already IS its whitespace count)."""
    out = chunk_documents(
        df.drop("n_tokens"), id_col=id_col, text_col=text_col, **chunk_opts
    )
    # chunk_tokens IS token_count(chunk_text): the chunk text is the
    # non-empty token slice joined by single spaces, so re-splitting
    # the whole output corpus to recount would be pure waste (reviewed).
    # format_string, not lpad: lpad TRUNCATES beyond the pad width —
    # %09d only pads, so ids stay unique (and ordered up to 1e9 chunks
    # per document) for any fan-out.
    out = (
        out.withColumnRenamed("chunk_text", text_col)
        .withColumn(
            id_col,
            F.concat_ws(
                "#",
                F.col(id_col).cast("string"),
                F.format_string("%09d", F.col("chunk_idx")),
            ),
        )
        .drop("chunk_idx")
        .withColumnRenamed("chunk_tokens", "n_tokens")
        .withColumn("n_tokens", F.col("n_tokens").cast("long"))
    )
    if recount is not None:
        out = out.withColumn(
            "n_tokens", recount(F.col(text_col)).cast("long")
        )
    return out
