"""[EXT] N-gram language-model perplexity filtering — the CCNet recipe
(Wenzek et al. 2020) re-expressed as DataFrame joins.

The standard web-corpus quality gate trains a small LM on a trusted
reference corpus (CCNet: a KenLM 5-gram on Wikipedia) and keeps the
documents whose perplexity under that model is low — a corpus-grounded
signal that catches gibberish, OCR noise and boilerplate that
per-document surface features (:func:`..text_analysis.quality_score`)
miss, and that, unlike :func:`..text_analysis.token_rarity_scores`,
weights tokens by CONTEXT, not just frequency.

Model: a word-bigram stupid-backoff LM (Brants et al. 2007). Stupid
backoff is the scale-era choice on purpose — no discounting state to
normalize, the "probabilities" are plain count ratios, so the model is
two count tables and two scalars and the score is exact integer
arithmetic until the final log:

    S(w | w_prev) = c(w_prev w) / c(w_prev)        if the bigram is seen
                  = alpha * c(w) / N               else if w is seen
                  = alpha / N                      else (OOV floor)

and the first token of a document scores S(w) = c(w)/N (or the OOV
floor). Document score = mean negative log2 S over tokens (bits/token
cross-entropy); perplexity = 2**cross_entropy.

Determinism: per-token log-scores are quantized to 1e-6 bigints BEFORE
the per-document sum, so the aggregate is integer arithmetic —
partition- and rerun-invariant (double sums are order-sensitive; every
selection-feeding score in this package is quantized for exactly this
reason). Two engines computing log2 of the same ratio can still differ
in the last ulp, which is why the registry entry is rows-only and the
correctness pin is the pure-Python model in tests/test_lm.py.

Plan shape at scale (the part that matters at 100 TB):

- fit: one explode to (token), one map-side-combined groupBy for
  unigrams (shuffle = |vocab|), one for bigrams (shuffle = |bigram
  vocab|); totals are a 2-scalar aggregate. Nothing quadratic.
- score: one explode to (doc, pos, token), one doc-keyed window for
  the previous token (doc-bounded), three equi-joins against the
  model tables (AQE broadcasts them when the reference corpus is
  small — the usual case: the model is Wikipedia-sized, the corpus is
  the 100 TB crawl), one per-doc groupBy. Every shuffle is on a
  single key column.

The fitted model persists as parquet tables under one directory with a
format marker pinning (order, alpha, totals) — the established
fit-once / score-many contract (:func:`..operators.clustering
.save_centers` and the streaming stores use the same shape).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: Stupid-backoff discount (Brants et al. 2007 used 0.4; the value is
#: folklore-stable and not worth exposing as a knob that changes
#: persisted-model semantics silently — it is pinned in the marker).
_ALPHA = 0.4

#: Quantization for per-token log2-scores: 1e-6 bits is far below any
#: decision threshold anyone sets on perplexity, and makes the
#: per-document sum exact integer arithmetic.
_QUANT = 1_000_000

_MARKER_VERSION = 1


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, _pos, _tok) — whitespace tokens with their in-document
    position. posexplode_outer + a null filter on the OUTPUT attribute
    (the InferFiltersFromGenerate-safe form: the inner explode lets the
    optimizer clone the whole split/filter tree into an inferred
    ``size() > 0`` filter and tokenize every document twice)."""
    return docs.select(
        F.col(id_col),
        F.posexplode_outer(
            F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != "")
        ).alias("_pos", "_tok"),
    ).filter(F.col("_tok").isNotNull())


def ngram_lm_fit(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> dict:
    """Fit the bigram stupid-backoff LM on a reference corpus and
    return the model as a dict of two count DataFrames and two scalars:
    ``{"unigrams": DF(_tok, _c), "bigrams": DF(_gram, _c),
    "n_tokens": long, "alpha": float}``.

    ``min_count`` prunes hapax n-grams from the persisted tables
    (CCNet prunes its KenLM the same way); pruned grams fall through
    to the backoff path at scoring time, which is exactly the
    smoothing story, so pruning trades model size for score sharpness
    monotonically. Totals are computed BEFORE pruning — the
    denominator is the reference corpus, not the table.

    One explode, two map-side-combined groupBys, one 1-row aggregate;
    the model is reference-corpus-sized, never crawl-sized.

    The returned count tables are LAZY: scoring directly against them
    re-runs the fit explode inside every model-side join (fine for a
    one-shot run over a small reference). The score-many path is
    :func:`save_lm` + :func:`load_lm` — persisted tables join from
    parquet, and the score plan carries exactly one Generate
    (plan-pinned in tests/test_lm.py).
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    # the fit needs no caller id column — a per-row surrogate id only
    # delimits documents for the lag window; the COUNTS are invariant
    # to its values, so monotonically_increasing_id's partition
    # dependence is harmless here (unlike in any selection)
    toks = _doc_tokens(
        docs.select(F.monotonically_increasing_id().alias("_lm_doc"), text_col),
        "_lm_doc",
        text_col,
    )
    w = Window.partitionBy("_lm_doc").orderBy("_pos")
    pairs = toks.select(
        F.col("_tok"), F.lag("_tok").over(w).alias("_prev")
    )
    unigrams = pairs.groupBy("_tok").agg(F.count("*").cast("long").alias("_c"))
    bigrams = (
        pairs.filter(F.col("_prev").isNotNull())
        .groupBy(F.concat_ws(" ", "_prev", "_tok").alias("_gram"))
        .agg(F.count("*").cast("long").alias("_c"))
    )
    totals = unigrams.agg(F.sum("_c").alias("n")).collect()[0]
    n_tokens = int(totals["n"] or 0)
    if n_tokens == 0:
        raise ValueError("reference corpus has no tokens — cannot fit an LM")
    if min_count > 1:
        unigrams = unigrams.filter(F.col("_c") >= min_count)
        bigrams = bigrams.filter(F.col("_c") >= min_count)
    return {
        "unigrams": unigrams,
        "bigrams": bigrams,
        "n_tokens": n_tokens,
        "alpha": _ALPHA,
    }


def save_lm(spark: SparkSession, model: dict, path: str) -> None:
    """Persist a fitted model: ``unigrams/`` and ``bigrams/`` parquet
    tables plus a 1-row ``_meta`` marker parquet pinning (version,
    alpha, n_tokens) — loading refuses anything unversioned or
    parameter-drifted, the same loud-refusal contract as the streaming
    stores. Marker written LAST: a crash mid-save leaves a markerless
    directory that :func:`load_lm` refuses. On RE-save, any existing
    marker is deleted FIRST — otherwise a crash between the table
    overwrites and the marker rewrite would leave new tables under the
    old still-valid marker (wrong alpha/n_tokens scoring silently; the
    ivf_build torn-rebuild class)."""
    from ..fsutil import fs_delete

    fs_delete(spark, f"{path}/_meta")
    model["unigrams"].write.mode("overwrite").parquet(f"{path}/unigrams")
    model["bigrams"].write.mode("overwrite").parquet(f"{path}/bigrams")
    spark.createDataFrame(
        [(_MARKER_VERSION, float(model["alpha"]), int(model["n_tokens"]))],
        "version INT, alpha DOUBLE, n_tokens LONG",
    ).repartition(1).write.mode("overwrite").parquet(f"{path}/_meta")


def load_lm(spark: SparkSession, path: str) -> dict:
    """Load a model persisted by :func:`save_lm`; refuses a missing or
    version-drifted marker loudly instead of scoring with garbage."""
    try:
        meta = spark.read.parquet(f"{path}/_meta").collect()
    except Exception as exc:  # noqa: BLE001 — any unreadable marker refuses
        raise ValueError(
            f"no LM marker at {path}/_meta — not a save_lm directory "
            f"(or a crashed save; refit and re-save)"
        ) from exc
    if len(meta) != 1 or meta[0]["version"] != _MARKER_VERSION:
        raise ValueError(
            f"LM marker at {path} has version "
            f"{meta[0]['version'] if meta else '?'}, expected {_MARKER_VERSION}"
        )
    return {
        "unigrams": spark.read.parquet(f"{path}/unigrams"),
        "bigrams": spark.read.parquet(f"{path}/bigrams"),
        "n_tokens": int(meta[0]["n_tokens"]),
        "alpha": float(meta[0]["alpha"]),
    }


def ngram_lm_score(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document under the fitted model. Returns
    ``(id_col, n_tokens LONG, cross_entropy DOUBLE, perplexity
    DOUBLE)`` — cross-entropy in bits/token (mean -log2 S), perplexity
    = 2**cross_entropy. Empty, whitespace-only and NULL-text documents
    produce no token rows and are therefore ABSENT from the output
    (there is no group to aggregate) — callers joining scores back
    must left-join (or use :func:`perplexity_filter`, whose
    ``keep_empty`` decides those rows' fate explicitly).

    The per-token -log2 is quantized to a 1e-6 bigint before the
    per-document sum, so scores are partition- and rerun-invariant
    (see module docstring): one libm log2 call per token, and the
    quantization absorbs any last-ulp wobble before the aggregate.
    """
    n_ref = int(model["n_tokens"])
    alpha = float(model["alpha"])
    uni = model["unigrams"]
    big = model["bigrams"]

    toks = _doc_tokens(docs, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy("_pos")
    pairs = toks.select(
        id_col,
        "_tok",
        F.lag("_tok").over(w).alias("_prev"),
    )
    scored = (
        pairs.join(uni.select(F.col("_tok"), F.col("_c").alias("_cw")), "_tok", "left")
        .join(
            uni.select(
                F.col("_tok").alias("_prev"), F.col("_c").alias("_cprev")
            ),
            "_prev",
            "left",
        )
        .join(
            big.select(F.col("_gram"), F.col("_c").alias("_cbi")),
            F.concat_ws(" ", "_prev", "_tok") == F.col("_gram"),
            "left",
        )
    )
    # stupid backoff, exactly the module-docstring cases; the bigram
    # path needs BOTH counts (a pruned-unigram context with a surviving
    # bigram cannot happen with a shared min_count, but belt-and-braces
    # keeps pruned models well-defined)
    s = (
        F.when(
            F.col("_prev").isNotNull()
            & F.col("_cbi").isNotNull()
            & F.col("_cprev").isNotNull(),
            F.col("_cbi").cast("double") / F.col("_cprev"),
        )
        .when(
            F.col("_cw").isNotNull(),
            F.when(F.col("_prev").isNotNull(), F.lit(alpha)).otherwise(F.lit(1.0))
            * F.col("_cw").cast("double")
            / F.lit(float(n_ref)),
        )
        .otherwise(
            F.when(F.col("_prev").isNotNull(), F.lit(alpha)).otherwise(F.lit(1.0))
            / F.lit(float(n_ref))
        )
    )
    q = F.round(-F.log2(s) * _QUANT).cast("long").alias("_q")
    return (
        scored.select(id_col, q)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("_q").alias("_sq"),
        )
        .select(
            id_col,
            "n_tokens",
            F.round(
                F.col("_sq").cast("double") / F.col("n_tokens") / _QUANT, 6
            ).alias("cross_entropy"),
            F.round(
                F.pow(
                    F.lit(2.0),
                    F.col("_sq").cast("double") / F.col("n_tokens") / _QUANT,
                ),
                6,
            ).alias("perplexity"),
        )
    )


def perplexity_filter(
    docs: DataFrame,
    model: dict,
    max_perplexity: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_empty: bool = False,
) -> DataFrame:
    """The gate form: keep documents whose perplexity under the
    reference model is at most ``max_perplexity`` (CCNet's "head"
    selection, as a hard threshold). Empty, whitespace-only and
    NULL-text documents have no score; ``keep_empty`` decides their
    fate explicitly instead of letting a NULL comparison silently drop
    them (the round-5 null-vanish class). Returns the input columns
    unchanged.

    One score pass + a semi join back on ``id_col`` — the corpus rows
    never carry the score columns, so downstream schemas are stable.
    """
    if max_perplexity <= 0:
        raise ValueError(f"max_perplexity must be > 0, got {max_perplexity}")
    from ..operators.gating import score_threshold_gate

    scores = ngram_lm_score(docs, model, id_col=id_col, text_col=text_col)
    return score_threshold_gate(
        docs, scores, "perplexity", id_col, text_col,
        max_value=float(max_perplexity), keep_empty=keep_empty,
    )


def lm_reference_model(corpus_tokens: list[list[str]]) -> dict:
    """Pure-Python twin of fit+score for the tests: returns
    ``{"uni": {tok: c}, "bi": {(prev, tok): c}, "n": N}``. Lives here
    (not in tests/) so the quantization constant and backoff cases can
    never drift from the Spark implementation silently — the test
    imports BOTH from this module."""
    uni: dict = {}
    bi: dict = {}
    n = 0
    for toks in corpus_tokens:
        prev = None
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
            n += 1
            if prev is not None:
                bi[(prev, t)] = bi.get((prev, t), 0) + 1
            prev = t
    return {"uni": uni, "bi": bi, "n": n}


def lm_reference_score(model: dict, toks: list[str]) -> tuple:
    """Pure-Python per-document score twin (quantized identically).
    Returns (n_tokens, cross_entropy, perplexity) — None scores for
    empty docs, mirroring the DataFrame NULLs."""
    uni, bi, n_ref = model["uni"], model["bi"], model["n"]
    if not toks:
        return 0, None, None
    total_q = 0
    prev = None
    for t in toks:
        if prev is not None and (prev, t) in bi and prev in uni:
            s = bi[(prev, t)] / uni[prev]
        elif t in uni:
            s = (_ALPHA if prev is not None else 1.0) * uni[t] / float(n_ref)
        else:
            s = (_ALPHA if prev is not None else 1.0) / float(n_ref)
        # Spark's round() is HALF_UP; Python's round() is half-even —
        # floor(v + 0.5) matches HALF_UP for the non-negative v here
        total_q += int(math.floor(-math.log2(s) * _QUANT + 0.5))
        prev = t
    ce = round(total_q / len(toks) / _QUANT, 6)
    ppl = round(2.0 ** (total_q / len(toks) / _QUANT), 6)
    return len(toks), ce, ppl


def resolve_lm_opts(spark: SparkSession, opts: dict) -> dict:
    """THE one validation + resolution of an ``lm_opts`` dict — the
    batch funnel and the stream exporter both call it, so batch and
    stream refusal semantics cannot drift. Requires
    ``max_perplexity`` and exactly one NON-NULL of ``model`` /
    ``model_path`` (an explicit ``model=None`` counts as absent);
    loads a persisted model. Returns ``{"model": <dict>,
    "max_perplexity": <float>}``."""
    l = dict(opts)
    if "max_perplexity" not in l:
        raise ValueError("lm_opts requires 'max_perplexity'")
    has_model = l.get("model") is not None
    has_path = l.get("model_path") is not None
    if has_model == has_path:
        raise ValueError(
            "lm_opts requires exactly one of 'model' (an "
            "ngram_lm_fit result) or 'model_path' (a save_lm dir)"
        )
    return {
        "model": l["model"] if has_model else load_lm(spark, l["model_path"]),
        "max_perplexity": float(l["max_perplexity"]),
    }
