"""[EXT] DSIR — Data Selection via Importance Resampling (Xie et al.
2023) re-expressed as DataFrame aggregates and one broadcast join.

The third rung of the corpus-grounded selection ladder this engine
ships: token_rarity (context-free frequency), the bigram LM
(functions/lm.py — context-weighted fluency), and now DSIR — "does
this raw document LOOK LIKE the target corpus", the standard recipe
for carving a Wikipedia-or-books-like subset out of a 100 TB crawl:

1. featurize every document into HASHED n-gram buckets (unigrams +
   bigrams hashed into ``n_buckets``) — the paper's bag-of-hashed-
   ngrams generative model;
2. fit bucket distributions p_target and p_raw (Laplace-smoothed
   counts from one aggregate per corpus);
3. score each raw document with the log importance weight
   ``log w(x) = Σ_grams log(p_target[b(gram)] / p_raw[b(gram)])``;
4. keep the best — here a deterministic threshold gate or a
   quantile-fraction selection via the existing histogram machinery
   (``operators.sampling.quality_bucket_sample`` over the score),
   instead of the paper's Gumbel resampling: every selection in this
   package is content-deterministic and rerun/partition-invariant.

Scale shape: the model is ``n_buckets`` rows (default 10k — broadcast
side of every score join); fits are one explode + one map-side-
combined groupBy per corpus (shuffle = n_buckets); scoring is one
explode, ONE BroadcastHashJoin against the model, one per-doc sum.
Nothing is ever corpus × corpus.

Determinism: bucket ids come from the engine-portable sha256 prefix
(``conv(substring(sha2(gram), 1, 8), 16, 10) % n_buckets`` — the
package's oracle-visible hashing convention, mirrorable in DuckDB and
pinned by a mirror test), and per-bucket log-ratios are quantized to
1e-6 bigints IN THE MODEL, so every document score is an exact
integer sum — partition- and rerun-invariant.

Model persistence follows the save_lm contract (functions/lm.py):
``buckets/`` parquet + a 1-row ``_meta`` marker written LAST, loud
refusal on a missing or drifted marker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Quantization for per-bucket log ratios: exact integer sums.
_QUANT = 1_000_000

_MARKER_VERSION = 1

_DEFAULT_BUCKETS = 10_000


def _hashed_grams(
    docs: DataFrame, id_col, text_col: str, n_buckets: int, carry: list | None = None
):
    """(id[, *carry], _bucket) — one row per unigram AND bigram
    occurrence, hashed into ``n_buckets`` via the sha256-prefix
    convention. ``carry`` names extra per-document columns to thread
    through unchanged (the single-pass fit+score path carries the
    target flag). The outer-explode + output-attribute null filter
    form (the InferFiltersFromGenerate trap)."""
    # stage the tokenize once (the repetition_stats precedent: without
    # the projection barrier the split/filter tree is re-inlined into
    # every consumer), and build bigrams with THE shared builder —
    # coalesced to empty (its short-doc NULL would null the concat and
    # drop the unigrams with it)
    from ..functions.text_analysis import word_bigrams

    carry = carry or []
    words = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != "")
    staged = docs.select(id_col, *carry, words.alias("_w"))
    w = F.col("_w")
    bigrams = F.coalesce(word_bigrams(w), F.array().cast("array<string>"))
    exploded = staged.select(
        id_col, *carry, F.explode_outer(F.concat(w, bigrams)).alias("_gram")
    ).filter(F.col("_gram").isNotNull())
    bucket = (
        F.conv(F.substring(F.sha2(F.col("_gram"), 256), 1, 8), 16, 10)
        .cast("long")
        % n_buckets
    )
    return exploded.select(id_col, *carry, bucket.alias("_bucket"))


def dsir_fit(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = _DEFAULT_BUCKETS,
) -> dict:
    """Fit the hashed-n-gram importance model: per-bucket quantized
    ``log(p_target/p_raw)`` with Laplace smoothing ``(c+1)/(N+B)`` on
    both sides (every bucket is defined even when unseen — an unseen-
    in-target bucket scores NEGATIVE, it doesn't vanish). Returns
    ``{"buckets": DF(_bucket, _lrq), "n_buckets", "n_target",
    "n_raw"}``. Two explode+groupBy aggregates (shuffle = n_buckets
    each) and one n_buckets-row join — the corpora are scanned once
    each and never joined to each other.

    The returned buckets relation is LAZY (re-runs its fit inside
    every consumer) — the score-many path is :func:`save_dsir` +
    :func:`load_dsir`, same contract as the LM."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    spark = target.sparkSession

    def _counts(df: DataFrame, name: str):
        g = _hashed_grams(
            df.select(F.lit(1).alias("_one"), text_col), "_one", text_col,
            n_buckets,
        )
        return g.groupBy("_bucket").agg(F.count("*").cast("long").alias(name))

    from ..caching import tracked_persist

    # pin the two count relations: the totals collect below AND the
    # buckets join both consume them — without the barrier each corpus
    # would be re-scanned per consumer (standard pool discipline: the
    # caller's release_caches() after the consuming action reclaims)
    tc = tracked_persist(_counts(target, "_tc"))
    rc = tracked_persist(_counts(raw, "_rc"))
    totals = {
        "t": tc.agg(F.sum("_tc")).collect()[0][0] or 0,
        "r": rc.agg(F.sum("_rc")).collect()[0][0] or 0,
    }
    if totals["t"] == 0:
        raise ValueError("target corpus has no tokens — cannot fit DSIR")
    if totals["r"] == 0:
        raise ValueError("raw corpus has no tokens — cannot fit DSIR")
    # dense bucket table: every id in [0, B) present, so the score join
    # never misses (unseen-anywhere buckets get the smoothing floor)
    all_b = spark.range(n_buckets).select(F.col("id").alias("_bucket"))
    joined = (
        all_b.join(tc, "_bucket", "left").join(rc, "_bucket", "left")
        .select(
            "_bucket",
            F.coalesce(F.col("_tc"), F.lit(0)).alias("_tc"),
            F.coalesce(F.col("_rc"), F.lit(0)).alias("_rc"),
        )
    )
    lr = F.log(
        (F.col("_tc") + 1).cast("double") / F.lit(float(totals["t"] + n_buckets))
    ) - F.log(
        (F.col("_rc") + 1).cast("double") / F.lit(float(totals["r"] + n_buckets))
    )
    buckets = joined.select(
        "_bucket",
        F.round(lr * _QUANT).cast("long").alias("_lrq"),
    )
    return {
        "buckets": buckets,
        "n_buckets": n_buckets,
        "n_target": int(totals["t"]),
        "n_raw": int(totals["r"]),
    }


def dsir_fit_score(
    docs: DataFrame,
    target_flag,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = _DEFAULT_BUCKETS,
) -> DataFrame:
    """Single-pass DSIR for the self-referential selection shape
    ("score every document by how target-like it is, target = a flagged
    subset of the same corpus"). The two-step composition —
    ``dsir_fit(docs.filter(flag), docs)`` then ``dsir_score(docs,
    model)`` — featurizes the corpus THREE times (target counts, raw
    counts, scoring). Here the hashed-gram relation is computed ONCE,
    persisted, and consumed by one fused count aggregate (both
    corpora's bucket counts in a single shuffle: the target count is a
    conditional sum over the carried flag) and the score join.
    Bit-identical output to the composition — same bucketing, Laplace
    smoothing, quantization and integer sums — pinned in
    tests/test_dsir.py. Caller releases with ``release_caches()`` after
    the consuming action (the package persist contract)."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    spark = docs.sparkSession
    from ..caching import tracked_persist

    # NOTE (opt r13, measured): pre-aggregating the gram stream to
    # (id, flag, bucket, n) before this barrier — the r12 verdict's
    # item 5 — was tried and REVERTED: the per-occurrence relation is
    # never exchanged raw (both consumers aggregate it with map-side
    # partial aggregation first), so the pre-aggregate added a full
    # extra exchange at fill time and read 3.23 s → 3.98 s min-of-5.
    grams = tracked_persist(
        _hashed_grams(
            docs.withColumn("_is_t", target_flag.cast("boolean")),
            id_col,
            text_col,
            n_buckets,
            carry=["_is_t"],
        )
    )
    # ONE corpus job: collect the fused per-bucket counts directly
    # (n_buckets rows — bounded) instead of persisting them and
    # running a second totals aggregate + a spark.range left-join
    # (opt r13, guide §5: the fit's residual cost was driver round
    # trips, not data). Totals are exact Python integer sums of the
    # collected longs; the densified (bucket, tc, rc) table goes back
    # through a LOCAL n_buckets-row relation evaluating the SAME JVM
    # log/round/cast expressions the distributed form used — identical
    # doubles, identical _lrq integers (pinned vs the fit/score
    # composition in tests/test_dsir.py).
    counts_rows = (
        grams.groupBy("_bucket")
        .agg(
            F.sum(F.when(F.col("_is_t"), 1).otherwise(0))
            .cast("long")
            .alias("_tc"),
            F.count("*").cast("long").alias("_rc"),
        )
        .collect()
    )
    totals = {
        "t": sum(r["_tc"] for r in counts_rows),
        "r": sum(r["_rc"] for r in counts_rows),
    }
    if totals["t"] == 0:
        raise ValueError("target corpus has no tokens — cannot fit DSIR")
    if totals["r"] == 0:
        raise ValueError("raw corpus has no tokens — cannot fit DSIR")
    by_bucket = {int(r["_bucket"]): (r["_tc"], r["_rc"]) for r in counts_rows}
    dense = [
        (b, *by_bucket.get(b, (0, 0))) for b in range(n_buckets)
    ]
    local = spark.createDataFrame(
        dense, "_bucket LONG, _tc LONG, _rc LONG"
    )
    lr = F.log(
        (F.col("_tc") + 1).cast("double") / F.lit(float(totals["t"] + n_buckets))
    ) - F.log(
        (F.col("_rc") + 1).cast("double") / F.lit(float(totals["r"] + n_buckets))
    )
    buckets = local.select(
        "_bucket", F.round(lr * _QUANT).cast("long").alias("_lrq")
    )
    # literal-array ratio lookup instead of the broadcast join (see
    # dsir_score): the collect evaluates the same JVM expressions the
    # join would have broadcast — identical integers, no exchange job
    ws = [r["_lrq"] for r in buckets.orderBy("_bucket").collect()]
    scored = grams.select(id_col, "_bucket").withColumn(
        "_lrq",
        F.element_at(F.lit(ws), (F.col("_bucket") + 1).cast("int")),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("_lrq").alias("_s"),
        )
        .select(
            id_col,
            "n_grams",
            F.round(F.col("_s").cast("double") / _QUANT, 6).alias("log_weight"),
            F.round(
                F.col("_s").cast("double") / F.col("n_grams") / _QUANT, 6
            ).alias("avg_log_weight"),
        )
    )


def save_dsir(spark: SparkSession, model: dict, path: str) -> None:
    """Persist: ``buckets/`` parquet + ``_meta`` marker written LAST
    (a crash mid-save leaves a markerless dir that :func:`load_dsir`
    refuses loudly). On RE-save, any existing marker is deleted FIRST
    — otherwise a crash between the buckets overwrite and the marker
    rewrite would leave NEW buckets under the OLD still-valid marker
    (the ivf_build torn-rebuild class)."""
    from ..fsutil import fs_delete

    fs_delete(spark, f"{path}/_meta")
    model["buckets"].write.mode("overwrite").parquet(f"{path}/buckets")
    spark.createDataFrame(
        [(
            _MARKER_VERSION,
            int(model["n_buckets"]),
            int(model["n_target"]),
            int(model["n_raw"]),
        )],
        "version INT, n_buckets INT, n_target LONG, n_raw LONG",
    ).repartition(1).write.mode("overwrite").parquet(f"{path}/_meta")


def load_dsir(spark: SparkSession, path: str) -> dict:
    """Load a :func:`save_dsir` directory; refuses a missing or
    version-drifted marker."""
    try:
        meta = spark.read.parquet(f"{path}/_meta").collect()
    except Exception as exc:  # noqa: BLE001 — any unreadable marker refuses
        raise ValueError(
            f"no DSIR marker at {path}/_meta — not a save_dsir "
            f"directory (or a crashed save; refit and re-save)"
        ) from exc
    if len(meta) != 1 or meta[0]["version"] != _MARKER_VERSION:
        raise ValueError(
            f"DSIR marker at {path} has version "
            f"{meta[0]['version'] if meta else '?'}, expected {_MARKER_VERSION}"
        )
    buckets = spark.read.parquet(f"{path}/buckets")
    n_rows = buckets.count()  # the model is n_buckets rows — cheap
    if n_rows != int(meta[0]["n_buckets"]):
        raise ValueError(
            f"DSIR store at {path} is torn: marker says "
            f"{meta[0]['n_buckets']} buckets but the table has {n_rows} "
            f"rows — a crashed re-save; refit and re-save."
        )
    return {
        "buckets": buckets,
        "n_buckets": int(meta[0]["n_buckets"]),
        "n_target": int(meta[0]["n_target"]),
        "n_raw": int(meta[0]["n_raw"]),
    }


def _model_ratio_list(model: dict) -> list:
    """The model's per-bucket quantized log ratios as a dense
    bucket-ordered Python list, memoized in the model dict. The values
    come from collecting the SAME buckets relation the broadcast join
    consumed (the log/round/cast stay JVM expressions), so the
    literal-array score path is bit-identical to the join path."""
    ws = model.get("_lrq_list")
    if ws is None:
        ws = [r["_lrq"] for r in model["buckets"].orderBy("_bucket").collect()]
        if len(ws) != int(model["n_buckets"]):
            raise ValueError(
                f"DSIR model buckets relation has {len(ws)} rows, expected "
                f"n_buckets={model['n_buckets']} — torn or hand-built model"
            )
        model["_lrq_list"] = ws
    return ws


def dsir_score(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document importance: ``(id_col, n_grams LONG,
    log_weight DOUBLE, avg_log_weight DOUBLE)`` — the summed and the
    per-gram (length-normalized) log importance weight. Gram-less
    documents (empty/whitespace/NULL text) produce no rows and are
    ABSENT (callers decide their fate — :func:`dsir_filter` does so
    explicitly). One explode, one per-doc sum of quantized bigints,
    and a LITERAL-ARRAY ratio lookup — the model is a dense
    n_buckets-row relation, so ``element_at`` over an array literal
    replaces the broadcast hash join (opt r12: the broadcast exchange
    job + per-row hash probe cost ~3x the aggregate itself at bench
    scale; the array is collected from the same relation the join
    consumed — JVM-computed values, so the scores cannot drift)."""
    grams = _hashed_grams(docs, id_col, text_col, model["n_buckets"])
    scored = grams.withColumn(
        "_lrq",
        F.element_at(
            F.lit(_model_ratio_list(model)),
            (F.col("_bucket") + 1).cast("int"),
        ),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("_lrq").alias("_s"),
        )
        .select(
            id_col,
            "n_grams",
            F.round(F.col("_s").cast("double") / _QUANT, 6).alias("log_weight"),
            F.round(
                F.col("_s").cast("double") / F.col("n_grams") / _QUANT, 6
            ).alias("avg_log_weight"),
        )
    )


def dsir_filter(
    docs: DataFrame,
    model: dict,
    min_avg_log_weight: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_empty: bool = False,
) -> DataFrame:
    """The gate form: keep documents whose PER-GRAM mean log importance
    weight is at least ``min_avg_log_weight`` (0.0 = "looks at least
    as target-like as raw"; the per-gram mean makes the threshold
    length-invariant). Unscoreable (empty/NULL-text) documents are
    decided by ``keep_empty`` explicitly — never a NULL-comparison
    vanish. Returns the input columns unchanged.

    For a FRACTION-based selection ("keep the most target-like 20%")
    compose :func:`dsir_score` with
    ``operators.sampling.quality_bucket_sample`` over
    ``avg_log_weight`` instead of guessing a threshold."""
    from .gating import score_threshold_gate

    scores = dsir_score(docs, model, id_col=id_col, text_col=text_col)
    return score_threshold_gate(
        docs, scores, "avg_log_weight", id_col, text_col,
        min_value=float(min_avg_log_weight), keep_empty=keep_empty,
    )


def resolve_dsir_opts(spark: SparkSession, opts: dict) -> dict:
    """THE one validation + resolution of a ``dsir_opts`` dict — the
    batch funnel and the stream exporter both call it, so batch and
    stream refusal semantics cannot drift (the
    validate_gopher_overrides precedent). Requires
    ``min_avg_log_weight`` and exactly one NON-NULL of ``model`` /
    ``model_path`` (an explicit ``model=None`` counts as absent, not
    as a key that dodges the check); loads a persisted model. Returns
    ``{"model": <dict>, "min_avg_log_weight": <float>}``."""
    d = dict(opts)
    if "min_avg_log_weight" not in d:
        raise ValueError("dsir_opts requires 'min_avg_log_weight'")
    has_model = d.get("model") is not None
    has_path = d.get("model_path") is not None
    if has_model == has_path:
        raise ValueError(
            "dsir_opts requires exactly one of 'model' (a dsir_fit "
            "result) or 'model_path' (a save_dsir dir)"
        )
    return {
        "model": d["model"] if has_model else load_dsir(spark, d["model_path"]),
        "min_avg_log_weight": float(d["min_avg_log_weight"]),
    }
