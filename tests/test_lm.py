"""N-gram LM perplexity filtering (functions/lm.py): Spark fit+score
vs the pure-Python twin (quantized-exact), backoff-path coverage,
persistence round-trip + marker refusal, partition invariance, the
gate's null/empty-doc semantics."""

import pytest

from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.functions.lm import (
    lm_reference_model,
    lm_reference_score,
    load_lm,
    ngram_lm_fit,
    ngram_lm_score,
    perplexity_filter,
    save_lm,
)

REF_DOCS = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "the cat ate the fish",
    "a dog and a cat",
]

# exercises every backoff case: seen bigrams ("the cat"), seen
# unigrams in unseen bigrams ("fish mat"), OOV tokens ("zebra"),
# single-token docs (no bigram at all), empty docs
SCORE_DOCS = [
    (1, "the cat sat on the mat"),  # all bigrams seen — lowest ppl
    (2, "fish mat the a"),  # seen unigrams, unseen bigrams
    (3, "zebra quagga zebra"),  # pure OOV
    (4, "cat"),  # single token, unigram path only
    (5, ""),  # empty — NULL score
    (6, "   "),  # whitespace-only — NULL score
    (7, "the cat sat zebra on the mat"),  # mixed OOV mid-sentence
]


def _fit(spark):
    ref = spark.createDataFrame([(t,) for t in REF_DOCS], "text STRING")
    return ngram_lm_fit(ref, text_col="text")


def _score_df(spark, model, docs=SCORE_DOCS, parts=None):
    df = spark.createDataFrame(docs, "doc_id INT, text STRING")
    if parts is not None:
        df = df.repartition(parts)
    return ngram_lm_score(df, model, id_col="doc_id", text_col="text")


def test_score_matches_python_model_exactly(spark):
    model = _fit(spark)
    got = {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"], r["perplexity"])
        for r in _score_df(spark, model).collect()
    }
    pymodel = lm_reference_model([t.split() for t in REF_DOCS])
    for doc_id, text in SCORE_DOCS:
        toks = text.split()
        want = lm_reference_score(pymodel, toks)
        if not toks:
            # no token rows -> no group -> absent from the score output
            assert doc_id not in got
            continue
        assert got[doc_id] == want, f"doc {doc_id}: {got[doc_id]} != {want}"


def test_ordering_separates_fluent_from_oov(spark):
    model = _fit(spark)
    ppl = {r["doc_id"]: r["perplexity"] for r in _score_df(spark, model).collect()}
    assert ppl[1] < ppl[2] < ppl[3]  # in-domain < backoff < pure OOV
    assert ppl[1] < ppl[7] < ppl[3]  # one OOV word sits between


def test_partition_invariance(spark):
    model = _fit(spark)
    a = sorted(map(tuple, _score_df(spark, model, parts=1).collect()))
    b = sorted(map(tuple, _score_df(spark, model, parts=7).collect()))
    assert a == b


def test_fit_counts_and_min_count_pruning(spark):
    model = _fit(spark)
    uni = {r["_tok"]: r["_c"] for r in model["unigrams"].collect()}
    assert uni["the"] == 6 and uni["cat"] == 3 and uni["fish"] == 1
    assert model["n_tokens"] == sum(uni.values())
    big = {r["_gram"]: r["_c"] for r in model["bigrams"].collect()}
    assert big["the cat"] == 2 and big["sat on"] == 2
    pruned = ngram_lm_fit(
        spark.createDataFrame([(t,) for t in REF_DOCS], "text STRING"),
        min_count=2,
    )
    # totals survive pruning (the denominator is the corpus, not the table)
    assert pruned["n_tokens"] == model["n_tokens"]
    assert all(r["_c"] >= 2 for r in pruned["unigrams"].collect())
    assert all(r["_c"] >= 2 for r in pruned["bigrams"].collect())
    with pytest.raises(ValueError, match="min_count"):
        ngram_lm_fit(
            spark.createDataFrame([(t,) for t in REF_DOCS], "text STRING"),
            min_count=0,
        )
    with pytest.raises(ValueError, match="no tokens"):
        ngram_lm_fit(spark.createDataFrame([("",), ("  ",)], "text STRING"))


def test_save_load_round_trip_scores_identically(spark, tmp_path):
    model = _fit(spark)
    path = str(tmp_path / "lm")
    save_lm(spark, model, path)
    loaded = load_lm(spark, path)
    assert loaded["n_tokens"] == model["n_tokens"]
    assert loaded["alpha"] == model["alpha"]
    a = sorted(map(tuple, _score_df(spark, model).collect()))
    b = sorted(map(tuple, _score_df(spark, loaded).collect()))
    assert a == b


def test_load_refuses_markerless_and_wrong_version(spark, tmp_path):
    with pytest.raises(ValueError, match="no LM marker"):
        load_lm(spark, str(tmp_path / "nowhere"))
    path = str(tmp_path / "drifted")
    save_lm(spark, _fit(spark), path)
    spark.createDataFrame(
        [(99, 0.4, 1)], "version INT, alpha DOUBLE, n_tokens LONG"
    ).repartition(1).write.mode("overwrite").parquet(f"{path}/_meta")
    with pytest.raises(ValueError, match="version 99"):
        load_lm(spark, path)


def test_perplexity_filter_gate_and_empty_docs(spark):
    model = _fit(spark)
    # + a NULL-text row: unscoreable, so keep_empty decides its fate
    # too (size(split(NULL)) is NULL — a bare ==0 check would silently
    # drop it from BOTH sides, the round-5 null-vanish class)
    docs = spark.createDataFrame(
        SCORE_DOCS + [(8, None)], "doc_id INT, text STRING"
    )
    ppl = {r["doc_id"]: r["perplexity"] for r in _score_df(spark, model).collect()}
    cut = (ppl[1] + ppl[2]) / 2  # keeps doc 1, drops 2/3/7; doc 4 depends
    kept = {
        r["doc_id"]
        for r in perplexity_filter(
            docs, model, max_perplexity=cut, id_col="doc_id"
        ).collect()
    }
    want = {d for d, p in ppl.items() if p <= cut}
    assert kept == want
    # empty/whitespace/NULL text drops by default
    assert not {5, 6, 8} & kept
    kept_e = {
        r["doc_id"]
        for r in perplexity_filter(
            docs, model, max_perplexity=cut, id_col="doc_id", keep_empty=True
        ).collect()
    }
    assert kept_e == want | {5, 6, 8}
    with pytest.raises(ValueError, match="max_perplexity"):
        perplexity_filter(docs, model, max_perplexity=0.0)


def test_score_plan_has_no_cartesian_and_one_generate(spark, tmp_path):
    # the production score-many shape reads a PERSISTED model — an
    # in-memory fit is lazy, so its tokenize explode would re-run
    # inside every model-side join (3 extra Generates, reference-corpus
    # work repeated per score pass)
    save_lm(spark, _fit(spark), str(tmp_path / "lm"))
    model = load_lm(spark, str(tmp_path / "lm"))
    plan = _score_df(spark, model)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # one tokenize explode, the outer form, never cloned into a filter
    assert plan.count("Generate posexplode") == 1
    for line in plan.splitlines():
        if "Filter" in line and "split(" in line:
            raise AssertionError(f"inferred tokenizer filter: {line[:200]}")


def test_scores_on_sf_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    model = ngram_lm_fit(docs.limit(100), text_col="text")
    out = ngram_lm_score(docs, model, id_col="doc_id", text_col="text")
    rows = out.collect()
    assert len(rows) > 0
    assert all(
        r["perplexity"] is not None and r["perplexity"] >= 1.0 for r in rows
    ), "perplexity is 2**mean(-log2 s) with s <= 1, so >= 1 always"
