"""Learned quality classifier (operators/classifier.py): exact
pure-Python scoring mirror (same sha256 bucketing + quantized-bigint
sums), seeded-labels separation, fit partition/rerun invariance,
persistence round-trip + marker matrix, the probability gate's
explicit empty-doc semantics, and funnel/stream wiring with
in-memory == persisted parity."""

import hashlib
import math
import random
import re

import pytest

from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.operators.classifier import (
    _QUANT,
    classifier_filter,
    classifier_fit,
    classifier_score,
    load_classifier,
    resolve_classifier_opts,
    save_classifier,
)

B = 512

_GOOD = ("the quick analysis shows careful reasoning about measured "
         "results and clear structured prose").split()
_JUNK = "click buy now free winner casino jackpot prize lol spam".split()


def _labeled_rows():
    rng = random.Random(3)
    rows = [
        (f"g{i}", " ".join(rng.choices(_GOOD, k=20)), 1) for i in range(150)
    ] + [
        (f"j{i}", " ".join(rng.choices(_JUNK, k=20)), 0) for i in range(150)
    ]
    return rows


def _labeled(spark):
    return spark.createDataFrame(
        _labeled_rows(), "doc_id string, text string, label int"
    )


def _fit(spark):
    return classifier_fit(
        _labeled(spark), n_buckets=B, sample_per_class=100, iters=300
    )


_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _py_score(model, wq: dict, text: str):
    """The independent pure-Python mirror of classifier_score: same
    tokenization (ASCII-\\s split of the trimmed text), same
    unigram+bigram grams, same sha256-prefix bucketing, same exact
    integer weight sum, same rounding."""
    w = [x for x in _WS.split(text.strip()) if x]
    grams = w + [f"{a} {b}" for a, b in zip(w, w[1:])]
    s = sum(
        wq[int(hashlib.sha256(g.encode()).hexdigest()[:8], 16) % B]
        for g in grams
    )
    logit = model["bias_q"] / _QUANT + s / len(grams) / _QUANT
    return round(logit, 6), round(1.0 / (1.0 + math.exp(-logit)), 6)


def test_score_matches_python_mirror(spark):
    """Every document's (logit, prob) matches the independent
    pure-Python featurize+score to the rounded digit — the quantized
    integer sum makes the Spark side exactly reproducible."""
    labeled = _labeled(spark)
    model = _fit(spark)
    wq = {r["_bucket"]: r["_wq"] for r in model["buckets"].collect()}
    assert len(wq) == B  # dense: every bucket present
    scores = classifier_score(labeled, model).collect()
    texts = {d: t for d, t, _ in _labeled_rows()}
    assert len(scores) == 300
    for r in scores:
        logit, prob = _py_score(model, wq, texts[r["doc_id"]])
        assert abs(r["logit"] - logit) <= 1e-9
        assert abs(r["prob"] - prob) <= 1e-9


def test_seeded_labels_separation_and_gate(spark):
    """The learned model separates the seeded classes sharply, the
    gate keeps exactly the high-probability side, and unscoreable
    (empty/NULL-text) documents obey keep_empty explicitly."""
    labeled = _labeled(spark)
    model = _fit(spark)
    by = {
        r["doc_id"]: r["prob"]
        for r in classifier_score(labeled, model).collect()
    }
    assert min(v for k, v in by.items() if k.startswith("g")) > 0.9
    assert max(v for k, v in by.items() if k.startswith("j")) < 0.1
    docs = labeled.unionByName(
        spark.createDataFrame(
            [("e0", "", 0), ("e1", None, 0), ("e2", "   ", 0)],
            "doc_id string, text string, label int",
        )
    ).drop("label")
    kept = {
        r["doc_id"] for r in classifier_filter(docs, model, 0.5).collect()
    }
    assert kept == {f"g{i}" for i in range(150)}
    kept_e = {
        r["doc_id"]
        for r in classifier_filter(docs, model, 0.5, keep_empty=True).collect()
    }
    assert kept_e == kept | {"e0", "e1", "e2"}


def test_fit_partition_and_rerun_invariance(spark):
    """The quantized model is bit-identical across repartitionings and
    reruns — content-hash sampling + sorted driver-side fit."""
    model = _fit(spark)
    m2 = classifier_fit(
        _labeled(spark).repartition(13),
        n_buckets=B,
        sample_per_class=100,
        iters=300,
    )
    assert m2["bias_q"] == model["bias_q"]
    assert (m2["n_pos"], m2["n_neg"]) == (model["n_pos"], model["n_neg"])
    w1 = {r["_bucket"]: r["_wq"] for r in model["buckets"].collect()}
    w2 = {r["_bucket"]: r["_wq"] for r in m2["buckets"].collect()}
    assert w1 == w2


def test_save_load_round_trip_and_marker_matrix(spark, tmp_path):
    """Round-trip scores are identical; missing marker, drifted
    version, and torn (row-count-mismatched) stores refuse loudly."""
    labeled = _labeled(spark)
    model = _fit(spark)
    p = str(tmp_path / "m")
    save_classifier(spark, model, p)
    loaded = load_classifier(spark, p)
    assert (loaded["n_buckets"], loaded["bias_q"], loaded["n_pos"],
            loaded["n_neg"]) == (model["n_buckets"], model["bias_q"],
                                 model["n_pos"], model["n_neg"])
    a = sorted(map(tuple, classifier_score(labeled, model).collect()))
    b = sorted(map(tuple, classifier_score(labeled, loaded).collect()))
    assert a == b
    # re-save over the same path is fine (marker deleted first)
    save_classifier(spark, model, p)
    load_classifier(spark, p)

    with pytest.raises(ValueError, match="no classifier marker"):
        load_classifier(spark, str(tmp_path / "nope"))
    bad = str(tmp_path / "badver")
    save_classifier(spark, model, bad)
    spark.createDataFrame(
        [(99, B, 0, 1, 1)],
        "version INT, n_buckets INT, bias_q LONG, n_pos LONG, n_neg LONG",
    ).repartition(1).write.mode("overwrite").parquet(f"{bad}/_meta")
    with pytest.raises(ValueError, match="version"):
        load_classifier(spark, bad)
    torn = str(tmp_path / "torn")
    save_classifier(spark, model, torn)
    spark.range(3).select(
        F.col("id").alias("_bucket"), F.lit(0).cast("long").alias("_wq")
    ).repartition(1).write.mode("overwrite").parquet(f"{torn}/buckets")
    with pytest.raises(ValueError, match="torn"):
        load_classifier(spark, torn)


def test_validation(spark):
    labeled = _labeled(spark)
    with pytest.raises(ValueError, match="n_buckets"):
        classifier_fit(labeled, n_buckets=1)
    with pytest.raises(ValueError, match="sample_per_class"):
        classifier_fit(labeled, sample_per_class=0)
    with pytest.raises(ValueError, match="iters"):
        classifier_fit(labeled, iters=0)
    with pytest.raises(ValueError, match="lr"):
        classifier_fit(labeled, lr=0.0)
    with pytest.raises(ValueError, match="BOTH classes"):
        classifier_fit(labeled.filter(F.col("label") == 1), n_buckets=B)
    # labels outside {0,1} (or NULL) refuse loudly — never a silent
    # fit on a filtered subset of what the caller supplied
    with pytest.raises(ValueError, match="labels must be"):
        classifier_fit(
            labeled.unionByName(
                spark.createDataFrame(
                    [("x", "some text", 2)],
                    "doc_id string, text string, label int",
                )
            ),
            n_buckets=B,
        )
    with pytest.raises(ValueError, match="labels must be"):
        classifier_fit(
            labeled.unionByName(
                spark.createDataFrame(
                    [("x", "some text", None)],
                    "doc_id string, text string, label int",
                )
            ),
            n_buckets=B,
        )
    with pytest.raises(ValueError, match="no scoreable"):
        classifier_fit(
            spark.createDataFrame(
                [("a", None, 1), ("b", "", 0)],
                "doc_id string, text string, label int",
            ),
            n_buckets=B,
        )
    model = _fit(spark)
    with pytest.raises(ValueError, match="min_prob"):
        classifier_filter(labeled, model, 1.5)
    with pytest.raises(ValueError, match="min_prob"):
        resolve_classifier_opts(spark, {"model": model})
    with pytest.raises(ValueError, match="exactly one"):
        resolve_classifier_opts(spark, {"min_prob": 0.5})
    with pytest.raises(ValueError, match="exactly one"):
        resolve_classifier_opts(
            spark, {"min_prob": 0.5, "model": model, "model_path": "x"}
        )
    with pytest.raises(ValueError, match="min_prob"):
        resolve_classifier_opts(spark, {"min_prob": -0.1, "model": model})


def test_funnel_classifier_gate(spark, tmp_path):
    """classifier_opts in the curation funnel: junk drops, good
    survives; in-memory == persisted model; bad opts refuse loudly."""
    from dbd_datawarehouse_scraper_spark.caching import release_caches
    from dbd_datawarehouse_scraper_spark.plans import curate_documents

    model = _fit(spark)
    corpus = spark.createDataFrame(
        [(d, t, "s") for d, t, _ in _labeled_rows()[:40]]
        + [(d, t, "s") for d, t, _ in _labeled_rows()[150:190]],
        "doc_id string, text string, source string",
    )
    base = dict(keep_langs=("en", "de", "fr", "es", "zh", "und"),
                min_quality=0.0, min_tokens=1)
    kept = {
        r["doc_id"]
        for r in curate_documents(
            corpus,
            classifier_opts={"model": model, "min_prob": 0.5},
            **base,
        ).collect()
    }
    release_caches()
    assert kept == {f"g{i}" for i in range(40)}
    p = str(tmp_path / "m")
    save_classifier(spark, model, p)
    kept_p = {
        r["doc_id"]
        for r in curate_documents(
            corpus,
            classifier_opts={"model_path": p, "min_prob": 0.5},
            **base,
        ).collect()
    }
    release_caches()
    assert kept_p == kept
    with pytest.raises(ValueError, match="min_prob"):
        curate_documents(corpus, classifier_opts={"model": model}, **base)
    with pytest.raises(ValueError, match="exactly one"):
        curate_documents(corpus, classifier_opts={"min_prob": 0.5}, **base)


def test_stream_export_classifier_gate(spark, tmp_path):
    """classifier_opts in the incremental exporter: model loaded once
    at start, junk never exports; bad opts refuse at start."""
    import glob
    import gzip
    import json

    from dbd_datawarehouse_scraper_spark.caching import release_caches
    from dbd_datawarehouse_scraper_spark.streaming import file_stream
    from dbd_datawarehouse_scraper_spark.streaming.export import (
        stream_export_training_set,
    )

    model = _fit(spark)
    p = str(tmp_path / "m")
    save_classifier(spark, model, p)
    release_caches()
    docs = spark.createDataFrame(
        [(d, t) for d, t, _ in _labeled_rows()[:10]]
        + [(d, t) for d, t, _ in _labeled_rows()[150:160]],
        "doc_id string, text string",
    )
    docs.coalesce(1).write.mode("append").parquet(str(tmp_path / "src"))
    with pytest.raises(ValueError, match="exactly one"):
        stream_export_training_set(
            file_stream(spark, str(tmp_path / "src"), docs.schema),
            str(tmp_path / "o0"), str(tmp_path / "s0"), str(tmp_path / "c0"),
            classifier_opts={"min_prob": 0.5},
            keep_langs=("en", "und"), min_quality=0.0, min_tokens=1,
        )
    q = stream_export_training_set(
        file_stream(spark, str(tmp_path / "src"), docs.schema),
        str(tmp_path / "out"), str(tmp_path / "state"), str(tmp_path / "ckpt"),
        classifier_opts={"model_path": p, "min_prob": 0.5},
        keep_langs=("en", "de", "fr", "es", "zh", "und"),
        min_quality=0.0, min_tokens=1, near_dup_threshold=0.95,
    )
    assert q.awaitTermination(240)
    ids = set()
    for f in glob.glob(str(tmp_path / "out/split=*/epoch=*/shard=*/*.gz")):
        with gzip.open(f, "rt", encoding="utf-8") as fh:
            ids |= {json.loads(l)["doc_id"] for l in fh if l.strip()}
    assert ids and all(i.startswith("g") for i in ids)


def test_eval_auc_thresholds_and_mirror(spark):
    """classifier_eval on a deliberately NOISY labeled set (10% labels
    flipped): AUC matches an independent pure-Python Mann-Whitney
    computation over the same 1e-4 buckets exactly; the threshold
    table's confusion counts match a brute-force sweep."""
    labeled = _labeled(spark)
    model = _fit(spark)
    from dbd_datawarehouse_scraper_spark.operators.classifier import (
        _EVAL_BUCKETS,
        classifier_eval,
    )

    noisy_rows = [
        (d, t, (1 - y) if i % 10 == 0 else y)
        for i, (d, t, y) in enumerate(_labeled_rows())
    ]
    noisy = spark.createDataFrame(
        noisy_rows, "doc_id string, text string, label int"
    )
    rep = classifier_eval(noisy, model)
    assert rep["n_pos"] + rep["n_neg"] == 300

    # independent mirror: collected probabilities, same bucketing
    probs = {
        r["doc_id"]: r["prob"]
        for r in classifier_score(noisy, model).collect()
    }
    # Spark's round() is HALF_UP; Python's is banker's — mirror Spark
    pts = sorted(
        (math.floor(probs[d] * _EVAL_BUCKETS + 0.5), y)
        for d, _, y in noisy_rows
    )
    n_pos = sum(y for _, y in pts)
    n_neg = len(pts) - n_pos
    u = 0.0
    neg_below = 0
    from itertools import groupby

    for _, grp in groupby(pts, key=lambda x: x[0]):
        g = list(grp)
        p = sum(y for _, y in g)
        n = len(g) - p
        u += p * (neg_below + 0.5 * n)
        neg_below += n
    assert abs(rep["auc"] - u / (n_pos * n_neg)) <= 1e-6
    assert 0.8 < rep["auc"] < 1.0  # noisy labels: good but not perfect
    for row in rep["thresholds"]:
        cut = round(row["threshold"] * _EVAL_BUCKETS)
        tp = sum(1 for b, y in pts if y == 1 and b >= cut)
        fp = sum(1 for b, y in pts if y == 0 and b >= cut)
        assert (row["tp"], row["fp"]) == (tp, fp), row


def test_eval_perfect_separation_and_target_precision(spark):
    """Clean labels: AUC 1.0; classifier_threshold_for_precision(1.0)
    returns the lowest-positive cut (max recall at full precision) and
    gating there keeps every good doc and no junk; an unreachable
    target refuses."""
    labeled = _labeled(spark)
    model = _fit(spark)
    from dbd_datawarehouse_scraper_spark.operators.classifier import (
        classifier_eval,
        classifier_threshold_for_precision,
    )

    rep = classifier_eval(labeled, model)
    assert rep["auc"] == 1.0
    t = classifier_threshold_for_precision(labeled, model, 1.0)
    probs = {
        r["doc_id"]: r["prob"]
        for r in classifier_score(labeled, model).collect()
    }
    good = [v for k, v in probs.items() if k.startswith("g")]
    junk = [v for k, v in probs.items() if k.startswith("j")]
    assert max(junk) < t <= min(good) + 1.0 / 10_000  # bucket resolution
    # inverted labels make every precision target unreachable
    flipped = labeled.select(
        "doc_id", "text", (F.lit(1) - F.col("label")).alias("label")
    )
    with pytest.raises(ValueError, match="no threshold"):
        classifier_threshold_for_precision(flipped, model, 0.99)
    with pytest.raises(ValueError, match="target_precision"):
        classifier_threshold_for_precision(labeled, model, 0.0)
    with pytest.raises(ValueError, match="labels must be"):
        classifier_eval(
            labeled.select("doc_id", "text", F.lit(2).alias("label")), model
        )


def test_cli_eval_classifier_mode(spark, tmp_path, capsys):
    """--eval-classifier prints AUC, the threshold table, and (with
    --classifier-target-precision) the recommended gate; missing
    --classifier-model refuses."""
    from dbd_datawarehouse_scraper_spark.__main__ import main

    model = _fit(spark)
    mdir = str(tmp_path / "clf")
    save_classifier(spark, model, mdir)
    lab = str(tmp_path / "labeled.parquet")
    _labeled(spark).write.parquet(lab)
    with pytest.raises(ValueError, match="classifier-model"):
        main(["--eval-classifier", lab,
              "--config", str(tmp_path / "none.yaml")])
    rc = main([
        "--eval-classifier", lab, "--classifier-model", mdir,
        "--classifier-target-precision", "1.0",
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "AUC 1.0" in out
    assert "min-classifier-prob for precision >= 1.0:" in out


def test_label_and_class_validation_hardening(spark):
    """Round-9 second eval pass: fractional (soft) labels refuse in
    BOTH fit and eval (0.9 silently truncating to 0 would corrupt
    them); threshold selection refuses single-class corpora (an
    all-positive set would bless any threshold as precision 1.0); and
    classifier_eval(target_precision=...) returns the same gate as the
    standalone helper from ONE scoring job."""
    from dbd_datawarehouse_scraper_spark.operators.classifier import (
        classifier_eval,
        classifier_threshold_for_precision,
    )

    labeled = _labeled(spark)
    model = _fit(spark)
    soft = spark.createDataFrame(
        [("a", "some text here", 0.9), ("b", "other text there", 0.1)],
        "doc_id string, text string, label double",
    )
    with pytest.raises(ValueError, match="fractional"):
        classifier_fit(soft, n_buckets=B)
    with pytest.raises(ValueError, match="fractional"):
        classifier_eval(soft, model)
    only_pos = labeled.filter(F.col("label") == 1)
    with pytest.raises(ValueError, match="BOTH classes"):
        classifier_threshold_for_precision(only_pos, model, 0.9)
    rep = classifier_eval(labeled, model, target_precision=1.0)
    t_standalone = classifier_threshold_for_precision(labeled, model, 1.0)
    assert rep["threshold_for_target"] == t_standalone
    # the returned gate keeps exactly the counted rows: filtering at it
    # keeps every positive (max recall at precision 1.0)
    kept = classifier_filter(
        labeled.drop("label"), model, rep["threshold_for_target"]
    ).count()
    assert kept == 150
