"""Round-5 corpus-curation operators: passage/segment dedup, quality-
quantile sampling, TF-IDF keywords — semantics beyond the oracle rows
(edge cases, determinism, partition invariance)."""

import pytest
from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.operators.sampling import (
    quality_bucket_sample,
    sample_bucket,
)
from dbd_datawarehouse_scraper_spark.operators.segments import (
    segment_columns,
    segment_dedup,
)
from dbd_datawarehouse_scraper_spark.functions.text_analysis import tfidf_topk


# ---------------------------------------------------------------- segments


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_segment_dedup_drops_shared_chunk_keeps_order(spark):
    boiler = "x1 x2 x3 x4"  # one full 4-token chunk shared by both docs
    d = _docs(
        spark,
        [
            (1, f"{boiler} a b c d"),
            (2, f"{boiler} e f g h"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in segment_dedup(d, mode="chunk", k=4, min_docs=2).collect()
    }
    assert out[1]["clean_text"] == "a b c d"
    assert out[2]["clean_text"] == "e f g h"
    assert out[1]["n_segs"] == 2 and out[1]["n_dropped"] == 1


def test_segment_dedup_fully_boilerplate_doc_survives_empty(spark):
    d = _docs(spark, [(1, "a b"), (2, "a b"), (3, "c d a b")])
    out = {
        r["doc_id"]: r
        for r in segment_dedup(d, mode="chunk", k=2, min_docs=2).collect()
    }
    # docs 1/2 are 100% boilerplate: row kept, text emptied
    assert out[1]["clean_text"] == "" and out[1]["n_dropped"] == 1
    assert out[3]["clean_text"] == "c d"


def test_segment_dedup_min_docs_threshold(spark):
    d = _docs(spark, [(1, "a b"), (2, "a b"), (3, "z z")])
    out = segment_dedup(d, mode="chunk", k=2, min_docs=3)
    assert out.filter(F.col("n_dropped") > 0).count() == 0


def test_segment_dedup_line_mode(spark):
    d = _docs(
        spark,
        [
            (1, "keep me\nshared footer line"),
            (2, "other text\nshared footer line"),
        ],
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in segment_dedup(d, mode="line", min_docs=2).collect()
    }
    assert out == {1: "keep me", 2: "other text"}


def test_segment_dedup_repeat_within_one_doc_not_dropped(spark):
    # same chunk twice in ONE doc: doc-frequency is 1, not boilerplate
    d = _docs(spark, [(1, "a b a b"), (2, "c d e f")])
    out = {r["doc_id"]: r for r in segment_dedup(d, mode="chunk", k=2).collect()}
    assert out[1]["clean_text"] == "a b a b" and out[1]["n_dropped"] == 0


def test_segment_columns_empty_text_yields_empty_array(spark):
    # guards the F.sequence(1, 0) -> [1, 0] descending-array trap
    row = spark.range(1).select(
        F.size(segment_columns(F.lit("   "), "chunk", 4)).alias("n")
    ).first()
    assert row["n"] == 0


def test_segment_dedup_unknown_mode_raises():
    with pytest.raises(ValueError, match="mode"):
        segment_columns(F.lit("x"), mode="sentence")


# ---------------------------------------------------------------- sampling


@pytest.fixture(scope="module")
def scored_docs(spark):
    # 100 docs, score == doc_id: bucket boundaries are exactly 25/50/75
    return spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.col("id").alias("score"),
        F.sha2(F.concat(F.lit("doc-"), F.col("id").cast("string")), 256).alias("fp"),
    )


def test_quality_buckets_are_value_quantiles(spark, scored_docs):
    out = quality_bucket_sample(
        scored_docs,
        score_q=F.col("score"),
        fingerprint=F.col("fp"),
        rates_bp=(10000, 10000, 10000, 10000),  # keep all: inspect buckets
    )
    got = {r["doc_id"]: r["q_bucket"] for r in out.collect()}
    assert len(got) == 100
    for doc, bucket in got.items():
        assert bucket == (doc // 25) + 1, (doc, bucket)


def test_quality_sample_rates_bound_each_bucket(spark, scored_docs):
    out = quality_bucket_sample(
        scored_docs,
        score_q=F.col("score"),
        fingerprint=F.col("fp"),
        rates_bp=(0, 2500, 5000, 10000),
    )
    by_bucket = {
        r["q_bucket"]: r["n"]
        for r in out.groupBy("q_bucket").agg(F.count("*").alias("n")).collect()
    }
    assert 1 not in by_bucket  # rate 0: nothing kept
    assert by_bucket[4] == 25  # rate 10000: everything kept
    # hash-thresholded buckets keep roughly rate * 25 docs
    assert 0 < by_bucket.get(2, 0) < 25
    assert by_bucket.get(2, 0) <= by_bucket.get(3, 25)


def test_quality_sample_partition_invariant(spark, scored_docs):
    kwargs = dict(score_q=F.col("score"), fingerprint=F.col("fp"))
    a = sorted(
        map(tuple, quality_bucket_sample(scored_docs, **kwargs).collect())
    )
    b = sorted(
        map(
            tuple,
            quality_bucket_sample(scored_docs.repartition(7), **kwargs).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_quality_sample_rejects_bad_rate(spark, scored_docs):
    with pytest.raises(ValueError, match="rate"):
        quality_bucket_sample(
            scored_docs,
            score_q=F.col("score"),
            fingerprint=F.col("fp"),
            rates_bp=(20000,),
        )


def test_sample_bucket_window_disjoint_from_split_window(spark):
    """Sampling reads sha256 hex chars [9,16]; content_split reads
    [1,8] — assignments must be independent functions of the hash."""
    from dbd_datawarehouse_scraper_spark.functions.splits import content_split

    df = spark.range(200).select(
        F.sha2(F.col("id").cast("string"), 256).alias("fp")
    )
    row = df.select(
        F.corr(
            sample_bucket(F.col("fp")).cast("double"),
            (F.conv(F.substring("fp", 1, 8), 16, 10).cast("long") % 10000).cast(
                "double"
            ),
        ).alias("c")
    ).first()
    assert abs(row["c"]) < 0.25  # independent hash windows: ~0 correlation
    # and the split label itself is computable alongside without clash
    assert df.select(content_split(F.col("fp"))).distinct().count() >= 2


# ------------------------------------------------------------------ tfidf


def test_tfidf_rare_term_outranks_common(spark):
    d = _docs(
        spark,
        [
            (1, "common rare common"),
            (2, "common other"),
            (3, "common thing"),
        ],
    )
    out = tfidf_topk(d, topk=1).collect()
    top = {r["doc_id"]: r["token"] for r in out}
    # 'common' appears in every doc (idf ~ ln(4/4) = 0) — never the top
    assert top[1] == "rare"
    assert all(tok != "common" for tok in top.values())


def test_tfidf_topk_bounds_and_tiebreak(spark):
    d = _docs(spark, [(1, "b a c d e f g h")])  # all tf=1, df=1: tied scores
    out = tfidf_topk(d, topk=3).orderBy("rn").collect()
    assert [r["token"] for r in out] == ["a", "b", "c"]  # token-asc tiebreak
    assert [r["rn"] for r in out] == [1, 2, 3]


def test_bm25_matches_pure_python_model(spark):
    """bm25_topk vs an independent pure-Python BM25 (same k1/b,
    avgdl over ALL docs including the empty one)."""
    import math

    from dbd_datawarehouse_scraper_spark.functions.text_analysis import bm25_topk

    corpus = {
        1: "the cat sat on the mat",
        2: "the dog sat",
        3: "cat cat cat dog",
        4: "",  # counts toward N and avgdl's denominator
    }
    d = _docs(spark, list(corpus.items()))
    out = bm25_topk(d, topk=10).collect()

    toks = {i: [w for w in txt.split() if w] for i, txt in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq: dict[str, int] = {}
    for ws in toks.values():
        for w in set(ws):
            dfreq[w] = dfreq.get(w, 0) + 1
    expected = {}
    for i, ws in toks.items():
        for w in set(ws):
            tf = ws.count(w)
            idf = math.log(1.0 + (n - dfreq[w] + 0.5) / (dfreq[w] + 0.5))
            norm = tf / (tf + 1.2 * (0.25 + 0.75 * len(ws) / avgdl))
            expected[(i, w)] = round(idf * norm * 1e6)
    got = {(r["doc_id"], r["token"]): r["score_q"] for r in out}
    assert got == expected
    # doc 4 is empty: no keyword rows, but it diluted avgdl above
    assert not [k for k in got if k[0] == 4]


def test_bm25_saturation_vs_tfidf(spark):
    """The point of BM25: tf saturates. A 20x-repeated term must score
    LESS than 20x the single occurrence (tf-idf would scale linearly)."""
    from dbd_datawarehouse_scraper_spark.functions.text_analysis import bm25_topk

    d = _docs(spark, [(1, "rare " * 20 + "x"), (2, "rare y")])
    s = {
        r["doc_id"]: r["score_q"]
        for r in bm25_topk(d, topk=10).collect()
        if r["token"] == "rare"
    }
    assert s[1] < 20 * s[2]
    assert s[1] > s[2]  # but still monotone in tf


def test_segment_dedup_preserves_zero_segment_docs(spark):
    """Row-preservation contract: empty/whitespace-text docs come out
    with clean_text='' and n_segs=0 instead of vanishing (they would
    otherwise be silently deleted by the funnel's rewrite join)."""
    d = _docs(spark, [(1, "a b c d"), (2, ""), (3, "   ")])
    out = {r["doc_id"]: r for r in segment_dedup(d, mode="chunk", k=2).collect()}
    assert set(out) == {1, 2, 3}
    for did in (2, 3):
        assert out[did]["clean_text"] == ""
        assert out[did]["n_segs"] == 0 and out[did]["n_dropped"] == 0
    assert out[1]["clean_text"] == "a b c d"


def test_segment_columns_rejects_bad_k():
    with pytest.raises(ValueError, match="k must be >= 1"):
        segment_columns(F.lit("x"), mode="chunk", k=0)


def test_fuzz_quality_buckets_match_cume_dist_definition(spark):
    """The histogram prefix-sum bucket must equal the semantic
    definition bucket(s) = ceil(B·|{scores ≤ s}|/N) on a random
    heavy-tie multiset (ties share buckets; boundary counts land
    integer-exact)."""
    import random

    rng = random.Random(55)
    n = 500
    scores = [rng.choice([0, 1, 1, 2, 5, 5, 5, 9, 13, 13, 40]) for _ in range(n)]
    d = spark.createDataFrame(
        [(i, s, "%064x" % rng.getrandbits(256)) for i, (s,) in enumerate(zip(scores))],
        "doc_id long, score long, fp string",
    )
    out = quality_bucket_sample(
        d,
        score_q=F.col("score"),
        fingerprint=F.col("fp"),
        rates_bp=(10000,) * 4,
    )
    got = {r["doc_id"]: r["q_bucket"] for r in out.collect()}
    from dbd_datawarehouse_scraper_spark.caching import release_caches

    release_caches()
    assert len(got) == n
    for i, s in enumerate(scores):
        cum = sum(1 for x in scores if x <= s)
        expect = (4 * cum + n - 1) // n
        assert got[i] == expect, (i, s, got[i], expect)
