"""Near-dup operators: MinHash-LSH candidates must recall the exact
n-gram-Jaccard pairs above threshold; SimHash pairs must verify by true
Hamming distance."""

import pytest
from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_pairs,
)


@pytest.fixture(scope="module")
def near_dup_docs(spark, sf_dir):
    """documents plus deliberate near-duplicates: drop the last 2 words
    of every 25th doc → high-Jaccard pair guaranteed."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    dups = (
        docs.filter(F.col("doc_id") % 25 == 0)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.array_join(
                F.slice(
                    F.split(F.col("text"), " "),
                    1,
                    F.greatest(F.size(F.split(F.col("text"), " ")) - 2, F.lit(1)),
                ),
                " ",
            ).alias("text"),
        )
    )
    out = docs.unionByName(dups).cache()
    yield out
    out.unpersist(blocking=True)


def test_minhash_recall_vs_exact(spark, near_dup_docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(near_dup_docs, k=3, threshold=0.7).collect()
    }
    assert exact, "fixture must produce at least one true near-dup pair"
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            near_dup_docs, num_hashes=64, bands=16, k=3, threshold=0.7
        ).collect()
    }
    recall = len(exact & lsh) / len(exact)
    # 16 bands × 4 rows: P(candidate | j=0.7) ≈ 1-(1-0.7^4)^16 ≈ 0.99
    assert recall >= 0.9, f"recall {recall}: {len(lsh)} lsh vs {len(exact)} exact"
    # verification step guarantees no false positives above threshold
    assert lsh <= exact | lsh


def test_minhash_pairs_are_verified(spark, near_dup_docs):
    out = minhash_lsh_pairs(near_dup_docs, num_hashes=32, bands=8, threshold=0.5)
    assert all(r["jaccard"] >= 0.5 for r in out.collect())


def test_simhash_identical_docs_collide(spark):
    df = spark.createDataFrame(
        [(1, "spark window join filter scan"), (2, "spark window join filter scan"),
         (3, "totally different words entirely here")],
        ["doc_id", "text"],
    )
    hashes = {r["doc_id"]: r["h"] for r in df.select("doc_id", simhash64(F.col("text")).alias("h")).collect()}
    assert hashes[1] == hashes[2]
    assert hashes[1] != hashes[3]

    pairs = simhash_pairs(df, max_hamming=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    assert pairs[0]["hamming"] == 0


def test_deterministic_stratified_sample(spark, sf_dir):
    from dbd_datawarehouse_scraper_spark.operators.dedup import (
        deterministic_stratified_sample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fractions = {"en": 0.5, "de": 0.2, "zh": 1.0}
    s1 = deterministic_stratified_sample(docs, "lang", fractions, ["doc_id"])
    # repartitioning must NOT change the sample (content-hash membership)
    s2 = deterministic_stratified_sample(
        docs.repartition(7), "lang", fractions, ["doc_id"]
    )
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(r["doc_id"] for r in s2.collect())
    assert ids1 == ids2 and len(ids1) > 0
    counts = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["zh"] == totals["zh"]          # fraction 1.0 keeps all
    assert "fr" not in counts and "es" not in counts  # unlisted strata drop
    assert 0.3 <= counts["en"] / totals["en"] <= 0.7  # ~0.5 of en


def test_shingles_vec_bit_identical_to_hof(spark, sf_dir):
    """The Arrow-vectorized shingle kernel must produce exactly the HOF
    expression's output — same tokens (Java ASCII-only \\s semantics),
    same first-occurrence distinct order, same [''] / [NULL] edge
    behavior — on real docs plus adversarial whitespace/unicode rows."""
    from dbd_datawarehouse_scraper_spark.functions.text_analysis import (
        shingles,
        shingles_vec,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    edge = spark.createDataFrame(
        [
            (10_000_001, ""),
            (10_000_002, "   \t\n  "),
            (10_000_003, "one"),
            (10_000_004, "one two"),
            (10_000_005, "a b c a b c a b c"),        # duplicate shingles
            (10_000_006, "x y z w"),             # NBSP is NOT Java \s
            (10_000_007, " thin space pad"),  # U+2009 not Java \s
            (10_000_008, "ไทย การค้า รุ่งเรือง สยาม"),
            (10_000_009, "tab\tsep\nnewline\x0bvt\x0cff\rcr end"),
            (10_000_010, None),
        ],
        "doc_id long, text string",
    )
    for k in (2, 3, 5):
        df = docs.unionByName(edge).select(
            "doc_id",
            shingles(F.col("text"), k).alias("hof"),
            shingles_vec(F.col("text"), k).alias("vec"),
        )
        bad = df.filter(
            ~(F.col("hof").eqNullSafe(F.col("vec")))
        ).limit(5).collect()
        assert not bad, f"k={k}: {[(r['doc_id'], r['hof'], r['vec']) for r in bad]}"


def test_ngram_probe_filter_null_flag_pairs_kept(spark):
    """Advisor (r3): a probe_filter that evaluates to NULL on a
    non-probe row made `~NULL | (id < id2)` NULL when id > id2, so
    (probe, non-probe) pairs with NULL flags were silently dropped
    whenever the probe carried the higher id — the standard incremental
    shape (new docs get the highest ids). The flag is now
    null-coalesced to False on the right side."""
    from dbd_datawarehouse_scraper_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    text = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(7, text), (9000, text + " eleven")], "doc_id long, text string"
    )
    # NULL (not False) for the old doc — e.g. a predicate over a
    # nullable marker column: WHEN id >= 9000 THEN true (ELSE NULL)
    probe = F.when(F.col("_id") >= 9000, F.lit(True))
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, probe_filter=probe)
    got = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    from dbd_datawarehouse_scraper_spark.caching import release_caches

    release_caches()
    assert got == [(7, 9000)]


def test_minhash_bucket_cap_skips_megaclusters_only(spark):
    """max_bucket_size (the round-8 megacluster guard): a large
    near-identical cluster whose band buckets exceed the cap loses its
    internal pairs, while small-cluster pairs survive untouched; the
    capped run's pairs are a subset of the exhaustive run's."""
    from dbd_datawarehouse_scraper_spark.caching import release_caches
    from dbd_datawarehouse_scraper_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    mega = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(i, f"{mega} v{i % 3}") for i in range(40)]  # ~40-doc cluster
    rows += [
        (100, "completely different text about spark shuffles and joins ok"),
        (101, "completely different text about spark shuffles and joins ok!"),
    ]
    docs = spark.createDataFrame(rows, "doc_id INT, text STRING")

    full = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    release_caches()
    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, threshold=0.5, max_bucket_size=8
        ).collect()
    }
    release_caches()
    assert capped <= full
    assert (100, 101) in capped, "small-cluster pair must survive the cap"
    # the megacluster's internal pairs dominate `full` and are skipped
    mega_full = {p for p in full if p[0] < 100 and p[1] < 100}
    mega_capped = {p for p in capped if p[0] < 100 and p[1] < 100}
    assert len(mega_full) > 100
    assert len(mega_capped) < len(mega_full) / 4

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_bucket_size"):
        minhash_lsh_pairs(docs, max_bucket_size=1)


def test_funnel_near_dup_opts_passthrough(spark):
    from dbd_datawarehouse_scraper_spark.caching import release_caches
    from dbd_datawarehouse_scraper_spark.plans.curation import (
        curate_documents,
    )

    base = ("the board approved the quarterly statements and the auditors "
            "signed the annual report for the shareholders of the company")
    docs = spark.createDataFrame(
        [(i, base + f" tail{i % 2}") for i in range(6)],
        "doc_id INT, text STRING",
    )
    out = curate_documents(
        docs,
        min_quality=0.0,
        min_tokens=1,
        keep_langs=("en",),
        near_dup_opts={"max_bucket_size": 64, "num_hashes": 32, "bands": 8},
    ).collect()
    release_caches()
    assert len(out) >= 1  # near-dups collapse; the knob is accepted
