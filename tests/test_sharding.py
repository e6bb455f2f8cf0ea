"""Token-budget shard packing (operators/sharding.py): boundary
semantics, overflow bound, determinism across partitionings."""

import pytest
from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.caching import release_caches
from dbd_datawarehouse_scraper_spark.operators.sharding import pack_shards


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, 10 + (i * 37) % 90) for i in range(1, 501)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_shard_is_floor_of_exclusive_prefix(spark, docs):
    """shard = floor(exclusive_prefix_sum / budget) — the blocked
    packing definition, checked against a driver-side replay."""
    out = {
        r["doc_id"]: r["shard"]
        for r in pack_shards(docs, budget=1000).collect()
    }
    release_caches()
    rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    prefix, expected = 0, {}
    for r in rows:
        expected[r["doc_id"]] = prefix // 1000
        prefix += r["n_tokens"]
    assert out == expected


def test_shards_contiguous_and_bounded(spark, docs):
    """Shard ids are contiguous from 0; every shard's token total is
    < budget + max(n_tokens) (one straddling doc of overflow, exactly
    like fixed-size block layout); all but the last shard reach the
    budget."""
    budget = 1000
    out = pack_shards(docs, budget=budget)
    per_shard = {
        r["shard"]: r["total"]
        for r in out.groupBy("shard")
        .agg(F.sum("n_tokens").alias("total"))
        .collect()
    }
    release_caches()
    shards = sorted(per_shard)
    assert shards == list(range(len(shards)))
    max_tok = max(r["n_tokens"] for r in docs.collect())
    for s in shards:
        assert per_shard[s] < budget + max_tok
        if s != shards[-1]:
            assert per_shard[s] >= budget - max_tok


def test_partitioning_invariance(spark, docs):
    """The packing is defined by the order column alone — any input
    partitioning and any num_partitions give identical shards."""
    a = {
        (r["doc_id"], r["shard"])
        for r in pack_shards(docs.repartition(13), budget=777).collect()
    }
    b = {
        (r["doc_id"], r["shard"])
        for r in pack_shards(
            docs.coalesce(1), budget=777, num_partitions=3
        ).collect()
    }
    release_caches()
    assert a == b


def test_contamination_pairs_known_overlap(spark):
    """contamination_pairs flags exactly the corpus docs sharing
    k-gram mass with a benchmark item: an exact copy (J=1), a half
    overlap (J≈0.5 — above a 0.3 threshold), and an unrelated doc
    (J=0 — absent)."""
    from dbd_datawarehouse_scraper_spark.caching import release_caches
    from dbd_datawarehouse_scraper_spark.operators.dedup import (
        contamination_pairs,
    )

    words = [f"w{i}" for i in range(40)]
    corpus = spark.createDataFrame(
        [
            (1, " ".join(words)),                      # exact copy of bench 100
            (2, " ".join(words[:20] + [f"x{i}" for i in range(20)])),  # half
            (3, " ".join(f"z{i}" for i in range(40))), # unrelated
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, " ".join(words))], "bench_id long, text string"
    )
    got = {
        (r["doc_id"], r["bench_id"]): r["jaccard"]
        for r in contamination_pairs(corpus, bench, threshold=0.3).collect()
    }
    release_caches()
    assert (1, 100) in got and got[(1, 100)] == 1.0
    assert (2, 100) in got and 0.3 <= got[(2, 100)] < 0.6
    assert not any(d == 3 for d, _ in got)


def test_recompute_after_eviction_is_deterministic(spark, docs):
    """`_pid` (spark_partition_id after the range exchange) is a
    semantic grouping key inside pack_shards; this pins that evicting
    the pinned relation and re-evaluating the SAME returned plan — the
    recompute-after-eviction corner — yields identical shard
    assignments (RangePartitioner's sample seed derives from the RDD
    id, so a recompute of the same lineage resamples identically)."""
    out = pack_shards(docs, budget=777)
    first = {(r["doc_id"], r["shard"]) for r in out.collect()}
    # evict the internal persist, then re-run the same plan from scratch
    release_caches(blocking=True)
    second = {(r["doc_id"], r["shard"]) for r in out.collect()}
    release_caches()
    assert first == second


def test_shard_div_is_integer_exact_past_double_precision(spark):
    """The shard id uses 64-bit integer division, not floor(double /):
    at offsets past 2^53 a double cannot represent the running token
    offset exactly and floor(/) can misplace a boundary. Start the
    cursor just past 2^53 at a point where the double rounding of
    (start+prefix)/budget provably disagrees with integer div."""
    start = (1 << 53) + 1          # not representable as a double
    budget = 3
    docs = spark.createDataFrame(
        [(i, 1) for i in range(1, 7)], "doc_id long, n_tokens long"
    )
    out = {
        r["doc_id"]: r["shard"]
        for r in pack_shards(
            docs, budget=budget, start_offset=start
        ).collect()
    }
    release_caches()
    prefix, expected = 0, {}
    for i in range(1, 7):
        expected[i] = (start + prefix) // budget
        prefix += 1
    assert out == expected


def test_contamination_containment_catches_embedded_benchmark(spark):
    """Round-5: a LONG document embedding a whole benchmark item
    verbatim has containment 1.0 but Jaccard well under the threshold
    (the document's size drags |A∩B|/|A∪B| down) — the containment
    gate flags it, the Jaccard-only gate provably misses it."""
    from dbd_datawarehouse_scraper_spark.caching import release_caches
    from dbd_datawarehouse_scraper_spark.operators.dedup import (
        contamination_pairs,
    )

    bench_words = [f"b{i}" for i in range(20)]
    filler = [f"f{i}" for i in range(400)]
    corpus = spark.createDataFrame(
        [
            # benchmark item embedded whole inside 400 filler words
            (1, " ".join(filler[:200] + bench_words + filler[200:])),
            (2, " ".join(f"z{i}" for i in range(50))),  # unrelated
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, " ".join(bench_words))], "bench_id long, text string"
    )

    jaccard_only = contamination_pairs(corpus, bench, threshold=0.3).collect()
    release_caches()
    assert jaccard_only == [], "Jaccard-only gate must miss the embedding"

    got = {
        (r["doc_id"], r["bench_id"]): (r["jaccard"], r["containment"])
        for r in contamination_pairs(
            corpus, bench, threshold=0.3, containment_threshold=0.8
        ).collect()
    }
    release_caches()
    assert (1, 100) in got
    j, c = got[(1, 100)]
    assert c == 1.0 and j < 0.3
    assert not any(d == 2 for d, _ in got)
