"""Embedding-space curation: k-means assignment, SemDeDup semantic
dedup, cluster-balanced sampling."""

import pytest
from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.operators.clustering import (
    cluster_balanced_sample,
    kmeans_assign,
    semantic_dedup,
)


def _vec_df(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


@pytest.fixture(scope="module")
def two_blobs(spark):
    # two well-separated blobs with an exact duplicate pair in each
    rows = []
    for i in range(20):
        rows.append((i, [1.0 + 0.01 * (i % 5), 0.0, 0.01 * (i % 3)]))
    for i in range(20, 40):
        rows.append((i, [0.0, 1.0 + 0.01 * (i % 5), 0.01 * (i % 3)]))
    rows.append((100, rows[0][1]))   # exact dup of id 0
    rows.append((101, rows[20][1]))  # exact dup of id 20
    return _vec_df(spark, rows)


def test_kmeans_assign_separates_blobs(spark, two_blobs):
    out = kmeans_assign(two_blobs, n_clusters=2).collect()
    by_id = {r["vec_id"]: r["cluster"] for r in out}
    blob_a = {by_id[i] for i in range(20)}
    blob_b = {by_id[i] for i in range(20, 40)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b


def test_semantic_dedup_drops_exact_dup_keeps_earliest(spark, two_blobs):
    out = semantic_dedup(two_blobs, n_clusters=2, threshold=0.9999)
    ids = {r["vec_id"] for r in out.collect()}
    assert 0 in ids and 100 not in ids    # duplicate loses to earliest id
    assert 20 in ids and 101 not in ids


def test_semantic_dedup_keeps_dissimilar(spark):
    d = _vec_df(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])])
    out = semantic_dedup(d, n_clusters=1, threshold=0.95)
    assert out.count() == 3


def test_semantic_dedup_partition_invariant(spark, two_blobs):
    a = sorted(r["vec_id"] for r in semantic_dedup(two_blobs, n_clusters=2).collect())
    b = sorted(
        r["vec_id"]
        for r in semantic_dedup(two_blobs.repartition(7), n_clusters=2).collect()
    )
    assert a == b


def test_semantic_dedup_oversize_cluster_subsplit_runs(spark, two_blobs):
    # max_cluster_size smaller than the blob: sub-split path exercised,
    # output is still a subset of the input with no new rows
    out = semantic_dedup(two_blobs, n_clusters=2, max_cluster_size=5)
    ids = [r["vec_id"] for r in out.collect()]
    assert len(ids) == len(set(ids))
    assert set(ids) <= {r["vec_id"] for r in two_blobs.collect()}


def test_cluster_balanced_sample_caps_hot_cluster(spark):
    rows = [(i, 0) for i in range(900)] + [(1000 + i, 1) for i in range(100)]
    d = spark.createDataFrame(rows, ["vec_id", "cluster"])
    out = cluster_balanced_sample(d, max_share=0.2)
    by_cluster = {
        r["cluster"]: r["n"]
        for r in out.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    assert by_cluster[1] == 100  # small cluster fully kept (rate 1)
    # hot cluster: rate = 0.2*1000/900 ≈ 22.3% of 900 ≈ 200 ± hash noise
    assert 140 <= by_cluster[0] <= 260


def test_cluster_balanced_sample_deterministic(spark):
    rows = [(i, i % 3) for i in range(300)]
    d = spark.createDataFrame(rows, ["vec_id", "cluster"])
    a = sorted(r["vec_id"] for r in cluster_balanced_sample(d, max_share=0.3).collect())
    b = sorted(
        r["vec_id"]
        for r in cluster_balanced_sample(d.repartition(5), max_share=0.3).collect()
    )
    assert a == b


def test_cluster_balanced_sample_rejects_bad_share(spark):
    d = spark.createDataFrame([(1, 0)], ["vec_id", "cluster"])
    with pytest.raises(ValueError, match="max_share"):
        cluster_balanced_sample(d, max_share=1.5)
