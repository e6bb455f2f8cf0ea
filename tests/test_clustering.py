"""Embedding-space curation: k-means assignment, SemDeDup semantic
dedup, cluster-balanced sampling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.operators.clustering import (
    _greedy_cosine_survivors,
    cluster_balanced_sample,
    kmeans_assign,
    kmeans_fit,
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


def _naive_survivors(mat, threshold):
    # reference full-Gram sweep the tiled kernel must reproduce
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    unit = mat / norms[:, None]
    sims = unit @ unit.T
    keep = np.ones(len(mat), dtype=bool)
    for i in range(len(mat)):
        if not keep[i]:
            continue
        keep[i + 1 :] &= ~(sims[i, i + 1 :] >= threshold)
    return keep


def test_tiled_sweep_matches_full_gram_sweep():
    rng = np.random.default_rng(42)
    base = rng.normal(size=(40, 6))
    # plant near-dup chains: rows 10/11/12 ~ row 3, row 30 ~ row 7
    for src, dst in [(3, 10), (3, 11), (11, 12), (7, 30)]:
        base[dst] = base[src] + rng.normal(scale=1e-4, size=6)
    base[25] = 0.0  # zero vector edge case
    for tile in (1, 3, 7, 64):
        got = _greedy_cosine_survivors(base, 0.999, tile=tile)
        assert (got == _naive_survivors(base, 0.999)).all(), f"tile={tile}"


def test_tiled_sweep_never_materializes_full_gram(monkeypatch):
    # the kernel must call np.matmul with row blocks of <= tile rows —
    # peak allocation O(tile * n), never the n x n Gram
    shapes = []
    real_matmul = np.matmul

    def recording_matmul(a, b, *args, **kwargs):
        shapes.append((a.shape, b.shape))
        return real_matmul(a, b, *args, **kwargs)

    monkeypatch.setattr(np, "matmul", recording_matmul)
    n, tile = 50, 8
    mat = np.random.default_rng(7).normal(size=(n, 4))
    _greedy_cosine_survivors(mat, 0.99, tile=tile)
    assert shapes, "kernel must go through np.matmul"
    assert all(a[0] <= tile for a, _ in shapes), shapes
    assert all(a[0] * b[1] <= tile * n for a, b in shapes), shapes


def test_kmeans_fit_centers_make_assign_partition_invariant(spark, two_blobs):
    centers = kmeans_fit(two_blobs, n_clusters=2)
    assert len(centers) == 2 and all(len(c) == 3 for c in centers)
    # two very different input partitionings + saved centers -> bit-identical
    a = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(two_blobs.coalesce(1), centers=centers).collect()
    }
    b = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(two_blobs.repartition(13), centers=centers).collect()
    }
    assert a == b
    # and the survivor set of semantic_dedup is identical too
    sa = sorted(
        r["vec_id"]
        for r in semantic_dedup(two_blobs.coalesce(1), centers=centers).collect()
    )
    sb = sorted(
        r["vec_id"]
        for r in semantic_dedup(
            two_blobs.repartition(13), centers=centers
        ).collect()
    )
    assert sa == sb


def test_kmeans_fit_bit_deterministic_across_partitionings(spark, two_blobs):
    """The fit ITSELF (not just assignment-from-saved-centers) is
    bit-identical across reruns and input repartitionings: the sample
    is content-hash-keyed (one TakeOrdered pass) and re-sorted on the
    driver before the seeded init — the old MLlib k-means|| fit
    sampled per PARTITION and carried a documented caveat here."""
    a = kmeans_fit(two_blobs.coalesce(1), n_clusters=2)
    b = kmeans_fit(two_blobs.repartition(13), n_clusters=2)
    c = kmeans_fit(two_blobs.repartition(13), n_clusters=2)
    assert a == b == c
    # sample bound smaller than the corpus: still deterministic (the
    # hash-smallest rows win regardless of layout), centers still k×d
    sa = kmeans_fit(two_blobs.coalesce(1), n_clusters=2, sample_size=10)
    sb = kmeans_fit(two_blobs.repartition(7), n_clusters=2, sample_size=10)
    assert sa == sb
    assert len(sa) == 2 and all(len(x) == 3 for x in sa)


def test_kmeans_fit_k_exceeding_distinct_points(spark):
    """More clusters than distinct points: the init cycles the sample
    instead of dividing by a zero D² mass; every point still assigns
    to SOME center and the fit stays deterministic."""
    d = _vec_df(spark, [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])])
    centers = kmeans_fit(d, n_clusters=4)
    assert len(centers) == 4
    out = kmeans_assign(d, centers=centers).collect()
    assert len(out) == 3
    assert kmeans_fit(d.repartition(5), n_clusters=4) == centers


def test_fit_sample_prefilter_matches_unfiltered_sample(spark):
    """At scale the fit pre-filters by a hash threshold so the
    TakeOrdered merge stays bounded by the sample, not by
    sample × partitions. Selection and ordering use the SAME
    non-negative hash, so the pre-filtered sample must be IDENTICAL
    to the brute-force smallest-hash sample — and therefore the fit
    is too."""
    from dbd_datawarehouse_scraper_spark.operators.clustering import (
        _fit_sample_rows,
    )

    d = _vec_df(
        spark,
        [(i, [float(i % 13), float(i % 7), float(i)]) for i in range(1000)],
    )
    sample_size = 60  # 1000 > 1.25*60: the pre-filter branch runs
    got = [
        (r["_h"], tuple(r["_v"]))
        for r in _fit_sample_rows(d, "embedding", sample_size)
    ]
    full = sorted(
        (r["_h"], tuple(r["_v"]))
        for r in d.select(
            F.col("embedding").cast("array<double>").alias("_v")
        )
        .withColumn("_h", F.pmod(F.xxhash64("_v"), F.lit(1 << 62)))
        .collect()
    )
    assert sorted(got) == full[:sample_size]
    # and across partitionings
    got13 = [
        (r["_h"], tuple(r["_v"]))
        for r in _fit_sample_rows(d.repartition(13), "embedding", sample_size)
    ]
    assert sorted(got13) == full[:sample_size]


def test_lloyd_memory_stays_n_by_k():
    """The driver-side fit must never materialize an (n × k × d)
    broadcast temporary — at d=768/k=256 that is tens of GiB (reviewed
    driver-OOM). Distances use the |x|²-2x·c+|c|² expansion: one
    (n × k) matrix. Pinned by peak traced allocation: the broadcast
    form would allocate n·k·d·8 B ≈ 164 MB here; the expansion stays
    under ~40 MB including the init passes."""
    import tracemalloc

    from dbd_datawarehouse_scraper_spark.operators.clustering import _lloyd

    rng = np.random.RandomState(0)
    sample = rng.randn(20_000, 64)
    tracemalloc.start()
    C = _lloyd(sample, 16, seed=42, max_iter=5, tol=1e-6)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert C.shape == (16, 64)
    assert peak < 120 * 1024 * 1024, f"peak {peak/1e6:.0f} MB"


def test_lloyd_empty_cluster_reseeds_are_distinct():
    """When clusters come up empty in an iteration, each is re-seeded
    on a DIFFERENT farthest point — re-seeding all on THE farthest
    point leaves duplicate centers that never separate (effective k
    silently shrinks). With k separated points and k clusters, every
    seed must end with k distinct centers."""
    from dbd_datawarehouse_scraper_spark.operators.clustering import _lloyd

    pts = np.array(
        [[0.0, 0.0], [100.0, 0.0], [0.0, 100.0], [100.0, 100.0]]
    )
    sample = np.repeat(pts, 5, axis=0)
    for seed in range(8):
        C = _lloyd(sample, 4, seed=seed, max_iter=25, tol=1e-9)
        assert len({tuple(np.round(c, 6)) for c in C}) == 4, f"seed {seed}"


def test_kmeans_assign_fresh_fit_equals_fit_then_assign(spark, two_blobs):
    # both paths assign through the same kernel
    fresh = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(two_blobs, n_clusters=2).collect()
    }
    split = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(
            two_blobs, centers=kmeans_fit(two_blobs, n_clusters=2)
        ).collect()
    }
    assert fresh == split


def test_kmeans_fit_rejects_k1(spark, two_blobs):
    with pytest.raises(ValueError, match="n_clusters"):
        kmeans_fit(two_blobs, n_clusters=1)


def test_cluster_distance_filter_prunes_rank_tails(spark):
    """D4-style pruning: per cluster, the drop_closest fraction
    nearest the centroid and drop_farthest fraction farthest go; known
    radii make the kept set exact. Ties break by id (deterministic),
    the filter is partition-invariant, and bad fractions refuse."""
    from dbd_datawarehouse_scraper_spark.operators.clustering import (
        cluster_distance_filter,
    )

    centers = [[0.0, 0.0], [100.0, 100.0]]
    # cluster 0: radii 1..10 under ids 1..10; cluster 1: two points
    rows = [(i, [float(i), 0.0]) for i in range(1, 11)]
    rows += [(20, [100.0, 101.0]), (21, [100.0, 102.0])]
    d = _vec_df(spark, rows)

    out = cluster_distance_filter(
        d, centers, drop_closest=0.2, drop_farthest=0.1
    )
    kept0 = sorted(
        r["vec_id"] for r in out.collect() if r["cluster"] == 0
    )
    # floor(0.2*10)=2 closest (radii 1,2) and floor(0.1*10)=1 farthest
    # (radius 10) drop
    assert kept0 == [3, 4, 5, 6, 7, 8, 9]
    kept1 = sorted(r["vec_id"] for r in out.collect() if r["cluster"] == 1)
    # tiny cluster: floor(0.2*2)=floor(0.1*2)=0 — nothing drops (the
    # conservative floor semantics; ceil would annihilate the pair)
    assert kept1 == [20, 21]
    assert "_dist" in out.columns

    # tie at the same radius: the LOWER id ranks first and drops
    tie = _vec_df(spark, [(5, [1.0, 0.0]), (6, [0.0, 1.0]), (7, [2.0, 0.0])])
    t = cluster_distance_filter(tie, [[0.0, 0.0]], drop_closest=0.34)
    assert sorted(r["vec_id"] for r in t.collect()) == [6, 7]

    # partition invariance
    a = sorted(
        r["vec_id"]
        for r in cluster_distance_filter(
            d.coalesce(1), centers, drop_closest=0.2, drop_farthest=0.1
        ).collect()
    )
    b = sorted(
        r["vec_id"]
        for r in cluster_distance_filter(
            d.repartition(7), centers, drop_closest=0.2, drop_farthest=0.1
        ).collect()
    )
    assert a == b == sorted(kept0 + kept1)

    with pytest.raises(ValueError, match="drop fractions"):
        cluster_distance_filter(d, centers, drop_closest=1.0)
    with pytest.raises(ValueError, match="leave something"):
        cluster_distance_filter(
            d, centers, drop_closest=0.6, drop_farthest=0.5
        )


def test_cluster_distance_filter_composes_and_floors_exactly(spark):
    """(a) Composing after kmeans_assign/semantic_dedup (input already
    carries 'cluster') must not produce ambiguous columns — the kernel
    replaces them. (b) Drop counts are exact rational floors:
    0.29 × 100 drops exactly 29, not the float64 28.999… → 28."""
    from dbd_datawarehouse_scraper_spark.operators.clustering import (
        cluster_distance_filter,
    )

    rows = [(i, [float(i), 0.0]) for i in range(1, 101)]
    d = _vec_df(spark, rows)
    centers = [[0.0, 0.0]]

    assigned = kmeans_assign(d, centers=centers)  # has 'cluster'
    out = cluster_distance_filter(assigned, centers, drop_closest=0.29)
    assert out.columns.count("cluster") == 1
    kept = sorted(r["vec_id"] for r in out.collect())
    assert kept == list(range(30, 101))  # exactly 29 dropped

    out2 = cluster_distance_filter(
        d, centers, drop_closest=0.29, drop_farthest=0.57
    )
    # 29 closest and 57 farthest of 100 drop: ids 30..43 remain
    assert sorted(r["vec_id"] for r in out2.collect()) == list(range(30, 44))


def test_kmeans_fit_skips_null_vectors(spark):
    """xxhash64(NULL) is the seed (42) — under the non-negative pmod
    sample ordering a null embedding would sort to the FRONT of every
    large-corpus fit sample and crash the driver-side fit. Nulls are
    excluded before hashing; the fit over (rows ∪ nulls) equals the
    fit over rows."""
    rows = [(i, [1.0 * (i % 9), 0.5 * (i % 5), 0.1 * i]) for i in range(40)]
    clean = _vec_df(spark, rows)
    with_null = clean.unionByName(
        spark.createDataFrame(
            [(999, None)], "vec_id long, embedding array<float>"
        )
    )
    assert kmeans_fit(with_null, n_clusters=2) == kmeans_fit(
        clean, n_clusters=2
    )
    # and through the bounded-sample (pre-filter) path
    assert kmeans_fit(
        with_null, n_clusters=2, sample_size=16
    ) == kmeans_fit(clean, n_clusters=2, sample_size=16)


def test_pca_fit_project_roundtrip(spark, tmp_path):
    """PCA preprocessing: the fit matches a numpy reference on the
    same (full) sample, is bit-deterministic across partitionings,
    round-trips through parquet, whitens to unit variance, and
    projects nulls to NULL."""
    from dbd_datawarehouse_scraper_spark.operators.clustering import (
        load_projection,
        pca_fit,
        pca_project,
        save_projection,
    )

    rng = np.random.RandomState(3)
    base = rng.randn(80, 6) @ np.diag([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    rows = [(i, [float(x) for x in base[i]]) for i in range(80)]
    d = _vec_df(spark, rows)

    proj = pca_fit(d, n_components=3)
    assert pca_fit(d.repartition(9), n_components=3) == proj

    out = {
        r["vec_id"]: np.asarray(r["embedding_pca"])
        for r in pca_project(d, proj).collect()
    }
    # numpy reference over the same sample (the corpus IS the sample)
    mean = np.asarray(proj["mean"])
    C = np.asarray(proj["components"])
    for i in range(80):
        ref = ((base[i] - mean) @ C.T).astype(np.float32)
        assert np.allclose(out[i], ref, atol=1e-6)

    # components capture the dominant axes: projected variance sorted
    # descending and whitened variance ~1 per component
    w = np.asarray(
        [
            r["embedding_pca"]
            for r in pca_project(d, proj, whiten=True)
            .orderBy("vec_id")
            .collect()
        ]
    )
    assert np.allclose(w.var(axis=0, ddof=1), 1.0, atol=1e-5)

    # persistence: bit-exact round trip -> identical projections
    p = str(tmp_path / "proj")
    save_projection(spark, proj, p)
    assert load_projection(spark, p) == proj

    # nulls pass through as NULL
    with_null = d.unionByName(
        spark.createDataFrame(
            [(999, None)], "vec_id long, embedding array<float>"
        )
    )
    got = {
        r["vec_id"]: r["embedding_pca"]
        for r in pca_project(with_null, proj).collect()
    }
    assert got[999] is None and got[0] is not None

    with pytest.raises(ValueError, match="n_components"):
        pca_fit(d, n_components=0)
    with pytest.raises(ValueError, match="exceeds dim"):
        pca_fit(d, n_components=7)
    # thin SVD only yields as many components as sample rows —
    # silently returning fewer than asked would be a wrong output
    # dimension downstream, so it refuses
    with pytest.raises(ValueError, match="fit sample"):
        pca_fit(d, n_components=5, sample_size=4)


def test_pca_whiten_rank_deficient_components_pass_through(spark):
    """Rank-deficient directions have ~1e-15 float-noise singular
    values (never exactly 0.0); whitening must NOT divide by them —
    the blown-up noise would dominate every downstream distance. The
    guard is relative to the largest scale: degenerate coordinates
    stay tiny after whiten=True."""
    from dbd_datawarehouse_scraper_spark.operators.clustering import (
        pca_fit,
        pca_project,
    )

    rng = np.random.RandomState(1)
    plane = rng.randn(60, 2)  # true rank 2 embedded in 6 dims
    base = np.hstack([plane @ rng.randn(2, 2), np.zeros((60, 4))])
    d = _vec_df(spark, [(i, [float(x) for x in base[i]]) for i in range(60)])

    proj = pca_fit(d, n_components=4)
    assert proj["scale"][0] > 1e-6 and proj["scale"][2] < 1e-9
    w = np.asarray(
        [
            r["embedding_pca"]
            for r in pca_project(d, proj, whiten=True)
            .orderBy("vec_id")
            .collect()
        ]
    )
    # real components whiten to ~unit variance; degenerate ones pass
    # through as (tiny) raw projections instead of amplified noise
    assert np.allclose(w[:, :2].var(axis=0, ddof=1), 1.0, atol=1e-4)
    assert np.abs(w[:, 2:]).max() < 1e-6


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


def test_centers_save_load_roundtrip_bit_exact(spark, two_blobs, tmp_path):
    from dbd_datawarehouse_scraper_spark.operators.clustering import (
        load_centers,
        save_centers,
    )

    centers = kmeans_fit(two_blobs, n_clusters=2)
    path = str(tmp_path / "centers")
    save_centers(spark, centers, path)
    loaded = load_centers(spark, path)
    assert loaded == centers  # float64 parquet round-trip is bit-exact
    a = {r["vec_id"]: r["cluster"]
         for r in kmeans_assign(two_blobs, centers=centers).collect()}
    b = {r["vec_id"]: r["cluster"]
         for r in kmeans_assign(two_blobs, centers=loaded).collect()}
    assert a == b
    with pytest.raises(ValueError, match="no centers"):
        empty = str(tmp_path / "empty")
        spark.createDataFrame([], "idx INT, center ARRAY<DOUBLE>").write.parquet(empty)
        load_centers(spark, empty)


@pytest.mark.slow
def test_cluster_balanced_sample_tiny_cluster_no_ansi_overflow(spark):
    """One tiny cluster inside a large corpus drives
    ceil(share*BP*total/|c|) past INT range; the rate must clamp to BP
    before the narrow cast (same ANSI CAST_OVERFLOW class as
    per_domain_cap, round 11). The tiny cluster keeps all its rows."""
    rows = [(i, 0) for i in range(3_000_000)] + [(9_000_000, 1)]
    d = spark.createDataFrame(rows, ["vec_id", "cluster"])
    out = cluster_balanced_sample(d, max_share=0.9)
    assert out.filter(F.col("cluster") == 1).count() == 1
