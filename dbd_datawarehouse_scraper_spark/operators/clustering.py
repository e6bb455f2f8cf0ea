"""[EXT] Embedding-space corpus curation: k-means partitioning,
SemDeDup-style semantic dedup, cluster-balanced sampling.

MinHash/SimHash catch LEXICAL near-duplicates; paraphrases, translations
and templated rewrites survive them. The embedding-space recipe
(SemDeDup, Abbas et al. 2023) is: cluster the corpus in embedding space
(cheap, k-means), then prune highly-similar pairs WITHIN each cluster —
pairwise comparison only ever happens inside a cluster, never across
the corpus, which is what makes it feasible at scale:

- clustering: MLlib KMeans (the same coarse quantizer ``ivf_topk``
  uses) — one pass of Lloyd's per iteration, centroids broadcast;
- within-cluster dedup: ``applyInPandas`` per cluster — a numpy cosine
  Gram matrix and a greedy earliest-id-wins sweep. Cost is O(|c|²) per
  cluster; pick ``n_clusters ≈ N/target_cluster_size`` so |c| stays
  bounded (SemDeDup used ~11k clusters for ~100M docs). Oversized
  clusters are sub-split by a deterministic hash before the pairwise
  stage, bounding worst-case memory at a small recall cost on the
  split boundary — the standard escape hatch for degenerate clusters
  (it also caps the Arrow batch a single executor must hold);
- balancing: per-cluster keep rates from one small aggregate, applied
  as a content-hash threshold filter (rerun/partition-invariant, like
  every selection in this package) — caps any one cluster's share of
  the output (topic balancing / dominant-boilerplate suppression).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BP = 10_000


def kmeans_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    n_clusters: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Append a ``cluster`` column: MLlib KMeans(seed) fit + transform.
    Returns the input columns plus ``cluster`` (int).

    Determinism caveat: k-means|| init samples per PARTITION, so for a
    fixed seed the fitted centroids are deterministic for a fixed
    partitioning but not guaranteed bit-identical across different
    partitionings of the same rows; assignments converge to the same
    clustering when the data has real cluster structure (which is what
    the partition-invariance test pins on separated blobs). Pipelines
    needing bit-exact rerun stability should fix the input
    partitioning (e.g. repartition by id) before calling, or persist
    the fitted centers."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if n_clusters < 2:  # MLlib requires k ≥ 2; k=1 is "no clustering"
        return df.withColumn("cluster", F.lit(0))
    with_vec = df.withColumn(
        "_kma_v", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    model = KMeans(
        k=n_clusters, seed=seed, featuresCol="_kma_v", predictionCol="cluster"
    ).fit(with_vec)
    return model.transform(with_vec).drop("_kma_v")


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    threshold: float = 0.95,
    seed: int = 42,
    max_cluster_size: int = 20_000,
) -> DataFrame:
    """SemDeDup: drop rows whose embedding has cosine ≥ ``threshold``
    with an earlier-id row in the same k-means cluster. Returns the
    SURVIVORS with their ``cluster`` assignment.

    Within a (sub-)cluster the survivor rule is greedy earliest-id-wins
    over the cosine Gram matrix — deterministic, partition-invariant
    (ids sort before the sweep), and independent of Arrow batch order.
    End-to-end partition invariance additionally rests on the k-means
    assignment being stable (see the :func:`kmeans_assign` caveat):
    boundary points in structureless data can change cluster — and
    therefore dedup scope — under a different input partitioning.
    Clusters larger than ``max_cluster_size`` are sub-split by
    ``xxhash64(id) % ceil(|c|/max)`` before the pairwise stage: memory
    per task stays O(max²) and near-dups split across sub-buckets are
    missed (bounded, documented recall cost — raise ``n_clusters``
    rather than ``max_cluster_size`` if that matters).
    """
    assigned = kmeans_assign(df, vec_col, n_clusters, seed)
    # sub-split oversized clusters: a count per cluster is tiny; join it
    # back broadcast and derive a deterministic sub-bucket per row.
    sizes = assigned.groupBy("cluster").agg(F.count("*").alias("_c_n"))
    sub = (
        assigned.join(F.broadcast(sizes), "cluster")
        .withColumn(
            "_n_sub",
            F.ceil(F.col("_c_n") / F.lit(float(max_cluster_size))).cast("int"),
        )
        .withColumn(
            "_sub",
            F.pmod(F.xxhash64(F.col(id_col)), F.greatest(F.col("_n_sub"), F.lit(1))),
        )
        .drop("_c_n", "_n_sub")
    )

    out_schema = sub.drop("_sub").schema

    def _dedup_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]], dtype=np.float64
        )
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0  # zero vectors: cosine treated as 0
        unit = mat / norms[:, None]
        sims = unit @ unit.T
        keep = np.ones(len(pdf), dtype=bool)
        for i in range(len(pdf)):
            if not keep[i]:
                continue
            # drop every LATER row similar to survivor i
            dup = sims[i, i + 1 :] >= threshold
            keep[i + 1 :] &= ~dup
        return pdf.loc[keep].drop(columns=["_sub"])

    return sub.groupBy("cluster", "_sub").applyInPandas(_dedup_group, out_schema)


def cluster_balanced_sample(
    assigned: DataFrame,
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
    max_share: float = 0.25,
    salt: str = "cluster-balance:",
) -> DataFrame:
    """Cap every cluster's kept rows at ``max_share`` of the INPUT size.

    Keep rate per cluster = min(1, max_share·N / |c|), N = input rows —
    a per-cluster ceiling in absolute terms, which suppresses dominant
    clusters without promising fixed OUTPUT proportions: when several
    clusters hit the cap their output shares equalize at the cap-sized
    count, and clusters below the cap are kept whole (so a capped
    cluster's share of the OUTPUT can exceed ``max_share`` when the
    output is much smaller than the input — exact output-share targets
    need the iterative waterfill, deliberately not done here: one
    aggregate, one filter). Membership is a
    sha256 content-hash threshold on (salt || id), so the sample is
    rerun- and partition-invariant and decorrelated from every other
    hash-keyed selection (different salt). One small aggregate (|k|
    rows, broadcast back) — no global sort, no driver-side data.
    """
    if not (0.0 < max_share <= 1.0):
        raise ValueError(f"max_share out of (0, 1]: {max_share}")
    sizes = assigned.groupBy(cluster_col).agg(F.count("*").alias("_c_n"))
    totals = sizes.agg(F.sum("_c_n").alias("_total"))
    rates = sizes.crossJoin(F.broadcast(totals)).select(
        cluster_col,
        F.least(
            F.lit(_BP),
            F.ceil(F.lit(max_share * _BP) * F.col("_total") / F.col("_c_n")).cast(
                "int"
            ),
        ).alias("_rate_bp"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.sha2(F.concat(F.lit(salt), F.col(id_col).cast("string")), 256), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % _BP
    )
    return (
        assigned.join(F.broadcast(rates), cluster_col)
        .filter(bucket < F.col("_rate_bp"))
        .drop("_rate_bp")
    )
