"""[EXT] Embedding-space corpus curation: k-means partitioning,
SemDeDup-style semantic dedup, cluster-balanced sampling.

MinHash/SimHash catch LEXICAL near-duplicates; paraphrases, translations
and templated rewrites survive them. The embedding-space recipe
(SemDeDup, Abbas et al. 2023) is: cluster the corpus in embedding space
(cheap, k-means), then prune highly-similar pairs WITHIN each cluster —
pairwise comparison only ever happens inside a cluster, never across
the corpus, which is what makes it feasible at scale:

- clustering: a coarse k-means quantizer (the same one ``ivf_topk``
  uses) fit on a BOUNDED content-hash-selected sample with seeded
  numpy Lloyd's on the driver — the FAISS-style recipe (quantizer
  training never needs full-corpus passes: centroid placement
  converges on a ~256·k sample); a sizing count + one bounded
  TakeOrdered pass select the sample (content-keyed, null-free), so
  the fit is partition- and rerun-invariant, and
  ``kmeans_fit`` / ``kmeans_assign`` split fit from assignment so
  centers persist and every rerun is bit-deterministic;
- within-cluster dedup: ``applyInPandas`` per cluster — a TILED
  greedy earliest-id-wins cosine sweep (row blocks of ``_SWEEP_TILE``
  against all columns: O(tile·|c|) peak memory, never the |c|² Gram;
  compute is still O(|c|²)); pick ``n_clusters ≈
  N/target_cluster_size`` so |c| stays bounded (SemDeDup used ~11k
  clusters for ~100M docs). Oversized clusters are sub-split by a
  deterministic hash before the pairwise stage, bounding worst-case
  task input at a small recall cost on the split boundary — the
  standard escape hatch for degenerate clusters (it also caps the
  Arrow batch a single executor must hold);
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

#: Row-block size for the tiled within-cluster cosine sweep. Peak kernel
#: allocation is one (tile × |c|) float64 block — 2048 × 5000 × 8 B ≈
#: 80 MB at the default ``max_cluster_size`` — never the |c|² Gram.
_SWEEP_TILE = 2048


#: Default fit-sample bound: FAISS trains IVF quantizers on ~256·k
#: points; 64k double-precision 64-dim vectors is ~33 MB on the driver.
_FIT_SAMPLE = 65_536

_HASH_SPAN = 1 << 62  # pmod(xxhash64, 2^62): uniform, fits a long


def _fit_sample_rows(df: DataFrame, vec_col: str, sample_size: int) -> list:
    """The ``sample_size`` non-null rows with the smallest non-negative
    content hash, as collected Rows of (_v: array<double>, _h: long).
    See :func:`kmeans_fit` for why a hash-threshold pre-filter bounds
    the TakeOrdered merge at high partition counts.

    NULL vectors are excluded BEFORE hashing: ``xxhash64(NULL)``
    returns the seed (42), which under the non-negative pmod ordering
    would sort every null row to the FRONT of the sample and crash the
    driver-side fit (reviewed). The sizing ``count()`` is one extra
    pass of the projected relation — near-free on a parquet scan
    (row-group metadata), a real second evaluation on an expensive
    derived plan; fit from a persisted relation (or persist centers,
    the production shape) when that matters."""
    hashed = (
        df.select(F.col(vec_col).cast("array<double>").alias("_v"))
        .filter(F.col("_v").isNotNull())
        .withColumn("_h", F.pmod(F.xxhash64("_v"), F.lit(_HASH_SPAN)))
    )
    n_total = hashed.count()
    if n_total > 1.25 * sample_size:
        thresh = max(1, int(1.25 * sample_size / n_total * _HASH_SPAN))
        hashed = hashed.filter(F.col("_h") < thresh)
    return hashed.orderBy("_h").limit(sample_size).collect()


def _lloyd(sample, n_clusters: int, seed: int, max_iter: int, tol: float):
    """Seeded k-means++ init + Lloyd's over an in-memory (n × d)
    float64 matrix. Pure numpy, deterministic for a fixed (sample,
    seed) — ``np.random.RandomState`` is platform-stable. Returns a
    (k × d) center matrix.

    Memory: distances use the ``|x|² - 2x·c + |c|²`` expansion — one
    (n × k) float64 matrix (at the 64k-sample default and k=256 that
    is ~134 MB), NEVER the (n × k × d) broadcast temporary (96 GiB at
    d=768/k=256 — a reviewed driver-OOM). The init keeps a running
    per-point min-distance, so each draw costs one O(n·d) pass.
    Empty clusters are re-seeded on SUCCESSIVE farthest points (by
    distance to their assigned center, descending, one distinct row
    per empty cluster) — re-seeding them all on THE farthest point
    would leave duplicate centers that never separate (effective k
    shrinks). Centers can still coincide when the sample has fewer
    distinct points than k; nearest-center ties break to the lowest
    index downstream."""
    import numpy as np

    n = len(sample)
    rng = np.random.RandomState(seed)
    s2 = (sample * sample).sum(axis=1)

    def _d2_to(c):  # squared distances to ONE center, O(n·d)
        d = s2 - 2.0 * (sample @ c) + (c * c).sum()
        return np.maximum(d, 0.0)

    # k-means++: first center seeded, then D²-weighted draws against a
    # running min-distance (O(n·d) per draw, not O(n·k·d))
    centers = [sample[rng.randint(n)].copy()]
    best = _d2_to(centers[0])
    for _ in range(1, n_clusters):
        total = best.sum()
        if total <= 0.0:  # fewer distinct points than k: cycle the sample
            nxt = sample[len(centers) % n].copy()
        else:
            nxt = sample[rng.choice(n, p=best / total)].copy()
        centers.append(nxt)
        np.minimum(best, _d2_to(nxt), out=best)
    C = np.asarray(centers)
    for _ in range(max_iter):
        # (n × k) expansion, clamped at 0 for float cancellation
        d2 = s2[:, None] - 2.0 * (sample @ C.T) + (C * C).sum(axis=1)[None, :]
        np.maximum(d2, 0.0, out=d2)
        assign = d2.argmin(axis=1)
        new = C.copy()
        empties = [
            c for c in range(n_clusters) if not np.any(assign == c)
        ]
        if empties:
            far_order = np.argsort(
                -d2[np.arange(n), assign], kind="stable"
            )
        for rank, c in enumerate(empties):
            new[c] = sample[far_order[rank % n]]
        for c in set(range(n_clusters)) - set(empties):
            new[c] = sample[assign == c].mean(axis=0)
        shift = float(((new - C) ** 2).sum())
        C = new
        if shift <= tol:
            break
    return C


def _fit_sample_matrix(df: DataFrame, vec_col: str, sample_size: int):
    """:func:`_fit_sample_rows` as a canonical-ordered (n × d) float64
    matrix — the shared front half of :func:`kmeans_fit` and
    :func:`pca_fit`. Collect order is partition-dependent even under
    orderBy for tied hashes, so rows are re-sorted by (hash, values)
    before any seeded computation sees them."""
    import numpy as np

    rows = _fit_sample_rows(df, vec_col, int(sample_size))
    if not rows:
        raise ValueError("cannot fit on an empty relation")
    pairs = sorted((r["_h"], tuple(r["_v"])) for r in rows)
    return np.asarray([p[1] for p in pairs], dtype=np.float64)


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    n_clusters: int = 8,
    seed: int = 42,
    sample_size: int = _FIT_SAMPLE,
    max_iter: int = 25,
    tol: float = 1e-6,
) -> list:
    """Fit a k-means coarse quantizer and return the centers as a plain
    ``list[list[float]]`` — a tiny, persistable artifact (JSON / a
    k-row parquet table). Feed it back to :func:`kmeans_assign` /
    :func:`semantic_dedup` via ``centers=`` so every assign after the
    fit is a pure per-row broadcast computation.

    The fit itself is sample-based, the FAISS-style quantizer recipe:
    select the ``sample_size`` rows with the smallest non-negative
    content hash (``pmod(xxhash64(vector), 2^62)`` — partition- and
    rerun-invariant), then run seeded k-means++ + Lloyd's in numpy on
    the driver. Centroid placement converges on a ~256·k sample;
    full-corpus Lloyd's passes buy nothing at 100 TB but cost a scan
    each. Corpora at or below ``sample_size`` fit on ALL their rows
    (the local-test regime). Unlike the MLlib k-means|| fit this
    replaced, the result is bit-deterministic across reruns AND input
    repartitionings — the sample is content-keyed and the driver
    re-sorts it before init.

    Scale shape: a bare ``orderBy(hash).limit(s)`` funnels the
    per-partition top-``s`` sets — ``s × num_partitions`` rows — into
    one merge, which at 10k partitions is ~half a billion rows. A
    stateless hash-threshold pre-filter (rate from one ``count()``,
    ~free on a plain parquet scan) first cuts the relation to
    ~1.25·``sample_size`` rows, bounding the merge regardless of
    partition count; because selection and ordering use the SAME
    non-negative hash, the pre-filtered sample is identical to the
    unfiltered one whenever enough rows pass (the 1.25 oversample
    makes a shortfall vanishingly rare, and a shortfall only shrinks
    the sample, never biases it).
    """
    if n_clusters < 2:  # k=1 is "no clustering"
        raise ValueError(f"n_clusters must be >= 2 to fit, got {n_clusters}")
    sample = _fit_sample_matrix(df, vec_col, sample_size)
    centers = _lloyd(sample, n_clusters, seed, max_iter, tol)
    return [[float(x) for x in c] for c in centers]


def save_centers(spark, centers: list, path: str) -> None:
    """Persist :func:`kmeans_fit` centers as a k-row parquet table
    (``idx INT, center ARRAY<DOUBLE>``) on any Hadoop-FS path — the
    durable half of the fit-once/assign-many contract."""
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "idx INT, center ARRAY<DOUBLE>",
    ).repartition(1).write.mode("overwrite").parquet(path)


def load_centers(spark, path: str) -> list:
    """Read centers persisted by :func:`save_centers`, in index order
    — round-trips bit-exactly (float64 both ways), so assignments from
    loaded centers match assignments from the in-memory fit."""
    rows = spark.read.parquet(path).orderBy("idx").collect()
    if not rows:
        raise ValueError(f"no centers found at {path}")
    return [list(r["center"]) for r in rows]


def _assign_to_centers(df: DataFrame, vec_col: str, centers: list) -> DataFrame:
    """Nearest-center assignment against a fixed (broadcast) center
    list: one Arrow-vectorized pandas kernel per batch, no fit, no
    shuffle. Ties break to the lowest center index (numpy argmin
    keeps the first occurrence), so the assignment is a pure
    deterministic function of (row, centers). Delegates to the ONE
    distance kernel (:func:`_assign_with_distance`) so assignment
    semantics can never drift between the two entry points; the
    dropped ``_dist`` costs one sqrt+gather next to the matmul."""
    return _assign_with_distance(df, vec_col, centers).drop("_dist")


def kmeans_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    n_clusters: int = 8,
    seed: int = 42,
    centers: list | None = None,
) -> DataFrame:
    """Append a ``cluster`` column: nearest center by L2 distance.
    Returns the input columns plus ``cluster`` (int).

    With ``centers`` (from a persisted :func:`kmeans_fit`), this is a
    pure broadcast nearest-center computation — the production-rerun
    path. Without it, :func:`kmeans_fit` runs on ``df`` first; since
    the fit is content-hash-sampled + driver-side Lloyd's, BOTH paths
    are bit-deterministic across reruns and input repartitionings
    (persisting centers still matters when the corpus itself changes
    between runs — appended rows shift a fresh fit). Both paths assign
    through the same kernel, so
    ``kmeans_assign(df, centers=kmeans_fit(df))`` ==
    ``kmeans_assign(df)`` for the same fit."""
    if centers is None:
        if n_clusters < 2:  # k=1 is "no clustering"
            return df.withColumn("cluster", F.lit(0))
        centers = kmeans_fit(df, vec_col, n_clusters, seed)
    return _assign_to_centers(df, vec_col, centers)


def _greedy_cosine_survivors(
    mat, threshold: float, tile: int = _SWEEP_TILE, pinned: int = 0
):
    """Greedy earliest-row-wins cosine dedup over a (n × d) matrix;
    returns the boolean keep mask. Rows must already be in id order.

    The similarity matrix is consumed in row blocks of ``tile``
    (``np.matmul(unit[a:b], unit.T)`` — shape (≤tile, n)), never
    materialized as the full n×n Gram: peak extra memory is
    O(tile·n) instead of O(n²). The survivor set is identical to the
    full-Gram sweep by construction — similarities are static, rows
    are processed in ascending order, and each row's drop decisions
    read only the keep mask written by earlier rows.

    The first ``pinned`` rows are ALREADY-ACCEPTED history (the
    incremental form): they are never dropped — not even by each
    other — but still suppress later (non-pinned) rows. With
    ``pinned=0`` this is the pure batch sweep."""
    import numpy as np

    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0  # zero vectors: cosine treated as 0
    unit = mat / norms[:, None]
    n = len(unit)
    keep = np.ones(n, dtype=bool)
    for start in range(0, n, tile):
        end = min(start + tile, n)
        block = np.matmul(unit[start:end], unit.T)
        for bi in range(end - start):
            i = start + bi
            if not keep[i]:
                continue
            # drop every LATER non-pinned row similar to survivor i
            j0 = max(i + 1, pinned)
            if j0 >= n:
                continue
            dup = block[bi, j0:] >= threshold
            keep[j0:] &= ~dup
    return keep


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    threshold: float = 0.95,
    seed: int = 42,
    max_cluster_size: int = 5_000,
    centers: list | None = None,
) -> DataFrame:
    """SemDeDup: drop rows whose embedding has cosine ≥ ``threshold``
    with an earlier-id row in the same k-means cluster. Returns the
    SURVIVORS with their ``cluster`` assignment.

    Within a (sub-)cluster the survivor rule is greedy earliest-id-wins
    over cosine similarities — deterministic, partition-invariant (ids
    sort before the sweep), and independent of Arrow batch order. The
    sweep is tiled (:func:`_greedy_cosine_survivors`): peak kernel
    memory is O(tile·|c|) per task, never the |c|² Gram — at the
    defaults ≈ 80 MB, safe for tens of concurrent tasks per executor.
    The survivor set is bit-deterministic across reruns and input
    partitionings on both fit paths — a fresh :func:`kmeans_fit` is
    content-hash-sampled and driver-side, so it no longer varies with
    the input partitioning; pass ``centers`` from a persisted fit when
    the CORPUS changes between runs (appends shift a fresh fit's
    sample) and the selection must stay frozen.
    Clusters larger than ``max_cluster_size`` are sub-split by
    ``xxhash64(id) % ceil(|c|/max)`` before the pairwise stage: task
    input stays O(max) rows and near-dups split across sub-buckets are
    missed (bounded, documented recall cost — raise ``n_clusters``
    rather than ``max_cluster_size`` if that matters).
    """
    assigned = kmeans_assign(df, vec_col, n_clusters, seed, centers=centers)
    # sub-split oversized clusters: a count per cluster is tiny; join it
    # back broadcast and derive a deterministic sub-bucket per row.
    sizes = assigned.groupBy("cluster").agg(F.count("*").alias("_c_n"))
    sub = (
        assigned.join(F.broadcast(sizes), "cluster")
        .withColumn(
            "_n_sub",
            # long, not int: the sub-split count is bounded by |c| and
            # an INT cast would be ANSI-fatal on pathological clusters
            F.ceil(F.col("_c_n") / F.lit(float(max_cluster_size))).cast("long"),
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
        keep = _greedy_cosine_survivors(mat, threshold)
        return pdf.loc[keep].drop(columns=["_sub"])

    return sub.groupBy("cluster", "_sub").applyInPandas(_dedup_group, out_schema)


def _assign_with_distance(
    df: DataFrame, vec_col: str, centers: list
) -> DataFrame:
    """Like :func:`_assign_to_centers` but also emits ``_dist`` — the
    Euclidean distance to the assigned (nearest) center. One Arrow
    kernel, same determinism (argmin keeps the first index on ties)."""
    import numpy as np

    C = np.asarray(centers, dtype=np.float64)
    if C.ndim != 2 or len(C) == 0:
        raise ValueError(f"centers must be a non-empty k x d list, got shape {C.shape}")
    c2 = (C * C).sum(axis=1)

    @F.pandas_udf("struct<cluster:int, _dist:double>")
    def _nearest_d(vs: pd.Series) -> pd.DataFrame:
        x = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in vs], dtype=np.float64
        )
        if len(x) == 0:
            return pd.DataFrame({"cluster": [], "_dist": []})
        d2 = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ C.T) + c2[None, :]
        np.maximum(d2, 0.0, out=d2)
        a = d2.argmin(axis=1)
        return pd.DataFrame(
            {
                "cluster": a.astype("int32"),
                "_dist": np.sqrt(d2[np.arange(len(x)), a]),
            }
        )

    s = df.withColumn("_cd", _nearest_d(F.col(vec_col)))
    # REPLACE any pre-existing cluster/_dist (e.g. composing after
    # kmeans_assign or semantic_dedup survivors) — appending would
    # leave two 'cluster' columns and every downstream reference
    # ambiguous (reviewed)
    keep = [c for c in df.columns if c not in ("cluster", "_dist")]
    return s.select(*keep, "_cd.cluster", "_cd._dist")


def cluster_distance_filter(
    df: DataFrame,
    centers: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    drop_closest: float = 0.1,
    drop_farthest: float = 0.0,
) -> DataFrame:
    """D4-style prototype/outlier pruning (Tirumala et al. 2023 —
    SemDeDup removes DUPLICATES; this removes the per-cluster
    distance-rank tails): within each k-means cluster, drop the
    ``drop_closest`` fraction of rows NEAREST the centroid (the
    over-represented "prototypical" mass — templated/boilerplate-like
    points that add little diversity) and the ``drop_farthest``
    fraction FARTHEST from it (embedding-space outliers: mislabeled /
    off-distribution rows). Returns survivors with their ``cluster``
    and ``_dist`` columns.

    Rank-exact, not quantile-approximate: rows are ranked per cluster
    by (1e-9-quantized distance, id) — the quantization absorbs BLAS
    batch-shape ulp noise and the id tiebreak makes the kept set a
    pure deterministic function of (rows, centers), rerun- and
    partition-invariant like every selection in this package. Drop
    fractions resolve to basis points (1/10000) and the per-cluster
    drop counts are exact integer floors of that rational — no binary
    float rounding (0.29 of a 100-row cluster drops exactly 29)
    (``percentile_approx``'s sketch merge is partition-order
    sensitive, so it is deliberately not used). Cost: one broadcast
    assignment kernel + one per-cluster sort window — the same
    cluster-bounded shuffle shape as ``semantic_dedup``; ``centers``
    must come from :func:`kmeans_fit` (frozen centers keep the prune
    reproducible across corpus growth)."""
    from pyspark.sql import Window

    if not (0.0 <= drop_closest < 1.0) or not (0.0 <= drop_farthest < 1.0):
        raise ValueError(
            f"drop fractions out of [0, 1): {drop_closest}, {drop_farthest}"
        )
    if drop_closest + drop_farthest >= 1.0:
        raise ValueError(
            f"drop_closest + drop_farthest must leave something: "
            f"{drop_closest} + {drop_farthest} >= 1"
        )
    d = _assign_with_distance(df, vec_col, centers)
    # rank on the 1e-9-quantized distance (the package's quantized-
    # integer ranking convention): BLAS may produce ulp-different
    # distances under different Arrow batch shapes, and the id
    # tiebreak only fires on exact equality — quantizing makes the
    # rank a stable function of (row, centers) across partitionings
    qdist = F.round(F.col("_dist") * F.lit(1e9)).cast("long")
    w = Window.partitionBy("cluster").orderBy(qdist.asc(), F.col(id_col).asc())
    ranked = d.withColumn("_rk", F.row_number().over(w)).withColumn(
        "_cn", F.count("*").over(Window.partitionBy("cluster"))
    )
    # floor, not ceil: on tiny clusters a fraction below 1/|c| drops
    # NOTHING rather than a whole point per tail — conservative
    # (never annihilates a small cluster; a 2-point cluster at
    # 0.2+0.1 would otherwise lose both ends). Integer basis-point
    # arithmetic (`div`), not float multiply: 0.29*100 is
    # 28.999999999999996 in float64 and floor would keep one extra
    # row vs the documented exact fraction.
    bp_lo = int(round(drop_closest * _BP))
    bp_hi = int(round(drop_farthest * _BP))
    lo = F.expr(f"({bp_lo}L * _cn) div {_BP}L")
    hi = F.col("_cn") - F.expr(f"({bp_hi}L * _cn) div {_BP}L")
    return ranked.filter((F.col("_rk") > lo) & (F.col("_rk") <= hi)).drop(
        "_rk", "_cn"
    )


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    n_components: int = 32,
    sample_size: int = _FIT_SAMPLE,
) -> dict:
    """Fit a PCA basis for embedding preprocessing (the D4-class
    recipe whitens/reduces embeddings before clustering and semantic
    dedup): collect the same bounded content-hash sample the k-means
    fit uses (:func:`_fit_sample_rows` — partition- and rerun-
    invariant, null-free, bounded merge), run one exact SVD on the
    driver (a 64k × d float64 SVD is sub-second for d ≤ ~1k), and
    return a plain persistable dict:

    - ``mean`` — the sample mean (list[float], length d);
    - ``components`` — the top ``n_components`` right singular
      vectors as rows (list[list[float]], k × d);
    - ``scale`` — per-component standard deviations
      (singular value / sqrt(n-1)); :func:`pca_project` divides by
      these when ``whiten=True``.

    Deterministic: the sample is canonical-ordered and
    ``numpy.linalg.svd`` is deterministic for a fixed input; each
    component's sign is normalized (largest-|coefficient| entry made
    positive) so the basis is unique even where SVD sign is
    arbitrary. Persist with :func:`save_projection` for the same
    fit-once/project-many contract as the k-means centers."""
    import numpy as np

    if n_components < 1:
        raise ValueError(f"n_components must be >= 1, got {n_components}")
    sample = _fit_sample_matrix(df, vec_col, sample_size)
    n, d = sample.shape
    if n_components > d:
        raise ValueError(f"n_components {n_components} exceeds dim {d}")
    if n_components > n:
        # thin SVD returns only n right singular vectors; silently
        # returning fewer components than asked would propagate a
        # wrong output dimension through every projection (reviewed)
        raise ValueError(
            f"n_components {n_components} exceeds the {n}-row fit "
            "sample — raise sample_size or lower n_components"
        )
    mean = sample.mean(axis=0)
    centered = sample - mean
    # exact thin SVD; rows of Vt are the principal axes
    _, s, vt = np.linalg.svd(centered, full_matrices=False)
    comps = vt[:n_components]
    # sign convention: the largest-|coefficient| entry of each
    # component is positive (ties impossible at the same |value| only
    # for exact symmetric data; argmax keeps the first index)
    flip = np.sign(comps[np.arange(len(comps)), np.abs(comps).argmax(axis=1)])
    flip[flip == 0.0] = 1.0
    comps = comps * flip[:, None]
    denom = max(n - 1, 1)
    scale = (s[:n_components] / np.sqrt(denom)).tolist()
    return {
        "mean": [float(x) for x in mean],
        "components": [[float(x) for x in c] for c in comps],
        "scale": [float(x) for x in scale],
    }


def save_projection(spark, projection: dict, path: str) -> None:
    """Persist a :func:`pca_fit` projection as a (k+1)-row parquet
    table (row -1 holds the mean with the scales' slot unused) — the
    durable half of fit-once/project-many, like :func:`save_centers`."""
    rows = [(-1, projection["mean"], 0.0)] + [
        (i, c, projection["scale"][i])
        for i, c in enumerate(projection["components"])
    ]
    spark.createDataFrame(
        rows, "idx INT, vec ARRAY<DOUBLE>, scale DOUBLE"
    ).repartition(1).write.mode("overwrite").parquet(path)


def load_projection(spark, path: str) -> dict:
    """Read a projection persisted by :func:`save_projection` —
    float64 both ways, so projections from a loaded basis match
    projections from the in-memory fit bit-for-bit."""
    rows = spark.read.parquet(path).orderBy("idx").collect()
    if not rows or rows[0]["idx"] != -1:
        raise ValueError(f"no PCA projection found at {path}")
    return {
        "mean": list(rows[0]["vec"]),
        "components": [list(r["vec"]) for r in rows[1:]],
        "scale": [float(r["scale"]) for r in rows[1:]],
    }


def pca_project(
    df: DataFrame,
    projection: dict,
    vec_col: str = "embedding",
    out_col: str = "embedding_pca",
    whiten: bool = False,
) -> DataFrame:
    """Project ``vec_col`` onto a :func:`pca_fit` basis as ``out_col``
    (array<float>): one broadcast Arrow matmul kernel per batch, no
    shuffle — the same production shape as :func:`kmeans_assign` with
    saved centers. ``whiten=True`` additionally divides each component
    by its fitted standard deviation (unit-variance output — the
    distance metric equalizer the D4 recipe uses before k-means).
    Null vectors project to NULL (they carry no signal; filter or
    impute upstream)."""
    import numpy as np

    C = np.asarray(projection["components"], dtype=np.float64)
    mean = np.asarray(projection["mean"], dtype=np.float64)
    scale = np.asarray(projection["scale"], dtype=np.float64)
    if whiten:
        # degenerate (rank-deficient) components pass through rather
        # than whiten: their singular values are float NOISE (~1e-15,
        # never exactly 0.0), and dividing by them would blow noise up
        # into coordinates that dominate every downstream distance —
        # the guard is RELATIVE to the largest scale (reviewed)
        safe = scale.copy()
        top = float(safe.max()) if len(safe) else 0.0
        safe[safe <= top * 1e-9] = 1.0

    @F.pandas_udf("array<float>")
    def _proj(vs: pd.Series) -> pd.Series:
        out = []
        mask = vs.notna()
        if mask.any():
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in vs[mask]],
                dtype=np.float64,
            )
            y = (x - mean) @ C.T
            if whiten:
                y = y / safe
            y32 = y.astype(np.float32)
        it = iter(range(int(mask.sum())))
        for ok in mask:
            out.append(y32[next(it)].tolist() if ok else None)
        return pd.Series(out)

    return df.withColumn(out_col, _proj(F.col(vec_col)))


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
        # least() BEFORE the narrow cast: a tiny cluster in a huge
        # corpus makes ceil(share·BP·total/|c|) exceed INT range, and
        # under ANSI mode the cast is fatal (round-11 per_domain_cap
        # finding — same pattern)
        F.least(
            F.lit(_BP).cast("long"),
            F.ceil(F.lit(max_share * _BP) * F.col("_total") / F.col("_c_n")),
        )
        .cast("int")
        .alias("_rate_bp"),
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
