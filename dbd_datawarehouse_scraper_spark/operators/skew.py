"""Skew mitigation: salted joins (SURVEY §4 scale notes).

AQE's skew-join splitting handles most skew at runtime; salting is the
explicit fallback for pathological keys (e.g. the similarity join's
first-token block key, where one common first word can dominate a
corpus). The pattern: the skewed (large) side gets a random-but-
deterministic salt in [0, n); the small side replicates each row n
times; the join key becomes (key, salt), fanning one hot key's rows
across n reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_by: Column | None = None,
) -> DataFrame:
    """Equi-join on ``key`` with the large side salted ``n_salts`` ways.

    ``salt_by`` is the deterministic salt source on the large side
    (default: xxhash64 over ALL the large side's columns — deterministic
    across task retries, unlike ``rand()`` or
    ``monotonically_increasing_id()``, which silently break exactly-once
    semantics under retry). The small side is replicated n_salts×, so
    keep it the genuinely small side."""
    if salt_by is None:
        salt_by = F.pmod(
            F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salts)
        )
    lg = large.withColumn("_salt", salt_by.cast("int"))
    sm = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return lg.join(sm, [key, "_salt"], how).drop("_salt")


def widen_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a NARROW input up to the cluster's
    parallelism before per-row-expensive work (interpreted HOF shingle
    construction, pandas-UDF batches).

    A small parquet file arrives as one partition, so a CPU-bound
    operator over it runs on one core no matter how many the cluster
    has — at sf0.1 the MinHash shingle pass measured 3 s single-core
    vs ~0.2 s widened. At real scale inputs already carry ≥cores
    partitions and this is a no-op (no shuffle is ever added for data
    that is already wide). Row order changes; callers must not rely on
    partition order (every survivor/tiebreak in this package is
    explicit, so they don't).

    COST (advisor note): the partition-count probe forces analysis +
    physical planning of ``df`` on the driver — one extra planning
    pass (~tens of ms), paid once per operator invocation, never per
    row. It reads the JVM dataset's RDD directly rather than ``df.rdd``
    (which would additionally build a Python-conversion plan), and the
    pre-execution count can differ from AQE's runtime count — the
    probe is a sizing heuristic, not an invariant."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        n = df._jdf.rdd().getNumPartitions()
    except Exception:  # non-classic backends: fall back to the public API
        n = df.rdd.getNumPartitions()
    if n < target:
        return df.repartition(target)
    return df


def auto_salt_count(
    df: DataFrame,
    key,
    target_rows_per_reducer: int = 100_000,
    max_salts: int = 256,
) -> int:
    """Derive a salt count from the hottest key's frequency:
    ``ceil(top_key_rows / target_rows_per_reducer)``, clamped to
    [1, max_salts].

    The probe is one map-side-combined count per distinct key plus a
    single-row max — the shuffle carries one (key, count) row per
    distinct key per input partition, negligible next to the join the
    salt protects (and the count is exact, so the bound it implies is
    a guarantee, not an estimate). One scalar is collected to the
    driver. Callers pass the LARGE side; the salt count bounds that
    side's per-reducer rows for the hot key at ~target_rows_per_reducer.
    """
    top = (
        df.groupBy(key)
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    if top is None:
        return 1
    return max(1, min(max_salts, -(-int(top) // target_rows_per_reducer)))
