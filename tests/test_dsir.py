"""DSIR importance resampling (operators/dsir.py): full fit+score
DuckDB mirror (sha256 bucketing is engine-identical), target/raw
separation, partition invariance, persistence round-trip + marker
matrix, the threshold gate's explicit empty-doc semantics."""

import pytest

from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.operators.dsir import (
    dsir_filter,
    dsir_fit,
    dsir_score,
    load_dsir,
    save_dsir,
)

TARGET = [
    (i, "the quick brown fox jumps over the lazy dog near the river")
    for i in range(10)
]
RAW = [
    (100, "the quick brown fox jumps over the lazy dog"),  # target-like
    (101, "the lazy dog sleeps near the river bank"),      # targetish
    (102, "zzz qqq xxx kkk www vvv nnn mmm ppp"),          # off-target
    (103, "buy cheap pills now click here buy cheap pills now"),
    (104, ""),                                             # unscoreable
    (105, None),                                           # unscoreable
]

B = 64


def _dfs(spark):
    t = spark.createDataFrame(TARGET, "doc_id INT, text STRING")
    r = spark.createDataFrame(RAW, "doc_id INT, text STRING")
    return t, r


def test_fit_score_matches_duckdb_mirror(spark):
    """End-to-end mirror: DuckDB reimplements featurize (unigrams +
    bigrams, sha256-prefix buckets), the Laplace-smoothed log-ratio
    model, and the per-doc quantized sum — scores must agree exactly
    row-for-row."""
    import duckdb
    import pandas as pd

    from dbd_datawarehouse_scraper_spark.caching import release_caches

    t, r = _dfs(spark)
    model = dsir_fit(t, r, n_buckets=B)
    got = sorted(
        map(tuple, dsir_score(r, model, id_col="doc_id").collect())
    )
    release_caches()

    con = duckdb.connect()
    con.register("target", pd.DataFrame(TARGET, columns=["doc_id", "text"]))
    con.register("raw", pd.DataFrame(RAW, columns=["doc_id", "text"]))
    grams = """
      SELECT doc_id, unnest(list_concat(w,
        CASE WHEN len(w) >= 2
             THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
             ELSE [] END)) AS g
      FROM (SELECT doc_id,
              list_filter(str_split_regex(trim(text), '\\s+'), x -> x != '') AS w
            FROM {src} WHERE text IS NOT NULL)
    """
    sql = f"""
    WITH tg AS ({grams.format(src="target")}),
    rg AS ({grams.format(src="raw")}),
    tb AS (SELECT CAST(('0x' || substr(sha256(g), 1, 8)) AS UBIGINT) % {B}
             AS b, COUNT(*) AS c FROM tg GROUP BY 1),
    rb AS (SELECT CAST(('0x' || substr(sha256(g), 1, 8)) AS UBIGINT) % {B}
             AS b, COUNT(*) AS c FROM rg GROUP BY 1),
    tot AS (SELECT (SELECT SUM(c) FROM tb) AS T, (SELECT SUM(c) FROM rb) AS R),
    model AS (
      SELECT r.range AS b,
        CAST(round((ln((COALESCE(tb.c, 0) + 1) / ((SELECT T FROM tot) + {B}))
                  - ln((COALESCE(rb.c, 0) + 1) / ((SELECT R FROM tot) + {B})))
                   * 1000000) AS BIGINT) AS lrq
      FROM range({B}) r
      LEFT JOIN tb ON tb.b = r.range LEFT JOIN rb ON rb.b = r.range),
    scored AS (
      SELECT rg.doc_id, COUNT(*) AS n_grams, SUM(m.lrq) AS s
      FROM rg JOIN model m
        ON m.b = CAST(('0x' || substr(sha256(rg.g), 1, 8)) AS UBIGINT) % {B}
      GROUP BY rg.doc_id)
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           round(CAST(s AS DOUBLE) / 1000000, 6) AS log_weight,
           round(CAST(s AS DOUBLE) / n_grams / 1000000, 6) AS avg_log_weight
    FROM scored ORDER BY doc_id
    """
    want = sorted(tuple(row) for row in con.execute(sql).fetchall())
    assert got == want


def test_target_like_scores_higher_and_gate(spark):
    from dbd_datawarehouse_scraper_spark.caching import release_caches

    t, r = _dfs(spark)
    model = dsir_fit(t, r, n_buckets=B)
    s = {
        row["doc_id"]: row["avg_log_weight"]
        for row in dsir_score(r, model, id_col="doc_id").collect()
    }
    # unscoreable docs are absent, target-like beats off-target
    assert set(s) == {100, 101, 102, 103}
    assert s[100] > s[102] and s[100] > s[103]
    assert s[101] > s[102]
    # the gate at 0.0 keeps the target-like docs, drops the rest;
    # keep_empty decides the unscoreable rows explicitly
    kept = {r_["doc_id"] for r_ in dsir_filter(r, model, 0.0).collect()}
    assert kept == {d for d, v in s.items() if v >= 0.0}
    assert 104 not in kept and 105 not in kept
    kept_e = {
        r_["doc_id"]
        for r_ in dsir_filter(r, model, 0.0, keep_empty=True).collect()
    }
    assert kept_e == kept | {104, 105}
    release_caches()


def test_partition_invariance(spark):
    from dbd_datawarehouse_scraper_spark.caching import release_caches

    t, r = _dfs(spark)
    model = dsir_fit(t.repartition(5), r.repartition(7), n_buckets=B)
    a = sorted(map(tuple, dsir_score(r, model, id_col="doc_id").collect()))
    b = sorted(
        map(tuple, dsir_score(r.repartition(3), model, id_col="doc_id").collect())
    )
    release_caches()
    model2 = dsir_fit(t, r, n_buckets=B)
    c = sorted(map(tuple, dsir_score(r, model2, id_col="doc_id").collect()))
    release_caches()
    assert a == b == c


def test_save_load_round_trip_and_marker_matrix(spark, tmp_path):
    from dbd_datawarehouse_scraper_spark.caching import release_caches

    t, r = _dfs(spark)
    model = dsir_fit(t, r, n_buckets=B)
    path = str(tmp_path / "dsir")
    save_dsir(spark, model, path)
    a = sorted(map(tuple, dsir_score(r, model, id_col="doc_id").collect()))
    release_caches()
    loaded = load_dsir(spark, path)
    assert (loaded["n_buckets"], loaded["n_target"], loaded["n_raw"]) == (
        B, model["n_target"], model["n_raw"],
    )
    b = sorted(map(tuple, dsir_score(r, loaded, id_col="doc_id").collect()))
    assert a == b
    with pytest.raises(ValueError, match="no DSIR marker"):
        load_dsir(spark, str(tmp_path / "nowhere"))
    spark.createDataFrame(
        [(99, B, 1, 1)], "version INT, n_buckets INT, n_target LONG, n_raw LONG"
    ).repartition(1).write.mode("overwrite").parquet(f"{path}/_meta")
    with pytest.raises(ValueError, match="version 99"):
        load_dsir(spark, path)
    # torn re-save: new buckets under an old still-valid marker (the
    # crash window between the buckets overwrite and the marker
    # rewrite) is detected by the row-count cross-check
    path2 = str(tmp_path / "torn")
    save_dsir(spark, model, path2)
    spark.range(32).select(
        F.col("id").alias("_bucket"), F.lit(0).cast("long").alias("_lrq")
    ).write.mode("overwrite").parquet(f"{path2}/buckets")
    with pytest.raises(ValueError, match="torn"):
        load_dsir(spark, path2)
    # and the delete-marker-first step means a crash BEFORE the marker
    # rewrite always lands in the refused markerless state
    from dbd_datawarehouse_scraper_spark.fsutil import fs_delete

    fs_delete(spark, f"{path2}/_meta")
    with pytest.raises(ValueError, match="no DSIR marker"):
        load_dsir(spark, path2)


def test_validation(spark):
    t, r = _dfs(spark)
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_fit(t, r, n_buckets=1)
    empty = spark.createDataFrame([], "doc_id INT, text STRING")
    with pytest.raises(ValueError, match="target corpus"):
        dsir_fit(empty, r, n_buckets=B)
    with pytest.raises(ValueError, match="raw corpus"):
        dsir_fit(t, empty, n_buckets=B)


def test_funnel_dsir_gate(spark, tmp_path):
    """dsir_opts in the curation funnel: target-like survivors pass,
    off-target docs drop; in-memory == persisted model; validation
    refuses loudly."""
    from dbd_datawarehouse_scraper_spark.caching import release_caches
    from dbd_datawarehouse_scraper_spark.plans import curate_documents

    t, _ = _dfs(spark)
    corpus = spark.createDataFrame(
        [(d, x, "s") for d, x in RAW if x],
        "doc_id long, text string, source string",
    )
    model = dsir_fit(t, corpus, n_buckets=B)
    base = dict(keep_langs=("en", "de", "fr", "es", "zh", "und"),
                min_quality=0.0, min_tokens=1)
    kept = {
        r["doc_id"]
        for r in curate_documents(
            corpus,
            dsir_opts={"model": model, "min_avg_log_weight": 0.0},
            **base,
        ).collect()
    }
    release_caches()
    assert 100 in kept and 101 in kept
    assert 102 not in kept and 103 not in kept
    save_dsir(spark, model, str(tmp_path / "m"))
    kept_p = {
        r["doc_id"]
        for r in curate_documents(
            corpus,
            dsir_opts={"model_path": str(tmp_path / "m"),
                       "min_avg_log_weight": 0.0},
            **base,
        ).collect()
    }
    release_caches()
    assert kept_p == kept
    with pytest.raises(ValueError, match="min_avg_log_weight"):
        curate_documents(corpus, dsir_opts={"model": model}, **base)
    with pytest.raises(ValueError, match="exactly one"):
        curate_documents(
            corpus, dsir_opts={"min_avg_log_weight": 0.0}, **base
        )


def test_stream_export_dsir_gate(spark, tmp_path):
    """dsir_opts in the incremental exporter: model loaded once at
    start, off-target docs never export; bad opts refuse at start."""
    import glob
    import gzip
    import json

    from dbd_datawarehouse_scraper_spark.streaming import file_stream
    from dbd_datawarehouse_scraper_spark.streaming.export import (
        stream_export_training_set,
    )

    t, _ = _dfs(spark)
    docs = spark.createDataFrame(
        [(d, x) for d, x in RAW if x], "doc_id long, text string"
    )
    model = dsir_fit(t, docs, n_buckets=B)
    save_dsir(spark, model, str(tmp_path / "m"))
    from dbd_datawarehouse_scraper_spark.caching import release_caches

    release_caches()
    docs.coalesce(1).write.mode("append").parquet(str(tmp_path / "src"))
    with pytest.raises(ValueError, match="exactly one"):
        stream_export_training_set(
            file_stream(spark, str(tmp_path / "src"), docs.schema),
            str(tmp_path / "o0"), str(tmp_path / "s0"), str(tmp_path / "c0"),
            dsir_opts={"min_avg_log_weight": 0.0},
            keep_langs=("en", "und"), min_quality=0.0, min_tokens=1,
        )
    q = stream_export_training_set(
        file_stream(spark, str(tmp_path / "src"), docs.schema),
        str(tmp_path / "out"), str(tmp_path / "state"), str(tmp_path / "ckpt"),
        dsir_opts={"model_path": str(tmp_path / "m"),
                   "min_avg_log_weight": 0.0},
        keep_langs=("en", "de", "fr", "es", "zh", "und"),
        min_quality=0.0, min_tokens=1, near_dup_threshold=0.95,
    )
    assert q.awaitTermination(240)
    ids = set()
    for f in glob.glob(str(tmp_path / "out/split=*/epoch=*/shard=*/*.gz")):
        with gzip.open(f, "rt", encoding="utf-8") as fh:
            ids |= {json.loads(l)["doc_id"] for l in fh if l.strip()}
    assert 100 in ids or 101 in ids
    assert 102 not in ids and 103 not in ids


def test_fit_score_single_pass_matches_composition(spark):
    """dsir_fit_score (opt r12: one featurize pass, fused counts) is
    bit-identical to dsir_fit + dsir_score when the target is a
    flagged subset of the scored corpus — including unscoreable docs
    (absent either way) and a NULL flag (treated as non-target, like
    the filter it replaces)."""
    from dbd_datawarehouse_scraper_spark.caching import release_caches
    from dbd_datawarehouse_scraper_spark.operators.dsir import (
        dsir_fit,
        dsir_fit_score,
        dsir_score,
    )

    rows = [
        (i, "en" if i % 3 == 0 else ("de" if i % 3 == 1 else None), tx)
        for i, (_, tx) in enumerate(RAW * 3)
    ]
    docs = spark.createDataFrame(rows, "doc_id INT, lang STRING, text STRING")
    flag = F.col("lang") == "en"
    model = dsir_fit(docs.filter(flag), docs, text_col="text", n_buckets=B)
    want = sorted(
        map(tuple, dsir_score(docs, model, id_col="doc_id").collect())
    )
    release_caches()
    got = sorted(
        map(
            tuple,
            dsir_fit_score(
                docs, flag, id_col="doc_id", text_col="text", n_buckets=B
            ).collect(),
        )
    )
    release_caches()
    assert got == want
