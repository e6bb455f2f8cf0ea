"""BM25 query→document search and reciprocal-rank fusion
(operators/retrieval.py): DuckDB mirror parity (the pytest-side
oracle — the driver window is full), pure-Python RRF model, stop-term
guard, and determinism."""

import duckdb
import pytest
from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.caching import release_caches
from dbd_datawarehouse_scraper_spark.operators.retrieval import bm25_search, rrf_fuse

# the BM25 search semantics as one DuckDB statement — same quantized
# integers, same distinct-query-term (qtf=1) form, same tiebreaks
_BM25_SEARCH_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(str_split_regex(trim(text), '\s+'), w -> w != '')) AS token
  FROM docs),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS _nd FROM docs),
tot AS (SELECT CAST(SUM(dl) AS DOUBLE) AS _tot FROM dl),
scored AS (
  SELECT tf.doc_id, tf.token, df.df,
         CAST(round(
           ln(1.0 + (_nd - CAST(df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5))
           * (CAST(tf.tf AS DOUBLE)
              / (CAST(tf.tf AS DOUBLE)
                 + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / (_tot / _nd))))
           * 1e6) AS BIGINT) AS score_q
  FROM tf JOIN dl USING (doc_id) JOIN df USING (token), nd, tot),
kept AS (
  SELECT scored.* FROM scored, nd
  WHERE CAST(df AS DOUBLE) <= 0.5 * _nd),
qt AS (
  SELECT DISTINCT query_id,
         unnest(list_filter(str_split_regex(trim(query), '\s+'), w -> w != '')) AS token
  FROM queries),
hits AS (
  SELECT qt.query_id, kept.doc_id, SUM(kept.score_q) AS score_q
  FROM qt JOIN kept USING (token)
  GROUP BY qt.query_id, kept.doc_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score_q DESC, doc_id) AS rn
  FROM hits)
SELECT query_id, doc_id, score_q, rn FROM ranked WHERE rn <= {k}
"""

_DOCS = [
    (1, "the cat sat on the mat near the red door"),
    (2, "a dog chased the cat across the green field"),
    (3, "quantum computing uses qubits for parallel computation"),
    (4, "the field of quantum physics studies small particles"),
    (5, "red door green door blue door"),
    (6, ""),
    (7, "cat cat cat dog dog mat"),
]
_QUERIES = [
    (101, "cat mat"),
    (102, "quantum field"),
    (103, "door"),
    (104, "zebra unicorn"),  # no hits
]


def _frames(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(_QUERIES, "query_id long, query string")
    return docs, queries


def test_bm25_search_matches_duckdb_mirror(spark):
    docs, queries = _frames(spark)
    got = sorted(
        (r["query_id"], r["doc_id"], r["score_q"], r["rn"])
        for r in bm25_search(docs, queries, topk=5, persist=False).collect()
    )
    con = duckdb.connect()
    import pandas as pd

    con.register("docs", pd.DataFrame(_DOCS, columns=["doc_id", "text"]))
    con.register("queries", pd.DataFrame(_QUERIES, columns=["query_id", "query"]))
    want = sorted(tuple(r) for r in con.execute(
        _BM25_SEARCH_SQL.format(k=5)
    ).fetchall())
    assert got == want
    assert got  # non-trivial
    release_caches()


def test_bm25_search_semantics(spark):
    docs, queries = _frames(spark)
    res = bm25_search(docs, queries, topk=3, persist=False).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append((r["rn"], r["doc_id"]))
    # 'cat mat': doc 1/7 both match both terms; no-hit query absent
    assert {d for _, d in by_q[101]} >= {1, 7}
    assert 104 not in by_q
    # 'quantum field' matches both quantum docs and the 'field' doc
    assert {d for _, d in by_q[102]} == {2, 3, 4}
    # ranks are 1..n contiguous
    for q, rows in by_q.items():
        assert sorted(rn for rn, _ in rows) == list(range(1, len(rows) + 1))
    release_caches()


def test_bm25_search_max_df_guard(spark):
    """'the' appears in 3/7 docs; with max_df_frac=0.1 every query
    term over the cap joins nothing — a 'the'-only query returns
    empty instead of touching half the corpus."""
    docs, _ = _frames(spark)
    q = spark.createDataFrame([(9, "the")], "query_id long, query string")
    with_guard = bm25_search(docs, q, topk=5, max_df_frac=0.1, persist=False)
    assert with_guard.count() == 0
    no_guard = bm25_search(docs, q, topk=5, max_df_frac=None, persist=False)
    assert no_guard.count() > 0
    release_caches()


def test_bm25_search_validates(spark):
    docs, queries = _frames(spark)
    with pytest.raises(ValueError, match="topk"):
        bm25_search(docs, queries, topk=0)
    with pytest.raises(ValueError, match="max_df_frac"):
        bm25_search(docs, queries, max_df_frac=1.5)


def test_rrf_matches_pure_python(spark):
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)],
        "query_id long, doc_id long, rn int",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (2, 20, 1), (2, 21, 2)],
        "query_id long, doc_id long, rn int",
    )
    got = {
        (r["query_id"], r["doc_id"]): (r["rrf_q"], r["n_systems"], r["rn"])
        for r in rrf_fuse({"a": a, "b": b}, topk=10).collect()
    }

    def c(rank):
        # Spark F.round is HALF_UP; Python round() is banker's — they
        # diverge where 1e6/(60+rank) is exactly x.5 (first at rank 68)
        import math

        return math.floor(1e6 / (60 + rank) + 0.5)

    # doc 11 fuses rank2(a)+rank1(b); doc 20 rank1 in both
    assert got[(1, 11)][0] == c(2) + c(1)
    assert got[(1, 11)][1] == 2
    assert got[(2, 20)] == (2 * c(1), 2, 1)
    # single-system docs carry one contribution
    assert got[(1, 10)][0] == c(1)
    # per-query rank 1 = highest fused score (doc 11 beats single-list
    # rank-1 doc 10: c(2)+c(1) > c(1))
    assert got[(1, 11)][2] == 1
    assert got[(1, 10)][2] == 2


def test_rrf_validates(spark):
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse({})
    a = spark.createDataFrame([(1, 10, 1)], "query_id long, doc_id long, rn int")
    with pytest.raises(ValueError, match="topk"):
        rrf_fuse({"a": a}, topk=0)
    with pytest.raises(ValueError, match="k0"):
        rrf_fuse({"a": a}, k0=0)


def test_rrf_halfup_rounding_at_rank_68(spark):
    """1e6/(60+68) = 7812.5 exactly — HALF_UP must give 7813 (Python
    round() would give 7812; the engines must agree with Spark)."""
    a = spark.createDataFrame(
        [(1, 10, 68)], "query_id long, doc_id long, rn int"
    )
    got = rrf_fuse({"a": a}, topk=1).collect()[0]
    assert got["rrf_q"] == 7813


def test_hybrid_retrieval_query_runs(spark, sf_dir):
    from dbd_datawarehouse_scraper_spark.queries import QUERIES

    out = QUERIES["hybrid_retrieval"].builder(spark, sf_dir).collect()
    assert out
    # dense probe always retrieves strong neighbors: every query fuses
    # at least one doc seen by both systems or ranks are contiguous
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        assert sorted(r["rn"] for r in rows) == list(range(1, len(rows) + 1))
        assert all(r["n_systems"] in (1, 2) for r in rows)
    release_caches()
