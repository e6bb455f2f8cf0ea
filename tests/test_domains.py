"""Domain/URL-level curation: extract_domain, blocklist anti-join,
per-domain document/token caps (operators/domains.py). The cap
arithmetic is mirrored row-for-row in DuckDB."""

import duckdb
import pytest
from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.operators.domains import (
    domain_blocklist_filter,
    extract_domain,
    per_domain_cap,
)


def test_extract_domain_shapes(spark):
    cases = [
        ("https://www.Example.COM/path?q=1", "example.com"),
        ("http://sub.host.org:8080/x", "sub.host.org"),
        ("ftp://user:pw@files.net/dir", "files.net"),
        ("bare-host.io/path", "bare-host.io"),
        ("www.only-host.de", "only-host.de"),
        ("", ""),
        ("not a url at all", "not"),  # first token wins; never null
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [
        r["d"] for r in df.select(extract_domain(F.col("url")).alias("d")).collect()
    ]
    assert got == [want for _, want in cases]


def test_blocklist_filter_drops_and_broadcasts(spark):
    docs = spark.createDataFrame(
        [(i, f"dom{i % 4}.com") for i in range(40)], ["doc_id", "domain"]
    )
    block = spark.createDataFrame(
        [("dom1.com",), ("dom3.com",), ("dom3.com",)], ["domain"]
    )
    out = domain_blocklist_filter(docs, block)
    doms = {r["domain"] for r in out.collect()}
    assert doms == {"dom0.com", "dom2.com"} and out.count() == 20
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def _cap_df(spark):
    # dom_hot: 300 docs x 10 tokens; dom_mid: 60 x 50; dom_small: 10 x 5
    rows = (
        [(i, "hot.com", 10) for i in range(300)]
        + [(1000 + i, "mid.com", 50) for i in range(60)]
        + [(2000 + i, "small.com", 5) for i in range(10)]
    )
    return spark.createDataFrame(rows, ["doc_id", "domain", "n_tokens"])


_CAP_MIRROR_SQL = """
WITH sizes AS (
  SELECT domain, COUNT(*) AS n, SUM(n_tokens) AS tok FROM docs GROUP BY domain
), rates AS (
  SELECT domain,
    LEAST(
      LEAST(10000, CAST(ceil(10000.0 * {max_docs} / n) AS INT)),
      LEAST(10000, CAST(ceil(10000.0 * {max_tokens} / GREATEST(tok, 1)) AS INT))
    ) AS rate_bp
  FROM sizes
)
SELECT d.doc_id FROM docs d JOIN rates r USING (domain)
WHERE CAST(('0x' || substr(sha256('domain-cap:' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 10000
      < r.rate_bp
"""


def test_per_domain_cap_matches_duckdb_mirror(spark):
    docs = _cap_df(spark)
    out = per_domain_cap(docs, max_docs=50, max_tokens=1000, token_col="n_tokens")
    got = sorted(r["doc_id"] for r in out.collect())

    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    want = sorted(
        r[0]
        for r in con.execute(
            _CAP_MIRROR_SQL.format(max_docs=50, max_tokens=1000)
        ).fetchall()
    )
    assert got == want and len(got) > 0
    # small domain under both caps: kept whole
    assert all(2000 + i in got for i in range(10))
    # hot domain: docs cap binds (50 of 300); mid: token cap binds
    # (1000 of 3000 tokens -> ~20 of 60 docs) — within hash noise
    by_dom = {
        r["domain"]: r["n"]
        for r in out.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    assert 30 <= by_dom["hot.com"] <= 75
    assert 10 <= by_dom["mid.com"] <= 32


def test_per_domain_cap_docs_only_and_partition_invariant(spark):
    docs = _cap_df(spark)
    a = sorted(
        r["doc_id"] for r in per_domain_cap(docs, max_docs=40).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in per_domain_cap(docs.repartition(7), max_docs=40).collect()
    )
    assert a == b


def test_per_domain_cap_keeps_null_domains(spark):
    """Rows with a NULL domain are counted by the sizes aggregate, so
    they must also survive the join back (round-6 review: a plain
    equi-join silently dropped them). They form their own capped
    group, consistent with domain_blocklist_filter keeping nulls."""
    rows = [(i, "hot.com") for i in range(100)] + [
        (1000 + i, None) for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, domain string")
    out = per_domain_cap(docs, max_docs=30)
    by_dom = {
        r["domain"]: r["n"]
        for r in out.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    # both groups present and capped near 30 (hash noise)
    assert set(by_dom) == {"hot.com", None}
    assert 15 <= by_dom["hot.com"] <= 50 and 15 <= by_dom[None] <= 50
    # a domain under the cap is kept whole even when nulls are present
    out2 = per_domain_cap(docs, max_docs=500)
    assert out2.count() == 200
    # the rates join still broadcasts
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_per_domain_cap_rejects_bad_args(spark):
    docs = _cap_df(spark)
    with pytest.raises(ValueError, match="max_docs and/or max_tokens"):
        per_domain_cap(docs)
    with pytest.raises(ValueError, match="token_col"):
        per_domain_cap(docs, max_tokens=100)
    with pytest.raises(ValueError, match="max_docs"):
        per_domain_cap(docs, max_docs=0)


def test_per_domain_cap_rate_join_broadcasts(spark):
    """The per-domain rate table (|domains| rows) must broadcast back —
    a shuffle join here would re-shuffle the corpus for a filter."""
    docs = _cap_df(spark)
    out = per_domain_cap(docs, max_docs=50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:600]
    assert "SortMergeJoin" not in plan
