"""WAT metadata scale smoke + composed crawl→rank→curation probe —
round 11 (verdict items #3 and #4 in one job, sharing the corpus).

WET was proven at 5M docs (r9) and raw WARC at 1M records (r10); this
smoke proves the third Common Crawl leg — ``wat_metadata_source``,
whose cost profile is different (per-record JSON envelope parse with a
deep nested from_json schema, links arrays fanning out 10-50× into the
edge relation) — at ~1M metadata records, then drives the engine's
E1-equivalent composed DAG the reference runs as one job
(scraper_v2.py:1733-1805): WAT links → edge extraction → dedup to
(src, dst) → integer PageRank → domain-rank gate → per-domain cap.

Planted hazards (each must land in its quarantine channel, never
crash the scan):
- one record with a NON-JSON payload            → 'bad WAT json'
- one record with a NON-TEXTUAL Content-Type    → 'non-textual
  metadata payload' (the round-11 quarantine leg)
- one TRUNCATED archive copy                    → archive-level error
- one OVERSIZED envelope (~8 MiB, 100k links)   → parses (bounded by
  Content-Length, not a line cap) and its links all count

Phases, each timed:
1. gen    — 1M synthetic pages: sf0.1 documents × 200 reps, 20k
            domains (~50 pages/domain), deterministic 10-50 link
            fan-out to other domains
2. write  — wat_sink → member-per-record-gzip .warc.gz shards
3. plant  — the hazard records above
4. read   — wat_metadata_source full scan: records/s, links/s,
            per-channel counts
4b. mat   — materialize the parsed good-page relation to parquet
            (a real crawl job lands this table once; downstream
            phases must not re-run the WAT parse per action)
5. edges  — explode links, host→host, distinct (src, dst)
6. rank   — integer PageRank over the domain graph (10 rounds)
7. gate   — broadcast rank join back onto the page relation, keep
            pages on above-median-rank domains, then per_domain_cap
8. stream — the same corpus as 10 streamed epochs through the
            incremental link-graph store (cross-epoch edge striking),
            then refresh_ranks: stored edges must equal the batch
            edge count and the refreshed ranks must be BIT-EQUAL to
            phase 6's batch PageRank (lambda consistency at scale)

Run:  SPARK_GRAFT_DRIVER_MEM=48g python scripts/wat_crawl_rank_smoke.py
Emits ONE JSON line with per-phase seconds and counts.
"""

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbd_datawarehouse_scraper_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SMOKE_WORK_DIR", "/tmp/wat_crawl_rank_smoke")
REPLICAS = int(os.environ.get("SMOKE_REPLICAS", "200"))  # 5k docs × 200 = 1M
N_FILES = int(os.environ.get("SMOKE_N_FILES", "64"))
N_DOMAINS = int(os.environ.get("SMOKE_N_DOMAINS", "20000"))


def _wat_record(url: bytes, ct: bytes, body: bytes) -> bytes:
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: metadata\r\n"
        b"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-00000000feed>\r\n"
        b"WARC-Date: 2000-01-01T00:00:00Z\r\n"
        b"WARC-Target-URI: " + url + b"\r\n"
        b"Content-Type: " + ct + b"\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
        + body + b"\r\n\r\n"
    )


def main() -> None:
    import shutil

    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    spark = get_spark(app_name="wat-crawl-rank-smoke", master="local[32]")
    from dbd_datawarehouse_scraper_spark.caching import release_caches
    from dbd_datawarehouse_scraper_spark.operators.domains import per_domain_cap
    from dbd_datawarehouse_scraper_spark.operators.graph import pagerank
    from dbd_datawarehouse_scraper_spark.sources.warc import (
        wat_metadata_source,
        wat_sink,
    )

    out = {"replicas": REPLICAS, "n_domains": N_DOMAINS}

    # 1. gen: 1M pages across 20k domains, 10-50 outgoing links each.
    # Deterministic arithmetic link targets (no RNG): page (b, r) lives
    # on domain (b·REPLICAS + r) mod N_DOMAINS and links to domains
    # (dom·31 + j·7 + 1) mod N_DOMAINS for j < 10 + (b + r) mod 41 —
    # every domain gets in-links, fan-out varies 10-50.
    t0 = time.time()
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").alias("base_id")
    )
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    dom = (F.col("base_id") * REPLICAS + F.col("rep")) % N_DOMAINS
    n_links = (F.lit(10) + (F.col("base_id") + F.col("rep")) % 41).cast("int")
    pages = base.crossJoin(reps).select(
        F.concat(
            F.lit("https://d"), dom.cast("string"),
            F.lit(".crawl.test/p/"), F.col("base_id").cast("string"),
            F.lit("/"), F.col("rep").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("page "), F.col("base_id").cast("string"),
            F.lit(" "), F.col("rep").cast("string"),
        ).alias("title"),
        F.transform(
            F.sequence(F.lit(0), n_links - 1),
            lambda j: F.concat(
                F.lit("https://d"),
                ((dom * 31 + j * 7 + 1) % N_DOMAINS).cast("string"),
                F.lit(".crawl.test/p/x"),
            ),
        ).alias("links"),
    )
    pages.write.mode("overwrite").parquet(f"{WORK}/pages")
    out["gen_s"] = round(time.time() - t0, 1)

    # 2. write: WAT metadata shards
    t0 = time.time()
    corpus = spark.read.parquet(f"{WORK}/pages").repartition(N_FILES)
    manifest = wat_sink(
        corpus,
        f"{WORK}/wat",
        warcinfo={"software": "spark-graft", "isPartOf": "wat-smoke"},
    )
    out["write_s"] = round(time.time() - t0, 1)
    n_written = sum(m["n_records"] for m in manifest)
    out["n_written"] = n_written
    out["wat_gb_on_disk"] = round(
        sum(m["n_bytes"] for m in manifest) / 2**30, 2
    )
    out["write_recs_per_s"] = int(n_written / max(out["write_s"], 0.001))

    # 3. plant hazards
    victim = manifest[0]["file"]
    blob = open(victim, "rb").read()
    with open(f"{WORK}/wat/zz-truncated.warc.gz", "wb") as f:
        f.write(blob[: len(blob) // 2])
    big_links = (
        '{"Envelope":{"Payload-Metadata":{"HTTP-Response-Metadata":'
        '{"HTML-Metadata":{"Head":{"Title":"big"},"Links":['
        + ",".join(
            f'{{"url":"https://d{i % N_DOMAINS}.crawl.test/p/x"}}'
            for i in range(100_000)
        )
        + "]}}}}}"
    ).encode()
    hazards = (
        _wat_record(b"https://hazard.test/badjson", b"application/json",
                    b"this is { not json")
        + _wat_record(b"https://hazard.test/binary",
                      b"application/octet-stream", b"\x00\x01\x02")
        + _wat_record(b"https://hazard.test/oversized", b"application/json",
                      big_links)
    )
    with open(f"{WORK}/wat/zz-hazards.warc", "wb") as f:
        f.write(hazards)
    out["planted"] = ["truncated", "badjson", "non-textual", "oversized-8MiB"]
    out["oversized_bytes"] = len(big_links)

    # 4. read: full WAT scan — records/s and links/s through the
    # envelope parse, split by channel
    t0 = time.time()
    meta = wat_metadata_source(spark, f"{WORK}/wat/*.warc*")
    chan_rows = (
        meta.groupBy(
            F.when(F.col("error").isNull(), F.lit("good"))
            .when(F.col("error").startswith("archive"), F.lit("archive"))
            .when(F.col("error") == "bad WAT json", F.lit("badjson"))
            .when(
                F.col("error") == "non-textual metadata payload",
                F.lit("nontextual"),
            )
            .otherwise(F.lit("other"))
            .alias("channel")
        )
        .agg(F.count("*").alias("n"), F.sum(F.size("links")).alias("links"))
        .collect()
    )
    out["read_s"] = round(time.time() - t0, 1)
    out["channels"] = {r["channel"]: r["n"] for r in chan_rows}
    n_links_total = sum(r["links"] or 0 for r in chan_rows)
    out["links_total"] = int(n_links_total)
    out["read_recs_per_s"] = int(
        sum(out["channels"].values()) / max(out["read_s"], 0.001)
    )
    out["read_links_per_s"] = int(n_links_total / max(out["read_s"], 0.001))
    big = meta.filter(F.col("url") == "https://hazard.test/oversized")
    out["oversized_links_parsed"] = big.select(
        F.size("links")
    ).collect()[0][0]

    # 4b. materialize the good page relation ONCE (a real crawl job
    # lands the parsed page table before graph work) — without this
    # every downstream action re-runs the full WAT parse
    t0 = time.time()
    host = lambda c: F.regexp_extract(c, r"^https://([^/]+)/", 1)  # noqa: E731
    meta.filter(
        F.col("error").isNull() & F.col("url").startswith("https://d")
    ).select(
        "url", host(F.col("url")).alias("domain"), "title", "links"
    ).write.mode("overwrite").parquet(f"{WORK}/pages_parsed")
    good = spark.read.parquet(f"{WORK}/pages_parsed")
    out["materialize_s"] = round(time.time() - t0, 1)

    # 5. edges: host → host, distinct
    t0 = time.time()
    edges = (
        good.select(
            F.col("domain").alias("src"),
            F.explode("links").alias("link"),
        )
        .select("src", host(F.col("link")).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    edges.write.mode("overwrite").parquet(f"{WORK}/edges")
    edges = spark.read.parquet(f"{WORK}/edges")
    out["n_edges"] = edges.count()
    out["edges_s"] = round(time.time() - t0, 1)

    # 6. rank: integer PageRank over the domain graph
    t0 = time.time()
    ranks = pagerank(edges, max_iter=10)
    ranks.write.mode("overwrite").parquet(f"{WORK}/ranks")
    release_caches()
    ranks = spark.read.parquet(f"{WORK}/ranks")
    out["n_ranked_domains"] = ranks.count()
    out["rank_s"] = round(time.time() - t0, 1)
    mass = ranks.agg(F.sum("rank_q")).collect()[0][0]
    out["rank_mass_ok"] = bool(abs(mass - 10**12) <= (out["n_ranked_domains"] + 1) * 10)

    # 7. gate: broadcast rank join onto the page relation; keep pages
    # on above-median-rank domains; cap survivors per domain
    t0 = time.time()
    median_q = ranks.approxQuantile("rank_q", [0.5], 0.001)[0]
    keep_domains = ranks.filter(F.col("rank_q") >= median_q).select(
        F.col("id").alias("domain")
    )
    survivors = good.select("url", "domain", "title").join(
        F.broadcast(keep_domains), "domain"
    )
    capped = per_domain_cap(
        survivors.withColumn("n_chars", F.length("title")),
        domain_col="domain",
        id_col="url",
        max_docs=20,
        max_tokens=10**9,
        token_col="n_chars",
        registrable=False,
    )
    out["n_pages_on_kept_domains"] = survivors.count()
    out["n_after_domain_cap"] = capped.count()
    out["gate_s"] = round(time.time() - t0, 1)

    # 8. incremental store: the SAME corpus ingested as 10 streamed
    # epochs through the link-graph epoch store (streaming/link_graph),
    # then a rank refresh that must be BIT-EQUAL to phase 6's batch
    # rank — the lambda-architecture consistency check at full scale
    t0 = time.time()
    from dbd_datawarehouse_scraper_spark.streaming import file_stream
    from dbd_datawarehouse_scraper_spark.streaming.link_graph import (
        refresh_ranks,
        stored_edges,
        stream_link_graph,
    )

    good.select("url", "links").repartition(10).write.mode(
        "overwrite"
    ).parquet(f"{WORK}/pages_stream")
    stream = file_stream(
        spark,
        f"{WORK}/pages_stream",
        spark.read.parquet(f"{WORK}/pages_stream").schema,
        max_files_per_trigger=1,
    )
    q = stream_link_graph(
        stream, f"{WORK}/lgstore", f"{WORK}/lgckpt"
    )
    assert q.awaitTermination(600)
    out["stream_ingest_s"] = round(time.time() - t0, 1)
    n_stored = stored_edges(spark, f"{WORK}/lgstore").count()
    out["stream_edges_match_batch"] = bool(n_stored == out["n_edges"])
    out["n_stream_edges"] = n_stored

    t0 = time.time()
    meta = refresh_ranks(spark, f"{WORK}/lgstore", max_iter=10)
    out["stream_rank_refresh_s"] = round(time.time() - t0, 1)
    batch_ranks = spark.read.parquet(f"{WORK}/ranks").select(
        "id", F.col("rank_q").alias("batch_q")
    )
    from dbd_datawarehouse_scraper_spark.streaming.link_graph import (
        current_ranks,
    )

    inc_ranks = current_ranks(spark, f"{WORK}/lgstore")[0].select(
        "id", F.col("rank_q").alias("inc_q")
    )
    mism = (
        batch_ranks.join(inc_ranks, "id", "full")
        .filter(
            F.col("batch_q").isNull()
            | F.col("inc_q").isNull()
            | (F.col("batch_q") != F.col("inc_q"))
        )
        .count()
    )
    out["stream_rank_bit_equal"] = bool(mism == 0)
    out["stream_rank_meta"] = meta

    out["total_s"] = round(
        out["gen_s"] + out["write_s"] + out["read_s"] + out["materialize_s"]
        + out["edges_s"] + out["rank_s"] + out["gate_s"]
        + out["stream_ingest_s"] + out["stream_rank_refresh_s"], 1
    )
    print(json.dumps(out, ensure_ascii=False))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
