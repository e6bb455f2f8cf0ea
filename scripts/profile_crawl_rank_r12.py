"""Stage-profile crawl_rank_curation_hermetic (opt round r12).

Times each phase of the hermetic DAG separately — WAT sink write, WAT
parse, edge extraction, 3-round integer PageRank, gate + cap, and the
6-way summary — min-of-3 each, so the optimization targets the real
cost center instead of the composite reading.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from dbd_datawarehouse_scraper_spark import get_spark
    from dbd_datawarehouse_scraper_spark.caching import release_caches
    from dbd_datawarehouse_scraper_spark.operators.domains import (
        extract_domain,
        per_domain_cap,
    )
    from dbd_datawarehouse_scraper_spark.operators.graph import pagerank
    from dbd_datawarehouse_scraper_spark.queries import QUERIES, t
    from dbd_datawarehouse_scraper_spark.sources.warc import (
        wat_metadata_source,
        wat_sink,
    )
    from dbd_datawarehouse_scraper_spark.streaming.link_graph import (
        page_link_edges,
    )

    spark = get_spark(app_name="profile_crawl_rank")
    for tbl in ["lineitem", "orders", "customer", "part"]:
        spark.read.parquet(f"{SF_DIR}/{tbl}.parquet").count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    ncores = spark.sparkContext.defaultParallelism
    spark.range(0, ncores * 64, 1, ncores).select(_warm("id")).count()

    def pages_df():
        docs = t(spark, SF_DIR, "documents").filter(F.col("doc_id") < 600)
        return docs.select(
            F.concat(
                F.lit("https://corp"), (F.col("doc_id") % 17).cast("string"),
                F.lit(".test/doc/"), F.col("doc_id").cast("string"),
            ).alias("url"),
            F.concat(F.lit("Doc "), F.col("doc_id").cast("string")).alias("title"),
            F.transform(
                F.sequence(F.lit(1).cast("long"), (F.col("doc_id") % 3) + 1),
                lambda i: F.concat(
                    F.lit("https://corp"),
                    ((F.col("doc_id") * 7 + i) % 17).cast("string"),
                    F.lit(".test/doc/"), (F.col("doc_id") + i).cast("string"),
                ),
            ).alias("links"),
        )

    def run_once() -> dict[str, float]:
        ph: dict[str, float] = {}
        work = tempfile.mkdtemp(prefix="prof_crawl_")
        t0 = time.perf_counter()
        wat_sink(pages_df().repartition(2), f"{work}/wat")
        ph["1_wat_sink"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        parsed = wat_metadata_source(spark, f"{work}/wat/*.warc.gz")
        parsed.count()
        ph["2_parse_count"] = time.perf_counter() - t0

        good = parsed.filter(F.col("error").isNull())
        edges = page_link_edges(good).filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        t0 = time.perf_counter()
        edges.count()
        ph["3_edges_count"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        ranks = pagerank(
            edges, max_iter=3, tol_millionths=None, checkpoint_every=3
        )
        ranks.count()
        ph["4_pagerank"] = time.perf_counter() - t0

        thr = ranks.agg(F.expr("sum(rank_q) div count(*)").alias("_thr"))
        kept_domains = (
            ranks.crossJoin(F.broadcast(thr))
            .filter(F.col("rank_q") >= F.col("_thr"))
            .select(F.col("id").alias("_dom"))
        )
        with_dom = good.withColumn("domain", extract_domain(F.col("url")))
        gated = with_dom.join(
            F.broadcast(kept_domains),
            with_dom["domain"] == F.col("_dom"),
            "left_semi",
        )
        capped = per_domain_cap(
            gated, domain_col="domain", id_col="url", max_docs=20,
            registrable=False,
        )
        t0 = time.perf_counter()
        capped.count()
        ph["5_gate_cap"] = time.perf_counter() - t0

        top = ranks.orderBy(F.col("rank_q").desc(), F.col("id").asc()).limit(1)
        summary = (
            parsed.agg(
                F.count("*").alias("n_pages"),
                F.sum(
                    F.when(F.col("error").isNotNull(), 1).otherwise(0)
                ).alias("n_parse_errors"),
            )
            .crossJoin(edges.agg(F.count("*").alias("n_links")))
            .crossJoin(ranks.agg(F.count("*").alias("n_domains")))
            .crossJoin(gated.agg(F.count("*").alias("n_gated_docs")))
            .crossJoin(capped.agg(F.count("*").alias("n_capped_docs")))
            .crossJoin(
                top.select(
                    F.col("id").alias("top_domain"),
                    F.col("rank_q").alias("top_rank_q"),
                )
            )
        )
        t0 = time.perf_counter()
        summary.collect()
        ph["6_summary_collect"] = time.perf_counter() - t0

        release_caches()
        spark.sparkContext._jvm.System.gc()
        shutil.rmtree(work, ignore_errors=True)
        return ph

    run_once()  # warmup
    rows: list[dict[str, float]] = [run_once() for _ in range(3)]
    keys = sorted(rows[0])
    print(f"{'phase':22s}  " + "  ".join(f"run{i}" for i in range(3)) + "   min")
    for k in keys:
        vals = [r[k] for r in rows]
        print(
            f"{k:22s}  "
            + "  ".join(f"{v:4.2f}" for v in vals)
            + f"  {min(vals):5.2f}"
        )
    tot = [sum(r.values()) for r in rows]
    print(f"{'TOTAL':22s}  " + "  ".join(f"{v:4.2f}" for v in tot))


if __name__ == "__main__":
    main()
