"""Forced-distributed envelope for the graph rows (r12 verdict item 7).

At sf0.1 the declared pagerank/CC rows take the bounded driver-local
fast path (their graphs sit under graph.LOCAL_MAX_EDGES), so the
checkpointed distributed loop — the shape that actually runs at
100 TB — no longer has a measured number in the headline bench. This
script re-runs the SAME graph workloads with ``local_max_edges=0``
(fast path disabled) and min-of-N times them; the result is recorded
in BENCH_NOTES.md each optimization round so a regression in the
distributed loop stays visible.

Run:  python scripts/graph_distributed_envelope.py [--runs N]
Emits one JSON line: per-workload min/runs seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])

    from dbd_datawarehouse_scraper_spark import get_spark
    from dbd_datawarehouse_scraper_spark.caching import release_caches
    from dbd_datawarehouse_scraper_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from dbd_datawarehouse_scraper_spark.operators.graph import (
        connected_components,
        pagerank,
    )

    spark = get_spark(app_name="graph-distributed-envelope")
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def pagerank_edges():
        """The link_graph_pagerank row's edge synthesis, verbatim."""
        doc = d.select("doc_id")
        fwd1 = doc.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 7 + 1) % 500).alias("dst"),
        )
        fwd2 = doc.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") + 1) % 500).alias("dst"),
        )
        hub = doc.filter(F.col("doc_id") % 37 == 0).select(
            F.col("doc_id").alias("src"), F.lit(0).cast("long").alias("dst")
        )
        return fwd1.unionByName(fwd2).unionByName(hub).filter(
            F.col("src") != F.col("dst")
        )

    def run_pagerank():
        r = pagerank(
            pagerank_edges(),
            max_iter=15,
            tol_millionths=None,
            checkpoint_every=3,
            local_max_edges=0,
        )
        r.orderBy(F.col("rank_q").desc(), F.col("id").asc()).limit(20).collect()

    def run_cc():
        pairs = ngram_jaccard_pairs(d, k=3, threshold=0.4)
        connected_components(pairs, local_max_edges=0).count()

    out = {"sf_dir": SF_DIR, "runs": runs, "local_max_edges": 0}
    for name, fn in [("pagerank_distributed", run_pagerank), ("cc_distributed", run_cc)]:
        fn()  # untimed warmup
        release_caches()
        ts = []
        for _ in range(runs):
            t0 = time.time()
            fn()
            ts.append(round(time.time() - t0, 3))
            release_caches()
        out[name] = {"min": min(ts), "runs": ts}
        print(f"{name}: min {min(ts)} runs {ts}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
