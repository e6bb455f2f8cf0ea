"""PageRank scale smoke — round 10.

The pagerank tests run on tens of nodes; this proves the checkpointed
iteration at millions of edges: a 2M-node / ~5M-edge synthetic web
(two successor links per node + a 1%-of-nodes hub layer) ranked in
bounded rounds, with the ≤2-snapshot checkpoint lifecycle holding and
rank mass conserved to the documented leak bound.

Run:  SPARK_GRAFT_DRIVER_MEM=48g python scripts/pagerank_smoke.py
Emits ONE JSON line: nodes, edges, rounds, seconds, edges/s·iter,
max live checkpoint dirs, total rank_q (mass check), top-5 ids.
"""

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbd_datawarehouse_scraper_spark.session import get_spark  # noqa: E402

N = int(os.environ.get("SMOKE_NODES", "2000000"))
MAX_ITER = int(os.environ.get("SMOKE_MAX_ITER", "10"))


def main() -> None:
    spark = get_spark(app_name="pagerank-smoke", master="local[32]")
    from dbd_datawarehouse_scraper_spark.caching import release_caches
    from dbd_datawarehouse_scraper_spark.operators.graph import (
        last_run_stats,
        pagerank,
    )

    ids = spark.range(N).select(F.col("id").alias("src"))
    edges = (
        ids.select("src", ((F.col("src") * 7 + 1) % N).alias("dst"))
        .unionByName(ids.select("src", ((F.col("src") + 1) % N).alias("dst")))
        .unionByName(
            ids.filter(F.col("src") % 100 == 0).select(
                "src", (F.col("src") % 17).alias("dst")
            )
        )
        .filter(F.col("src") != F.col("dst"))
    )
    n_edges = edges.count()
    t0 = time.time()
    ranks = pagerank(edges, max_iter=MAX_ITER)
    top = ranks.orderBy(F.col("rank_q").desc(), F.col("id").asc()).limit(5).collect()
    total_q = ranks.agg(F.sum("rank_q").alias("s")).collect()[0]["s"]
    wall = round(time.time() - t0, 1)
    out = {
        "nodes": N,
        "edges": n_edges,
        "rounds": last_run_stats["rounds"],
        "wall_s": wall,
        "edges_x_iters_per_s": int(n_edges * last_run_stats["rounds"] / wall),
        "max_live_checkpoint_dirs": last_run_stats["max_live_round_dirs"],
        "total_rank_q": int(total_q),
        "mass_leak_units": 10**12 - int(total_q),
        "leak_bound_ok": 10**12 - int(total_q) <= (N + 1) * MAX_ITER,
        "top5": [int(r.id) for r in top],
    }
    release_caches()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
