"""Min-of-N timing for a named subset of headline queries, bench-
identical methodology (warmup run, count action, release_caches + GC +
worker re-warm between runs). Usage:

    python scripts/time_queries_r12.py q1 q2 ... [--runs N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    names = args

    from dbd_datawarehouse_scraper_spark import get_spark
    from dbd_datawarehouse_scraper_spark.caching import release_caches
    from dbd_datawarehouse_scraper_spark.queries import QUERIES

    spark = get_spark(app_name="time_queries_r12")
    for tbl in ["lineitem", "orders", "customer", "part"]:
        spark.read.parquet(f"{SF_DIR}/{tbl}.parquet").count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    ncores = spark.sparkContext.defaultParallelism

    def warm_python_workers() -> None:
        spark.range(0, ncores * 64, 1, ncores).select(_warm("id")).count()

    warm_python_workers()

    for name in names:
        builder = QUERIES[name].builder
        builder(spark, SF_DIR).count()  # untimed warmup
        release_caches()
        spark.sparkContext._jvm.System.gc()
        warm_python_workers()
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            builder(spark, SF_DIR).count()
            ts.append(time.perf_counter() - t0)
            release_caches()
            spark.sparkContext._jvm.System.gc()
            warm_python_workers()
        print(
            f"{name:32s} min {min(ts):6.3f}  runs "
            + " ".join(f"{v:.3f}" for v in ts),
            flush=True,
        )


if __name__ == "__main__":
    main()
