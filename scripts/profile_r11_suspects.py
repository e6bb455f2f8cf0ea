"""Round-11 verdict item #1: explain the r10 driver readings of
table_profile (0.74 -> 4.04 s) and pca_whiten_curation (0.97 -> 5.01 s)
on unchanged code.

Method (the r5/r7 stage-profile approach): one bench-identical session,
time each suspect min-of-5 in three session states —
  A. fresh session, right after bench's standard warmups (the r9-like
     state: nothing heavy has run yet);
  B. after building the r10 session-memoized IVF indexes (the new r10
     session state the suspects inherit);
  C. after additionally running one pass of every HEADLINE query that
     precedes the suspects in bench order (the exact accumulated state
     the driver measured them in).
If A ≈ r9 and C ≈ r10, the regression is accumulated-session-state; the
B column says whether the IVF memo specifically is the culprit.

Run on an IDLE box; the script records loadavg around every block.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SUSPECTS = ["table_profile", "pca_whiten_curation"]


def main() -> None:
    from dbd_datawarehouse_scraper_spark import get_spark
    from dbd_datawarehouse_scraper_spark.caching import release_caches
    from dbd_datawarehouse_scraper_spark.queries import QUERIES

    spark = get_spark(app_name="profile_r11")
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

    def timed_run(name: str) -> float:
        builder = QUERIES[name].builder
        start = time.perf_counter()
        builder(spark, SF_DIR).count()
        elapsed = time.perf_counter() - start
        release_caches()
        spark.sparkContext._jvm.System.gc()
        warm_python_workers()
        return elapsed

    def measure(name: str, runs: int = 5) -> dict:
        timed_run(name)  # untimed warmup (codegen JIT)
        xs = [round(timed_run(name), 4) for _ in range(runs)]
        return {"min": min(xs), "runs": xs, "load": os.getloadavg()[0]}

    out: dict = {"sf_dir": SF_DIR, "load_start": os.getloadavg()[0]}

    # A: fresh-session baseline
    out["A_fresh"] = {n: measure(n) for n in SUSPECTS}

    # B: after the r10 session-memoized IVF index builds (both codecs)
    from dbd_datawarehouse_scraper_spark.queries import _ivf_index

    _ivf_index(spark, SF_DIR, "none")
    _ivf_index(spark, SF_DIR, "sq8")
    release_caches()
    spark.sparkContext._jvm.System.gc()
    warm_python_workers()
    out["B_after_ivf_memo"] = {n: measure(n) for n in SUSPECTS}

    # C: after one pass of every HEADLINE query preceding the suspects
    # (bench order), reproducing the driver's accumulated session state
    import bench

    prefix = bench.HEADLINE[: bench.HEADLINE.index("pca_whiten_curation")]
    for name in prefix:
        if name in QUERIES:
            timed_run(name)
    out["C_after_bench_prefix"] = {n: measure(n) for n in SUSPECTS}
    out["load_end"] = os.getloadavg()[0]

    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
