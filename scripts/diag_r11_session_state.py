"""Round-11 follow-up: WHAT accumulates in a bench session that makes
table_profile / pca_whiten_curation ~2.5x slower after ~45 preceding
queries (scripts/profile_r11_suspects.py isolated the effect to the
bench-prefix state, NOT the IVF memo)?

Reports, at each checkpoint: JVM heap-after-GC, metaspace, compressed
class space, all CodeHeap pools, loaded class count, JIT compilation
time, block-manager + spark-local file counts, and the suspect's
timing. Then tries remedies in order (extra GC+sleep for the
ContextCleaner to drain; Python worker pool reset) and re-times.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from dbd_datawarehouse_scraper_spark import get_spark
    from dbd_datawarehouse_scraper_spark.caching import release_caches
    from dbd_datawarehouse_scraper_spark.queries import QUERIES

    spark = get_spark(app_name="diag_r11")
    jvm = spark.sparkContext._jvm

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

    def jvm_stats() -> dict:
        mf = jvm.java.lang.management.ManagementFactory
        out = {}
        heap = mf.getMemoryMXBean().getHeapMemoryUsage()
        out["heap_used_mb"] = round(heap.getUsed() / 2**20)
        for pool in mf.getMemoryPoolMXBeans():
            n = pool.getName()
            if any(k in n for k in ("CodeHeap", "Metaspace", "Class")):
                out[n + "_mb"] = round(pool.getUsage().getUsed() / 2**20, 1)
        cl = mf.getClassLoadingMXBean()
        out["classes_loaded"] = cl.getLoadedClassCount()
        comp = mf.getCompilationMXBean()
        out["jit_ms_total"] = comp.getTotalCompilationTime()
        out["blockmgr_files"] = sum(
            len(files)
            for d in glob.glob("/tmp/blockmgr-*")
            for _, _, files in os.walk(d)
        )
        out["spark_local_files"] = sum(
            len(files)
            for d in glob.glob("/tmp/spark-*")
            for _, _, files in os.walk(d)
        )
        out["threads"] = mf.getThreadMXBean().getThreadCount()
        out["load"] = round(os.getloadavg()[0], 2)
        return out

    def timed_run(name: str) -> float:
        builder = QUERIES[name].builder
        start = time.perf_counter()
        builder(spark, SF_DIR).count()
        elapsed = time.perf_counter() - start
        release_caches()
        jvm.System.gc()
        warm_python_workers()
        return elapsed

    def measure(name: str, runs: int = 3) -> list[float]:
        timed_run(name)
        return [round(timed_run(name), 4) for _ in range(runs)]

    out: dict = {"sf_dir": SF_DIR}
    out["stats_A"] = jvm_stats()
    out["table_profile_A"] = measure("table_profile")
    out["pca_A"] = measure("pca_whiten_curation")

    import bench

    prefix = bench.HEADLINE[: bench.HEADLINE.index("pca_whiten_curation")]
    for name in prefix:
        if name in QUERIES:
            timed_run(name)
    out["stats_C"] = jvm_stats()
    out["table_profile_C"] = measure("table_profile")
    out["pca_C"] = measure("pca_whiten_curation")
    out["stats_C2"] = jvm_stats()

    # remedy 1: double GC + 30 s quiesce (ContextCleaner / finalizers)
    jvm.System.gc()
    time.sleep(30)
    jvm.System.gc()
    warm_python_workers()
    out["stats_R1"] = jvm_stats()
    out["table_profile_R1"] = measure("table_profile")
    out["pca_R1"] = measure("pca_whiten_curation")

    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
