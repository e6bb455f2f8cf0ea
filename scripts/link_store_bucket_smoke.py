"""Round-12 scale smoke: per-epoch striking cost of the hash-bucketed
link-graph store (streaming/link_graph.py v2 layout) vs the round-11
layout's full-store sort-merge anti-join, over 30+ epochs.

The r11 verdict's scale caveat (Missing #2): per-epoch edge striking
left-anti-joined the batch against the FULL committed store — folding
bounded the file count, not the bytes shuffled, so each new epoch paid
a shuffle+sort of the whole history. The v2 layout buckets every epoch
dir on pmod(xxhash64(src,dst), B) and strikes micro-batches with a
broadcast semi-then-anti: the store side is a pruned columnar SCAN
probing the broadcast batch — never shuffled, never sorted. The scan
still grows with the store (exact striking needs to look at history),
but scan bytes/sec ≫ shuffle-sort bytes/sec and the constant is what
survives at Common Crawl scale.

Workload: 30 epochs × 200k edges; half of each batch is a shared
re-crawl pool (struck after epoch 0 — the common Common Crawl case of
stable site chrome), half is fresh per epoch, so the store grows
~100k edges/epoch to ~3.1M. Both stores must hold BIT-IDENTICAL edge
relations at the end (the layouts are plan choices, not semantics).

Run:  python scripts/link_store_bucket_smoke.py [n_epochs]
Emits one JSON line; paste the per-epoch table into BENCH_NOTES.md.
"""
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dbd_datawarehouse_scraper_spark import get_spark  # noqa: E402
from dbd_datawarehouse_scraper_spark.streaming.link_graph import (  # noqa: E402
    link_graph_epoch,
    stored_edges,
)

N_PER_EPOCH = 200_000
SHARED_FRAC = 0.5


def epoch_edges(spark, k: int):
    n_shared = int(N_PER_EPOCH * SHARED_FRAC)
    n_fresh = N_PER_EPOCH - n_shared
    shared = spark.range(n_shared).select(
        F.concat(F.lit("hub"), (F.col("id") * 7 % 40_000).cast("string"), F.lit(".test")).alias("src"),
        F.concat(F.lit("dst"), (F.col("id") * 13 % 40_000).cast("string"), F.lit(".test")).alias("dst"),
    )
    fresh = spark.range(n_fresh).select(
        F.concat(F.lit(f"e{k}s"), F.col("id").cast("string"), F.lit(".test")).alias("src"),
        F.concat(F.lit(f"e{k}d"), (F.col("id") % 9_973).cast("string"), F.lit(".test")).alias("dst"),
    )
    return shared.unionByName(fresh)


def r11_layout_epoch(spark, batch, epoch_id: int, store_root: str) -> None:
    """Replica of the ROUND-11 strike plan for comparison: plain
    (unbucketed) epoch dirs, batch LEFT ANTI full-store join — the
    sort-merge shuffle this round's layout removes."""
    edges = batch.filter(
        F.col("src").isNotNull()
        & F.col("dst").isNotNull()
        & (F.col("src") != F.col("dst"))
    ).distinct()
    if epoch_id > 0:
        history = spark.read.parquet(
            *[f"{store_root}/epoch={e}" for e in range(epoch_id)]
        )
        edges = edges.join(history, ["src", "dst"], "left_anti")
    edges.write.mode("overwrite").parquet(f"{store_root}/epoch={epoch_id}")


def main():
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    spark = get_spark(app_name="lg-bucket-smoke", master="local[32]")
    work = tempfile.mkdtemp(prefix="lg_bucket_smoke_")
    out = {"n_epochs": n_epochs, "n_per_epoch": N_PER_EPOCH}
    v2_t, r11_t = [], []
    try:
        for k in range(n_epochs):
            batch = epoch_edges(spark, k)
            t0 = time.time()
            # folding disabled in BOTH arms so the curves isolate the
            # strike cost (production keeps the default tiered fold)
            link_graph_epoch(
                spark, batch, k, f"{work}/v2", fold_store_after=None
            )
            v2_t.append(round(time.time() - t0, 2))
            t0 = time.time()
            r11_layout_epoch(spark, batch, k, f"{work}/r11")
            r11_t.append(round(time.time() - t0, 2))
            print(
                f"epoch {k:>2}: v2 {v2_t[-1]:>6.2f}s   r11 {r11_t[-1]:>6.2f}s",
                flush=True,
            )
        v2_edges = stored_edges(spark, f"{work}/v2")
        r11_edges = spark.read.parquet(f"{work}/r11/epoch=*")
        n_v2, n_r11 = v2_edges.count(), r11_edges.count()
        n_sym_diff = (
            v2_edges.join(r11_edges, ["src", "dst"], "left_anti").count()
            + r11_edges.join(v2_edges, ["src", "dst"], "left_anti").count()
        )
        out.update(
            {
                "v2_per_epoch_s": v2_t,
                "r11_per_epoch_s": r11_t,
                "v2_first5_s": round(sum(v2_t[:5]), 1),
                "v2_last5_s": round(sum(v2_t[-5:]), 1),
                "r11_first5_s": round(sum(r11_t[:5]), 1),
                "r11_last5_s": round(sum(r11_t[-5:]), 1),
                "n_store_edges_v2": n_v2,
                "n_store_edges_r11": n_r11,
                "edge_relations_identical": bool(n_sym_diff == 0 and n_v2 == n_r11),
            }
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
