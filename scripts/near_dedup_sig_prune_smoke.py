"""Near-dup signature-store v2 scale smoke — round 12.

The round-11 verdict's striking-cost caveat covered two stores; the
link store got its bucketed layout first (45-epoch growth smoke), this
measures the OTHER one: the MinHash sigs store, whose history verify
used to scan EVERY stored signature (~1 KB/doc) per epoch. Store v2
hash-bucket-partitions ``sigs/epoch=N`` on the doc id and prunes the
verify read to the buckets the epoch's candidates fall in.

Phases:
1. build  — EPOCHS epochs × BATCH docs through ``near_dedup_epoch``
            (the default pruned+broadcast path), DUPS docs per epoch
            duplicating epoch-0 texts (struck by the history verify).
            Records the per-epoch wall-time curve.
2. probe  — one additional batch measured REPS× against the SAME
            built store with ``prune_sig_buckets`` on vs off
            (alternating, deleting the probe epoch's dirs between
            trials): the pruned read must return the identical
            survivor count while touching only the candidate buckets.

Pruning physics at this scale: candidates are the DUPS re-crawled
docs; with DUPS ≪ N_BUCKETS the pruned read skips most of the store's
sig bytes. (A batch with corpus-wide candidates hits every bucket and
prunes nothing — the guard is the candidate count, which is exactly
the quantity the verify join's cost should track.)

Run:  SPARK_GRAFT_DRIVER_MEM=16g python scripts/near_dedup_sig_prune_smoke.py
Emits ONE JSON line: per-epoch build seconds, probe A/B seconds,
survivor counts, verdicts.
"""

import json
import os
import shutil
import sys
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbd_datawarehouse_scraper_spark.session import get_spark  # noqa: E402
from dbd_datawarehouse_scraper_spark.streaming.near_dedup import (  # noqa: E402
    near_dedup_epoch,
)

WORK = os.environ.get("SMOKE_WORK_DIR", "/tmp/near_dedup_sig_prune_smoke")
EPOCHS = int(os.environ.get("SMOKE_EPOCHS", "24"))
BATCH = int(os.environ.get("SMOKE_BATCH", "50000"))
DUPS = int(os.environ.get("SMOKE_DUPS", "40"))
N_BUCKETS = int(os.environ.get("SMOKE_BUCKETS", "64"))
REPS = int(os.environ.get("SMOKE_REPS", "3"))
#: probe phase sizing — DEFAULTS model the incremental steady state
#: (a small late batch against a big store), where the sig scan is the
#: dominant term the pruning exists to cut; the build batches are big
#: so the store grows fast enough to matter.
PROBE_BATCH = int(os.environ.get("SMOKE_PROBE_BATCH", "2000"))
PROBE_DUPS = int(os.environ.get("SMOKE_PROBE_DUPS", "8"))
SKIP_BUILD = os.environ.get("SMOKE_SKIP_BUILD", "") == "1"
TOKENS = 30  # ≥25 doc-unique tokens keep non-dup docs below J=0.8


def _epoch_docs(spark, epoch: int, batch: int = BATCH, dups: int = DUPS):
    """``batch`` docs; ids globally unique; the first ``dups`` docs of
    epochs >= 1 carry epoch-0's text verbatim (history must strike
    them)."""
    d = spark.range(batch).select(
        (F.lit(epoch) * BATCH + F.col("id")).alias("doc_id"),
        F.col("id").alias("i"),
    )
    dup = (F.lit(epoch) > 0) & (F.col("i") < F.lit(dups))
    eff = F.when(dup, F.lit(0)).otherwise(F.lit(epoch)).cast("string")
    text = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit(f"w{j}e"), eff, F.lit("d"), F.col("i").cast("string")
            )
            for j in range(TOKENS)
        ],
    )
    return d.select("doc_id", text.alias("text"))


def main() -> None:
    if not SKIP_BUILD:
        shutil.rmtree(WORK, ignore_errors=True)
        os.makedirs(WORK)
    spark = get_spark(app_name="near-dedup-sig-prune-smoke")
    out, store = f"{WORK}/out", f"{WORK}/store"
    result = {"epochs": EPOCHS, "batch": BATCH, "dups": DUPS,
              "n_buckets": N_BUCKETS, "probe_batch": PROBE_BATCH,
              "probe_dups": PROBE_DUPS}

    # ---- phase 1: build ------------------------------------------------
    if not SKIP_BUILD:
        build_s, survivors = [], []
        for e in range(EPOCHS):
            docs = _epoch_docs(spark, e)
            t0 = time.time()
            near_dedup_epoch(
                spark, docs, e, out, store, n_buckets=N_BUCKETS,
                fold_store_after=16,
            )
            build_s.append(round(time.time() - t0, 2))
            survivors.append(
                spark.read.parquet(f"{out}/epoch={e}").count()
            )
            print(f"epoch {e}: {build_s[-1]}s, survivors={survivors[-1]}",
                  flush=True)
        result["build_epoch_s"] = build_s
        result["survivors"] = survivors
        # every later epoch must strike exactly its DUPS re-crawls
        result["strike_exact"] = all(
            s == BATCH - DUPS for s in survivors[1:]
        ) and survivors[0] == BATCH

    # ---- phase 2: probe A/B -------------------------------------------
    # a SMALL late batch against the big store: signing cost ~0, the
    # epoch is the band scan (same both ways) + the sig verify read —
    # the term the bucketing prunes
    probe_epoch = EPOCHS
    docs = _epoch_docs(spark, probe_epoch, PROBE_BATCH, PROBE_DUPS)
    ab = {"pruned": [], "full": []}
    counts = {"pruned": set(), "full": set()}
    for _ in range(REPS):
        for label, prune in (("pruned", True), ("full", False)):
            for sub in ("sigs", "bands"):
                shutil.rmtree(
                    f"{store}/{sub}/epoch={probe_epoch}", ignore_errors=True
                )
            shutil.rmtree(f"{out}/epoch={probe_epoch}", ignore_errors=True)
            t0 = time.time()
            near_dedup_epoch(
                spark, docs, probe_epoch, out, store,
                n_buckets=N_BUCKETS, fold_store_after=None,
                prune_sig_buckets=prune,
            )
            ab[label].append(round(time.time() - t0, 2))
            counts[label].add(
                spark.read.parquet(f"{out}/epoch={probe_epoch}").count()
            )
    result["probe_s"] = ab
    result["probe_survivors"] = {
        k: sorted(v) for k, v in counts.items()
    }
    result["probe_identical"] = (
        counts["pruned"]
        == counts["full"]
        == {PROBE_BATCH - PROBE_DUPS}
    )
    result["probe_min_s"] = {k: min(v) for k, v in ab.items()}
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
