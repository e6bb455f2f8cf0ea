"""Streaming continuous-ingest end-to-end smoke — round 10.

The WET stream source + the full store family have per-family tests;
this smoke runs the COMBINED multi-epoch shape at real sizes (the
round-9 verdict's remaining streaming ask): ~10 epochs × 500k docs
through the CLI `--stream-export --input-format wet` path with THREE
incremental stores on (MinHash near-dup + segment + substring), then
verifies replay idempotence and cross-epoch striking.

Corpus design:
- epoch e = one member-per-record-gzip WET archive of
  BASES×REPLICAS docs (unique `e{e}b{base}r{rep}` token prefix);
- epochs >= 1 carry DUP_FRAC exact duplicates of epoch-0 texts
  (same text verbatim, new URL) — the near-dup store must strike
  them in every later epoch;
- every doc ends with one shared boilerplate sentence — the segment
  store's frequent-chunk strike at corpus scale.

Phases:
1. gen      — the 10 archives (written into a staging dir)
2. ingest   — move all archives into the watched dir, run the CLI
             once: maxFilesPerTrigger=1 ⇒ one archive per epoch
3. replay   — run the CLI again with NO new files: output must be
             byte-stable (idempotence)
4. strike   — plant one archive that is 100% epoch-0 duplicates,
             run again: survivors of the new epoch must be ~0

Run:  SPARK_GRAFT_DRIVER_MEM=48g python scripts/stream_ingest_smoke.py
Emits ONE JSON line: per-phase seconds, per-epoch survivor counts,
store dir/file counts (fold behavior), replay/strike verdicts.
"""

import glob
import gzip
import json
import os
import shutil
import sys
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbd_datawarehouse_scraper_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SMOKE_WORK_DIR", "/tmp/stream_ingest_smoke")
EPOCHS = int(os.environ.get("SMOKE_EPOCHS", "10"))
REPLICAS = int(os.environ.get("SMOKE_REPLICAS", "100"))  # 5k bases × 100 = 500k
DUP_FRAC_DEN = 10  # 1/10 of each later epoch duplicates epoch 0

BOILER = (
    "this boilerplate footer sentence is identical across every "
    "document in the corpus and the segment store must learn it"
)


def _epoch_docs(spark, epoch: int):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").alias("b"), "text"
    )
    reps = spark.range(REPLICAS).select(F.col("id").alias("r"))
    d = base.crossJoin(reps)
    # epochs >= 1: reps r < REPLICAS/10 reuse epoch-0's text verbatim
    dup = (F.lit(epoch) > 0) & (F.col("r") < F.lit(REPLICAS // DUP_FRAC_DEN))
    eff_epoch = F.when(dup, F.lit(0)).otherwise(F.lit(epoch))
    # 25 doc-unique filler tokens keep same-base replicas BELOW the
    # 0.8 near-dup threshold (a 1-token prefix would near-dup every
    # replica of a base into one cluster and the smoke would measure
    # megacluster verification, not continuous ingest); the exact
    # cross-epoch duplicates (eff_epoch folds to 0) stay exact
    uniq = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit(f"w{i}e"), eff_epoch.cast("string"),
                F.lit("b"), F.col("b").cast("string"),
                F.lit("r"), F.col("r").cast("string"),
            )
            for i in range(25)
        ],
    )
    return d.select(
        F.concat(
            F.lit("https://smoke.test/e"), F.lit(epoch), F.lit("/"),
            F.col("b"), F.lit("/"), F.col("r"),
        ).alias("url"),
        F.concat_ws(" ", uniq, F.col("text"), F.lit(BOILER)).alias("text"),
    )


def _read_epoch_counts(out: str) -> dict[str, int]:
    counts: dict[str, int] = {}
    for f in glob.glob(f"{out}/split=*/epoch=*/shard=*/*.gz"):
        epoch = [p for p in f.split(os.sep) if p.startswith("epoch=")][0]
        with gzip.open(f, "rt", encoding="utf-8") as fh:
            counts[epoch] = counts.get(epoch, 0) + sum(1 for _ in fh)
    return counts


def _tree_stats(root: str) -> dict:
    dirs = files = 0
    for _, dn, fn in os.walk(root):
        dirs += len(dn)
        files += len(fn)
    return {"dirs": dirs, "files": files}


def main() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(f"{WORK}/watched", exist_ok=True)
    spark = get_spark(app_name="stream-ingest-smoke", master="local[32]")
    from dbd_datawarehouse_scraper_spark.__main__ import main as cli_main
    from dbd_datawarehouse_scraper_spark.sources.warc import warc_sink

    out = {"epochs": EPOCHS, "docs_per_epoch": None}

    # 1. gen: one archive per epoch, staged then moved (atomic rename
    # into the watched dir — the convention a crawler sink follows)
    t0 = time.time()
    n_per_epoch = None
    for e in range(EPOCHS):
        stage = f"{WORK}/stage_{e}"
        manifest = warc_sink(_epoch_docs(spark, e).coalesce(1), stage)
        n = sum(m["n_records"] for m in manifest)
        n_per_epoch = n
        os.rename(manifest[0]["file"], f"{WORK}/watched/epoch{e:02d}.warc.gz")
        shutil.rmtree(stage, ignore_errors=True)
    out["docs_per_epoch"] = n_per_epoch
    out["gen_s"] = round(time.time() - t0, 1)

    cli_args = [
        "--stream-export",
        "--input", f"{WORK}/watched",
        "--input-format", "wet",
        "--output", f"{WORK}/out",
        "--stream-state", f"{WORK}/state",
        "--segment-dedup-k", "8",
        "--substring-dedup-minlen", "50",
        "--shard-token-budget", "2000000",
        "--config", f"{WORK}/none.yaml",
    ]

    # 2. ingest: all archives present; maxFilesPerTrigger=1 ⇒ one
    # archive per micro-batch epoch
    t0 = time.time()
    assert cli_main(list(cli_args)) == 0
    out["ingest_s"] = round(time.time() - t0, 1)
    out["ingest_docs_per_s"] = int(
        EPOCHS * (n_per_epoch or 0) / max(out["ingest_s"], 0.001)
    )
    epoch_counts = _read_epoch_counts(f"{WORK}/out")
    out["epoch_survivors"] = dict(sorted(epoch_counts.items()))
    out["stores"] = {
        name: _tree_stats(f"{WORK}/state/state/{name}")
        for name in ("store", "segstore", "substore")
        if os.path.isdir(f"{WORK}/state/state/{name}")
    }

    # 3. replay: no new files — output must be unchanged
    t0 = time.time()
    assert cli_main(list(cli_args)) == 0
    out["replay_s"] = round(time.time() - t0, 1)
    replay_counts = _read_epoch_counts(f"{WORK}/out")
    out["replay_idempotent"] = replay_counts == epoch_counts

    # 4. strike: one archive that is 100% epoch-0 duplicates. A fully
    # struck epoch writes NO output shards at all, so the "did the
    # batch actually run" signal is the streaming checkpoint's offset
    # log advancing — not an output dir appearing.
    stage = f"{WORK}/stage_dup"
    dup_docs = _epoch_docs(spark, 0).limit(50_000).select(
        F.concat(F.lit("https://smoke.test/replayed/"), F.col("url")).alias("url"),
        "text",
    )
    manifest = warc_sink(dup_docs.coalesce(1), stage)
    os.rename(manifest[0]["file"], f"{WORK}/watched/zz-dup.warc.gz")
    shutil.rmtree(stage, ignore_errors=True)
    offsets_dir = f"{WORK}/state/ckpt/offsets"
    n_batches_before = len(os.listdir(offsets_dir))
    t0 = time.time()
    assert cli_main(list(cli_args)) == 0
    out["strike_s"] = round(time.time() - t0, 1)
    out["strike_batch_ran"] = len(os.listdir(offsets_dir)) > n_batches_before
    final_counts = _read_epoch_counts(f"{WORK}/out")
    new_epochs = {
        k: v for k, v in final_counts.items() if k not in epoch_counts
    }
    out["dup_epoch_survivors"] = new_epochs
    # empty new_epochs = every duplicate struck (no shards written)
    out["dup_epoch_struck"] = out["strike_batch_ran"] and all(
        v <= 50_000 * 0.01 for v in new_epochs.values()
    )

    out["total_s"] = round(
        out["gen_s"] + out["ingest_s"] + out["replay_s"] + out["strike_s"], 1
    )
    print(json.dumps(out))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
