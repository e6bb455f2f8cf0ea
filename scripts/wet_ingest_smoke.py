"""WET codec scale smoke — round 9 (continued).

The WARC/WET codec (sources/warc.py) is this round's headline source;
its tests run on hundreds of documents. This smoke proves the codec's
write AND read paths at millions of records: 5M documents round-trip
through member-per-record-gzip WET archives, then the batch reader
streams them back through the funnel's stateless gates, with one
deliberately TRUNCATED archive planted to prove archive-level fault
isolation holds at scale (one error row, zero task failures).

Corpus: REPLICAS distinct variants of each sf0.1 document (unique
doc-keyed token prefix — no dedup clustering; this smoke measures the
codec, not the funnel). Phases, each timed:

1. gen      — corpus parquet (baseline for relative IO cost)
2. write    — warc_sink into one WET file per partition
             (member-per-record gzip: N_FILES × ~40 MB)
3. corrupt  — truncate a copy of one archive mid-stream (planted)
4. read     — wet_documents_source full scan + count by error
5. gates    — lang/quality/token stateless gates over the parsed text
             (the --gate-report path a WET user runs first)

Run:  SPARK_GRAFT_DRIVER_MEM=48g python scripts/wet_ingest_smoke.py
Emits ONE JSON line: per-phase seconds, docs/s for write and read,
bytes on disk, error-row count (must be exactly 1: the planted
truncation), gate-survivor count.
"""

import glob
import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbd_datawarehouse_scraper_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SMOKE_WORK_DIR", "/tmp/wet_ingest_smoke")
REPLICAS = int(os.environ.get("SMOKE_REPLICAS", "1000"))  # 5k docs × 1000 = 5M
N_FILES = int(os.environ.get("SMOKE_N_FILES", "64"))


def main() -> None:
    import shutil

    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    spark = get_spark(app_name="wet-ingest-smoke", master="local[32]")
    from dbd_datawarehouse_scraper_spark.plans.curation import (
        curation_gate_report,
    )
    from dbd_datawarehouse_scraper_spark.sources.warc import (
        warc_sink,
        wet_documents_source,
    )

    out = {"replicas": REPLICAS, "n_files_requested": N_FILES}

    # 1. gen: distinct variants — unique doc-keyed prefix per replica
    t0 = time.time()
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").alias("base_id"), "text"
    )
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    docs = base.crossJoin(reps).select(
        F.concat(
            F.lit("https://smoke.test/"), F.col("base_id"), F.lit("/"), F.col("rep")
        ).alias("url"),
        F.concat_ws(
            " ",
            F.concat(F.lit("uniq"), F.col("base_id"), F.lit("r"), F.col("rep")),
            F.col("text"),
        ).alias("text"),
    )
    docs.write.mode("overwrite").parquet(f"{WORK}/corpus")
    out["gen_s"] = round(time.time() - t0, 1)

    # 2. write: one WET file per partition, member-per-record gzip
    t0 = time.time()
    corpus = spark.read.parquet(f"{WORK}/corpus").repartition(N_FILES)
    manifest = warc_sink(
        corpus,
        f"{WORK}/wet",
        warcinfo={"software": "spark-graft", "isPartOf": "wet-ingest-smoke"},
    )
    out["write_s"] = round(time.time() - t0, 1)
    n_written = sum(m["n_records"] for m in manifest)
    disk = sum(m["n_bytes"] for m in manifest)
    out["n_written"] = n_written
    out["wet_gb_on_disk"] = round(disk / 2**30, 2)
    out["write_docs_per_s"] = int(n_written / max(out["write_s"], 0.001))
    out["n_files"] = len(manifest)

    # 3. corrupt: truncate a COPY of the first archive mid-stream
    victim = manifest[0]["file"]
    blob = open(victim, "rb").read()
    with open(f"{WORK}/wet/zz-truncated.warc.gz", "wb") as f:
        f.write(blob[: len(blob) // 2])
    out["planted_truncation"] = True

    # 4. read: full parse, error split (ONE archive-read error row
    # expected; its successfully-parsed prefix records also count)
    t0 = time.time()
    back = wet_documents_source(spark, f"{WORK}/wet/*.warc.gz")
    counts = back.groupBy(F.col("error").isNotNull().alias("bad")).count().collect()
    by_bad = {r["bad"]: r["count"] for r in counts}
    out["read_s"] = round(time.time() - t0, 1)
    out["n_read_good"] = by_bad.get(False, 0)
    out["n_error_rows"] = by_bad.get(True, 0)
    out["read_docs_per_s"] = int(out["n_read_good"] / max(out["read_s"], 0.001))

    # 5. gates: the stateless gate report straight off the WET parse
    t0 = time.time()
    rep = curation_gate_report(
        back.filter(F.col("error").isNull()).select("text")
    ).collect()
    out["gates_s"] = round(time.time() - t0, 1)
    out["gate_report"] = {r["gate"]: r["n_fail"] for r in rep}

    out["total_s"] = round(
        out["gen_s"] + out["write_s"] + out["read_s"] + out["gates_s"], 1
    )
    print(json.dumps(out))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
