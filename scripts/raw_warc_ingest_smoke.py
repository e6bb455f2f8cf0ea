"""Raw-WARC ingestion scale smoke — round 10.

Round 9 proved the WET path at 5M records; this smoke proves the RAW
WARC path (``warc_html_documents_source``: HTTP split + gzip inflate +
charset decode + HTML strip per record — several× the per-record cost)
at ~1M response records, because a real Common Crawl user hits this
path first. Planted hazards exercise every error channel the round-10
decode hardening added:

- one TRUNCATED archive copy           → archive-level error row(s)
- one ``Content-Encoding: br`` record  → unsupported-encoding quarantine
- one HTTP 404 record                  → status-gate quarantine
- one invalid-UTF-8 byte in a body     → U+FFFD replacement, row GOOD
  (under ANSI mode a JVM F.decode would have killed the scan — the
  bug this round fixed)
- one TIS-620 ``charset=`` page        → decoded Thai, row GOOD
- one ``charset=klingon`` page         → unsupported-charset quarantine

Phases, each timed:
1. gen    — corpus parquet: sf0.1 documents wrapped in HTML chrome
2. write  — warc_sink(record_type='response') → member-per-record gzip
3. plant  — the hazard records above (stdlib-written .warc files)
4. read   — warc_html_documents_source full scan, split by channel
5. gates  — stateless gate report over the stripped text

Run:  SPARK_GRAFT_DRIVER_MEM=48g python scripts/raw_warc_ingest_smoke.py
Emits ONE JSON line: per-phase seconds, docs/s, bytes on disk, per-
channel error counts (each planted hazard must land in its channel).
"""

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbd_datawarehouse_scraper_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SMOKE_WORK_DIR", "/tmp/raw_warc_ingest_smoke")
REPLICAS = int(os.environ.get("SMOKE_REPLICAS", "200"))  # 5k docs × 200 = 1M
N_FILES = int(os.environ.get("SMOKE_N_FILES", "64"))


def _response_record(url: bytes, http_block: bytes) -> bytes:
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-00000000beef>\r\n"
        b"WARC-Date: 2000-01-01T00:00:00Z\r\n"
        b"WARC-Target-URI: " + url + b"\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(http_block)).encode() + b"\r\n\r\n"
        + http_block + b"\r\n\r\n"
    )


def _http(status: bytes, ct: bytes, body: bytes, extra: bytes = b"") -> bytes:
    return (
        b"HTTP/1.1 " + status + b"\r\nContent-Type: " + ct + b"\r\n"
        + extra + b"\r\n" + body
    )


def main() -> None:
    import shutil

    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    spark = get_spark(app_name="raw-warc-ingest-smoke", master="local[32]")
    from dbd_datawarehouse_scraper_spark.plans.curation import (
        curation_gate_report,
    )
    from dbd_datawarehouse_scraper_spark.sources.warc import (
        warc_html_documents_source,
        warc_sink,
    )

    out = {"replicas": REPLICAS, "n_files_requested": N_FILES}

    # 1. gen: HTML-wrapped distinct variants (unique doc-keyed prefix)
    t0 = time.time()
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").alias("base_id"), "text"
    )
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    docs = base.crossJoin(reps).select(
        F.concat(
            F.lit("https://smoke.test/"), F.col("base_id"), F.lit("/"), F.col("rep")
        ).alias("url"),
        F.encode(
            F.concat(
                F.lit(
                    "<html><head><title>t</title><style>.x{}</style></head>"
                    "<body><nav><a href='/a'>home</a></nav><p>"
                ),
                F.concat_ws(
                    " ",
                    F.concat(F.lit("uniq"), F.col("base_id"), F.lit("r"), F.col("rep")),
                    F.col("text"),
                ),
                F.lit("</p><script>no()</script></body></html>"),
            ),
            "UTF-8",
        ).alias("body"),
        F.lit(200).alias("status"),
        F.lit("text/html; charset=utf-8").alias("ct"),
    )
    docs.write.mode("overwrite").parquet(f"{WORK}/corpus")
    out["gen_s"] = round(time.time() - t0, 1)

    # 2. write: response records, member-per-record gzip
    t0 = time.time()
    corpus = spark.read.parquet(f"{WORK}/corpus").repartition(N_FILES)
    manifest = warc_sink(
        corpus,
        f"{WORK}/warc",
        record_type="response",
        payload_col="body",
        text_col=None,
        http_status_col="status",
        http_content_type_col="ct",
        warcinfo={"software": "spark-graft", "isPartOf": "raw-warc-smoke"},
    )
    out["write_s"] = round(time.time() - t0, 1)
    n_written = sum(m["n_records"] for m in manifest)
    out["n_written"] = n_written
    out["warc_gb_on_disk"] = round(sum(m["n_bytes"] for m in manifest) / 2**30, 2)
    out["write_docs_per_s"] = int(n_written / max(out["write_s"], 0.001))
    out["n_files"] = len(manifest)

    # 3. plant the hazards
    victim = manifest[0]["file"]
    blob = open(victim, "rb").read()
    with open(f"{WORK}/warc/zz-truncated.warc.gz", "wb") as f:
        f.write(blob[: len(blob) // 2])
    hazards = (
        _response_record(
            b"u:br",
            _http(b"200 OK", b"text/html", b"\x0b\x02\x80brbody",
                  extra=b"Content-Encoding: br\r\n"),
        )
        + _response_record(
            b"u:404",
            _http(b"404 Not Found", b"text/html",
                  b"<html><body>page not found</body></html>"),
        )
        + _response_record(
            b"u:badutf8",
            _http(b"200 OK", b"text/html; charset=utf-8",
                  b"<html><body><p>broken \xff byte page</p></body></html>"),
        )
        + _response_record(
            b"u:tis620",
            _http(
                b"200 OK", b"text/html; charset=TIS-620",
                ("<html><body><p>"
                 "บริษัท ทดสอบสเกล จำกัด ภาษาไทยต้องถอดรหัสถูก"
                 "</p></body></html>").encode("tis-620"),
            ),
        )
        + _response_record(
            b"u:klingon",
            _http(b"200 OK", b"text/html; charset=klingon",
                  b"<html><body>x</body></html>"),
        )
    )
    with open(f"{WORK}/warc/zz-hazards.warc", "wb") as f:
        f.write(hazards)
    out["planted"] = ["truncated", "br", "404", "badutf8-good", "tis620-good",
                      "klingon"]

    # 4. read: full raw-WARC parse + strip, split by channel
    t0 = time.time()
    back = warc_html_documents_source(spark, f"{WORK}/warc/*.warc*")
    chan = (
        back.select(
            F.when(F.col("error").isNull(), F.lit("good"))
            .when(F.col("error").startswith("archive"), F.lit("archive"))
            .when(F.col("error").contains("content-encoding"), F.lit("encoding"))
            .when(F.col("error").contains("charset"), F.lit("charset"))
            .when(F.col("error").startswith("http status"), F.lit("status"))
            .otherwise(F.lit("other"))
            .alias("channel")
        )
        .groupBy("channel")
        .count()
        .collect()
    )
    out["read_s"] = round(time.time() - t0, 1)
    out["channels"] = {r["channel"]: r["count"] for r in chan}
    out["read_docs_per_s"] = int(
        out["channels"].get("good", 0) / max(out["read_s"], 0.001)
    )

    # spot-check the two planted GOOD rows decoded correctly
    spot = {
        r.url: r.text
        for r in back.filter(
            F.col("url").isin("u:badutf8", "u:tis620")
        ).collect()
    }
    out["badutf8_replaced"] = "broken � byte" in (spot.get("u:badutf8") or "")
    out["tis620_thai_ok"] = "ทดสอบสเกล" in (spot.get("u:tis620") or "")

    # 5. gates: stateless gate report over the stripped text
    t0 = time.time()
    rep = curation_gate_report(
        back.filter(F.col("error").isNull()).select("text")
    ).collect()
    out["gates_s"] = round(time.time() - t0, 1)
    out["gate_report"] = {r["gate"]: r["n_fail"] for r in rep}

    out["total_s"] = round(
        out["gen_s"] + out["write_s"] + out["read_s"] + out["gates_s"], 1
    )
    print(json.dumps(out, ensure_ascii=False))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
