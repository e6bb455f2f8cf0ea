"""CLI surface: flag parity with the reference argparse
(scraper_v2.py:1568-1613) and end-to-end runs over the fake fetcher."""

import os
import random

import pytest

from dbd_datawarehouse_scraper_spark.__main__ import build_parser, main

# every option string the reference's parser accepts
REFERENCE_FLAGS = {
    "--config", "--generate-config",
    "--input", "-i", "--column", "-c", "--reg-column", "-r", "--sheet", "-s",
    "--no-filter",
    "--output", "-o", "--not-found-output", "--force", "-f",
    "--test", "--start", "--resume", "--visible", "--debug",
    "--batch-size", "--combine-only", "--workers",
    "--max-retries", "--no-retry", "--max-search-pages",
    "--similarity-threshold",
}


def test_arg_parity_with_reference():
    parser = build_parser()
    ours = {s for a in parser._actions for s in a.option_strings}
    missing = REFERENCE_FLAGS - ours
    assert not missing, f"reference flags missing from CLI: {missing}"


def test_defaults_match_reference():
    args = build_parser().parse_args([])
    assert args.start == 0
    assert args.max_retries == 3
    assert args.max_search_pages == 20
    assert args.similarity_threshold == 0.95
    assert args.workers == 1


def test_generate_config(tmp_path):
    cfg = tmp_path / "config.yaml"
    assert main(["--generate-config", "--config", str(cfg)]) == 0
    body = cfg.read_text(encoding="utf-8")
    # JSON fallback is valid YAML; either way the defaults round-trip
    from dbd_datawarehouse_scraper_spark.config import load_config

    conf = load_config(str(cfg))
    assert conf["matching"]["similarity_threshold"] == 0.95
    assert "รายได้รวม" in conf["extraction"]["income_fields"]
    assert body.strip()


@pytest.fixture()
def companies_csv(tmp_path):
    p = tmp_path / "companies.csv"
    p.write_text(
        "company_name\n"
        "บริษัท ทดสอบหนึ่ง จำกัด\n"
        "บริษัท ทดสอบสอง จำกัด\n"
        "บริษัท ทดสอบสาม จำกัด\n",
        encoding="utf-8",
    )
    return str(p)


def test_end_to_end_fake_run(spark, tmp_path, companies_csv):
    out = str(tmp_path / "out.parquet")
    nf = str(tmp_path / "nf.parquet")
    rc = main([
        "--input", companies_csv, "--output", out, "--not-found-output", nf,
        "--fetcher", "fake", "--force", "--test", "2",
        "--config", str(tmp_path / "absent.yaml"),
    ])
    assert rc == 0
    fact = spark.read.parquet(out)
    assert fact.count() > 0
    assert set(fact.columns) >= {"company_name", "registration_number",
                                 "field_name", "year", "value"}
    # --test 2 caps the companies processed
    assert fact.select("company_name").distinct().count() <= 2


def test_combine_only(spark, tmp_path):
    batches = str(tmp_path / "batches")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df.repartition(2).write.parquet(batches)
    out = str(tmp_path / "combined.parquet")
    rc = main(["--combine-only", "--input", batches, "--output", out, "--force",
               "--config", str(tmp_path / "absent.yaml")])
    assert rc == 0
    assert spark.read.parquet(out).count() == 2


def test_resume_skips_done(spark, tmp_path, companies_csv):
    out = str(tmp_path / "out.parquet")
    nf = str(tmp_path / "nf.parquet")
    base = ["--input", companies_csv, "--output", out, "--not-found-output", nf,
            "--fetcher", "fake", "--force",
            "--config", str(tmp_path / "absent.yaml")]
    assert main(base + ["--test", "1"]) == 0
    first = {r["company_name"]
             for r in spark.read.parquet(out).select("company_name").collect()}
    assert main(base + ["--resume"]) == 0
    all_names = {r["company_name"]
                 for r in spark.read.parquet(out).select("company_name").collect()}
    # resume appended the remaining companies without rewriting the first
    assert first <= all_names and len(all_names) > len(first)


def test_reference_format_config_translates(tmp_path):
    """A config.yaml written for the REFERENCE scraper works unchanged:
    section names (search/processing/retry/extraction/...) translate
    onto the engine schema."""
    import yaml

    from dbd_datawarehouse_scraper_spark.config import load_config

    ref_conf = {
        "input": {"file": "my.csv", "filter_thai": False},
        "output": {"revenue_file": "rev.csv", "force_overwrite": True},
        "search": {"max_pages": 7, "similarity_threshold": 0.8},
        "processing": {"workers": 3, "batch_size": 50,
                       "delay_between_requests": 2},
        "retry": {"max_retries": 5, "extra_wait_per_retry": 4},
        "browser": {"page_load_wait": 10},  # no engine analog; ignored
        "extraction": {
            "mode": "all",
            "income_statement_fields": ["รายได้รวม", "กำไรสุทธิ"],
            "include_balance_sheet": True,
            "balance_sheet_fields": ["สินทรัพย์รวม"],
        },
    }
    p = tmp_path / "ref.yaml"
    p.write_text(yaml.safe_dump(ref_conf, allow_unicode=True), encoding="utf-8")
    conf = load_config(str(p))
    assert conf["matching"]["max_pages"] == 7
    assert conf["matching"]["similarity_threshold"] == 0.8
    assert conf["matching"]["require_thai_suffix"] is False
    assert conf["fetch"]["fetch_partitions"] == 3
    assert conf["fetch"]["delay_between_requests"] == 2
    assert conf["fetch"]["max_retries"] == 5
    assert conf["fetch"]["retry_extra_wait"] == 4
    assert conf["io"]["batch_size"] == 50
    assert conf["io"]["backup_on_overwrite"] is False
    assert conf["extraction"]["mode"] == "full"
    assert conf["extraction"]["income_fields"] == ["รายได้รวม", "กำไรสุทธิ"]
    assert conf["extraction"]["balance_fields"] == ["สินทรัพย์รวม"]


def test_reference_shipped_config_loads():
    """The reference repo's own config.yaml parses and translates."""
    from dbd_datawarehouse_scraper_spark.config import load_config

    conf = load_config("/root/reference/config.yaml")
    assert conf["matching"]["max_pages"] == 100
    assert conf["matching"]["similarity_threshold"] == 0.75
    assert conf["fetch"]["fetch_partitions"] == 5
    assert "รายได้รวม" in conf["extraction"]["income_fields"]
    assert conf["extraction"]["include_balance_sheet"] is False


def test_reference_config_feeds_cli_io_defaults(spark, tmp_path, companies_csv):
    """input/output file settings in a reference-format config become
    CLI defaults; explicit flags still win."""
    import yaml

    out = str(tmp_path / "from_conf.parquet")
    nf = str(tmp_path / "nf.parquet")
    cfg = tmp_path / "ref.yaml"
    cfg.write_text(
        yaml.safe_dump(
            {
                "input": {"file": companies_csv},
                "output": {"revenue_file": out, "not_found_file": nf,
                           "force_overwrite": True},
                "debug": {"test_count": 1},
            },
            allow_unicode=True,
        ),
        encoding="utf-8",
    )
    rc = main(["--config", str(cfg), "--fetcher", "fake"])
    assert rc == 0
    fact = spark.read.parquet(out)
    assert fact.select("company_name").distinct().count() == 1  # test_count


def test_export_training_set_cli(spark, tmp_path):
    """--export-training-set runs the last-mile plan from the CLI:
    documents parquet in, split=<label>/shard=<n>/ gzip JSONL out."""
    import glob
    import json

    docs = spark.createDataFrame(
        [
            (i, "the quick brown fox and the lazy dog number %d" % i,
             f"src{i % 2}")
            for i in range(300)
        ],
        "doc_id long, text string, source string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "export")
    rc = main([
        "--export-training-set",
        "--input", src,
        "--output", out,
        "--mix-weights", json.dumps({"src0": 0.6, "src1": 0.4}),
        "--shard-token-budget", "500",
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    shards = glob.glob(f"{out}/split=train/shard=*/*.gz")
    assert shards, "no train shards written"
    back = spark.read.json(f"{out}/split=train")
    assert back.count() > 0
    assert {"doc_id", "text", "n_tokens", "shard"} <= set(back.columns)


_POOL = (
    "the quick brown fox jumps over a lazy dog and then some other "
    "words about weather market garden house river mountain paper "
    "color number letter window table chair music light water bread "
    "stone cloud winter summer spring autumn morning evening people "
    "family friend story answer question matter reason season "
    "system record report value place point world group company"
).split()


def test_export_training_set_cli_wet_input(spark, tmp_path):
    """--input-format wet: Common Crawl WET archives feed the funnel
    directly — record ids become doc_id (string ids exercise the
    string-path connected components), malformed records drop with a
    count instead of failing the export."""
    import itertools

    from pyspark.sql import functions as F

    from dbd_datawarehouse_scraper_spark.sources.warc import warc_sink

    pool = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    ).split()
    combos = list(itertools.combinations(pool, 3))[:60]
    docs = spark.createDataFrame(
        [
            (
                f"https://ex{i % 3}.test/p/{i}",
                "the quick document about "
                + " ".join(c)
                + " with more words "
                + " ".join(reversed(c)),
            )
            for i, c in enumerate(combos)
        ],
        "url string, text string",
    )
    wet_dir = str(tmp_path / "wet")
    warc_sink(docs.repartition(2), wet_dir)
    out = str(tmp_path / "export")
    rc = main([
        "--export-training-set",
        "--input", wet_dir,
        "--input-format", "wet",
        "--output", out,
        "--shard-token-budget", "300",
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    back = spark.read.json(f"{out}/split=train")
    n = back.count()
    assert n > 40  # distinct docs survive the funnel
    # WET record ids came through as the doc ids
    assert back.filter(F.col("doc_id").startswith("<urn:uuid:")).count() == n


def test_gate_report_cli_wet_input(spark, tmp_path, capsys):
    """--gate-report honors --input-format too (the two curation
    surfaces share one loader)."""
    from dbd_datawarehouse_scraper_spark.sources.warc import warc_sink

    docs = spark.createDataFrame(
        [(f"u:{i}", "the quick brown fox jumps over the lazy dog " * 3)
         for i in range(10)],
        "url string, text string",
    )
    wet_dir = str(tmp_path / "wet")
    warc_sink(docs.coalesce(1), wet_dir)
    rc = main([
        "--gate-report", wet_dir,
        "--input-format", "wet",
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    report = capsys.readouterr().out
    assert "corpus_size" in report and "10" in report


def test_gate_report_cli_jsonl_input(spark, tmp_path, capsys):
    """--input-format jsonl: corrupt lines are quarantined (never
    fatal, never counted by an extra pass), good rows reach the
    gates — corpus_size sees exactly the 8 good documents."""
    p = tmp_path / "docs.jsonl"
    lines = [
        '{"doc_id": %d, "text": "the quick brown fox jumps over the lazy dog"}'
        % i
        for i in range(8)
    ] + ['{"doc_id": broken']
    p.write_text("\n".join(lines))
    rc = main([
        "--gate-report", str(p),
        "--input-format", "jsonl",
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "corpus_size: 8" in out


def test_wet_loader_single_file_and_bad_count(spark, tmp_path, capsys):
    """_load_documents: a single archive file (no glob chars) passes
    through instead of growing a bogus /*.warc* suffix, and the
    malformed-record count rides the consuming scan (Observation) —
    no upfront extra pass."""
    import gzip as _gzip

    from dbd_datawarehouse_scraper_spark.__main__ import _load_documents
    from dbd_datawarehouse_scraper_spark.sources.warc import warc_sink

    docs = spark.createDataFrame(
        [(f"u:{i}", f"doc {i} text") for i in range(5)],
        "url string, text string",
    )
    m = warc_sink(docs.coalesce(1), str(tmp_path / "wet"))
    single = m[0]["file"]
    # append a truncated record as its own gzip member → one error row
    with open(single, "ab") as f:
        f.write(_gzip.compress(
            b"WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 99\r\n\r\nshort"
        ))
    loaded, finalize = _load_documents(spark, single, "wet")
    assert loaded.count() == 5  # the action that feeds the Observation
    finalize()
    assert "wet: dropped 1 malformed/non-HTML records" in capsys.readouterr().out


def test_export_training_set_cli_chunking_flags(spark, tmp_path):
    """--chunk-window splits exported docs into overlapping windows;
    ids become <doc>#<idx>; --chunk-stride without the window refuses
    and stride defaults to 3/4 of the window."""
    import glob
    import json

    docs = spark.createDataFrame(
        [
            # English-looking but shingle-distinct per doc: a per-doc
            # seeded shuffle of a word pool survives the lang/quality
            # gates AND near-dup (random orderings share ~no 3-shingles)
            (
                i,
                " ".join(random.Random(i).sample(_POOL, 40)),
                f"src{i % 2}",
            )
            for i in range(120)
        ],
        "doc_id long, text string, source string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "chunked")
    rc = main([
        "--export-training-set",
        "--input", src,
        "--output", out,
        "--mix-weights", json.dumps({"src0": 0.6, "src1": 0.4}),
        "--shard-token-budget", "500",
        "--chunk-window", "16", "--chunk-min-tokens", "4",
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    assert glob.glob(f"{out}/split=train/shard=*/*.gz")
    back = spark.read.json(f"{out}/split=train")
    ids = [r["doc_id"] for r in back.select("doc_id").collect()]
    assert ids and all("#" in i for i in ids)
    # 40-token docs at window 16 / stride 12: more chunks than docs
    assert len({i.split("#")[0] for i in ids}) < len(ids)
    with pytest.raises(ValueError, match="chunk-stride requires"):
        main([
            "--export-training-set", "--input", src, "--output", out,
            "--chunk-stride", "8",
            "--config", str(tmp_path / "none.yaml"),
        ])
    with pytest.raises(ValueError, match="chunk-window"):
        main([
            "--export-training-set", "--input", src, "--output", out,
            "--chunk-window", "0",
            "--config", str(tmp_path / "none.yaml"),
        ])


def test_export_training_set_cli_packing_flags(spark, tmp_path):
    """--pack-context packs chunked rows into training sequences (one
    JSONL row per sequence, doc_ids lineage, n_tokens <= context);
    --pack-separator without the context refuses."""
    import glob
    import json

    docs = spark.createDataFrame(
        [
            (i, " ".join(random.Random(i).sample(_POOL, 40)), "src0")
            for i in range(60)
        ],
        "doc_id long, text string, source string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "packed")
    rc = main([
        "--export-training-set",
        "--input", src,
        "--output", out,
        "--shard-token-budget", "500",
        "--chunk-window", "16", "--chunk-min-tokens", "4",
        "--pack-context", "48", "--pack-separator", " <doc> ",
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    assert glob.glob(f"{out}/split=train/shard=*/*.gz")
    back = spark.read.json(f"{out}/split=train")
    rows = back.collect()
    assert rows
    assert all(0 < r["n_tokens"] <= 48 for r in rows)
    assert all("#" in m for r in rows for m in r["doc_ids"])
    assert any(len(r["doc_ids"]) > 1 for r in rows), "nothing packed"
    assert all(
        len(r["text"].split(" <doc> ")) == len(r["doc_ids"]) for r in rows
    )
    with pytest.raises(ValueError, match="pack-separator requires"):
        main([
            "--export-training-set", "--input", src, "--output", out,
            "--pack-separator", "|",
            "--config", str(tmp_path / "none.yaml"),
        ])
    with pytest.raises(ValueError, match="pack-context"):
        main([
            "--export-training-set", "--input", src, "--output", out,
            "--pack-context", "0",
            "--config", str(tmp_path / "none.yaml"),
        ])
    # chunk windows that cannot fit one sequence refuse at parse time,
    # not hours later inside the packing kernel
    with pytest.raises(ValueError, match="must be <="):
        main([
            "--export-training-set", "--input", src, "--output", out,
            "--chunk-window", "64", "--pack-context", "48",
            "--config", str(tmp_path / "none.yaml"),
        ])


def test_export_training_set_cli_gopher_flag(spark, tmp_path):
    """--gopher gates the export on the published Gopher rules: prose
    with stop words survives, digit soup does not."""
    import glob

    docs = spark.createDataFrame(
        [(1, ("The results that have been shared with the board be of "
              "real interest to analysts and auditors alike. " * 8
              ).strip(), "s"),
         (2, " ".join("12345" for _ in range(80)), "s")],
        "doc_id long, text string, source string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "gophered")
    rc = main([
        "--export-training-set", "--input", src, "--output", out,
        "--gopher", "--shard-token-budget", "500",
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    assert glob.glob(f"{out}/split=*/shard=*/*.gz")
    ids = {
        r["doc_id"]
        for r in spark.read.option("basePath", out).json(f"{out}/split=*")
        .collect()
    }
    assert ids == {1}


def test_export_training_set_cli_curation_flags(spark, tmp_path):
    """--segment-dedup-k / --quality-sample-rates reach the funnel: an
    injected cross-doc boilerplate passage is absent from the exported
    text, and all-zero sample rates export nothing."""
    import glob
    import json

    # every 4-token body chunk carries the per-doc token d{i} so only
    # the appended boilerplate (2 aligned chunks) is cross-doc frequent
    boiler = "copyright footer all rights reserved terms apply now"
    docs = spark.createDataFrame(
        [
            (i, f"d{i} the d{i} and d{i} of d{i} is d{i} that d{i} this "
                + boiler, "src0")
            for i in range(60)
        ],
        "doc_id long, text string, source string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "export")
    rc = main([
        "--export-training-set",
        "--input", src,
        "--output", out,
        "--segment-dedup-k", "4",
        "--shard-token-budget", "500",
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    back = spark.read.json(f"{out}/split=train")
    texts = [r["text"] for r in back.collect()]
    assert texts and all("copyright footer" not in t for t in texts)

    out2 = str(tmp_path / "export2")
    rc = main([
        "--export-training-set",
        "--input", src,
        "--output", out2,
        "--quality-sample-rates", "0,0,0,0",
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    assert not glob.glob(f"{out2}/split=*/shard=*/*.gz")


def test_export_cli_rejects_bad_segment_k(spark, tmp_path):
    """--segment-dedup-k below 1 must raise (a negative k previously
    produced an empty training set with exit code 0)."""
    docs = spark.createDataFrame(
        [(1, "some text", "s")], "doc_id long, text string, source string"
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    with pytest.raises(ValueError, match="k must be >= 1"):
        main([
            "--export-training-set",
            "--input", src,
            "--output", str(tmp_path / "out"),
            "--segment-dedup-k", "-4",
            "--config", str(tmp_path / "none.yaml"),
        ])


def test_export_cli_rejects_zero_segment_k(spark, tmp_path):
    """--segment-dedup-k 0 must fail loudly: truthiness previously
    disabled the passage-dedup stage silently (advisor, r5)."""
    docs = spark.createDataFrame(
        [(1, "some text", "s")], "doc_id long, text string, source string"
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    with pytest.raises(ValueError, match="k must be >= 1"):
        main([
            "--export-training-set",
            "--input", src,
            "--output", str(tmp_path / "out"),
            "--segment-dedup-k", "0",
            "--config", str(tmp_path / "none.yaml"),
        ])


def test_export_cli_domain_and_decontamination_flags(spark, tmp_path):
    """--block-domains / --max-docs-per-domain / --decontaminate-against
    reach the funnel: blocked sources and benchmark-overlapping docs
    are absent from the export, per-domain caps bound the rest."""
    bench_text = "the quick brown fox jumps over the lazy dog again"
    docs = spark.createDataFrame(
        [
            (i, f"d{i} the d{i} and d{i} of d{i} is d{i} that d{i} this one",
             f"src{i % 3}")
            for i in range(60)
        ]
        + [(9001, f"prefix words here {bench_text} suffix words here", "src1")],
        "doc_id long, text string, source string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    bench = str(tmp_path / "bench.parquet")
    spark.createDataFrame(
        [(1, bench_text)], "bench_id long, text string"
    ).write.parquet(bench)
    out = str(tmp_path / "export")
    rc = main([
        "--export-training-set",
        "--input", src,
        "--output", out,
        "--block-domains", "src0",
        "--max-docs-per-domain", "8",
        "--decontaminate-against", bench,
        "--containment-threshold", "0.9",
        "--shard-token-budget", "500",
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    import glob
    import gzip
    import json

    ids = set()
    for f in glob.glob(f"{out}/split=*/shard=*/*.gz"):
        with gzip.open(f, "rt", encoding="utf-8") as fh:
            for line in fh:
                ids.add(json.loads(line)["doc_id"])
    assert ids and 9001 not in ids
    assert not any(i % 3 == 0 for i in ids if i < 9000)

    with pytest.raises(ValueError, match="max-docs-per-domain"):
        main([
            "--export-training-set",
            "--input", src,
            "--output", str(tmp_path / "export3"),
            "--max-docs-per-domain", "0",
            "--config", str(tmp_path / "none.yaml"),
        ])


@pytest.mark.slow
def test_stream_export_cli_end_to_end_and_rerun(spark, tmp_path):
    """--stream-export drains available input files epoch by epoch into
    gzip JSONL shards; a second invocation picks up only NEW files
    (checkpoint resume) and drops cross-run near-duplicates via the
    persisted dedup store; per-domain caps are refused as global."""
    import glob
    import gzip
    import json

    def read_ids(out):
        ids = set()
        for f in glob.glob(f"{out}/split=*/epoch=*/shard=*/*.gz"):
            with gzip.open(f, "rt", encoding="utf-8") as fh:
                for line in fh:
                    ids.add(json.loads(line)["doc_id"])
        return ids

    docs1 = spark.createDataFrame(
        [(i, f"the d{i} and d{i} of d{i} is d{i} that d{i} this one two")
         for i in range(20)],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "stream_out")
    docs1.coalesce(1).write.mode("append").parquet(src)
    args = [
        "--stream-export",
        "--input", src,
        "--output", out,
        "--stream-state", str(tmp_path / "st"),
        "--shard-token-budget", "400",
        "--config", str(tmp_path / "none.yaml"),
    ]
    assert main(list(args)) == 0
    first = read_ids(out)
    assert first and all(i < 20 for i in first)

    # second run: new docs + an exact duplicate of doc 3's text
    dup_text = "the d3 and d3 of d3 is d3 that d3 this one two"
    spark.createDataFrame(
        [(100 + i, f"the x{i} and x{i} of x{i} is x{i} that x{i} here now")
         for i in range(5)] + [(999, dup_text)],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    assert main(list(args)) == 0
    second = read_ids(out)
    assert first < second
    assert 100 in second and 999 not in second  # store caught the dup

    with pytest.raises(ValueError, match="global property"):
        main(args + ["--max-docs-per-domain", "5"])

    # chunking through the stream CLI: fresh state, long docs, ids
    # become <doc>#<idx> with several chunks per doc
    src3 = str(tmp_path / "docs_long")
    out3 = str(tmp_path / "stream_chunked")
    spark.createDataFrame(
        [
            (i, " ".join(random.Random(1000 + i).sample(_POOL, 40)))
            for i in range(12)
        ],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src3)
    rc = main([
        "--stream-export", "--input", src3, "--output", out3,
        "--stream-state", str(tmp_path / "st3"),
        "--shard-token-budget", "400",
        "--chunk-window", "16", "--chunk-min-tokens", "4",
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    ids3 = read_ids(out3)
    assert ids3 and all("#" in str(i) for i in ids3)
    assert len({str(i).split("#")[0] for i in ids3}) < len(ids3)


def test_export_cli_registrable_domain_keying(spark, tmp_path):
    """--block-domains keys on the registrable domain by default, so a
    subdomain-sharded host can't evade the list; --raw-host-domains
    restores exact-host matching."""
    docs = spark.createDataFrame(
        [
            (i, f"d{i} the d{i} and d{i} of d{i} is d{i} that d{i} this one",
             ["a.bad.com", "b.bad.com", "good.org"][i % 3])
            for i in range(30)
        ],
        "doc_id long, text string, source string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)

    import glob
    import gzip
    import json

    def _ids(out):
        ids = set()
        for f in glob.glob(f"{out}/split=*/shard=*/*.gz"):
            with gzip.open(f, "rt", encoding="utf-8") as fh:
                for line in fh:
                    ids.add(json.loads(line)["doc_id"])
        return ids

    base = [
        "--export-training-set", "--input", src,
        "--block-domains", "bad.com",
        "--shard-token-budget", "500",
        "--config", str(tmp_path / "none.yaml"),
    ]
    out1 = str(tmp_path / "exp1")
    assert main(base + ["--output", out1]) == 0
    ids1 = _ids(out1)
    assert ids1 and all(i % 3 == 2 for i in ids1)  # only good.org survives

    out2 = str(tmp_path / "exp2")
    assert main(base + ["--output", out2, "--raw-host-domains"]) == 0
    ids2 = _ids(out2)
    # raw-host mode: 'bad.com' matches neither subdomain exactly
    assert any(i % 3 == 0 for i in ids2) and any(i % 3 == 1 for i in ids2)


@pytest.mark.slow
def test_export_cli_html_cleanup_flags(spark, tmp_path):
    """--html-strip / --html-extract-main reach the funnel: exported
    text is visible prose, and extract-main drops link-chrome."""
    chrome = "".join(
        f"<li><a href='/{i}'>Menu item number {i}</a></li>" for i in range(8)
    )
    docs = spark.createDataFrame(
        [
            (i, f"<nav>{chrome}</nav><p>d{i} the real article body prose "
                f"of document {i} is long enough to keep entirely</p>", "src0")
            for i in range(12)
        ],
        "doc_id long, text string, source string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)

    import glob
    import gzip
    import json

    def _texts(out):
        texts = {}
        for f in glob.glob(f"{out}/split=*/shard=*/*.gz"):
            with gzip.open(f, "rt", encoding="utf-8") as fh:
                for line in fh:
                    r = json.loads(line)
                    texts[r["doc_id"]] = r["text"]
        return texts

    base = [
        "--export-training-set", "--input", src,
        "--shard-token-budget", "800",
        "--config", str(tmp_path / "none.yaml"),
    ]
    out1 = str(tmp_path / "strip")
    assert main(base + ["--output", out1, "--html-strip"]) == 0
    t1 = _texts(out1)
    assert t1 and all("<p>" not in t and "<nav>" not in t for t in t1.values())
    assert any("Menu item" in t for t in t1.values())  # plain strip keeps chrome text

    out2 = str(tmp_path / "main")
    assert main(base + ["--output", out2, "--html-extract-main"]) == 0
    t2 = _texts(out2)
    assert t2 and all("Menu item" not in t for t in t2.values())
    assert all("real article body prose" in t for t in t2.values())


def test_html_min_visible_ratio_validation(spark, tmp_path):
    docs = spark.createDataFrame([(1, "x", "s")],
                                 "doc_id long, text string, source string")
    src = str(tmp_path / "d.parquet")
    docs.write.parquet(src)
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        main(["--export-training-set", "--input", src,
              "--output", str(tmp_path / "o"),
              "--html-min-visible-ratio", "15",
              "--config", str(tmp_path / "none.yaml")])


def test_cli_optimize_output_mode(spark, tmp_path):
    """--optimize-output: standalone maintenance mode — compact (and
    with --zorder-cols, Z-order) a parquet dir in place, then exit."""
    import glob

    from pyspark.sql import functions as SF

    path = str(tmp_path / "tbl")
    spark.range(0, 20000, 1, 32).select(
        SF.col("id"), (SF.col("id") % 97).alias("x"), (SF.col("id") % 89).alias("y")
    ).write.parquet(path)
    n_before = len(glob.glob(f"{path}/part-*.parquet"))
    assert n_before >= 16

    rc = main(["--optimize-output", path, "--zorder-cols", "x,y",
               "--target-file-mb", "64",
               "--config", str(tmp_path / "none.yaml")])
    assert rc == 0
    assert len(glob.glob(f"{path}/part-*.parquet")) < n_before
    assert spark.read.parquet(path).count() == 20000

    # compact-only (no --zorder-cols)
    path2 = str(tmp_path / "tbl2")
    spark.range(0, 5000, 1, 24).write.parquet(path2)
    rc = main(["--optimize-output", path2,
               "--config", str(tmp_path / "none.yaml")])
    assert rc == 0
    assert len(glob.glob(f"{path2}/part-*.parquet")) < 24
    assert spark.read.parquet(path2).count() == 5000

    # --target-file-mb 0 would divide by zero deep in the sizing;
    # negatives silently degrade to one file — both refuse up front
    for bad in ("0", "-5"):
        with pytest.raises(ValueError, match="--target-file-mb"):
            main(["--optimize-output", path2, "--target-file-mb", bad,
                  "--config", str(tmp_path / "none.yaml")])


def test_fit_lm_and_lm_gated_export_cli(spark, tmp_path):
    """--fit-lm persists a save_lm model from a reference corpus;
    --lm-model + --max-perplexity gate the batch export on it; either
    LM flag alone refuses."""
    import glob

    ref = spark.createDataFrame(
        [(i, " ".join(random.Random(i).sample(_POOL, 40)), "s")
         for i in range(40)],
        "doc_id long, text string, source string",
    )
    refp = str(tmp_path / "ref.parquet")
    ref.write.parquet(refp)
    lmdir = str(tmp_path / "lm")
    rc = main([
        "--fit-lm", "--input", refp, "--output", lmdir,
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    from dbd_datawarehouse_scraper_spark.functions.lm import load_lm

    assert load_lm(spark, lmdir)["n_tokens"] == 40 * 40

    # corpus: in-domain docs (drawn from the same pool) plus OOV soup
    corpus = spark.createDataFrame(
        [(i, " ".join(random.Random(100 + i).sample(_POOL, 40)), "s")
         for i in range(20)]
        + [(900, " ".join(f"zzqx{j}" for j in range(40)), "s")],
        "doc_id long, text string, source string",
    )
    src = str(tmp_path / "docs.parquet")
    corpus.write.parquet(src)
    out = str(tmp_path / "gated")
    rc = main([
        "--export-training-set", "--input", src, "--output", out,
        "--lm-model", lmdir, "--max-perplexity", "5000",
        "--shard-token-budget", "500",
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    assert glob.glob(f"{out}/split=*/shard=*/*.gz")
    ids = {
        r["doc_id"]
        for r in spark.read.option("basePath", out)
        .json(f"{out}/split=*").collect()
    }
    assert 900 not in ids and ids  # the OOV soup gated out
    with pytest.raises(ValueError, match="together"):
        main([
            "--export-training-set", "--input", src, "--output", out,
            "--lm-model", lmdir,
            "--config", str(tmp_path / "none.yaml"),
        ])
    with pytest.raises(ValueError, match="together"):
        main([
            "--export-training-set", "--input", src, "--output", out,
            "--max-perplexity", "100",
            "--config", str(tmp_path / "none.yaml"),
        ])


def test_fit_dsir_and_dsir_gated_export_cli(spark, tmp_path):
    """--fit-dsir persists a save_dsir model; --dsir-model +
    --min-dsir-weight gate the batch export on it; either flag alone
    (or --fit-dsir without --dsir-target) refuses."""
    import glob

    target = spark.createDataFrame(
        [(i, " ".join(random.Random(i).sample(_POOL, 40)), "s")
         for i in range(30)],
        "doc_id long, text string, source string",
    )
    tp = str(tmp_path / "target.parquet")
    target.write.parquet(tp)
    # raw: 15 in-domain docs (drawn exactly like target docs 0-14, so
    # their n-grams hit the target buckets) + 5 OOV-soup docs
    corpus = spark.createDataFrame(
        [(i, " ".join(random.Random(i).sample(_POOL, 40)), "s")
         for i in range(15)]
        + [(900 + j, " ".join(f"qz{j}x{k}" for k in range(40)), "s")
           for j in range(5)],
        "doc_id long, text string, source string",
    )
    src = str(tmp_path / "docs.parquet")
    corpus.write.parquet(src)
    mdir = str(tmp_path / "dsir")
    with pytest.raises(ValueError, match="dsir-target"):
        main(["--fit-dsir", "--input", src, "--output", mdir,
              "--config", str(tmp_path / "none.yaml")])
    rc = main([
        "--fit-dsir", "--input", src, "--dsir-target", tp,
        "--dsir-buckets", "512", "--output", mdir,
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    out = str(tmp_path / "gated")
    rc = main([
        "--export-training-set", "--input", src, "--output", out,
        "--dsir-model", mdir, "--min-dsir-weight", "0",
        "--shard-token-budget", "500",
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    assert glob.glob(f"{out}/split=*/shard=*/*.gz")
    ids = {
        r["doc_id"]
        for r in spark.read.option("basePath", out).json(f"{out}/split=*")
        .collect()
    }
    assert ids and all(i < 900 for i in ids), ids  # OOV soup gated out
    with pytest.raises(ValueError, match="together"):
        main([
            "--export-training-set", "--input", src, "--output", out,
            "--dsir-model", mdir,
            "--config", str(tmp_path / "none.yaml"),
        ])


def test_write_and_verify_manifest_cli(spark, tmp_path):
    """--write-manifest audits an export and prints totals;
    --verify-manifest exits 0 on a clean tree and 1 on drift."""
    docs = spark.createDataFrame(
        [(i, ("the results that have been shared with the board be of "
              f"real interest to analysts and auditors alike row {i} "
              * 2).strip(), "s") for i in range(50)],
        "doc_id long, text string, source string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "out")
    assert main([
        "--export-training-set", "--input", src, "--output", out,
        "--shard-token-budget", "500",
        "--config", str(tmp_path / "none.yaml"),
    ]) == 0
    assert main(["--write-manifest", out,
                 "--config", str(tmp_path / "none.yaml")]) == 0
    assert main(["--verify-manifest", out,
                 "--config", str(tmp_path / "none.yaml")]) == 0
    # drift: remove one shard directory entirely
    import glob
    import shutil

    victim = sorted(glob.glob(f"{out}/split=train/shard=*"))[0]
    shutil.rmtree(victim)
    assert main(["--verify-manifest", out,
                 "--config", str(tmp_path / "none.yaml")]) == 1


def test_export_training_set_cli_c4_flag(spark, tmp_path):
    """--c4-clean strips non-sentence lines and gates pages: a
    nav-fragment page drops, prose survives with rewritten text."""
    good = "This sentence has enough words and ends properly."
    docs = spark.createDataFrame(
        [
            (1, "\n".join([good] * 6), "s"),
            (2, "Home\nAbout\nContact\n" + good, "s"),
            (3, "Menu\n" + "\n".join([good] * 6), "s"),
        ],
        "doc_id long, text string, source string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "c4")
    rc = main([
        "--export-training-set", "--input", src, "--output", out,
        "--c4-clean", "--shard-token-budget", "500",
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    rows = spark.read.option("basePath", out).json(f"{out}/split=*").collect()
    ids = {r["doc_id"] for r in rows}
    # docs 1 and 3 rewrite to the same 6 good lines -> exact dedup
    # keeps one of them; doc 2 fails the sentence floor
    assert ids and 2 not in ids and ids <= {1, 3}
    assert all("Menu" not in r["text"] for r in rows)


def test_gate_report_and_profile_cli(spark, tmp_path, capsys):
    """--gate-report prints per-gate drop counts (Gopher/C4 toggled by
    their flags); --profile prints the one-pass column profile."""
    good = ("The results that have been shared with the board be of "
            "real interest to analysts and auditors alike. " * 8).strip()
    docs = spark.createDataFrame(
        [(1, good), (2, "short."), (3, None)],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    rc = main([
        "--gate-report", src, "--gopher", "--c4-clean",
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "corpus_size: 3" in out
    assert "gopher:" in out and "c4:" in out and "any:" in out
    rc = main(["--profile", src, "--config", str(tmp_path / "none.yaml")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "doc_id (bigint): n=3 nulls=0" in out
    assert "text (string): n=3 nulls=1" in out


def test_cli_ivf_stats_mode(spark, tmp_path, capsys):
    from dbd_datawarehouse_scraper_spark.__main__ import main
    from dbd_datawarehouse_scraper_spark.operators.similarity_search import (
        ivf_build,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    ivf_build(emb, idx, n_lists=4, compression="sq8")
    rc = main(["--ivf-stats", idx])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("list ") == 4 and "rebuild_advised=" in out


@pytest.mark.slow
def test_stream_export_cli_wet_input(spark, tmp_path):
    """--stream-export --input-format wet: WET archives landing in a
    directory drive the incremental exporter — the continuous Common
    Crawl ingest shape. A second run picks up only the NEW archive
    (checkpoint resume) and the persisted store drops the cross-run
    exact duplicate."""
    import glob
    import gzip
    import json

    from dbd_datawarehouse_scraper_spark.sources.warc import warc_sink

    def read_ids(out):
        ids = set()
        for f in glob.glob(f"{out}/split=*/epoch=*/shard=*/*.gz"):
            with gzip.open(f, "rt", encoding="utf-8") as fh:
                for line in fh:
                    ids.add(json.loads(line)["doc_id"])
        return ids

    src = str(tmp_path / "wet_in")
    out = str(tmp_path / "wet_stream_out")
    docs1 = spark.createDataFrame(
        [(f"https://a.test/{i}",
          f"the d{i} and d{i} of d{i} is d{i} that d{i} this one two")
         for i in range(10)],
        "url string, text string",
    )
    warc_sink(docs1.coalesce(1), src)
    args = [
        "--stream-export",
        "--input", src,
        "--input-format", "wet",
        "--output", out,
        "--stream-state", str(tmp_path / "st"),
        "--shard-token-budget", "400",
        "--config", str(tmp_path / "none.yaml"),
    ]
    assert main(list(args)) == 0
    first = read_ids(out)
    assert len(first) == 10
    assert all(str(i).startswith("<urn:uuid:") for i in first)

    # a new archive lands: 3 new docs + an exact dup of doc 3's text
    docs2 = spark.createDataFrame(
        [(f"https://b.test/{i}",
          f"the x{i} and x{i} of x{i} is x{i} that x{i} here now")
         for i in range(3)]
        + [("https://b.test/dup", "the d3 and d3 of d3 is d3 that d3 this one two")],
        "url string, text string",
    )
    warc_sink(docs2.coalesce(1), src)
    assert main(list(args)) == 0
    second = read_ids(out)
    assert len(second) == 13  # +3 new, dup dropped by the store
    assert first < second


def test_stream_export_refuses_jsonl_input(spark, tmp_path):
    with pytest.raises(ValueError, match="parquet or wet"):
        main([
            "--stream-export", "--input", str(tmp_path / "x"),
            "--input-format", "jsonl", "--output", str(tmp_path / "o"),
            "--config", str(tmp_path / "none.yaml"),
        ])


def test_stream_export_refuses_global_flags_and_honors_splits(spark, tmp_path):
    """--quality-sample-rates refuses under --stream-export (global
    quantile property — the mixing/caps precedent), and
    --split-fractions is honored instead of silently defaulting."""
    import glob

    import pytest as _pytest

    from dbd_datawarehouse_scraper_spark.__main__ import main

    docs = spark.createDataFrame(
        [(i, "the results that have been shared with the board are of "
             f"real interest to analysts and auditors alike doc {i}", "s")
         for i in range(12)],
        "doc_id long, text string, source string",
    )
    src = str(tmp_path / "in")
    docs.coalesce(1).write.mode("append").parquet(src)
    with _pytest.raises(ValueError, match="quality-sample-rates"):
        main([
            "--stream-export", "--input", src,
            "--output", str(tmp_path / "o1"),
            "--quality-sample-rates", "100,500,10000",
        ])
    out = str(tmp_path / "o2")
    rc = main([
        "--stream-export", "--input", src, "--output", out,
        "--split-fractions", '{"train": 1.0}', "--no-redact",
    ])
    assert rc == 0
    # everything landed under split=train — the fractions were honored
    assert glob.glob(f"{out}/split=train/epoch=*/shard=*/*.gz")
    assert not glob.glob(f"{out}/split=val*")


def test_fit_vocab_cli(spark, tmp_path):
    """--fit-vocab trains a load_merges-compatible merges file on
    --input and --token-counter vocab:<it> meters an export with it."""
    import glob

    from dbd_datawarehouse_scraper_spark.functions.bpe import (
        get_counter,
        load_merges,
    )

    docs = spark.createDataFrame(
        [(i, "the data pipeline writes deterministic shards of the "
             f"corpus batch {i}", "s") for i in range(25)],
        "doc_id long, text string, source string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    mpath = str(tmp_path / "merges.txt")
    rc = main([
        "--fit-vocab", "--input", src, "--output", mpath,
        "--vocab-merges", "80",
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    ranks = load_merges(mpath)  # loads => format-valid
    assert 0 < len(ranks) <= 80
    out = str(tmp_path / "exp")
    rc = main([
        "--export-training-set", "--input", src, "--output", out,
        "--token-counter", f"vocab:{mpath}",
        "--shard-token-budget", "300", "--min-quality", "0",
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    got = spark.read.option("basePath", out).json(f"{out}/split=*").collect()
    assert got
    c = get_counter(mpath)
    for r in got:
        assert r["n_tokens"] == c.count(r["text"])
    assert glob.glob(f"{out}/split=*/shard=*/*.gz")


def test_fit_classifier_and_gated_export_cli(spark, tmp_path):
    """--fit-classifier persists a save_classifier model (positives
    from --classifier-pos, negatives from --input); --classifier-model
    + --min-classifier-prob gate the batch export; either flag alone
    (or --fit-classifier without --classifier-pos) refuses."""
    import glob

    good = [
        (i, " ".join(random.Random(i).sample(_POOL, 40)), "s")
        for i in range(30)
    ]
    junk = [
        (900 + j, " ".join(f"qz{j}x{k}" for k in range(40)), "s")
        for j in range(20)
    ]
    pos = spark.createDataFrame(good, "doc_id long, text string, source string")
    tp = str(tmp_path / "pos.parquet")
    pos.write.parquet(tp)
    corpus = spark.createDataFrame(
        good[:15] + junk, "doc_id long, text string, source string"
    )
    src = str(tmp_path / "docs.parquet")
    corpus.write.parquet(src)
    mdir = str(tmp_path / "clf")
    with pytest.raises(ValueError, match="classifier-pos"):
        main(["--fit-classifier", "--input", src, "--output", mdir,
              "--config", str(tmp_path / "none.yaml")])
    rc = main([
        "--fit-classifier", "--input", src, "--classifier-pos", tp,
        "--classifier-buckets", "512", "--output", mdir,
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    out = str(tmp_path / "gated")
    rc = main([
        "--export-training-set", "--input", src, "--output", out,
        "--classifier-model", mdir, "--min-classifier-prob", "0.5",
        "--shard-token-budget", "500",
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    assert glob.glob(f"{out}/split=*/shard=*/*.gz")
    ids = {
        r["doc_id"]
        for r in spark.read.option("basePath", out).json(f"{out}/split=*")
        .collect()
    }
    assert ids and all(i < 900 for i in ids), ids  # junk gated out
    with pytest.raises(ValueError, match="together"):
        main([
            "--export-training-set", "--input", src, "--output", out,
            "--classifier-model", mdir,
            "--config", str(tmp_path / "none.yaml"),
        ])
    with pytest.raises(ValueError, match="together"):
        main([
            "--export-training-set", "--input", src, "--output", out,
            "--min-classifier-prob", "0.5",
            "--config", str(tmp_path / "none.yaml"),
        ])


def test_stream_link_graph_cli_wat_input(spark, tmp_path):
    """--stream-link-graph --input-format wat: WAT archives landing in
    a directory maintain the incremental link-graph store at --output;
    a second run picks up only the NEW archive (checkpoint resume) and
    re-crawled edges are struck; --refresh-link-ranks commits ranks
    behind the meta marker."""
    from dbd_datawarehouse_scraper_spark.sources.warc import wat_sink
    from dbd_datawarehouse_scraper_spark.streaming.link_graph import (
        current_ranks,
        stored_edges,
    )

    src = str(tmp_path / "wat_in")
    store = str(tmp_path / "lgstore")
    os.makedirs(src)

    def archive(n, rows):
        stage = str(tmp_path / f"stage{n}")
        m = wat_sink(
            spark.createDataFrame(rows, "url string, title string, links array<string>")
            .coalesce(1),
            stage,
        )
        os.rename(m[0]["file"], f"{src}/e{n}.warc.gz")

    archive(0, [("https://a.test/1", "t", ["https://b.test/x", "https://c.test/y"])])
    args = [
        "--stream-link-graph",
        "--input", src,
        "--input-format", "wat",
        "--output", store,
    ]
    assert main(list(args)) == 0
    got0 = sorted(map(tuple, stored_edges(spark, store).collect()))
    assert got0 == [("a.test", "b.test"), ("a.test", "c.test")]

    # second archive: one dup edge (struck), one new
    archive(1, [("https://a.test/2", "t", ["https://b.test/z", "https://d.test/w"])])
    assert main(list(args) + ["--refresh-link-ranks"]) == 0
    got1 = sorted(map(tuple, stored_edges(spark, store).collect()))
    assert got1 == [
        ("a.test", "b.test"),
        ("a.test", "c.test"),
        ("a.test", "d.test"),
    ]
    e1 = sorted(
        map(
            tuple,
            spark.read.parquet(f"{store}/edges/epoch=1")
            .select("src", "dst")
            .collect(),
        )
    )
    assert e1 == [("a.test", "d.test")]
    ranks, meta = current_ranks(spark, store)
    assert meta["n_edges"] == 3 and meta["n_nodes"] == 4
    assert ranks.count() == 4
    from dbd_datawarehouse_scraper_spark.caching import release_caches

    release_caches()


def test_stream_link_graph_requires_explicit_output(spark, tmp_path):
    """The link-graph store is long-lived state: running the modes
    without -o must refuse rather than silently initializing a store
    under the scrape default path (round-11 advice)."""
    for mode in ("--stream-link-graph", "--refresh-link-ranks"):
        with pytest.raises(ValueError, match="explicit --output"):
            main([mode, "--input", str(tmp_path), "--input-format", "parquet"])


def test_stream_link_graph_explicit_default_path_is_a_choice(
    spark, tmp_path, monkeypatch
):
    """An explicitly typed '-o revenue_data.parquet' IS an explicit
    choice: the guard keys off unset-vs-set, not the literal value
    (round-12 review: comparing against the default literal made the
    deliberate case indistinguishable and refused it)."""
    monkeypatch.chdir(tmp_path)
    # passes the guard, then fails for the RIGHT reason: no store there
    with pytest.raises(ValueError, match="missing format marker"):
        main([
            "--refresh-link-ranks",
            "--input", str(tmp_path),
            "--input-format", "parquet",
            "-o", "revenue_data.parquet",
        ])


def test_stream_link_graph_refuses_wet_input(spark, tmp_path):
    os.makedirs(tmp_path / "in")
    with pytest.raises(ValueError, match="wat or\n?.*parquet|wat or parquet"):
        main([
            "--stream-link-graph",
            "--input", str(tmp_path / "in"),
            "--input-format", "wet",
            "--output", str(tmp_path / "store"),
        ])
