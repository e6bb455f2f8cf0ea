"""CLI surface: flag parity with the reference argparse
(scraper_v2.py:1568-1613) and end-to-end runs over the fake fetcher."""

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
