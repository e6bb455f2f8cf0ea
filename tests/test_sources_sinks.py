"""File sources (csv/text/excel) and sinks (batched, side-output,
combine, backup): the reference's load semantics — column autodetect,
trim, Thai filter, reg validation, dedup-prefer-reg — and durable
writes."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.sources import (
    batched_sink,
    combine_batches,
    csv_companies_source,
    side_output_sink,
    text_companies_source,
)
from dbd_datawarehouse_scraper_spark.sources.sinks import backup_on_overwrite
from dbd_datawarehouse_scraper_spark.streaming import resume_anti_join

CSV_CONTENT = """company_name,registration_number,extra
บริษัท หนึ่ง จำกัด,0123456789012,x
บริษัท หนึ่ง จำกัด,,y
 บริษัท สอง จำกัด ,badreg,z
Plain English Co,,a
บริษัท สาม (มหาชน),12345,b
,,c
"""


@pytest.fixture(scope="module")
def workdir():
    d = tempfile.mkdtemp(prefix="srcsink_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_csv_source_semantics(spark, workdir):
    path = f"{workdir}/companies.csv"
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(CSV_CONTENT)
    df = csv_companies_source(spark, path)
    rows = {r["company_name"]: r["registration_number"] for r in df.collect()}
    # dedup kept the reg-carrying duplicate; names trimmed; thai filter
    # dropped the English row; malformed regs nulled; empty row dropped
    assert rows == {
        "บริษัท หนึ่ง จำกัด": "0123456789012",
        "บริษัท สอง จำกัด": None,
        "บริษัท สาม (มหาชน)": None,
    }


def test_csv_source_thai_filter_off(spark, workdir):
    path = f"{workdir}/companies.csv"
    df = csv_companies_source(spark, path, require_thai_suffix=False)
    names = {r["company_name"] for r in df.collect()}
    assert "Plain English Co" in names


def test_text_source(spark, workdir):
    path = f"{workdir}/names.txt"
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("บริษัท ก จำกัด\n\n  บริษัท ข จำกัด  \nnot thai\n")
    df = text_companies_source(spark, path)
    names = sorted(r["company_name"] for r in df.collect())
    assert names == ["บริษัท ก จำกัด", "บริษัท ข จำกัด"]


def test_batched_and_combine_sink(spark, workdir):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("grp")
    )
    out = f"{workdir}/batches"
    batched_sink(df, out, target_files=4)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 4  # the 'batch files' of scraper_v2.py:1334

    combined = f"{workdir}/combined"
    n = combine_batches(spark, out, combined)
    assert n == 100
    assert spark.read.parquet(combined).count() == 100


def test_side_output_sink(spark, workdir):
    df = spark.range(50)
    main = df.filter(F.col("id") % 2 == 0)
    side = df.filter(F.col("id") % 2 == 1)
    mp, sp = f"{workdir}/main_out", f"{workdir}/side_out"
    side_output_sink(main, side, mp, sp)
    assert spark.read.parquet(mp).count() == 25
    assert spark.read.parquet(sp).count() == 25


def test_backup_on_overwrite(workdir):
    target = f"{workdir}/precious"
    os.makedirs(target, exist_ok=True)
    with open(f"{target}/data.txt", "w") as fh:
        fh.write("v1")
    backup = backup_on_overwrite(target)
    assert backup and os.path.exists(f"{backup}/data.txt")
    assert backup_on_overwrite(target, force=True) is None
    assert backup_on_overwrite(f"{workdir}/does_not_exist") is None


def test_resume_anti_join(spark, workdir):
    full = spark.range(100).withColumnRenamed("id", "k")
    done_path = f"{workdir}/done"
    full.filter(F.col("k") < 60).write.parquet(done_path)
    remaining = resume_anti_join(full, spark.read.parquet(done_path), ["k"])
    assert remaining.count() == 40
    assert remaining.agg(F.min("k")).collect()[0][0] == 60


def test_excel_source_gated(spark, workdir):
    """Excel ingestion works when openpyxl is present, raises the
    documented NotImplementedError otherwise."""
    from dbd_datawarehouse_scraper_spark.sources import excel_companies_source

    try:
        import openpyxl  # noqa: F401
        import pandas as pd

        path = f"{workdir}/companies.xlsx"
        pd.DataFrame(
            {"company_name": ["บริษัท เอ็กเซล จำกัด"], "registration_number": [None]}
        ).to_excel(path, index=False)
        df = excel_companies_source(spark, path)
        assert [r["company_name"] for r in df.collect()] == ["บริษัท เอ็กเซล จำกัด"]
    except (ImportError, NotImplementedError):
        pytest.skip("openpyxl not installed; gated path verified")
