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


def _write_minimal_xlsx(path, header, rows, sheet="Sheet1"):
    """Stdlib xlsx writer (inline strings) — enough structure for both
    openpyxl and the engine's zip+XML fallback reader."""
    import zipfile
    from xml.sax.saxutils import escape

    def row_xml(rn, values):
        cells = "".join(
            f'<c r="{chr(65 + ci)}{rn}" t="inlineStr"><is><t>{escape(v)}</t></is></c>'
            for ci, v in enumerate(values)
            if v is not None
        )
        return f'<row r="{rn}">{cells}</row>'

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rel_ns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    pkg_rel_ns = "http://schemas.openxmlformats.org/package/2006/relationships"
    ct_ns = "http://schemas.openxmlformats.org/package/2006/content-types"
    sheet_rows = "".join(row_xml(i + 1, r) for i, r in enumerate([header] + rows))
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            f'<?xml version="1.0"?><Types xmlns="{ct_ns}">'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            "</Types>",
        )
        zf.writestr(
            "_rels/.rels",
            f'<?xml version="1.0"?><Relationships xmlns="{pkg_rel_ns}">'
            f'<Relationship Id="rId1" Type="{rel_ns}/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>",
        )
        zf.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook xmlns="{ns}" xmlns:r="{rel_ns}">'
            f'<sheets><sheet name="{sheet}" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            f'<?xml version="1.0"?><Relationships xmlns="{pkg_rel_ns}">'
            f'<Relationship Id="rId1" Type="{rel_ns}/worksheet" Target="worksheets/sheet1.xml"/>'
            "</Relationships>",
        )
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            f'<?xml version="1.0"?><worksheet xmlns="{ns}">'
            f"<sheetData>{sheet_rows}</sheetData></worksheet>",
        )


def test_excel_source(spark, workdir):
    """Excel ingestion: pandas/openpyxl when installed, the stdlib
    zip+XML fallback otherwise — both paths share the same semantics
    (autodetect, trim, Thai filter, dedup)."""
    from dbd_datawarehouse_scraper_spark.sources import excel_companies_source

    path = f"{workdir}/companies.xlsx"
    _write_minimal_xlsx(
        path,
        ["company_name", "registration_number", "extra"],
        [
            ["บริษัท เอ็กเซล จำกัด", None, "x"],
            [" บริษัท ขอบ จำกัด ", "0123456789012", "y"],
            ["Plain English Co", None, "z"],  # dropped by the Thai filter
        ],
    )
    df = excel_companies_source(spark, path)
    got = {r["company_name"]: r["registration_number"] for r in df.collect()}
    assert got == {
        "บริษัท เอ็กเซล จำกัด": None,
        "บริษัท ขอบ จำกัด": "0123456789012",
    }


def test_excel_source_named_sheet(spark, workdir):
    from dbd_datawarehouse_scraper_spark.sources import excel_companies_source

    path = f"{workdir}/named.xlsx"
    _write_minimal_xlsx(
        path,
        ["company_name"],
        [["บริษัท ชีทเนม จำกัด"]],
        sheet="รายชื่อ",
    )
    df = excel_companies_source(spark, path, sheet_name="รายชื่อ")
    assert [r["company_name"] for r in df.collect()] == ["บริษัท ชีทเนม จำกัด"]


def test_compact_output(spark, workdir):
    """Many small files → few target-sized files, same rows."""
    from dbd_datawarehouse_scraper_spark.sources.sinks import compact_output

    path = f"{workdir}/fragmented"
    df = spark.range(10000).selectExpr("id", "id * 2 AS v")
    df.repartition(40).write.parquet(path)  # 40 tiny files
    before_files = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert before_files >= 30

    n = compact_output(spark, path, target_mb=512)
    after_files = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n == 1 and after_files == 1
    out = spark.read.parquet(path)
    assert out.count() == 10000
    assert out.agg(F.sum("v")).collect()[0][0] == sum(2 * i for i in range(10000))
