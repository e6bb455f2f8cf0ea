"""File ingestion sources (SURVEY §2.1, scraper_v2.py:458-577).

Every source normalizes to the canonical companies relation
``(company_name string, registration_number string|null)`` with the
reference's load-time semantics: name-column autodetect, trim, empty
drop, optional Thai-suffix filter, reg-number validation, and
name-dedup that prefers rows carrying a reg number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import dedup_prefer_reg
from ..operators.filters import nonempty_filter, regnum_validate_filter, thai_filter

COMPANIES_SCHEMA = T.StructType(
    [
        T.StructField("company_name", T.StringType(), False),
        T.StructField("registration_number", T.StringType(), True),
    ]
)

_NAME_CANDIDATES = ("company_name", "ชื่อบริษัท", "name")
_REG_CANDIDATES = ("registration_number", "เลขทะเบียน", "reg_number")


def _detect_columns(
    df: DataFrame, name_col: str | None, reg_col: str | None = None
) -> tuple[str, str | None]:
    """Reference's column autodetect: explicit option → known names →
    first column; reg column optional (scraper_v2.py:492-511)."""
    cols = df.columns
    if name_col is None:
        name_col = next((c for c in cols if c in _NAME_CANDIDATES), cols[0])
    if reg_col is None:
        reg_col = next((c for c in cols if c in _REG_CANDIDATES), None)
    return name_col, reg_col


def _standardize(
    df: DataFrame,
    name_col: str,
    reg_col: str | None,
    require_thai_suffix: bool,
) -> DataFrame:
    out = df.select(
        F.trim(F.col(name_col).cast("string")).alias("company_name"),
        (
            F.trim(F.col(reg_col).cast("string"))
            if reg_col
            else F.lit(None).cast("string")
        ).alias("registration_number"),
    )
    out = nonempty_filter(out)
    out = thai_filter(out, enabled=require_thai_suffix)
    out = regnum_validate_filter(out)
    return dedup_prefer_reg(out)


def csv_companies_source(
    spark: SparkSession,
    path: str,
    name_col: str | None = None,
    reg_col: str | None = None,
    require_thai_suffix: bool = True,
) -> DataFrame:
    """Header CSV → companies relation (scraper_v2.py:486-520)."""
    raw = spark.read.option("header", True).option("encoding", "UTF-8").csv(path)
    n, r = _detect_columns(raw, name_col, reg_col)
    return _standardize(raw, n, r, require_thai_suffix)


def text_companies_source(
    spark: SparkSession, path: str, require_thai_suffix: bool = True
) -> DataFrame:
    """One name per line (scraper_v2.py:558-564)."""
    raw = spark.read.text(path).withColumnRenamed("value", "company_name")
    return _standardize(raw, "company_name", None, require_thai_suffix)


def excel_companies_source(
    spark: SparkSession,
    path: str,
    sheet_name: str | int = 0,
    name_col: str | None = None,
    reg_col: str | None = None,
    require_thai_suffix: bool = True,
) -> DataFrame:
    """``.xlsx/.xls`` via pandas on the driver (scraper_v2.py:522-556).

    Excel inputs are small human-curated lists; driver-side read then
    parallelize is the right scale call (the 100 TB side is never
    Excel). When openpyxl/xlrd are absent, ``.xlsx`` falls back to a
    stdlib zip+XML reader and legacy binary ``.xls`` to a minimal
    BIFF8 reader (xls_biff.py); a structurally unreadable ``.xls``
    raises ``NotImplementedError`` naming the conversion path."""
    import pandas as pd

    try:
        pdf = pd.read_excel(path, sheet_name=sheet_name, dtype=str)
    # ImportError: openpyxl/xlrd missing in minimal images. ValueError:
    # pandas could not even determine the format (it needs an engine to
    # look inside) — let the fallback readers make the call.
    except (ImportError, ValueError) as exc:
        if path.lower().endswith(".xlsx"):
            pdf = _read_xlsx_minimal(path, sheet_name)
        else:
            from .xls_biff import read_xls

            try:
                pdf = read_xls(path, sheet_name)
            except ValueError as biff_exc:
                raise NotImplementedError(
                    f"could not read {path!r} as BIFF8 ({biff_exc}); "
                    "install xlrd, or convert the file to .xlsx "
                    "(Excel / LibreOffice 'Save As', or "
                    "`libreoffice --convert-to xlsx`)"
                ) from exc
    raw = spark.createDataFrame(pdf.astype(object).where(pd.notnull(pdf), None))
    n, r = _detect_columns(raw, name_col, reg_col)
    return _standardize(raw, n, r, require_thai_suffix)


_SSML = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_RELNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKGNS = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def write_minimal_xlsx(
    path: str,
    header: list[str],
    rows: list[list[str | None]],
    sheet: str = "Sheet1",
) -> None:
    """Stdlib .xlsx writer (inline strings): the minimal OOXML package
    — content types, package rels, workbook, workbook rels, one sheet
    — readable by both openpyxl/pandas and this module's zip+XML
    fallback reader. Fixture-grade by design: Excel inputs here are
    small human-curated lists (scraper_v2.py:522-556); this writer
    exists so the excel ingestion path can be driven end-to-end from
    oracle queries and tests without an Excel engine installed."""
    import zipfile
    from xml.sax.saxutils import escape, quoteattr

    def col_letters(ci: int) -> str:
        # proper base-26 bijective numeration — chr(65+ci) produces
        # invalid refs ('[', '\\') past column Z
        out = ""
        ci += 1
        while ci:
            ci, rem = divmod(ci - 1, 26)
            out = chr(65 + rem) + out
        return out

    def row_xml(rn: int, values: list[str | None]) -> str:
        cells = "".join(
            f'<c r="{col_letters(ci)}{rn}" t="inlineStr"><is><t>{escape(v)}</t></is></c>'
            for ci, v in enumerate(values)
            if v is not None
        )
        return f'<row r="{rn}">{cells}</row>'

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rel_ns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    pkg_rel_ns = "http://schemas.openxmlformats.org/package/2006/relationships"
    ct_ns = "http://schemas.openxmlformats.org/package/2006/content-types"
    sheet_rows = "".join(
        row_xml(i + 1, r) for i, r in enumerate([header] + rows)
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            f'<?xml version="1.0"?><Types xmlns="{ct_ns}">'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Default Extension="rels" ContentType='
            '"application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
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
            f"<sheets><sheet name={quoteattr(sheet)} sheetId=\"1\" r:id=\"rId1\"/></sheets></workbook>",
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


def _cell_col_index(ref: str) -> int:
    """'B7' → 1 (0-based column)."""
    idx = 0
    for ch in ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _read_xlsx_minimal(path: str, sheet_name):
    """Pure-stdlib .xlsx reader (zipfile + ElementTree) for environments
    without openpyxl. Handles shared strings, inline strings, and plain
    values; first row is the header — the shapes the reference's Excel
    inputs use (scraper_v2.py:522-556). Returns a string-typed pandas
    DataFrame like ``pd.read_excel(dtype=str)``."""
    import xml.etree.ElementTree as ET
    import zipfile

    import pandas as pd

    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            shared = [
                "".join(t.text or "" for t in si.iter(f"{_SSML}t"))
                for si in root.iter(f"{_SSML}si")
            ]
        # resolve sheet name/index → r:id → worksheet part via the
        # workbook rels (NOT filename sort: sheet10.xml sorts before
        # sheet2.xml, and workbook order maps to parts via r:id)
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        sheets = [
            (s.get("name"), s.get(f"{_RELNS}id"))
            for s in wb.iter(f"{_SSML}sheet")
        ]
        rels: dict[str, str] = {}
        if "xl/_rels/workbook.xml.rels" in zf.namelist():
            rel_root = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
            for rel in rel_root.iter(f"{_PKGNS}Relationship"):
                t = rel.get("Target") or ""
                rels[rel.get("Id")] = (
                    t.lstrip("/") if t.startswith("/") else f"xl/{t}"
                )

        def _sheet_part(entry):
            name, rid = entry
            part = rels.get(rid)
            if part is not None and part in zf.namelist():
                return part
            # rels missing/odd: numeric-suffix order, not lexicographic
            numbered = sorted(
                (n for n in zf.namelist()
                 if n.startswith("xl/worksheets/sheet") and n.endswith(".xml")),
                key=lambda n: int("".join(ch for ch in n if ch.isdigit()) or 0),
            )
            idx = sheets.index(entry)
            return numbered[idx] if idx < len(numbered) else None

        target = None
        if isinstance(sheet_name, int):
            if 0 <= sheet_name < len(sheets):
                target = _sheet_part(sheets[sheet_name])
        else:
            entry = next((s for s in sheets if s[0] == sheet_name), None)
            if entry is not None:
                target = _sheet_part(entry)
        if target is None:
            raise ValueError(f"no worksheet found in {path}")
        rows: list[list[str | None]] = []
        for row in ET.fromstring(zf.read(target)).iter(f"{_SSML}row"):
            cells: dict[int, str | None] = {}
            for c in row.iter(f"{_SSML}c"):
                ci = _cell_col_index(c.get("r", "A1"))
                ctype = c.get("t", "n")
                if ctype == "inlineStr":
                    cells[ci] = "".join(
                        t.text or "" for t in c.iter(f"{_SSML}t")
                    )
                else:
                    v = c.find(f"{_SSML}v")
                    val = None if v is None else v.text
                    if ctype == "s" and val is not None:
                        val = shared[int(val)]
                    cells[ci] = val
            width = max(cells) + 1 if cells else 0
            rows.append([cells.get(i) for i in range(width)])
    if not rows:
        return pd.DataFrame()
    width = max(len(r) for r in rows)
    rows = [r + [None] * (width - len(r)) for r in rows]
    header = [h if h is not None else f"col{i}" for i, h in enumerate(rows[0])]
    return pd.DataFrame(rows[1:], columns=header, dtype=object)


def parquet_source(spark: SparkSession, path: str) -> DataFrame:
    """Engine-native columnar source: predicate pushdown + column
    pruning come free via Catalyst."""
    return spark.read.parquet(path)


def jsonl_documents_source(
    spark: SparkSession,
    path: str,
    schema: str = "doc_id LONG, text STRING",
    fail_on_corrupt: bool = False,
):
    """[EXT] JSONL (one JSON object per line) document source — the
    dominant interchange format for training corpora (C4, The Pile,
    RedPajama, FineWeb all ship JSONL/JSON-gz).

    Reads with an EXPLICIT schema (schema inference over 100 TB of
    JSONL is a full extra pass — never let Spark infer here); a torn
    line or malformed object lands on the corrupt side instead of
    killing the read, and the caller chooses the policy —

    - ``fail_on_corrupt=False`` (default): returns
      ``(good_rows, corrupt_rows)``; the corrupt side carries the raw
      line for quarantine/side-output (sinks.side_output_sink), the
      standard training-pipeline shape where a bad shard must not
      abort a 1000-executor ingest.
    - ``fail_on_corrupt=True``: any corrupt line raises — for
      ingest-time validation gates.

    Implementation: text source + ``from_json`` with an in-schema
    corrupt-record field, NOT the native JSON reader — Spark 2.3+
    refuses relation plans that reference only the internal
    corrupt-record column (the quarantine side would need a cache of
    the whole corpus to work around it, a non-starter at 100 TB);
    ``from_json`` over a text column has no such restriction, so both
    sides fall out of one pass with no cache. The text source is
    splittable per file and parallel across files; .gz shards fall
    back to one task per file (corpora should ship many ~100 MB-1 GB
    .gz shards, which is exactly how the public ones do).
    """
    from pyspark.sql import functions as F

    raw = spark.read.text(path)
    parsed = raw.select(
        F.from_json(
            F.col("value"),
            f"{schema}, _corrupt STRING",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("_r"),
        "value",
    )
    # blank/whitespace-only lines parse to a NULL struct (from_json
    # returns null, so _corrupt is null too) — without the _r-not-null
    # arm they'd land on the GOOD side as all-null rows and flow into
    # curation/dedup as null documents (round-5 review)
    good = (
        parsed.filter(F.col("_r").isNotNull() & F.col("_r._corrupt").isNull())
        .select("_r.*")
        .drop("_corrupt")
    )
    corrupt = parsed.filter(
        F.col("_r").isNull() | F.col("_r._corrupt").isNotNull()
    ).select(F.col("value").alias("raw_line"))
    if fail_on_corrupt:
        n = corrupt.count()
        if n:
            first = corrupt.head()["raw_line"]
            raise ValueError(
                f"{n} corrupt JSONL line(s) under {path}; first: "
                f"{first[:200]!r}. Re-run with fail_on_corrupt=False to "
                "quarantine them via the corrupt side instead."
            )
    return good, corrupt
