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
    Excel). Needs openpyxl/xlrd at runtime — gated import."""
    import pandas as pd

    try:
        pdf = pd.read_excel(path, sheet_name=sheet_name, dtype=str)
    except ImportError as exc:  # openpyxl missing in minimal images
        raise NotImplementedError(
            "excel_companies_source needs openpyxl/xlrd installed"
        ) from exc
    raw = spark.createDataFrame(pdf.astype(object).where(pd.notnull(pdf), None))
    n, r = _detect_columns(raw, name_col, reg_col)
    return _standardize(raw, n, r, require_thai_suffix)


def parquet_source(spark: SparkSession, path: str) -> DataFrame:
    """Engine-native columnar source: predicate pushdown + column
    pruning come free via Catalyst."""
    return spark.read.parquet(path)
