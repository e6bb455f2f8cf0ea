"""Filter / predicate operators (SURVEY §2.2).

Each is a plain ``df.filter`` on built-in expressions, so Catalyst
pushes it into the parquet scan (check ``PushedFilters`` in the plan)
— the scale-critical property: at 100 TB these predicates must prune
row groups at the source, not after a full scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.parsing import REGNUM_FULL

THAI_COMPANY_MARKERS = ("จำกัด", "มหาชน")


def thai_company_predicate(col: Column) -> Column:
    """Row keeps iff the name contains จำกัด or มหาชน
    (scraper_v2.py:517, 554, 563)."""
    return col.contains(THAI_COMPANY_MARKERS[0]) | col.contains(
        THAI_COMPANY_MARKERS[1]
    )


def thai_filter(df: DataFrame, name_col: str = "company_name", enabled: bool = True) -> DataFrame:
    if not enabled:  # configurable off, scraper_v2.py:364-365
        return df
    return df.filter(thai_company_predicate(F.col(name_col)))


def nonempty_filter(df: DataFrame, name_col: str = "company_name") -> DataFrame:
    """Drop null/empty/whitespace-only names (scraper_v2.py:516, 553, 562)."""
    return df.filter(F.length(F.trim(F.coalesce(F.col(name_col), F.lit("")))) > 0)


def placeholder_filter(df: DataFrame, raw_col: str = "raw_value") -> DataFrame:
    """Drop cell placeholders '-', '', '0.00' before numeric parse
    (scraper_v2.py:1217-1218)."""
    return df.filter(~F.coalesce(F.col(raw_col), F.lit("")).isin("-", "", "0.00"))


def regnum_validate_filter(df: DataFrame, reg_col: str = "registration_number") -> DataFrame:
    """Null-out malformed registration numbers (keep the row) —
    scraper_v2.py:513-514."""
    c = F.col(reg_col)
    return df.withColumn(reg_col, F.when(c.rlike(REGNUM_FULL), c))


def candidate_row_filter(df: DataFrame, line_col: str = "line") -> DataFrame:
    """A search-result line is a candidate iff it contains a 13-digit reg
    number AND จำกัด (scraper_v2.py:964-965)."""
    c = F.col(line_col)
    return df.filter(c.rlike(r"0\d{12}") & c.contains("จำกัด"))


def year_filter(df: DataFrame, years: Sequence[int] | None, year_col: str = "year") -> DataFrame:
    """Keep configured target years; None = all (scraper_v2.py:127, 1222)."""
    if years is None:
        return df
    return df.filter(F.col(year_col).isin(list(years)))


def field_filter(df: DataFrame, fields: Sequence[str], field_col: str = "field_name") -> DataFrame:
    """Keep configured field names (scraper_v2.py:1188-1196). Exact-match
    after extraction; the reference's substring matching happens at
    extraction time (see sources/http_fetch.py)."""
    return df.filter(F.col(field_col).isin(list(fields)))


def similarity_threshold_filter(df: DataFrame, threshold: float, sim_col: str = "sim") -> DataFrame:
    """Accept fuzzy matches only at/above threshold (scraper_v2.py:1062-1067)."""
    return df.filter(F.col(sim_col) >= F.lit(threshold))
