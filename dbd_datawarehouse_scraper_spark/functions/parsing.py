"""Value parsing / extraction column expressions.

Replicates the reference's regex extraction and numeric parsing
(scraper_v2.py:901-984, 1171-1228) with built-in Spark functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

REGNUM_PATTERN = r"(0\d{12})"
REGNUM_FULL = r"^0\d{12}$"
YEAR_HEADER = r"^(25[6-7][0-9])$"


def extract_regnum(col: Column) -> Column:
    """First 13-digit registration number in free text; null when absent
    (scraper_v2.py:964)."""
    hit = F.regexp_extract(col, REGNUM_PATTERN, 1)
    return F.when(hit != "", hit)


def extract_labeled_regnum(col: Column) -> Column:
    """Registration number labeled ``เลขทะเบียนนิติบุคคล : X``
    (scraper_v2.py:901, 980)."""
    hit = F.regexp_extract(col, r"เลขทะเบียนนิติบุคคล\s*[:\s]\s*(0\d{12})", 1)
    return F.when(hit != "", hit)


def validate_regnum(col: Column) -> Column:
    """Keep the value only if it matches ``^0\\d{12}$``, else null — the
    leading-zero format means reg numbers stay strings
    (scraper_v2.py:513-514, 550-551)."""
    return F.when(col.rlike(REGNUM_FULL), col)


def parse_money(col: Column) -> Column:
    """``'1,234,567.89'`` → double; unparseable → null
    (scraper_v2.py:1220-1228). Null propagates so a later
    ``isNotNull`` filter reproduces the reference's skip-on-ValueError.
    """
    return F.regexp_replace(col, ",", "").cast("double")


def parse_year_header(col: Column) -> Column:
    """Buddhist-era year header cell ``25[6-7][0-9]`` → int, null otherwise
    (scraper_v2.py:1171-1175). Years stay BE — no CE conversion, for
    parity with the reference."""
    hit = F.regexp_extract(col, YEAR_HEADER, 1)
    return F.when(hit != "", hit.cast("int"))


def match_type_label(sim: Column) -> Column:
    """``similarity_95%`` label from a [0,1] score; int() truncation parity
    (scraper_v2.py:1064)."""
    return F.concat(
        F.lit("similarity_"), F.floor(sim * 100).cast("int").cast("string"), F.lit("%")
    )


def total_pages_parse(col: Column) -> Column:
    """Page count from ``หน้า 1 / N`` or ``/ N`` text; null when absent
    (scraper_v2.py:929-938)."""
    hit = F.regexp_extract(col, r"/\s*(\d+)", 1)
    return F.when(hit != "", hit.cast("int"))
