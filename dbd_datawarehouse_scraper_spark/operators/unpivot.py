"""Wide→long unpivot (SURVEY §2.8 / E3, scraper_v2.py:1519-1532).

The reference folds its nested {field → {year → value}} matrix into the
8-column long fact table row by row. In Spark the wide relation unpivots
with ``stack`` (one projection, no shuffle) — the nested map IR never
exists; long format IS the engine's native representation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.parsing import parse_money

# Final fact-table schema (scraper_v2.py:1341)
FACT_COLUMNS = [
    "company_name",
    "registration_number",
    "match_type",
    "search_strategy",
    "table_type",
    "field_name",
    "value",
    "year",
]

# Not-found side-output schema (scraper_v2.py:1350)
NOT_FOUND_COLUMNS = [
    "company_name",
    "registration_number",
    "match_type",
    "search_strategy",
    "reason",
]


def unpivot_financials(
    wide: DataFrame,
    id_cols: Sequence[str],
    year_value_cols: Sequence[tuple[int, str]],
    year_col: str = "year",
    value_col: str = "value",
    parse: bool = True,
    drop_placeholders: bool = True,
) -> DataFrame:
    """Unpivot (year → raw value) column pairs into long rows.

    ``year_value_cols`` maps each Buddhist-era year to its wide column
    (the reference reads cell ``i*2`` per year — value/%change pairs,
    scraper_v2.py:1208-1214; here the pairing is explicit columns).
    Placeholders '-', '', '0.00' and unparseable values drop, exactly
    like the reference's skip logic (scraper_v2.py:1217-1228).
    """
    n = len(year_value_cols)
    pairs = ", ".join(f"{y}, `{c}`" for y, c in year_value_cols)
    expr = f"stack({n}, {pairs}) as ({year_col}, _raw)"
    out = wide.selectExpr(*id_cols, expr)
    if drop_placeholders:
        out = out.filter(~F.coalesce(F.col("_raw"), F.lit("")).isin("-", "", "0.00"))
    if parse:
        out = out.withColumn(value_col, parse_money(F.col("_raw"))).filter(
            F.col(value_col).isNotNull()
        )
    else:
        out = out.withColumn(value_col, F.col("_raw"))
    return out.drop("_raw")
