"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline: the full hermetic replay of
the reference's E1 lifecycle (ingest → fuzzy entity-match → financial
extraction → unpivot to the long fact table) over companies synthesized
from the sf0.001 ``customer`` table and a deterministic in-memory
registry (no network). ``queries()`` / ``oracle_sql()`` expose the
operator inventory from SURVEY.md §2 with DuckDB oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def _registry_from_customers(spark: SparkSession, sf_dir: str) -> list[tuple[str, str]]:
    """Deterministic fake DBD registry: one Thai-styled company per
    customer (reg = '0' + zero-padded custkey)."""
    rows = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_name")
        .collect()
    )
    return [
        (f"0{r['c_custkey']:012d}", f"บริษัท {r['c_name']} จำกัด") for r in rows
    ]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full scrape pipeline (match + extract + unpivot) on
    sf0.001; returns the 8-column long fact table."""
    from dbd_datawarehouse_scraper_spark.config import load_config
    from dbd_datawarehouse_scraper_spark.plans import scrape_pipeline
    from dbd_datawarehouse_scraper_spark.sources import FakeDbdFetcher

    registry = _registry_from_customers(spark, SF0001)
    conf = load_config(
        overrides={
            "matching": {"similarity_threshold": 0.4, "max_pages": 3},
            "extraction": {
                "income_fields": ["รายได้รวม", "กำไรสุทธิ"],
                "balance_fields": ["สินทรัพย์รวม", "หนี้สินรวม"],
            },
        }
    )

    # input companies: 1/2 exact registry names, 1/4 carrying the reg
    # already, 1/8 perturbed (fuzzy path), rest unknown (not-found path)
    cust = spark.read.parquet(f"{SF0001}/customer.parquet")
    k = F.col("c_custkey")
    companies = cust.select(
        F.when(k % 8 == 3, F.concat(F.lit("บริษัท "), F.col("c_name"), F.lit(" พิเศษ จำกัด")))
        .when(k % 8 == 7, F.concat(F.lit("บริษัท ไม่มีจริง "), k.cast("string"), F.lit(" จำกัด")))
        .otherwise(F.concat(F.lit("บริษัท "), F.col("c_name"), F.lit(" จำกัด")))
        .alias("company_name"),
        F.when(k % 4 == 1, F.concat(F.lit("0"), F.lpad(k.cast("string"), 12, "0"))).alias(
            "registration_number"
        ),
    )

    fact, _not_found = scrape_pipeline(
        companies, lambda: FakeDbdFetcher(registry), conf
    )
    return fact


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from dbd_datawarehouse_scraper_spark.queries import QUERIES

    return {name: q.builder for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    from dbd_datawarehouse_scraper_spark.queries import QUERIES

    return {name: q.sql for name, q in QUERIES.items() if q.sql is not None}
