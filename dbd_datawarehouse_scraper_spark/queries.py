"""Query registry: every SURVEY §2 operator as a (PySpark builder,
DuckDB oracle SQL) pair, exported through ``__spark_entry__.py``.

Conventions for cross-engine hash parity (the driver compares
row-count + schema + order-insensitive value hash):

- every computed column is aliased IDENTICALLY in Spark and SQL;
- sums of doubles go through DECIMAL(38,10) in both engines (exact,
  order-independent) and cast back to double;
- averages are exact-decimal sums divided by counts in double;
- timestamps in outputs are formatted to epoch seconds or date strings;
- top-k / dedup winners always carry a deterministic tiebreaker.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.parsing import parse_money, validate_regnum
from .functions.text_norm import (
    clean_filler_words,
    extract_core_name,
    normalize_company_name,
    remove_parentheses,
    remove_trailing_numbers,
)

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    builder: Builder
    sql: str | None  # None → rows-only check (non-SQL-expressible)


QUERIES: dict[str, QueryDef] = {}


def register(name: str, sql: str | None):
    def deco(fn: Builder) -> Builder:
        QUERIES[name] = QueryDef(fn, sql)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dsum(col: F.Column, scale: int = 6) -> F.Column:
    """Order-independent, cross-engine-exact sum of a double column.

    Each value is quantized to an integer (round(x·10^scale) — the
    double multiply is IEEE-identical in Spark and DuckDB, and rounding
    an integral-valued double is unambiguous), integers sum exactly in
    any order, and one final division restores the scale. A straight
    ``CAST(x AS DECIMAL)`` is NOT portable: Spark rounds the exact
    binary expansion, DuckDB rounds a scaled double, and the last bits
    diverge. Engine-internal aggregates (not oracle-facing) should use
    plain decimal sums instead — no quantization loss and no bigint
    overflow bound."""
    q = F.round(col * F.lit(float(10**scale))).cast("long")
    return F.sum(q).cast("double") / F.lit(float(10**scale))


DSUM = "CAST(SUM(CAST(ROUND(({x}) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6"


# ---------------------------------------------------------------------------
# §2.4 aggregations — flagship pricing summary (TPC-H Q1 shape)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {DSUM.format(x='l_quantity')} AS sum_qty,
           {DSUM.format(x='l_extendedprice')} AS sum_base_price,
           {DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {DSUM.format(x='l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {DSUM.format(x='l_quantity')} / COUNT(*) AS avg_qty,
           {DSUM.format(x='l_extendedprice')} / COUNT(*) AS avg_price,
           {DSUM.format(x='l_discount')} / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            (dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty"),
            (dsum(F.col("l_extendedprice")) / F.count("*")).alias("avg_price"),
            (dsum(F.col("l_discount")) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# §2.1 sources + §2.2 projections/filters
# ---------------------------------------------------------------------------


@register(
    "project_columns",
    "SELECT c_custkey AS custkey, c_name AS company_name, c_mktsegment AS segment FROM customer",
)
def project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("company_name"),
        F.col("c_mktsegment").alias("segment"),
    )


# Thai-decorated names constructed from driver data: every 3rd customer is
# a บริษัท, every 7th a มหาชน, the rest undecorated (filtered out).
_THAI_DECOR = """
    SELECT c_custkey,
           CASE WHEN c_custkey % 3 = 0 THEN 'บริษัท ' || c_name || ' จำกัด'
                WHEN c_custkey % 7 = 0 THEN c_name || ' จำกัด (มหาชน)'
                ELSE c_name END AS company_name
    FROM customer
"""


def _thai_decorated(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(F.lit("บริษัท "), F.col("c_name"), F.lit(" จำกัด")),
        )
        .when(
            F.col("c_custkey") % 7 == 0,
            F.concat(F.col("c_name"), F.lit(" จำกัด (มหาชน)")),
        )
        .otherwise(F.col("c_name"))
        .alias("company_name"),
    )


@register(
    "thai_filter",
    f"""
    WITH decorated AS ({_THAI_DECOR})
    SELECT c_custkey, company_name FROM decorated
    WHERE company_name LIKE '%จำกัด%' OR company_name LIKE '%มหาชน%'
    """,
)
def thai_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _thai_decorated(spark, sf_dir)
    return d.filter(
        F.col("company_name").contains("จำกัด")
        | F.col("company_name").contains("มหาชน")
    )


@register(
    "regnum_validate",
    """
    WITH regs AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 4 = 0 THEN '0' || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')
                    WHEN o_orderkey % 4 = 1 THEN '9' || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')
                    WHEN o_orderkey % 4 = 2 THEN '0' || lpad(CAST(o_orderkey AS VARCHAR), 11, '0')
                    ELSE '' END AS raw_reg
        FROM orders)
    SELECT o_orderkey,
           CASE WHEN regexp_full_match(raw_reg, '0[0-9]{12}') THEN raw_reg END AS registration_number
    FROM regs
    """,
)
def regnum_validate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    raw = (
        F.when(k % 4 == 0, F.concat(F.lit("0"), F.lpad(k.cast("string"), 12, "0")))
        .when(k % 4 == 1, F.concat(F.lit("9"), F.lpad(k.cast("string"), 12, "0")))
        .when(k % 4 == 2, F.concat(F.lit("0"), F.lpad(k.cast("string"), 11, "0")))
        .otherwise(F.lit(""))
    )
    return o.select(
        "o_orderkey", validate_regnum(raw).alias("registration_number")
    )


@register(
    "parse_money",
    f"""
    WITH m AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 11 = 0 THEN '-'
                    WHEN o_orderkey % 13 = 0 THEN ''
                    ELSE CAST(o_custkey AS VARCHAR) || ',' ||
                         lpad(CAST(o_orderkey % 1000 AS VARCHAR), 3, '0') || '.' ||
                         lpad(CAST(o_orderkey % 100 AS VARCHAR), 2, '0') END AS raw_value
        FROM orders)
    SELECT o_orderkey, CAST(replace(raw_value, ',', '') AS DOUBLE) AS value
    FROM m
    WHERE raw_value NOT IN ('-', '', '0.00')
    """,
)
def parse_money_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    raw = (
        F.when(k % 11 == 0, F.lit("-"))
        .when(k % 13 == 0, F.lit(""))
        .otherwise(
            F.concat(
                F.col("o_custkey").cast("string"),
                F.lit(","),
                F.lpad((k % 1000).cast("string"), 3, "0"),
                F.lit("."),
                F.lpad((k % 100).cast("string"), 2, "0"),
            )
        )
    )
    return (
        o.select("o_orderkey", raw.alias("raw_value"))
        .filter(~F.col("raw_value").isin("-", "", "0.00"))
        .select("o_orderkey", parse_money(F.col("raw_value")).alias("value"))
    )


# ---------------------------------------------------------------------------
# §2.8 scalar string layer over Thai-decorated driver names
# ---------------------------------------------------------------------------

_DECORATED_PARTS = """
    SELECT p_partkey,
           'บริษัท ' || p_name ||
           CASE WHEN p_partkey % 5 = 0 THEN ' (ประเทศไทย)' ELSE '' END ||
           CASE WHEN p_partkey % 7 = 0 THEN ' (' || CAST(1990 + p_partkey % 30 AS VARCHAR) || ')' ELSE '' END ||
           ' จำกัด' ||
           CASE WHEN p_partkey % 3 = 0 THEN ' (มหาชน)' ELSE '' END AS company_name
    FROM part
"""


def _decorated_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    return p.select(
        "p_partkey",
        F.concat(
            F.lit("บริษัท "),
            F.col("p_name"),
            F.when(k % 5 == 0, F.lit(" (ประเทศไทย)")).otherwise(F.lit("")),
            F.when(
                k % 7 == 0,
                F.concat(F.lit(" ("), (F.lit(1990) + k % 30).cast("string"), F.lit(")")),
            ).otherwise(F.lit("")),
            F.lit(" จำกัด"),
            F.when(k % 3 == 0, F.lit(" (มหาชน)")).otherwise(F.lit("")),
        ).alias("company_name"),
    )


@register(
    "normalize_name",
    f"""
    WITH d AS ({_DECORATED_PARTS})
    SELECT p_partkey,
           trim(regexp_replace(
               replace(replace(replace(company_name, 'บริษัท', ''),
                       'ห้างหุ้นส่วนจำกัด', ''), 'ห้างหุ้นส่วนสามัญ', ''),
               '\\s+', ' ', 'g')) AS normalized
    FROM d
    """,
)
def normalize_name_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _decorated_parts(spark, sf_dir)
    return d.select(
        "p_partkey", normalize_company_name(F.col("company_name")).alias("normalized")
    )


@register(
    "extract_core_name",
    f"""
    WITH d AS ({_DECORATED_PARTS})
    SELECT p_partkey,
           trim(regexp_replace(
               trim(str_split(trim(replace(company_name, 'บริษัท', '')), 'จำกัด')[1]),
               '\\s+', ' ', 'g')) AS core_name
    FROM d
    """,
)
def extract_core_name_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # decorated parts never contain partnership prefixes or result-line
    # prefixes, so the oracle reduces to the จำกัด split
    d = _decorated_parts(spark, sf_dir)
    return d.select(
        "p_partkey", extract_core_name(F.col("company_name")).alias("core_name")
    )


@register(
    "clean_filler_words",
    f"""
    WITH d AS ({_DECORATED_PARTS})
    SELECT p_partkey,
           trim(regexp_replace(
             regexp_replace(company_name,
               '(?i)(\\(ประเทศไทย\\)|ประเทศไทย|\\(ไทยแลนด์\\)|ไทยแลนด์|\\(Thailand\\)|Thailand|\\(เอเชีย\\)|เอเชีย|\\(Asia\\)|Asia|อินเตอร์เนชั่นแนล|อินเตอร์เนชันแนล|กรุ๊ปส์|กรุ๊ป|โฮลดิ้งส์|โฮลดิ้ง|เอ็นเตอร์ไพรส์|เอ็นเตอร์ไพรซ์|คอร์ปอเรชั่น|คอร์ปอเรชัน)',
               '', 'g'),
             '\\s+', ' ', 'g')) AS cleaned
    FROM d
    """,
)
def clean_filler_words_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _decorated_parts(spark, sf_dir)
    return d.select(
        "p_partkey", clean_filler_words(F.col("company_name")).alias("cleaned")
    )


@register(
    "remove_parentheses",
    f"""
    WITH d AS ({_DECORATED_PARTS})
    SELECT p_partkey,
           trim(regexp_replace(
             regexp_replace(regexp_replace(company_name, '\\([^)]*\\)', '', 'g'),
                            '（[^）]*）', '', 'g'),
             '\\s+', ' ', 'g')) AS no_parens
    FROM d
    """,
)
def remove_parentheses_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _decorated_parts(spark, sf_dir)
    return d.select(
        "p_partkey", remove_parentheses(F.col("company_name")).alias("no_parens")
    )


@register(
    "remove_trailing_numbers",
    f"""
    WITH d AS ({_DECORATED_PARTS})
    SELECT p_partkey,
           trim(regexp_replace(
             regexp_replace(regexp_replace(company_name, '\\(\\d+\\)', '', 'g'),
                            '\\s+\\d+\\s*$', ''),
             '\\s+', ' ', 'g')) AS no_numbers
    FROM d
    """,
)
def remove_trailing_numbers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _decorated_parts(spark, sf_dir)
    return d.select(
        "p_partkey",
        remove_trailing_numbers(F.col("company_name")).alias("no_numbers"),
    )
