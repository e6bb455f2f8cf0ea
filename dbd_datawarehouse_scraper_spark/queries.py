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


# ---------------------------------------------------------------------------
# §2.8 generate_search_terms + §2.3 match engine
# ---------------------------------------------------------------------------

_FILLER_SQL = (
    r"(?i)(\(ประเทศไทย\)|ประเทศไทย|\(ไทยแลนด์\)|ไทยแลนด์|\(Thailand\)|Thailand"
    r"|\(เอเชีย\)|เอเชีย|\(Asia\)|Asia|อินเตอร์เนชั่นแนล|อินเตอร์เนชันแนล"
    r"|กรุ๊ปส์|กรุ๊ป|โฮลดิ้งส์|โฮลดิ้ง|เอ็นเตอร์ไพรส์|เอ็นเตอร์ไพรซ์"
    r"|คอร์ปอเรชั่น|คอร์ปอเรชัน)"
)
_SQZ = "trim(regexp_replace({x}, '\\s+', ' ', 'g'))"


# precomputed fragments (f-string expressions can't hold backslashes on 3.11)
_SQL_BASE = _SQZ.format(x="replace(company_name, 'บริษัท', '')")
_SQL_CORE = _SQZ.format(
    x="str_split(trim(replace(company_name, 'บริษัท', '')), 'จำกัด')[1]"
)
_SQL_CLEANED = _SQZ.format(x="regexp_replace(core, '" + _FILLER_SQL + "', '', 'g')")
_SQL_NO_PARENS = _SQZ.format(
    x="regexp_replace(regexp_replace(core, '\\([^)]*\\)', '', 'g'), '（[^）]*）', '', 'g')"
)
_SQL_NO_NUMBERS = _SQZ.format(
    x="regexp_replace(regexp_replace(core, '\\(\\d+\\)', '', 'g'), '\\s+\\d+\\s*$', '')"
)


@register(
    "generate_search_terms",
    f"""
    WITH d AS ({_DECORATED_PARTS}),
    c1 AS (
      SELECT p_partkey,
        {_SQL_BASE} AS base,
        {_SQL_CORE} AS core
      FROM d),
    c2 AS (
      SELECT *, contains(base, 'มหาชน') AS has_public,
        replace(replace(base, 'จำกัด (มหาชน)', 'จำกัด(มหาชน)'),
                'จำกัด  (มหาชน)', 'จำกัด(มหาชน)') AS no_space,
        trim(str_split(trim(str_split(base, '(มหาชน)')[1]), 'มหาชน')[1]) AS just_limited,
        {_SQL_CLEANED} AS cleaned,
        {_SQL_NO_PARENS} AS no_parens,
        {_SQL_NO_NUMBERS} AS no_numbers
      FROM c1),
    c3 AS (
      SELECT *, list_filter(str_split_regex(
        CASE WHEN no_parens != '' AND no_parens != core THEN no_parens ELSE core END,
        '\\s+'), w -> w != '') AS words
      FROM c2),
    terms AS (
      SELECT p_partkey, list_filter(list_concat(
        [base,
         CASE WHEN has_public THEN no_space END,
         CASE WHEN has_public AND just_limited != '' THEN just_limited END,
         CASE WHEN core != '' THEN core END,
         CASE WHEN cleaned != '' AND cleaned != core THEN cleaned END,
         CASE WHEN no_parens != '' AND no_parens != core THEN no_parens END,
         CASE WHEN no_numbers != '' AND no_numbers != core THEN no_numbers END],
        CASE WHEN len(words) > 1
             THEN list_transform(range(len(words) - 1, 0, -1),
                                 i -> array_to_string(words[1:i], ' '))
             ELSE [] END), x -> x IS NOT NULL AND x != '') AS all_terms
      FROM c3),
    exploded AS (
      SELECT p_partkey, unnest(all_terms) AS term,
             generate_subscripts(all_terms, 1) AS pos
      FROM terms),
    dedup AS (
      SELECT p_partkey, term, min(pos) AS first_pos
      FROM exploded GROUP BY 1, 2)
    SELECT p_partkey, term,
           row_number() OVER (PARTITION BY p_partkey ORDER BY first_pos) AS strategy_rank
    FROM dedup
    """,
)
def generate_search_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.search_terms import generate_search_terms

    d = _decorated_parts(spark, sf_dir)
    return d.select(
        "p_partkey",
        F.posexplode(generate_search_terms(F.col("company_name"))).alias(
            "pos", "term"
        ),
    ).select(
        "p_partkey", "term", (F.col("pos") + 1).cast("long").alias("strategy_rank")
    )


# search-result candidate lines built from customers: "<rank> <reg> <display>"
_CAND_LINES = """
    SELECT c_custkey AS cand_key,
           CAST(c_custkey % 90 + 1 AS VARCHAR) || ' ' ||
           '0' || lpad(CAST(c_custkey AS VARCHAR), 12, '0') ||
           ' บริษัท ' || c_name || ' จำกัด' AS line
    FROM customer WHERE c_custkey % 2 = 0
"""


def _cand_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 2 == 0)
    return c.select(
        F.col("c_custkey").alias("cand_key"),
        F.concat(
            (F.col("c_custkey") % 90 + 1).cast("string"),
            F.lit(" 0"),
            F.lpad(F.col("c_custkey").cast("string"), 12, "0"),
            F.lit(" บริษัท "),
            F.col("c_name"),
            F.lit(" จำกัด"),
        ).alias("line"),
    )


@register(
    "candidate_row_predicate",
    f"""
    WITH cand AS ({_CAND_LINES}),
    noisy AS (
      SELECT cand_key, line FROM cand
      UNION ALL
      SELECT c_custkey AS cand_key, 'หน้า 1 / 42' AS line FROM customer WHERE c_custkey % 50 = 0
      UNION ALL
      SELECT c_custkey AS cand_key, CAST(c_custkey AS VARCHAR) || ' no reg here จำกัด' AS line
      FROM customer WHERE c_custkey % 51 = 0)
    SELECT cand_key, line FROM noisy
    WHERE regexp_matches(line, '0[0-9]{{12}}') AND contains(line, 'จำกัด')
    """,
)
def candidate_row_predicate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.filters import candidate_row_filter

    cand = _cand_lines(spark, sf_dir)
    c = t(spark, sf_dir, "customer")
    noise1 = c.filter(F.col("c_custkey") % 50 == 0).select(
        F.col("c_custkey").alias("cand_key"), F.lit("หน้า 1 / 42").alias("line")
    )
    noise2 = c.filter(F.col("c_custkey") % 51 == 0).select(
        F.col("c_custkey").alias("cand_key"),
        F.concat(F.col("c_custkey").cast("string"), F.lit(" no reg here จำกัด")).alias(
            "line"
        ),
    )
    return candidate_row_filter(cand.unionByName(noise1).unionByName(noise2))


_SQL_CORE_OF_LINE = (
    "trim(regexp_replace(str_split(trim(replace("
    "regexp_extract(line, '\\d+\\s+(0\\d{{12}})\\s+(.+)', 2),"
    "'บริษัท', '')), 'จำกัด')[1], '\\s+', ' ', 'g'))"
)


@register(
    "exact_core_join",
    f"""
    WITH targets AS (
      SELECT c_custkey, 'บริษัท ' || c_name || ' จำกัด' AS company_name, c_name AS tcore
      FROM customer),
    cand AS (
      SELECT cand_key, line, {_SQL_CORE_OF_LINE.format()} AS ccore
      FROM ({_CAND_LINES}))
    SELECT t.c_custkey, t.company_name, c.cand_key,
           regexp_extract(c.line, '(0\\d{{12}})', 1) AS registration_number
    FROM targets t JOIN cand c ON t.tcore = c.ccore
    """,
)
def exact_core_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.parsing import extract_regnum
    from .operators.joins import exact_core_join

    c = t(spark, sf_dir, "customer")
    targets = c.select(
        "c_custkey",
        F.concat(F.lit("บริษัท "), F.col("c_name"), F.lit(" จำกัด")).alias(
            "company_name"
        ),
    )
    cand = _cand_lines(spark, sf_dir)
    joined = exact_core_join(
        targets, cand, target_name="company_name", cand_name="line",
        broadcast_candidates=True,
    )
    return joined.select(
        "c_custkey",
        "company_name",
        "cand_key",
        extract_regnum(F.col("line")).alias("registration_number"),
    )


@register(
    "strategy_ranked_first_match",
    """
    WITH matches AS (
      SELECT CAST(o_custkey AS VARCHAR) AS company_name,
             CAST(o_orderkey % 5 + 1 AS INT) AS strategy_rank,
             o_orderkey AS candidate
      FROM orders),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY company_name ORDER BY strategy_rank, candidate) AS rn
      FROM matches)
    SELECT company_name, strategy_rank, candidate FROM ranked WHERE rn = 1
    """,
)
def strategy_ranked_first_match_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.joins import strategy_ranked_first_match

    o = t(spark, sf_dir, "orders")
    matches = o.select(
        F.col("o_custkey").cast("string").alias("company_name"),
        (F.col("o_orderkey") % 5 + 1).cast("int").alias("strategy_rank"),
        F.col("o_orderkey").alias("candidate"),
    )
    return strategy_ranked_first_match(matches, tiebreak_cols=("candidate",))


@register(
    "similarity_fallback_join",
    f"""
    WITH targets AS (
      SELECT min(p_partkey) AS p_partkey,
             'บริษัท ' || p_name || ' พิเศษ จำกัด' AS company_name,
             p_name || ' พิเศษ' AS tcore
      FROM part WHERE p_partkey % 3 = 1
      GROUP BY p_name),
    cand AS (
      SELECT 'บริษัท ' || p_name || ' จำกัด' AS cand_text, p_name AS ccore
      FROM part),
    scored AS (
      SELECT t.p_partkey, t.company_name, c.cand_text,
             list_distinct(list_filter(str_split_regex(t.tcore, '\\s+'), w -> w != '')) AS ta,
             list_distinct(list_filter(str_split_regex(c.ccore, '\\s+'), w -> w != '')) AS ca
      FROM targets t JOIN cand c
        ON str_split_regex(t.tcore, '\\s+')[1] = str_split_regex(c.ccore, '\\s+')[1]),
    simmed AS (
      SELECT p_partkey, company_name, cand_text,
             CASE WHEN len(ta) = 0 OR len(ca) = 0 THEN 0.0
                  ELSE CAST(len(list_intersect(ta, ca)) AS DOUBLE) /
                       CAST(len(ta) + len(ca) - len(list_intersect(ta, ca)) AS DOUBLE)
             END AS sim
      FROM scored),
    best AS (
      SELECT *, row_number() OVER (
        PARTITION BY company_name ORDER BY sim DESC, cand_text) AS rn
      FROM simmed)
    SELECT p_partkey, company_name, cand_text, sim
    FROM best WHERE rn = 1 AND sim >= 0.5
    """,
)
def similarity_fallback_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.joins import similarity_fallback_join

    p = t(spark, sf_dir, "part")
    targets = (
        p.filter(F.col("p_partkey") % 3 == 1)
        .groupBy("p_name")
        .agg(F.min("p_partkey").alias("p_partkey"))
        .select(
            "p_partkey",
            F.concat(F.lit("บริษัท "), F.col("p_name"), F.lit(" พิเศษ จำกัด")).alias(
                "company_name"
            ),
        )
    )
    cand = p.select(
        F.concat(F.lit("บริษัท "), F.col("p_name"), F.lit(" จำกัด")).alias("cand_text")
    )
    out = similarity_fallback_join(
        targets, cand, threshold=0.5, tiebreak_cols=("cand_text",)
    )
    return out.select("p_partkey", "company_name", "cand_text", "sim")


@register(
    "anti_join_not_found",
    """
    SELECT c_custkey, c_name, 'No search results' AS reason
    FROM customer WHERE NOT EXISTS (
      SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderkey % 4 = 0)
    """,
)
def anti_join_not_found_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # anti-join against a filtered match set so the reject channel is
    # non-empty at every SF (all customers have *some* order)
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 4 == 0)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.join(o, "c_custkey", "left_anti").withColumn(
        "reason", F.lit("No search results")
    )


@register(
    "semi_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def semi_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_semi")


@register(
    "existing_reg_split",
    """
    WITH companies AS (
      SELECT c_custkey, c_name AS company_name,
             CASE WHEN c_custkey % 4 = 1
                  THEN '0' || lpad(CAST(c_custkey AS VARCHAR), 12, '0') END AS registration_number
      FROM customer)
    SELECT c_custkey, company_name, registration_number,
           CASE WHEN registration_number IS NOT NULL THEN 'existing' ELSE 'needs_search' END AS path
    FROM companies
    """,
)
def existing_reg_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.joins import existing_reg_split

    c = t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    companies = c.select(
        "c_custkey",
        F.col("c_name").alias("company_name"),
        F.when(k % 4 == 1, F.concat(F.lit("0"), F.lpad(k.cast("string"), 12, "0"))).alias(
            "registration_number"
        ),
    )
    has, needs = existing_reg_split(companies)
    return has.withColumn("path", F.lit("existing")).unionByName(
        needs.withColumn("path", F.lit("needs_search"))
    )


@register(
    "broadcast_dim_join",
    f"""
    SELECT r_name AS region, n_name AS nation,
           {DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(DISTINCT o_orderkey) AS n_orders
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def broadcast_dim_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            dsum(rev).alias("revenue"),
            F.count_distinct(F.col("o_orderkey")).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations / dedup, §2.5 windows, §2.6 sorts/limits, §2.7 set ops
# ---------------------------------------------------------------------------


@register(
    "dedup_prefer_reg",
    """
    WITH companies AS (
      SELECT c_name AS company_name,
             CASE WHEN o_orderkey % 3 = 0
                  THEN '0' || lpad(CAST(o_orderkey AS VARCHAR), 12, '0') END AS registration_number
      FROM orders JOIN customer ON o_custkey = c_custkey)
    SELECT company_name, max(registration_number) AS registration_number
    FROM companies GROUP BY company_name
    """,
)
def dedup_prefer_reg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import dedup_prefer_reg

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    companies = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_name").alias("company_name"),
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.concat(F.lit("0"), F.lpad(F.col("o_orderkey").cast("string"), 12, "0")),
        ).alias("registration_number"),
    )
    return dedup_prefer_reg(companies)


@register(
    "exact_dedup",
    """
    SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text
    """,
)
def exact_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import exact_dedup

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    return exact_dedup(d, ["text"], "doc_id")


@register(
    "count_loaded",
    """
    WITH companies AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 4 = 1
                  THEN '0' || lpad(CAST(c_custkey AS VARCHAR), 12, '0') END AS reg
      FROM customer)
    SELECT COUNT(*) AS n_companies,
           COUNT(reg) AS n_with_reg
    FROM companies
    """,
)
def count_loaded_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    companies = c.select(
        "c_custkey",
        F.when(k % 4 == 1, F.concat(F.lit("0"), F.lpad(k.cast("string"), 12, "0"))).alias("reg"),
    )
    return companies.agg(
        F.count("*").alias("n_companies"), F.count("reg").alias("n_with_reg")
    )


@register(
    "rollup_aggregate",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {DSUM.format(x='o_totalprice')} AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_aggregate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"), dsum(F.col("o_totalprice")).alias("total")
    )


@register(
    "cube_aggregate",
    f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {DSUM.format(x='l_quantity')} AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_aggregate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum(F.col("l_quantity")).alias("qty")
    )


@register(
    "count_distinct_agg",
    """
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def count_distinct_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@register(
    "top1_by_similarity",
    """
    WITH scored AS (
      SELECT o_custkey, o_orderkey,
             CAST(o_orderkey % 100 AS DOUBLE) / 100 AS sim,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(o_orderkey % 100 AS DOUBLE) / 100 DESC, o_orderkey) AS rn
      FROM orders)
    SELECT o_custkey, o_orderkey, sim FROM scored WHERE rn = 1
    """,
)
def top1_by_similarity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.windows import top1_per_group

    o = t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        ((F.col("o_orderkey") % 100).cast("double") / 100).alias("sim"),
    )
    return top1_per_group(
        o, ["o_custkey"], [F.col("sim").desc(), F.col("o_orderkey").asc()]
    )


@register(
    "topk_per_group",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM ranked WHERE rn <= 3
    """,
)
def topk_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.windows import topk_per_group

    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return topk_per_group(
        o,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
        keep_rank=True,
    ).withColumn("rn", F.col("rn").cast("long"))


@register(
    "window_lag_lead_rank",
    """
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_totalprice,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           rank() OVER w AS rk,
           dense_rank() OVER w AS drk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead_rank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.rank().over(w).cast("long").alias("rk"),
        F.dense_rank().over(w).cast("long").alias("drk"),
    )


@register(
    "running_window_frame",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(ROUND(l_quantity * 1e6) AS BIGINT)) OVER (
             PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e6
             AS running_qty
    FROM lineitem
    """,
)
def running_window_frame_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    q = F.round(F.col("l_quantity") * 1e6).cast("long")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.sum(q).over(w).cast("double") / 1e6).alias("running_qty"),
    )


@register(
    "sort_limit",
    """
    SELECT p_partkey, p_name, p_retailprice FROM part
    ORDER BY p_retailprice DESC, p_partkey LIMIT 10
    """,
)
def sort_limit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return (
        p.select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.col("p_retailprice").desc(), F.col("p_partkey").asc())
        .limit(10)
    )


@register(
    "start_offset",
    """
    WITH numbered AS (
      SELECT o_orderkey, o_custkey,
             row_number() OVER (ORDER BY o_orderkey) AS rn
      FROM orders)
    SELECT o_orderkey, o_custkey FROM numbered WHERE rn > 100 AND rn <= 200
    """,
)
def start_offset_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # resume-cursor semantics (scraper_v2.py:1746); the scalable batch form
    # is an anti-join against already-written keys — this is the exact one
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    w = Window.orderBy("o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 100) & (F.col("rn") <= 200))
        .drop("rn")
    )


@register(
    "union_batches",
    """
    WITH batch1 AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 2 = 0),
         batch2 AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 2 = 1)
    SELECT c_mktsegment, COUNT(*) AS n
    FROM (SELECT * FROM batch1 UNION ALL SELECT * FROM batch2)
    GROUP BY c_mktsegment
    """,
)
def union_batches_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    b1 = c.filter(F.col("c_custkey") % 2 == 0)
    b2 = c.filter(F.col("c_custkey") % 2 == 1)
    return b1.unionByName(b2).groupBy("c_mktsegment").agg(F.count("*").alias("n"))


@register(
    "intersect_except",
    """
    WITH with_orders AS (SELECT DISTINCT o_custkey AS k FROM orders),
         all_cust AS (SELECT c_custkey AS k FROM customer)
    SELECT k, 'both' AS src FROM (SELECT k FROM all_cust INTERSECT SELECT k FROM with_orders)
    UNION ALL
    SELECT k, 'customer_only' AS src FROM (SELECT k FROM all_cust EXCEPT SELECT k FROM with_orders)
    """,
)
def intersect_except_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k")).distinct()
    c = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    both = c.intersect(o).withColumn("src", F.lit("both"))
    only = c.exceptAll(o).withColumn("src", F.lit("customer_only"))
    return both.unionByName(only)


@register(
    "token_set_ops",
    """
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           len(list_intersect(
             list_distinct(str_split_regex(a.p_name, '\\s+')),
             list_distinct(str_split_regex(b.p_name, '\\s+')))) AS n_common,
           len(list_distinct(list_concat(
             list_distinct(str_split_regex(a.p_name, '\\s+')),
             list_distinct(str_split_regex(b.p_name, '\\s+'))))) AS n_total
    FROM part a JOIN part b
      ON a.p_size = b.p_size AND b.p_partkey = a.p_partkey + 1
    """,
)
def token_set_ops_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.similarity import tokenize_ws

    p = t(spark, sf_dir, "part")
    a = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_size").alias("size_a"),
        tokenize_ws(F.col("p_name")).alias("ta"),
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_size").alias("size_b"),
        tokenize_ws(F.col("p_name")).alias("tb"),
    )
    return (
        a.join(b, (a.size_a == b.size_b) & (b.key_b == a.key_a + 1))
        .select(
            "key_a",
            "key_b",
            F.size(F.array_intersect("ta", "tb")).cast("long").alias("n_common"),
            F.size(F.array_union("ta", "tb")).cast("long").alias("n_total"),
        )
    )


@register(
    "token_jaccard",
    """
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           CASE WHEN len(list_distinct(list_filter(str_split_regex(a.p_name, '\\s+'), w -> w != ''))) = 0
                  OR len(list_distinct(list_filter(str_split_regex(b.p_name, '\\s+'), w -> w != ''))) = 0
                THEN 0.0
                ELSE CAST(len(list_intersect(
                       list_distinct(list_filter(str_split_regex(a.p_name, '\\s+'), w -> w != '')),
                       list_distinct(list_filter(str_split_regex(b.p_name, '\\s+'), w -> w != '')))) AS DOUBLE)
                   / CAST(len(list_distinct(list_concat(
                       list_distinct(list_filter(str_split_regex(a.p_name, '\\s+'), w -> w != '')),
                       list_distinct(list_filter(str_split_regex(b.p_name, '\\s+'), w -> w != ''))))) AS DOUBLE)
           END AS jaccard
    FROM part a JOIN part b
      ON a.p_size = b.p_size AND b.p_partkey = a.p_partkey + 1
    """,
)
def token_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.similarity import token_jaccard, tokenize_ws

    p = t(spark, sf_dir, "part")
    a = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_size").alias("size_a"),
        tokenize_ws(F.col("p_name")).alias("ta"),
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_size").alias("size_b"),
        tokenize_ws(F.col("p_name")).alias("tb"),
    )
    return (
        a.join(b, (a.size_a == b.size_b) & (b.key_b == a.key_a + 1))
        .select(
            "key_a", "key_b", token_jaccard(F.col("ta"), F.col("tb")).alias("jaccard")
        )
    )


# ---------------------------------------------------------------------------
# §2.8 / E3 unpivot + field/year filters
# ---------------------------------------------------------------------------


@register(
    "unpivot_lineitem",
    """
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    """,
)
def unpivot_lineitem_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice, "
        "'discount', l_discount, 'tax', l_tax) AS (measure, value)",
    )


_FINANCIAL_WIDE = """
    SELECT '0' || lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS registration_number,
           CASE WHEN o_orderkey % 2 = 0 THEN 'งบกำไรขาดทุน' ELSE 'งบแสดงฐานะการเงิน' END AS table_type,
           CASE o_orderkey % 3 WHEN 0 THEN 'รายได้รวม' WHEN 1 THEN 'กำไรสุทธิ' ELSE 'สินทรัพย์รวม' END AS field_name,
           CASE WHEN o_orderkey % 11 = 0 THEN '-'
                ELSE CAST(o_custkey AS VARCHAR) || ',' || lpad(CAST(o_orderkey % 1000 AS VARCHAR), 3, '0') || '.50' END AS y2566,
           CASE WHEN o_orderkey % 7 = 0 THEN '0.00'
                ELSE CAST(o_custkey % 500 AS VARCHAR) || '.25' END AS y2565,
           CASE WHEN o_orderkey % 5 = 0 THEN ''
                ELSE CAST(o_orderkey % 9000 AS VARCHAR) || '.75' END AS y2564
    FROM orders
"""


def _financial_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        F.concat(F.lit("0"), F.lpad(k.cast("string"), 12, "0")).alias("registration_number"),
        F.when(k % 2 == 0, F.lit("งบกำไรขาดทุน")).otherwise(F.lit("งบแสดงฐานะการเงิน")).alias("table_type"),
        F.when(k % 3 == 0, F.lit("รายได้รวม"))
        .when(k % 3 == 1, F.lit("กำไรสุทธิ"))
        .otherwise(F.lit("สินทรัพย์รวม"))
        .alias("field_name"),
        F.when(k % 11 == 0, F.lit("-"))
        .otherwise(
            F.concat(
                F.col("o_custkey").cast("string"), F.lit(","),
                F.lpad((k % 1000).cast("string"), 3, "0"), F.lit(".50"),
            )
        )
        .alias("y2566"),
        F.when(k % 7 == 0, F.lit("0.00"))
        .otherwise(F.concat((F.col("o_custkey") % 500).cast("string"), F.lit(".25")))
        .alias("y2565"),
        F.when(k % 5 == 0, F.lit(""))
        .otherwise(F.concat((k % 9000).cast("string"), F.lit(".75")))
        .alias("y2564"),
    )


@register(
    "financial_unpivot",
    f"""
    WITH wide AS ({_FINANCIAL_WIDE}),
    long AS (
      SELECT registration_number, table_type, field_name, 2566 AS year, y2566 AS raw FROM wide
      UNION ALL
      SELECT registration_number, table_type, field_name, 2565, y2565 FROM wide
      UNION ALL
      SELECT registration_number, table_type, field_name, 2564, y2564 FROM wide)
    SELECT registration_number, table_type, field_name, year,
           CAST(replace(raw, ',', '') AS DOUBLE) AS value
    FROM long
    WHERE raw NOT IN ('-', '', '0.00')
    """,
)
def financial_unpivot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.unpivot import unpivot_financials

    wide = _financial_wide(spark, sf_dir)
    return unpivot_financials(
        wide,
        id_cols=["registration_number", "table_type", "field_name"],
        year_value_cols=[(2566, "y2566"), (2565, "y2565"), (2564, "y2564")],
    ).select("registration_number", "table_type", "field_name", "year", "value")


@register(
    "field_year_filter",
    f"""
    WITH wide AS ({_FINANCIAL_WIDE}),
    long AS (
      SELECT registration_number, table_type, field_name, 2566 AS year, y2566 AS raw FROM wide
      UNION ALL
      SELECT registration_number, table_type, field_name, 2565, y2565 FROM wide
      UNION ALL
      SELECT registration_number, table_type, field_name, 2564, y2564 FROM wide)
    SELECT registration_number, table_type, field_name, year,
           CAST(replace(raw, ',', '') AS DOUBLE) AS value
    FROM long
    WHERE raw NOT IN ('-', '', '0.00')
      AND field_name IN ('รายได้รวม', 'กำไรสุทธิ')
      AND year IN (2566, 2565)
    """,
)
def field_year_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.filters import field_filter, year_filter
    from .operators.unpivot import unpivot_financials

    wide = _financial_wide(spark, sf_dir)
    long = unpivot_financials(
        wide,
        id_cols=["registration_number", "table_type", "field_name"],
        year_value_cols=[(2566, "y2566"), (2565, "y2565"), (2564, "y2564")],
    )
    out = field_filter(long, ["รายได้รวม", "กำไรสุทธิ"])
    out = year_filter(out, [2566, 2565])
    return out.select(
        "registration_number", "table_type", "field_name", "year", "value"
    )
