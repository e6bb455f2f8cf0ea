"""Property tests: Spark column expressions vs the pure-Python model of
the reference's string semantics (tests/reference_model.py)."""

import pytest
from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.functions import (
    clean_filler_words,
    extract_core_name,
    generate_search_terms,
    normalize_company_name,
    remove_parentheses,
    remove_trailing_numbers,
)
from dbd_datawarehouse_scraper_spark.functions.similarity import name_similarity

from .reference_model import (
    model_clean_fillers,
    model_core_name,
    model_jaccard,
    model_normalize,
    model_remove_parens,
    model_remove_trailing_numbers,
    model_search_terms,
)

NAMES = [
    "บริษัท ซีพี ออลล์ จำกัด (มหาชน)",
    "บริษัท ทดสอบ (ประเทศไทย) จำกัด",
    "ห้างหุ้นส่วนจำกัด รุ่งเรือง การค้า",
    "ห้างหุ้นส่วนสามัญ สมชาย และเพื่อน",
    "ห้างหุ้นส่วนสามัญนิติบุคคล ทองดี",
    "บริษัท เอ บี ซี โฮลดิ้งส์ จำกัด",
    "บริษัท น้ำตาล 2020 จำกัด",
    "บริษัท กรุ๊ป อินเตอร์เนชั่นแนล (Thailand) จำกัด",
    "123 0105536041711 บริษัท ทดสอบ จำกัด กรุงเทพ",
    "45 0994000158441 เงินทุน หลักทรัพย์ จำกัด (มหาชน)",
    "เฉยๆ ไม่มี คำนำหน้า",
    "บริษัท เว้น  วรรค   เยอะ จำกัด",
    "บริษัท (วงเล็บ) จำกัด",
    "Plain English Co",
    "",
    "   ",
    "บริษัท",
    "จำกัด",
    "บริษัท เสริมสุข จำกัด  (มหาชน)",
    "บริษัท ไทย เบฟเวอเรจ จำกัด (มหาชน) 2014",
    "ห้างหุ้นส่วนจำกัด",
    "บริษัท เดี่ยว จำกัด",
]


@pytest.fixture(scope="module")
def results(spark):
    df = spark.createDataFrame([(n,) for n in NAMES], ["name"])
    out = df.select(
        "name",
        normalize_company_name(F.col("name")).alias("norm"),
        extract_core_name(F.col("name")).alias("core"),
        clean_filler_words(F.col("name")).alias("fillers"),
        remove_parentheses(F.col("name")).alias("parens"),
        remove_trailing_numbers(F.col("name")).alias("nums"),
        generate_search_terms(F.col("name")).alias("terms"),
    ).collect()
    return {r["name"]: r for r in out}


def test_normalize(results):
    for n in NAMES:
        assert results[n]["norm"] == model_normalize(n), n


def test_core_name(results):
    for n in NAMES:
        assert results[n]["core"] == model_core_name(n), n


def test_fillers(results):
    for n in NAMES:
        assert results[n]["fillers"] == model_clean_fillers(n), n


def test_parens(results):
    for n in NAMES:
        assert results[n]["parens"] == model_remove_parens(n), n


def test_trailing_numbers(results):
    for n in NAMES:
        assert results[n]["nums"] == model_remove_trailing_numbers(n), n


def test_search_terms(results):
    for n in NAMES:
        assert results[n]["terms"] == model_search_terms(n), n


def test_similarity(spark):
    pairs = [(a, b) for a in NAMES[:10] for b in NAMES[:10]]
    df = spark.createDataFrame(pairs, ["a", "b"])
    rows = df.select("a", "b", name_similarity(F.col("a"), F.col("b")).alias("s")).collect()
    for r in rows:
        assert r["s"] == pytest.approx(model_jaccard(r["a"], r["b"])), (r["a"], r["b"])
