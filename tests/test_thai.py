"""Thai dictionary maximal-matching segmenter (functions/thai.py):
DP objective, losslessness, script routing, UDF == pure-Python
parity, and the Thai-aware word count."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.functions.thai import (
    DEFAULT_THAI_WORDS,
    build_lexicon,
    segment_thai,
    thai_segment,
    thai_word_count,
)

# ------------------------------------------------------------- pure core


def test_company_name_segments_to_dictionary_words():
    toks = segment_thai("บริษัทปูนซิเมนต์ไทยจำกัด(มหาชน)")
    assert toks == ["บริษัท", "ปูน", "ซิเมนต์", "ไทย", "จำกัด", "(", "มหาชน", ")"]


def test_longest_match_wins_over_prefix():
    # ห้างหุ้นส่วน is in the lexicon alongside its prefixes ห้าง /
    # หุ้นส่วน / หุ้น — maximal matching must take the long form
    assert segment_thai("ห้างหุ้นส่วนจำกัด")[0] == "ห้างหุ้นส่วน"


def test_oov_run_collapses_to_one_token():
    # no dictionary word inside — one unknown token, not char confetti
    toks = segment_thai("ฆฌฎฏ")
    assert toks == ["ฆฌฎฏ"]


def test_oov_between_words_stays_separate():
    toks = segment_thai("บริษัทฆฌจำกัด")
    assert toks == ["บริษัท", "ฆฌ", "จำกัด"]


def test_mixed_script_boundaries_split():
    assert segment_thai("บริษัทABC123จำกัด") == ["บริษัท", "ABC123", "จำกัด"]
    assert segment_thai("IBMประเทศไทย") == ["IBM", "ประเทศไทย"]


def test_whitespace_separates_and_drops():
    assert segment_thai("บริษัท  ไทย\nจำกัด") == ["บริษัท", "ไทย", "จำกัด"]
    assert segment_thai("") == []
    assert segment_thai(None) == []


def test_coverage_beats_segment_count():
    # การค้า covers all 6 chars (2 segs incl. ไทย); a segmentation
    # using only การ would leave ค้า uncovered — coverage dominates
    assert segment_thai("การค้าไทย") == ["การค้า", "ไทย"]


def test_custom_lexicon_and_validation():
    words = build_lexicon(["ฆฌ"], use_default=True)
    assert segment_thai("บริษัทฆฌจำกัด", words) == ["บริษัท", "ฆฌ", "จำกัด"]
    with pytest.raises(ValueError, match="nonempty Thai"):
        build_lexicon(["abc"])
    with pytest.raises(ValueError, match="nonempty Thai"):
        build_lexicon([""])


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.one_of(
            st.characters(min_codepoint=0x0E01, max_codepoint=0x0E5B),
            st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        ),
        max_size=60,
    )
)
def test_lossless_property(s):
    """Concatenated tokens == input minus whitespace, for any mix of
    Thai and ASCII — segmentation never invents or loses characters."""
    assert "".join(segment_thai(s)) == "".join(s.split())


# ---------------------------------------------------------- spark surface


def test_udf_matches_pure_python(spark):
    rows = [
        (1, "บริษัทเทคโนโลยีสารสนเทศ99จำกัด"),
        (2, "ห้างหุ้นส่วนจำกัดการค้าไทย"),
        (3, "บริษัท ABC จำกัด (มหาชน)"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        r["id"]: r["toks"]
        for r in df.select("id", thai_segment(F.col("name")).alias("toks")).collect()
    }
    for i, name in rows:
        expect = None if name is None else segment_thai(name)
        assert got[i] == expect, (i, got[i], expect)


def test_thai_word_count_vs_whitespace_gate(spark):
    """The motivating defect: whitespace counting reads a spaceless
    Thai sentence as ONE word; the Thai-aware counter sees the real
    words, so min-word quality gates stop rejecting Thai documents."""
    from dbd_datawarehouse_scraper_spark.functions.text_analysis import token_count

    df = spark.createDataFrame(
        [("บริษัทการค้าไทยจำกัดผลิตอาหารและเครื่องดื่ม",)], "text string"
    )
    row = df.select(
        token_count(F.col("text")).alias("ws"),
        thai_word_count(F.col("text")).alias("thai"),
    ).collect()[0]
    assert row["ws"] == 1
    assert row["thai"] >= 7


def test_thai_registered_as_named_token_counter(spark):
    """`--token-counter thai` routes shard budgets / min-word gates
    through the segmenter via the one resolve_token_counter lookup."""
    from dbd_datawarehouse_scraper_spark.functions.text_analysis import (
        resolve_token_counter,
    )

    counter = resolve_token_counter("thai")
    df = spark.createDataFrame([("บริษัทการค้าไทยจำกัด",)], "text string")
    assert df.select(counter(F.col("text")).alias("n")).collect()[0]["n"] == 4


_THAI_DOC = (
    "บริษัทการค้าไทยจำกัดผลิตอาหารและเครื่องดื่มที่มีความสำคัญของประเทศ"
)


def test_funnel_word_counter_keeps_thai(spark):
    """The motivating funnel defect, end to end: with defaults a Thai
    corpus is rejected by ALL THREE stateless gates (lang='und' under
    the fast heuristic, quality floored by the 1-whitespace-word
    length term, n_tokens=1 < min_tokens); word_counter='thai' +
    lang_id_impl='trigram' + keep_langs=('th',) keeps it."""
    from dbd_datawarehouse_scraper_spark.plans.curation import curate_documents

    docs = spark.createDataFrame(
        [(i, _THAI_DOC + str(i)) for i in range(20)], "doc_id long, text string"
    )
    assert curate_documents(docs).count() == 0  # defaults reject Thai
    kept = curate_documents(
        docs,
        keep_langs=("th",),
        lang_id_impl="trigram",
        word_counter="thai",
    )
    rows = kept.collect()
    assert len(rows) == 20
    assert all(r["lang"] == "th" for r in rows)
    assert all(r["n_tokens"] >= 10 for r in rows)  # real words, not 1
    assert all(r["quality"] >= 0.3 for r in rows)


def test_funnel_unknown_word_counter_refuses(spark):
    from dbd_datawarehouse_scraper_spark.plans.curation import curate_documents

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="unknown token counter"):
        curate_documents(docs, word_counter="nope")


def test_gate_report_word_counter(spark):
    """The report must predict the funnel's drops under the same
    counter: tokens/quality gates flip from all-fail to all-pass."""
    from dbd_datawarehouse_scraper_spark.plans.curation import curation_gate_report

    docs = spark.createDataFrame(
        [(i, _THAI_DOC) for i in range(10)], "doc_id long, text string"
    )
    ws = {
        r["gate"]: r["n_fail"]
        for r in curation_gate_report(docs, keep_langs=("th",)).collect()
    }
    th = {
        r["gate"]: r["n_fail"]
        for r in curation_gate_report(
            docs, keep_langs=("th",), lang_id_impl="trigram", word_counter="thai"
        ).collect()
    }
    assert ws["tokens"] == 10 and th["tokens"] == 0
    assert ws["quality"] == 10 and th["quality"] == 0


def test_default_lexicon_is_all_thai():
    from dbd_datawarehouse_scraper_spark.functions.thai import _is_thai

    for w in DEFAULT_THAI_WORDS:
        assert w and all(_is_thai(c) for c in w), w
