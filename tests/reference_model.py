"""Independent pure-Python model of the reference's string semantics.

Used ONLY as a test oracle (property tests compare the Spark column
expressions against this model). Written from the behavioral spec in
SURVEY.md §2.8 (reference: scraper_v2.py:612-866); independent
structure, not a copy.
"""

from __future__ import annotations

import re

PARTNERSHIP_PREFIXES = (
    "ห้างหุ้นส่วนจำกัด",
    "ห้างหุ้นส่วนสามัญนิติบุคคล",
    "ห้างหุ้นส่วนสามัญ",
)

_FILLERS = (
    r"\(ประเทศไทย\)", r"ประเทศไทย", r"\(ไทยแลนด์\)", r"ไทยแลนด์",
    r"\(Thailand\)", r"Thailand", r"\(เอเชีย\)", r"เอเชีย",
    r"\(Asia\)", r"Asia", r"อินเตอร์เนชั่นแนล", r"อินเตอร์เนชันแนล",
    r"กรุ๊ปส์", r"กรุ๊ป", r"โฮลดิ้งส์", r"โฮลดิ้ง",
    r"เอ็นเตอร์ไพรส์", r"เอ็นเตอร์ไพรซ์", r"คอร์ปอเรชั่น", r"คอร์ปอเรชัน",
)


def squeeze(s: str) -> str:
    return " ".join(s.split())


def model_normalize(name: str) -> str:
    s = name.strip()
    for lit in ("บริษัท", "ห้างหุ้นส่วนจำกัด", "ห้างหุ้นส่วนสามัญ"):
        s = s.replace(lit, "").strip()
    return squeeze(s)


def model_core_name(name: str) -> str:
    s = name.strip()
    m = re.search(r"\d+\s+(0\d{12})\s+(.+)", s)
    if m:
        s = m.group(2)
    for p in PARTNERSHIP_PREFIXES:
        if p in s:
            s = s.replace(p, "").strip()
            break
    s = s.replace("บริษัท", "").strip()
    if "จำกัด" in s:
        s = s.split("จำกัด")[0].strip()
    return squeeze(s)


def model_clean_fillers(name: str) -> str:
    s = name
    for pat in _FILLERS:
        s = re.sub(pat, "", s, flags=re.IGNORECASE)
    return squeeze(s)


def model_remove_parens(name: str) -> str:
    s = re.sub(r"\([^)]*\)", "", name)
    s = re.sub(r"（[^）]*）", "", s)
    return squeeze(s)


def model_remove_trailing_numbers(name: str) -> str:
    s = re.sub(r"\(\d+\)", "", name)
    s = re.sub(r"\s+\d+\s*$", "", s)
    return squeeze(s)


def model_jaccard(a: str, b: str) -> float:
    t1, t2 = set(model_core_name(a).split()), set(model_core_name(b).split())
    if not t1 or not t2:
        return 0.0
    u = t1 | t2
    return len(t1 & t2) / len(u) if u else 0.0


def model_search_terms(name: str) -> list[str]:
    terms: list[str] = []

    def add(t: str) -> None:
        if t and t not in terms:
            terms.append(t)

    base = squeeze(name.replace("บริษัท", "").strip())
    if base:
        terms.append(base)
    if "ห้างหุ้นส่วน" in name:
        nwp = base
        for p in PARTNERSHIP_PREFIXES:
            if p in nwp:
                nwp = nwp.replace(p, "").strip()
                break
        add(nwp)
        short = f"ห้างหุ้นส่วน {nwp}"
        if short not in terms:
            terms.append(short)
    elif "(มหาชน)" in base or "มหาชน" in base:
        nsv = base.replace("จำกัด (มหาชน)", "จำกัด(มหาชน)")
        nsv = nsv.replace("จำกัด  (มหาชน)", "จำกัด(มหาชน)")
        if nsv not in terms:
            terms.append(nsv)
        jl = base.split("(มหาชน)")[0].strip().split("มหาชน")[0].strip()
        add(jl)
    core = model_core_name(name)
    add(core)
    for variant in (
        model_clean_fillers(core),
        model_remove_parens(core),
        model_remove_trailing_numbers(core),
    ):
        if variant and variant != core:
            add(variant)
    trim_base = model_remove_parens(core)
    if not (trim_base and trim_base != core):
        trim_base = core
    words = trim_base.split()
    if len(words) > 1:
        for i in range(len(words) - 1, 0, -1):
            add(" ".join(words[:i]))
    return terms
