"""Seeded fuzz: the Spark column expressions must equal the pure-Python
reference model on randomly composed Thai-style company names —
including pathological whitespace, nested parens, partnership prefixes,
fillers, and result-line framing."""

import random

from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.functions import (
    clean_filler_words,
    extract_core_name,
    generate_search_terms,
    normalize_company_name,
    remove_parentheses,
    remove_trailing_numbers,
)

from .reference_model import (
    model_clean_fillers,
    model_core_name,
    model_normalize,
    model_remove_parens,
    model_remove_trailing_numbers,
    model_search_terms,
)

PREFIXES = ["", "บริษัท ", "บริษัท", "ห้างหุ้นส่วนจำกัด ", "ห้างหุ้นส่วนสามัญ ",
            "ห้างหุ้นส่วนสามัญนิติบุคคล ", "123 0105536041711 บริษัท "]
WORDS = ["ทดสอบ", "การค้า", "รุ่งเรือง", "ไทย", "สยาม", "เจริญ", "Alpha", "Beta",
         "กรุ๊ป", "โฮลดิ้งส์", "อินเตอร์เนชั่นแนล", "น้ำตาล"]
MIDS = ["", " (ประเทศไทย)", " (Thailand)", " (เอเชีย)", " (1999)", " (สาขา ใหญ่)",
        "（เต็ม）"]
SUFFIXES = ["", " จำกัด", " จำกัด (มหาชน)", " จำกัด  (มหาชน)", " จำกัด(มหาชน)",
            " มหาชน", " 2020", " 42"]
SPACERS = [" ", "  ", "\t", "   "]


def gen_name(rng: random.Random) -> str:
    parts = [rng.choice(PREFIXES)]
    for _ in range(rng.randint(1, 4)):
        parts.append(rng.choice(WORDS))
        parts.append(rng.choice(SPACERS))
    name = "".join(parts).strip() + rng.choice(MIDS) + rng.choice(SUFFIXES)
    if rng.random() < 0.1:
        name = rng.choice(SPACERS) + name + rng.choice(SPACERS)
    return name


def test_fuzz_string_layer_vs_model(spark):
    rng = random.Random(42)
    names = [gen_name(rng) for _ in range(400)] + ["", " ", "จำกัด", "บริษัท"]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    rows = df.select(
        "name",
        normalize_company_name(F.col("name")).alias("norm"),
        extract_core_name(F.col("name")).alias("core"),
        clean_filler_words(F.col("name")).alias("fill"),
        remove_parentheses(F.col("name")).alias("par"),
        remove_trailing_numbers(F.col("name")).alias("num"),
        generate_search_terms(F.col("name")).alias("terms"),
    ).collect()
    assert len(rows) == len(names)
    for r in rows:
        n = r["name"]
        assert r["norm"] == model_normalize(n), repr(n)
        assert r["core"] == model_core_name(n), repr(n)
        assert r["fill"] == model_clean_fillers(n), repr(n)
        assert r["par"] == model_remove_parens(n), repr(n)
        assert r["num"] == model_remove_trailing_numbers(n), repr(n)
        assert r["terms"] == model_search_terms(n), repr(n)


def test_fuzz_staged_form_equals_expression_form(spark):
    """add_search_terms (the staged pipeline form) must produce exactly
    the arrays of the single-expression form."""
    from dbd_datawarehouse_scraper_spark.functions.search_terms import (
        add_search_terms,
    )

    rng = random.Random(7)
    names = [gen_name(rng) for _ in range(200)]
    df = spark.createDataFrame([(n,) for n in names], ["company_name"])
    expr_form = {
        r["company_name"]: r["t"]
        for r in df.select(
            "company_name", generate_search_terms(F.col("company_name")).alias("t")
        ).collect()
    }
    staged_form = {
        r["company_name"]: r["terms"] for r in add_search_terms(df).collect()
    }
    assert expr_form == staged_form


# Rows where Java and Python regex semantics diverge unless the Arrow
# kernel reproduces Java's exactly: Unicode digits (Python \d matches
# ๑๒๓, Java's doesn't), non-ASCII whitespace (NBSP/thin space are
# Python \s but not Java \s), Java-dot exclusions (\r, U+0085, U+2028),
# and trim-vs-strip differences (Spark trim strips U+0020 only).
ADVERSARIAL_NAMES = [
    "",
    " ",
    " \u0e1a\u0e23\u0e34\u0e29\u0e31\u0e17 \u0e17\u0e14\u0e2a\u0e2d\u0e1a \u0e08\u0e33\u0e01\u0e31\u0e14 ",
    # Thai digits: Python \d matches them, Java \d must not
    "\u0e51\u0e52\u0e53 0105536041711 \u0e1a\u0e23\u0e34\u0e29\u0e31\u0e17 \u0e44\u0e17\u0e22 \u0e08\u0e33\u0e01\u0e31\u0e14",
    # \r, NEL, LS all end Java's dot; Python's dot only stops at \n
    "42 0105536041711 \u0e0a\u0e37\u0e48\u0e2d\r\u0e1a\u0e23\u0e23\u0e17\u0e31\u0e14 \u0e08\u0e33\u0e01\u0e31\u0e14",
    "42 0105536041711 \u0e0a\u0e37\u0e48\u0e2d\u0085\u0e16\u0e31\u0e14\u0e44\u0e1b \u0e08\u0e33\u0e01\u0e31\u0e14",
    "42 0105536041711 \u0e0a\u0e37\u0e48\u0e2d\u2028\u0e41\u0e22\u0e01 \u0e08\u0e33\u0e01\u0e31\u0e14",
    # NBSP / thin space: Python \s matches them, Java \s must not
    "42\u00a00105536041711\u00a0\u0e17\u0e14\u0e2a\u0e2d\u0e1a \u0e08\u0e33\u0e01\u0e31\u0e14",
    "\u0e1a\u0e23\u0e34\u0e29\u0e31\u0e17\u2009\u0e40\u0e27\u0e49\u0e19\u0e27\u0e23\u0e23\u0e04 \u0e08\u0e33\u0e01\u0e31\u0e14",
    # tabs survive Spark trim (space-only) but collapse via \s+
    "\t\u0e1a\u0e23\u0e34\u0e29\u0e31\u0e17 \u0e41\u0e17\u0e47\u0e1a \u0e08\u0e33\u0e01\u0e31\u0e14\t",
    "7 0105536041711 ",
    "123 0105536041711 x",
]


def test_fuzz_staged_core_name_equals_expression_form(spark):
    """add_core_name (the Arrow-kernel pipeline form) must equal the
    single-expression extract_core_name byte-for-byte — including on
    rows built to expose Java-vs-Python regex divergence."""
    from dbd_datawarehouse_scraper_spark.functions.text_norm import add_core_name

    rng = random.Random(11)
    names = [gen_name(rng) for _ in range(300)] + ADVERSARIAL_NAMES
    names = list(dict.fromkeys(names))
    df = spark.createDataFrame([(n,) for n in names], ["company_name"])
    expr_form = {
        r["company_name"]: r["c"]
        for r in df.select(
            "company_name", extract_core_name(F.col("company_name")).alias("c")
        ).collect()
    }
    staged_form = {
        r["company_name"]: r["_core"]
        for r in add_core_name(df, "company_name").collect()
    }
    assert expr_form == staged_form


def test_fuzz_core_name_key_is_chain_plus_nullif(spark):
    """extract_core_name_key (the round-4 equi-join key form) must
    equal NULLIF(extract_core_name(x), '') on every row — including
    the Java-vs-Python regex adversarial set. The key form re-derives
    the chain inside its own _once bindings, so this pins the two
    constructions against drift."""
    from dbd_datawarehouse_scraper_spark.functions.text_norm import (
        extract_core_name_key,
    )

    rng = random.Random(13)
    names = [gen_name(rng) for _ in range(300)] + ADVERSARIAL_NAMES
    names = list(dict.fromkeys(names))
    df = spark.createDataFrame([(n,) for n in names], ["company_name"])
    rows = df.select(
        "company_name",
        extract_core_name_key(F.col("company_name")).alias("k"),
        F.nullif(extract_core_name(F.col("company_name")), F.lit("")).alias("e"),
    ).collect()
    for r in rows:
        assert r["k"] == r["e"], repr(r["company_name"])


def test_pii_cross_engine_fuzz(spark):
    """Seeded fuzz: PII counts AND redacted text must agree between
    Spark (Java regex) and DuckDB (RE2) on randomly composed strings
    mixing emails, phones, IPs, near-miss fragments, Unicode, and
    pathological punctuation — the single-branch pattern family's
    engine-equivalence claim, stress-tested."""
    import duckdb
    import pandas as pd

    from dbd_datawarehouse_scraper_spark.functions.pii import (
        counts_sql,
        pii_counts,
        redact_pii,
        redact_sql,
    )

    rng = random.Random(20260814)
    atoms = [
        "john.doe@example.com", "a+b@c.de", "x@y",  # last is not an email
        "+1 (555) 123-4567", "0812 345 678", "12345", "123-45",
        "192.168.0.1", "999.999.999.999", "1.2.3.4.5", "1.2.3",
        "user{n}@host{n}.org", "call {n}{n}{n}-{n}{n}{n}-{n}{n}{n}{n}",
        "ไทย", "คำ", "naïve", "木漢字", "", "...", "@@", "()", "-",
        "word", "anti-spam", "semver 1.2.3.4-beta", "v10.20.30.40",
        "(02) 123 4567", "+66", "e.g.", "a.b.c@d.e.fg",
    ]
    rows = []
    for i in range(400):
        parts = []
        for _ in range(rng.randint(0, 12)):
            a = rng.choice(atoms).replace("{n}", str(rng.randint(0, 9)))
            parts.append(a)
        sep = rng.choice([" ", "  ", ", ", "\n", "\t", ""])
        rows.append((i, sep.join(parts)))
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: (r["n_pii_emails"], r["n_pii_ipv4"], r["n_pii_phones"], r["red"])
        for r in df.select(
            "id", *pii_counts(F.col("text")),
            redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["id", "text"]))
    exp = {
        row[0]: tuple(row[1:])
        for row in con.execute(
            f"SELECT id, {counts_sql('text')}, {redact_sql('text')} AS red FROM t"
        ).fetchall()
    }
    diffs = {i: (got[i], exp[i]) for i in got if got[i] != exp[i]}
    assert not diffs, f"{len(diffs)} diverging rows, first: {next(iter(diffs.items()))}"


def test_fuzz_segment_dedup_reconstructs_when_nothing_dropped(spark):
    """Round-trip invariant: with min_docs above the corpus size nothing
    is boilerplate, so segment_dedup must reassemble every document to
    exactly its whitespace-normalized token stream — any chunking /
    ordering / slicing bug breaks this equality somewhere in 200
    random docs with ragged lengths (incl. lengths not divisible by k,
    single-token docs, and duplicate chunks within one doc)."""
    from dbd_datawarehouse_scraper_spark.operators.segments import segment_dedup

    rng = random.Random(20260814)
    vocab = ["alpha", "beta", "gamma", "delta", "x", "yy", "zzz", "q1", "w2"]
    rows = []
    for i in range(200):
        n = rng.choice([1, 2, 3, 7, 8, 9, 15, 16, 17, 31])
        toks = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.3:  # duplicate a chunk inside the same doc
            toks = toks + toks[: min(8, len(toks))]
        sep = rng.choice([" ", "  ", " \t "])
        rows.append((i, sep.join(toks), " ".join(toks)))
    d = spark.createDataFrame(rows, "doc_id long, text string, expected string")
    out = segment_dedup(d, mode="chunk", k=8, min_docs=10_000)
    from dbd_datawarehouse_scraper_spark.caching import release_caches

    joined = out.join(d.select("doc_id", "expected"), "doc_id").collect()
    release_caches()
    assert len(joined) == 200
    bad = [(r["doc_id"], r["clean_text"], r["expected"])
           for r in joined if r["clean_text"] != r["expected"] or r["n_dropped"] != 0]
    assert not bad, bad[:3]


def _model_extract_domain(url: str) -> str:
    """Pure-Python reference for operators/domains.py extract_domain:
    optional scheme and userinfo stripped, host = chars up to the first
    '/', ':', '?', '#' or whitespace; lowercased; leading 'www.'
    removed; non-matching inputs -> ''."""
    import re

    m = re.match(
        r"^(?:[A-Za-z][A-Za-z0-9+.\-]*://)?(?:[^/@?#\s]*@)?([^/:?#\s]+)", url
    )
    if not m:
        return ""
    host = m.group(1).lower()
    return re.sub(r"^www\.", "", host)


def test_fuzz_extract_domain_vs_model(spark):
    from dbd_datawarehouse_scraper_spark.operators.domains import extract_domain

    rng = random.Random(7)
    schemes = ["", "http://", "https://", "ftp://", "x+y-z.1://"]
    users = ["", "user@", "a:b@", "@"]
    hosts = ["example.com", "WWW.Example.COM", "sub.host.org", "www.x",
             "host", "127.0.0.1", "xn--dmin-moa0i.example", "www.", "w"]
    tails = ["", "/", "/path/a?q=1", ":8080/x", "#frag", "?a=b", " trailing",
             "//double"]
    urls = []
    for _ in range(300):
        urls.append(
            rng.choice(schemes) + rng.choice(users) + rng.choice(hosts)
            + rng.choice(tails)
        )
    urls += ["", " ", "://", "http://", "no spaces here", "a@b@c/x",
             "https://@/path", ":8080", "?query-only"]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [
        r["d"] for r in df.select(extract_domain(F.col("url")).alias("d")).collect()
    ]
    want = [_model_extract_domain(u) for u in urls]
    assert got == want, [
        (u, g, w) for u, g, w in zip(urls, got, want) if g != w
    ][:5]


def _model_registrable_host(host: str) -> str:
    """Pure-Python reference for operators/domains.py
    registrable_host, built from the SAME pinned suffix tuples."""
    import re

    from dbd_datawarehouse_scraper_spark.operators.domains import (
        MULTI_LABEL_SUFFIXES_2,
        MULTI_LABEL_SUFFIXES_3,
    )

    h = re.sub(r"\.$", "", host).lower()
    if re.match(r"^\d+\.\d+\.\d+\.\d+$", h):
        return h
    parts = h.split(".")
    if len(parts) >= 4 and ".".join(parts[-3:]) in MULTI_LABEL_SUFFIXES_3:
        return ".".join(parts[-4:])
    if len(parts) >= 3 and ".".join(parts[-2:]) in MULTI_LABEL_SUFFIXES_2:
        return ".".join(parts[-3:])
    if len(parts) >= 2:
        return ".".join(parts[-2:])
    return h


def _model_canonicalize_url(url: str) -> str:
    """Pure-Python reference for operators/domains.py
    canonicalize_url (strip_www=False)."""
    import re

    from dbd_datawarehouse_scraper_spark.operators.domains import (
        TRACKING_PARAM_RE,
    )

    u = re.sub(r"#.*$", "", url.strip(" "))
    pre = r"[A-Za-z][A-Za-z0-9+.\-]*://|//"
    m = re.match(rf"^({pre})", u)
    scheme = m.group(1).lower() if m else ""
    auth = re.match(rf"^(?:{pre})?([^/?#]*)", u).group(1).lower()
    if scheme == "http://":
        auth = re.sub(r":80$", "", auth)
    elif scheme == "https://":
        auth = re.sub(r":443$", "", auth)
    pathq = re.match(rf"^(?:{pre})?[^/?#]*(.*)$", u).group(1)
    path = re.sub(r"/+$", "", re.match(r"^([^?]*)", pathq).group(1))
    mq = re.search(r"\?(.*)$", pathq)
    query = mq.group(1) if mq else ""
    params = sorted(
        p for p in query.split("&") if p and not re.match(TRACKING_PARAM_RE, p)
    )
    return scheme + auth + path + ("?" + "&".join(params) if params else "")


def test_fuzz_canonicalize_url_vs_model(spark):
    from dbd_datawarehouse_scraper_spark.operators.domains import (
        canonicalize_url,
    )

    rng = random.Random(13)
    schemes = ["", "http://", "HTTPS://", "ftp://", "//"]
    hosts = ["Example.COM", "www.Site.org", "host:8080", "site.com:443",
             "api.site.com:80", "127.0.0.1"]
    paths = ["", "/", "/a/b", "/a/b/", "/a//", "/A/B"]
    queries = ["", "?", "?a=1", "?b=2&a=1", "?utm_source=x&a=1",
               "?gclid=123", "?utm_campaign=y&utm_medium=z",
               "?a=1&fbclid=zz&c=3", "?dup=1&dup=1"]
    frags = ["", "#", "#frag", "#a?b=1"]
    urls = [
        rng.choice(schemes) + rng.choice(hosts) + rng.choice(paths)
        + rng.choice(queries) + rng.choice(frags)
        for _ in range(300)
    ] + ["", "   ", "?only=query", "#only-frag", "http://x.com:80",
         "https://y.io:443/", "a=1&b=2", "//Example.COM:443/a",
         "//CDN.site.io/asset.js?v=1"]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [
        r["c"]
        for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    want = [_model_canonicalize_url(u) for u in urls]
    assert got == want, [
        (u, g, w) for u, g, w in zip(urls, got, want) if g != w
    ][:5]
    # the headline property: one resource, many tracked/ordered URLs,
    # ONE canonical key
    variants = [
        "https://Shop.COM/item/9?b=2&a=1#top",
        "HTTPS://shop.com:443/item/9/?a=1&b=2",
        "https://shop.com/item/9?utm_source=mail&a=1&b=2&gclid=xyz",
    ]
    vdf = spark.createDataFrame([(u,) for u in variants], ["url"])
    canon = {
        r["c"]
        for r in vdf.select(canonicalize_url(F.col("url")).alias("c")).collect()
    }
    assert canon == {"https://shop.com/item/9?a=1&b=2"}


def test_fuzz_registrable_domain_vs_model(spark):
    """registrable_domain(url) == registrable_host(model_extract(url))
    over 300 generated URLs spanning suffix classes, subdomain depths,
    IPv4 literals, trailing dots, and malformed shapes."""
    from dbd_datawarehouse_scraper_spark.operators.domains import (
        registrable_domain,
    )

    rng = random.Random(11)
    schemes = ["", "http://", "https://", "u@x://"]
    subs = ["", "www.", "a.", "a.b.", "shard12.x.", "WWW.Blog."]
    apexes = ["spam.com", "foo.co.uk", "big.com.au", "x.act.edu.au",
              "somecompany.co.th", "example.org", "co.uk", "127.0.0.1",
              "host", "uni.ac.jp", "mix.COM.BR", "t.com.", "1.2.3.4.",
              "Tenant.BLOGSPOT.com", "bucket.s3.amazonaws.com"]
    tails = ["", "/", "/p?q=1", ":443/x", "#f", " junk"]
    urls = [
        rng.choice(schemes) + rng.choice(subs) + rng.choice(apexes)
        + rng.choice(tails)
        for _ in range(300)
    ] + ["", "://", "https://www.", "just words"]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [
        r["d"]
        for r in df.select(registrable_domain(F.col("url")).alias("d")).collect()
    ]
    want = [_model_registrable_host(_model_extract_domain(u)) for u in urls]
    assert got == want, [
        (u, g, w) for u, g, w in zip(urls, got, want) if g != w
    ][:5]
