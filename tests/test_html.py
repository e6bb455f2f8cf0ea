"""HTML-to-text cleanup (functions/html.py): strip/title/ratio vs a
DuckDB mirror BUILT FROM THE SAME step table, plus adversarial markup."""

import duckdb
import pytest
from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.functions.html import (
    HTML_ENTITY_STEPS,
    HTML_STRIP_STEPS,
    extract_html_title,
    html_visible_ratio,
    strip_html,
)

DOCS = [
    (1, "<html><head><title>My  Page</title><style>p{color:red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><p>Hello&nbsp;world</p><div>Second &amp; third</div></body></html>"),
    (2, "plain text, no markup at all"),
    (3, "<ul><li>one</li><li>two</li></ul><table><tr><td>a</td><td>b</td></tr></table>"),
    (4, "<SCRIPT TYPE='text/js'>alert(1)</SCRIPT>visible<BR>text"),
    (5, "<!-- hidden --><p>kept</p><!-- multi\nline\ncomment -->"),
    (6, "&lt;tag&gt; &quot;quoted&quot; &#39;apos&#39; Tom &amp; Jerry"),
    (7, ""),
    (8, "<div class='a' data-x='1 > 0'>attr edge</div>"),
    (9, "<p>unclosed <script>while(1){}"),  # pathological: strips to end
    (10, "<h1>Title</h1>no<h2>gap</h2>"),
    # round 7: numeric/hex character references (ubiquitous in crawls)
    (11, "it&#8217;s &#8220;quoted&#8221; &#8211; dash&#8230;"),
    (12, "hex it&#x2019;s &#X201C;up&#x201d; &#x2014; em"),
    (13, "wp &#038; leading zeros &#0034;q&#00034; nb&#160;sp"),
    (14, "escaped markup: &amp;lt;b&amp;gt; stays literal &#38;#39;"),
    (15, "soft&#173;hyphen zero&#8203;width &copy; &#169; &#xa9;"),
]


def _mirror_sql(col: str) -> str:
    expr = col
    for pat, rep in HTML_STRIP_STEPS + HTML_ENTITY_STEPS:
        rep_sql = rep.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat}', '{rep_sql}', 'g')"
    return f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"


def test_strip_html_matches_duckdb_mirror(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, raw string")
    got = {
        r["doc_id"]: r["txt"]
        for r in df.select("doc_id", strip_html(F.col("raw")).alias("txt")).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = dict(
        con.execute(f"SELECT doc_id, {_mirror_sql('raw')} FROM t").fetchall()
    )
    assert got == want
    # semantic spot checks
    # title CONTENT is text (only tags strip); script/style content is not
    assert got[1] == 'My Page Hello world Second & third'
    assert "color:red" not in got[1] and "not text" not in got[1]
    assert got[2] == DOCS[1][1]
    assert got[3] == "one two a b"
    assert got[4] == "visible text"
    assert got[5] == "kept"
    assert got[6] == '<tag> "quoted" \'apos\' Tom & Jerry'
    assert got[7] == ""
    assert "while" not in got[9]  # unclosed script strips to end
    assert got[10] == "Title no gap"
    # numeric / hex character references decode (round 7)
    assert got[11] == "it’s “quoted” – dash…"
    assert got[12] == "hex it’s “up” — em"
    assert got[13] == 'wp & leading zeros "q" nb sp'
    # &amp; decodes LAST: escaped markup stays literal, never
    # double-decodes into live tags/entities
    assert got[14] == "escaped markup: &lt;b&gt; stays literal &#39;"
    assert got[15] == "softhyphen zerowidth © © ©"


def test_entity_table_order_and_visible_ratio_stripped_param(spark):
    from dbd_datawarehouse_scraper_spark.functions.html import _ENTITY_SPEC

    # the ampersand family must be the last step (double-decode guard)
    assert _ENTITY_SPEC[-1][1] == 38
    # html_visible_ratio(col, stripped=...) must equal the self-derived
    # form — the shared-column fast path can't drift semantically
    df = spark.createDataFrame(DOCS, "doc_id long, raw string")
    both = df.select(
        html_visible_ratio(F.col("raw")).alias("a"),
        html_visible_ratio(F.col("raw"), stripped=strip_html(F.col("raw"))).alias(
            "b"
        ),
    ).collect()
    assert all(r["a"] == r["b"] for r in both)


def test_extract_html_title(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, raw string")
    got = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", extract_html_title(F.col("raw")).alias("t")
        ).collect()
    }
    assert got[1] == "My Page"
    assert got[2] == "" and got[7] == ""


def test_html_visible_ratio_orders_chrome_heavy_low(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, raw string")
    got = {
        r["doc_id"]: r["ratio"]
        for r in df.select(
            "doc_id", html_visible_ratio(F.col("raw")).alias("ratio")
        ).collect()
    }
    assert got[2] == 1.0           # plain text: fully visible
    assert got[7] == 0.0           # empty
    assert got[1] < got[10] < got[2]  # chrome-heavy < light markup < plain
    assert all(0.0 <= v <= 1.0 for v in got.values())


CHROME_PAGE = (
    "<html><head><title>Site</title><style>p{margin:0}</style></head><body>"
    "<nav><ul><li><a href='/'>Home</a></li><li><a href='/about'>About us</a>"
    "</li><li><a href='/contact'>Contact sales</a></li></ul></nav>"
    "<div class='sidebar'><a href='/p1'>Popular post one</a><br>"
    "<a href='/p2'>Popular post two</a><br><a href='/p3'>Another popular</a></div>"
    "<article><h1>Headline</h1>"
    "<p>This is the first paragraph of the actual article body, long enough "
    "to clear the minimum block length and containing no links at all.</p>"
    "<p>The second paragraph continues the prose with one inline "
    "<a href='/ref'>reference</a> but stays link-sparse readable text of "
    "reasonable length for a real article.</p></article>"
    "<footer><a href='/terms'>Terms of service</a> &middot; "
    "<a href='/privacy'>Privacy policy</a> &middot; "
    "<a href='/cookies'>Cookie settings</a> &middot; "
    "<a href='/careers'>Careers</a> &copy; 2026</footer>"
    "</body></html>"
)


def test_extract_main_content_drops_chrome_keeps_article(spark):
    """Round-7: text-density main-content extraction — the fixture's
    nav, sidebar and footer are link-dominated blocks and drop; the
    two article paragraphs survive with entities decoded and the
    inline anchor text kept; the short link-free heading adjacent to
    good prose is RESCUED (jusText near-good rule)."""
    from dbd_datawarehouse_scraper_spark.functions.html import (
        extract_main_content,
        strip_html,
    )

    df = spark.createDataFrame([(1, CHROME_PAGE)], "doc_id long, raw string")
    got = df.select(
        extract_main_content(F.col("raw")).alias("m"),
        strip_html(F.col("raw")).alias("s"),
    ).collect()[0]
    m = got["m"]
    assert "first paragraph of the actual article" in m
    assert "second paragraph continues the prose" in m
    assert "reference" in m  # inline anchor text is content
    # the heading is short but link-free and sits next to good prose
    assert "Headline" in m
    # chrome gone: link-dominated blocks are never rescued, however
    # close to the article they sit
    for chrome in ("Home", "About us", "Popular post", "Terms of service",
                   "Privacy policy", "Careers", "©"):
        assert chrome not in m, chrome
    # ...but a plain strip keeps it (that's the difference in kind)
    assert "About us" in got["s"] and "Privacy policy" in got["s"]
    # rescue is OFF for isolated short blocks: no good neighbor
    lone = spark.createDataFrame(
        [(1, "<h1>Headline</h1><li><a href='/x'>Some link row here</a></li>")],
        "doc_id long, raw string",
    ).select(extract_main_content(F.col("raw")).alias("m")).collect()[0]["m"]
    assert lone == ""


def test_extract_main_content_shapes(spark):
    from dbd_datawarehouse_scraper_spark.functions.html import (
        extract_main_content,
    )

    long_prose = ("Plain prose with no markup at all that easily clears the "
                  "minimum block length threshold for keeping.")
    rows = [
        (1, long_prose),                          # no markup: kept whole
        (2, "<p>short</p>"),                      # too short: empty
        (3, ""),                                  # empty: empty
        (4, "<ul>" + "".join(
            f"<li><a href='/{i}'>Item number {i} here</a></li>"
            for i in range(10)
        ) + "</ul>"),                             # pure link list: empty
        (5, f"<script>junk()</script><p>{long_prose}</p>"
            f"<p>{long_prose}</p>"),              # two blocks both kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, raw string")
    got = {
        r["doc_id"]: r["m"]
        for r in df.select(
            "doc_id", extract_main_content(F.col("raw")).alias("m")
        ).collect()
    }
    assert got[1] == long_prose
    assert got[2] == "" and got[3] == "" and got[4] == ""
    assert got[5] == f"{long_prose} {long_prose}"
    # tunable: lowering the bar keeps the short block
    loose = df.filter("doc_id = 2").select(
        extract_main_content(F.col("raw"), min_block_chars=3).alias("m")
    ).collect()[0]["m"]
    assert loose == "short"
