"""[EXT] HTML-to-text cleanup for web-corpus ingestion — the step
between a crawled payload and the curation funnel's text gates.

Real main-content extraction (readability/trafilatura-class DOM
scoring) needs an HTML parser; what a 100 TB pipeline needs FIRST is
the cheap, vectorizable pass that turns markup into scoreable text at
scan speed. These are pure built-in column expressions (regexp chains
— codegen'd, pushdown-safe, no UDF) with exact DuckDB mirrors, so the
cleanup is oracle-checkable like every other scalar layer:

- ``strip_html``: drop <script>/<style> blocks wholesale (their text
  content is code, not prose), drop comments, turn block-level
  closers into newlines (so "<p>a</p><p>b</p>" doesn't fuse words),
  drop every remaining tag, decode the named/numeric entities that
  dominate real corpora, collapse whitespace;
- ``extract_html_title``: first <title> text, for provenance/dedup
  keys;
- ``html_visible_ratio``: visible-text length over raw length — a
  cheap boilerplate-density signal (chrome-heavy pages score low),
  used as a pre-gate the same way quality_score gates prose.

Regex semantics are chosen for Java-vs-RE2 agreement: case-insensitive
via ``(?i)``, dot-matches-newline via ``(?s)``, no backreferences, no
lookaround — the same single-branch discipline as functions/pii.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (pattern, replacement) chain shared by strip_html and its DuckDB
#: mirror (tests build the SQL from this table, so the two can't drift).
HTML_STRIP_STEPS: tuple[tuple[str, str], ...] = (
    # script/style/noscript blocks: content is code, drop wholesale;
    # the second pass of each pair catches an UNCLOSED block (strip to
    # end of document — balanced ones are already gone, so a surviving
    # opener means truncated/pathological markup, and leaking script
    # text into a training corpus is worse than over-stripping)
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),
    (r"(?is)<script\b.*$", " "),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),
    (r"(?is)<style\b.*$", " "),
    (r"(?is)<noscript\b[^>]*>.*?</noscript\s*>", " "),
    (r"(?is)<noscript\b.*$", " "),
    (r"(?s)<!--.*?-->", " "),
    # block-level boundaries become spaces so words don't fuse
    (r"(?i)</?(p|div|br|li|ul|ol|tr|td|th|table|h[1-6]|section|article|header|footer|blockquote)\b[^>]*>", " "),
    # every remaining tag
    (r"(?s)<[^>]*>", " "),
)

#: (named forms, codepoint, replacement) — each row becomes ONE regexp
#: step matching the named entity form(s) plus the decimal and hex
#: character references for the codepoint (optional leading zeros,
#: case-insensitive via (?i) — also covers `&#X2019;`). The set is the
#: high-frequency core of real crawls: markup escapes, typographic
#: quotes/dashes/ellipsis from CMS output, nbsp, and the invisible
#: characters (soft hyphen, zero-width space) that would otherwise
#: pollute shingles and fingerprints. The ampersand row is LAST by
#: construction (asserted below): decoding `&amp;` earlier would let
#: escaped markup like `&amp;lt;` double-decode to `<` instead of the
#: literal `&lt;` (round-6 review).
_ENTITY_SPEC: tuple[tuple[tuple[str, ...], int, str], ...] = (
    (("nbsp",), 160, " "),
    (("lt",), 60, "<"),
    (("gt",), 62, ">"),
    (("quot",), 34, "\""),
    (("apos",), 39, "'"),
    (("lsquo",), 8216, "‘"),
    (("rsquo",), 8217, "’"),
    (("ldquo",), 8220, "“"),
    (("rdquo",), 8221, "”"),
    (("ndash",), 8211, "–"),
    (("mdash",), 8212, "—"),
    (("hellip",), 8230, "…"),
    (("shy",), 173, ""),
    ((), 8203, ""),  # zero-width space (no common named form)
    (("copy",), 169, "©"),
    (("reg",), 174, "®"),
    (("trade",), 8482, "™"),
    (("middot",), 183, "·"),
    (("bull",), 8226, "•"),
    (("laquo",), 171, "«"),
    (("raquo",), 187, "»"),
    (("deg",), 176, "°"),
    (("sect",), 167, "§"),
    (("para",), 182, "¶"),
    (("times",), 215, "×"),
    (("divide",), 247, "÷"),
    (("frac12",), 189, "½"),
    (("euro",), 8364, "€"),
    (("pound",), 163, "£"),
    (("yen",), 165, "¥"),
    (("cent",), 162, "¢"),
    (("amp",), 38, "&"),  # MUST stay last — see above
)


def _entity_step(names: tuple[str, ...], cp: int, rep: str) -> tuple[str, str]:
    alts = list(names) + [f"#0*{cp}", f"#x0*{cp:x}"]
    return (r"(?i)&(?:" + "|".join(alts) + r");", rep)


#: entity → replacement steps generated from _ENTITY_SPEC; applied
#: after tag removal, ampersand family last.
HTML_ENTITY_STEPS: tuple[tuple[str, str], ...] = tuple(
    _entity_step(*row) for row in _ENTITY_SPEC
)
assert _ENTITY_SPEC[-1][1] == 38, "ampersand decode must be the last entity step"


def strip_html(col: Column) -> Column:
    """Visible text of an HTML fragment: script/style/comment blocks
    dropped, tags removed (block-level tags leave a space), common
    entities decoded, whitespace collapsed. A regex pass, not a parser
    — pathological markup (unclosed <script>, tags inside attribute
    strings) degrades to extra stripping, never to leaked code."""
    out = col
    for pat, rep in HTML_STRIP_STEPS:
        out = F.regexp_replace(out, pat, rep)
    for pat, rep in HTML_ENTITY_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


#: block-element boundaries (opening OR closing forms, plus <br>):
#: where extract_main_content cuts the document into scoreable blocks.
#: Inline markup (<a>, <span>, <b>, <img>, …) stays inside a block.
_BLOCK_BOUNDARY_RE = (
    r"(?i)<br\b[^>]*/?>|</?(?:p|div|li|ul|ol|td|th|tr|table|h[1-6]|"
    r"section|article|header|footer|blockquote|aside|nav|main|form|"
    r"fieldset|figure|figcaption|dl|dt|dd|pre)\b[^>]*>"
)

#: anchor content, for per-block link-density scoring
_ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a\s*>"

# the script/style/noscript/comment wholesale-drop prefix of the strip
# table — extract_main_content runs it BEFORE block splitting so code
# never becomes a "block"
_PRE_BLOCK_STEPS = HTML_STRIP_STEPS[:7]
assert _PRE_BLOCK_STEPS[-1][0].startswith("(?s)<!--"), (
    "HTML_STRIP_STEPS reordered — fix the _PRE_BLOCK_STEPS slice"
)


def extract_main_content(
    col: Column,
    min_block_chars: int = 40,
    max_link_density: float = 0.35,
    rescue_min_chars: int = 8,
) -> Column:
    """Main-content extraction by text-density block scoring — the
    jusText/Boilerpipe-lite rung between :func:`strip_html` (strips
    everything, chrome included) and a real DOM scorer (needs a
    parser). Navigation bars, footers, sidebars and related-link
    boxes are short and link-dominated; article prose is long and
    link-sparse:

    1. drop script/style/noscript/comment blocks wholesale (shared
       prefix of ``HTML_STRIP_STEPS``);
    2. split into blocks at block-element boundaries
       (``_BLOCK_BOUNDARY_RE`` — opening and closing forms, so
       unclosed ``<p>a<p>b`` still splits), dropping
       visible-empty fragments so adjacency below means "next block
       with any text";
    3. score each block CHEAPLY (two regexes, not the full entity
       chain): visible length after tag removal, and link length =
       the same measure over the block's ``<a>…</a>`` contents;
    4. GOOD blocks have ``visible ≥ min_block_chars`` and
       ``link/visible ≤ max_link_density``; short link-sparse blocks
       (headings, captions — ``visible ≥ rescue_min_chars``) are
       RESCUED when an adjacent block is good (jusText's
       near-good rule, one neighbor deep);
    5. run the FULL :func:`strip_html` chain once over the kept
       blocks' concatenation (codegen'd, outside the per-block
       lambda) for the entity-decoded visible text.

    The per-block passes are higher-order functions (interpreted, like
    the ``_once`` idiom) over a bounded, document-local array — no
    shuffle, no UDF, no driver involvement; the block array and its
    good-flags are each bound ONCE via ``_once`` so the neighbor
    lookups are free variable reads. Returns ``''`` when no block
    qualifies (gate on that downstream). Compose AHEAD of
    shingling/fingerprinting so chrome never pollutes dedup keys."""
    from .text_norm import _once

    pre = col
    for pat, rep in _PRE_BLOCK_STEPS:
        pre = F.regexp_replace(pre, pat, rep)

    def cheap_visible(b: Column) -> Column:
        return F.trim(
            F.regexp_replace(
                F.regexp_replace(b, r"(?s)<[^>]*>", " "), r"\s+", " "
            )
        )

    def link_sparse(b: Column) -> Column:
        link_len = F.length(
            cheap_visible(
                F.array_join(
                    F.regexp_extract_all(b, F.lit(_ANCHOR_RE), 1), " "
                )
            )
        )
        return link_len.cast("double") <= F.lit(
            float(max_link_density)
        ) * F.length(cheap_visible(b)).cast("double")

    def good(b: Column) -> Column:
        return (
            F.length(cheap_visible(b)) >= F.lit(min_block_chars)
        ) & link_sparse(b)

    blocks = F.filter(
        F.split(pre, _BLOCK_BOUNDARY_RE),
        lambda b: F.length(cheap_visible(b)) > 0,
    )

    def with_flags(b: Column) -> Column:
        def pick(f: Column) -> Column:
            def final(blk: Column, i: Column) -> Column:
                # F.get is 0-based and null-safe out of range (never
                # the ANSI element_at error on index 0)
                neighbor = F.coalesce(F.get(f, i - 1), F.lit(False)) | (
                    F.coalesce(F.get(f, i + 1), F.lit(False))
                )
                rescued = (
                    (F.length(cheap_visible(blk)) >= F.lit(rescue_min_chars))
                    & link_sparse(blk)
                    & neighbor
                )
                return F.get(f, i) | rescued

            return F.array_join(F.filter(b, final), " ")

        return _once(F.transform(b, good), pick)

    return strip_html(_once(blocks, with_flags))


def extract_html_title(col: Column) -> Column:
    """Text of the first ``<title>`` element (entities decoded,
    whitespace collapsed); empty string when absent."""
    title = F.regexp_extract(col, r"(?is)<title\b[^>]*>(.*?)</title\s*>", 1)
    for pat, rep in HTML_ENTITY_STEPS:
        title = F.regexp_replace(title, pat, rep)
    return F.trim(F.regexp_replace(title, r"\s+", " "))


def html_visible_ratio(col: Column, stripped: Column | None = None) -> Column:
    """length(visible text) / length(raw) in [0, 1] (0 for empty raw) —
    chrome-heavy pages score low; gate like ``quality_score``.

    ``stripped`` optionally names a column already holding
    ``strip_html(col)``: a funnel that both gates on the ratio and
    keeps the stripped text should compute the ~20-step regexp chain
    ONCE and pass it here, rather than trusting Catalyst to CSE two
    identical subtrees across a filter + projection (round-6 review;
    plans/curation.py does this)."""
    raw_len = F.length(col)
    visible = strip_html(col) if stripped is None else stripped
    return F.when(raw_len == 0, F.lit(0.0)).otherwise(
        F.round(F.length(visible).cast("double") / raw_len.cast("double"), 6)
    )


def apply_html_stage(docs, text_col: str, html_opts: dict):
    """The HTML cleanup STAGE shared by the batch curation funnel
    (plans/curation.py) and the incremental exporter
    (streaming/export.py) — one implementation so the two pipelines
    cannot drift. Stateless per-row (trivially replay-idempotent in a
    stream). Keys of ``html_opts``:

    - ``min_visible_ratio`` (float, optional): drop chrome-heavy pages
      scored on the RAW markup first;
    - ``strip`` (default True): rewrite ``text_col`` to the visible
      text;
    - ``extract_main`` (default False): upgrade the strip to
      :func:`extract_main_content` (tunable ``min_block_chars`` /
      ``max_link_density`` / ``rescue_min_chars``).

    When BOTH the ratio gate and the plain strip run, the ~35-step
    regexp chain is evaluated ONCE behind an
    ``explode_outer(array(...))`` Generate barrier — a plain
    withColumn+filter would let PushDownPredicates substitute the
    alias into the pushed filter and run the chain twice (pinned by
    tests/test_plans.py::test_curation_html_gate_strips_once)."""
    h = {
        "strip": True,
        "min_visible_ratio": None,
        "extract_main": False,
        **html_opts,
    }
    col = F.col(text_col)
    if h["extract_main"]:
        # main-content mode: the ratio gate (if any) still scores the
        # RAW markup's chrome density; the kept text is the
        # block-scored main content
        if h["min_visible_ratio"] is not None:
            docs = docs.filter(html_visible_ratio(col) >= h["min_visible_ratio"])
        return docs.withColumn(
            text_col,
            extract_main_content(
                col,
                min_block_chars=h.get("min_block_chars", 40),
                max_link_density=h.get("max_link_density", 0.35),
                rescue_min_chars=h.get("rescue_min_chars", 8),
            ),
        )
    if h["min_visible_ratio"] is not None and h["strip"]:
        # uniquify the temp column: silently clobbering (and then
        # dropping) a caller's own "_visible" column would be silent
        # data loss (round-7 review)
        tmp = "_visible"
        while tmp in docs.columns:
            tmp += "_"
        return (
            docs.withColumn(tmp, F.explode_outer(F.array(strip_html(col))))
            .filter(
                html_visible_ratio(col, stripped=F.col(tmp))
                >= h["min_visible_ratio"]
            )
            .withColumn(text_col, F.col(tmp))
            .drop(tmp)
        )
    if h["min_visible_ratio"] is not None:
        return docs.filter(html_visible_ratio(col) >= h["min_visible_ratio"])
    if h["strip"]:
        return docs.withColumn(text_col, strip_html(col))
    return docs
