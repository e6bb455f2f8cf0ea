"""[EXT] C4-style line and page cleaning (Raffel et al. 2020, §2.2) —
the other canonical web-corpus cleanup next to the Gopher rules.

Where Gopher (text_analysis.gopher_*) SCORES a page and keeps or drops
it whole, C4 first REWRITES the page line by line and then gates the
remainder — the recipe that turned Common Crawl into C4:

line rules (a line survives iff ALL hold):
- ends in a terminal punctuation mark (``.``, ``!``, ``?``, ``"``,
  ``'`` — the paper's rule targeting nav/menu fragments);
- has at least ``min_words_per_line`` words (default 3);
- does not contain the word "javascript" (case-insensitive — cookie
  and script-warning boilerplate);

page rules (after the line rewrite, the page survives iff ALL hold):
- at least ``min_sentences`` sentences remain (terminal-punctuation
  occurrences in the kept text — the paper's 5-sentence floor, the
  cheap sentence proxy);
- the page does not contain "lorem ipsum" (case-insensitive);
- the page does not contain ``{`` (the paper's code filter).

Everything is pure per-row array/regex expressions — no UDF, no
shuffle, scale-free — and every predicate is mirrored in DuckDB by a
test generated from THE SAME constants (tests/test_c4.py), the
Gopher-rule convention. The paper's bad-words list is deliberately NOT
shipped (policy lists belong to the deployment, not the engine); pass
extra page-level blockers via ``page_block_patterns``.

SCOPE — these rules assume WHITESPACE-DELIMITED, ASCII-PUNCTUATED
text, exactly like the paper (C4 is an English corpus): a zh/ja page
has no whitespace words and no ASCII terminals, so BOTH the word
floor and the terminal rule strip every line and the page drops.
Running ``--c4-clean`` over a multilingual corpus therefore removes
the CJK slice wholesale — partition by language first and apply C4
only to the whitespace-delimited languages (the limitation is
test-pinned, not hidden: tests/test_c4.py doc 11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: A surviving line must end with one of these (optionally followed by
#: closing quotes/brackets and trailing spaces) — shared with the
#: DuckDB mirror in tests/test_c4.py.
C4_TERMINAL_RE = r"[.!?\"'][)\"']*[ \t]*$"

#: Default page-level blockers (case-insensitive substring patterns),
#: per the paper: template filler and code pages.
C4_PAGE_BLOCK_PATTERNS = ("lorem ipsum", "{")

#: Sentence proxy: terminal-punctuation occurrences in the kept text.
#: Shared with the DuckDB mirror, like the terminal class.
C4_SENTENCE_RE = r"[.!?]"

C4_DEFAULTS = {
    "min_words_per_line": 3,
    "min_sentences": 5,
}


def c4_clean_text(
    col: Column, min_words_per_line: int = C4_DEFAULTS["min_words_per_line"]
) -> Column:
    """The line-rewrite alone: keep only lines that end in terminal
    punctuation, carry >= ``min_words_per_line`` words, and don't
    mention javascript; surviving lines re-join with ``\\n``. NULL in,
    NULL out (gate callers coalesce)."""
    lines = F.split(col, r"\r?\n")
    kept = F.filter(
        lines,
        lambda l: l.rlike(C4_TERMINAL_RE)
        & (
            F.size(F.filter(F.split(F.trim(l), r"\s+"), lambda w: w != ""))
            >= min_words_per_line
        )
        & ~F.lower(l).contains("javascript"),
    )
    return F.array_join(kept, "\n")


def _page_verdict(
    cleaned: Column,
    original: Column,
    min_sentences: int,
    page_block_patterns: tuple,
):
    """THE one page-verdict construction (c4_page_flags and c4_clean
    both consume it, so the struct form and the gate can never drift):
    ``(n_sentences, blocked, pass)`` expressions over a CLEANED text
    column and the ORIGINAL text (a code page is a code page even if
    the line rules strip the braces)."""
    n_sent = F.size(
        F.regexp_extract_all(cleaned, F.lit(C4_SENTENCE_RE), 0)
    ).cast("long")
    blocked = F.lit(False)
    for pat in page_block_patterns:
        blocked = blocked | F.lower(original).contains(pat.lower())
    return n_sent, blocked, (n_sent >= min_sentences) & ~blocked


def validate_c4_opts(opts: dict) -> dict:
    """THE one validation of C4 options — the gate and the stream
    exporter's at-start check both call it (the
    validate_gopher_overrides precedent): unknown keys refuse, numeric
    bounds checked NOW, not on the first epoch. Returns the merged
    options."""
    merged = {**C4_DEFAULTS, "page_block_patterns": C4_PAGE_BLOCK_PATTERNS}
    unknown = set(opts) - set(merged)
    if unknown:
        raise ValueError(
            f"unknown C4 options: {sorted(unknown)} "
            f"(valid: {sorted(merged)})"
        )
    merged.update(opts)
    if int(merged["min_words_per_line"]) < 1:
        raise ValueError(
            f"min_words_per_line must be >= 1, got "
            f"{merged['min_words_per_line']}"
        )
    if int(merged["min_sentences"]) < 0:
        raise ValueError(
            f"min_sentences must be >= 0, got {merged['min_sentences']}"
        )
    merged["min_words_per_line"] = int(merged["min_words_per_line"])
    merged["min_sentences"] = int(merged["min_sentences"])
    return merged


def c4_page_flags(
    col: Column,
    min_words_per_line: int = C4_DEFAULTS["min_words_per_line"],
    min_sentences: int = C4_DEFAULTS["min_sentences"],
    page_block_patterns: tuple = C4_PAGE_BLOCK_PATTERNS,
) -> Column:
    """Verdict struct over the CLEANED text: ``(n_sentences,
    blocked BOOLEAN, pass BOOLEAN)`` — sentence count is the
    terminal-punctuation occurrence count in the kept lines, blocked
    means a page-level pattern matched the ORIGINAL text. NULL text
    coalesces to '' and fails the sentence floor explicitly."""
    c = F.coalesce(col, F.lit(""))
    n_sent, blocked, ok = _page_verdict(
        c4_clean_text(c, min_words_per_line), c, min_sentences,
        page_block_patterns,
    )
    return F.struct(
        n_sent.alias("n_sentences"),
        blocked.alias("blocked"),
        ok.alias("pass"),
    )


def c4_clean(
    docs: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = C4_DEFAULTS["min_words_per_line"],
    min_sentences: int = C4_DEFAULTS["min_sentences"],
    page_block_patterns: tuple = C4_PAGE_BLOCK_PATTERNS,
) -> DataFrame:
    """The full C4 pass: rewrite ``text_col`` to its surviving lines
    and keep only passing pages. Returns the input columns with
    ``text_col`` rewritten.

    The cleaned text is bound ONCE behind an
    ``explode_outer(array(...))`` Generate barrier — a plain
    withColumn+filter would let PushDownPredicates substitute the
    alias into the pushed filter and run the whole line sweep twice
    per row (the apply_html_stage precedent; plan-pinned in
    tests/test_plans.py::test_c4_clean_sweeps_once)."""
    validate_c4_opts(
        {
            "min_words_per_line": min_words_per_line,
            "min_sentences": min_sentences,
            "page_block_patterns": page_block_patterns,
        }
    )
    orig = F.coalesce(F.col(text_col), F.lit(""))
    tmp = "_c4_clean"
    while tmp in docs.columns:  # never clobber a caller's column
        tmp += "_"
    staged = docs.withColumn(
        tmp,
        F.explode_outer(F.array(c4_clean_text(orig, min_words_per_line))),
    )
    _, _, ok = _page_verdict(
        F.col(tmp), orig, min_sentences, page_block_patterns
    )
    return staged.filter(ok).withColumn(text_col, F.col(tmp)).drop(tmp)
