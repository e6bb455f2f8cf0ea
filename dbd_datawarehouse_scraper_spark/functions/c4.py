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


def c4_page_flags(
    col: Column,
    min_words_per_line: int = C4_DEFAULTS["min_words_per_line"],
    min_sentences: int = C4_DEFAULTS["min_sentences"],
    page_block_patterns: tuple = C4_PAGE_BLOCK_PATTERNS,
) -> Column:
    """Verdict struct over the CLEANED text: ``(n_sentences,
    blocked BOOLEAN, pass BOOLEAN)`` — sentence count is the
    terminal-punctuation occurrence count in the kept lines, blocked
    means a page-level pattern matched the ORIGINAL text (a code page
    is a code page even if the line rules strip the braces). NULL text
    coalesces to '' and fails the sentence floor explicitly."""
    c = F.coalesce(col, F.lit(""))
    cleaned = c4_clean_text(c, min_words_per_line)
    n_sent = F.size(
        F.regexp_extract_all(cleaned, F.lit(r"[.!?]"), 0)
    ).cast("long")
    blocked = F.lit(False)
    for pat in page_block_patterns:
        blocked = blocked | F.lower(c).contains(pat.lower())
    return F.struct(
        n_sent.alias("n_sentences"),
        blocked.alias("blocked"),
        ((n_sent >= min_sentences) & ~blocked).alias("pass"),
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
    ``text_col`` rewritten. Pure per-row expressions; the one subtlety
    is binding the cleaned text ONCE via an intermediate projection so
    the line sweep isn't re-evaluated per consumer (the
    repetition_stats staging precedent)."""
    if min_words_per_line < 1:
        raise ValueError(
            f"min_words_per_line must be >= 1, got {min_words_per_line}"
        )
    if min_sentences < 0:
        raise ValueError(f"min_sentences must be >= 0, got {min_sentences}")
    staged = docs.withColumn(
        "_c4_clean",
        c4_clean_text(
            F.coalesce(F.col(text_col), F.lit("")), min_words_per_line
        ),
    )
    n_sent = F.size(
        F.regexp_extract_all(F.col("_c4_clean"), F.lit(r"[.!?]"), 0)
    )
    blocked = F.lit(False)
    for pat in page_block_patterns:
        blocked = blocked | F.lower(
            F.coalesce(F.col(text_col), F.lit(""))
        ).contains(pat.lower())
    return (
        staged.filter((n_sent >= min_sentences) & ~blocked)
        .withColumn(text_col, F.col("_c4_clean"))
        .drop("_c4_clean")
    )
