"""THE shared score-threshold gate (round-9 review consolidation).

Three operators gate a corpus on a per-document score with identical
semantics — DSIR importance (:func:`.dsir.dsir_filter`), the learned
quality classifier (:func:`.classifier.classifier_filter`), and LM
perplexity (:func:`..functions.lm.perplexity_filter`): score once,
threshold, semi-join the survivors back (corpus rows never carry the
score columns, so downstream schemas are stable), and decide
unscoreable (empty/whitespace/NULL-text) documents EXPLICITLY via
``keep_empty`` — never a NULL-comparison vanish (the round-5
null-vanish class). That rule used to live in three copies; a fix to
the empty-document semantics now lands once, here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def score_threshold_gate(
    docs: DataFrame,
    scores: DataFrame,
    score_col: str,
    id_col: str,
    text_col: str,
    min_value: float | None = None,
    max_value: float | None = None,
    keep_empty: bool = False,
) -> DataFrame:
    """Keep ``docs`` rows whose score passes the bound (exactly one of
    ``min_value`` / ``max_value``). ``scores`` is a per-document score
    relation keyed by ``id_col`` in which unscoreable documents are
    ABSENT; ``keep_empty`` unions the token-less documents back in.
    Returns the input columns unchanged."""
    if (min_value is None) == (max_value is None):
        raise ValueError("exactly one of min_value/max_value is required")
    if min_value is not None:
        keep = scores.filter(F.col(score_col) >= F.lit(float(min_value)))
    else:
        keep = scores.filter(F.col(score_col) <= F.lit(float(max_value)))
    kept = docs.join(keep.select(id_col), id_col, "left_semi")
    if keep_empty:
        # the shared tokenizer definition (text_analysis.token_count),
        # NULL coalesced first: size(split(NULL)) is NULL, and a NULL
        # == 0 comparison would silently drop NULL-text rows from the
        # "empties" side too — the exact vanish this flag prevents
        from ..functions.text_analysis import token_count

        empties = docs.filter(
            token_count(F.coalesce(F.col(text_col), F.lit(""))) == 0
        )
        kept = kept.unionByName(empties)
    return kept
