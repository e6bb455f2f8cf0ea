"""Token-set similarity as column expressions (scraper_v2.py:737-767).

The reference's fuzzy-match score is token Jaccard over whitespace
tokens of the two core names. Expressed with array built-ins it is
JVM-side and vectorizable; no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text_norm import extract_core_name


def tokenize_ws(col: Column) -> Column:
    """Whitespace token SET (order-preserving distinct) —
    ``set(s.split())`` parity (scraper_v2.py:753-755). Empty string →
    empty array (Python ``''.split() == []``)."""
    toks = F.split(F.trim(col), r"\s+")
    toks = F.filter(toks, lambda t: t != "")
    return F.array_distinct(toks)


def token_jaccard(a: Column, b: Column) -> Column:
    """|A∩B| / |A∪B| over token sets; 0.0 when either side is empty
    (scraper_v2.py:757-767)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(
        (F.size(a) == 0) | (F.size(b) == 0) | (union == 0), F.lit(0.0)
    ).otherwise(inter.cast("double") / union.cast("double"))


def name_similarity(name1: Column, name2: Column) -> Column:
    """Full reference scoring: core-name extraction then token Jaccard
    (``calculate_similarity``, scraper_v2.py:737-767)."""
    return token_jaccard(
        tokenize_ws(extract_core_name(name1)), tokenize_ws(extract_core_name(name2))
    )
