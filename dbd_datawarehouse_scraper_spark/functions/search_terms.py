"""Ordered search-term variant generation as a pure column expression.

Replicates ``generate_search_terms`` (scraper_v2.py:770-866): from one
company name, an ORDERED array of search variants, deduplicated with
first-occurrence-wins semantics. The 1-based array position is the
reference's ``search_strategy`` rank (scraper_v2.py:1019-1020) — recover
it with ``posexplode``.

Implementation is 100% built-in array/string functions (no UDF): each
variant slot becomes a conditional expression (null when the reference
would not append it), the progressive word-trim becomes
``transform(sequence(n-1, 1, -1), ...)``, and the reference's
``if term not in search_terms`` ordered dedup is exactly
``array_distinct`` (Spark preserves first occurrence).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text_norm import (
    COMPANY_PREFIX,
    clean_filler_words,
    collapse_ws,
    extract_core_name,
    remove_parentheses,
    remove_trailing_numbers,
    strip_partnership_prefix,
)


def generate_search_terms(name: Column) -> Column:
    """array<string> of search variants in reference priority order."""
    # base: drop every literal บริษัท, collapse whitespace (:791-793)
    base = collapse_ws(F.replace(name, F.lit(COMPANY_PREFIX), F.lit("")))
    is_partnership = name.contains("ห้างหุ้นส่วน")  # :788

    # partnership branch (:799-819)
    nwp = strip_partnership_prefix(base)  # one prefix only, longest first
    short_variant = F.concat(F.lit("ห้างหุ้นส่วน "), nwp)  # :816, no re-trim

    # มหาชน branch (:822-835)
    has_public = base.contains("มหาชน")
    no_space_variant = F.replace(
        F.replace(base, F.lit("จำกัด (มหาชน)"), F.lit("จำกัด(มหาชน)")),
        F.lit("จำกัด  (มหาชน)"),
        F.lit("จำกัด(มหาชน)"),
    )
    just_limited = F.trim(
        F.element_at(
            F.split(F.trim(F.element_at(F.split(base, r"\(มหาชน\)"), 1)), "มหาชน"), 1
        )
    )

    core = extract_core_name(name)  # :837
    cleaned = clean_filler_words(core)  # :843
    no_parens = remove_parentheses(core)  # :848
    no_numbers = remove_trailing_numbers(core)  # :853

    head = F.array(
        F.when(base != "", base),
        F.when(is_partnership & (nwp != ""), nwp),
        F.when(is_partnership, short_variant),
        F.when(~is_partnership & has_public, no_space_variant),
        F.when(~is_partnership & has_public & (just_limited != ""), just_limited),
        F.when(core != "", core),
        F.when((cleaned != "") & (cleaned != core), cleaned),
        F.when((no_parens != "") & (no_parens != core), no_parens),
        F.when((no_numbers != "") & (no_numbers != core), no_numbers),
    )

    # progressive word trimming from the cleanest base (:855-864)
    trim_base = F.when((no_parens != "") & (no_parens != core), no_parens).otherwise(
        core
    )
    words = F.filter(F.split(trim_base, r"\s+"), lambda w: w != "")
    n = F.size(words)
    trims = F.when(
        n > 1,
        F.transform(
            F.sequence(n - 1, F.lit(1), F.lit(-1)),
            lambda i: F.array_join(F.slice(words, 1, i), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))

    return F.array_distinct(F.array_compact(F.concat(head, trims)))
