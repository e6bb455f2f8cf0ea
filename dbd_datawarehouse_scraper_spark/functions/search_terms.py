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

Two forms:

- ``generate_search_terms(name)``: single column expression. Because
  higher-order functions are interpreted (no codegen) and interpreted
  eval has no common-subexpression elimination, every reference to
  ``core`` re-runs its regex chain — fine for small inputs, ~0.4ms/row
  on long names.
- ``add_search_terms(df, ...)``: the pipeline form. Stage 1 computes
  the scalar variants in a persisted projection (codegen'd regexes, one
  evaluation each); stage 2 assembles the array from plain column
  references. ~10× faster per row; this is what plans/pipeline.py uses.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame
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


def _variant_columns(name: Column) -> dict[str, Column]:
    """The scalar pieces of the cascade, each as one expression.

    Construction cost: four of the variants embed the full core-name
    chain, so building this dict is hundreds of py4j round-trips
    (~0.3 s of driver time). Columns are immutable plan fragments —
    pipeline callers go through :func:`_variant_items_cached`."""
    # base: drop every literal บริษัท, collapse whitespace (:791-793)
    base = collapse_ws(F.replace(name, F.lit(COMPANY_PREFIX), F.lit("")))
    core = extract_core_name(name)  # :837
    return {
        "_gst_base": base,
        "_gst_is_partnership": name.contains("ห้างหุ้นส่วน"),  # :788
        "_gst_nwp": strip_partnership_prefix(base),  # one prefix, longest first
        "_gst_has_public": base.contains("มหาชน"),
        "_gst_no_space": F.replace(
            F.replace(base, F.lit("จำกัด (มหาชน)"), F.lit("จำกัด(มหาชน)")),
            F.lit("จำกัด  (มหาชน)"),
            F.lit("จำกัด(มหาชน)"),
        ),
        "_gst_just_limited": F.trim(
            F.element_at(
                F.split(
                    F.trim(F.element_at(F.split(base, r"\(มหาชน\)"), 1)), "มหาชน"
                ),
                1,
            )
        ),
        "_gst_core": core,
        "_gst_cleaned": clean_filler_words(core),  # :843
        "_gst_no_parens": remove_parentheses(core),  # :848
        "_gst_no_numbers": remove_trailing_numbers(core),  # :853
    }


def _assemble_terms(v: dict[str, Column]) -> Column:
    """Slots + progressive trim + ordered dedup, from variant columns."""
    base = v["_gst_base"]
    is_partnership = v["_gst_is_partnership"]
    nwp = v["_gst_nwp"]
    short_variant = F.concat(F.lit("ห้างหุ้นส่วน "), nwp)  # :816, no re-trim
    has_public = v["_gst_has_public"]
    no_space = v["_gst_no_space"]
    just_limited = v["_gst_just_limited"]
    core = v["_gst_core"]
    cleaned = v["_gst_cleaned"]
    no_parens = v["_gst_no_parens"]
    no_numbers = v["_gst_no_numbers"]

    head = F.array(
        F.when(base != "", base),
        F.when(is_partnership & (nwp != ""), nwp),
        F.when(is_partnership, short_variant),
        F.when(~is_partnership & has_public, no_space),
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


@lru_cache(maxsize=64)
def _variant_items_cached(col_name: str):
    """Memoized :func:`_variant_columns` over a named column, as an
    immutable (alias, Column) tuple so cache entries are never mutated."""
    return tuple(_variant_columns(F.col(col_name)).items())


@lru_cache(maxsize=64)
def _terms_column_cached(col_name: str) -> Column:
    """Memoized :func:`generate_search_terms` over a named column —
    the tree is large (~0.3 s of py4j build) and immutable."""
    return generate_search_terms(F.col(col_name))


def generate_search_terms(name: Column) -> Column:
    """array<string> of search variants in reference priority order —
    single-expression form, usable in any expression context.

    The assembly references every variant several times (head-array
    slots, their guards, and the trim base), and four of the variants
    embed the full core-name chain — inlined naively that multiplies
    regex evaluations exactly like the core-name chain did (the reason
    round 2 staged this behind persist barriers). Binding the variants
    ONCE as a struct through text_norm's ``_once`` combinator makes
    every downstream reference a free field read on a bound lambda
    variable: one evaluation per variant per row, no barrier, no
    Python workers (same fix as ``extract_core_name``, round 4).

    TRADE: the binding drags the variant expressions into the HOF
    INTERPRETER (codegen can't cross transform), so each single
    evaluation is slower than a codegen'd one — measured ~2× slower
    than the staged ``add_search_terms(persist=True)`` form on a
    one-consumer 27k-row leg. Use this form where an expression is
    required or barriers are unacceptable; use the staged pipeline
    form for hot legs."""
    from .text_norm import _once

    variants = _variant_columns(name)
    fields = list(variants.keys())
    return _once(
        F.struct(*[expr.alias(alias) for alias, expr in variants.items()]),
        lambda v: _assemble_terms({alias: v[alias] for alias in fields}),
    )


def add_search_terms(
    df: DataFrame,
    name_col: str = "company_name",
    out_col: str = "terms",
    persist: bool = True,
) -> DataFrame:
    """Pipeline form of :func:`generate_search_terms` — size-aware like
    ``add_core_name``:

    - ``persist=True`` (pipeline legs re-read across several join
      branches): materialize the scalar variants behind a tracked cache
      barrier (stage 1, codegen'd regexes evaluated once each), then
      assemble the array from column references (stage 2) — re-reads
      never re-run the variant regexes. Call ``release_caches()`` after
      the consuming action.
    - ``persist=False`` (small one-shot relations): the single
      expression, whose ``_once`` struct binding already evaluates each
      variant exactly once per row — no barrier to pay, nothing pinned.
      Interpreted, so per-row cost is higher than the staged form's
      (see :func:`generate_search_terms`); below ~10⁴ rows the saved
      barrier dominates.
    """
    if not persist:
        return df.withColumn(out_col, _terms_column_cached(name_col))
    from ..caching import tracked_persist

    variants = dict(_variant_items_cached(name_col))
    staged = df.select("*", *[expr.alias(alias) for alias, expr in variants.items()])
    staged = tracked_persist(staged)
    refs = {alias: F.col(alias) for alias in variants}
    out = staged.withColumn(out_col, _assemble_terms(refs))
    return out.drop(*variants.keys())


def explode_search_terms(
    df: DataFrame,
    name_col: str = "company_name",
    key_cols: tuple[str, ...] = ("p_partkey",),
    term_col: str = "term",
    rank_col: str = "strategy_rank",
) -> DataFrame:
    """One row per (key, search term) with the 1-based strategy rank —
    the exploded form of the cascade, with the fastest single-consumer
    plan: NO barrier and NO persist.

    Two plan facts make the barrier unnecessary (both pinned by
    tests/test_plans.py):

    - CollapseProject refuses to inline a lower-projection output that
      a consumer references more than once unless it is cheap, so the
      variant columns stay a separate codegen'd projection (each regex
      chain evaluated once per row) with the interpreted assembly
      reading plain attributes above it — the same shape the persist
      barrier buys, without the cache write.
    - ``posexplode`` (inner) would trigger Catalyst's
      InferFiltersFromGenerate, which infers ``size(terms) > 0`` and
      pushes it through BOTH projections, substituting the entire
      assembly tree — ~200 regex evaluations per input row in an
      interpreted Filter (measured 4-5× the whole query). The OUTER
      explode infers nothing; the null row an empty array emits is
      dropped by a post-Generate filter on the OUTPUT attribute, which
      cannot be pushed below the Generate.
    """
    variants = dict(_variant_items_cached(name_col))
    staged = df.select(
        *key_cols, *[expr.alias(alias) for alias, expr in variants.items()]
    )
    refs = {alias: F.col(alias) for alias in variants}
    out = staged.withColumn("_terms", _assemble_terms(refs))
    return (
        out.select(*key_cols, F.posexplode_outer("_terms").alias("_pos", term_col))
        .filter(F.col(term_col).isNotNull())
        .select(
            *key_cols,
            term_col,
            (F.col("_pos") + 1).cast("long").alias(rank_col),
        )
    )
