"""The full batch pipeline (reference E1, scraper_v2.py:1568-1805) as
ONE lazy DataFrame DAG:

    companies → dedup → search-term fan-out → fetch UDF →
    [redirect ∪ exact-line] winners → similarity fallback →
    existing-reg bypass union → financial fetch UDF →
    placeholder/parse filters → long fact table + not-found side output

The reference's Pool.map + chunking + batch-file combine all disappear:
Catalyst/AQE schedule the stages, the write commit protocol is the
durability mechanism, and a written Parquet directory is already the
"combined" output.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..caching import tracked_persist
from ..functions.parsing import extract_regnum, match_type_label, parse_money
from ..functions.search_terms import add_search_terms
from ..operators.joins import (
    anti_join_not_found,
    existing_reg_split,
    similarity_fallback_join,
    strategy_ranked_first_match,
)
from ..operators.unpivot import FACT_COLUMNS, NOT_FOUND_COLUMNS
from ..sources.http_fetch import (
    Fetcher,
    fetch_financial_pages,
    fetch_search_results,
)

MATCH_COLUMNS = ["company_name", "registration_number", "match_type", "search_strategy"]


def match_companies(
    companies: DataFrame,
    fetcher_factory: Callable[[], Fetcher],
    conf: Mapping[str, Any],
) -> tuple[DataFrame, DataFrame]:
    """E2 as a declarative DAG. Input: (company_name,
    registration_number|null). Returns (matched, not_found_base):
    matched has MATCH_COLUMNS; not_found_base the unmatched companies.
    """
    m = conf["matching"]
    f = conf["fetch"]

    has_reg, needs_search = existing_reg_split(companies)
    existing = has_reg.select(
        "company_name",
        "registration_number",
        F.lit("existing").alias("match_type"),
        F.lit("direct").alias("search_strategy"),
    )

    with_terms = add_search_terms(needs_search.select("company_name"))
    raw = fetch_search_results(
        with_terms,
        fetcher_factory,
        max_pages=m["max_pages"],
        max_retries=f["max_retries"],
        backoff_unit=f["retry_extra_wait"],
        delay=f["delay_between_requests"],
        fetch_partitions=f.get("fetch_partitions"),
    )
    # one fetch pass feeds exact, fuzzy and anti-join branches. Explicit
    # MEMORY_AND_DISK + tracked: re-running the fetch UDF on cache miss
    # would re-hit the remote site, so this leg must spill, not evict —
    # and the pipeline's consumer (CLI / caller) releases it via
    # caching.release_caches() once the sinks are written.
    raw = tracked_persist(raw, StorageLevel.MEMORY_AND_DISK)

    redirects = raw.filter(F.col("redirect_reg").isNotNull()).select(
        "company_name",
        F.col("redirect_reg").alias("registration_number"),
        F.col("strategy_rank"),
        F.lit(True).alias("_is_redirect"),
        F.lit(1).alias("page"),
        F.lit("").alias("line"),
    )
    exact_lines = raw.filter(
        (F.col("exact_hit")) & F.col("line").isNotNull()
    ).select(
        "company_name",
        extract_regnum(F.col("line")).alias("registration_number"),
        F.col("strategy_rank"),
        F.lit(False).alias("_is_redirect"),
        "page",
        "line",
    )
    exact_all = redirects.unionByName(exact_lines)
    exact_best = strategy_ranked_first_match(
        exact_all, tiebreak_cols=("page", "line")
    ).select(
        "company_name",
        "registration_number",
        F.lit("exact").alias("match_type"),
        F.when(F.col("_is_redirect"), F.lit("direct"))
        .otherwise(F.col("strategy_rank").cast("string"))
        .alias("search_strategy"),
    )

    # Fuzzy fallback over everything the exact pass missed.
    #
    # DEVIATION (documented per SURVEY §7c): the reference issues a
    # FRESH one-page search per unmatched company on its first core
    # token and scores only that page (scraper_v2.py:1033-1043). This
    # engine instead scores the distinct candidate lines already
    # fetched during the exact passes. That pool is a SUPERSET of the
    # reference's per-company fallback page: the term cascade's
    # progressive trims (scraper_v2.py:857-866) end at the first core
    # token, and an unmatched company never early-exits, so its own
    # first-token search already ran with FULL pagination (max_pages ≥
    # the reference's 1 fallback page). Lines fetched for OTHER
    # companies also enter the pool, but the similarity join blocks on
    # first-core-token equality, so they can only match a company whose
    # own first-token search would have returned them anyway. Net
    # effect: recall ≥ reference with ZERO extra fetches (the reference
    # re-fetches the first-token page it already fetched);
    # tests/test_pipeline.py pins the superset property.
    unmatched = needs_search.join(
        exact_best.select("company_name"), "company_name", "left_anti"
    ).select("company_name")
    candidates = raw.filter(F.col("line").isNotNull()).select(
        F.col("line").alias("cand_text")
    ).distinct()
    fuzzy = similarity_fallback_join(
        unmatched,
        candidates,
        threshold=m["similarity_threshold"],
        tiebreak_cols=("cand_text",),
    ).select(
        "company_name",
        extract_regnum(F.col("cand_text")).alias("registration_number"),
        match_type_label(F.col("sim")).alias("match_type"),
        F.lit("fallback").alias("search_strategy"),
    )

    matched = existing.unionByName(exact_best).unionByName(fuzzy)
    not_found = anti_join_not_found(
        companies.select("company_name", "registration_number"),
        matched,
        reason="No search results",
    )
    return matched, not_found


def scrape_pipeline(
    companies: DataFrame,
    fetcher_factory: Callable[[], Fetcher],
    conf: Mapping[str, Any],
) -> tuple[DataFrame, DataFrame]:
    """Full E1: returns (fact, not_found) with the reference's output
    schemas (scraper_v2.py:1341, 1350)."""
    from ..config import active_fields

    matched, unmatched = match_companies(companies, fetcher_factory, conf)
    f = conf["fetch"]
    ext = conf["extraction"]

    fin = fetch_financial_pages(
        matched,
        fetcher_factory,
        profile_prefixes=tuple(f["profile_prefixes"]),
        include_balance_sheet=ext["include_balance_sheet"],
        max_retries=f["max_retries"],
        backoff_unit=f["retry_extra_wait"],
        delay=f["delay_between_requests"],
        fetch_partitions=f.get("fetch_partitions"),
    )
    # feeds both the fact table and the error channel; same
    # spill-don't-evict + tracked-release contract as the search leg
    fin = tracked_persist(fin, StorageLevel.MEMORY_AND_DISK)

    good = fin.filter(F.col("fetch_error").isNull())
    good = good.filter(~F.coalesce(F.col("raw_value"), F.lit("")).isin("-", "", "0.00"))
    good = good.withColumn("value", parse_money(F.col("raw_value"))).filter(
        F.col("value").isNotNull()
    )
    fields = active_fields(conf)
    good = good.filter(F.col("field_name").isin(fields))
    years = ext["target_years"]
    if years is not None:
        good = good.filter(F.col("year").isin(list(years)))
    fact = good.select(*FACT_COLUMNS)

    fin_errors = fin.filter(F.col("fetch_error").isNotNull()).select(
        "company_name",
        "registration_number",
        "match_type",
        "search_strategy",
        F.col("fetch_error").alias("reason"),
    )
    nf = unmatched.select(
        "company_name",
        "registration_number",
        F.lit(None).cast("string").alias("match_type"),
        F.lit(None).cast("string").alias("search_strategy"),
        "reason",
    )
    not_found = nf.unionByName(fin_errors).select(*NOT_FOUND_COLUMNS)
    return fact, not_found
