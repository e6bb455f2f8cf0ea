"""[EXT] Domain/URL-level curation: blocklist filtering and per-domain
document/token caps.

Web-corpus pipelines gate on SOURCE DOMAIN before any content-level
quality gate — blocklists (spam/adult/SEO farms), and per-domain caps
that stop one boilerplate-heavy host from dominating the corpus (the
C4/RefinedWeb recipe). The engine's per-source MIXING
(operators/mixing.py) targets output proportions across a handful of
named sources; these primitives are the upstream, finer-grained form
keyed by the (unbounded-cardinality) domain column:

- ``extract_domain``: registrable host from a raw URL — pure codegen'd
  regex, no UDF;
- ``domain_blocklist_filter``: anti-join against a blocklist relation.
  Blocklists are typically ≤ millions of rows — broadcast by default
  so the scan-side never shuffles; pass ``broadcast=False`` for a
  genuinely huge list and let AQE pick the join (a key-shuffle on
  domain);
- ``per_domain_cap``: cap every domain's kept documents (and/or
  tokens) in ABSOLUTE terms, reusing the ``cluster_balanced_sample``
  rate machinery — one small per-domain aggregate broadcast back, then
  a stateless content-hash threshold filter. Selection is keyed on
  ``sha256(salt ‖ id)`` so it is rerun- and partition-invariant and
  decorrelated from every other hash-keyed selection in the package
  (different salt). No global sort, no driver-side data; the only
  shuffle is the per-domain aggregate.

Scale note: the per-domain aggregate is a key-shuffle on domain with
map-side partial aggregation, so a skewed domain (half the crawl on
one host) costs one hot partition of COUNTING only — the filter that
follows is stateless per row. The aggregate result is |domains| rows;
web-scale corpora hold ~10^7-10^8 domains, a few hundred MB as a
broadcast — pass ``broadcast_rates=False`` beyond that to let AQE
shuffle-join the rates instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BP = 10_000  # basis points: rates are integers in [0, 10000]


def extract_domain(url: Column) -> Column:
    """Registrable host from a URL: optional scheme and userinfo
    stripped, port/path/query dropped, lowercased, leading ``www.``
    removed. Pure built-in expressions (codegen'd); malformed URLs
    yield an empty string rather than null so downstream grouping
    never mixes null semantics."""
    host = F.regexp_extract(
        url, r"^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?:[^/@?#\s]*@)?([^/:?#\s]+)", 1
    )
    return F.regexp_replace(F.lower(host), r"^www\.", "")


def domain_blocklist_filter(
    docs: DataFrame,
    blocklist: DataFrame,
    domain_col: str = "domain",
    block_col: str = "domain",
    broadcast: bool = True,
) -> DataFrame:
    """Drop every row whose ``domain_col`` appears in ``blocklist``
    (left anti join). ``broadcast=True`` (default) pins the blocklist
    broadcast — the scan side streams through without a shuffle; set
    False for a blocklist too large to broadcast and AQE plans a
    key-shuffle anti join."""
    right = blocklist.select(
        F.col(block_col).alias(domain_col)
    ).dropDuplicates([domain_col])
    if broadcast:
        right = F.broadcast(right)
    return docs.join(right, domain_col, "left_anti")


def per_domain_cap(
    docs: DataFrame,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    max_docs: int | None = None,
    max_tokens: int | None = None,
    token_col: str | None = None,
    salt: str = "domain-cap:",
    broadcast_rates: bool = True,
) -> DataFrame:
    """Cap every domain's kept rows at ``max_docs`` documents and/or
    ``max_tokens`` total tokens (``token_col`` required for the
    latter; both caps → the stricter rate wins per domain).

    Keep rate per domain = min(1, cap/|d|) in basis points with the
    same ``ceil`` arithmetic as ``cluster_balanced_sample``
    (``least(BP, ceil(BP·cap/measure))``), applied as a
    ``sha256(salt ‖ id)`` threshold filter — kept counts land within
    hash noise of the cap, selection is deterministic per (salt, id),
    and domains under their cap are kept whole. One aggregate
    (|domains| rows, broadcast back), one stateless filter.
    """
    if max_docs is None and max_tokens is None:
        raise ValueError("per_domain_cap needs max_docs and/or max_tokens")
    if max_docs is not None and max_docs < 1:
        raise ValueError(f"max_docs must be >= 1, got {max_docs}")
    if max_tokens is not None and max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if max_tokens is not None and token_col is None:
        raise ValueError("max_tokens requires token_col")

    aggs = [F.count("*").alias("_d_n")]
    if max_tokens is not None:
        aggs.append(F.sum(F.col(token_col).cast("long")).alias("_d_tok"))
    sizes = docs.groupBy(domain_col).agg(*aggs)

    rates = []
    if max_docs is not None:
        rates.append(
            F.least(
                F.lit(_BP),
                F.ceil(F.lit(_BP * max_docs) / F.col("_d_n")).cast("int"),
            )
        )
    if max_tokens is not None:
        rates.append(
            F.least(
                F.lit(_BP),
                F.ceil(
                    F.lit(_BP * max_tokens) / F.greatest(F.col("_d_tok"), F.lit(1))
                ).cast("int"),
            )
        )
    # Null-safe key: groupBy keeps a NULL-domain group, but a plain
    # equi-join would never match it back, silently dropping every
    # null-domain row even though it was counted (round-6 review, same
    # silent-vanish class as the null-text mixing bug). eqNullSafe
    # plans as an ordinary hash-join key, so the broadcast still holds;
    # null domains are capped as their own group, consistent with
    # domain_blocklist_filter keeping them.
    rate_tbl = sizes.select(
        F.col(domain_col).alias("_d_key"),
        F.least(*rates).alias("_rate_bp") if len(rates) > 1 else rates[0].alias("_rate_bp"),
    )
    if broadcast_rates:
        rate_tbl = F.broadcast(rate_tbl)
    bucket = (
        F.conv(
            F.substring(
                F.sha2(F.concat(F.lit(salt), F.col(id_col).cast("string")), 256),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _BP
    )
    return (
        docs.join(rate_tbl, F.col(domain_col).eqNullSafe(F.col("_d_key")))
        .filter(bucket < F.col("_rate_bp"))
        .drop("_d_key", "_rate_bp")
    )
