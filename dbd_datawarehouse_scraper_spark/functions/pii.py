"""[EXT] PII detection and redaction for training-data curation.

Pre-training corpora are routinely scrubbed of personally identifiable
information before use; the standard first-line pass is regex-family
detection of emails, phone numbers, and IP addresses with in-place
replacement tokens (the same family of rules the public C4 / RefinedWeb
/ FineWeb pipelines describe). This module is that pass as pure column
expressions — codegen'd, linear, partition-local, no shuffle, no UDF —
so it composes into any projection (the curation funnel, a
``text_features``-style suite, or streaming epochs) at 100 TB without a
Python worker in sight.

Pattern-design constraint: every pattern must mean the same thing to
Java's regex engine (Spark) and RE2 (the DuckDB oracle). That rules out
backreferences and lookaround (RE2 has none) and anything whose match
extent depends on leftmost-first vs leftmost-longest alternation
semantics — the patterns below are single-branch greedy character-class
runs, where both engines produce identical spans (pinned by the
cross-engine test in tests/test_text_functions.py).

Redaction order matters and is part of the contract: emails first (an
email's local part can contain a phone-length digit run), then IPv4
(dots would otherwise split into phone-ish fragments), then phones.
Counts are computed over the ORIGINAL text, independently per category.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Single-branch patterns, identical semantics under Java regex and RE2.
#: NO \b anywhere: Java's \b is ALWAYS Unicode-aware (independent of
#: UNICODE_CHARACTER_CLASS — a long-standing JDK quirk) while RE2's is
#: ASCII-only, so the two engines disagree whenever a digit adjoins a
#: Thai/CJK/accented letter (caught by the seeded cross-engine fuzz:
#: 'ไทย1.2.3.4' matched in DuckDB, not in Spark). A boundary-free
#: 4-octet pattern is evaluated identically by both engines; the cost —
#: matching the leading 4 octets inside longer dotted runs or version
#: strings — is acceptable for a screen and, crucially, DETERMINISTIC
#: AND EQUAL across engines.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
#: >= 8 chars total, starts/ends on a digit, optional leading +; the
#: interior may use spaces, parens, dashes (covers +1 (555) 123-4567,
#: 0812 345 678, 555-123-4567 without attempting full E.164 parsing).
PHONE_PATTERN = r"\+?[0-9][0-9 ()\-]{6,}[0-9]"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def pii_counts(col: Column) -> list[Column]:
    """Per-category PII match counts over the original text, as three
    long columns ``(n_pii_emails, n_pii_ipv4, n_pii_phones)``.
    Categories are counted independently — a digit run inside an email
    that also matches the phone pattern counts in both (deterministic,
    and what a screening report wants: "how many of each pattern")."""
    return [
        F.size(F.regexp_extract_all(col, F.lit(EMAIL_PATTERN), 0))
        .cast("long")
        .alias("n_pii_emails"),
        F.size(F.regexp_extract_all(col, F.lit(IPV4_PATTERN), 0))
        .cast("long")
        .alias("n_pii_ipv4"),
        F.size(F.regexp_extract_all(col, F.lit(PHONE_PATTERN), 0))
        .cast("long")
        .alias("n_pii_phones"),
    ]


def redact_pii(col: Column) -> Column:
    """Replace every PII match with its category token, in the fixed
    order email → IPv4 → phone (see module docstring for why the order
    is load-bearing). Pure ``regexp_replace`` chain — codegen'd."""
    out = F.regexp_replace(col, EMAIL_PATTERN, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_PATTERN, IPV4_TOKEN)
    return F.regexp_replace(out, PHONE_PATTERN, PHONE_TOKEN)


def redact_sql(col: str) -> str:
    """DuckDB mirror of :func:`redact_pii` over SQL expression ``col``
    — byte-identical pattern strings, same order, replace-all ('g').
    (RE2 accepts `\\-` inside character classes exactly like Java, so
    the patterns need no translation.)"""
    return (
        f"regexp_replace(regexp_replace(regexp_replace({col}, "
        f"'{EMAIL_PATTERN}', '{EMAIL_TOKEN}', 'g'), "
        f"'{IPV4_PATTERN}', '{IPV4_TOKEN}', 'g'), "
        f"'{PHONE_PATTERN}', '{PHONE_TOKEN}', 'g')"
    )


def counts_sql(col: str) -> str:
    """DuckDB mirrors of :func:`pii_counts` over SQL expression
    ``col`` (len(regexp_extract_all(...)), aliased identically)."""
    return (
        f"CAST(len(regexp_extract_all({col}, '{EMAIL_PATTERN}')) AS BIGINT) AS n_pii_emails, "
        f"CAST(len(regexp_extract_all({col}, '{IPV4_PATTERN}')) AS BIGINT) AS n_pii_ipv4, "
        f"CAST(len(regexp_extract_all({col}, '{PHONE_PATTERN}')) AS BIGINT) AS n_pii_phones"
    )
