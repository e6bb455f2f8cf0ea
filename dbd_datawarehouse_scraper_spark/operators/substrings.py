"""[EXT] Exact-substring (variable-length duplicated span) dedup.

The published standard for training corpora (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better") removes
every duplicated substring of at least ``min_len`` tokens, keeping one
copy. :mod:`.segments` approximates this with FIXED, NON-OVERLAPPING
``k``-token chunks, so a duplicated span that straddles a chunk
boundary — or whose length differs from ``k`` — survives. This module
implements the variable-length form exactly at token granularity,
using a sorted-shingle-run construction instead of a literal suffix
array (which is inherently sequential and does not shard):

    a token is inside some duplicated substring of ``>= min_len``
    tokens  ⟺  it is covered by at least one duplicated
    ``min_len``-token window.

(⇒: any ``min_len``-window of a duplicated span containing the token
is itself duplicated, with the same partner. ⇐: a duplicated window IS
a duplicated substring of exactly ``min_len`` tokens.) So emitting
every OVERLAPPING ``min_len``-token window, finding the windows that
repeat, and striking the tokens they cover removes exactly the
maximal duplicated spans — whatever their length and alignment.

Scale shape (100 TB honest):

- per-document window hashing is an Arrow-batched rolling hash —
  O(tokens) per document, partition-local, no text re-reads;
- the occurrence relation is (id, pos, hash) — ~24 bytes/row, one row
  per token; its frequency groupBy combines map-side and shuffles
  8-byte keys, never window text;
- the duplicated-window set is Zipf-small; AQE broadcasts the mark
  join when it fits, else it's a narrow shuffle join on the hash;
- marked positions fold to one int array per affected document
  (bounded by that document's token count), and the rewrite join
  touches each document's text exactly once (broadcast when the
  affected set is small — document text never shuffles).

Hashing: a 64-bit polynomial rolling hash over per-token blake2b-64
values. A collision merges two windows' occurrence lists (P ≈ n²/2⁶⁴)
— the same exposure every hash-keyed dedup in this package accepts,
and the reason the operator never compares window TEXT.

No driver-side traffic (no collect anywhere).
"""

from __future__ import annotations

import re as _re
from functools import lru_cache
from hashlib import blake2b

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java's \s is ASCII-only; tokenize exactly like the package's
# split(trim(col), '\s+') so token positions agree with every other
# token-level operator (see functions/text_analysis.py).
_ASCII_WS = _re.compile(r"[ \t\n\x0b\f\r]+")

#: Rolling-hash multiplier (the 64-bit FNV prime — odd, so it is
#: invertible mod 2^64 and the prefix-difference form below is exact).
_B = 0x100000001B3
_MASK = (1 << 64) - 1
_BINV = pow(_B, -1, 1 << 64)

_ID, _POS, _H = "_ss_id", "_ss_pos", "_ss_h"


#: Process-level token→hash memo (the bpe.py per-piece trick): natural
#: text repeats tokens heavily (Zipf), so the blake2b call — the one
#: per-row Python loop in this kernel — runs once per DISTINCT token
#: per executor process, not once per token occurrence. Bounded: at the
#: cap the memo is dropped wholesale (distinct-token working sets are
#: small; a miss just re-hashes).
_HASH_MEMO: dict[str, int] = {}
_HASH_MEMO_CAP = 1 << 21  # ~2M distinct tokens ≈ low hundreds of MB worst case


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """64-bit blake2b per token (deterministic across processes —
    Python's builtin ``hash`` is salted per run and unusable here),
    memoized per distinct token across the executor process."""
    memo = _HASH_MEMO
    if len(memo) > _HASH_MEMO_CAP:
        memo.clear()
    get = memo.get
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = get(t)
        if h is None:
            h = int.from_bytes(
                blake2b(t.encode("utf-8"), digest_size=8).digest(), "big"
            )
            memo[t] = h
        out[i] = h
    return out


def _window_hashes(tokens: list[str], k: int) -> np.ndarray:
    """H(i) = Σ_{j=0..k-1} hash(token[i+j])·B^(k-1-j)  (mod 2^64) for
    every start position i — the polynomial rolling hash, computed in
    O(n) via the invertible-multiplier prefix trick: with
    S(m) = Σ_{j<m} t[j]·B^(-j), H(i) = B^(k-1+i)·(S(i+k) − S(i)).
    All arithmetic wraps in uint64 (C semantics), fully vectorized."""
    n = len(tokens)
    if n < k:
        return np.empty(0, dtype=np.int64)
    t = _token_hashes(tokens)
    jp = np.full(n, _BINV, dtype=np.uint64)
    jp[0] = 1
    jp = np.cumprod(jp)  # B^(-j), wrapping
    s = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(t * jp, out=s[1:])
    d = s[k:] - s[: n - k + 1]  # S(i+k) - S(i), wrapping
    bp = np.full(n - k + 1, _B, dtype=np.uint64)
    bp[0] = pow(_B, k - 1, 1 << 64)
    bp = np.cumprod(bp)  # B^(k-1+i)
    return (d * bp).astype(np.int64)  # bit-pattern view for Spark LONG


@lru_cache(maxsize=None)
def _window_hash_udf(k: int):
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    @pandas_udf(ArrayType(LongType()))
    def _wh(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            toks = [x for x in _ASCII_WS.split(t) if x]
            out.append(_window_hashes(toks, k).tolist())
        return pd.Series(out)

    return _wh


def _merge_spans(marks: list[int], k: int) -> list[tuple[int, int]]:
    """Merge marked window starts into maximal covered token intervals
    [start, end] (each mark covers [p, p+k-1]); ``marks`` is sorted."""
    spans: list[tuple[int, int]] = []
    for p in marks:
        if spans and p <= spans[-1][1] + 1:
            spans[-1] = (spans[-1][0], max(spans[-1][1], p + k - 1))
        else:
            spans.append((p, p + k - 1))
    return spans


@lru_cache(maxsize=None)
def _strike_udf(k: int):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(
        "clean_text string, n_tokens long, n_removed long, n_spans int"
    )
    def _strike(texts: pd.Series, marks: pd.Series) -> pd.DataFrame:
        rows = []
        for t, m in zip(texts, marks):
            if t is None:
                rows.append(("", 0, 0, 0))
                continue
            toks = [x for x in _ASCII_WS.split(t) if x]
            if m is None or len(m) == 0:
                # untouched documents keep their ORIGINAL text
                # byte-identical (reassembly would collapse whitespace)
                rows.append((t, len(toks), 0, 0))
                continue
            spans = _merge_spans(sorted(int(p) for p in m), k)
            keep = []
            prev_end = -1
            removed = 0
            for a, b in spans:
                keep.extend(toks[prev_end + 1 : a])
                removed += min(b, len(toks) - 1) - a + 1
                prev_end = b
            keep.extend(toks[prev_end + 1 :])
            rows.append((" ".join(keep), len(toks), removed, len(spans)))
        return pd.DataFrame(
            rows, columns=["clean_text", "n_tokens", "n_removed", "n_spans"]
        )

    return _strike


def validate_substring_params(min_len: int, min_docs: int) -> None:
    """THE one validation of the substring-dedup parameters — the
    batch operator AND both streaming entry points call it (a
    min_docs=1 would mark EVERY window duplicated and strike
    essentially all text; min_len=0 degenerates every window hash to
    the same value and, in the stream, would poison the store
    marker)."""
    if min_len < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")


def window_occurrences(
    docs: DataFrame, id_col: str, text_col: str, min_len: int
) -> DataFrame:
    """(_ss_id, _ss_pos, _ss_h): one row per overlapping ``min_len``-
    token window. posexplode_outer + null filter on the OUTPUT
    attribute (the package-wide InferFiltersFromGenerate guard);
    documents shorter than ``min_len`` tokens emit no occurrence rows
    — they cannot contain a qualifying span and survive via the final
    left join."""
    from .skew import widen_partitions

    return (
        widen_partitions(docs)
        .select(
            F.col(id_col).alias(_ID),
            F.posexplode_outer(
                _window_hash_udf(min_len)(F.col(text_col))
            ).alias(_POS, _H),
        )
        .filter(F.col(_H).isNotNull())
    )


def duplicated_windows(
    occ: DataFrame, min_docs: int, within_doc: bool
) -> DataFrame:
    """(_ss_h, _ss_surv_id, _ss_surv_pos) for windows occurring in
    ``>= min_docs`` distinct documents (or ``>= 2`` times anywhere when
    ``within_doc``). The survivor is the globally first occurrence —
    min(struct(id, pos)) — a deterministic total order."""
    cond = F.col("_ss_nd") >= min_docs
    if within_doc:
        cond = cond | (F.col("_ss_n") >= 2)
    return (
        occ.groupBy(_H)
        .agg(
            F.count_distinct(F.col(_ID)).alias("_ss_nd"),
            F.count("*").alias("_ss_n"),
            F.min(F.struct(F.col(_ID), F.col(_POS))).alias("_ss_surv"),
        )
        .filter(cond)
        .select(
            _H,
            F.col(f"_ss_surv.{_ID}").alias("_ss_surv_id"),
            F.col(f"_ss_surv.{_POS}").alias("_ss_surv_pos"),
        )
    )


def marked_positions(
    occ: DataFrame, dup: DataFrame, keep_first: bool
) -> DataFrame:
    """Occurrences to strike: join the duplicated-window set (with its
    survivor) onto the occurrence relation; under ``keep_first`` the
    survivor occurrence itself is exempt. Shared by the batch operator
    and the incremental epoch (streaming/substrings.py), so their
    marking semantics cannot drift."""
    marked = occ.join(dup, _H)
    if keep_first:
        marked = marked.filter(
            ~(
                (F.col(_ID) == F.col("_ss_surv_id"))
                & (F.col(_POS) == F.col("_ss_surv_pos"))
            )
        )
    return marked


def apply_strikes(
    docs: DataFrame,
    marked: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int,
) -> DataFrame:
    """Fold marked positions per document and rewrite the text: returns
    ``docs`` (minus ``text_col``) joined with the strike kernel's
    ``_ss_out`` struct (clean_text, n_tokens, n_removed, n_spans) —
    callers select their own output shape. The marks side sits behind
    an aggregation exchange, so AQE sizes its join strategy from the
    materialized stage (broadcast when the affected set is small —
    document text never shuffles then). Shared by batch + streaming."""
    marks = marked.groupBy(_ID).agg(
        F.sort_array(F.collect_list(F.col(_POS))).alias("_ss_marks")
    )
    struck = _strike_udf(min_len)(F.col(text_col), F.col("_ss_marks"))
    return docs.join(marks, docs[id_col] == marks[_ID], "left").withColumn(
        "_ss_out", struck
    )


def substring_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 50,
    min_docs: int = 2,
    keep_first: bool = True,
    within_doc: bool = False,
) -> DataFrame:
    """Remove every duplicated token span of at least ``min_len``
    tokens (Lee et al. 2022 semantics at token granularity), keeping
    the globally first occurrence when ``keep_first`` (min (id, pos)
    order — deterministic), or striking ALL occurrences when not (the
    boilerplate-removal form, like :func:`..segments.segment_dedup`).

    ``min_docs`` is the cross-document threshold (a span must appear
    in that many distinct documents); ``within_doc=True`` additionally
    treats a span repeated ``>= 2`` times anywhere — including twice
    inside ONE document — as duplicated (the full Lee et al. rule).

    Returns EXACTLY one row per input row: (id_col, clean_text,
    n_tokens, n_removed, n_spans). Untouched documents keep their
    original text byte-identical; struck documents are reassembled
    from the surviving tokens joined with single spaces (token-level
    granularity — the documented approximation vs the paper's byte
    offsets). Overlapping duplicated spans merge, so ``n_spans``
    counts maximal covered intervals and ``n_removed`` tokens are
    never double-counted.

    ``id_col`` must be unique and non-null: it keys the survivor
    order and the rewrite join.
    """
    validate_substring_params(min_len, min_docs)
    from ..caching import tracked_persist

    # occurrences feed BOTH the frequency aggregate and the mark join —
    # persist the narrow (id, pos, hash) relation (tracked; callers
    # release via caching.release_caches()) so window hashing runs once
    occ = tracked_persist(window_occurrences(docs, id_col, text_col, min_len))
    dup = duplicated_windows(occ, min_docs, within_doc)
    marked = marked_positions(occ, dup, keep_first)
    return (
        apply_strikes(docs, marked, id_col, text_col, min_len)
        .select(
            id_col,
            F.col("_ss_out.clean_text").alias("clean_text"),
            F.col("_ss_out.n_tokens").alias("n_tokens"),
            F.col("_ss_out.n_removed").alias("n_removed"),
            F.col("_ss_out.n_spans").alias("n_spans"),
        )
    )
