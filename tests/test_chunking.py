"""Sliding-window document chunking: fuzz vs a pure-Python model,
edge semantics (subset tails, short docs, empties), validation."""

import random

import pytest
from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.operators.chunking import chunk_documents


def _model(text, window, stride, min_tokens):
    """Pure-Python reference: the documented window-start semantics."""
    toks = text.split()
    n = len(toks)
    out = []
    if n == 0:
        return out
    idx = 0
    for start in range(0, n, stride):
        first = start == 0
        full = start + window <= n
        needed_tail = start - stride + window < n
        if not (first or full or needed_tail):
            continue
        piece = toks[start : start + window]
        if not first and len(piece) < min_tokens:
            continue
        out.append((idx, len(piece), " ".join(piece)))
        idx += 1
    return out


def _chunks(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {}
    for r in chunk_documents(df, **kw).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_tokens"], r["chunk_text"])
        )
    return {k: sorted(v) for k, v in got.items()}


def test_chunking_matches_python_model_fuzz(spark):
    rng = random.Random(11)
    texts = []
    for _ in range(120):
        n = rng.choice([0, 1, 3, 7, 15, 16, 17, 31, 32, 33, 64, 100, 250])
        sep = rng.choice([" ", "  ", "\n", "\t", " \n "])
        body = sep.join(f"w{rng.randrange(50)}" for _ in range(n))
        # random edge whitespace: trim() strips only spaces, so a
        # trailing newline once produced a phantom '' token that
        # shifted every boundary (reviewed with a repro)
        texts.append(rng.choice(["", " ", "\n", "\t "]) + body
                     + rng.choice(["", " ", "\n", "  \n"]))
    for window, stride, mt in [(16, 8, 4), (32, 32, 1), (64, 48, 8)]:
        got = _chunks(
            spark, texts, window=window, stride=stride, min_tokens=mt
        )
        for i, t in enumerate(texts):
            expect = sorted(_model(t, window, stride, mt))
            assert got.get(i, []) == expect, (i, window, stride, mt)


def test_chunking_edge_semantics(spark):
    # 500 tokens at window 512 / stride 384: ONE chunk, no subset tail
    t500 = " ".join(f"t{i}" for i in range(500))
    got = _chunks(spark, [t500], window=512, stride=384)
    assert len(got[0]) == 1 and got[0][0][1] == 500
    # 600 tokens: full first window + the needed 216-token tail
    t600 = " ".join(f"t{i}" for i in range(600))
    got = _chunks(spark, [t600], window=512, stride=384)
    assert [(c[0], c[1]) for c in got[0]] == [(0, 512), (1, 216)]
    # overlap carries the stride boundary: tail starts at token 384
    assert got[0][1][2].split()[0] == "t384"
    # chunk_idx is contiguous even under min_tokens tail drops
    t40 = " ".join(f"t{i}" for i in range(40))
    got = _chunks(spark, [t40], window=16, stride=16, min_tokens=10)
    assert [c[0] for c in got[0]] == [0, 1]  # 8-token tail dropped
    # short, empty and whitespace-only docs: one chunk / zero chunks
    # (including non-space whitespace — '\n' is NOT a token)
    got = _chunks(
        spark, ["one two", "", "   ", "\n", "\t\n "], window=16, stride=8
    )
    assert got[0] == [(0, 2, "one two")]
    for i in (1, 2, 3, 4):
        assert i not in got
    # a trailing newline must not shift boundaries: 16 real tokens at
    # window 16 is exactly ONE chunk either way
    t16 = " ".join(f"t{i}" for i in range(16))
    a = _chunks(spark, [t16], window=16, stride=8)
    b = _chunks(spark, [t16 + "\n"], window=16, stride=8)
    assert a == b and len(a[0]) == 1 and a[0][0][1] == 16


def test_chunking_keeps_provenance_and_validates(spark):
    df = spark.createDataFrame(
        [(7, "s1", "a b c d e f")], "doc_id long, source string, text string"
    )
    out = chunk_documents(df, window=4, stride=2, min_tokens=2)
    rows = out.collect()
    assert out.columns == ["doc_id", "source", "chunk_idx", "chunk_tokens", "chunk_text"]
    assert all(r["source"] == "s1" for r in rows)
    with pytest.raises(ValueError, match="window"):
        chunk_documents(df, window=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, window=8, stride=9)
    with pytest.raises(ValueError, match="min_tokens"):
        chunk_documents(df, min_tokens=0)
    # min_tokens above the window would silently drop every non-first
    # chunk (full middle windows included) — refuse instead
    with pytest.raises(ValueError, match="min_tokens"):
        chunk_documents(df, window=24, stride=18, min_tokens=32)
