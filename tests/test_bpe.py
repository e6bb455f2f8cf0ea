"""Vocab-driven BPE token counting (functions/bpe.py): exact parity
with an independent pure-Python reference on adversarial strings,
merges-file validation, Spark column wiring, resolve_token_counter /
export metering integration."""

import os

import pytest

from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.functions.bpe import (
    BpeCounter,
    _PRETOKEN,
    bpe_token_count,
    bytes_to_unicode,
    get_counter,
    load_merges,
)
from dbd_datawarehouse_scraper_spark.functions.text_analysis import (
    resolve_token_counter,
)

MERGES = os.path.join(os.path.dirname(__file__), "data", "mini_merges.txt")


# ------------------------------------------------------------- reference
# An INDEPENDENT reference coded differently from BpeCounter: builds an
# explicit pair->positions view each round via zip, merges with a
# fold-right reconstruction, uses the rank dict only through min() over
# present pairs. Same contract: greedy lowest-rank-pair merging.


def ref_count(text: str, ranks) -> int:
    b2u = bytes_to_unicode()
    total = 0
    for piece in _PRETOKEN.findall(text):
        syms = tuple(b2u[x] for x in piece.encode("utf-8"))
        while len(syms) > 1:
            present = set(zip(syms, syms[1:])) & set(ranks)
            if not present:
                break
            pair = min(present, key=ranks.__getitem__)
            merged = []
            skip = False
            for i, s in enumerate(syms):
                if skip:
                    skip = False
                    continue
                if i + 1 < len(syms) and (s, syms[i + 1]) == pair:
                    merged.append(s + syms[i + 1])
                    skip = True
                else:
                    merged.append(s)
            syms = tuple(merged)
        total += len(syms)
    return total


ADVERSARIAL = [
    "",
    "the quick brown fox jumps over the lazy dog",
    "The results that have been shared with the board are of interest.",
    'def f(x):\n    return {"k": [1, 2, 3]} if x else None  # comment',
    "for i in range(10): print(f\"value={i}\", end=\"\\n\")",
    "SELECT doc_id, COUNT(*) AS n FROM documents GROUP BY doc_id;",
    "这是一个足够长的中文句子测试数据仓库",
    "これは日本語のテスト文です。",
    "บริษัท ทดสอบ จำกัด (มหาชน)",
    "Это тест на русском языке",
    "emoji 😀😀🚀✨ and ascii",
    "mixed_text_123 __init__ snake_case_name",
    "https://example.com/path?q=1&x=2",
    "    leading and   irregular \t whitespace \n\n runs   ",
    "word" * 50,
    "a b c d e f g h",
    "don't it's we're they'll I've you'd I'm",
]


def test_counter_matches_independent_reference_on_adversarial_strings():
    ranks = load_merges(MERGES)
    counter = BpeCounter(ranks)
    for s in ADVERSARIAL:
        assert counter.count(s) == ref_count(s, ranks), repr(s)


def test_merging_actually_compresses_and_is_exact():
    ranks = load_merges(MERGES)
    counter = BpeCounter(ranks)
    # 'the' is in the training corpus: merges to fewer symbols than bytes
    assert counter.count("the") < 3
    assert counter.count("") == 0
    # an untrained byte sequence stays one token per byte
    n = counter.count("\x01\x02")
    assert n == 2
    # CJK from the training corpus compresses below its UTF-8 byte count
    assert counter.count("中文") < 6


def test_load_merges_validation(tmp_path):
    p = tmp_path / "m.txt"
    p.write_text("#version: x\n\na b\nc d\n")
    assert load_merges(str(p)) == {("a", "b"): 0, ("c", "d"): 1}
    # '#' is only a header convention on the FIRST line — a later merge
    # whose left symbol is '#' (hash-heavy training corpus) must load
    p.write_text("#version: x\na b\n# #\n")
    assert load_merges(str(p)) == {("a", "b"): 0, ("#", "#"): 1}
    p.write_text("a b c\n")
    with pytest.raises(ValueError, match="two space-separated"):
        load_merges(str(p))
    p.write_text("a b\na b\n")
    with pytest.raises(ValueError, match="duplicate"):
        load_merges(str(p))
    p.write_text("#only a header\n")
    with pytest.raises(ValueError, match="no merges"):
        load_merges(str(p))
    with pytest.raises(FileNotFoundError):
        load_merges(str(tmp_path / "missing.txt"))


def test_get_counter_caches_and_detects_rewrite(tmp_path):
    p = tmp_path / "m.txt"
    p.write_text("a b\n")
    c1 = get_counter(str(p))
    assert get_counter(str(p)) is c1
    os.utime(p, (0, 0))  # mtime change -> reload
    assert get_counter(str(p)) is not c1


def test_spark_column_counts_match_reference(spark):
    ranks = load_merges(MERGES)
    docs = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ADVERSARIAL)] + [(99, None)],
        "doc_id INT, text STRING",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", bpe_token_count(MERGES)(F.col("text")).alias("n")
        ).collect()
    }
    for i, s in enumerate(ADVERSARIAL):
        assert got[i] == ref_count(s, ranks), repr(s)
    assert got[99] == 0  # NULL text counts 0, never NULL


def test_resolve_token_counter_vocab_form(spark):
    fn = resolve_token_counter(f"vocab:{MERGES}")
    df = spark.createDataFrame([("the quick fox",)], "text STRING")
    [row] = df.select(fn(F.col("text")).alias("n")).collect()
    assert row["n"] == ref_count("the quick fox", load_merges(MERGES))
    # bad path refuses DRIVER-side at resolve time, not mid-job
    with pytest.raises(FileNotFoundError):
        resolve_token_counter("vocab:/nonexistent/merges.txt")
    with pytest.raises(ValueError, match="needs a merges path"):
        resolve_token_counter("vocab:")
    with pytest.raises(ValueError, match="unknown token counter"):
        resolve_token_counter("bpe")


def test_export_metering_with_vocab_counter(spark, tmp_path):
    """The export pipeline meters shard budgets / pack contexts /
    n_tokens in TRUE BPE tokens when token_counter='vocab:<path>' —
    exported n_tokens must equal the reference count of the exported
    text."""
    from dbd_datawarehouse_scraper_spark.caching import release_caches
    from dbd_datawarehouse_scraper_spark.plans.training_export import (
        export_training_set,
    )

    ranks = load_merges(MERGES)
    base = (
        "the results that have been shared with the board are of real "
        "interest to analysts and auditors alike and the data be good "
        "to read of and that have gone with us through the year again"
    )
    docs = spark.createDataFrame(
        [(i, f"{base} doc {i}", "en", "srcA") for i in range(30)],
        "doc_id INT, text STRING, lang STRING, source STRING",
    )
    out = str(tmp_path / "exp")
    counts = export_training_set(
        docs,
        out,
        split_fractions={"train": 1.0},
        shard_token_budget=400,
        redact=False,
        curate_kwargs={"min_quality": 0.0, "keep_langs": ("en",)},
        token_counter=f"vocab:{MERGES}",
    )
    release_caches()
    assert counts["train"] > 0
    got = spark.read.json(f"{out}/split=train").collect()
    assert len(got) == counts["train"]
    for r in got:
        assert r["n_tokens"] == ref_count(r["text"], ranks)


# ----------------------------------------------------------- training
# An INDEPENDENT reference trainer coded differently from
# bpe._train_merges: naive full-recount of pair frequencies every
# iteration (O(vocab) per merge), no incremental statistics, no word
# index. Same contract: merge the weighted most frequent adjacent
# pair, ties to the lexicographically smallest.

from dbd_datawarehouse_scraper_spark.functions.bpe import (  # noqa: E402
    _train_merges,
    bpe_train,
    save_merges,
)


def ref_train(piece_freqs, num_merges, min_pair_freq=2):
    b2u = bytes_to_unicode()
    words = [
        [[b2u[x] for x in p.encode("utf-8")], f] for p, f in piece_freqs
    ]
    merges = []
    for _ in range(num_merges):
        counts = {}
        for syms, f in words:
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + f
        if not counts:
            break
        pair, n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_freq:
            break
        merges.append(pair)
        for w in words:
            syms = w[0]
            new, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    new.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            w[0] = new
    return merges


def _corpus_pieces():
    """A deterministic piece-frequency table with overlap structure:
    repeated-letter runs (overlapping pairs), shared prefixes/suffixes
    (merge competition), multi-byte UTF-8, and a frequency gradient."""
    import random as _r

    rng = _r.Random(11)
    vocab = [" the", " than", " then", " there", "ing", "tion",
             " aaaa", "aaab", " zzz", " วัน", " 数据", "!!!", " co-op"]
    return [(p, rng.randint(1, 40) + (50 if i < 4 else 0))
            for i, p in enumerate(vocab)]


def test_train_matches_naive_reference():
    """The incremental learner's merge sequence is identical to the
    naive full-recount reference, far past the point where stale-index
    and retract/re-add bookkeeping could drift."""
    pf = _corpus_pieces()
    assert _train_merges(pf, 60, 1) == ref_train(pf, 60, 1)
    assert _train_merges(pf, 60, 2) == ref_train(pf, 60, 2)
    # overlapping-run stress: 'aaaa...' makes (a,a) self-overlapping
    pf2 = [("a" * 9, 7), ("a" * 4 + "b", 3), ("ba" * 5, 2)]
    assert _train_merges(pf2, 30, 1) == ref_train(pf2, 30, 1)


def test_first_merge_is_most_frequent_pair():
    """Hand-checkable: with ' to' × 100 and ' ta' × 1, the first merge
    must be the space-symbol+'t' pair (weight 101 — it appears in both
    pieces) and the second ('Ġt','o')."""
    b2u = bytes_to_unicode()
    sp = b2u[ord(" ")]
    merges = _train_merges([(" to", 100), (" ta", 1)], 2, 1)
    assert merges[0] == (sp, "t")
    assert merges[1] == (sp + "t", "o")


def test_train_validation():
    with pytest.raises(ValueError, match="num_merges"):
        bpe_train(None, num_merges=0)
    with pytest.raises(ValueError, match="max_pieces"):
        bpe_train(None, max_pieces=0)
    with pytest.raises(ValueError, match="min_pair_freq"):
        bpe_train(None, min_pair_freq=0)


def test_train_partition_invariant_and_empty_refusal(spark):
    docs = spark.createDataFrame(
        [(i, f"the data pipeline writes shard {i} of the data")
         for i in range(40)],
        "doc_id INT, text STRING",
    )
    m1 = bpe_train(docs, num_merges=40)
    m2 = bpe_train(docs.repartition(7), num_merges=40)
    assert m1 == m2 and len(m1) > 0
    with pytest.raises(ValueError, match="empty corpus"):
        bpe_train(
            spark.createDataFrame([], "doc_id INT, text STRING"),
            num_merges=5,
        )


def test_train_save_roundtrip_counts_and_compression(spark, tmp_path):
    """Full vocab loop: train on a corpus, save_merges, count through
    resolve_token_counter('vocab:...') — Spark counts match the
    independent reference counter under the TRAINED table, and the
    trained table actually compresses (fewer tokens than raw byte
    symbols) on in-domain text."""
    texts = [
        f"the quick data pipeline processes batch {i} of the corpus "
        f"with careful deterministic hashing" for i in range(30)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    )
    merges = bpe_train(docs, num_merges=120)
    path = str(tmp_path / "trained_merges.txt")
    save_merges(merges, path)
    ranks = load_merges(path)
    assert list(ranks) == merges  # file round-trips order exactly
    counter = resolve_token_counter(f"vocab:{path}")
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", counter(F.col("text")).alias("n")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == ref_count(t, ranks)
        raw_syms = sum(len(p.encode("utf-8")) for p in _PRETOKEN.findall(t))
        assert got[i] < raw_syms  # merges learned on-domain compress
    with pytest.raises(ValueError, match="empty merges"):
        save_merges([], str(tmp_path / "empty.txt"))


def test_train_piece_cap_on_count_plateau(spark):
    """The max_pieces cut on a count PLATEAU (every piece the same
    frequency — the replicated-corpus shape that defeated the first
    draft's power-of-two floor escalation): the exact histogram
    threshold + hash-bounded tie fill still selects exactly
    max_pieces pieces, deterministically across partitionings."""
    words = " ".join(f"pw{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(i, words) for i in range(3)], "doc_id INT, text STRING"
    )  # every piece occurs exactly 3 times -> one giant tie set
    m1 = bpe_train(docs, num_merges=15, max_pieces=20, min_pair_freq=1)
    m2 = bpe_train(
        docs.repartition(7), num_merges=15, max_pieces=20, min_pair_freq=1
    )
    assert m1 == m2 and len(m1) > 0
