"""Incremental exact-substring dedup (streaming/substrings.py):
prefix-consistency with the batch operator, cross-epoch survivor
semantics, replay idempotence, store integrity refusals."""

import tempfile

import pytest

from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.operators.substrings import substring_dedup
from dbd_datawarehouse_scraper_spark.streaming import file_stream
from dbd_datawarehouse_scraper_spark.streaming.substrings import (
    stream_substring_dedup,
    substring_dedup_epoch,
)

SPAN = " ".join(f"s{i}" for i in range(8))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stream_prefix_consistent_with_batch_and_cross_epoch_strike(spark):
    """A span seen in epoch 1 and again in epoch 2 (min_docs=2) is
    struck from epoch 2's copy while epoch 1's already-written output
    keeps it (prefix semantics); epoch 2's rows equal the BATCH
    operator over the union restricted to epoch 2."""
    work = tempfile.mkdtemp(prefix="ss_stream_")
    src, out, store, ckpt = (
        f"{work}/src", f"{work}/out", f"{work}/store", f"{work}/ckpt"
    )
    e1 = _docs(spark, [
        (1, f"{SPAN} aa bb cc dd"),
        (2, "ee ff gg hh ii jj kk ll"),
    ])
    e2 = _docs(spark, [
        (10, f"mm nn {SPAN} oo pp"),      # cross-epoch dup, offset moved
        (11, "qq rr ss tt uu vv ww xx"),
    ])
    e1.coalesce(1).write.mode("append").parquet(src)
    q = stream_substring_dedup(
        file_stream(spark, src, e1.schema, max_files_per_trigger=1),
        out, store, ckpt, min_len=8, min_docs=2,
    )
    assert q.awaitTermination(180)
    e2.coalesce(1).write.mode("append").parquet(src)
    q2 = stream_substring_dedup(
        file_stream(spark, src, e1.schema, max_files_per_trigger=1),
        out, store, ckpt, min_len=8, min_docs=2,
    )
    assert q2.awaitTermination(180)

    got1 = {r["doc_id"]: r for r in spark.read.parquet(f"{out}/epoch=0").collect()}
    got2 = {r["doc_id"]: r for r in spark.read.parquet(f"{out}/epoch=1").collect()}
    # epoch 1 was a correct prefix when written: span seen once, kept
    assert got1[1]["text"] == f"{SPAN} aa bb cc dd"
    assert got1[1]["n_removed"] == 0
    # epoch 2: cumulative doc count 2, survivor is (1, 0) -> struck
    assert got2[10]["text"] == "mm nn oo pp"
    assert got2[10]["n_removed"] == 8 and got2[10]["n_spans"] == 1
    assert got2[11]["n_removed"] == 0

    # exact prefix consistency vs the batch operator over the union
    union = e1.unionByName(e2)
    batch = {
        r["doc_id"]: r
        for r in substring_dedup(union, min_len=8, min_docs=2)
        .filter(F.col("doc_id").isin([10, 11]))
        .collect()
    }
    from dbd_datawarehouse_scraper_spark.caching import release_caches

    release_caches()
    for did in (10, 11):
        assert got2[did]["text"] == batch[did]["clean_text"], did
        assert got2[did]["n_removed"] == batch[did]["n_removed"]


def test_epoch_function_replay_and_keep_first_false(spark):
    """Replaying an epoch overwrites its own delta and output
    (idempotent); keep_first=False strikes the in-epoch copy too once
    the cumulative count crosses."""
    work = tempfile.mkdtemp(prefix="ss_epoch_")
    out, store = f"{work}/out", f"{work}/store"
    e1 = _docs(spark, [(1, f"{SPAN} k1 k2"), (2, "z1 z2 z3 z4")])
    e2 = _docs(spark, [(5, f"k3 {SPAN}")])
    assert substring_dedup_epoch(
        spark, e1, 0, out, store, min_len=8, keep_first=False
    )
    # replay epoch 0: byte-identical output, store delta not doubled
    assert substring_dedup_epoch(
        spark, e1, 0, out, store, min_len=8, keep_first=False
    )
    assert substring_dedup_epoch(
        spark, e2, 1, out, store, min_len=8, keep_first=False
    )
    got0 = {r["doc_id"]: r for r in spark.read.parquet(f"{out}/epoch=0").collect()}
    got1 = {r["doc_id"]: r for r in spark.read.parquet(f"{out}/epoch=1").collect()}
    assert got0[1]["n_removed"] == 0  # single occurrence at epoch 0
    # keep_first=False: epoch 1's copy struck (cumulative count 2)
    assert got1[5]["text"] == "k3" and got1[5]["n_removed"] == 8
    # empty epoch is a no-op
    assert not substring_dedup_epoch(
        spark, e1.filter("doc_id < 0"), 2, out, store, min_len=8
    )


def test_store_folding_merges_deltas_and_keeps_decisions(spark):
    """fold_store_after=2 with the aggregating merge (round 12): epoch
    decisions identical to the unfolded store, generation count
    bounded, and every folded generation holds ONE row per window hash
    (the merge actually aggregated — without it a generation carried
    one delta row per member epoch per hash)."""
    import shutil

    from dbd_datawarehouse_scraper_spark.fsutil import fs_exists, fs_list_names

    def run(workdir, fold):
        out, store = f"{workdir}/out", f"{workdir}/store"
        for e in range(5):
            rows = [
                (e * 100, f"{SPAN} a{e}b a{e}c"),   # span recurs every epoch
                (e * 100 + 1, f"n{e}1 n{e}2 n{e}3 n{e}4 n{e}5 n{e}6 n{e}7 n{e}8"),
            ]
            substring_dedup_epoch(
                spark, _docs(spark, rows), e, out, store,
                min_len=8, min_docs=3, fold_store_after=fold,
            )
        cleaned = sorted(
            map(tuple, spark.read.parquet(f"{out}/epoch=*").collect())
        )
        gens = [
            n for n in fs_list_names(spark, f"{store}/winstats")
            if n.startswith("epoch=")
        ]
        return cleaned, gens, store

    w1 = tempfile.mkdtemp(prefix="ss_fold_")
    w2 = tempfile.mkdtemp(prefix="ss_nofold_")
    try:
        folded, gens_f, store_f = run(w1, fold=2)
        unfolded, gens_u, _ = run(w2, fold=None)
        assert folded == unfolded, "folding changed strike decisions"
        assert len(gens_f) <= 3 and len(gens_u) == 5
        merged_gens = [
            g for g in gens_f
            if fs_exists(spark, f"{store_f}/winstats/{g}/_FOLDED_GEN")
        ]
        assert merged_gens, "no folded generation produced"
        for g in merged_gens:
            df = spark.read.parquet(f"{store_f}/winstats/{g}")
            assert df.count() == df.select(df.columns[0]).distinct().count()
    finally:
        shutil.rmtree(w1, ignore_errors=True)
        shutil.rmtree(w2, ignore_errors=True)


def test_store_integrity_refusals(spark):
    work = tempfile.mkdtemp(prefix="ss_store_")
    out, store = f"{work}/out", f"{work}/store"
    e1 = _docs(spark, [(1, f"{SPAN} tail here")])
    assert substring_dedup_epoch(spark, e1, 3, out, store, min_len=8)
    # min_len mismatch refuses (stored hashes are width-specific)
    with pytest.raises(ValueError, match="min_len"):
        substring_dedup_epoch(spark, e1, 4, out, store, min_len=9)
    # checkpoint reset: epoch below the stored max refuses
    with pytest.raises(ValueError, match="checkpoint was reset"):
        substring_dedup_epoch(spark, e1, 1, out, store, min_len=8)


def test_within_doc_flag_cumulative(spark):
    """within_doc: a window occurring twice inside one epoch-0 doc is
    struck (second copy) in that same epoch."""
    work = tempfile.mkdtemp(prefix="ss_wd_")
    out, store = f"{work}/out", f"{work}/store"
    e1 = _docs(spark, [(1, f"{SPAN} mid1 mid2 {SPAN}")])
    assert substring_dedup_epoch(
        spark, e1, 0, out, store, min_len=8, within_doc=True
    )
    [r] = spark.read.parquet(f"{out}/epoch=0").collect()
    assert r["n_removed"] == 8 and r["text"] == f"{SPAN} mid1 mid2"


def test_stream_export_substring_stage(spark, tmp_path):
    """The incremental exporter runs the substring stage per epoch:
    a span duplicated across two docs of one epoch loses its second
    copy in the exported text; the stage refuses invalid params at
    start (not on the first epoch)."""
    import glob
    import gzip
    import json

    from dbd_datawarehouse_scraper_spark.streaming import file_stream
    from dbd_datawarehouse_scraper_spark.streaming.export import (
        stream_export_training_set,
    )

    base1 = ("the board approved the statements and the auditors signed "
             "the annual report for the shareholders of this company")
    base2 = ("meanwhile the committee reviewed the findings and the experts "
             "published the quarterly summary for the investors this year")
    docs = spark.createDataFrame(
        [(1, f"{base1} {SPAN}", "s"), (2, f"{SPAN} {base2}", "s")],
        "doc_id long, text string, source string",
    )
    src = str(tmp_path / "src")
    docs.coalesce(1).write.mode("append").parquet(src)
    q = stream_export_training_set(
        file_stream(spark, src, docs.schema),
        str(tmp_path / "out"), str(tmp_path / "state"), str(tmp_path / "ckpt"),
        keep_langs=("en",), min_quality=0.0, min_tokens=1,
        substring_dedup_opts={"min_len": 8, "min_docs": 2},
    )
    assert q.awaitTermination(240)
    texts = {}
    for f in glob.glob(str(tmp_path / "out/split=*/epoch=*/shard=*/*.gz")):
        with gzip.open(f, "rt", encoding="utf-8") as fh:
            for l in fh:
                r = json.loads(l)
                texts[r["doc_id"]] = r["text"]
    assert set(texts) == {1, 2}
    assert "s0" in texts[1] and "s0" not in texts[2]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_docs"):
        stream_export_training_set(
            file_stream(spark, src, docs.schema),
            str(tmp_path / "o2"), str(tmp_path / "st2"), str(tmp_path / "ck2"),
            substring_dedup_opts={"min_len": 8, "min_docs": 1},
        )
