"""Incremental embedding-space (SemDeDup) dedup: survivor-vector
store, pinned-history sweep, prefix-consistency with the batch
operator, store integrity."""

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.operators.clustering import (
    _greedy_cosine_survivors,
    kmeans_fit,
    semantic_dedup,
)
from dbd_datawarehouse_scraper_spark.streaming.semantic import (
    semantic_dedup_epoch,
    stream_semantic_dedup,
)


def _vec_df(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


@pytest.fixture(scope="module")
def blobs(spark):
    # two separated blobs; ids monotone so epoch splits agree with id
    # order (the batch-parity precondition)
    rows = []
    for i in range(30):
        rows.append((i, [1.0 + 0.01 * (i % 7), 0.0, 0.01 * (i % 3)]))
    for i in range(30, 60):
        rows.append((i, [0.0, 1.0 + 0.01 * (i % 7), 0.01 * (i % 3)]))
    return _vec_df(spark, rows)


def test_pinned_sweep_history_never_dropped():
    """pinned rows survive unconditionally — even mutually-similar
    ones — and still suppress later rows; pinned=0 is the batch
    sweep."""
    mat = np.asarray(
        [
            [1.0, 0.0],  # pinned
            [1.0, 0.001],  # pinned, near-dup of row 0: still kept
            [1.0, 0.002],  # epoch row: dropped against pinned history
            [0.0, 1.0],  # epoch row: fresh, kept
        ]
    )
    keep = _greedy_cosine_survivors(mat, threshold=0.99, pinned=2)
    assert keep.tolist() == [True, True, False, True]
    # same matrix unpinned: greedy earliest-wins drops rows 1 and 2
    keep0 = _greedy_cosine_survivors(mat, threshold=0.99)
    assert keep0.tolist() == [True, False, False, True]


def test_epochs_match_batch_semantic_dedup(spark, blobs):
    """Prefix-consistency: three epochs split by id range, centers
    frozen from a full-corpus fit — accumulated epoch survivors are
    IDENTICAL to batch semantic_dedup over the union with the same
    centers (threshold low enough that real drops happen)."""
    work = tempfile.mkdtemp(prefix="sem_stream_")
    out, store = f"{work}/out", f"{work}/store"
    try:
        centers = kmeans_fit(blobs, n_clusters=2)
        epochs = [
            blobs.filter(F.col("vec_id") < 20),
            blobs.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 40)),
            blobs.filter(F.col("vec_id") >= 40),
        ]
        for i, e in enumerate(epochs):
            assert semantic_dedup_epoch(
                spark, e, i, out, store, centers=centers if i == 0 else None,
                threshold=0.999,
            )
        got = sorted(
            r["vec_id"]
            for r in spark.read.parquet(f"{out}/epoch=*").collect()
        )
        expected = sorted(
            r["vec_id"]
            for r in semantic_dedup(
                blobs, n_clusters=2, threshold=0.999, centers=centers
            ).collect()
        )
        assert got == expected
        assert len(got) < 60  # the threshold actually dropped rows
        # store holds exactly the survivors' vectors
        stored = sorted(
            r["_id"]
            # v2: epoch dirs are cluster-partitioned roots — a
            # multi-root read needs the store root declared
            for r in spark.read.option("basePath", f"{store}/vecs")
            .parquet(f"{store}/vecs/epoch=*")
            .collect()
        )
        assert stored == got
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_cross_epoch_dup_dropped_replay_idempotent(spark, blobs):
    work = tempfile.mkdtemp(prefix="sem_replay_")
    out, store = f"{work}/out", f"{work}/store"
    try:
        centers = kmeans_fit(blobs, n_clusters=2)
        e1 = blobs.filter(F.col("vec_id") < 30)
        semantic_dedup_epoch(
            spark, e1, 0, out, store, centers=centers, threshold=0.9999
        )
        # epoch 1: exact dup of id 0 (vector copied), plus a fresh row
        dup_vec = [r["embedding"] for r in e1.collect() if r["vec_id"] == 0][0]
        e2 = _vec_df(
            spark,
            [(1000, [float(x) for x in dup_vec]), (1001, [5.0, 5.0, 5.0])],
        )
        semantic_dedup_epoch(spark, e2, 1, out, store, threshold=0.9999)
        got = {
            r["vec_id"]
            for r in spark.read.parquet(f"{out}/epoch=1").collect()
        }
        assert 1000 not in got and 1001 in got
        # replaying epoch 1 (crash before streaming commit) rewrites
        # the same survivor set — no duplication, no self-suppression
        semantic_dedup_epoch(spark, e2, 1, out, store, threshold=0.9999)
        again = {
            r["vec_id"]
            for r in spark.read.parquet(f"{out}/epoch=1").collect()
        }
        assert again == got
        n_store = spark.read.parquet(f"{store}/vecs/epoch=1").count()
        assert n_store == len(got)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_store_integrity_errors_are_loud(spark, blobs):
    work = tempfile.mkdtemp(prefix="sem_guard_")
    out, store = f"{work}/out", f"{work}/store"
    try:
        centers = kmeans_fit(blobs, n_clusters=2)
        # fresh store without centers: refuse
        with pytest.raises(ValueError, match="must supply centers"):
            semantic_dedup_epoch(spark, blobs, 0, out, store)
        semantic_dedup_epoch(
            spark, blobs, 0, out, store, centers=centers, threshold=0.9999
        )
        # parameter drift: refuse
        with pytest.raises(ValueError, match="Wipe the store"):
            semantic_dedup_epoch(spark, blobs, 1, out, store, threshold=0.5)
        # different centers on resume: refuse
        other = kmeans_fit(blobs, n_clusters=2, seed=7)
        if other != centers:
            with pytest.raises(ValueError, match="different centers"):
                semantic_dedup_epoch(
                    spark, blobs, 1, out, store,
                    centers=other, threshold=0.9999,
                )
        # checkpoint reset: epoch below the store's max refuses
        semantic_dedup_epoch(spark, blobs, 5, out, store, threshold=0.9999)
        with pytest.raises(ValueError, match="checkpoint was reset"):
            semantic_dedup_epoch(spark, blobs, 2, out, store, threshold=0.9999)
        # empty epoch: no-op, returns False
        assert not semantic_dedup_epoch(
            spark, blobs.filter(F.lit(False)), 6, out, store, threshold=0.9999
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_store_folding_keeps_decisions(spark):
    """With fold_store_after=2 the survivor-vector store folds its
    committed epoch dirs mid-run; folded history must still suppress
    cross-epoch duplicates exactly like unfolded history (the
    near-dedup store pins the same property)."""
    import math

    work = tempfile.mkdtemp(prefix="sem_fold_")
    out, store = f"{work}/out", f"{work}/store"
    try:
        # distinct directions 0.1 rad apart: adjacent cosine ~0.995,
        # far below the 0.9999 threshold — only EXACT copies dedup, so
        # every epoch keeps its rows and the cross-epoch drops below
        # are attributable to the (folded) history alone
        arc = _vec_df(
            spark,
            [
                (i, [math.cos(0.1 * i), math.sin(0.1 * i), 0.0])
                for i in range(24)
            ],
        )
        centers = kmeans_fit(arc, n_clusters=2)
        slices = [arc.filter(F.col("vec_id") % 4 == i) for i in range(3)]
        for i, s in enumerate(slices):
            semantic_dedup_epoch(
                spark, s, i, out, store,
                centers=centers if i == 0 else None,
                threshold=0.9999, fold_store_after=2,
            )
        # epoch 3: exact dups of an epoch-0 and an epoch-1 survivor
        # (their vectors live in the FOLDED generation now), plus a
        # fresh far-away row
        e0 = {r["vec_id"]: r["embedding"] for r in slices[0].collect()}
        e1 = {r["vec_id"]: r["embedding"] for r in slices[1].collect()}
        surv = {
            r["vec_id"]
            for r in spark.read.parquet(f"{out}/epoch=*").collect()
        }
        d0 = next(i for i in sorted(e0) if i in surv)
        d1 = next(i for i in sorted(e1) if i in surv)
        e3 = _vec_df(
            spark,
            [
                (3000, [float(x) for x in e0[d0]]),
                (3001, [float(x) for x in e1[d1]]),
                (3002, [9.0, 9.0, 9.0]),
            ],
        )
        semantic_dedup_epoch(
            spark, e3, 3, out, store, threshold=0.9999, fold_store_after=2,
        )
        got3 = {
            r["vec_id"]
            for r in spark.read.parquet(f"{out}/epoch=3").collect()
        }
        assert got3 == {3002}
        # the store folded: fewer epoch dirs than epochs written, and
        # total stored vectors equal total survivors
        from dbd_datawarehouse_scraper_spark.fsutil import fs_list_names

        dirs = [
            n for n in fs_list_names(spark, f"{store}/vecs")
            if n.startswith("epoch=")
        ]
        assert len(dirs) < 4
        n_surv = spark.read.parquet(f"{out}/epoch=*").count()
        assert spark.read.option("basePath", f"{store}/vecs").parquet(
            f"{store}/vecs/epoch=*"
        ).count() == n_surv
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_stream_wrapper_end_to_end(spark, blobs):
    """foreachBatch wrapper: file-arrival epochs, fixed contract
    columns, cross-epoch drops through the real streaming engine."""
    from dbd_datawarehouse_scraper_spark.streaming import file_stream

    work = tempfile.mkdtemp(prefix="sem_e2e_")
    src, out, store, ckpt = (
        f"{work}/src", f"{work}/out", f"{work}/store", f"{work}/ckpt"
    )
    try:
        centers = kmeans_fit(blobs, n_clusters=2)
        e1 = blobs.filter(F.col("vec_id") < 30)
        e1.coalesce(1).write.mode("append").parquet(src)
        q = stream_semantic_dedup(
            file_stream(spark, src, e1.schema, max_files_per_trigger=1),
            out, store, ckpt, centers=centers, threshold=0.9999,
        )
        assert q.awaitTermination(180)
        dup_vec = [r["embedding"] for r in e1.collect() if r["vec_id"] == 3][0]
        e2 = _vec_df(
            spark,
            [(2000, [float(x) for x in dup_vec]), (2001, [7.0, 0.0, 7.0])],
        )
        e2.coalesce(1).write.mode("append").parquet(src)
        q2 = stream_semantic_dedup(
            file_stream(spark, src, e1.schema, max_files_per_trigger=1),
            out, store, ckpt, threshold=0.9999,
        )
        assert q2.awaitTermination(180)
        rows = spark.read.parquet(f"{out}/epoch=*")
        assert sorted(rows.columns) == ["cluster", "embedding", "vec_id"]
        got = {r["vec_id"] for r in rows.collect()}
        assert 2000 not in got and 2001 in got
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_store_v2_cluster_partitioned_layout_and_v1_refusal(spark):
    """Store v2 (round 12): vecs epoch dirs are cluster= partitioned
    (the history read's cluster filter is a partition filter — only
    directory pruning can satisfy it), an all-struck epoch's file-less
    dir is skipped by later history reads, and a v1 marker refuses
    with the wipe hint."""
    import json
    import os

    work = tempfile.mkdtemp(prefix="sem_v2_")
    out, store = f"{work}/out", f"{work}/store"
    centers = [[1.0, 0.0], [0.0, 1.0]]
    try:
        semantic_dedup_epoch(
            spark,
            _vec_df(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])]),
            0, out, store, centers=centers, threshold=0.99,
        )
        subdirs = os.listdir(f"{store}/vecs/epoch=0")
        assert any(n.startswith("cluster=") for n in subdirs)
        # epoch 1: both rows duplicate epoch 0 -> zero survivors ->
        # file-less vecs dir (only the commit marker)
        semantic_dedup_epoch(
            spark,
            _vec_df(spark, [(10, [1.0, 0.0]), (11, [0.0, 1.0])]),
            1, out, store, threshold=0.99,
        )
        names = os.listdir(f"{store}/vecs/epoch=1")
        assert not any(n.startswith("cluster=") for n in names)
        # epoch 2 still strikes against epoch 0 and keeps the new row
        semantic_dedup_epoch(
            spark,
            _vec_df(spark, [(20, [1.0, 0.0]), (21, [0.7, 0.7])]),
            2, out, store, threshold=0.99,
        )
        s2 = {r["vec_id"] for r in
              spark.read.parquet(f"{out}/epoch=2").collect()}
        assert s2 == {21}

        # v1 marker on an otherwise-valid store: refuse
        with open(f"{store}/format/part-v1.json", "w") as f:
            pass
        import glob as _glob

        marker_files = _glob.glob(f"{store}/format/*.json")
        rows = [json.loads(line)
                for p in marker_files if os.path.getsize(p)
                for line in open(p) if line.strip()]
        rows[0]["format_version"] = 1
        for p in marker_files:
            os.remove(p)
        with open(f"{store}/format/part-v1.json", "w") as f:
            f.write(json.dumps(rows[0]) + "\n")
        with pytest.raises(ValueError, match="Wipe the store"):
            semantic_dedup_epoch(
                spark,
                _vec_df(spark, [(30, [1.0, 0.0])]),
                3, out, store, threshold=0.99,
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
