"""Incremental perceptual image dedup (streaming/image_dedup.py):
epoch-vs-history drops, replay idempotence, marker pinning, the
undecodable-image contract, and stream == batch prefix consistency on
chain-free corpora."""

import numpy as np
import pytest

from dbd_datawarehouse_scraper_spark.multimodal.media import png_encode
from dbd_datawarehouse_scraper_spark.streaming.image_dedup import (
    image_dedup_epoch,
    stream_image_dedup,
)

W, H = 24, 24


def _pixels(seed: int) -> np.ndarray:
    y, x = np.mgrid[0:H, 0:W]
    base = (
        (np.sin(x / 3.0 + seed) + np.cos(y / 4.0 + 2 * seed)) * 60 + 100
    ).astype(np.uint8)
    return np.clip(
        np.stack([base, (base + 17 * seed) % 200, base[::-1]], axis=2),
        0, 200,
    ).astype(np.uint8)


def _png(seed: int, filter_type: int = 0, shift: int = 0) -> bytes:
    px = np.clip(_pixels(seed).astype(np.int32) + shift, 0, 255).astype(
        np.uint8
    )
    return png_encode(px.tobytes(), W, H, channels=3, filter_type=filter_type)


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id long, payload binary")


def _epoch_ids(spark, out, epoch):
    return {
        r["media_id"]
        for r in spark.read.parquet(f"{out}/epoch={epoch}").collect()
    }


def test_epochs_drop_against_history_and_replay_idempotent(spark, tmp_path):
    """Epoch 2's re-encoded and brightness-shifted copies of epoch-1
    survivors drop; a replay of epoch 2 rewrites itself byte-for-byte
    (no store growth, same survivors); epoch 3 still sees exactly the
    committed history."""
    out, store = str(tmp_path / "out"), str(tmp_path / "store")
    e1 = _media(spark, [(1, _png(1)), (2, _png(2)), (3, _png(3))])
    assert image_dedup_epoch(spark, e1, 1, out, store, codec="png")
    assert _epoch_ids(spark, out, 1) == {1, 2, 3}

    e2 = _media(spark, [
        (10, _png(1, filter_type=2)),   # re-encoded dup of 1 -> drop
        (11, _png(2, shift=30)),        # brightness dup of 2 -> drop
        (12, _png(9)),                  # new -> survive
    ])
    assert image_dedup_epoch(spark, e2, 2, out, store, codec="png")
    assert _epoch_ids(spark, out, 2) == {12}
    n_store = spark.read.parquet(f"{store}/hashes").count()

    # replay epoch 2 (crash-before-commit): identical output, no dup rows
    assert image_dedup_epoch(spark, e2, 2, out, store, codec="png")
    assert _epoch_ids(spark, out, 2) == {12}
    assert spark.read.parquet(f"{store}/hashes").count() == n_store

    e3 = _media(spark, [
        (20, _png(9, filter_type=4)),   # dup of epoch-2 survivor -> drop
        (21, _png(3, filter_type=1)),   # dup of epoch-1 survivor -> drop
        (22, _png(15)),                 # new -> survive
    ])
    assert image_dedup_epoch(spark, e3, 3, out, store, codec="png")
    assert _epoch_ids(spark, out, 3) == {22}
    # empty epochs write nothing
    assert not image_dedup_epoch(
        spark, _media(spark, []), 4, out, store, codec="png"
    )


def test_undecodable_images_survive_but_never_suppress(spark, tmp_path):
    """A corrupt payload survives its own epoch (nothing comparable
    about it) and is NOT stored — an identical corrupt payload in the
    next epoch also survives (no hash, no suppression), per the batch
    operator's keep-undecodable contract."""
    out, store = str(tmp_path / "out"), str(tmp_path / "store")
    e1 = _media(spark, [(1, _png(1)), (2, b"not a png")])
    image_dedup_epoch(spark, e1, 1, out, store, codec="png")
    assert _epoch_ids(spark, out, 1) == {1, 2}
    assert spark.read.parquet(f"{store}/hashes").count() == 1  # only id 1
    e2 = _media(spark, [(10, b"not a png")])
    image_dedup_epoch(spark, e2, 2, out, store, codec="png")
    assert _epoch_ids(spark, out, 2) == {10}


def test_store_marker_pins_codec_and_radius(spark, tmp_path):
    out, store = str(tmp_path / "out"), str(tmp_path / "store")
    image_dedup_epoch(
        spark, _media(spark, [(1, _png(1))]), 1, out, store, codec="png"
    )
    with pytest.raises(ValueError, match="image-hash store"):
        image_dedup_epoch(
            spark, _media(spark, [(2, _png(2))]), 2, out, store,
            codec="fake",
        )
    with pytest.raises(ValueError, match="image-hash store"):
        image_dedup_epoch(
            spark, _media(spark, [(2, _png(2))]), 2, out, store,
            codec="png", max_hamming=5,
        )
    # checkpoint reset against a populated store refuses
    with pytest.raises(ValueError, match="checkpoint"):
        image_dedup_epoch(
            spark, _media(spark, [(2, _png(2))]), 0, out, store,
            codec="png",
        )


def test_stream_matches_batch_on_chain_free_corpus(spark, tmp_path):
    """On a corpus whose duplicate clusters sit within max_hamming of
    their surviving minimum (no transitive chains) and whose ids order
    by epoch, the 2-epoch stream keeps exactly the batch operator's
    survivors over the union."""
    from dbd_datawarehouse_scraper_spark.multimodal.image_dedup import (
        image_near_dedup,
    )

    e1 = [(1, _png(1)), (2, _png(2)), (3, _png(1, filter_type=2))]
    e2 = [(10, _png(2, shift=25)), (11, _png(7)), (12, _png(7, filter_type=4))]
    out, store = str(tmp_path / "out"), str(tmp_path / "store")
    image_dedup_epoch(spark, _media(spark, e1), 1, out, store, codec="png")
    image_dedup_epoch(spark, _media(spark, e2), 2, out, store, codec="png")
    stream_kept = _epoch_ids(spark, out, 1) | _epoch_ids(spark, out, 2)
    batch_kept = {
        r["media_id"]
        for r in image_near_dedup(
            _media(spark, e1 + e2), codec="png", max_hamming=3
        ).collect()
    }
    assert stream_kept == batch_kept == {1, 2, 11}


def test_stream_wrapper_end_to_end(spark, tmp_path):
    """The foreachBatch wrapper drains a file stream: duplicates of
    first-epoch survivors never export; rerunning over the same files
    adds nothing."""
    from dbd_datawarehouse_scraper_spark.streaming import file_stream

    src = str(tmp_path / "src")
    _media(spark, [(1, _png(1)), (2, _png(1, filter_type=2)), (3, _png(4))]) \
        .coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    out, store, ckpt = (
        str(tmp_path / "out"), str(tmp_path / "store"), str(tmp_path / "ckpt")
    )
    q = stream_image_dedup(
        file_stream(spark, src, schema), out, store, ckpt, codec="png"
    )
    assert q.awaitTermination(240)
    kept = {
        r["media_id"]
        for r in spark.read.option("basePath", out).parquet(f"{out}/epoch=*")
        .collect()
    }
    assert kept == {1, 3}


def test_marker_pins_resolved_codec_and_bad_codec_never_poisons(
    spark, tmp_path
):
    """The marker pins the RESOLVED kernel: a store built with
    codec='auto' (resolving to the stub here — no Pillow) resumes with
    the equivalent explicit codec and refuses a different kernel; a
    typo'd codec refuses BEFORE writing a marker, so the intended
    codec still initializes the same fresh store path."""
    out, store = str(tmp_path / "out"), str(tmp_path / "store")
    with pytest.raises(ValueError, match="unknown codec"):
        image_dedup_epoch(
            spark, _media(spark, [(1, _png(1))]), 1, out, store,
            codec="jpeg",
        )
    # the refusal left no marker: png still initializes this path
    image_dedup_epoch(
        spark, _media(spark, [(1, _png(1))]), 1, out, store, codec="png"
    )
    out2, store2 = str(tmp_path / "o2"), str(tmp_path / "s2")
    image_dedup_epoch(
        spark, _media(spark, [(1, _png(1))]), 1, out2, store2, codec="auto"
    )
    # auto resolved to the stub (no Pillow in this env): 'fake' resumes
    from dbd_datawarehouse_scraper_spark.multimodal.media import (
        _pil_importable,
    )

    resolved = "pil" if _pil_importable() else "fake"
    image_dedup_epoch(
        spark, _media(spark, [(2, _png(2))]), 2, out2, store2,
        codec=resolved,
    )
    with pytest.raises(ValueError, match="image-hash store"):
        image_dedup_epoch(
            spark, _media(spark, [(3, _png(3))]), 3, out2, store2,
            codec="png",
        )


def test_out_schema_marker_refuses_column_drift(spark, tmp_path):
    """The stream wrapper pins (id_col, payload_col) under
    out_path/_schema — resuming the same out_path with different
    column names refuses instead of mixing schemas across epochs."""
    from dbd_datawarehouse_scraper_spark.streaming import file_stream

    src = str(tmp_path / "src")
    _media(spark, [(1, _png(1))]).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    out, store, ckpt = (
        str(tmp_path / "out"), str(tmp_path / "store"), str(tmp_path / "c1")
    )
    q = stream_image_dedup(
        file_stream(spark, src, schema), out, store, ckpt, codec="png"
    )
    assert q.awaitTermination(240)
    renamed = spark.read.parquet(src).withColumnRenamed("media_id", "img_id")
    rsrc = str(tmp_path / "rsrc")
    renamed.coalesce(1).write.mode("append").parquet(rsrc)
    with pytest.raises(ValueError, match="mix\\s+schemas|mix schemas"):
        stream_image_dedup(
            file_stream(spark, rsrc, renamed.schema),
            out, str(tmp_path / "s3"), str(tmp_path / "c2"),
            id_col="img_id", codec="png",
        )


def test_history_probe_broadcast_and_merge_paths_identical(spark, tmp_path):
    """The cross-form history probe's two physical plans — broadcast
    of the batch's blocked relation (micro-batch default) vs the merge
    join (past BROADCAST_PROBE_MAX_HASHES) — must drop identical ids
    (the threshold only picks a plan; round-12 discipline shared with
    the near-dup and link stores)."""
    import shutil

    from dbd_datawarehouse_scraper_spark.streaming import image_dedup as mod

    e0 = _media(spark, [(1, _png(1)), (2, _png(2)), (3, _png(3))])
    # epoch 1: re-encodes of 1 and 2 (history near-dups) + one new
    e1 = _media(
        spark,
        [(10, _png(1, filter_type=1)), (11, _png(2, shift=1)),
         (12, _png(9))],
    )
    got = {}
    for label, thr in (("broadcast", 1_000_000), ("merge", 0)):
        out = str(tmp_path / f"out_{label}")
        store = str(tmp_path / f"store_{label}")
        orig = mod.BROADCAST_PROBE_MAX_HASHES
        mod.BROADCAST_PROBE_MAX_HASHES = thr
        try:
            image_dedup_epoch(spark, e0, 0, out, store, codec="png")
            image_dedup_epoch(spark, e1, 1, out, store, codec="png")
        finally:
            mod.BROADCAST_PROBE_MAX_HASHES = orig
        got[label] = _epoch_ids(spark, out, 1)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(store, ignore_errors=True)
    assert got["broadcast"] == got["merge"] == {12}
