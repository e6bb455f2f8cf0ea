"""Perceptual image near-dedup (multimodal/image_dedup.py): dHash
invariance to re-encoding and brightness shift, block-permutation
pairs EXACTLY matching brute-force Hamming search, component-survivor
semantics, and the per-row decode error channel."""

import numpy as np
import pytest

from dbd_datawarehouse_scraper_spark.multimodal.image_dedup import (
    HASH_H,
    HASH_W,
    _dhash_bits,
    dhash_media,
    image_near_dedup,
    image_near_dup_pairs,
)
from dbd_datawarehouse_scraper_spark.multimodal.media import png_encode

W, H = 24, 24


def _pixels(seed: int) -> np.ndarray:
    """Deterministic structured RGB image: low-frequency pattern (so
    the 9×8 downsample keeps real gradients), values capped at 200 so
    brightness shifts below +55 cannot clip."""
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


def _brute_pairs(hashes: dict, d: int):
    out = set()
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if hashes[a] is None or hashes[b] is None:
                continue
            ham = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
            if ham <= d:
                out.add((a, b))
    return out


def test_dhash_reencoding_and_brightness_invariance(spark):
    """Same pixels through PNG filter types 0/2/4 hash IDENTICALLY
    (the duplicate class byte-exact dedup misses), and a +40
    brightness shift without clipping preserves every gradient sign
    (Hamming 0)."""
    rows = [
        (0, _png(1, filter_type=0)),
        (1, _png(1, filter_type=2)),
        (2, _png(1, filter_type=4)),
        (3, _png(1, shift=40)),
        (4, _png(5)),  # a different image
    ]
    got = {
        r["media_id"]: (r["dhash"], r["dhash_error"])
        for r in dhash_media(_media(spark, rows), codec="png").collect()
    }
    assert all(err is None for _, err in got.values())
    assert got[0][0] == got[1][0] == got[2][0] == got[3][0]
    assert got[4][0] != got[0][0]
    # bytes genuinely differ (dHash is doing the work, not byte equality)
    assert rows[0][1] != rows[1][1] != rows[2][1]


def test_dhash_bits_known_grid():
    """Hand-checkable packing: a strictly increasing luma row sets all
    its gradient bits; a constant row sets none."""
    grid = np.zeros((HASH_H, HASH_W + 1), dtype=np.uint8)
    grid[0] = np.arange(HASH_W + 1) * 10  # row 0: all bits on
    h = _dhash_bits(grid.tobytes())
    assert (h >> 56) & 0xFF == 0xFF  # first packed byte (row 0)
    assert h & ((1 << 56) - 1) == 0  # all other rows constant → 0


def test_pairs_match_bruteforce_exactly(spark):
    """The block-permutation candidate set is pigeonhole-exhaustive:
    over 40 structured images + planted near-dup variants, the blocked
    pairs EQUAL brute-force all-pairs Hamming search at the same
    threshold — no missed pair, no extra pair."""
    rows = [(i, _png(i)) for i in range(40)]
    rows += [(1000 + i, _png(i, filter_type=2)) for i in range(0, 40, 5)]
    rows += [(2000 + i, _png(i, shift=35)) for i in range(0, 40, 7)]
    media = _media(spark, rows)
    for d in (0, 3):
        hashes = {
            r["media_id"]: r["dhash"]
            for r in dhash_media(media, codec="png").collect()
        }
        py = {k: (v if v is None else v & ((1 << 64) - 1)) for k, v in hashes.items()}
        got = {
            (r["id_a"], r["id_b"])
            for r in image_near_dup_pairs(
                media, codec="png", max_hamming=d
            ).collect()
        }
        assert got == _brute_pairs(py, d), f"mismatch at d={d}"
    # the planted variants were actually found (non-trivial pair set)
    assert any(a % 5 == 0 and b == 1000 + a for a, b in got)


def test_near_dedup_survivors_and_transitive_cluster(spark):
    """One survivor (minimum id) per connected component — including
    the transitive A~B~C case; untouched images all survive."""
    rows = [
        (10, _png(3)),
        (11, _png(3, filter_type=2)),   # dup of 10
        (12, _png(3, shift=30)),        # dup of 10 and 11
        (20, _png(8)),
        (30, _png(9)),
    ]
    kept = {
        r["media_id"]
        for r in image_near_dedup(
            _media(spark, rows), codec="png", max_hamming=3
        ).collect()
    }
    assert kept == {10, 20, 30}


def test_decode_error_channel_and_null_hash_never_pairs(spark):
    """A corrupt payload NULLs its own hash with a message (never the
    partition) and is excluded from pairing but KEPT by the dedup."""
    rows = [
        (0, _png(2)),
        (1, _png(2, filter_type=1)),
        (2, b"not a png at all"),
        (3, None),
    ]
    got = {
        r["media_id"]: (r["dhash"], r["dhash_error"])
        for r in dhash_media(_media(spark, rows), codec="png").collect()
    }
    assert got[0][1] is None and got[1][1] is None
    assert got[2][0] is None and "PNG" in got[2][1]
    assert got[3][0] is None and got[3][1]
    pairs = image_near_dup_pairs(_media(spark, rows), codec="png").collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(0, 1)}
    kept = {
        r["media_id"]
        for r in image_near_dedup(_media(spark, rows), codec="png").collect()
    }
    assert kept == {0, 2, 3}


def test_fake_codec_plumbing(spark):
    """The stub codec exercises the identical plan (schema, batching,
    error channel) without image libraries — identical payloads hash
    identically, distinct ones (generically) differ."""
    rows = [(0, b"abcdef" * 40), (1, b"abcdef" * 40), (2, b"zyxw" * 77)]
    got = {
        r["media_id"]: r["dhash"]
        for r in dhash_media(_media(spark, rows), codec="fake").collect()
    }
    assert got[0] == got[1]
    assert got[2] != got[0]


def test_validation(spark):
    with pytest.raises(ValueError, match="unknown codec"):
        dhash_media(_media(spark, [(0, b"x")]), codec="bogus")


def test_cli_image_dedup_mode(spark, tmp_path, capsys):
    """--image-dedup maintenance mode: reads a media parquet, writes
    the perceptual survivors, prints the drop count."""
    from dbd_datawarehouse_scraper_spark.__main__ import main

    rows = [
        (10, _png(3)),
        (11, _png(3, filter_type=2)),  # re-encoded dup of 10
        (20, _png(8)),
    ]
    src = str(tmp_path / "media.parquet")
    _media(spark, rows).write.parquet(src)
    out = str(tmp_path / "kept")
    rc = main([
        "--image-dedup", src, "--image-codec", "png", "--output", out,
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    kept = {r["media_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {10, 20}
    assert "1 perceptual duplicates dropped" in capsys.readouterr().out


def test_hamming_pairs_local_matches_distributed(spark):
    """The bounded driver-local hamming_pairs fast path (opt r12)
    returns the identical pair set as the forced-distributed blocked
    join — long and string ids, including hashes with the sign bit
    set and singleton/NULL hashes."""
    from dbd_datawarehouse_scraper_spark.caching import release_caches
    from dbd_datawarehouse_scraper_spark.operators.dedup import hamming_pairs

    rows = [
        (i, ((i * 0x9E3779B97F4A7C15) ^ (i << 7)) % (1 << 63) * (1 if i % 2 else -1))
        for i in range(80)
    ] + [(200 + i, (i // 3) * 16) for i in range(30)] + [(300, None)]
    df = spark.createDataFrame(rows, "mid bigint, h bigint")
    sdf = spark.createDataFrame(
        [(f"m{a}", h) for a, h in rows], "mid string, h bigint"
    )
    for d in (0, 3, 7):
        for src in (df, sdf):
            local = sorted(
                map(tuple, hamming_pairs(src, "mid", "h", d).collect())
            )
            release_caches()
            dist = sorted(
                map(
                    tuple,
                    hamming_pairs(
                        src, "mid", "h", d, local_max_rows=0
                    ).collect(),
                )
            )
            release_caches()
            assert local == dist, f"d={d} diverged"
