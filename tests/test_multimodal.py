"""Multimodal binary-column plumbing: schemas, Arrow batch flow,
fault isolation. Codecs are stubbed; the Spark-side contract is real."""

import pytest
from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.multimodal import (
    DECODED_SCHEMA,
    decode_media,
    media_features,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = synth_media(docs).cache()
    yield out
    out.unpersist(blocking=True)


def test_synth_media_schema(media):
    assert media.schema["payload"].dataType.typeName() == "binary"
    assert media.schema["meta"].dataType.typeName() == "struct"
    assert media.count() > 0


def test_decode_media_deterministic(media):
    out = decode_media(media)
    assert out.schema == DECODED_SCHEMA
    rows = out.collect()
    assert all(r["decode_error"] is None for r in rows)
    assert all(16 <= r["width"] < 80 for r in rows)
    # determinism: run twice, identical
    again = {r["media_id"]: (r["width"], r["height"], r["format"]) for r in out.collect()}
    first = {r["media_id"]: (r["width"], r["height"], r["format"]) for r in rows}
    assert first == again


def test_decode_media_pil_gated_when_absent(media):
    """codec='pil' (and the legacy real_codec=True spelling) must fail
    fast with install guidance when Pillow isn't importable; 'auto'
    must fall back to the stub instead of raising."""
    from dbd_datawarehouse_scraper_spark.multimodal.media import _pil_importable

    if _pil_importable():
        pytest.skip("Pillow installed: the gate doesn't trigger here")
    with pytest.raises(NotImplementedError, match="[Pp]illow"):
        decode_media(media, real_codec=True)
    with pytest.raises(NotImplementedError, match="[Pp]illow"):
        decode_media(media, codec="pil")
    # auto falls back silently; result identical to the stub
    auto = decode_media(media, codec="auto").collect()
    fake = decode_media(media).collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, fake))


def test_decode_media_unknown_codec(media):
    with pytest.raises(ValueError, match="unknown codec"):
        decode_media(media, codec="ffmpeg")


def test_pil_codec_functions(monkeypatch):
    """Driver-side unit for the Pillow branch with a fake PIL module:
    pins the decode/resize call shapes (BytesIO open, width/height/
    format read, grayscale convert + resize + tobytes) without needing
    Pillow in the container."""
    import sys
    import types

    class _FakeImg:
        width, height, format = 64, 48, "PNG"

        def __init__(self):
            self.converted = None
            self.size = None

        def convert(self, mode):
            self.converted = mode
            return self

        def resize(self, wh):
            self.size = wh
            return self

        def tobytes(self):
            return bytes(self.size[0] * self.size[1])

    state = {}

    def _open(buf):
        state["opened"] = buf.read()
        state["img"] = _FakeImg()
        return state["img"]

    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = _open
    pil.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)

    from dbd_datawarehouse_scraper_spark.multimodal.media import (
        _pil_decode,
        _pil_resize,
        _resolve_codec,
    )

    assert _resolve_codec("auto") == "pil"  # fake PIL imports fine
    assert _pil_decode(b"\x89PNG...") == (64, 48, "png")
    assert state["opened"] == b"\x89PNG..."

    out = _pil_resize(b"imgbytes", 8, 4)
    assert len(out) == 32
    assert state["img"].converted == "L"
    assert state["img"].size == (8, 4)


def test_decode_media_pil_real(spark, media):
    """Real-Pillow end-to-end (skipped with reason when absent)."""
    Image = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    Image.new("RGB", (20, 10)).save(buf, format="PNG")
    one = spark.createDataFrame(
        [(1, "image/png", buf.getvalue(), None)], media.schema
    )
    row = decode_media(one, codec="pil").collect()[0]
    assert (row["width"], row["height"], row["format"]) == (20, 10, "png")
    assert row["decode_error"] is None


def test_media_features_unit_norm(media):
    out = media_features(media).select("media_id", "features").collect()
    assert all(len(r["features"]) == 16 for r in out)
    for r in out[:20]:
        norm = sum(x * x for x in r["features"]) ** 0.5
        assert norm == pytest.approx(1.0, abs=1e-5)


def test_sample_frames_offsets(media):
    out = sample_frames(media, n_frames=4)
    rows = out.filter(F.col("media_id") == out.select(F.min("media_id")).collect()[0][0]).collect()
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]
    assert rows[0]["byte_offset"] == 0
    assert all(r["byte_offset"] < r["n_bytes"] for r in rows)


def test_resize_media_fixed_output(media):
    from dbd_datawarehouse_scraper_spark.multimodal.media import resize_media

    out = resize_media(media, target_w=8, target_h=4).collect()
    assert len(out) == media.count()
    for r in out:
        assert r["resize_error"] is None
        assert (r["target_w"], r["target_h"]) == (8, 4)
        assert len(r["payload"]) == 32  # fixed-size output, columnar-friendly

    # deterministic: same payload → same resized bytes
    again = {r["media_id"]: r["payload"]
             for r in resize_media(media, target_w=8, target_h=4).collect()}
    assert {r["media_id"]: r["payload"] for r in out} == again
