"""Execute decode_image/resize_encoded_images' ``codec='auto'``
PIL-preferred branch (round-8 review, Next #6).

Pillow isn't installable in this container, so the branch is driven
with a minimal PIL test double that implements exactly the Image API
surface the branch calls (``open``/``size``/``mode``/``tobytes``/
``resize``/``save``) on top of the repo's own pure codecs. The double
is defined inside a factory function so cloudpickle ships it BY VALUE
to executor workers — the same transport a captured real PIL module
would use by reference. What this pins:

- the driver-side ``_pil_image()`` resolution feeds the closure (the
  ``pil is not None`` arm really executes on workers via mapInPandas),
- the branch's call pattern matches the PIL API (a signature drift in
  the branch now fails HERE instead of only on a PIL-bearing cluster),
- with a NEAREST resampler that uses the pinned floor formula, the
  auto path is byte-identical to the pure path (the branches disagree
  only through PIL's center-based NEAREST, not through the plumbing).

The two ``HAS_PIL`` cross-validation tests elsewhere stay skipped by
design: they compare our codecs against REAL Pillow output and are
meaningful only where Pillow exists (documented waiver — see
test_multimodal_jpeg.py:116, test_multimodal_png.py:64).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pretalx_hub_etl_spark.llm import multimodal
from pretalx_hub_etl_spark.llm.multimodal import (
    attach_jpeg_media,
    attach_png_media,
    decode_image,
    resize_encoded_images,
)


def _fake_pil():
    """A by-value-picklable stand-in for ``PIL.Image`` backed by the
    pure codecs; NEAREST resize uses the pinned floor formula, so the
    auto and pure paths must agree byte-for-byte."""

    class _Img:
        def __init__(self, raw: bytes):
            from pretalx_hub_etl_spark.llm.jpeg_codec import (
                is_jpeg,
                jpeg_decode,
            )
            from pretalx_hub_etl_spark.llm.png_codec import png_decode

            if is_jpeg(raw):
                w, h, mode, px = jpeg_decode(raw)
            else:
                w, h, mode, px = png_decode(raw)
            self.size, self.mode, self._px = (w, h), mode, px

        def tobytes(self) -> bytes:
            return self._px

        def resize(self, wh, resample=0):
            from pretalx_hub_etl_spark.llm.png_codec import (
                _CHANNELS,
                _MODES,
                resize_nearest,
            )

            assert resample == 0  # the branch must ask for NEAREST
            ch = {m: _CHANNELS[t] for t, m in _MODES.items()}[self.mode]
            (w, h), (dw, dh) = self.size, wh
            out = _Img.__new__(_Img)
            out.size, out.mode = (dw, dh), self.mode
            out._px = resize_nearest(self._px, w, h, dw, dh, ch)
            return out

        def save(self, buf, format=None):
            from pretalx_hub_etl_spark.llm.png_codec import png_encode

            assert format == "PNG"
            w, h = self.size
            buf.write(png_encode(self._px, w, h, self.mode))

    class _ImageModule:
        @staticmethod
        def open(buf):
            return _Img(buf.read())

    return _ImageModule


@pytest.fixture()
def fake_pil(monkeypatch):
    monkeypatch.setattr(multimodal, "_pil_image", lambda: _fake_pil())


def _rows(df, key="media_id"):
    return {r[key]: r.asDict() for r in df.collect()}


def test_decode_auto_prefers_pil_and_matches_pure(spark, fake_pil):
    ids = spark.range(6).select(F.col("id").alias("media_id"))
    for attach in (attach_png_media, attach_jpeg_media):
        media = attach(ids, "media_id")
        auto = _rows(decode_image(media, codec="auto"))
        pure = _rows(decode_image(media, codec="pure"))
        assert auto == pure
        assert len(auto) == 6 and all(
            v["pixel_sum"] > 0 for v in auto.values()
        )


def test_resize_auto_matches_pure_bytes(spark, fake_pil):
    ids = spark.range(4).select(F.col("id").alias("media_id"))
    media = attach_png_media(ids, "media_id")
    auto = _rows(resize_encoded_images(media, 8, 6, codec="auto"))
    pure = _rows(resize_encoded_images(media, 8, 6, codec="pure"))
    for k in pure:
        assert bytes(auto[k]["payload"]) == bytes(pure[k]["payload"])
        assert (auto[k]["width"], auto[k]["height"]) == (8, 6)


def test_codec_pil_without_pil_raises(spark):
    ids = spark.range(1).select(F.col("id").alias("media_id"))
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(attach_png_media(ids, "media_id"), codec="pil")


def test_codec_pil_with_fake_runs(spark, fake_pil):
    ids = spark.range(2).select(F.col("id").alias("media_id"))
    out = decode_image(attach_png_media(ids, "media_id"), codec="pil")
    assert out.count() == 2
