"""AVI video codec tests (L5f).

Pure-stdlib RIFF/DIB codec: exact roundtrips, container structure,
decode-path pins (stride strip, row flip, BGR swap, frame order), and
the Spark operators' end-to-end behavior on small frames.
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pretalx_hub_etl_spark.llm.avi_codec import (
    avi_decode,
    avi_encode,
    is_avi,
)


def _gradient(w: int, h: int, f: int, key: int) -> bytes:
    return bytes(
        (3 * x + 5 * y + 11 * f + key) % 256
        for y in range(h)
        for x in range(w)
    )


def test_exact_roundtrip_various_shapes():
    for w, h, n in [(8, 6, 4), (11, 7, 5), (1, 1, 1), (12, 12, 7), (5, 9, 3)]:
        frames = [_gradient(w, h, f, 17) for f in range(n)]
        data = avi_encode(frames, w, h, frame_ms=40)
        assert is_avi(data)
        W, H, ms, out = avi_decode(data)
        assert (W, H, ms, len(out)) == (w, h, 40, n)
        for orig, dec in zip(frames, out):
            # decoded frames are top-down RGB with R=G=B=v
            assert all(
                dec[3 * i] == dec[3 * i + 1] == dec[3 * i + 2] == orig[i]
                for i in range(w * h)
            )


def test_container_structure():
    data = avi_encode([_gradient(7, 5, 0, 3)], 7, 5, frame_ms=25)
    # RIFF size field covers everything after the 8-byte RIFF header
    (riff_len,) = struct.unpack("<I", data[4:8])
    assert len(data) == 8 + riff_len + (riff_len & 1)
    assert b"hdrl" in data and b"movi" in data and b"idx1" in data
    assert b"avih" in data and b"strh" in data and b"strf" in data
    # one keyframe index entry pointing at the one '00db' chunk
    at = data.index(b"idx1") + 8
    fourcc, flags, off, size = struct.unpack("<4sIII", data[at : at + 16])
    assert fourcc == b"00db" and flags == 0x10 and off == 4
    stride = 7 * 3 + ((-(7 * 3)) % 4)
    assert size == stride * 5


def test_decode_strips_stride_padding_and_flips_rows():
    # width 7 -> stride 24 with 3 pad bytes per row; a distinctive
    # per-row value proves rows come back top-down and unpadded
    w, h = 7, 4
    frame = bytes((y * 40 + x) % 256 for y in range(h) for x in range(w))
    _, _, _, out = avi_decode(avi_encode([frame], w, h, frame_ms=40))
    dec = out[0]
    assert len(dec) == w * h * 3
    for y in range(h):
        for x in range(w):
            assert dec[(y * w + x) * 3] == (y * 40 + x) % 256


def test_frame_order_preserved():
    w, h = 4, 3
    frames = [bytes([f * 10]) * (w * h) for f in range(6)]
    _, _, _, out = avi_decode(avi_encode(frames, w, h, frame_ms=40))
    assert [fr[0] for fr in out] == [0, 10, 20, 30, 40, 50]


def test_rejects_garbage_and_bad_shapes():
    assert not is_avi(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        avi_decode(b"not an avi at all")
    with pytest.raises(ValueError):
        avi_encode([], 4, 4, frame_ms=40)
    with pytest.raises(ValueError):
        avi_encode([b"\x00" * 15], 4, 4, frame_ms=40)  # 15 != 16


def test_rejects_unsupported_bitcount():
    data = bytearray(avi_encode([_gradient(4, 4, 0, 0)], 4, 4, frame_ms=40))
    at = data.index(b"strf") + 8
    # biBitCount lives 14 bytes into BITMAPINFOHEADER
    struct.pack_into("<H", data, at + 14, 8)
    with pytest.raises(ValueError, match="24-bit"):
        avi_decode(bytes(data))


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 12),
    n=st.integers(1, 8),
    key=st.integers(0, 255),
    ms=st.integers(1, 200),
)
def test_prop_roundtrip_exact(w, h, n, key, ms):
    frames = [_gradient(w, h, f, key) for f in range(n)]
    W, H, MS, out = avi_decode(avi_encode(frames, w, h, frame_ms=ms))
    assert (W, H, MS, len(out)) == (w, h, ms, n)
    for orig, dec in zip(frames, out):
        assert bytes(dec[3 * i] for i in range(w * h)) == orig


def test_decode_video_operator(spark):
    from pretalx_hub_etl_spark.llm.multimodal import (
        attach_avi_media,
        decode_video,
    )

    ids = spark.range(0, 20).selectExpr("id AS media_id")
    rows = {
        r["media_id"]: r
        for r in decode_video(attach_avi_media(ids, "media_id")).collect()
    }
    assert len(rows) == 20
    for i, r in rows.items():
        w, h, n = 8 + i % 5, 6 + i % 7, 4 + i % 4
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, n)
        assert r["frame_ms"] == 40
        expect = 3 * sum(
            (3 * x + 5 * y + 11 * f + i) % 256
            for f in range(n)
            for y in range(h)
            for x in range(w)
        )
        assert r["pixel_sum"] == expect


def test_sample_video_frames_feeds_image_decoder(spark):
    from pretalx_hub_etl_spark.llm.multimodal import (
        attach_avi_media,
        decode_image,
        sample_video_frames,
    )

    ids = spark.range(0, 8).selectExpr("id AS media_id")
    frames = sample_video_frames(
        attach_avi_media(ids, "media_id"), every_n=2
    )
    got = frames.collect()
    # every_n=2 over 4 + id%4 frames -> indices 0, 2, (4), (6)
    for r in got:
        assert r["frame_idx"] % 2 == 0
        assert r["frame_ts_ms"] == r["frame_idx"] * 40
    # the PNG shards decode as ordinary images
    from pyspark.sql import functions as F

    shards = frames.select(
        (F.col("media_id") * 16 + F.col("frame_idx")).alias("fid"), "payload"
    )
    dec = {r["fid"]: r for r in decode_image(shards, id_col="fid").collect()}
    for r in got:
        i, f = r["media_id"], r["frame_idx"]
        d = dec[i * 16 + f]
        w, h = 8 + i % 5, 6 + i % 7
        assert (d["width"], d["height"], d["mode"]) == (w, h, "L")
        assert d["pixel_sum"] == sum(
            (3 * x + 5 * y + 11 * f + i) % 256
            for y in range(h)
            for x in range(w)
        )
