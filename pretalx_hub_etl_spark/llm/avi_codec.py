"""Pure-Python AVI video codec (stdlib only: struct).

The video counterpart of ``png_codec.py`` / ``wav_codec.py``: an AVI
(RIFF) container holding UNCOMPRESSED 24-bit DIB frames (``BI_RGB``) is
fully specified — OpenDML/AVI 1.0 structures, Windows BITMAPINFOHEADER
bottom-up BGR rows with 4-byte stride padding — and needs nothing
beyond ``struct``. That lets the multimodal VIDEO operators run REAL
encoded bytes end-to-end (decode, frame-sample, aggregate) with
closed-form pixel fixtures giving exact SQL oracles, closing the last
stub-only modality (reference has no media at all; SURVEY.md L5f).

Only the shapes this engine writes are accepted on decode: one 'vids'
stream, 24-bit ``BI_RGB``, '00db'/'00dc' frame chunks. Anything else
raises ``ValueError`` — a loud error beats silently-wrong pixels.

Encoded layout (every structure the Microsoft AVI spec requires):

    RIFF 'AVI '
      LIST 'hdrl'
        'avih' MainAVIHeader      (56 bytes)
        LIST 'strl'
          'strh' AVIStreamHeader  (56 bytes, fccType='vids')
          'strf' BITMAPINFOHEADER (40 bytes, biBitCount=24)
      LIST 'movi'
        '00db' raw DIB frame      (bottom-up BGR, stride padded to 4)
        ...
      'idx1' AVIOLDINDEX          (one AVIIF_KEYFRAME entry per frame)
"""

from __future__ import annotations

import struct


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(tag: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", tag + body)


def _to_dib(gray: bytes, width: int, height: int) -> bytes:
    """Top-down grayscale -> bottom-up BGR DIB rows, stride padded to 4."""
    stride_pad = (-(width * 3)) % 4
    rows = []
    for y in range(height - 1, -1, -1):
        row = bytearray()
        for x in range(width):
            v = gray[y * width + x]
            row += bytes((v, v, v))
        rows.append(bytes(row) + b"\x00" * stride_pad)
    return b"".join(rows)


def avi_encode(
    frames: list[bytes],
    width: int,
    height: int,
    frame_ms: int,
) -> bytes:
    """Grayscale frames (``width*height`` bytes each, top-down) -> AVI.

    Pixels are stored as 24-bit BGR with B=G=R=v — the uncompressed DIB
    shape every AVI reader accepts; ``frame_ms`` becomes the stream
    timebase (scale=frame_ms, rate=1000).
    """
    if not frames:
        raise ValueError("need at least one frame")
    for fr in frames:
        if len(fr) != width * height:
            raise ValueError("frame size != width*height")
    stride = width * 3 + ((-(width * 3)) % 4)
    frame_bytes = stride * height

    avih = struct.pack(
        "<14I",
        frame_ms * 1000,  # dwMicroSecPerFrame
        frame_bytes * (1000 // max(frame_ms, 1) + 1),  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags = AVIF_HASINDEX
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids",
        b"DIB ",
        0,  # dwFlags
        0, 0,  # wPriority, wLanguage
        0,  # dwInitialFrames
        frame_ms,  # dwScale
        1000,  # dwRate  -> fps = rate/scale
        0,  # dwStart
        len(frames),  # dwLength (frames)
        frame_bytes,  # dwSuggestedBufferSize
        0,  # dwQuality
        0,  # dwSampleSize (0: one sample per chunk)
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, frame_bytes, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_chunks, idx_entries = [], []
    offset = 4  # AVIOLDINDEX offsets are relative to the 'movi' fourcc
    for fr in frames:
        dib = _to_dib(fr, width, height)
        movi_chunks.append(_chunk(b"00db", dib))
        idx_entries.append(
            struct.pack("<4sIII", b"00db", 0x10, offset, len(dib))
        )
        offset += len(movi_chunks[-1])
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def is_avi(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"AVI "


def avi_decode(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """AVI bytes -> ``(width, height, frame_ms, frames)``.

    Frames come back as TOP-DOWN RGB bytes (``width*height*3`` each):
    the decoder must strip the 4-byte stride padding, flip the DIB's
    bottom-up row order, and swap BGR -> RGB — shortcutting any of the
    three moves real pixels to wrong positions, which the oracle's
    position-weighted checksum catches.
    """
    if not is_avi(data):
        raise ValueError("not a RIFF/AVI stream")
    width = height = None
    scale = rate = None
    bitcount = compression = None
    dibs: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal width, height, scale, rate, bitcount, compression
        while pos + 8 <= end:
            tag = buf[pos : pos + 4]
            (ln,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_at = pos + 8
            if tag == b"LIST":
                walk(buf, body_at + 4, body_at + ln)
            elif tag == b"avih":
                fields = struct.unpack("<14I", buf[body_at : body_at + 56])
                width, height = fields[8], fields[9]
            elif tag == b"strh":
                f = struct.unpack(
                    "<4s4sIHHIIIIIIII4h", buf[body_at : body_at + 56]
                )
                if f[0] == b"vids":
                    scale, rate = f[6], f[7]
            elif tag == b"strf" and bitcount is None:
                f = struct.unpack("<IiiHHII", buf[body_at : body_at + 24])
                bitcount, compression = f[4], f[5]
            elif tag in (b"00db", b"00dc"):
                dibs.append(buf[body_at : body_at + ln])
            pos = body_at + ln + (ln & 1)  # chunks are word-aligned

    walk(data, 12, len(data))
    if width is None or scale is None or bitcount is None:
        raise ValueError("missing avih/strh/strf structure")
    if bitcount != 24 or compression != 0:
        raise ValueError(
            f"unsupported AVI (bits={bitcount}, compression={compression});"
            " 24-bit BI_RGB only"
        )
    stride = width * 3 + ((-(width * 3)) % 4)
    frames = []
    for dib in dibs:
        if len(dib) != stride * height:
            raise ValueError("frame chunk size != stride*height")
        out = bytearray(width * height * 3)
        for y in range(height):
            src = (height - 1 - y) * stride  # bottom-up -> top-down
            for x in range(width):
                b, g, r = dib[src + 3 * x : src + 3 * x + 3]
                base = (y * width + x) * 3
                out[base], out[base + 1], out[base + 2] = r, g, b
        frames.append(bytes(out))
    frame_ms = (1000 * scale) // rate
    return width, height, frame_ms, frames
