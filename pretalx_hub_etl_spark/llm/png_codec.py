"""Pure-Python PNG codec (stdlib only: zlib + struct).

The real-codec seam for the multimodal operators (round-6 review Next
#3): this container ships no PIL/ffmpeg, but PNG is a fully-specified
format decodable with nothing beyond ``zlib`` — so the engine's
decode/resize operators can run REAL encoded image bytes end-to-end,
with the sha-stub codec retained as the oracle twin for non-image
payloads. When PIL is importable (a real cluster), the operators prefer
it; this module is the deterministic fallback and the test oracle.

Supported: 8-bit depth, color types 0 (grayscale, mode "L"),
2 (RGB), 6 (RGBA); all five scanline filters on decode; no interlace.
That covers everything the engine's own encoder emits and the common
PIL output for these modes. Anything else raises ``ValueError`` — a
loud error beats silently-wrong pixels.

Pixel layout everywhere: ``bytes`` of length width*height*channels,
row-major, no padding — the exchange format between decode, resize,
and feature extraction.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}
_MODES = {0: "L", 2: "RGB", 6: "RGBA"}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(
    pixels: bytes, width: int, height: int, mode: str = "L"
) -> bytes:
    """Encode raw row-major pixels as a PNG.

    Scanline filters cycle None/Sub/Up by row index — deterministic, and
    it forces any decoder (ours or PIL) to exercise real unfiltering
    rather than passing on filter-0-only files.
    """
    ctype = {v: k for k, v in _MODES.items()}[mode]
    ch = _CHANNELS[ctype]
    if len(pixels) != width * height * ch:
        raise ValueError(
            f"pixel buffer {len(pixels)} != {width}x{height}x{ch}"
        )
    stride = width * ch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        f = y % 3
        raw.append(f)
        if f == 0:  # None
            raw += line
        elif f == 1:  # Sub
            raw += bytes(
                (line[i] - (line[i - ch] if i >= ch else 0)) & 0xFF
                for i in range(stride)
            )
        else:  # Up
            raw += bytes(
                (line[i] - prev[i]) & 0xFF for i in range(stride)
            )
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def is_png(data: bytes) -> bool:
    return data[:8] == _SIG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(data: bytes) -> tuple[int, int, str, bytes]:
    """PNG bytes -> ``(width, height, mode, raw_pixels)``."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    ctype = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported color type {ctype}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[ctype]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("decompressed size mismatch")
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif f != 0:
            raise ValueError(f"bad filter byte {f}")
        prev = bytes(line)
        out += line
    return width, height, _MODES[ctype], bytes(out)


def resize_nearest(
    pixels: bytes,
    width: int,
    height: int,
    new_width: int,
    new_height: int,
    channels: int,
) -> bytes:
    """Nearest-neighbor resize with the pinned integer source formula
    ``src = (dst * src_size) // dst_size`` (floor).  PIL's NEAREST uses
    center-based sampling, so on non-constant images the two codecs pick
    different source pixels — callers that need codec-portable hashes
    resize constant-color or accept mode/dims-only checks."""
    stride = width * channels
    out = bytearray()
    for y in range(new_height):
        sy = (y * height) // new_height
        row = pixels[sy * stride : (sy + 1) * stride]
        for x in range(new_width):
            sx = (x * width) // new_width
            out += row[sx * channels : (sx + 1) * channels]
    return bytes(out)
