"""Pure-Python baseline JPEG codec (stdlib + numpy).

The third real-codec seam for the multimodal operators (round-7 review
Next #5): PNG (L5b) and WAV (L5c) already decode real bytes with stdlib
codecs; this closes the JPEG gap without PIL — which is a C extension
and, unlike protobuf, cannot be discovered or vendored pure-python. The
implementation is the full baseline pipeline from the public JPEG spec
(ITU-T T.81) + JFIF: level shift, 8x8 DCT, quality-scaled Annex-K
quantization tables, zigzag, DC prediction, canonical Huffman coding
with byte stuffing, and the exact inverse chain on decode. When PIL is
importable (a real cluster), the multimodal operators prefer it under
``codec='auto'``; this module is the deterministic fallback and the
test oracle.

Supported: baseline sequential DCT (SOF0), 8-bit, grayscale ("L") and
4:4:4 YCbCr color ("RGB"); no chroma subsampling, no progressive, no
restart markers — exactly what the engine's own encoder emits. Anything
else raises ``ValueError``: a loud error beats silently-wrong pixels.

Oracle strategy: JPEG is lossy, so unlike PNG the decoded pixels of an
arbitrary image have no closed form. But a block-uniform image decodes
EXACTLY: a uniform 8x8 block's DCT is DC-only (AC terms are
mathematically zero; float64 residue < 1e-10 quantizes to 0), and with
the unscaled Annex-K luma table (quality 50, Q[0,0] = 16) and even
level-shifted values the whole quantize -> dequantize -> IDCT chain is
integer-exact: pixel = qDC * 16 / 8 + 128 = v. The declared queries use
such fixtures (per-block values still exercise DC prediction, Huffman
categories, bit stuffing, and multi-MCU scans); gradients and color are
covered by round-trip-bounded tests.

Pixel layout everywhere: ``bytes`` of length width*height*channels,
row-major — the same exchange format as ``png_codec``.
"""

from __future__ import annotations

import struct

import numpy as np

# -- tables (ITU-T T.81 Annex K — the public example tables every
#    baseline codec ships) ----------------------------------------------------

_QL = np.array([  # luminance, quality 50
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)

_QC = np.array([  # chrominance, quality 50
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)

_ZIG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# canonical Huffman specs: (BITS counts per code length 1..16, HUFFVAL)
_DC_L = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_C = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {
        (ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()
    }


# DCT-II basis matrix: C[u, x] = c(u)/2 * cos((2x+1) u pi / 16);
# forward F = C f C^T, inverse f = C^T F C (orthonormal)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        cu = (1 / np.sqrt(2)) if _u == 0 else 1.0
        _C[_u, _x] = 0.5 * cu * np.cos((2 * _x + 1) * _u * np.pi / 16)


def quant_tables(quality: int = 50) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-style quality scaling of the Annex-K tables.

    quality=50 returns the tables untouched — the setting the exact
    block-uniform oracle relies on (Q[0,0]=16 divides 8*even exactly).
    """
    if not 1 <= quality <= 100:
        raise ValueError("quality in [1, 100]")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_QL * s + 50) // 100, 1, 255)
    qc = np.clip((_QC * s + 50) // 100, 1, 255)
    return ql.astype(np.int64), qc.astype(np.int64)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-pad per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("jpeg: truncated entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                self.pos += 1  # unstuff
            else:
                raise ValueError("jpeg: unexpected marker in scan")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid huffman code")


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_coeff_bits(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _extend(bits: int, s: int) -> int:
    # T.81 EXTEND: low-range values are negative
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def _blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad (h, w) to multiples of 8 by edge replication, return
    (by, bx, 8, 8) block view copy + block grid dims."""
    h, w = plane.shape
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    blocks = padded.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
    return blocks, H // 8, W // 8


_SOI, _EOI, _SOS, _SOF0, _DQT, _DHT, _APP0, _COM = (
    0xD8, 0xD9, 0xDA, 0xC0, 0xDB, 0xC4, 0xE0, 0xFE,
)


def is_jpeg(data: bytes) -> bool:
    return len(data) > 3 and data[0] == 0xFF and data[1] == _SOI


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def jpeg_encode(
    pixels: bytes, width: int, height: int, mode: str = "L", quality: int = 50
) -> bytes:
    """Encode raw row-major pixels as baseline JFIF (no subsampling)."""
    if mode not in ("L", "RGB"):
        raise ValueError(f"unsupported mode {mode!r}")
    ch = 1 if mode == "L" else 3
    if len(pixels) != width * height * ch:
        raise ValueError(f"pixel buffer {len(pixels)} != {width}x{height}x{ch}")
    ql, qc = quant_tables(quality)
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, ch)
    if mode == "L":
        planes = [arr[:, :, 0].astype(np.float64)]
        qtabs = [ql]
        tab_ids = [0]
    else:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, np.clip(cb, 0, 255), np.clip(cr, 0, 255)]
        qtabs = [ql, qc, qc]
        tab_ids = [0, 1, 1]

    # entropy-encode component-interleaved MCUs (1 block per comp at 4:4:4)
    dc_codes = [_canonical_codes(*_DC_L), _canonical_codes(*_DC_C)]
    ac_codes = [_canonical_codes(*_AC_L), _canonical_codes(*_AC_C)]
    comp_blocks = []
    nby = nbx = 0
    for p, q in zip(planes, qtabs):
        blocks, nby, nbx = _blocks(p)
        shifted = blocks - 128.0
        coef = np.einsum("ux,byxz,vz->byuv", _C, shifted, _C)
        # round half away from zero, as libjpeg's integer quantizer does
        qz = np.sign(coef) * np.floor(np.abs(coef) / q + 0.5)
        comp_blocks.append(qz.astype(np.int64))

    w = _BitWriter()
    prev_dc = [0] * len(planes)
    for by in range(nby):
        for bx in range(nbx):
            for ci, qblocks in enumerate(comp_blocks):
                tid = tab_ids[ci]
                zz = qblocks[by, bx].flatten()[_ZIG]
                diff = int(zz[0]) - prev_dc[ci]
                prev_dc[ci] = int(zz[0])
                s = _category(diff)
                code, ln = dc_codes[tid][s]
                w.put(code, ln)
                if s:
                    w.put(_encode_coeff_bits(diff, s), s)
                run = 0
                last_nz = np.nonzero(zz[1:])[0]
                end = last_nz[-1] + 1 if len(last_nz) else 0
                for k in range(1, end + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[tid][0xF0]  # ZRL
                        w.put(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = ac_codes[tid][(run << 4) | s]
                    w.put(code, ln)
                    w.put(_encode_coeff_bits(v, s), s)
                    run = 0
                if end < 63:
                    code, ln = ac_codes[tid][0x00]  # EOB
                    w.put(code, ln)
    scan = w.flush()

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return _seg(_DQT, bytes([tid]) + bytes(int(x) for x in q.flatten()[_ZIG]))

    def dht(cls: int, tid: int, spec) -> bytes:
        bits, vals = spec
        return _seg(_DHT, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    out = bytearray(b"\xff" + bytes([_SOI]))
    out += _seg(_APP0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, ql)
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, tab_ids[ci]])  # 1x1 sampling
    if ncomp == 3:
        out += dqt(1, qc)
    out += _seg(_SOF0, sof)
    out += dht(0, 0, _DC_L)
    out += dht(1, 0, _AC_L)
    if ncomp == 3:
        out += dht(0, 1, _DC_C)
        out += dht(1, 1, _AC_C)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (tab_ids[ci] << 4) | tab_ids[ci]])
    sos += bytes([0, 63, 0])
    out += _seg(_SOS, sos)
    out += scan
    out += b"\xff" + bytes([_EOI])
    return bytes(out)


def jpeg_decode(data: bytes) -> tuple[int, int, str, bytes]:
    """JPEG bytes -> ``(width, height, mode, raw_pixels)``."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    width = height = None
    comps: list[tuple[int, int]] = []  # (comp_id, quant_tid)
    scan_tabs: list[tuple[int, int]] = []  # (dc_tid, ac_tid)
    scan_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg: marker expected")
        marker = data[pos + 1]
        if marker == _EOI:
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == _DQT:
            off = 0
            while off < len(body):
                pq, tid = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                flat = np.zeros(64, dtype=np.int64)
                flat[_ZIG] = np.frombuffer(
                    body[off + 1 : off + 65], dtype=np.uint8
                ).astype(np.int64)
                qt[tid] = flat.reshape(8, 8)
                off += 65
        elif marker == _DHT:
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                huff[(cls, tid)] = _decode_table(bits, vals)
                off += 17 + n
        elif marker == _SOF0:
            prec, height, width, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("jpeg: only 8-bit baseline supported")
            for ci in range(nc):
                cid, samp, qtid = body[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError(
                        "jpeg: chroma subsampling unsupported (4:4:4 only)"
                    )
                comps.append((cid, qtid))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"jpeg: non-baseline SOF 0x{marker:02x} unsupported")
        elif marker == 0xDD:
            raise ValueError("jpeg: restart intervals unsupported")
        elif marker == _SOS:
            ns = body[0]
            for ci in range(ns):
                _cid, tabs = body[1 + 2 * ci], body[2 + 2 * ci]
                scan_tabs.append((tabs >> 4, tabs & 0xF))
            scan_start = pos
            break
    if width is None or scan_start is None:
        raise ValueError("jpeg: missing SOF/SOS")
    # entropy data runs to the EOI marker (no restarts emitted/accepted)
    end = data.rfind(b"\xff" + bytes([_EOI]))
    if end < 0:
        end = len(data)
    r = _BitReader(data[scan_start:end])

    nc = len(comps)
    nby, nbx = (height + 7) // 8, (width + 7) // 8
    planes = [np.zeros((nby * 8, nbx * 8)) for _ in range(nc)]
    prev_dc = [0] * nc
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(nc):
                dct, act = scan_tabs[ci]
                zz = np.zeros(64, dtype=np.int64)
                s = r.symbol(huff[(0, dct)])
                diff = _extend(r.bits(s), s) if s else 0
                prev_dc[ci] += diff
                zz[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    sym = r.symbol(huff[(1, act)])
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0xF
                    k += run
                    if k > 63:
                        raise ValueError("jpeg: AC run past block end")
                    zz[k] = _extend(r.bits(size), size)
                    k += 1
                flat = np.zeros(64, dtype=np.int64)
                flat[_ZIG] = zz
                block = flat.reshape(8, 8) * qt[comps[ci][1]]
                pix = _C.T @ block.astype(np.float64) @ _C
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pix

    planes = [p[:height, :width] + 128.0 for p in planes]
    if nc == 1:
        out = np.clip(np.floor(planes[0] + 0.5), 0, 255).astype(np.uint8)
        return width, height, "L", out.tobytes()
    if nc != 3:
        raise ValueError(f"jpeg: {nc}-component scans unsupported")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r_ = y + 1.402 * cr
    g_ = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    rgb = np.stack(
        [np.clip(np.floor(c + 0.5), 0, 255) for c in (r_, g_, b_)], axis=-1
    ).astype(np.uint8)
    return width, height, "RGB", rgb.tobytes()
