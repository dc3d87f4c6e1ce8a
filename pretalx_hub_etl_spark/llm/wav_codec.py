"""Pure-Python WAV/PCM16 codec (stdlib only: struct).

The audio counterpart of ``png_codec.py`` (round-7): RIFF/WAVE with
16-bit little-endian PCM is fully specified and needs nothing beyond
``struct``, so the multimodal audio operators can run REAL encoded
bytes end-to-end — decode, frame, decimate — with closed-form integer
waveform fixtures giving decoded-sample aggregates exact SQL oracles.
Mono or interleaved multi-channel, 16-bit only; anything else raises
``ValueError`` (a loud error beats silently-wrong samples).
"""

from __future__ import annotations

import struct


def wav_encode(
    samples: list[int], sample_rate: int, n_channels: int = 1
) -> bytes:
    """Interleaved int16 samples -> RIFF/WAVE (PCM16-LE) bytes."""
    if len(samples) % n_channels:
        raise ValueError("sample count not divisible by channel count")
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError(f"sample {s} outside int16")
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * n_channels * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, n_channels, sample_rate, byte_rate,
            n_channels * 2, 16,
        )
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def wav_decode(data: bytes) -> tuple[int, int, list[int]]:
    """WAV bytes -> ``(sample_rate, n_channels, interleaved samples)``."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    rate = channels = None
    samples: list[int] | None = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (fmt={fmt}, bits={bits}); PCM16 only"
                )
        elif tag == b"data":
            samples = list(struct.unpack(f"<{ln // 2}h", body[: ln & ~1]))
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, channels, samples


def frame_samples(
    samples: list[int], frame_len: int, hop: int
) -> list[list[int]]:
    """Fixed-length analysis frames: frame i = samples[i*hop : i*hop+len],
    emitted only when FULL (the standard STFT framing convention)."""
    out = []
    i = 0
    while i + frame_len <= len(samples):
        out.append(samples[i : i + frame_len])
        i += hop
    return out
