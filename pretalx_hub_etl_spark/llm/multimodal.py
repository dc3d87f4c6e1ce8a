"""Multimodal column plumbing (SURVEY.md L5).

Media payloads are opaque ``binary`` columns travelling next to typed
metadata (the only shape that works at 100 TB: Spark shuffles/spills binary
columns fine, and decode happens once, executor-side, in Arrow batches).

Two codec tiers (round-6 review Next #3):

- **Real PNG path** (``attach_png_media`` / ``decode_image`` /
  ``resize_encoded_images``): actual encoded image bytes, decoded
  executor-side. ``codec="pure"`` uses the stdlib-only PNG codec
  (``png_codec.py``) and is fully deterministic/oracle-able;
  ``codec="auto"`` prefers PIL when importable (a real cluster) and
  falls back to pure; ``codec="pil"`` demands PIL. PNG covers the
  lossless-image case end-to-end; baseline JPEG (``jpeg_codec``), WAV
  audio (``wav_codec``) and uncompressed-DIB AVI video (``avi_codec``)
  complete the other modalities with the same stdlib-determinism rule.
- **Stub path** (``decode_features`` / ``resize_images`` /
  ``sample_frames``): sha-derived deterministic fakes for payloads no
  available codec can parse — the Arrow batch plumbing is real and the
  stub bytes are themselves oracle-checked; ``strict=True`` raises
  where the real codec belongs rather than faking.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _pil_image():
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _ship_codecs_by_value() -> tuple:
    """Make the stdlib codec modules worker-shippable and return their
    functions for closure capture.

    The round-5 rule (ARCHITECTURE "Worker-shippable code must pickle by
    value"): Spark's Python workers do not inherit the driver's sys.path
    additions, so a closure doing ``from .png_codec import ...`` — or
    referencing a function cloudpickle serializes by module+qualname —
    raises ModuleNotFoundError when the engine is used as a
    path-injected library from another cwd. ``register_pickle_by_value``
    flips both codec MODULES to by-value serialization (they are pure
    stdlib, a few KB), so the captured functions travel inside the task
    closure. Idempotent; call at operator-construction time.
    """
    from pyspark import cloudpickle

    from . import avi_codec, jpeg_codec, png_codec, wav_codec

    cloudpickle.register_pickle_by_value(png_codec)
    cloudpickle.register_pickle_by_value(wav_codec)
    cloudpickle.register_pickle_by_value(avi_codec)
    # jpeg_codec additionally imports numpy, which pickles by reference
    # (installed on every worker) — only the module's own code travels
    cloudpickle.register_pickle_by_value(jpeg_codec)
    return png_codec, wav_codec, jpeg_codec, avi_codec

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def _widen(df: DataFrame) -> DataFrame:
    # every attach_* synthesizes payloads in a pandas UDF, so its
    # parallelism is the id frame's split count — a few-MB documents
    # scan is ONE split and every encode+decode chain ran in one Python
    # worker (r17). Widening BEFORE the payload exists moves only ids
    # (guide §8: move heavy bytes once — here, never); no-op when wide.
    from ..operators.partitioning import fan_out

    return fan_out(df)


def attach_fake_media(df: DataFrame, id_col: str) -> DataFrame:
    """Derive a deterministic opaque binary payload column from an id.

    Stands in for real encoded media so the binary-column plumbing
    (schema, shuffle, UDF batch shapes) is exercised end-to-end.
    """
    return _widen(df).withColumn(
        "payload", F.encode(F.concat(F.lit("mediabytes:"), F.col(id_col).cast("string")), "UTF-8")
    ).withColumn("kind", F.lit("image")).withColumn("mime", F.lit("image/fake"))


def attach_png_media(df: DataFrame, id_col: str) -> DataFrame:
    """Derive a REAL encoded PNG payload column from an id.

    Deterministic fixture: an (8 + id%5) × (8 + id%7) grayscale gradient
    with pixel(x, y) = (3x + 5y + id) mod 256 — every pixel value is a
    closed-form function of (id, x, y), so decoded-pixel aggregates have
    exact SQL oracles, and the gradient (plus the encoder's cycling
    scanline filters) means a decoder that skips real unfiltering cannot
    reproduce them.
    """

    png_codec, _, _, _ = _ship_codecs_by_value()
    png_encode = png_codec.png_encode

    @F.pandas_udf("binary")
    def gen(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            w, h = 8 + i % 5, 8 + i % 7
            px = bytes(
                (3 * x + 5 * y + i) % 256
                for y in range(h)
                for x in range(w)
            )
            out.append(png_encode(px, w, h, "L"))
        return pd.Series(out)

    return (
        _widen(df).withColumn("payload", gen(F.col(id_col)))
        .withColumn("kind", F.lit("image"))
        .withColumn("mime", F.lit("image/png"))
    )


def attach_jpeg_media(df: DataFrame, id_col: str) -> DataFrame:
    """Derive a REAL encoded baseline-JPEG payload column from an id.

    Deterministic BLOCK-UNIFORM fixture: a (12 + id%9) × (12 + id%11)
    grayscale image where every 8×8 block carries its own constant
    ``v(bx, by) = 128 + 2·(((3·bx + 5·by + id) mod 50) − 25)``. JPEG is
    lossy in general, but block-uniform images with even level-shifted
    values decode EXACTLY at quality 50 (DC-only blocks, Q[0,0]=16 — see
    ``jpeg_codec``), so decoded-pixel aggregates keep exact SQL oracles
    while the stream still exercises DC prediction, Huffman categories,
    byte stuffing, and multi-MCU scans. Edge padding replicates the last
    block's value, so non-multiple-of-8 sizes stay exact too.
    """
    _, _, jpeg_codec, _ = _ship_codecs_by_value()
    jpeg_encode = jpeg_codec.jpeg_encode

    @F.pandas_udf("binary")
    def gen(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            w, h = 12 + i % 9, 12 + i % 11
            px = bytes(
                128 + 2 * (((3 * (x // 8) + 5 * (y // 8) + i) % 50) - 25)
                for y in range(h)
                for x in range(w)
            )
            out.append(jpeg_encode(px, w, h, "L", quality=50))
        return pd.Series(out)

    return (
        _widen(df).withColumn("payload", gen(F.col(id_col)))
        .withColumn("kind", F.lit("image"))
        .withColumn("mime", F.lit("image/jpeg"))
    )


def decode_image(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    codec: str = "pure",
) -> DataFrame:
    """REAL image decode -> metadata + pixel aggregate, via ``mapInPandas``.

    ``(id, width, height, mode, n_bytes, pixel_sum)`` from actually
    parsing the encoded bytes. ``codec="pure"`` (default) pins the
    stdlib/numpy decoders — PNG or baseline JPEG, dispatched on the
    payload's magic bytes, deterministic on any cluster so declared
    queries stay engine-stable; ``"auto"`` prefers PIL when importable
    (identical output for PNG — lossless — and for the DC-only JPEG
    fixtures, whose decode is integer-exact in any conformant IDCT);
    ``"pil"`` requires PIL.
    """
    out_schema = (
        f"{id_col} long, width long, height long, mode string, "
        "n_bytes long, pixel_sum long"
    )

    png_codec, _, jpeg_codec, _ = _ship_codecs_by_value()
    png_decode = png_codec.png_decode
    jpeg_decode, is_jpeg = jpeg_codec.jpeg_decode, jpeg_codec.is_jpeg
    # PIL handle resolved DRIVER-side and captured: a module object
    # pickles by reference (workers import their own installed PIL);
    # calling _pil_image() inside the closure would drag the
    # unimportable multimodal module into the pickle instead
    pil = _pil_image() if codec in ("auto", "pil") else None
    if codec == "pil" and pil is None:
        raise NotImplementedError("codec='pil' but PIL is not importable")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            ids, ws, hs, modes, nbs, sums = [], [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                if pil is not None:
                    img = pil.open(io.BytesIO(raw))
                    w, h = img.size
                    mode, px = img.mode, img.tobytes()
                elif is_jpeg(raw):
                    w, h, mode, px = jpeg_decode(raw)
                else:
                    w, h, mode, px = png_decode(raw)
                ids.append(int(mid))
                ws.append(w)
                hs.append(h)
                modes.append(mode)
                nbs.append(len(px))
                sums.append(sum(px))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int64"),
                    "height": pd.Series(hs, dtype="int64"),
                    "mode": modes,
                    "n_bytes": pd.Series(nbs, dtype="int64"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def resize_encoded_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    codec: str = "pure",
) -> DataFrame:
    """REAL decode -> nearest-neighbor resize -> re-encode (1:1 rows).

    Output payload is a valid PNG of the resized pixels. ``codec="pure"``
    uses the pinned integer source formula ``src = (dst*src_size)//
    dst_size`` (``png_codec.resize_nearest``) and the stdlib encoder —
    bit-deterministic everywhere; ``"auto"``/``"pil"`` use PIL NEAREST,
    whose center-based sampling picks different source pixels on
    non-constant images (dims/mode stay comparable, bytes don't).
    """
    out_schema = f"{id_col} long, payload binary, width int, height int"

    png_codec, _, jpeg_codec, _ = _ship_codecs_by_value()
    png_decode, png_encode = png_codec.png_decode, png_codec.png_encode
    jpeg_decode, is_jpeg = jpeg_codec.jpeg_decode, jpeg_codec.is_jpeg
    rn = png_codec.resize_nearest
    mode_channels = {
        m: png_codec._CHANNELS[t] for t, m in png_codec._MODES.items()
    }
    pil = _pil_image() if codec in ("auto", "pil") else None
    if codec == "pil" and pil is None:
        raise NotImplementedError("codec='pil' but PIL is not importable")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            ids, payloads = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                if pil is not None:
                    img = pil.open(io.BytesIO(raw)).resize(
                        (width, height), resample=0  # NEAREST
                    )
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    payloads.append(buf.getvalue())
                else:
                    # input dispatches on magic bytes (PNG or baseline
                    # JPEG); OUTPUT is always PNG — resampling generally
                    # destroys 8x8-block alignment, so a lossy re-encode
                    # would forfeit exactness; the lossless target keeps
                    # the resized pixels value-checkable (and this is the
                    # normalize-to-lossless shape real vision-data
                    # pipelines use for training shards)
                    if is_jpeg(raw):
                        w, h, mode, px = jpeg_decode(raw)
                    else:
                        w, h, mode, px = png_decode(raw)
                    out = rn(px, w, h, width, height, mode_channels[mode])
                    payloads.append(png_encode(out, width, height, mode))
                ids.append(int(mid))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "payload": payloads,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_features: int = 8,
    strict: bool = False,
) -> DataFrame:
    """Executor-side media decode -> feature vector via ``mapInPandas``.

    STUB codec: real decoding would use PIL/torchaudio here (not in this
    container). ``strict=True`` raises NotImplementedError exactly where the
    real codec belongs; otherwise features are a deterministic hash-derived
    fake so downstream plumbing is testable. The Spark side — Arrow batch
    iteration, output schema, per-partition execution — is real.
    """
    out_schema = f"{id_col} long, features array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real media decode requires an image/audio codec library"
                )
            feats = []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(raw).digest()
                feats.append(
                    [digest[i] / 255.0 for i in range(n_features)]
                )
            yield pd.DataFrame({id_col: pdf[id_col].astype("int64"), "features": feats})

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = False,
) -> DataFrame:
    """Executor-side image resize via ``mapInPandas`` (1:1 rows).

    STUB codec (PIL belongs at the marked line); output carries the new
    payload bytes plus updated width/height metadata. Batch shape, output
    schema, and binary round-tripping are real.
    """
    out_schema = f"{id_col} long, payload binary, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if strict:
                raise NotImplementedError("real resize requires an image codec")
            out = []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                # STUB: real code is Image.open(io.BytesIO(raw)).resize(...)
                out.append(hashlib.sha256(raw + f"{width}x{height}".encode()).digest())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_ms: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
    strict: bool = False,
) -> DataFrame:
    """Video -> frames via ``mapInPandas`` (1:N row expansion).

    One input row fans out to ``floor(duration/every_ms)+1`` frame rows
    (frame_idx, frame_ts_ms, frame payload) — the row-expanding UDF shape
    (decoders that EMIT rows, not just map them). The frame enumeration is
    metadata-driven, so it has an exact SQL oracle; only the stub frame
    bytes are codec territory.
    """
    out_schema = (
        f"{id_col} long, frame_idx long, frame_ts_ms long, payload binary"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if strict:
                raise NotImplementedError("real frame sampling requires a video codec")
            ids, idxs, tss, payloads = [], [], [], []
            for mid, payload, dur in zip(
                pdf[id_col], pdf[payload_col], pdf[duration_col]
            ):
                raw = bytes(payload) if payload is not None else b""
                n = int(dur) // every_ms + 1
                for i in range(n):
                    ids.append(int(mid))
                    idxs.append(i)
                    tss.append(i * every_ms)
                    # STUB: real code seeks to ts and decodes one frame
                    payloads.append(hashlib.sha256(raw + i.to_bytes(4, "big")).digest())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "payload": payloads,
                }
            )

    return df.select(id_col, payload_col, duration_col).mapInPandas(
        run, schema=out_schema
    )


def multimodal_record(docs: DataFrame, embs: DataFrame) -> DataFrame:
    """documents ⋈ embeddings -> one struct-typed multimodal record per doc.

    The struct column is the engine's "multimodal row" (text + vector +
    metadata); scalar projections push straight through the struct.
    """
    joined = docs.join(embs, docs.doc_id == embs.vec_id, "inner")
    return joined.select(
        "doc_id",
        F.struct(
            F.col("text"),
            F.col("lang"),
            F.col("source"),
            F.col("embedding"),
            F.col("label"),
        ).alias("record"),
    )


def attach_wav_media(df: DataFrame, id_col: str) -> DataFrame:
    """Derive a REAL encoded WAV (PCM16 mono, 8 kHz) payload from an id.

    Deterministic fixture: ``n = 50 + id % 20`` samples with
    ``sample(i) = ((id * 31 + i * 7) mod 2003) - 1001`` — closed-form
    integers, so decoded-sample aggregates (sums, per-frame sums) have
    exact SQL oracles.
    """

    _, wav_codec, _, _ = _ship_codecs_by_value()
    wav_encode = wav_codec.wav_encode

    @F.pandas_udf("binary")
    def gen(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            n = 50 + i % 20
            samples = [((i * 31 + k * 7) % 2003) - 1001 for k in range(n)]
            out.append(wav_encode(samples, sample_rate=8000))
        return pd.Series(out)

    return (
        _widen(df).withColumn("payload", gen(F.col(id_col)))
        .withColumn("kind", F.lit("audio"))
        .withColumn("mime", F.lit("audio/wav"))
    )


def decode_audio(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL WAV decode -> ``(id, sample_rate, n_channels, n_samples,
    sample_sum, abs_sum)`` via ``mapInPandas`` (stdlib PCM16 codec)."""
    out_schema = (
        f"{id_col} long, sample_rate long, n_channels long, "
        "n_samples long, sample_sum long, abs_sum long"
    )

    _, wav_codec, _, _ = _ship_codecs_by_value()
    wav_decode = wav_codec.wav_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                id_col, "sample_rate", "n_channels", "n_samples",
                "sample_sum", "abs_sum",
            )}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                rate, ch, samples = wav_decode(bytes(payload))
                rows[id_col].append(int(mid))
                rows["sample_rate"].append(rate)
                rows["n_channels"].append(ch)
                rows["n_samples"].append(len(samples))
                rows["sample_sum"].append(sum(samples))
                rows["abs_sum"].append(sum(abs(s) for s in samples))
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in rows.items()}
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def frame_audio(
    df: DataFrame,
    frame_len: int,
    hop: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL decode -> fixed-length analysis frames (1:N row expansion):
    ``(id, frame_idx, start_sample, frame_sum)`` — frame i covers
    ``[i*hop, i*hop + frame_len)``, full frames only (STFT framing)."""
    out_schema = (
        f"{id_col} long, frame_idx long, start_sample long, frame_sum long"
    )

    _, wav_codec, _, _ = _ship_codecs_by_value()
    frame_samples, wav_decode = wav_codec.frame_samples, wav_codec.wav_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, sums = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                _rate, _ch, samples = wav_decode(bytes(payload))
                for j, fr in enumerate(
                    frame_samples(samples, frame_len, hop)
                ):
                    ids.append(int(mid))
                    idxs.append(j)
                    starts.append(j * hop)
                    sums.append(sum(fr))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "start_sample": pd.Series(starts, dtype="int64"),
                    "frame_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def attach_avi_media(df: DataFrame, id_col: str) -> DataFrame:
    """Derive a REAL encoded AVI (uncompressed 24-bit DIB) payload.

    Deterministic fixture: ``4 + id % 4`` frames of an
    ``(8 + id%5) × (6 + id%7)`` grayscale gradient with
    ``pixel(x, y, f) = (3x + 5y + 11f + id) mod 256`` at 40 ms/frame —
    closed-form pixels make decoded-frame aggregates exact SQL oracles,
    and the per-frame ``11f`` term means a decoder that misorders or
    drops frames cannot reproduce them.
    """
    _, _, _, avi_codec = _ship_codecs_by_value()
    avi_encode = avi_codec.avi_encode

    @F.pandas_udf("binary")
    def gen(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            w, h, n = 8 + i % 5, 6 + i % 7, 4 + i % 4
            frames = [
                bytes(
                    (3 * x + 5 * y + 11 * f + i) % 256
                    for y in range(h)
                    for x in range(w)
                )
                for f in range(n)
            ]
            out.append(avi_encode(frames, w, h, frame_ms=40))
        return pd.Series(out)

    return (
        _widen(df).withColumn("payload", gen(F.col(id_col)))
        .withColumn("kind", F.lit("video"))
        .withColumn("mime", F.lit("video/x-msvideo"))
    )


def decode_video(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL AVI decode -> per-video metadata + pixel aggregates.

    ``(id, width, height, n_frames, frame_ms, pixel_sum, weighted_sum)``
    from actually parsing the RIFF container and every DIB frame.
    ``pixel_sum`` totals all decoded RGB bytes; ``weighted_sum`` is the
    position-weighted checksum ``Σ (x + 2y + 3f) · byte`` — stride
    padding left in place, unflipped bottom-up rows, or misordered
    frames all shift real pixels to wrong (x, y, f) and break it, so
    the oracle pins the full decode path, not just the byte multiset.
    """
    out_schema = (
        f"{id_col} long, width long, height long, n_frames long, "
        "frame_ms long, pixel_sum long, weighted_sum long"
    )

    _, _, _, avi_codec = _ship_codecs_by_value()
    avi_decode = avi_codec.avi_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                id_col, "width", "height", "n_frames", "frame_ms",
                "pixel_sum", "weighted_sum",
            )}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, ms, frames = avi_decode(bytes(payload))
                psum = wsum = 0
                for f, fr in enumerate(frames):
                    for y in range(h):
                        for x in range(w):
                            base = (y * w + x) * 3
                            s3 = fr[base] + fr[base + 1] + fr[base + 2]
                            psum += s3
                            wsum += (x + 2 * y + 3 * f) * s3
                rows[id_col].append(int(mid))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_frames"].append(len(frames))
                rows["frame_ms"].append(ms)
                rows["pixel_sum"].append(psum)
                rows["weighted_sum"].append(wsum)
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in rows.items()}
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    every_n: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL AVI decode -> every ``every_n``-th frame as a PNG image row.

    1:N row expansion ``(id, frame_idx, frame_ts_ms, frame_sum,
    payload)`` — the video-to-image-shard shape vision training
    pipelines use: sampled frames are re-encoded LOSSLESS (PNG, R
    channel of the already-grayscale DIB) so downstream image operators
    (``decode_image``, resize) consume them unchanged; ``frame_sum``
    totals the sampled frame's RGB bytes and ``frame_ts_ms`` comes from
    the stream timebase, both closed-form under the fixture.
    """
    out_schema = (
        f"{id_col} long, frame_idx long, frame_ts_ms long, "
        "frame_sum long, payload binary"
    )

    png_codec, _, _, avi_codec = _ship_codecs_by_value()
    avi_decode, png_encode = avi_codec.avi_decode, png_codec.png_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, sums, payloads = [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, ms, frames = avi_decode(bytes(payload))
                for f in range(0, len(frames), every_n):
                    fr = frames[f]
                    ids.append(int(mid))
                    idxs.append(f)
                    tss.append(f * ms)
                    sums.append(sum(fr))
                    gray = bytes(fr[3 * i] for i in range(w * h))
                    payloads.append(png_encode(gray, w, h, "L"))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "frame_sum": pd.Series(sums, dtype="int64"),
                    "payload": payloads,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)
