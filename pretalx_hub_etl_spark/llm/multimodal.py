"""Multimodal column plumbing (SURVEY.md L5).

Media payloads are opaque ``binary`` columns travelling next to typed
metadata (the only shape that works at 100 TB: Spark shuffles/spills binary
columns fine, and decode happens once, executor-side, in Arrow batches).

The decode/feature steps are Pandas-UDF-backed ``mapInPandas`` operators
with REAL Spark plumbing (schema, batch iteration, partitioning) and a
STUBBED codec: the container has no image/audio libraries, so ``decode``
produces a deterministic fake feature vector (documented) or raises
``NotImplementedError`` in strict mode. Swapping in PIL/librosa is a
one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def attach_fake_media(df: DataFrame, id_col: str) -> DataFrame:
    """Derive a deterministic opaque binary payload column from an id.

    Stands in for real encoded media so the binary-column plumbing
    (schema, shuffle, UDF batch shapes) is exercised end-to-end.
    """
    return df.withColumn(
        "payload", F.encode(F.concat(F.lit("mediabytes:"), F.col(id_col).cast("string")), "UTF-8")
    ).withColumn("kind", F.lit("image")).withColumn("mime", F.lit("image/fake"))


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
