"""Pure-stdlib Avro Object Container File codec + distributed read/write.

S4's sink matrix (parquet/json/csv/orc, round-9 XML) lacked Avro — the
one remaining mainstream interchange format, the first thing a
Kafka-adjacent pipeline hits. This sandbox ships neither the
`spark-avro` datasource jar nor the `avro`/`fastavro` Python packages,
so — same policy as the PNG/WAV/JPEG/AVI codecs in `llm/` — the format
is implemented from its PUBLIC specification (Apache Avro 1.x, the
"Object Container Files" and "Binary Encoding" sections):

    header  = magic b"Obj\\x01"
            + file-metadata map {avro.schema: <json>, avro.codec: ...}
            + 16-byte sync marker
    block*  = row-count (zigzag varint long) + byte-size (long)
            + codec-compressed concatenated records + sync marker

    long/int    zigzag varint          float/double  little-endian IEEE
    string/bytes length-prefixed       boolean       one byte
    union       zigzag branch index + value          null  zero bytes
    array       repeated (count, items...) blocks, 0-count terminator
    record      fields in schema order, no tags

Supported here: records of null/boolean/int/long/float/double/string/
bytes, nullable unions, arrays, nested records; codecs `null` and
`deflate` (raw zlib, per spec). That covers every Spark type the engine
round-trips through interchange formats.

Distributed integration (the 100 TB shape — no driver data movement):
`write_avro` serializes each partition to one OCF file from inside
`mapInPandas` (Arrow batches in, executor-local file writes to shared
storage — the same executor-writes contract as every Spark file sink);
`read_avro` lists files with Spark's `binaryFile` source and decodes
each file's bytes back to rows in `mapInPandas`. Both paths stream
batch-at-a-time; neither collects.
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid
import zlib
from collections.abc import Iterable, Iterator
from typing import Any

MAGIC = b"Obj\x01"

# --- primitive binary encoding ----------------------------------------------


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    u &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift, u = 0, 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _enc_string(s: str) -> bytes:
    raw = s.encode("utf-8")
    return _zigzag_encode(len(raw)) + raw


def _enc_bytes(b: bytes) -> bytes:
    return _zigzag_encode(len(b)) + bytes(b)


# --- schema-driven record codec ----------------------------------------------


def _encode(value: Any, schema: Any, out: bytearray) -> None:
    if isinstance(schema, list):  # union: branch index then value
        if value is None:
            idx = schema.index("null")
            out += _zigzag_encode(idx)
            return
        idx = next(i for i, s in enumerate(schema) if s != "null")
        out += _zigzag_encode(idx)
        _encode(value, schema[idx], out)
        return
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _encode(value[f["name"]], f["type"], out)
            return
        if t == "array":
            if value:
                out += _zigzag_encode(len(value))
                for item in value:
                    _encode(item, schema["items"], out)
            out += _zigzag_encode(0)
            return
        # {"type": "long", "logicalType": ...} and friends
        _encode(value, t, out)
        return
    if schema == "null":
        return
    if schema == "boolean":
        out += b"\x01" if value else b"\x00"
    elif schema in ("int", "long"):
        out += _zigzag_encode(int(value))
    elif schema == "float":
        out += struct.pack("<f", float(value))
    elif schema == "double":
        out += struct.pack("<d", float(value))
    elif schema == "string":
        out += _enc_string(value)
    elif schema == "bytes":
        out += _enc_bytes(value)
    else:
        raise ValueError(f"unsupported avro type {schema!r}")


def _read_exact(buf: io.BytesIO, n: int) -> bytes:
    """Length-validated read: a truncated payload must raise, not decode
    garbage (``buf.read(1) == b'\\x01'`` on an empty read used to return
    a quiet False; float/double unpack would raise a confusing
    struct.error; string/bytes would come back short)."""
    if n < 0:
        raise ValueError(f"negative avro length {n} (corrupt payload)")
    b = buf.read(n)
    if len(b) != n:
        raise EOFError(
            f"truncated avro payload: wanted {n} bytes, got {len(b)}"
        )
    return b


def _decode(buf: io.BytesIO, schema: Any) -> Any:
    if isinstance(schema, list):
        return _decode(buf, schema[_zigzag_decode(buf)])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {
                f["name"]: _decode(buf, f["type"])
                for f in schema["fields"]
            }
        if t == "array":
            items = []
            while True:
                n = _zigzag_decode(buf)
                if n == 0:
                    return items
                if n < 0:  # spec: negative count is followed by byte size
                    n = -n
                    _zigzag_decode(buf)
                for _ in range(n):
                    items.append(_decode(buf, schema["items"]))
        return _decode(buf, t)
    if schema == "null":
        return None
    if schema == "boolean":
        return _read_exact(buf, 1) == b"\x01"
    if schema in ("int", "long"):
        return _zigzag_decode(buf)
    if schema == "float":
        return struct.unpack("<f", _read_exact(buf, 4))[0]
    if schema == "double":
        return struct.unpack("<d", _read_exact(buf, 8))[0]
    if schema == "string":
        n = _zigzag_decode(buf)
        return _read_exact(buf, n).decode("utf-8")
    if schema == "bytes":
        n = _zigzag_decode(buf)
        return _read_exact(buf, n)
    raise ValueError(f"unsupported avro type {schema!r}")


# --- container file -----------------------------------------------------------


def write_ocf(
    fh,
    schema: dict,
    rows: Iterable[dict],
    codec: str = "null",
    block_rows: int = 4096,
    sync: bytes | None = None,
) -> int:
    """Write an Object Container File; returns rows written. ``sync``
    is random per spec — injectable for byte-deterministic tests."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = os.urandom(16) if sync is None else sync
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    fh.write(MAGIC)
    hdr = bytearray()
    hdr += _zigzag_encode(len(meta))
    for k, v in meta.items():
        hdr += _enc_string(k)
        hdr += _enc_bytes(v)
    hdr += _zigzag_encode(0)
    fh.write(bytes(hdr))
    fh.write(sync)

    total = 0
    block: bytearray = bytearray()
    n_in_block = 0

    def flush():
        nonlocal block, n_in_block
        if not n_in_block:
            return
        payload = bytes(block)
        if codec == "deflate":
            # spec: deflate = RFC 1951 raw stream (no zlib wrapper)
            payload = zlib.compress(payload)[2:-4]
        fh.write(_zigzag_encode(n_in_block))
        fh.write(_zigzag_encode(len(payload)))
        fh.write(payload)
        fh.write(sync)
        block, n_in_block = bytearray(), 0

    for row in rows:
        _encode(row, schema, block)
        n_in_block += 1
        total += 1
        if n_in_block >= block_rows:
            flush()
    flush()
    return total


def read_ocf(fh) -> tuple[dict, Iterator[dict]]:
    """Read an OCF: returns (schema, row iterator). Validates magic,
    per-block sync markers, and the declared codec."""
    if fh.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    buf = io.BytesIO(fh.read())
    meta: dict[str, bytes] = {}
    n = _zigzag_decode(buf)
    while n != 0:
        if n < 0:
            n = -n
            _zigzag_decode(buf)
        for _ in range(n):
            k = _decode(buf, "string")
            v = _decode(buf, "bytes")
            meta[k] = v
        n = _zigzag_decode(buf)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = buf.read(16)

    def rows() -> Iterator[dict]:
        while True:
            try:
                count = _zigzag_decode(buf)
            except EOFError:
                return
            size = _zigzag_decode(buf)
            payload = buf.read(size)
            if codec == "deflate":
                payload = zlib.decompress(payload, wbits=-15)
            if buf.read(16) != sync:
                raise ValueError("sync marker mismatch (corrupt block)")
            bbuf = io.BytesIO(payload)
            for _ in range(count):
                yield _decode(bbuf, schema)

    return schema, rows()


# --- Spark integration ---------------------------------------------------------


def spark_schema_to_avro(schema, name: str = "row") -> dict:
    """StructType -> Avro record schema. Nullable fields become
    ["null", T] unions; timestamps travel as timestamp-micros longs
    (Spark's native resolution)."""
    from pyspark.sql import types as T

    def conv(dt, nullable):
        if isinstance(dt, T.LongType):
            a = "long"
        elif isinstance(dt, T.IntegerType):
            a = "int"
        elif isinstance(dt, T.DoubleType):
            a = "double"
        elif isinstance(dt, T.FloatType):
            a = "float"
        elif isinstance(dt, T.StringType):
            a = "string"
        elif isinstance(dt, T.BinaryType):
            a = "bytes"
        elif isinstance(dt, T.BooleanType):
            a = "boolean"
        elif isinstance(dt, T.TimestampType):
            a = {"type": "long", "logicalType": "timestamp-micros"}
        elif isinstance(dt, T.ArrayType):
            a = {
                "type": "array",
                "items": conv(dt.elementType, dt.containsNull),
            }
        elif isinstance(dt, T.StructType):
            a = spark_schema_to_avro(dt, name=f"{name}_n")
        else:
            raise ValueError(f"no avro mapping for spark type {dt}")
        return ["null", a] if nullable else a

    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": conv(f.dataType, f.nullable)}
            for f in schema.fields
        ],
    }


def _ship_self_by_value() -> None:
    """The round-5 worker-shippability rule (see llm/multimodal.py):
    the mapInPandas closures below reference this module's codec
    functions, which cloudpickle serializes by module+qualname — and
    Spark's Python workers do not inherit the driver's sys.path
    additions, so a plain-session run from another cwd dies with
    ModuleNotFoundError (caught by the vanilla sweep). Registering the
    module by value makes the referenced functions travel inside the
    task closure (pure stdlib, a few KB). Idempotent."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])


def write_avro(df, path: str, codec: str = "deflate") -> None:
    """Distributed Avro sink: one OCF file per partition, written from
    inside ``mapInPandas`` on the executors (Arrow batches in, local
    file-system writes to shared storage out — the contract every Spark
    file sink has). The tiny returned manifest frame (path, rows) is
    only materialized to force execution."""
    import pandas as pd

    _ship_self_by_value()
    avro_schema = spark_schema_to_avro(df.schema)
    os.makedirs(path, exist_ok=True)

    def part_writer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fname = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
        n = 0
        first = True
        fh = None
        sync = os.urandom(16)
        try:
            def _py(v, fschema):
                # Arrow/pandas cell -> plain-python avro value, driven
                # by the field's avro schema: pandas spells missing
                # floats as NaN, but NaN is also a VALID IEEE value — it
                # maps to None (avro null) only when the field is a
                # nullable union; a non-nullable float/double keeps its
                # NaN, and an actual None in a non-nullable field errors
                # HERE with the field context instead of deep in _encode
                nullable = isinstance(fschema, list)
                inner = (
                    next((s for s in fschema if s != "null"), "null")
                    if nullable
                    else fschema
                )
                if v is None or v is pd.NaT:
                    if not nullable:
                        raise ValueError(
                            f"null value for non-nullable avro field "
                            f"of type {inner!r}"
                        )
                    return None
                if isinstance(v, float) and v != v:  # NaN
                    return None if nullable else v
                if isinstance(v, (bytes, str, bool, int, float)):
                    return v
                if isinstance(v, pd.Timestamp):
                    return v.value // 1000  # ns -> micros
                items = (
                    inner.get("items")
                    if isinstance(inner, dict)
                    else None
                )
                if isinstance(v, (list, tuple)):
                    return [_py(x, items) for x in v]
                if hasattr(v, "tolist"):  # numpy scalar or array
                    t = v.tolist()
                    return (
                        [_py(x, items) for x in t]
                        if isinstance(t, list)
                        else _py(t, fschema)
                    )
                if isinstance(v, dict) and isinstance(inner, dict):
                    return {
                        f["name"]: _py(v.get(f["name"]), f["type"])
                        for f in inner.get("fields", [])
                    }
                return v

            field_schemas = {
                f["name"]: f["type"] for f in avro_schema["fields"]
            }
            for pdf in batches:
                rows = [
                    {k: _py(v, field_schemas[k]) for k, v in rec.items()}
                    for rec in pdf.to_dict("records")
                ]
                if first:
                    fh = open(fname, "wb")
                    # write header once, then append blocks per batch
                    write_ocf(
                        fh, avro_schema, rows, codec=codec, sync=sync
                    )
                    first = False
                    # reopen in append mode conceptually: keep fh, write
                    # further blocks through _append below
                else:
                    _append_blocks(fh, avro_schema, rows, codec, sync)
                n += len(rows)
        finally:
            if fh is not None:
                fh.close()
        if n == 0 and os.path.exists(fname):
            os.remove(fname)
        yield pd.DataFrame({"path": [fname], "rows": [n]})

    # driver-bounded collect: one manifest row PER PARTITION (file path
    # + row count), never data — it exists to force the write job
    df.mapInPandas(part_writer, schema="path string, rows long").collect()


def _append_blocks(fh, schema, rows, codec, sync):
    """Append additional data blocks to an already-headered OCF."""
    if not rows:
        return
    block = bytearray()
    for row in rows:
        _encode(row, schema, block)
    payload = bytes(block)
    if codec == "deflate":
        payload = zlib.compress(payload)[2:-4]
    fh.write(_zigzag_encode(len(rows)))
    fh.write(_zigzag_encode(len(payload)))
    fh.write(payload)
    fh.write(sync)


def read_avro(spark, path: str, spark_schema):
    """Distributed Avro source: Spark's binaryFile lists and ships each
    file's bytes; decoding to rows happens in ``mapInArrow`` on the
    executors with the EXPLICIT schema (no inference scan — the catalog
    rule). Arrow (not pandas) batches deliberately: pandas spells both
    "missing" and IEEE NaN as NaN, so the round-trip through a pandas
    frame would null out genuine NaN values — ``pa.array`` with plain
    Python cells keeps None as null and NaN as NaN (and a null landing
    in a non-nullable Spark field fails the scan instead of lying).
    Timestamp-micros longs become timestamp('us') arrays directly."""
    import pyarrow as pa

    from pyspark.sql import functions as F
    from pyspark.sql.pandas.types import to_arrow_schema

    _ship_self_by_value()
    arrow_schema = to_arrow_schema(spark_schema)

    def part_reader(batches):
        for batch in batches:
            for content in batch.column(0).to_pylist():
                _schema, rows = read_ocf(io.BytesIO(bytes(content)))
                recs = list(rows)
                arrays = [
                    pa.array(
                        [r.get(f.name) for r in recs], type=f.type
                    )
                    for f in arrow_schema
                ]
                yield pa.RecordBatch.from_arrays(
                    arrays, schema=arrow_schema
                )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select(F.col("content"))
    )
    return files.mapInArrow(part_reader, schema=spark_schema)
