"""Pure-spec Avro OCF codec (sources/avro_ocf.py): spec byte vectors,
container roundtrips under both codecs, union/array/nested coverage,
corruption detection, and the distributed Spark write/read path."""

from __future__ import annotations

import io

import pytest

from pretalx_hub_etl_spark.sources.avro_ocf import (
    MAGIC,
    _encode,
    _zigzag_encode,
    read_ocf,
    write_ocf,
)

REC = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": "string"},
        {"name": "c", "type": ["null", "double"]},
        {"name": "d", "type": {"type": "array", "items": "long"}},
        {"name": "e", "type": "bytes"},
        {"name": "f", "type": "boolean"},
    ],
}
ROWS = [
    {"a": 27, "b": "foo", "c": None, "d": [1, 2, 3], "e": b"\x00\xff",
     "f": True},
    {"a": -5, "b": "café — 你好", "c": 2.5, "d": [], "e": b"", "f": False},
    {"a": 2**62, "b": "", "c": -0.0, "d": [0], "e": b"x" * 100, "f": True},
]


def test_zigzag_spec_vectors():
    # the exact table from the Avro spec's binary-encoding section
    assert _zigzag_encode(0) == b"\x00"
    assert _zigzag_encode(-1) == b"\x01"
    assert _zigzag_encode(1) == b"\x02"
    assert _zigzag_encode(-2) == b"\x03"
    assert _zigzag_encode(2) == b"\x04"
    assert _zigzag_encode(-64) == b"\x7f"
    assert _zigzag_encode(64) == b"\x80\x01"


def test_record_encoding_spec_vector():
    # the spec's worked example: {"a": 27, "b": "foo"} -> 36 06 66 6f 6f
    out = bytearray()
    _encode(
        {"a": 27, "b": "foo"},
        {
            "type": "record",
            "name": "x",
            "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": "string"},
            ],
        },
        out,
    )
    assert bytes(out) == b"\x36\x06foo"


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip_multiblock(codec):
    rows = ROWS * 700  # forces multiple blocks at block_rows=512
    buf = io.BytesIO()
    assert write_ocf(buf, REC, rows, codec=codec, block_rows=512) == 2100
    buf.seek(0)
    schema, it = read_ocf(buf)
    assert schema == REC
    assert list(it) == rows
    assert buf.getvalue()[:4] == MAGIC


def test_deflate_actually_compresses():
    rows = [{"a": 1, "b": "x" * 50, "c": None, "d": [], "e": b"", "f": True}
            for _ in range(1000)]
    raw, packed = io.BytesIO(), io.BytesIO()
    write_ocf(raw, REC, rows, codec="null")
    write_ocf(packed, REC, rows, codec="deflate")
    assert packed.getbuffer().nbytes < raw.getbuffer().nbytes / 10


def test_corrupt_sync_marker_detected():
    buf = io.BytesIO()
    write_ocf(buf, REC, ROWS, codec="null", sync=b"S" * 16)
    data = bytearray(buf.getvalue())
    data[-1] ^= 0xFF  # flip a byte of the trailing sync marker
    _schema, it = read_ocf(io.BytesIO(bytes(data)))
    with pytest.raises(ValueError, match="sync marker"):
        list(it)


def test_not_avro_rejected():
    with pytest.raises(ValueError, match="not an Avro"):
        read_ocf(io.BytesIO(b"PAR1 not avro"))


def test_nested_record_roundtrip():
    schema = {
        "type": "record",
        "name": "outer",
        "fields": [
            {"name": "k", "type": "long"},
            {
                "name": "inner",
                "type": {
                    "type": "record",
                    "name": "pt",
                    "fields": [
                        {"name": "x", "type": "double"},
                        {"name": "y", "type": ["null", "string"]},
                    ],
                },
            },
        ],
    }
    rows = [
        {"k": 1, "inner": {"x": 1.5, "y": "a"}},
        {"k": 2, "inner": {"x": -2.25, "y": None}},
    ]
    buf = io.BytesIO()
    write_ocf(buf, schema, rows)
    buf.seek(0)
    assert list(read_ocf(buf)[1]) == rows


def test_spark_timestamp_roundtrip_micros(spark, tmp_path):
    # TimestampType crosses as avro timestamp-micros longs and must come
    # back at exactly Spark's native microsecond resolution
    from pyspark.sql import functions as F

    from pretalx_hub_etl_spark.sources.avro_ocf import (
        read_avro,
        write_avro,
    )

    df = spark.sql(
        """
        SELECT id AS k,
               timestampadd(MICROSECOND, CAST(id AS INT) * 1000001,
                            TIMESTAMP '2024-06-01 12:00:00') AS ts
        FROM range(50)
        """
    )
    out = str(tmp_path / "ts_avro")
    write_avro(df, out, codec="null")
    back = read_avro(spark, out, df.schema)
    got = {r.k: r.ts for r in back.collect()}
    want = {r.k: r.ts for r in df.collect()}
    assert got == want  # exact to the microsecond


def test_spark_distributed_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from pretalx_hub_etl_spark.sources.avro_ocf import (
        read_avro,
        write_avro,
    )

    df = (
        spark.range(500)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 1.5).alias("v"),
            F.when(F.col("id") % 4 == 0, F.lit(None).cast("string"))
            .otherwise(F.concat(F.lit("n"), F.col("id")))
            .alias("name"),
            F.array(F.col("id"), F.col("id") + 1).alias("pair"),
        )
        .repartition(4)
    )
    out = str(tmp_path / "avro")
    write_avro(df, out, codec="deflate")
    import glob

    files = glob.glob(f"{out}/*.avro")
    assert len(files) == 4  # one OCF per partition, written by executors
    back = read_avro(spark, out, df.schema)
    got = {r.k: (r.v, r.name, r.pair) for r in back.collect()}
    want = {r.k: (r.v, r.name, r.pair) for r in df.collect()}
    assert got == want
