"""Property-based Avro OCF roundtrip (hypothesis): arbitrary rows over a
schema exercising every supported shape — nullable unions, arrays,
unicode strings, raw bytes, full-range longs, both codecs — must decode
byte-for-value identical, across random block sizes (block boundaries
are where container codecs break)."""

from __future__ import annotations

import io

from hypothesis import given, settings
from hypothesis import strategies as st

from pretalx_hub_etl_spark.sources.avro_ocf import read_ocf, write_ocf

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "c", "type": {"type": "array", "items": "long"}},
        {"name": "d", "type": "bytes"},
        {"name": "e", "type": "boolean"},
        {"name": "f", "type": ["null", "double"]},
    ],
}

ROW = st.fixed_dictionaries(
    {
        "a": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "b": st.none() | st.text(max_size=20),
        "c": st.lists(
            st.integers(min_value=-(2**40), max_value=2**40), max_size=5
        ),
        "d": st.binary(max_size=20),
        "e": st.booleans(),
        # finite doubles only: NaN != NaN would fail equality for the
        # wrong reason (the container carries the bits either way)
        "f": st.none()
        | st.floats(allow_nan=False, allow_infinity=False, width=64),
    }
)


@settings(max_examples=50, deadline=None)
@given(
    rows=st.lists(ROW, max_size=30),
    codec=st.sampled_from(["null", "deflate"]),
    block_rows=st.integers(min_value=1, max_value=7),
)
def test_ocf_roundtrip_any_rows(rows, codec, block_rows):
    buf = io.BytesIO()
    n = write_ocf(buf, SCHEMA, rows, codec=codec, block_rows=block_rows)
    assert n == len(rows)
    buf.seek(0)
    schema, it = read_ocf(buf)
    assert schema == SCHEMA
    assert list(it) == rows
