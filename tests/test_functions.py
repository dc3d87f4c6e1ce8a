"""Edge-semantics unit tests for the scalar helpers (SURVEY.md §5.2.2).

These pin the parity traps surveyed from the reference: falsy-vs-NULL
coalesce, the `find() > 0` off-by-one, strict map lookup, both %z offset
spellings, and the engine's fixed-point quantization.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from pretalx_hub_etl_spark.functions import (
    falsy_coalesce,
    found_after_first,
    plural_label,
    strict_map_lookup,
)
from pretalx_hub_etl_spark.functions.core import fixed_point, parse_offset_ts


def test_falsy_coalesce_maps_null_and_empty(spark):
    df = spark.createDataFrame(
        [(None,), ("",), ("x",), (" ",)], "v string"
    ).select(falsy_coalesce("v", "D").alias("out"))
    assert [r.out for r in df.collect()] == ["D", "D", "x", " "]


def test_found_after_first_misses_index_zero(spark):
    # reference main.py:242: `.find("invalid") > 0` — match at index 0 MISSED
    df = spark.createDataFrame(
        [("invalid start",), ("is invalid",), ("clean",)], "v string"
    ).select(found_after_first("v", "invalid").alias("out"))
    assert [r.out for r in df.collect()] == [False, True, False]


def test_plural_label(spark):
    df = spark.createDataFrame(
        [(["A"],), (["A", "B"],)], "v array<string>"
    ).select(plural_label("Speaker", "v").alias("out"))
    assert [r.out for r in df.collect()] == ["Speaker: A", "Speakers: A, B"]


def test_strict_map_lookup_hit_and_miss(spark):
    m = {1: "one", 2: "two"}
    ok = spark.createDataFrame([(1,), (2,)], "k int").select(
        strict_map_lookup(m, "k").alias("v")
    )
    assert [r.v for r in ok.collect()] == ["one", "two"]
    # ANSI mode (engine default): missing key raises like Python KeyError
    # (reference main.py:120)
    miss = spark.createDataFrame([(3,)], "k int").select(
        strict_map_lookup(m, "k").alias("v")
    )
    with pytest.raises(Exception):
        miss.collect()


def test_parse_offset_ts_both_spellings(spark):
    # Python %z accepts +01:00 AND +0100 (reference main.py:128)
    df = spark.createDataFrame(
        [("2026-08-01T10:00:00+01:00",), ("2026-08-01T10:00:00+0100",)], "s string"
    ).select(parse_offset_ts("s").alias("ts"))
    rows = [r.ts for r in df.collect()]
    assert rows[0] == rows[1]
    assert rows[0] == datetime.datetime(2026, 8, 1, 9, 0, 0)  # UTC session tz


def test_fixed_point_half_boundary(spark):
    df = spark.createDataFrame(
        [(2.675,), (2.665,), (-1.005,)], "v double"
    ).select(fixed_point(F.col("v")).alias("out"))
    out = [r.out for r in df.collect()]
    # floor(x*100+0.5)/100 must equal the same IEEE ops computed anywhere
    # else (that cross-engine determinism is the whole point of the helper)
    import math

    expect = [math.floor(v * 100 + 0.5) / 100 for v in (2.675, 2.665, -1.005)]
    assert out == expect
