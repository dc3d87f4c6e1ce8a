"""fan_out: widens narrow file scans, passes wide/non-file inputs through."""

import pytest

from pretalx_hub_etl_spark.operators.partitioning import (
    _parse_byte_size,
    fan_out,
)
from tests.conftest import SF_SMOKE


def test_fan_out_widens_narrow_file_scan(spark):
    # a few-KB parquet file is ONE split; fan_out must widen it to
    # cluster parallelism so CPU-heavy projections use every core
    df = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    wide = fan_out(df)
    assert wide is not df
    assert wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert wide.count() == df.count()


def test_fan_out_noop_on_wide_input(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000).repartition(target)
    assert fan_out(df) is df


def test_fan_out_preserves_rows(spark):
    df = spark.read.parquet(f"{SF_SMOKE}/region.parquet")
    keys = sorted(r.r_regionkey for r in df.collect())
    assert sorted(r.r_regionkey for r in fan_out(df).collect()) == keys


def test_fan_out_never_touches_rdd(spark, monkeypatch):
    """Neither file scans nor non-file plans may physically plan.

    File-backed inputs size from footer metadata; non-file plans estimate
    from spark.sql.shuffle.partitions (round-3 VERDICT: drop the RDD
    fallback entirely — a user calling fan_out on a shuffle-descended
    frame must not pay a planning pass).
    """
    from pyspark.sql import DataFrame

    file_df = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    local_df = spark.range(0, 1000).coalesce(1)

    def boom(self):
        raise AssertionError("fan_out physically planned its input")

    monkeypatch.setattr(DataFrame, "rdd", property(boom))
    wide = fan_out(file_df)
    # shuffle.partitions=4 == defaultParallelism -> estimated wide -> no-op
    assert fan_out(local_df) is local_df
    monkeypatch.undo()
    assert wide.count() == file_df.count()


@pytest.mark.parametrize(
    ("text", "expected"),
    [
        ("134217728", 134217728),
        ("134217728b", 134217728),
        ("128m", 128 * 1024 * 1024),
        ("64MB", 64 * 1024 * 1024),
        ("1g", 1 << 30),
        ("2GB", 2 << 30),
        ("512k", 512 * 1024),
        ("1t", 1 << 40),
        (" 128m ", 128 * 1024 * 1024),
    ],
)
def test_parse_byte_size(text, expected):
    assert _parse_byte_size(text) == expected


def test_parse_byte_size_falls_back_on_garbage():
    default = 128 * 1024 * 1024
    assert _parse_byte_size("not-a-size") == default
    assert _parse_byte_size("") == default
    assert _parse_byte_size("12x") == default
