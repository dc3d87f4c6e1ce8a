"""fan_out: widens narrow inputs, passes wide inputs through untouched."""

from pretalx_hub_etl_spark.operators.partitioning import fan_out


def test_fan_out_widens_narrow_input(spark):
    df = spark.range(0, 1000).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    wide = fan_out(df)
    assert wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert wide.count() == 1000


def test_fan_out_noop_on_wide_input(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000).repartition(target)
    assert fan_out(df) is df


def test_fan_out_preserves_rows(spark):
    df = spark.range(0, 100).coalesce(1)
    assert sorted(r.id for r in fan_out(df).collect()) == list(range(100))


def test_fan_out_file_scan_uses_metadata_not_rdd(spark, monkeypatch):
    from pyspark.sql import DataFrame

    from tests.conftest import SF_SMOKE

    df = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")

    def boom(self):
        raise AssertionError("fan_out physically planned a file scan")

    # file-backed inputs must size from footer metadata alone — the RDD
    # probe forces a physical planning pass per call (VERDICT r1 #4)
    monkeypatch.setattr(DataFrame, "rdd", property(boom))
    wide = fan_out(df)
    monkeypatch.undo()
    assert wide.count() == df.count()
