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
