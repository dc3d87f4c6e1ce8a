"""Engine facade + effectful-sink tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from pretalx_hub_etl_spark.engine import Engine
from pretalx_hub_etl_spark.sinks.base import foreach_partition_write
from tests.conftest import SF_SMOKE


def test_engine_sql_over_registered_views(spark):
    eng = Engine(spark, SF_SMOKE)
    out = eng.sql(
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag"
    )
    assert out.count() == 3
    assert eng.table("nation").count() == 25


def test_foreach_partition_write(spark, tmp_path):
    # one writer per partition, rows land exactly once (file-based probe:
    # the writer factory runs executor-side, so collect via the filesystem)
    out_dir = tmp_path / "sinkout"
    out_dir.mkdir()
    path = str(out_dir)

    def writer_factory():
        import os
        import uuid

        fname = os.path.join(path, f"part-{uuid.uuid4().hex}.txt")
        fh = open(fname, "a")

        def write_row(row: dict) -> None:
            fh.write(f"{row['id']}\n")

        return write_row, fh.close

    df = spark.range(100).repartition(4)
    foreach_partition_write(df, writer_factory)

    seen = []
    for f in out_dir.iterdir():
        seen.extend(int(x) for x in f.read_text().split())
    assert sorted(seen) == list(range(100))
    assert len(list(out_dir.iterdir())) == 4  # one writer per partition


def test_approx_count_distinct_within_rsd(spark):
    from pyspark.sql import functions as F

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    exact = li.select(F.countDistinct("l_orderkey")).first()[0]
    approx = li.select(
        F.approx_count_distinct("l_orderkey", rsd=0.05)
    ).first()[0]
    # HLL++ at rsd=0.05: allow 3 sigma
    assert abs(approx - exact) / exact <= 0.15


def test_approx_percentile_within_rank_error(spark):
    from pyspark.sql import functions as F

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    exact, approx = li.select(
        F.percentile("l_quantity", F.lit(0.5)),
        F.percentile_approx("l_quantity", F.lit(0.5), F.lit(10000)),
    ).first()
    # accuracy=10000 -> rank error <= n/10000; quantities are integral
    # 1..50, so the sketch's answer must land within one value step of
    # the exact (interpolated) median
    assert abs(approx - exact) <= 1.0
