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



def test_ivf_index_probe_is_partition_pruned(spark, tmp_path):
    """build_ivf_index + ivf_probe_topk: the probe must read ONLY the
    probed inverted-list directories (n_probe/n_centroids scan fraction).
    Proven three ways: (1) the scan's PartitionFilters carries the
    centroid IN-list at planning time; (2) the probe equals the in-memory
    IVF with the same quantizer; (3) corrupting an UNPROBED partition's
    parquet file leaves the probe working — while an unpruned read of the
    same table crashes on the garbage file."""
    import contextlib
    import glob
    import io
    import os

    from pyspark.sql import functions as F

    from pretalx_hub_etl_spark.catalog import Catalog
    from pretalx_hub_etl_spark.llm.similarity import (
        _assign_nearest,
        build_ivf_index,
        ivf_cosine_topk,
        ivf_probe_topk,
        probe_centroid_ids,
    )

    e = Catalog(spark, "/root/testdata/sf0.001").embeddings
    queries = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = str(tmp_path / "ivf")
    n_centroids, n_probe = 8, 2
    build_ivf_index(e, idx, n_centroids=n_centroids, centroids="lowest_id")

    # which lists will the probe touch? (same assignment the probe runs)
    cents = spark.read.parquet(f"{idx}/centroids").select(
        "centroid_id", F.col("centroid").alias("__cent")
    )
    probed_ids = set(
        probe_centroid_ids(
            _assign_nearest(queries, cents, "embedding", "query_id", "__qvec", n_probe)
        )
    )
    all_ids = {
        int(os.path.basename(d).split("=")[1])
        for d in glob.glob(f"{idx}/lists/centroid_id=*")
    }
    assert len(all_ids) == n_centroids
    untouched = all_ids - probed_ids
    assert untouched  # scan fraction n_probe/n_centroids < 1

    # (3) vandalize one partition the probe never visits
    victim = sorted(untouched)[0]
    for f in glob.glob(f"{idx}/lists/centroid_id={victim}/*.parquet"):
        with open(f, "wb") as fh:
            fh.write(b"this is not a parquet file")

    probed = ivf_probe_topk(spark, idx, queries, k=5, n_probe=n_probe)

    # (1) planning-time pruning visible in the plan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probed.explain("formatted")
    part_lines = [
        line for line in buf.getvalue().splitlines() if "PartitionFilters" in line
    ]
    assert any("centroid_id" in line for line in part_lines)

    rows = probed.collect()  # succeeds: the garbage file is pruned out

    # (2) identical to the in-memory IVF with the same lowest-id quantizer
    mem = ivf_cosine_topk(
        e, queries, k=5, n_centroids=n_centroids, n_probe=n_probe,
        centroids="lowest_id",
    )
    assert sorted((r.query_id, r.vec_id, r.rank) for r in rows) == sorted(
        (r.query_id, r.vec_id, r.rank) for r in mem.collect()
    )

    # an UNPRUNED read of the vandalized table must hit the garbage file
    with pytest.raises(Exception):
        spark.read.schema("vec_id long, embedding array<float>").parquet(
            f"{idx}/lists"
        ).collect()
