"""Skew-salting proofs (round-6 review Next #5).

tools/skew_bench.py measures the wall-clock win on the 4M-row zipf
fixture (SKEW.json); these tests pin the two properties that make the
win structural, at a size fast enough for every run:

- the salted plan joins on (key, __salt) — i.e. the salt actually
  reaches the shuffle hash, it isn't projected away pre-join;
- a hot key's rows land on ~salt_buckets reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pretalx_hub_etl_spark.operators.joins import salted_join

N = 100_000
BUCKETS = 8


def _skewed_fact(spark):
    # half the rows on key 0, rest uniform over 1000 keys
    return spark.range(N).select(
        F.when(F.col("id") < N // 2, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(1000)))
        .cast("long")
        .alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_join_salt_reaches_the_join_keys(spark):
    fact = _skewed_fact(spark)
    dim = spark.range(1000).select(
        F.col("id").alias("k"), F.lit("x").alias("name")
    )
    out = salted_join(fact, dim, "k", salt_buckets=BUCKETS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan, "salt column missing from the physical plan"
    # the equi-join condition must include BOTH key and salt
    join_lines = [
        ln for ln in plan.splitlines()
        if "Join" in ln and "k#" in ln
    ]
    assert any("__salt" in ln for ln in join_lines), (
        "join keys do not include __salt:\n" + "\n".join(join_lines)
    )


def test_salted_join_matches_plain(spark):
    fact = _skewed_fact(spark)
    dim = spark.range(1000).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    salted = salted_join(fact, dim, "k", salt_buckets=BUCKETS)
    plain = fact.join(dim, "k")
    assert salted.count() == plain.count()
    diff = salted.select("k", "v", "name").exceptAll(
        plain.select("k", "v", "name")
    )
    assert diff.isEmpty()


def test_salting_spreads_the_hot_key(spark):
    fact = _skewed_fact(spark)
    n_parts = 16

    def max_partition_rows(df) -> int:
        counts = (
            df.groupBy(F.spark_partition_id().alias("p"))
            .count()
            .agg(F.max("count").alias("mx"))
            .collect()
        )
        return int(counts[0]["mx"])

    plain_max = max_partition_rows(fact.repartition(n_parts, "k"))
    salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64("k", "v"), F.lit(BUCKETS))
    )
    salted_max = max_partition_rows(
        salted.repartition(n_parts, "k", "__salt")
    )
    # hot key = 50k rows: plain puts them all on ONE reducer (max >= 50k);
    # salted spreads them over ~BUCKETS reducers. Factor 2 is a loose
    # floor (hash collisions can co-locate a few salt buckets) — the
    # measured spread at bench size is ~3.5x (SKEW.json).
    assert plain_max >= N // 2
    assert salted_max * 2 < plain_max, (plain_max, salted_max)
