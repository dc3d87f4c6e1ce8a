"""Skew-join proof (round-6 review Next #5): measure salted_join vs a
plain shuffle join vs AQE's skew-split on a genuinely skewed key.

Fixture: a zipf-hot-key fact table — HOT_SHARE of all rows carry ONE
join key, the rest are uniform over N_KEYS — joined to a keyed dim
table. Broadcast is disabled for the measured joins: that is the regime
the salted operator exists for (at 100 TB the "small" side often
exceeds any broadcast threshold; with a broadcast there is no shuffle
and no skew to fix).

Three measured plans, min-of-RUNS wall each:

- plain-noAQE: sort-merge join, AQE skew split OFF — the hot key's
  rows land on ONE reducer (the "last reducer" baseline).
- plain-AQE:   same join, AQE skew split ON (engine default) — the
  runtime splits oversized shuffle partitions.
- salted-noAQE: operators/joins.salted_join — the hot key is spread
  over salt_buckets reducers at PLAN time, no runtime help needed.

Also records the reducer spread (max/mean rows per shuffle partition of
the join key distribution) that the salting flattens.

Run: python tools/skew_bench.py        (writes /root/repo/SKEW.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FACT = 4_000_000
N_KEYS = 20_000
HOT_SHARE = 0.5
SALT_BUCKETS = 16
RUNS = 3


def main() -> None:
    from pyspark.sql import functions as F

    from pretalx_hub_etl_spark.operators.joins import salted_join
    from pretalx_hub_etl_spark.session import get_spark

    spark = get_spark("skew-bench")

    # zipf-hot fixture: first HOT_SHARE of ids -> key 0, rest uniform
    hot_cut = int(N_FACT * HOT_SHARE)
    fact = spark.range(N_FACT).select(
        F.when(F.col("id") < hot_cut, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
        .cast("long")
        .alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    fact.write.mode("overwrite").parquet("/tmp/skew_fact.parquet")
    dim.write.mode("overwrite").parquet("/tmp/skew_dim.parquet")
    fact = spark.read.parquet("/tmp/skew_fact.parquet")
    dim = spark.read.parquet("/tmp/skew_dim.parquet")

    def timed(fn) -> float:
        best = float("inf")
        for _ in range(RUNS):
            spark.catalog.clearCache()
            t0 = time.time()
            fn().write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    def with_conf(skew: str, broadcast: str = "-1"):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcast)
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", broadcast
        )

    results: dict[str, float] = {}

    with_conf(skew="false")
    results["plain_noaqe_skewsplit"] = timed(
        lambda: fact.join(dim, "k").select("k", "v", "name")
    )
    results["salted_noaqe_skewsplit"] = timed(
        lambda: salted_join(fact, dim, "k", salt_buckets=SALT_BUCKETS)
        .select("k", "v", "name")
    )
    with_conf(skew="true")
    results["plain_aqe_skewsplit"] = timed(
        lambda: fact.join(dim, "k").select("k", "v", "name")
    )
    results["salted_aqe_skewsplit"] = timed(
        lambda: salted_join(fact, dim, "k", salt_buckets=SALT_BUCKETS)
        .select("k", "v", "name")
    )
    # restore engine defaults
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    # reducer spread: rows per shuffle partition under plain hash(k)
    # vs salted hash(k, salt) partitioning, AQE coalescing aside
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    plain_parts = (
        fact.repartition(n_shuffle, "k")
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("mean"))
        .collect()[0]
    )
    salt = F.pmod(F.xxhash64("k", "v"), F.lit(SALT_BUCKETS))
    salted_parts = (
        fact.withColumn("__salt", salt)
        .repartition(n_shuffle, "k", "__salt")
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("mean"))
        .collect()[0]
    )
    record = {
        "fixture": {
            "fact_rows": N_FACT,
            "dim_rows": N_KEYS,
            "hot_key_share": HOT_SHARE,
            "salt_buckets": SALT_BUCKETS,
            "runs": RUNS,
            "timing": "min_wall_sec, broadcast disabled",
        },
        "wall_sec": results,
        "reducer_spread": {
            "plain_max_rows": int(plain_parts["mx"]),
            "plain_mean_rows": round(float(plain_parts["mean"]), 1),
            "salted_max_rows": int(salted_parts["mx"]),
            "salted_mean_rows": round(float(salted_parts["mean"]), 1),
        },
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SKEW.json",
    )
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
