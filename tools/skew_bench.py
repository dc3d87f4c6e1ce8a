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
    # ---- aggregation skew (round-7 review, Next #9) ----------------------
    # Algebraic aggs (sum/count/min/max) are skew-immune in Spark: map-side
    # partial aggregation collapses the hot key to ONE partial row per map
    # task before the shuffle, so both variants are measured mostly to
    # DOCUMENT that salting is unnecessary there. The agg-skew case that
    # actually hurts — and that AQE cannot fix (skew handling is join-only)
    # — is exact count_distinct: the distinct (k, v) stream re-shuffles ON
    # k for the final count, landing the hot key's ~2M distinct values on
    # one reducer. salted_two_level_agg spreads them over SALT_BUCKETS
    # disjoint buckets whose counts sum exactly.
    from pretalx_hub_etl_spark.operators.agg import salted_two_level_agg

    # distinct-heavy fact: hot key's v values are all distinct
    dfact = spark.range(N_FACT).select(
        F.when(F.col("id") < hot_cut, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
        .cast("long")
        .alias("k"),
        F.col("id").alias("v"),
    )
    dfact.write.mode("overwrite").parquet("/tmp/skew_dfact.parquet")
    dfact = spark.read.parquet("/tmp/skew_dfact.parquet")

    agg_results: dict[str, float] = {}
    agg_results["plain_sum"] = timed(
        lambda: fact.groupBy("k").agg(F.sum("v").alias("s"))
    )
    agg_results["salted_sum"] = timed(
        lambda: salted_two_level_agg(
            fact, ["k"], {"s": ("sum", "v")}, salt_buckets=SALT_BUCKETS
        )
    )
    agg_results["plain_count_distinct"] = timed(
        lambda: dfact.groupBy("k").agg(F.count_distinct("v").alias("nv"))
    )
    agg_results["salted_count_distinct"] = timed(
        lambda: salted_two_level_agg(
            dfact, ["k"], {"nv": ("count_distinct", "v")},
            salt_buckets=SALT_BUCKETS,
        )
    )

    # reducer spread of the final count-distinct shuffle: rows of the
    # distinct (k, v) stream keyed by k alone vs by (k, salt)
    distinct_kv = dfact.distinct()
    agg_plain_parts = (
        distinct_kv.repartition(n_shuffle, "k")
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("mean"))
        .collect()[0]
    )
    agg_salt = F.pmod(F.xxhash64("k", "v"), F.lit(SALT_BUCKETS))
    agg_salted_parts = (
        distinct_kv.withColumn("__salt", agg_salt)
        .repartition(n_shuffle, "k", "__salt")
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("mean"))
        .collect()[0]
    )

    # ---- window skew (round-9: W4b) --------------------------------------
    # A per-group top-k window has no map-side combine and AQE cannot
    # split a window partition, so the hot key's rows all sort on one
    # reducer. salted_group_topk bounds phase-1 reducer input to
    # rows/(key,bucket) and phase-2 to salt_buckets*k rows per key.
    from pretalx_hub_etl_spark.operators.agg import salted_group_topk
    from pyspark.sql import Window

    win_results: dict[str, float] = {}
    w_plain = Window.partitionBy("k").orderBy(F.col("v").desc(), F.col("id2").asc())
    wfact = fact.withColumn("id2", F.monotonically_increasing_id())
    wfact.write.mode("overwrite").parquet("/tmp/skew_wfact.parquet")
    wfact = spark.read.parquet("/tmp/skew_wfact.parquet")
    win_results["plain_topk"] = timed(
        lambda: wfact.withColumn("r", F.row_number().over(w_plain)).filter(
            F.col("r") <= 5
        )
    )
    win_results["salted_topk"] = timed(
        lambda: salted_group_topk(
            wfact, ["k"], "v", k=5, tiebreak=["id2"],
            salt_buckets=SALT_BUCKETS,
        )
    )
    win_plain_parts = (
        wfact.repartition(n_shuffle, "k")
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("mean"))
        .collect()[0]
    )
    win_salt = F.pmod(F.xxhash64("id2"), F.lit(SALT_BUCKETS))
    win_salted_parts = (
        wfact.withColumn("__salt", win_salt)
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
        "agg": {
            "note": (
                "sum is skew-immune via map-side partials (salting adds "
                "a stage for nothing); count_distinct is the agg-skew "
                "case — AQE skew handling is join-only. Wall at this "
                "local scale favors PLAIN (2M rows on one reducer is "
                "still sub-second; the extra salted stage dominates) — "
                "the spread row is the scale claim: the hot reducer's "
                "row share is what turns into the critical path when a "
                "100-TB key carries billions of distinct values"
            ),
            "wall_sec": agg_results,
            "reducer_spread_distinct_pairs": {
                "plain_max_rows": int(agg_plain_parts["mx"]),
                "plain_mean_rows": round(float(agg_plain_parts["mean"]), 1),
                "salted_max_rows": int(agg_salted_parts["mx"]),
                "salted_mean_rows": round(float(agg_salted_parts["mean"]), 1),
            },
        },
        "window": {
            "note": (
                "top-k window skew: no map-side combine exists and AQE "
                "cannot split a window partition, so the plain form's "
                "hot reducer sorts the hot key's full row set; the "
                "salted two-phase form is exact by containment and "
                "bounds phase-1 reducer input by (key, bucket). Wall at "
                "local scale favors plain (one in-memory sort of 2M "
                "rows); the spread row is the 100-TB claim"
            ),
            "wall_sec": win_results,
            "reducer_spread_window_input": {
                "plain_max_rows": int(win_plain_parts["mx"]),
                "plain_mean_rows": round(float(win_plain_parts["mean"]), 1),
                "salted_max_rows": int(win_salted_parts["mx"]),
                "salted_mean_rows": round(float(win_salted_parts["mean"]), 1),
            },
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
