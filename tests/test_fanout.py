"""ST18: exactly-once multi-table streaming fan-out.

Each microbatch commits to N tables through one S45 transaction; a
replayed batch commits nothing twice (coordinator-recorded dedup with
the commit-vs-lower-bound crash window covered by the intent scan).
"""

from __future__ import annotations

import json
import os

import pytest

from pretalx_hub_etl_spark.sinks.manifest import CommitLog
from pretalx_hub_etl_spark.sinks.merge import MergeSink
from pretalx_hub_etl_spark.sinks.mor import MorTable
from pretalx_hub_etl_spark.sinks.txn import LakehouseTransaction, _publish_one
from pretalx_hub_etl_spark.streaming.fanout import fanout_sink


def _mk(spark, tmp_path):
    bronze = os.path.join(str(tmp_path), "bronze")
    silver = os.path.join(str(tmp_path), "silver")
    MergeSink(bronze, key="k").init(
        spark.createDataFrame([(0, 0)], "k INT, v INT")
    )
    MorTable(silver, key="k").init(
        spark.createDataFrame([(0, 0)], "k INT, v INT")
    )
    coord = os.path.join(str(tmp_path), "fanout")
    return bronze, silver, coord


def test_fanout_through_a_real_stream(spark, tmp_path):
    import pyspark.sql.functions as F

    bronze, silver, coord = _mk(spark, tmp_path)
    src = os.path.join(str(tmp_path), "src")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    spark.createDataFrame(
        [(1, 10), (2, 20)], "k INT, v INT"
    ).write.parquet(src)
    sink = fanout_sink(
        coord,
        {
            bronze: lambda b: b,  # raw mirror (append)
            silver: lambda b: b.withColumn(
                "v", F.col("v") * 2
            ),  # keyed upsert
        },
    )

    def run_stream():
        q = (
            spark.readStream.schema("k INT, v INT")
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_stream()
    got_b = {
        (r.k, r.v) for r in MergeSink(bronze, key="k").read(spark).collect()
    }
    got_s = {
        (r.k, r.v) for r in MorTable(silver, key="k").read(spark).collect()
    }
    assert got_b == {(0, 0), (1, 10), (2, 20)}
    assert got_s == {(0, 0), (1, 20), (2, 40)}
    # restart over the SAME checkpoint with no new data: nothing doubles
    run_stream()
    assert MergeSink(bronze, key="k").read(spark).count() == 3
    assert MorTable(silver, key="k").read(spark).count() == 3


def test_replayed_batch_is_deduplicated(spark, tmp_path):
    bronze, silver, coord = _mk(spark, tmp_path)
    sink = fanout_sink(coord, {bronze: lambda b: b, silver: lambda b: b})
    batch = spark.createDataFrame([(1, 10)], "k INT, v INT")
    sink(batch, 0)
    sink(batch, 0)  # replay after restart
    assert MergeSink(bronze, key="k").read(spark).count() == 2
    assert MorTable(silver, key="k").read(spark).count() == 2
    sink(batch, 1)  # a NEW batch still commits
    assert MergeSink(bronze, key="k").read(spark).count() == 3


def test_crash_between_commit_and_lower_bound_write(spark, tmp_path):
    # the window a bare side-file design double-loads: txn committed,
    # state file never advanced — the intent scan must catch it
    bronze, silver, coord = _mk(spark, tmp_path)
    txn = LakehouseTransaction(coord)
    batch = spark.createDataFrame([(1, 10)], "k INT, v INT")
    txn.stage_append(bronze, batch)
    txn.stage_mor_upsert(silver, source=batch)
    txn.commit(extra={"stream_batch_id": 0})
    # CRASH here: no _stream_state.json
    sink = fanout_sink(coord, {bronze: lambda b: b, silver: lambda b: b})
    sink(batch, 0)  # replay
    assert MergeSink(bronze, key="k").read(spark).count() == 2  # not 3
    assert MorTable(silver, key="k").read(spark).count() == 2


def test_crash_mid_publish_heals_not_repeats(spark, tmp_path):
    bronze, silver, coord = _mk(spark, tmp_path)
    batch = spark.createDataFrame([(1, 10)], "k INT, v INT")
    txn = LakehouseTransaction(coord)
    txn.stage_append(bronze, batch)
    txn.stage_mor_upsert(silver, source=batch)
    os.makedirs(coord, exist_ok=True)
    intent = {
        "id": txn.id,
        "entries": txn._entries,
        "stream_batch_id": 0,
    }
    with open(os.path.join(coord, f"{txn.id}.json"), "x") as fh:
        json.dump(intent, fh)
    _publish_one(coord, txn.id, 0, txn._entries[0])
    # CRASH mid-publish: bronze published (invisible), silver pending
    sink = fanout_sink(coord, {bronze: lambda b: b, silver: lambda b: b})
    sink(batch, 0)  # replay: heal completes THE SAME txn, no re-commit
    assert MergeSink(bronze, key="k").read(spark).count() == 2
    assert MorTable(silver, key="k").read(spark).count() == 2


def test_coordinator_is_garbage_collected(spark, tmp_path):
    bronze, silver, coord = _mk(spark, tmp_path)
    sink = fanout_sink(coord, {bronze: lambda b: b})
    for i in range(3):
        sink(spark.createDataFrame([(10 + i, i)], "k INT, v INT"), i)
    left = [f for f in os.listdir(coord) if f != "_stream_state.json"]
    assert left == [], f"coordinator not reclaimed: {left}"
    # dedup still holds via the lower bound after gc
    sink(spark.createDataFrame([(99, 9)], "k INT, v INT"), 2)
    assert MergeSink(bronze, key="k").read(spark).count() == 4
