"""Runtime bloom-filter join pruning (engine facility, plan-verified).

Spark injects a bloom filter built from a SELECTIVE join side into the
other side's scan path (`spark.sql.optimizer.runtime.bloomFilter.*`),
so fact rows that cannot match are dropped BEFORE the shuffle instead
of surviving until the join — at 100 TB this is the difference between
shuffling the whole fact table and shuffling the matching slice. The
heuristics are sized for that scale: the application side must exceed
`applicationSideScanSizeThreshold` (default 10 GB), which is why test
corpora never trigger it organically — the test lowers the threshold
and pins that the canonical selective-dim ⋈ fact file-scan shape gets
the filter, so a conf or heuristic regression (or an engine-conf change
of ours) shows up here rather than as silent full-table shuffles at
scale. Note the application side must be a FILE scan: the earlier
in-memory `spark.range` formulation is never eligible.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from pretalx_hub_etl_spark.catalog import Catalog

SF = "/root/testdata/sf0.01"

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # the 10 GB default is the 100 TB heuristic; the sf0.01 fact is KBs
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": "1KB",
    # force a shuffle join: bloom filters target joins too big to broadcast
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def test_bloom_filter_injected_on_selective_join(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    try:
        for k, v in _CONFS.items():
            spark.conf.set(k, v)
        cat = Catalog(spark, SF)
        fact = cat.lineitem.select("l_partkey", "l_quantity")
        dim = cat.part.filter(F.col("p_brand") == "Brand#11").select(
            "p_partkey"
        )
        joined = fact.join(
            dim, fact.l_partkey == dim.p_partkey
        ).agg(F.sum("l_quantity").cast("long").alias("s"))
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "bloom_filter_agg" in plan or "BloomFilter" in plan, plan
        # the filter is a pure pruning hint: result unchanged vs plain join
        got = joined.collect()[0].s
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        plain = (
            fact.join(dim, fact.l_partkey == dim.p_partkey)
            .agg(F.sum("l_quantity").cast("long").alias("s"))
            .collect()[0]
            .s
        )
        assert got == plain and got > 0
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
