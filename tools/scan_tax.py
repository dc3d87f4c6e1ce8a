"""Measure the SQL-surface scan tax (VERDICT r11 item 3): the same
predicate + projection read through

  (a) the `lakehouse` Python DataSource (V2 provider surface: Arrow
      batches decoded in Python workers, full-schema reads — Spark 4.1
      pushes no column pruning into Python sources), vs
  (b) the NATIVE path (manifest file list -> direct parquet scan: JVM
      vectorized reader, whole-stage codegen, real column pruning), vs
  (c) the engine API `MergeSink.read_pruned` (native + manifest
      min/max file skipping resolved before Spark plans the scan).

Writes SCAN_TAX.json: min-of-N wall seconds per path + ratios. The
catalog defaults CoW reads to (b) since r12 (also for correctness: the
Python-DS scan collapse, see sources/lakehouse_ds.py); (a) remains the
compat surface for DataFrame-API users of format("lakehouse").

Usage: python tools/scan_tax.py [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pretalx_hub_etl_spark.catalog import Catalog  # noqa: E402
from pretalx_hub_etl_spark.plans.lakehouse_sql import (  # noqa: E402
    LakehouseSqlCatalog,
)
from pretalx_hub_etl_spark.session import get_spark  # noqa: E402
from pretalx_hub_etl_spark.sinks.merge import MergeSink  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "scan-tax",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus},
    )

    base = Catalog(spark, sf_dir).lineitem
    thr = base.agg(F.max("l_orderkey")).collect()[0][0] // 5
    root = tempfile.mkdtemp(prefix="phe_scan_tax_")
    sink = MergeSink(
        os.path.join(root, "t"), key="l_orderkey",
        cluster_by=("l_orderkey", 16),
    )
    sink.init(base)

    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("t_ds", sink.path, use_datasource=True)
    cat.register_cow("t_native", sink.path)
    q = (
        "SELECT l_orderkey, l_quantity FROM {} "
        f"WHERE l_orderkey <= {thr}"
    )

    def timed(fn):
        best = float("inf")
        rows = None
        for _ in range(repeats):
            t0 = time.monotonic()
            rows = fn()
            best = min(best, time.monotonic() - t0)
        return best, rows

    ds_sec, n_ds = timed(lambda: cat.sql(q.format("t_ds")).count())
    # since round 13 the default SQL path extracts the WHERE conjunct
    # and prunes the manifest file list itself — this measures the
    # PRUNED SQL read (the round-13 "done" row: must track read_pruned)
    nat_sec, n_nat = timed(lambda: cat.sql(q.format("t_native")).count())

    def native_full():
        # the pre-r13 default: full manifest file list, predicate left
        # to parquet row-group pushdown
        return (
            sink.read(spark)
            .filter(F.col("l_orderkey") <= thr)
            .select("l_orderkey", "l_quantity")
            .count()
        )

    full_sec, n_full = timed(native_full)

    def pruned():
        df, _scanned, _skipped = sink.read_pruned(
            spark, "l_orderkey", 0, thr
        )
        return df.filter(F.col("l_orderkey") <= thr).select(
            "l_orderkey", "l_quantity"
        ).count()

    pr_sec, n_pr = timed(pruned)
    assert n_ds == n_nat == n_full == n_pr, (n_ds, n_nat, n_full, n_pr)

    la0, la1, _ = os.getloadavg()
    rec = {
        "sf_dir": sf_dir,
        "rows_selected": n_ds,
        "table_rows": base.count(),
        "repeats": repeats,
        "datasource_sec": round(ds_sec, 3),
        "native_full_sec": round(full_sec, 3),
        "sql_pruned_sec": round(nat_sec, 3),
        "read_pruned_sec": round(pr_sec, 3),
        "ds_over_sql_pruned": round(ds_sec / nat_sec, 2),
        "sql_pruned_over_read_pruned": round(pr_sec and nat_sec / pr_sec, 2),
        "loadavg": la0,
        "loadavg_5m": la1,
    }
    shutil.rmtree(root, ignore_errors=True)
    out = os.path.join(os.path.dirname(os.path.dirname(__file__)), "SCAN_TAX.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
