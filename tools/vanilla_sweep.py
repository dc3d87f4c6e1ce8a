"""Driver-contract emulation sweep: every declared query under a PLAIN
SparkSession, launched as if from outside the repo.

The external verify driver imports ``__spark_entry__`` with its OWN
vanilla session and its own cwd. Two whole bug classes only reproduce
under exactly those conditions, and in-repo pytest can never catch
either (the package is importable everywhere there):

- closures/classes cloudpickled BY REFERENCE into Python workers that
  don't have the repo on sys.path (ModuleNotFoundError at run time —
  round 5's DataSource/mapInPandas bugs, round 7's codec UDFs);
- engine-conf assumptions a ``get_spark`` session hides (the events
  TIMESTAMP_NANOS conf — ``ensure_engine_conf`` must upgrade the
  foreign session at runtime).

Run: python tools/vanilla_sweep.py [sf_dir]     (default sf0.001)
Exit 0 iff every declared query row-counts successfully.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir("/tmp")  # the point: NOT the repo directory
    sys.path.insert(0, repo)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    fails = []
    for name, fn in entry.queries().items():
        try:
            spark.catalog.clearCache()
            n = fn(spark, sf_dir).count()
            print(f"ok {name} {n}", flush=True)
        except Exception as e:  # noqa: BLE001 - report-and-continue sweep
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            fails.append(name)
    print()
    if fails:
        print(f"{len(fails)} FAILURES: {fails}")
        return 1
    print("all green (vanilla session, cwd=/tmp)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
