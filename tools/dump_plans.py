"""Dump .explain("formatted") for named queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> <before|after> q_name [q_name ...]
Writes plans/<tag>/<query>_<suffix>.txt (driver-side planning only — the
query function runs to build the DataFrame, but nothing is executed
beyond what the query function itself executes while staging fixtures).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pretalx_hub_etl_spark.queries import load_all
    from pretalx_hub_etl_spark.session import get_spark

    spark = get_spark("plans")
    registry = load_all()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print("wrote", path, file=sys.stderr)


if __name__ == "__main__":
    main()
