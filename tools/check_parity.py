"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs every declared query at a given scale factor, runs its oracle SQL in
DuckDB over the same parquet files, and compares:

- row count
- sorted column names
- values, order-insensitively (rows sorted by all columns; floats compared
  exactly AND with tolerance — exact mismatches are reported even when tiny,
  because the driver's value-hash is presumed exact)

Usage: python tools/check_parity.py [--json OUT.json] [sf_dir] [query ...]

With --json, a per-query record {status, rows, seconds, problems} plus a
summary is written to OUT.json (the committed PARITY_r{N}.json artifact —
the full-registry regression net under the driver's 50-query sample).
"""

from __future__ import annotations

import math
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")


def canonicalize(rows: list[tuple], float_nd: int = 9) -> list[tuple]:
    def norm(v):
        if v is None:
            return ("\x00null",)
        if isinstance(v, float):
            if math.isnan(v):
                return ("nan",)
            return ("f", format(v, ".9e"))
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, int):
            return ("i", v)
        if hasattr(v, "isoformat"):
            return ("t", v.isoformat())
        if isinstance(v, (list, tuple)):
            return ("l", tuple(norm(x) for x in v))
        return ("s", str(v))

    return sorted(tuple(norm(v) for v in row) for row in rows)


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        if len(argv) < 2:
            print("usage: check_parity.py [--json OUT.json] [sf_dir] [query ...]")
            return 2
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    results: dict[str, dict] = {}

    import duckdb

    import __spark_entry__ as entrymod
    from pretalx_hub_etl_spark.session import get_spark

    spark = get_spark("parity-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = [tuple(r) for r in sdf.collect()]
            spark_cols = sorted(sdf.columns)
        except Exception as exc:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            failures.append(name)
            results[name] = {
                "status": "fail",
                "problems": [f"spark error: {type(exc).__name__}: "
                             f"{str(exc).splitlines()[0][:300] if str(exc) else ''}"],
            }
            continue

        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(spark_rows)} rows "
                  f"({time.time()-t0:.1f}s)")
            if not spark_rows:
                print(f"WARN {name}: 0 rows")
            results[name] = {
                "status": "rows_only",
                "rows": len(spark_rows),
                "seconds": round(time.time() - t0, 2),
            }
            continue

        try:
            res = con.execute(oracles[name])
            duck_cols = sorted(d[0] for d in res.description)
            duck_rows = res.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            failures.append(name)
            results[name] = {
                "status": "fail",
                "problems": [f"duckdb error: {type(exc).__name__}: "
                             f"{str(exc).splitlines()[0][:300] if str(exc) else ''}"],
            }
            continue

        problems = []
        if spark_cols != duck_cols:
            problems.append(f"columns differ: spark={spark_cols} duck={duck_cols}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount differs: spark={len(spark_rows)} duck={len(duck_rows)}")
        if not problems:
            # align column order by sorted name on both sides
            s_order = [sdf.columns.index(c) for c in spark_cols]
            d_names = [d[0] for d in res.description]
            d_order = [d_names.index(c) for c in duck_cols]
            s_canon = canonicalize([tuple(r[i] for i in s_order) for r in spark_rows])
            d_canon = canonicalize([tuple(r[i] for i in d_order) for r in duck_rows])
            if s_canon != d_canon:
                diff_i = next(
                    (i for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b),
                    min(len(s_canon), len(d_canon)) - 1,
                )
                problems.append(
                    "values differ; first diff at sorted row "
                    f"{diff_i}:\n  spark={s_canon[diff_i]}\n  duck ={d_canon[diff_i]}"
                )
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
            results[name] = {"status": "fail", "problems": problems}
        else:
            print(f"ok   {name}: {len(spark_rows)} rows match ({time.time()-t0:.1f}s)")
            results[name] = {
                "status": "oracle_match",
                "rows": len(spark_rows),
                "seconds": round(time.time() - t0, 2),
            }

    if json_out:
        import json as _json

        statuses = [r["status"] for r in results.values()]
        artifact = {
            "sf_dir": sf_dir,
            "total": len(results),
            "oracle_match": statuses.count("oracle_match"),
            "rows_only": statuses.count("rows_only"),
            "failures": failures,
            "queries": results,
        }
        with open(json_out, "w") as fh:
            _json.dump(artifact, fh, indent=1)
        print(f"wrote {json_out}")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
