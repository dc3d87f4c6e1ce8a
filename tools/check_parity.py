"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs every declared query at a given scale factor, runs its oracle SQL in
DuckDB over the same parquet files, and compares:

- row count
- sorted column names
- values, order-insensitively (rows sorted by all columns; floats compared
  exactly AND with tolerance — exact mismatches are reported even when tiny,
  because the driver's value-hash is presumed exact)

Usage: python tools/check_parity.py [--json OUT.json] [--jobs N] [sf_dir] [query ...]

With --json, a per-query record {status, rows, seconds, problems} plus a
summary is written to OUT.json (the committed PARITY_r{N}.json artifact —
the full-registry regression net under the driver's 50-query sample).

With --jobs N, queries run from an N-thread pool sharing the one
SparkSession (Spark's scheduler interleaves jobs from concurrent threads;
DuckDB replays go through per-thread cursors of one connection). The
sweep's long tail is fixed-cost-dominated — streaming fixtures, iterative
witness loops — and single-query runs leave most of local[32] idle, so
threading cuts the wall ~3x without touching any query. Results are
independent of jobs (each query's record is self-contained); the default
stays 1 so an interleaved failure can always be re-reproduced serially.
"""

from __future__ import annotations

import math
import os
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


def _first_line(exc: Exception) -> str:
    msg = str(exc).splitlines()[0][:300] if str(exc) else ""
    return f"{type(exc).__name__}: {msg}"


def rotating_sample(names: list[str], n: int) -> list[str]:
    """Deterministic per-round rotating sample (round-9 review, Next
    #9; r15 VERDICT item 7 bias).

    The driver's own 50-query CORRECTNESS sample follows load_all()'s
    stalest-verified-first order; this flag gives the BUILDER's
    insurance runs a complementary window biased toward the rows the
    driver gate has seen LEAST: queries that have NEVER appeared in any
    CORRECTNESS_r*.json artifact come first (rotated by round for
    determinism-with-coverage), then the rest ordered by the round they
    last appeared in (oldest first) — always skipping whatever the
    LATEST driver sample already covered, so the builder sample stays
    disjoint from the most recent driver verification by construction.
    """
    import glob
    import json as _json
    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = {
        int(m.group(1)): p
        for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    }
    r = (max(arts) + 1) if arts else 1
    covered: set[str] = set()
    last_sampled: dict[str, int] = {}
    for rnd in sorted(arts):
        try:
            with open(arts[rnd]) as fh:
                data = _json.load(fh)
        except (OSError, ValueError):
            continue
        for q in data:
            last_sampled[q] = max(rnd, last_sampled.get(q, 0))
        if rnd == max(arts):
            covered = set(data)
    s = sorted(names)
    never = [q for q in s if q not in last_sampled and q not in covered]
    start = (r * n) % max(len(never), 1)
    never = never[start:] + never[:start]
    stale = sorted(
        (q for q in s if q in last_sampled and q not in covered),
        key=lambda q: (last_sampled[q], q),
    )
    window = (never + stale)[:n]
    print(
        f"rotating sample: round {r}, n {len(window)} "
        f"({len(never)} never-driver-sampled first), "
        f"skipping {len(covered)} driver-covered"
    )
    return window


def lint_oracles(sf_dir: str) -> int:
    """Oracle-dtype lint (VERDICT r16 item 2 / r17 item 9): DESCRIBE
    every oracle in DuckDB and fail on any HUGEINT/UHUGEINT output
    column. DuckDB widens ``sum(BIGINT)`` to HUGEINT, which surfaces as
    decimal128(38,0) through Arrow-based oracle fetches and reds the
    driver's type-tagged value hash even when every value matches (the
    2fe091d bug class) — the oracle text must CAST such sums back to
    BIGINT. Zero Spark involvement: pure driver-side DESCRIBE, runs in
    seconds over all oracles."""
    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    bad: dict[str, list[str]] = {}
    n = 0
    for name, sql in entrymod.oracle_sql().items():
        n += 1
        try:
            rows = con.execute(
                f"DESCRIBE SELECT * FROM ({sql}) AS __q"
            ).fetchall()
        except Exception as exc:
            bad[name] = [f"describe error: {_first_line(exc)}"]
            continue
        hits = [
            f"{cname}: {ctype}"
            for cname, ctype, *_ in rows
            if "HUGEINT" in str(ctype).upper()
        ]
        if hits:
            bad[name] = hits
    if bad:
        for name, hits in sorted(bad.items()):
            print(f"LINT {name}: {'; '.join(hits)}")
        print(f"\n{len(bad)} oracle(s) with hash-unsafe dtypes (of {n})")
        return 1
    print(f"lint green: {n} oracles, no HUGEINT outputs")
    return 0


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    jobs = 1
    sample_n = 0
    if argv and argv[0] == "--lint":
        return lint_oracles(argv[1] if len(argv) > 1 else "/root/testdata/sf0.01")
    while argv and argv[0] in ("--json", "--jobs", "--sample"):
        flag = argv[0]
        if len(argv) < 2:
            print(
                "usage: check_parity.py [--json OUT.json] [--jobs N] "
                "[--sample N] [sf_dir] [query ...]"
            )
            return 2
        if flag == "--json":
            json_out = argv[1]
        elif flag == "--sample":
            sample_n = max(0, int(argv[1]))
        else:
            jobs = max(1, int(argv[1]))
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

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

    def check_one(name: str, fn) -> tuple[dict, list[str]]:
        lines: list[str] = []
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = [tuple(r) for r in sdf.collect()]
            spark_cols = sorted(sdf.columns)
            t_spark = time.time() - t0
        except Exception as exc:
            lines.append(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            return (
                {"status": "fail", "problems": [f"spark error: {_first_line(exc)}"]},
                lines,
            )

        if name not in oracles:
            lines.append(
                f"ok   {name}: rows-only, {len(spark_rows)} rows "
                f"({time.time()-t0:.1f}s)"
            )
            if not spark_rows:
                lines.append(f"WARN {name}: 0 rows")
            return (
                {
                    "status": "rows_only",
                    "rows": len(spark_rows),
                    "seconds": round(time.time() - t0, 2),
                },
                lines,
            )

        t1 = time.time()
        try:
            cur = con.cursor()  # duckdb: thread-local cursor on one db
            res = cur.execute(oracles[name])
            duck_cols = sorted(d[0] for d in res.description)
            duck_desc = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            t_duck = time.time() - t1
        except Exception as exc:
            lines.append(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            return (
                {"status": "fail", "problems": [f"duckdb error: {_first_line(exc)}"]},
                lines,
            )

        problems = []
        if spark_cols != duck_cols:
            problems.append(f"columns differ: spark={spark_cols} duck={duck_cols}")
        if len(spark_rows) != len(duck_rows):
            problems.append(
                f"rowcount differs: spark={len(spark_rows)} duck={len(duck_rows)}"
            )
        if not problems:
            # align column order by sorted name on both sides
            s_order = [sdf.columns.index(c) for c in spark_cols]
            d_order = [duck_desc.index(c) for c in duck_cols]
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
            lines.append(f"FAIL {name}: " + "; ".join(problems))
            return ({"status": "fail", "problems": problems}, lines)
        lines.append(
            f"ok   {name}: {len(spark_rows)} rows match ({time.time()-t0:.1f}s)"
        )
        return (
            {
                "status": "oracle_match",
                "rows": len(spark_rows),
                "seconds": round(time.time() - t0, 2),
                "spark_seconds": round(t_spark, 2),
                "duck_seconds": round(t_duck, 2),
            },
            lines,
        )

    if sample_n and not only:
        only = set(rotating_sample(list(qs), sample_n))
    todo = [(n, f) for n, f in qs.items() if not only or n in only]
    if jobs > 1:
        # Makespan scheduling, two rules (r11):
        # 1. LPT for BATCH queries — start the historically slowest
        #    first so a 12 s straggler scheduled last can't add nearly
        #    its whole duration to the wall. Durations come from the
        #    newest PARITY_r*.json; unknown (new) queries are assumed
        #    slow and also go first.
        # 2. STREAMING fixtures are LPT-ordered among themselves and
        #    SPREAD EVENLY through the schedule (one per ~total/n_stream
        #    slots): naive global LPT put the four heaviest streaming
        #    fixtures in the pool's first four slots, and their
        #    SIMULTANEOUS startups (StreamingQuery + foreachBatch py4j
        #    callback machinery on the shared JVM) deadlocked ~half of
        #    runs — all four blocked in py4j socket reads. Spacing makes
        #    concurrent streaming STARTUPS rare again (the
        #    empirically-safe pattern of registry order) while the
        #    heaviest fixtures still start early enough not to straggle.
        #    Pure scheduling — per-query work and records are unchanged.
        import glob as _glob
        import json as _json

        hist: dict[str, float] = {}
        arts = sorted(_glob.glob("/root/repo/PARITY_r*.json"))
        if arts:
            try:
                with open(arts[-1]) as fh:
                    prev = _json.load(fh).get("queries", {})
                hist = {
                    n: r.get("seconds", 0.0)
                    for n, r in prev.items()
                    if isinstance(r, dict)
                }
            except (OSError, ValueError):
                hist = {}
        streaming = [nf for nf in todo if nf[0].startswith("q_stream_")]
        batch = [nf for nf in todo if not nf[0].startswith("q_stream_")]
        batch.sort(key=lambda nf: -hist.get(nf[0], 1e9))
        streaming.sort(key=lambda nf: -hist.get(nf[0], 1e9))
        if streaming:
            total = len(todo)
            slots = {
                (i * total) // len(streaming): nf
                for i, nf in enumerate(streaming)
            }
            mixed, bi = [], iter(batch)
            for pos in range(total):
                mixed.append(slots[pos] if pos in slots else next(bi))
            todo = mixed
    results: dict[str, dict] = {}
    failures: list[str] = []
    loadavg_start = list(os.getloadavg())
    t_sweep = time.time()
    if jobs == 1:
        done = ((n, check_one(n, f)) for n, f in todo)
    else:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=jobs)
        futs = [(n, pool.submit(check_one, n, f)) for n, f in todo]
        done = ((n, fut.result()) for n, fut in futs)
    for name, (record, lines) in done:
        results[name] = record
        if record["status"] == "fail":
            failures.append(name)
        for ln in lines:
            print(ln)
    wall = round(time.time() - t_sweep, 1)

    if json_out:
        import json as _json

        statuses = [r["status"] for r in results.values()]
        artifact = {
            "sf_dir": sf_dir,
            "total": len(results),
            "oracle_match": statuses.count("oracle_match"),
            "rows_only": statuses.count("rows_only"),
            "failures": failures,
            "jobs": jobs,
            "sweep_wall_seconds": wall,
            # the registry-growth-stable wall target (VERDICT r12 item
            # 8): seconds of sweep wall PER QUERY at this jobs level —
            # a fixed total-wall number stops fitting every time the
            # registry grows, while per-query wall only moves with code
            # or box epoch (target: <= 0.45 s/query at jobs=4)
            "wall_per_query": round(wall / max(1, len(results)), 3),
            # box-state evidence IN the artifact (VERDICT r11 item 5):
            # the parity wall target is adjudicable without a side
            # channel — loadavg at start/end + wall-clock timestamp
            "loadavg_start": loadavg_start,
            "loadavg_end": list(os.getloadavg()),
            "measured_at_utc": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            ),
            "queries": results,
        }
        with open(json_out, "w") as fh:
            _json.dump(artifact, fh, indent=1)
        print(f"wrote {json_out}")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print(f"all green ({wall}s, jobs={jobs})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
