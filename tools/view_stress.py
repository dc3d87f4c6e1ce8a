"""Stress repro for the r13 driver `q_sql_view` hash mismatch (VERDICT
round-13 item 1): loop CREATE TABLE -> CREATE VIEW x2 -> INSERT ->
fresh-catalog read through the nested view, asserting the inserted row
is visible EVERY time, while background threads commit to other tables
in the same shared SparkSession (the driver's jobs=4 shape).

Usage: python tools/view_stress.py [iterations] [bg_threads] [--hostile [lag_ms]]

Exits non-zero on the first stale read, printing the full diagnostic
state (visible_version, manifest listing, temp-view content).

--hostile (round 15): FS-hostility mode emulating the driver-env
visibility lag the r13/r14 reds are consistent with — after each INSERT
commit, the head manifest is HIDDEN (renamed away) and restored by a
timer thread lag_ms later (default 300), so the fresh-catalog read runs
against a filesystem that does not yet show the completed commit. The
read-your-own-writes fence (sinks/manifest.py committed floor) must
absorb the lag (retry until restore) and still serve the post-insert
values every iteration; pre-fence code serves the stale snapshot and
fails exactly like the driver gate did.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--hostile"]
    hostile = "--hostile" in sys.argv[1:]
    iters = int(args[0]) if len(args) > 0 else 200
    nbg = int(args[1]) if len(args) > 1 else 3
    lag_ms = int(args[2]) if len(args) > 2 else 300

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog
    from pretalx_hub_etl_spark.sinks.merge import MergeSink

    stop = threading.Event()
    bg_errs: list[BaseException] = []

    def bg(idx: int) -> None:
        # background commit pressure: a private table in the same
        # session takes INSERT commits through the DataSource writer
        # (shared Python worker pool, shared /tmp, shared py4j)
        root = tempfile.mkdtemp(prefix=f"phe_vstress_bg{idx}_")
        try:
            path = os.path.join(root, "t")
            cat = LakehouseSqlCatalog(
                spark, warehouse=os.path.join(root, "wh")
            )
            base = spark.range(200).select(
                F.col("id").alias("k"),
                (F.col("id") % 11).alias("ck"),
                (F.col("id") * 7).alias("cents"),
            )
            MergeSink(path, key="k").init(base)
            cat.register_path(f"bg{idx}", path)
            i = 0
            while not stop.is_set():
                i += 1
                cat.sql(
                    f"INSERT INTO bg{idx} VALUES "
                    f"({1000 + i}, {i % 11}, {i * 3})"
                )
                cat.sql(f"SELECT sum(cents) AS s FROM bg{idx}").collect()
        except BaseException as exc:  # noqa: BLE001
            bg_errs.append(exc)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    threads = [
        threading.Thread(target=bg, args=(i,), daemon=True)
        for i in range(nbg)
    ]
    for t in threads:
        t.start()

    t0 = time.time()
    try:
        for it in range(1, iters + 1):
            root = tempfile.mkdtemp(prefix="phe_vstress_")
            path = os.path.join(root, "t")
            wh = os.path.join(root, "wh")
            base = spark.range(500).select(
                F.col("id").alias("k"),
                (F.col("id") % 13).alias("ck"),
                (F.col("id") * 331 % 200000).alias("cents"),
            )
            MergeSink(path, key="k").init(base)
            cat = LakehouseSqlCatalog(spark, warehouse=wh)
            cat.register_path("view_t", path)
            cat.sql(
                "CREATE VIEW v_high AS SELECT k, ck, cents FROM view_t "
                "WHERE cents > 100000"
            )
            cat.sql(
                "CREATE VIEW v_agg AS SELECT ck, count(*) AS n, "
                "sum(cents) AS total FROM v_high GROUP BY ck"
            )
            cat.sql("INSERT INTO view_t VALUES (500, 7, 123456)")
            restorer = None
            if hostile:
                # hide the just-committed head manifest: the next read
                # sees the pre-insert filesystem until the timer lands
                from pretalx_hub_etl_spark.sinks.manifest import (
                    CommitLog as _CL,
                )

                head = _CL(path)._probe_version()
                mpath = os.path.join(path, "_manifest", f"{head}.json")
                hidden = mpath + ".lagged"
                os.rename(mpath, hidden)
                restorer = threading.Timer(
                    lag_ms / 1000.0, os.rename, args=(hidden, mpath)
                )
                restorer.start()
            fresh = LakehouseSqlCatalog(spark, warehouse=wh)
            got = {
                r["ck"]: (r["n"], r["total"])
                for r in fresh.sql(
                    "SELECT ck, n, total FROM v_agg"
                ).collect()
            }
            # expected: base rows with cents>100000 plus the insert
            exp_rows = [
                (k % 13, k * 331 % 200000)
                for k in range(500)
                if k * 331 % 200000 > 100000
            ] + [(7, 123456)]
            exp: dict[int, tuple[int, int]] = {}
            for ck, cents in exp_rows:
                n, tot = exp.get(ck, (0, 0))
                exp[ck] = (n + 1, tot + cents)
            if got != exp:
                from pretalx_hub_etl_spark.sinks.manifest import CommitLog

                log = CommitLog(path)
                print(f"STALE READ at iteration {it}")
                print(f"  got  7 -> {got.get(7)}")
                print(f"  want 7 -> {exp.get(7)}")
                print(f"  visible_version={log.visible_version()}")
                print(f"  current_version={log.current_version()}")
                print(f"  _manifest: {os.listdir(os.path.join(path, '_manifest'))}")
                print(f"  dirs: {sorted(os.listdir(path))}")
                return 1
            if restorer is not None:
                restorer.join()
            shutil.rmtree(root, ignore_errors=True)
            if it % 20 == 0:
                print(
                    f"iter {it}/{iters} ok "
                    f"({time.time() - t0:.0f}s, bg_errs={len(bg_errs)})"
                )
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=30)
    if bg_errs:
        print(f"background errors: {bg_errs[:3]}")
        return 2
    print(f"all {iters} iterations clean in {time.time() - t0:.0f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
