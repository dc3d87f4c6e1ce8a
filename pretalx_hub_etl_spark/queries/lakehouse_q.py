"""Round-10 lakehouse-metadata batch: manifest/commit-log reads with
stats-based file skipping (S21) — the layer VERDICT r9 named the one
admitted architectural gap of the versioned tables.

Reference tie-in: none — the reference (main.py) has no storage layer at
all; this is engine-surface work in the Delta `_delta_log` / Iceberg
snapshot-manifest family, implemented in `sinks/manifest.py` and wired
through the CoW (`sinks/merge.py`) and MoR (`sinks/mor.py`) tables.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..operators.partitioning import local_rows
from ..functions.core import fixed_cents
from . import query

# --- S21: manifest-resolved read with stats-based file skipping -------------


@query(
    "q_sink_manifest_read",
    oracle="""
    WITH merged AS (
        SELECT o_orderkey, o_custkey,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
               + CASE WHEN o_orderkey % 100 = 0 THEN 1 ELSE 0 END AS cents
        FROM orders
        WHERE o_orderkey % 100 <> 50
    )
    SELECT o_orderkey, o_custkey, cents
    FROM merged
    WHERE o_orderkey <= (SELECT max(o_orderkey) // 5 FROM orders)
    """,
)
def q_sink_manifest_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S21: the commit-log read path end to end. A clustered CoW table
    # (cluster_by range-partitions every committed version into 8
    # disjoint o_orderkey ranges) takes an update MERGE (+1 cent on
    # keys %100==0) and a delete MERGE (%100==50) — each commit
    # publishing a manifest of its files with per-file footer min/max —
    # then the read resolves the current version from ONE small JSON
    # object (no directory listing: _latest hint + forward probe,
    # sinks/manifest.py) and read_pruned opens ONLY the files whose
    # [min, max] o_orderkey envelope intersects the bottom-20%% key
    # range: ~6 of 8 files are never handed to Spark at all. At 100 TB
    # with thousands of commits, this is what replaces O(files) listing
    # per read — the Delta/Iceberg data-skipping shape. Skipping is an
    # I/O optimization only, so the residual filter still applies; the
    # oracle recomputes the merged state relationally, so a pruned-away
    # matching file OR a leaked deleted key hash-fails. The file-count
    # assertion (files_scanned < files_total) lives in
    # tests/test_manifest.py.
    import shutil

    from ..sinks.merge import MergeSink

    base = Catalog(spark, sf_dir).orders.select(
        "o_orderkey",
        "o_custkey",
        fixed_cents(F.col("o_totalprice")).alias("cents"),
    )
    # driver-bounded collect: ONE aggregate row (the prune threshold is
    # a planning-time constant, the same role as the IVF probe lists)
    thr = base.agg(F.max("o_orderkey").alias("m")).collect()[0].m // 5
    root = tempfile.mkdtemp(prefix="phe_manifest_")
    sink = MergeSink(
        os.path.join(root, "t"),
        key="o_orderkey",
        cluster_by=("o_orderkey", 8),
    )
    sink.init(base)  # v1
    sink.merge(
        spark,
        base.filter(F.col("o_orderkey") % 100 == 0).select(
            "o_orderkey", "o_custkey", (F.col("cents") + 1).alias("cents")
        ),
    )  # v2: update
    sink.merge(
        spark,
        local_rows(spark, [], base.schema),
        deletes=base.filter(F.col("o_orderkey") % 100 == 50).select(
            "o_orderkey"
        ),
    )  # v3: delete
    pruned, _scanned, _skipped = sink.read_pruned(
        spark, "o_orderkey", 0, thr
    )
    out = (
        pruned.filter(F.col("o_orderkey") <= thr)
        .select("o_orderkey", "o_custkey", "cents")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


# --- S22: MERGE with automatic schema evolution ------------------------------


@query(
    "q_sink_merge_evolve",
    oracle="""
    WITH base AS (
        SELECT c_custkey, c_name FROM customer
    ), upd AS (
        SELECT c_custkey, 'gold' AS tier FROM base WHERE c_custkey % 4 = 0
    ), ins AS (
        SELECT c_custkey + 1000000 AS c_custkey, 'new' AS tier
        FROM base WHERE c_custkey % 9 = 0
    )
    SELECT b.c_custkey, b.c_name, u.tier
    FROM base b LEFT JOIN upd u ON b.c_custkey = u.c_custkey
    UNION ALL
    SELECT c_custkey, NULL AS c_name, tier FROM ins
    """,
)
def q_sink_merge_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S22: MERGE with AUTOMATIC SCHEMA EVOLUTION (Delta's
    # WHEN-MATCHED semantics, opt-in): the source carries a column the
    # table has never seen (`tier`) and OMITS one the table has
    # (`c_name`). The evolved version holds the union schema — new
    # column NULL for rows the source didn't touch (a metadata-only
    # backfill: history is NOT rewritten, v1 keeps its own schema and
    # stays time-travel-readable), omitted column keeps its target
    # value on matched rows (updates don't erase what they don't
    # mention) and is NULL on inserts. The oracle recomputes the
    # evolved state relationally, so a backfill that rewrote matched
    # c_names, leaked tier onto untouched rows, or dropped inserts
    # hash-fails.
    import shutil

    from ..sinks.merge import MergeSink

    base = Catalog(spark, sf_dir).customer.select("c_custkey", "c_name")
    root = tempfile.mkdtemp(prefix="phe_evolve_")
    sink = MergeSink(os.path.join(root, "t"), key="c_custkey")
    sink.init(base)  # v1: (c_custkey, c_name)
    src = (
        base.filter(F.col("c_custkey") % 4 == 0)
        .select("c_custkey", F.lit("gold").alias("tier"))
        .unionByName(
            base.filter(F.col("c_custkey") % 9 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.lit("new").alias("tier"),
            )
        )
    )
    out = (
        sink.merge(spark, src, allow_evolution=True)
        .select("c_custkey", "c_name", "tier")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


# --- S20b: merge-on-read time travel (as-of chain replay) -------------------


@query(
    "q_sink_time_travel_mor",
    oracle="""
    WITH base AS (
        SELECT c_custkey,
               CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
        FROM customer
    ), v2 AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 5 = 0 THEN bal_cents + 5000
                    ELSE bal_cents END AS bal_cents
        FROM base
    ), v3 AS (
        SELECT c_custkey, bal_cents FROM v2 WHERE c_custkey % 3 <> 0
    )
    SELECT 'v2' AS snapshot, c_custkey, bal_cents FROM v2
    UNION ALL
    SELECT 'v3' AS snapshot, c_custkey, bal_cents FROM v3
    """,
)
def q_sink_time_travel_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S20b: time travel on the MERGE-ON-READ table — the delta-chain
    # twin of S20's CoW form (same oracle by design: the layout must be
    # invisible in the answer). Where CoW as-of resolution reads ONE
    # manifest (every version is a full snapshot), a MoR as-of read
    # replays the delta chain from the newest checkpoint at-or-before
    # the version UP TO it — same bounded chain a current read costs,
    # just truncated; both resolve versions listing-free through the
    # S21 commit log. v1 init (checkpoint) → v2 upsert delta (+5000 on
    # keys %5==0) → v3 tombstone delta (%3==0); the query returns the
    # as-of-v2 and current reads side by side, so a chain truncation
    # that leaks the v3 tombstones into v2 (or misses the v2 upserts)
    # hash-fails.
    import shutil

    from ..sinks.mor import MorTable

    base = Catalog(spark, sf_dir).customer.select(
        "c_custkey", fixed_cents(F.col("c_acctbal")).alias("bal_cents")
    )
    root = tempfile.mkdtemp(prefix="phe_travel_mor_")
    t = MorTable(os.path.join(root, "t"), key="c_custkey")
    t.init(base)  # v1 (checkpoint)
    t.merge(
        spark,
        base.filter(F.col("c_custkey") % 5 == 0).select(
            "c_custkey", (F.col("bal_cents") + 5000).alias("bal_cents")
        ),
    )  # v2: upsert delta
    t.merge(
        spark,
        deletes=base.filter(F.col("c_custkey") % 3 == 0).select(
            "c_custkey"
        ),
    )  # v3: tombstone delta
    v2 = t.read(spark, as_of=2).select(
        F.lit("v2").alias("snapshot"), "c_custkey", "bal_cents"
    )
    v3 = t.read(spark, as_of=3).select(
        F.lit("v3").alias("snapshot"), "c_custkey", "bal_cents"
    )
    out = v2.unionByName(v3).localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return out


# --- S23: the SQL surface — VERSION AS OF + planner-side manifest skipping --


@query(
    "q_sql_time_travel",
    oracle="""
    WITH base AS (
        SELECT c_custkey,
               CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
        FROM customer
    ), v2 AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 5 = 0 THEN bal_cents + 5000
                    ELSE bal_cents END AS bal_cents
        FROM base
    ), v3 AS (
        SELECT c_custkey, bal_cents FROM v2 WHERE c_custkey % 3 <> 0
    ), thr AS (
        SELECT max(c_custkey) // 2 AS t FROM base
    )
    SELECT 'v2' AS snapshot, c_custkey, bal_cents
    FROM v2 WHERE c_custkey <= (SELECT t FROM thr)
    UNION ALL
    SELECT 'v3' AS snapshot, c_custkey, bal_cents
    FROM v3 WHERE c_custkey <= (SELECT t FROM thr)
    """,
)
def q_sql_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S23: the SQL face of the lakehouse layer (VERDICT r10 item 1) —
    # the SAME history as S20/S20b (v1 init, v2 upsert, v3 delete; the
    # layout must be invisible in the answer) queried through PLAIN SQL:
    # `FROM t VERSION AS OF 2` resolves a version-pinned relation and
    # the bare `t` the current version. Since r12 the catalog serves
    # CoW reads through the NATIVE path — the commit manifest resolves
    # the version's file list driver-side and Spark scans those parquet
    # files directly (JVM codegen, column pruning, row-group pushdown);
    # the `lakehouse` Python DataSource remains the V2-provider compat
    # surface, its planner-side manifest skipping gated on single_ref
    # loads (per-occurrence pruning into a shared relation is unsound:
    # Spark 4.1 collapses co-occurring scans — tests/test_round12.py).
    # The oracle recomputes both snapshots relationally, so a rewrite
    # that pins the wrong version, leaks v3 deletes into v2, or serves
    # a stale file list hash-fails.
    import shutil

    from ..plans.lakehouse_sql import LakehouseSqlCatalog
    from ..sinks.merge import MergeSink

    base = Catalog(spark, sf_dir).customer.select(
        "c_custkey", fixed_cents(F.col("c_acctbal")).alias("bal_cents")
    )
    thr = base.agg(F.max("c_custkey").alias("m")).collect()[0].m // 2
    root = tempfile.mkdtemp(prefix="phe_sql_travel_")
    sink = MergeSink(
        os.path.join(root, "t"), key="c_custkey", cluster_by=("c_custkey", 4)
    )  # 4 range files (r12: the catalog read is now the NATIVE
    # manifest-file-list parquet scan — see register_cow; the Python-DS
    # single_ref pruning pin lives in tests/test_lakehouse_sql.py)
    # Fixture commits are DIRECT snapshot writes (each version's state
    # computed relationally), not MERGEs: the operator under test here
    # is the SQL READ surface over the commit log — S11/S15/S20 already
    # exercise the MERGE write path, and two full-outer joins were pure
    # parity-tail setup cost (r11 trim). The commit protocol (claim +
    # manifest publish) is identical either way.
    v2_state = base.withColumn(
        "bal_cents",
        F.when(
            F.col("c_custkey") % 5 == 0, F.col("bal_cents") + 5000
        ).otherwise(F.col("bal_cents")),
    )
    sink.init(base)  # v1
    sink._write(v2_state, 2)  # v2: upsert snapshot
    sink._write(v2_state.filter(F.col("c_custkey") % 3 != 0), 3)  # v3: delete
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("t", sink.path)
    out = cat.sql(
        f"""
        SELECT 'v2' AS snapshot, c_custkey, bal_cents
        FROM t VERSION AS OF 2 WHERE c_custkey <= {thr}
        UNION ALL
        SELECT 'v3' AS snapshot, c_custkey, bal_cents
        FROM t WHERE c_custkey <= {thr}
        """
    ).localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return out


# --- S27: RESTORE TABLE ... TO VERSION AS OF (history-preserving rollback) ---


@query(
    "q_sql_restore",
    oracle="""
    WITH base AS (
        SELECT c_custkey,
               CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
        FROM customer
    ), v2 AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 5 = 0 THEN bal_cents + 5000
                    ELSE bal_cents END AS bal_cents
        FROM base
    )
    SELECT 'restored' AS snapshot, c_custkey, bal_cents FROM v2
    UNION ALL
    SELECT 'pre_restore' AS snapshot, c_custkey, bal_cents
    FROM v2 WHERE c_custkey % 3 <> 0
    """,
)
def q_sql_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S27: `RESTORE TABLE t TO VERSION AS OF n` (the Delta RESTORE
    # shape) — history-preserving rollback: after v3 deletes a third of
    # the keys, the restore commits v4 whose content is EXACTLY v2, by
    # HARDLINKING v2's immutable files and copying its manifest stats —
    # zero data rewrite (restoring a terabyte snapshot moves no bytes;
    # inode identity pinned in tests/test_lakehouse_sql.py). The "bad"
    # v3 stays time-travel-inspectable — the query returns the restored
    # current state AND the pre-restore v3 snapshot side by side, so a
    # restore that rewrote, dropped, or duplicated rows, or damaged the
    # history it rolled back over, hash-fails.
    import shutil

    from ..plans.lakehouse_sql import LakehouseSqlCatalog
    from ..sinks.merge import MergeSink

    base = Catalog(spark, sf_dir).customer.select(
        "c_custkey", fixed_cents(F.col("c_acctbal")).alias("bal_cents")
    )
    v2_state = base.withColumn(
        "bal_cents",
        F.when(
            F.col("c_custkey") % 5 == 0, F.col("bal_cents") + 5000
        ).otherwise(F.col("bal_cents")),
    )
    root = tempfile.mkdtemp(prefix="phe_sql_restore_")
    sink = MergeSink(os.path.join(root, "t"), key="c_custkey")
    sink.init(base)  # v1
    sink._write(v2_state, 2)  # v2
    sink._write(v2_state.filter(F.col("c_custkey") % 3 != 0), 3)  # v3
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("rt", sink.path, key="c_custkey")
    cat.sql("RESTORE TABLE rt TO VERSION AS OF 2")  # v4 == v2, linked
    out = cat.sql(
        """
        SELECT 'restored' AS snapshot, c_custkey, bal_cents FROM rt
        UNION ALL
        SELECT 'pre_restore' AS snapshot, c_custkey, bal_cents
        FROM rt VERSION AS OF 3
        """
    ).localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return out


# --- ST16: exactly-once streaming sink into the lakehouse table --------------


@query(
    "q_stream_sink_lakehouse",
    oracle="""
    SELECT o_orderkey,
           CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
    FROM orders WHERE o_orderkey % 2 = 0
    """,
)
def q_stream_sink_lakehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ST16: `writeStream.format("lakehouse")` — a REAL streaming query
    # appending into the versioned table, one COMMIT PER MICROBATCH
    # through the same claim+publish protocol as every other writer,
    # with the batch id stamped into the manifest: restart replay of an
    # already-committed batch is a no-op (exactly-once = committed
    # offsets + idempotent version commits; replay and restart pinned in
    # tests/test_lakehouse_sql.py). 3 key-routed input files -> 3
    # microbatches -> 3 versions, each reusing the previous version's
    # immutable files via hardlinks (O(delta) per batch, full-snapshot
    # versions). The final read must equal the one-shot batch answer —
    # append-only streams make that the whole-input identity, which the
    # oracle recomputes relationally.
    import shutil

    from ..sinks.merge import MergeSink
    from ..sources.lakehouse_ds import pin_active_session, register

    # MAIN session, like q_stream_pyds: Python DataSource registration
    # does not survive into a newSession's lookup path; the active
    # session must be pinned for streaming start() from a worker thread
    # (the parity sweep's pool) — same write-path lookup as write_table
    register(spark)
    pin_active_session(spark)
    e = Catalog(spark, sf_dir).orders.filter(
        F.col("o_orderkey") % 2 == 0
    ).select(
        "o_orderkey", fixed_cents(F.col("o_totalprice")).alias("cents")
    )
    root = tempfile.mkdtemp(prefix="phe_stream_lh_")
    src, table, ckpt = (os.path.join(root, d) for d in ("in", "t", "ckpt"))
    e.repartition(3, "o_orderkey").write.parquet(src)
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.format("lakehouse")
        .option("path", table)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = (
        MergeSink(table, key="o_orderkey")
        .read(spark)
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


# --- S26: SQL DML — INSERT / UPDATE / DELETE / maintenance statements --------


@query(
    "q_sql_dml",
    oracle="""
    WITH base AS (
        SELECT c_custkey AS k,
               CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
        FROM customer
    ), inserted AS (
        SELECT k, cents FROM base
        UNION ALL
        SELECT k + 1000000 AS k, cents + 7 AS cents
        FROM base WHERE k % 9 = 0
    ), updated AS (
        SELECT k,
               CASE WHEN k % 5 = 0 THEN cents + 5000 ELSE cents END AS cents
        FROM inserted
    )
    SELECT k, cents FROM updated WHERE k % 3 <> 0
    """,
)
def q_sql_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S26: the DML statements a warehouse user expects, over the MoR
    # table — INSERT (a keyed upsert delta), UPDATE (recomputed matched
    # rows as a delta), DELETE (a POSITION-DELETE commit: the SQL face
    # of S24's deletion vectors — the statement writes (file, row)
    # pairs, never key values), then the final SELECT through the same
    # catalog. Four commits, each O(its delta); the oracle recomputes
    # the final state relationally, so a DML statement that missed rows,
    # resurrected DV-shadowed history, or leaked deletes hash-fails.
    # Statement coverage incl. VACUUM/OPTIMIZE and the CoW twins is in
    # tests/test_lakehouse_sql.py.
    import shutil

    from ..plans.lakehouse_sql import LakehouseSqlCatalog
    from ..sinks.mor import MorTable

    base = Catalog(spark, sf_dir).customer.select(
        F.col("c_custkey").alias("k"),
        fixed_cents(F.col("c_acctbal")).alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="phe_sql_dml_")
    t = MorTable(os.path.join(root, "t"), key="k")
    t.init(base)  # v1 (also stores kind + merge key as table props)
    cat = LakehouseSqlCatalog(spark)
    # r12: registration is PATH-ONLY — kind and merge key come from the
    # table's own stored properties, not caller-resupplied metadata
    cat.register_path("dml_t", t.path)
    cat.sql(
        "INSERT INTO dml_t "
        "SELECT k + 1000000 AS k, cents + 7 AS cents "
        "FROM dml_t WHERE k % 9 = 0"
    )  # v2: upsert delta (reads the registered table itself)
    cat.sql("UPDATE dml_t SET cents = cents + 5000 WHERE k % 5 = 0")  # v3
    cat.sql("DELETE FROM dml_t WHERE k % 3 = 0")  # v4: deletion vectors
    out = cat.sql("SELECT k, cents FROM dml_t").localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return out


# --- S25: DataFrame/SQL WRITE surface of the commit protocol ------------------


@query(
    "q_sink_sql_write",
    oracle="""
    WITH base AS (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 4 = 0
    ), extra AS (
        SELECT o_orderkey + 10000000 AS o_orderkey, cents + 1 AS cents
        FROM base WHERE o_orderkey % 3 = 0
    ), cur AS (
        SELECT * FROM base UNION ALL SELECT * FROM extra
    )
    SELECT 'v1' AS snapshot, o_orderkey, cents FROM base
    UNION ALL
    SELECT 'v2' AS snapshot, o_orderkey, cents FROM cur
    """,
)
def q_sink_sql_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S25: df.write.format("lakehouse") — the WRITE half of the SQL
    # surface (S23 is the read half): mode("overwrite") creates version
    # 1 through the same two-phase commit the engine sinks use (staged
    # parquet per task -> atomic rename-claim -> manifest publish);
    # mode("append") commits version 2 reusing v1's immutable files via
    # hardlinks plus the new files — O(delta) append with full-snapshot
    # versions. The query returns the as-of-v1 and current reads side by
    # side THROUGH the SQL catalog, so a writer that dropped rows,
    # double-linked files, or broke version isolation hash-fails against
    # the relational recomputation. OCC under concurrent appends and the
    # append schema guard are pinned in tests/test_lakehouse_sql.py.
    import shutil

    from ..plans.lakehouse_sql import LakehouseSqlCatalog
    from ..sources.lakehouse_ds import write_table

    base = (
        Catalog(spark, sf_dir)
        .orders.filter(F.col("o_orderkey") % 4 == 0)
        .select("o_orderkey", fixed_cents(F.col("o_totalprice")).alias("cents"))
    )
    root = tempfile.mkdtemp(prefix="phe_sql_write_")
    path = os.path.join(root, "t")
    # write_table, not raw format(): it pins the JVM thread-local active
    # session, so this query also works from a worker thread (the parity
    # sweep runs queries from a thread pool — see write_table docstring)
    write_table(base.repartition(2), path, mode="overwrite")  # v1
    write_table(
        base.filter(F.col("o_orderkey") % 3 == 0).select(
            (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
            (F.col("cents") + 1).alias("cents"),
        ).repartition(1),
        path,
        mode="append",
    )  # v2 = v1 files (hardlinked) + the delta
    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("wt", path)
    out = cat.sql(
        """
        SELECT 'v1' AS snapshot, o_orderkey, cents FROM wt VERSION AS OF 1
        UNION ALL
        SELECT 'v2' AS snapshot, o_orderkey, cents FROM wt
        """
    ).localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return out
