"""Round-10 surface batch: table-argument UDTF with PARTITION BY (UD7)
and the partition-parallel Python streaming source tier (ST10b).

Reference tie-in: UD7 generalizes the reference's per-group imperative
loops (main.py:133-143 scans a target list per talk) to the Spark-4 SQL
construct that replaces applyInPandas for SQL-first consumers; ST10b is
engine-surface (the reference's pagination loop, main.py:60-90, already
maps to S2/ST10 — this is its scale tier).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.core import fixed_cents
from . import query

# --- UD7: table-argument UDTF (TABLE(...) PARTITION BY ... ORDER BY ...) ----


@query(
    "q_fn_udtf_table_arg",
    oracle="""
    WITH t AS (
        SELECT event_id, user_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_s,
               CASE WHEN CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                         - lag(CAST(floor(epoch(CAST(ts AS TIMESTAMP)))
                               AS BIGINT)) OVER w > 1800
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, ts_s,
           CAST(sum(is_start) OVER (
               PARTITION BY user_id ORDER BY ts_s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS session_idx
    FROM t
    """,
)
def q_fn_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UD7 (VERDICT r9 item 4): the Spark-4 TABLE(...) argument form —
    # a UDTF invoked FROM SQL over a whole relation with PARTITION BY /
    # ORDER BY, the construct that replaces applyInPandas for SQL-first
    # consumers: Spark guarantees each partition key's rows reach
    # EXACTLY ONE UDTF instance, in ORDER BY order, so per-group
    # imperative state (here: a running sessionizer — last-ts + counter,
    # O(1) state per instance) is safe without any manual routing. The
    # oracle is the W10 lag-gap-cumsum window twin (q_sessionize_batch's
    # oracle verbatim): the imperative and relational sessionizers must
    # agree row-for-row, which pins both the partition isolation and the
    # intra-partition order the TABLE-arg contract promises. Scale: the
    # table argument shuffles once on user_id (exactly the window's
    # exchange); the UDTF itself streams rows, state never exceeds one
    # (ts, counter) pair per live instance.
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "event_id bigint, user_id bigint, ts_s bigint, "
            "session_idx bigint"
        )
    )
    class Sessionize:
        def __init__(self):
            self._last: int | None = None
            self._idx = 0

        def eval(self, row):
            ts = row["ts_s"]
            if self._last is None or ts - self._last > 1800:
                self._idx += 1
            self._last = ts
            yield row["event_id"], row["user_id"], ts, self._idx

    spark.udtf.register("phe_sessionize_t10", Sessionize)
    ev = Catalog(spark, sf_dir).events.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").cast("long").alias("ts_s"),
    )
    # pre-partition the table argument on the UDTF's PARTITION BY key at
    # cluster parallelism: the TABLE(...) contract's own exchange is
    # satisfied by this partitioning (no second shuffle), and the pinned
    # width stops AQE coalescing the few-MB exchange to one task under
    # the row-at-a-time Python UDTF — the query's dominant cost (r17)
    ev = ev.repartition(
        spark.sparkContext.defaultParallelism, "user_id"
    )
    view = f"__udtf_tbl_{uuid.uuid4().hex}"
    ev.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT s.event_id, s.user_id, s.ts_s, s.session_idx
        FROM phe_sessionize_t10(
            TABLE(SELECT event_id, user_id, ts_s FROM {view})
            PARTITION BY user_id
            ORDER BY (ts_s, event_id)
        ) s
        """
    )


# --- ST10b: partition-parallel Python streaming source ----------------------


@query(
    "q_stream_pyds_parallel",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders
    GROUP BY 1
    """,
)
def q_stream_pyds_parallel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ST10b (VERDICT r9 item 6): the partition-parallel
    # DataSourceStreamReader tier of the paged source — the "100 TB
    # path" ST10's docstring names. The driver only plans OFFSETS
    # (latestOffset advances <= max_pages_per_batch pages per batch:
    # admission control / backpressure by offset arithmetic); each
    # microbatch's range is split into one InputPartition PER PAGE and
    # the page reads run as parallel executor tasks emitting Arrow
    # batches — contrast ST10, where the driver process serializes every
    # batch itself. Same COMPLETE-mode oracle as ST10: the final
    # snapshot must equal the batch answer regardless of page/batch
    # boundaries, so the equivalence pins offset planning, partition
    # splitting, executor reads, and the admission cap all at once.
    # 6 pages at 2 pages/batch -> 3 genuinely multi-partition batches.
    from ..sources.paginated import parquet_key_upper_bound
    from ..sources.pyds import register
    from ..streaming.structured import fixture_session, run_to_memory

    # fixture_session (r17): the stateful complete-mode agg sizes its
    # state-store count from shuffle partitions — the fixture convention
    # (see q_stream_pyds); registration on the child session works.
    s2 = fixture_session(spark)
    register(s2)
    path = f"{sf_dir.rstrip('/')}/orders.parquet"
    upper = parquet_key_upper_bound(path, "o_orderkey")
    stream = (
        s2.readStream.format("paged_parquet_par")
        .option("path", path)
        .option("key", "o_orderkey")
        .option("page_size", str(max(1, upper // 6 + 1)))
        .option("max_pages_per_batch", "2")
        .option("columns", "o_orderkey,o_orderpriority,o_totalprice")
        .load()
    )
    agg = stream.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(fixed_cents(F.col("o_totalprice"))).alias("total_cents"),
    )
    name = f"pydspar_{uuid.uuid4().hex}"
    run_to_memory(agg, name, output_mode="complete")
    return s2.table(name)


# --- ST15: streaming CDC source over the MoR table ---------------------------


@query(
    "q_stream_cdc_mor",
    oracle="""
    WITH base AS (
        SELECT c_custkey,
               CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
        FROM customer
    )
    SELECT 'upsert' AS __op, CAST(1 AS BIGINT) AS __commit,
           c_custkey, bal_cents
    FROM base
    UNION ALL
    SELECT 'upsert' AS __op, CAST(2 AS BIGINT) AS __commit,
           c_custkey, bal_cents + 5000 AS bal_cents
    FROM base WHERE c_custkey % 5 = 0
    UNION ALL
    SELECT 'delete' AS __op, CAST(3 AS BIGINT) AS __commit,
           c_custkey, CAST(NULL AS BIGINT) AS bal_cents
    FROM base WHERE c_custkey % 3 = 0
    """,
)
def q_stream_cdc_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ST15: the STREAMING face of the MoR change feed (q_cdc_mor_feed
    # is the batch poll) — a custom DataSourceStreamReader whose OFFSET
    # IS THE TABLE'S COMMIT VERSION: latestOffset is one commit-log
    # read (listing-free, the S21 resolution), partitions(start, end)
    # come straight from the manifests of commits (start, end] — one
    # scan task per committed FILE — and each row is typed
    # (__op, __commit, key, payload) exactly as changes_since serves in
    # batch, which is what makes this oracle-able: the streamed change
    # log over a 3-commit table (init upserts @1, +5000 upserts @2,
    # tombstones @3) must equal the relational recomputation row for
    # row. Versions and manifests are immutable, so restart replay is
    # deterministic with no extra machinery (sources/mor_stream.py).
    # (Python stream sources don't implement Trigger.AvailableNow —
    # Spark logs the fallback to single-batch execution, which drains
    # everything available and stops: exactly this fixture's need.)
    import shutil
    import tempfile as _tf

    from ..sinks.mor import MorTable
    from ..sources.mor_stream import register as register_cdc

    register_cdc(spark)  # main session (Python DataSource constraint)
    base = Catalog(spark, sf_dir).customer.select(
        "c_custkey", fixed_cents(F.col("c_acctbal")).alias("bal_cents")
    )
    root = _tf.mkdtemp(prefix="phe_cdc_stream_")
    t = MorTable(f"{root}/t", key="c_custkey")
    t.init(base)  # v1
    t.merge(
        spark,
        base.filter(F.col("c_custkey") % 5 == 0).select(
            "c_custkey", (F.col("bal_cents") + 5000).alias("bal_cents")
        ),
    )  # v2
    t.merge(
        spark,
        deletes=base.filter(F.col("c_custkey") % 3 == 0).select(
            "c_custkey"
        ),
    )  # v3
    stream = (
        spark.readStream.format("mor_cdc")
        .option("path", t.path)
        .option("key", "c_custkey")
        .load()
    )
    name = f"morcdc_{uuid.uuid4().hex}"
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout=300):
            raise TimeoutError("mor_cdc stream did not drain within 300s")
    finally:
        q.stop()
    if q.exception() is not None:
        raise q.exception()
    out = spark.table(name).localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return out
