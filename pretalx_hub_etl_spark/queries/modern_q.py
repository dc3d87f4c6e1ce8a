"""Round-9 surface batch: XML source (S17), SQL session variables +
EXECUTE IMMEDIATE (SQL7), exact lag-1 autocorrelation (AN26), the
polymorphic (analyze-time schema) Python UDTF (UD6), TWS event-time
timers (ST9e), checkpoint-recovery restart (ST12), and kNN-graph
construction (L44).

(VARIANT extraction and small-file compaction were drafted here too,
then dropped as near-duplicates of the existing F10 `q_fn_variant` /
S9 `q_sink_compact` — one operator id, one implementation.)

Reference tie-in: S17 generalizes the reference's schema-on-read
ingestion (`main.py:60-75` reads one JSON document tree) to the other
text-markup format Spark ships a native reader for; the rest are
engine-surface ops with no reference analog.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import Catalog
from ..operators.partitioning import local_rows
from ..functions.core import fixed_cents
from . import query

# --- S17: native XML source --------------------------------------------------


@query(
    "q_scan_xml",
    oracle="""
    SELECT s_nationkey,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM supplier
    GROUP BY 1
    """,
)
def q_scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S17: Spark 4's built-in XML source (spark-xml merged upstream) —
    # write the supplier table as row-tagged XML, read it back with an
    # EXPLICIT schema (schema inference on XML is a full extra scan at
    # 100 TB, same rule as the catalog's parquet policy, SURVEY §1.3),
    # and aggregate. The oracle reads the ORIGINAL parquet: a lossless
    # roundtrip is the claim, so the XML layer must be invisible in
    # the answer (the S4 sink-roundtrip policy). Money goes through
    # integer cents BEFORE the XML hop — markup text roundtrips
    # integers exactly; floats would re-parse.
    import shutil

    sup = Catalog(spark, sf_dir).supplier.select(
        "s_suppkey",
        "s_nationkey",
        fixed_cents(F.col("s_acctbal")).alias("acct_cents"),
    )
    tmp = tempfile.mkdtemp(prefix="phe_xml_")
    xdir = os.path.join(tmp, "supplier_xml")
    (
        sup.coalesce(1)
        .write.format("xml")
        .option("rowTag", "supplier")
        .save(xdir)
    )
    schema = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_nationkey", T.LongType()),
            T.StructField("acct_cents", T.LongType()),
        ]
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "supplier")
        .schema(schema)
        .load(xdir)
    )
    out = (
        back.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum("acct_cents").cast("long").alias("total_cents"),
        )
        .localCheckpoint(eager=True)  # materialize before tmp removal
    )
    shutil.rmtree(tmp, ignore_errors=True)
    return out


# --- SQL7: session variables + EXECUTE IMMEDIATE ----------------------------


@query(
    "q_sql_variables",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN c_custkey <= (
                    SELECT max(c_custkey) // 2 FROM customer
                ) THEN 1 ELSE 0 END) AS BIGINT) AS n_below
    FROM customer
    WHERE c_mktsegment <> 'AUTOMOBILE'
    GROUP BY 1
    """,
)
def q_sql_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL7: session variables (DECLARE / SET VARIABLE, Spark 4) plus
    # EXECUTE IMMEDIATE — the procedural-SQL surface: a variable SET
    # from a scalar subquery is evaluated ONCE and thereafter binds as
    # a literal (folding into pushdown like SQL5's named parameters),
    # and EXECUTE IMMEDIATE runs dynamic SQL text with those variables
    # in scope. The oracle inlines both (segment literal + cutoff
    # subquery): binding ≡ inlining is the property under test, the
    # same claim SQL5 makes for parameter markers. Variables are
    # session-scoped — names are engine-prefixed to avoid collisions
    # with other sessions' declarations.
    Catalog(spark, sf_dir).register_views()
    spark.sql(
        "DECLARE OR REPLACE VARIABLE phe_seg STRING DEFAULT 'BUILDING'"
    )
    spark.sql("SET VARIABLE phe_seg = 'AUTOMOBILE'")
    spark.sql("DECLARE OR REPLACE VARIABLE phe_cutoff BIGINT DEFAULT 0")
    spark.sql(
        "SET VARIABLE phe_cutoff = (SELECT max(c_custkey) DIV 2"
        " FROM customer)"
    )
    body = """
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN c_custkey <= phe_cutoff
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_below
        FROM customer
        WHERE c_mktsegment <> phe_seg
        GROUP BY 1
    """
    return spark.sql("EXECUTE IMMEDIATE :q", args={"q": body})


# --- AN26: exact lag-1 autocorrelation --------------------------------------

_AUTOCORR_ORACLE = """
WITH c AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           row_number() OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
           ) AS rnd
    FROM events
), w AS (
    SELECT user_id, ts, event_id, cents FROM c WHERE rnd <= 8
), s AS (
    SELECT user_id, count(*) AS n, sum(cents) AS tot
    FROM w GROUP BY 1
), d AS (
    SELECT w.user_id, s.n,
           s.n * w.cents - s.tot AS dd,
           lead(s.n * w.cents - s.tot) OVER (
               PARTITION BY w.user_id ORDER BY w.ts, w.event_id
           ) AS dn
    FROM w JOIN s ON w.user_id = s.user_id
), a AS (
    SELECT user_id, max(n) AS n,
           sum(dd * dn) AS num, sum(dd * dd) AS den
    FROM d GROUP BY 1
)
SELECT user_id, CAST(n AS BIGINT) AS n,
       CAST(num AS BIGINT) AS acf_num, CAST(den AS BIGINT) AS acf_den,
       CAST((CAST(num AS HUGEINT) * 1000000
             - ((CAST(num AS HUGEINT) * 1000000 % den) + den) % den) // den
            AS BIGINT) AS acf_micro
FROM a WHERE n >= 4 AND den > 0
"""


@query("q_autocorr", oracle=_AUTOCORR_ORACLE)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AN26: lag-1 autocorrelation of each user's last 8 event values,
    # EXACT — the serial-dependence screen a feature pipeline runs
    # before trusting per-user aggregates. The mean is cleared by
    # cross-multiplication (d_i = n·x_i − Σx, so r1 = Σ d_i·d_{i+1} /
    # Σ d_i²). Overflow bounds: with |d| ≤ 8·10⁷ both num and den stay
    # under 8·(8·10⁷)² ≈ 5.2·10¹⁶ (BIGINT-safe), but num·10⁶ does NOT —
    # it reaches ~5·10²², so the micro-quantization step runs in
    # DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) and only the bounded
    # quotient (|r1| ≤ 1 by Cauchy–Schwarz ⇒ |acf_micro| ≤ 10⁶) is cast
    # back to BIGINT. Quantized by the pmod floordiv pattern
    # (theil-sen); one user-keyed shuffle serves the cap window, the
    # stats, the lead, and the final agg — the AN19-shape plan.
    ev = Catalog(spark, sf_dir).events
    wdesc = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    w = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            fixed_cents(F.col("value")).alias("cents"),
            F.row_number().over(wdesc).alias("rnd"),
        )
        .filter(F.col("rnd") <= 8)
        .drop("rnd")
    )
    stats = Window.partitionBy("user_id")
    asc = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = w.select(
        "user_id",
        F.count(F.lit(1)).over(stats).alias("n"),
        (
            F.count(F.lit(1)).over(stats) * F.col("cents")
            - F.sum("cents").over(stats)
        ).alias("dd"),
        "ts",
        "event_id",
    ).select(
        "user_id",
        "n",
        "dd",
        F.lead("dd").over(asc).alias("dn"),
    )
    a = d.groupBy("user_id").agg(
        F.max("n").alias("n"),
        F.sum(F.col("dd") * F.col("dn")).alias("num"),
        F.sum(F.col("dd") * F.col("dd")).alias("den"),
    )
    staged = a.filter((F.col("n") >= 4) & (F.col("den") > 0)).select(
        "user_id",
        F.col("n").cast("long").alias("n"),
        F.col("num").cast("long").alias("acf_num"),
        F.col("den").cast("long").alias("acf_den"),
        # widen BEFORE scaling: num·10⁶ overflows BIGINT ~5000× at the
        # |d| ≤ 8·10⁷ bound, so the scaled numerator lives in
        # DECIMAL(38,0); only the ≤10⁶-bounded quotient returns to long
        (F.col("num").cast("decimal(38,0)") * F.lit(1000000)).alias("__ns"),
        F.col("den").cast("decimal(38,0)").alias("__den"),
    )
    return staged.select(
        "user_id",
        "n",
        "acf_num",
        "acf_den",
        F.expr("(__ns - pmod(__ns, __den)) DIV __den")
        .cast("long")
        .alias("acf_micro"),
    )


# --- UD6: polymorphic Python UDTF (analyze-time schema) ---------------------


@query(
    "q_fn_udtf_poly",
    oracle="""
    SELECT doc_id,
           split_part(text, ' ', 1) AS p0,
           split_part(text, ' ', 2) AS p1,
           split_part(text, ' ', 3) AS p2
    FROM documents
    WHERE doc_id < 200
    """,
)
def q_fn_udtf_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UD6: the POLYMORPHIC Python UDTF — its output schema is computed
    # at analyze time from a constant argument (`analyze()` receives
    # the foldable literal n=3 and returns a 3-column StructType), the
    # Spark-4 API for table functions whose shape depends on their
    # call site (the SPLIT_PART-to-columns / dynamic-pivot family).
    # Completes the UDTF matrix: fixed-schema (UD2), Arrow-optimized
    # (UD2b), polymorphic (this). Row-at-a-time Python — surface demo,
    # cost-annotated like SQL3/UD5, bounded to 200 docs; the oracle
    # (plain split_part columns) pins that the dynamic schema and the
    # per-row emission agree with the relational spelling, including
    # the '' (not NULL) out-of-range convention.
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeResult

    class _SplitFixed:
        @staticmethod
        def analyze(text, n):
            k = int(n.value)
            return AnalyzeResult(
                StructType(
                    [StructField(f"p{i}", StringType()) for i in range(k)]
                )
            )

        def eval(self, text, n):
            parts = (text or "").split(" ")
            yield tuple(
                parts[i] if i < len(parts) else "" for i in range(int(n))
            )

    spark.udtf.register("phe_split_fixed", udtf(_SplitFixed))
    Catalog(spark, sf_dir).register_views()
    return spark.sql(
        """
        SELECT d.doc_id, s.p0, s.p1, s.p2
        FROM documents d, LATERAL phe_split_fixed(d.text, 3) s
        WHERE d.doc_id < 200
        """
    )


# --- ST9e: TWS event-time timers (idle finalization) ------------------------


@query(
    "q_stream_timer_tws",
    oracle="""
    SELECT user_id AS key,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               / 1.0 AS total,
           CAST(epoch_ms(max(CAST(ts AS TIMESTAMP))) + 1800000 AS BIGINT)
               AS finalize_ms
    FROM events
    GROUP BY 1
    """,
)
def q_stream_timer_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ST9e: transformWithStateInPandas EVENT-TIME TIMERS — the fourth
    # leg of the typed-state surface (ST9b ValueState, ST9c ListState,
    # ST9d MapState). Nothing is emitted on input; each key's totals
    # surface only from handleExpiredTimer once the watermark passes
    # its last event + 30 min (streaming/stateful.py:idle_finalize_tws
    # — delete-stale-register-new keeps exactly one timer per key, so
    # arrival order can't double-emit). The replay appends one
    # far-future sentinel file (pyarrow write, no Spark job) after the
    # real batches: its event time advances the watermark past every
    # real timer and the trailing no-data batch fires them all — so
    # every key finalizes exactly once and the streaming answer equals
    # the batch per-user rollup. finalize_ms carries the fired timer's
    # own expiry (last event ms + 30 min), so the oracle checks the
    # timer VALUE flowed through expiry, not just that rows appeared.
    # Falls back to the equivalent batch aggregate when no protobuf
    # runtime exists (same oracle), capability via tws_available().
    import datetime
    import shutil
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..streaming.protobuf_compat import tws_available
    from ..streaming.stateful import idle_finalize_tws
    from ..streaming.structured import (
        fixture_session,
        stream_from_parquet_dir,
    )

    ev = Catalog(spark, sf_dir).events
    e = ev.select(
        "user_id",
        F.floor(F.col("value") * 100.0 + F.lit(0.5))
        .cast("double")
        .alias("cents"),
        "ts",
    )
    if not tws_available():
        return e.groupBy(F.col("user_id").alias("key")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("total"),
            (
                F.floor(
                    F.unix_micros(F.max("ts")) / F.lit(1000)
                ).cast("long")
                + F.lit(30 * 60 * 1000)
            ).alias("finalize_ms"),
        )

    tmp = os.path.join(tempfile.mkdtemp(prefix="phe_timer_"), "in")
    e.repartition(2, "user_id").write.parquet(tmp)

    s2 = fixture_session(spark)
    stream = (
        stream_from_parquet_dir(s2, tmp, e.schema, max_files_per_trigger=1)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
    )
    out = idle_finalize_tws(
        stream, "user_id", "cents", ts_col="ts", idle_ms=30 * 60 * 1000
    )
    name = f"timer_{uuid.uuid4().hex}"
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()  # real batches: watermark ~0, no firing
        sentinel = pa.table(
            {
                "user_id": pa.array([-1], pa.int64()),
                "cents": pa.array([0.0], pa.float64()),
                "ts": pa.array(
                    [datetime.datetime(2100, 1, 1)], pa.timestamp("us")
                ),
            }
        )
        pq.write_table(sentinel, os.path.join(tmp, "part-sentinel.parquet"))
        # watermark jump; the NO-DATA batch fires the timers — drain
        # until the sink stabilizes (processAllAvailable alone can
        # return before that batch under load; see
        # streaming/structured.py drain_watermark_eviction)
        from ..streaming.structured import drain_watermark_eviction

        drain_watermark_eviction(q, lambda: s2.table(name).count())
    finally:
        q.stop()
    shutil.rmtree(os.path.dirname(tmp), ignore_errors=True)
    return s2.table(name).filter(F.col("key") >= 0).select(
        "key", "n", "total", "finalize_ms"
    )


# --- ST12: checkpoint recovery (exactly-once restart resume) ----------------


@query(
    "q_stream_restart_equiv",
    oracle="""
    SELECT user_id, event_id,
           CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
    FROM events
    """,
)
def q_stream_restart_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ST12: checkpoint-recovery — the fault-tolerance half of the
    # streaming contract the equivalence replays (ST6b/ST7/ST7b) take
    # for granted. Phase 1 streams half the key-routed input through a
    # foreachBatch APPEND sink under a checkpointLocation, then STOPS.
    # Phase 2 builds a brand-new streaming query object (fresh source,
    # fresh foreachBatch) over the same source dir, sink dir, and
    # checkpoint — Spark resumes from the committed offsets, so only
    # the files added after the stop are processed. The sink is
    # deliberately append-only and NOT idempotent: a lost offset would
    # re-append phase-1 rows (hash-duplicates), a skipped file would
    # drop rows — the full-table value-hash oracle catches either, so
    # hash equality IS the exactly-once-resume claim. At 100 TB this
    # is the nightly-restart story: committed offsets + deterministic
    # batch routing mean a restarted job continues, never recomputes.
    import shutil
    import uuid

    from ..streaming.structured import (
        fixture_session,
        stream_from_parquet_dir,
    )

    ev = Catalog(spark, sf_dir).events
    e = ev.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="phe_restart_")
    src, out, ckpt = (os.path.join(root, d) for d in ("in", "out", "ckpt"))
    half = e.filter(F.pmod(F.col("user_id"), F.lit(2)) == 0)
    rest = e.filter(F.pmod(F.col("user_id"), F.lit(2)) == 1)
    half.repartition(2, "user_id").write.parquet(src)

    s2 = fixture_session(spark)

    def run_until_drained() -> None:
        stream = stream_from_parquet_dir(
            s2, src, e.schema, max_files_per_trigger=1
        )

        def append_batch(bdf, _bid):
            bdf.write.mode("append").parquet(out)

        q = (
            stream.writeStream.foreachBatch(append_batch)
            .option("checkpointLocation", ckpt)
            .queryName(f"restart_{uuid.uuid4().hex}")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_until_drained()  # phase 1: first half committed, query GONE
    # the other half arrives while no query is running
    rest.repartition(2, "user_id").write.mode("append").parquet(src)
    run_until_drained()  # phase 2: new query resumes from the offsets

    result = (
        spark.read.parquet(out)
        .select("user_id", "event_id", "cents")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(root, ignore_errors=True)
    return result


# --- L44: kNN-graph construction (portable md5 witness) ---------------------


def _knn_graph_oracle(k: int = 3, n_bits: int = 4, n_tables: int = 8) -> str:
    from .llm_q3 import _fixed_cos_sql, _plane_bucket_ctes

    cos = _fixed_cos_sql("a", "b")
    return f"""
    WITH {_plane_bucket_ctes(n_bits, n_tables)}, cand AS (
        SELECT DISTINCT x.vec_id AS src, y.vec_id AS dst
        FROM buckets x JOIN buckets y
          ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id <> y.vec_id
    ), scored AS (
        SELECT c.src, c.dst, {cos} AS cos_sim
        FROM cand c
        JOIN embeddings a ON a.vec_id = c.src
        JOIN embeddings b ON b.vec_id = c.dst
    )
    SELECT src, dst, cos_sim, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY src ORDER BY cos_sim DESC, dst ASC
        ) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= {k}
    """


@query("q_knn_graph", oracle=_knn_graph_oracle())
def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L44: build the k-nearest-neighbor GRAPH over the whole embedding
    # corpus — every vector gets its top-3 bucket-local cosine
    # neighbors (llm/similarity.py:knn_graph). Distinct from the two
    # existing embedding shapes: lsh_cosine_topk broadcasts a small
    # QUERY set (wrong when every vector is a query) and
    # embedding_near_duplicates THRESHOLDS pairs (a kNN graph keeps
    # the best k regardless of absolute similarity) — this is the
    # building block for graph-based dedup/clustering and
    # NN-descent-style index construction. Candidates come from the
    # same ids-only (table, bucket) banded self-join as the near-dup
    # family (never all-pairs; plan-sweep enforced), the per-source
    # top-k is a window over bucket co-occupants. portable=True (md5
    # integer hyperplanes + fixed-point cosine) puts candidates AND
    # ranks under the full value-hash oracle.
    from ..llm.similarity import knn_graph

    e = Catalog(spark, sf_dir).embeddings
    return knn_graph(e, k=3, n_bits=4, n_tables=8, portable=True)


# --- A16: exact weighted median ---------------------------------------------


@query(
    "q_agg_weighted_median",
    oracle="""
    WITH v AS (
        SELECT l_returnflag AS flag,
               CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents,
               CAST(l_quantity AS BIGINT) AS w
        FROM lineitem
    ), g AS (
        SELECT flag, cents, sum(w) AS w FROM v GROUP BY 1, 2
    ), c AS (
        SELECT flag, cents, w,
               sum(w) OVER (PARTITION BY flag ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) AS cw,
               sum(w) OVER (PARTITION BY flag) AS tw
        FROM g
    )
    SELECT flag, CAST(tw AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN 2 * cw >= tw THEN cents END) AS BIGINT)
               AS wmedian_cents
    FROM c GROUP BY flag, tw
    """,
)
def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A16: exact WEIGHTED median — the statistic a sampled/reweighted
    # corpus needs where A12's unweighted quantiles mislead (every
    # temperature-resampled or importance-weighted pipeline reports
    # weighted aggregates): lower weighted median = smallest value v
    # with 2·cumweight(≤v) ≥ totalweight, all-BIGINT so it hashes
    # exactly. Scale shape: pre-aggregate to distinct (group, value)
    # BEFORE any window (the AN23 trick — the cumsum window then runs
    # over value cardinality, not row count), one group-keyed shuffle
    # serves the pre-agg, both window frames, and the final min-filter
    # agg; no global sort anywhere.
    li = Catalog(spark, sf_dir).lineitem.select(
        F.col("l_returnflag").alias("flag"),
        fixed_cents(F.col("l_extendedprice")).alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    g = li.groupBy("flag", "cents").agg(F.sum("w").alias("w"))
    wcum = (
        Window.partitionBy("flag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("flag")
    c = g.select(
        "flag",
        "cents",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(wtot).alias("tw"),
    )
    return (
        c.groupBy("flag", "tw")
        .agg(
            F.min(
                F.when(2 * F.col("cw") >= F.col("tw"), F.col("cents"))
            ).alias("wmedian_cents")
        )
        .select(
            "flag",
            F.col("tw").cast("long").alias("total_weight"),
            F.col("wmedian_cents").cast("long").alias("wmedian_cents"),
        )
    )


# --- J11: dynamic partition pruning -----------------------------------------


@query(
    "q_join_dpp",
    oracle="""
    WITH dim AS (
        SELECT DISTINCT strftime(CAST(l_shipdate AS TIMESTAMP), '%Y-%m')
                   AS ship_month
        FROM lineitem
    )
    SELECT f.ship_month,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM (
        SELECT strftime(CAST(l_shipdate AS TIMESTAMP), '%Y-%m')
                   AS ship_month,
               l_extendedprice
        FROM lineitem
    ) f
    JOIN (SELECT ship_month FROM dim WHERE ship_month LIKE '1996%') d
      ON f.ship_month = d.ship_month
    GROUP BY 1
    """,
)
def q_join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J11: DYNAMIC partition pruning — the runtime sibling of S3's
    # static pruning and the single biggest star-schema scan saver at
    # 100 TB: when a partitioned fact joins a filtered dim ON THE
    # PARTITION COLUMN, Catalyst injects the dim's surviving keys as a
    # runtime subquery into the fact scan's PartitionFilters, so the
    # fact reads only the partitions the join can match (here: 12 of
    # ~70 month partitions) — no by-hand predicate copying. The dim's
    # filter deliberately lives behind a parquet roundtrip so planning
    # cannot constant-fold it into a static filter: the pruning HAS to
    # happen at runtime (the `dynamicpruningexpression` in the scan's
    # PartitionFilters is pinned in tests/test_plans.py). Oracle is
    # the semantically-equal inlined join — DPP must be invisible in
    # the answer, like J10's bloom stage.
    import shutil

    li = Catalog(spark, sf_dir).lineitem.select(
        fixed_cents(F.col("l_extendedprice")).alias("cents"),
        F.date_format(F.col("l_shipdate"), "yyyy-MM").alias("ship_month"),
    )
    tmp = tempfile.mkdtemp(prefix="phe_dpp_")
    fact_dir = os.path.join(tmp, "fact")
    dim_dir = os.path.join(tmp, "dim")
    li.write.partitionBy("ship_month").parquet(fact_dir)
    li.select("ship_month").distinct().write.parquet(dim_dir)

    fact = spark.read.parquet(fact_dir)
    dim = spark.read.parquet(dim_dir).filter(
        F.col("ship_month").startswith("1996")
    )
    out = (
        fact.join(dim, "ship_month")
        .groupBy("ship_month")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(tmp, ignore_errors=True)
    return out


# --- S20: copy-on-write time travel (VERSION AS OF) -------------------------


@query(
    "q_sink_time_travel",
    oracle="""
    WITH base AS (
        SELECT c_custkey,
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
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
def q_sink_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S20: time travel on the copy-on-write MERGE table — read any
    # committed snapshot (VERSION AS OF), not just current. CoW makes
    # historical reads free: every version directory IS a full
    # consistent snapshot, so as-of resolution is one manifest read
    # with no log replay (round 10 added the commit-log/manifest layer
    # — sinks/manifest.py — so resolution is listing-free and
    # stats-skipping-capable; see q_sink_manifest_read). The query commits v1
    # (base) → v2 (update MERGE) → v3 (delete MERGE), then returns
    # BOTH the as-of-v2 and the current (v3) reads side by side — the
    # oracle recomputes each snapshot relationally, so a time-travel
    # read that leaked post-v2 state (or missed it) hash-fails.
    # vacuum(keep_last=n) is the retention boundary for how far back
    # travel reaches (S11).
    import shutil

    from ..sinks.merge import MergeSink

    base = Catalog(spark, sf_dir).customer.select(
        "c_custkey", fixed_cents(F.col("c_acctbal")).alias("bal_cents")
    )
    root = tempfile.mkdtemp(prefix="phe_travel_")
    sink = MergeSink(os.path.join(root, "t"), key="c_custkey")
    sink.init(base)  # v1
    sink.merge(
        spark,
        base.filter(F.col("c_custkey") % 5 == 0).select(
            "c_custkey", (F.col("bal_cents") + 5000).alias("bal_cents")
        ),
    )  # v2
    empty = local_rows(spark, [], base.schema)
    sink.merge(
        spark,
        empty,
        deletes=base.filter(F.col("c_custkey") % 3 == 0).select("c_custkey"),
    )  # v3
    v2 = sink.read_version(spark, 2).select(
        F.lit("v2").alias("snapshot"), "c_custkey", "bal_cents"
    )
    v3 = sink.read_version(spark, 3).select(
        F.lit("v3").alias("snapshot"), "c_custkey", "bal_cents"
    )
    out = v2.unionByName(v3).localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return out


# --- W4b: skew-salted exact top-k per group ---------------------------------


@query(
    "q_window_topk_salted",
    oracle="""
    SELECT event_type, rank, event_id, cents FROM (
        SELECT event_type,
               CAST(row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY CAST(floor(value * 100 + 0.5) AS BIGINT) DESC,
                            event_id ASC
               ) AS BIGINT) AS rank,
               event_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ) WHERE rank <= 5
    """,
)
def q_window_topk_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W4b: W4's top-k-per-group under GROUP SKEW — events has only a
    # handful of types, so the plain window ships ~a fifth of the
    # table to ONE reducer and sorts it there; at 100 TB that single
    # task is the job, and neither AQE (skew splits cover joins only —
    # a window partition can't split without breaking rank semantics)
    # nor map-side combine (windows have none) helps. The two-phase
    # salted form (operators/agg.py:salted_group_topk) ranks within
    # (type, salt-of-tiebreak) keeping 5 per bucket — containment
    # makes the union of bucket top-5s a superset of the answer — then
    # re-ranks the ≤ 16·5 survivors per type. Oracle is the PLAIN
    # window: salting must be invisible in the answer (the J8/A9
    # equivalence policy). Reducer-spread measurement: SKEW.json
    # 'window' section.
    from ..operators.agg import salted_group_topk

    ev = Catalog(spark, sf_dir).events.select(
        "event_type", "event_id", fixed_cents(F.col("value")).alias("cents")
    )
    return salted_group_topk(
        ev,
        keys=["event_type"],
        order_col="cents",
        k=5,
        tiebreak=["event_id"],
        salt_buckets=16,
    ).select("event_type", "rank", "event_id", "cents")


# --- L45: e2e multimodal retrieval pipeline ---------------------------------


@query(
    "q_pipeline_multimodal",
    oracle="""
    WITH ids AS (
        SELECT doc_id AS media_id FROM documents ORDER BY doc_id LIMIT 40
    ), f AS (
        SELECT media_id,
               list_transform(generate_series(0, 7), i ->
                   CAST(('0x' || substr(
                       sha256('mediabytes:' || CAST(media_id AS VARCHAR)),
                       2 * i + 1, 2)) AS BIGINT) / 255.0
               ) AS v
        FROM ids
    ), scored AS (
        SELECT q.media_id AS query_id, c.media_id,
               floor(list_dot_product(q.v, c.v)
                     / (sqrt(list_dot_product(q.v, q.v))
                        * sqrt(list_dot_product(c.v, c.v)))
                     * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
        FROM (SELECT * FROM f WHERE media_id < 3) q
        CROSS JOIN f c
    )
    SELECT query_id, media_id, cos_sim, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, media_id ASC
        ) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= 2
    """,
)
def q_pipeline_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L45: the composed MULTIMODAL retrieval pipeline — the e2e shape
    # a vision/audio training-data system runs, sibling of the text
    # pipelines (L7b pretrain, L41 post-train): attach encoded media
    # bytes → executor-side feature extraction over Arrow batches
    # (decode_features via mapInPandas — the real 100-TB plumbing;
    # the feature fn is the documented deterministic stand-in, so the
    # WHOLE pipeline including the "model" stays value-hash-checkable:
    # DuckDB replays sha256-byte features in SQL) → brute-force cosine
    # top-k of every item against the probe set (broadcast queries,
    # fixed-point sim — the L3 witness policy). Swapping the feature
    # fn for a real encoder changes no plumbing: schema, batching,
    # broadcast, and ranking are exactly what a CLIP-style retrieval
    # run uses.
    from ..llm.multimodal import attach_fake_media, decode_features
    from ..llm.similarity import brute_force_cosine_topk

    docs = Catalog(spark, sf_dir).documents.select(
        F.col("doc_id").alias("media_id")
    ).orderBy("media_id").limit(40)
    media = attach_fake_media(docs, "media_id")
    feats = decode_features(media, id_col="media_id", n_features=8)
    queries = feats.filter(F.col("media_id") < 3).select(
        F.col("media_id").alias("query_id"), "features"
    )
    return brute_force_cosine_topk(
        feats,
        queries,
        vec_col="features",
        id_col="media_id",
        query_id_col="query_id",
        k=2,
    )


# --- ST13: offline state-store reader ---------------------------------------


@query(
    "q_stream_state_reader",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM events
    GROUP BY 1
    """,
)
def q_stream_state_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ST13: the OFFLINE state-store reader (Spark 4
    # `spark.read.format("statestore")`) — streaming state stops being
    # an opaque runtime artifact and becomes a queryable table: the
    # operational surface for debugging a wedged stateful query,
    # auditing state growth, and seeding state migrations at 100 TB
    # (where "restart and recompute" means re-reading the corpus). The
    # query runs a checkpointed per-user count+sum aggregation to
    # completion, then reads the aggregate's internal state BACK from
    # the checkpoint — no running query, batch API — and returns it.
    # Oracle is the batch rollup: the persisted state of a streaming
    # aggregate IS the aggregate (hash equality proves the reader
    # decodes keys and packed accumulator values, not just row counts).
    import shutil
    import uuid

    from ..streaming.structured import (
        fixture_session,
        stream_from_parquet_dir,
    )

    ev = Catalog(spark, sf_dir).events
    e = ev.select(
        "user_id",
        F.floor(F.col("value") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="phe_ssread_")
    src, ck = os.path.join(root, "src"), os.path.join(root, "ck")
    e.coalesce(1).write.parquet(src)

    s2 = fixture_session(spark)
    stream = stream_from_parquet_dir(s2, src, e.schema)
    agg = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total_cents")
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(f"ssr_{uuid.uuid4().hex}")
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # batch-read the streaming aggregate's internal state off the
    # checkpoint: key struct = grouping key, value struct = packed
    # (count, sum) accumulators
    state = (
        s2.read.format("statestore")
        .load(ck)
        .select(
            F.col("key.user_id").alias("user_id"),
            F.col("value.count").cast("long").alias("n"),
            F.col("value.sum").cast("long").alias("total_cents"),
        )
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(root, ignore_errors=True)
    return state

# --- ST12b: Trigger.AvailableNow incremental batch --------------------------


@query(
    "q_stream_available_now",
    oracle="""
    SELECT user_id, event_id,
           CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
    FROM events
    """,
)
def q_stream_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ST12b: `Trigger.AvailableNow` — the production form of ST12's
    # incremental-batch pattern: the query processes everything
    # available in rate-limited microbatches and then STOPS ITSELF
    # (awaitTermination returns), which is how a scheduled nightly job
    # runs a streaming pipeline without a resident cluster — each
    # invocation picks up exactly the data that arrived since the last
    # one, via the same committed offsets ST12 exercises with a manual
    # stop. Two invocations over a growing source dir + the
    # deliberately non-idempotent append sink: the full-table hash
    # oracle again IS the exactly-once claim (a re-read duplicates, a
    # missed file drops). maxFilesPerTrigger stays honored under
    # AvailableNow (rate limiting applies; availability is the stop
    # condition, not the batch size).
    import shutil
    import uuid

    from ..streaming.structured import (
        fixture_session,
        stream_from_parquet_dir,
    )

    ev = Catalog(spark, sf_dir).events
    e = ev.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="phe_avnow_")
    src, out, ck = (os.path.join(root, d) for d in ("in", "out", "ckpt"))
    e.filter(F.pmod(F.col("user_id"), F.lit(2)) == 0).repartition(
        2, "user_id"
    ).write.parquet(src)

    s2 = fixture_session(spark)

    def run_available_now() -> None:
        stream = stream_from_parquet_dir(
            s2, src, e.schema, max_files_per_trigger=1
        )

        def append_batch(bdf, _bid):
            bdf.write.mode("append").parquet(out)

        q = (
            stream.writeStream.foreachBatch(append_batch)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .queryName(f"avnow_{uuid.uuid4().hex}")
            .start()
        )
        # AvailableNow terminates on its own, but a thrown/wedged query
        # must not leave a resident stream behind (it would hang the
        # parity sweep): bounded wait + unconditional stop, and surface
        # the query's own exception if it died.
        try:
            if not q.awaitTermination(timeout=300):
                raise TimeoutError(
                    "AvailableNow query did not drain within 300s"
                )
        finally:
            q.stop()
        if q.exception() is not None:
            raise q.exception()

    run_available_now()  # invocation 1: first half
    e.filter(F.pmod(F.col("user_id"), F.lit(2)) == 1).repartition(
        2, "user_id"
    ).write.mode("append").parquet(src)
    run_available_now()  # invocation 2: only the new files

    result = (
        spark.read.parquet(out)
        .select("user_id", "event_id", "cents")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(root, ignore_errors=True)
    return result

# --- ST14: chained stateful aggregations (window-on-window) -----------------


@query(
    "q_stream_chained_agg",
    oracle="""
    WITH q AS (
        SELECT event_type,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900) * 900
                    AS BIGINT) AS b15,
               CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS s15
        FROM events
        GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(floor(b15 / 3600) * 3600 AS BIGINT) AS hour_start_s,
           CAST(sum(s15) AS BIGINT) AS total_cents,
           CAST(count(*) AS BIGINT) AS n_quarters
    FROM q
    GROUP BY 1, 2
    """,
)
def q_stream_chained_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ST14: TWO stateful aggregations in ONE streaming query
    # (window-on-window) — the Spark-4 capability that turns the
    # classic "silver 15-min rollup feeding a gold hourly rollup" from
    # two jobs + an intermediate topic into one pipeline: the inner
    # 15-min window agg's CLOSED windows flow (via `window_time`, no
    # re-watermark — re-anchoring the watermark on the derived column
    # breaks propagation and the outer layer never fires; found the
    # hard way) into the outer 1-hour agg within the same microbatch
    # graph. Flushing a DEPTH-2 stateful chain needs TWO staggered
    # far-future sentinels: the first closes every real inner window,
    # the second closes the FIRST sentinel's inner window so its event
    # time reaches the outer layer and drives the outer eviction — one
    # sentinel per stateful depth, the generalization of ST8b's single
    # sentinel. n_quarters (how many 15-min windows fed each hour) is
    # the witness that the outer agg consumed inner RESULTS, not raw
    # events. Exact integer cents end to end.
    import datetime
    import shutil
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..streaming.structured import (
        fixture_session,
        stream_from_parquet_dir,
    )

    ev = Catalog(spark, sf_dir).events
    e = ev.select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    tmp = os.path.join(tempfile.mkdtemp(prefix="phe_chain_"), "in")
    e.coalesce(1).write.parquet(tmp)

    s2 = fixture_session(spark)
    stream = (
        stream_from_parquet_dir(s2, tmp, e.schema)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
    )
    quarter = stream.groupBy(
        F.window("ts", "15 minutes"), "event_type"
    ).agg(F.sum("cents").alias("s15"))
    hour = quarter.groupBy(
        F.window(F.window_time("window"), "1 hour"), "event_type"
    ).agg(
        F.sum("s15").alias("total_cents"),
        F.count(F.lit(1)).alias("n_quarters"),
    )
    name = f"chain_{uuid.uuid4().hex}"
    q = (
        hour.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        for i, when in enumerate(
            (datetime.datetime(2100, 1, 1), datetime.datetime(2100, 6, 1))
        ):
            pq.write_table(
                pa.table(
                    {
                        "event_type": pa.array(["__sentinel"]),
                        "ts": pa.array([when], pa.timestamp("us")),
                        "cents": pa.array([0], pa.int64()),
                    }
                ),
                os.path.join(tmp, f"part-sentinel{i}.parquet"),
            )
            # drain past the watermark's NO-DATA batch (see
            # streaming/structured.py drain_watermark_eviction)
            from ..streaming.structured import drain_watermark_eviction

            drain_watermark_eviction(q, lambda: s2.table(name).count())
    finally:
        q.stop()
    shutil.rmtree(os.path.dirname(tmp), ignore_errors=True)
    return (
        s2.table(name)
        .filter(F.col("event_type") != "__sentinel")
        .select(
            "event_type",
            F.unix_timestamp(F.col("window.start"))
            .cast("long")
            .alias("hour_start_s"),
            F.col("total_cents").cast("long").alias("total_cents"),
            F.col("n_quarters").cast("long").alias("n_quarters"),
        )
    )
