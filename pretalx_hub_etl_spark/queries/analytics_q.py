"""Analytics batch: skyline (Pareto frontier), deterministic exact-k
sampling, and event-sequence transition matrices.

Reference tie-in: the reference's only "analytics" is implicit — it
hand-picks rows by scanning Python lists (`main.py:136-143`). These are
the declarative engine forms a user of a 100 TB corpus actually asks
for: "best tradeoff rows", "a reproducible sample of exactly k", and
"what happens after event X".

Cross-engine determinism notes:
- skyline does NO arithmetic on values (comparisons only) → exact hash;
- exact-k sampling orders by the Knuth multiplicative hash with the
  primary key as tiebreak — a total order, so LIMIT k is deterministic
  on both engines;
- transition probabilities divide exact BIGINT counts as doubles with
  the op order pinned (one division — correctly rounded IEEE on both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from . import query

# --- AN1: 2-D skyline / Pareto frontier -------------------------------------


@query(
    "q_skyline",
    oracle="""
    WITH pts AS (
        SELECT p_retailprice AS price, max(CAST(p_size AS BIGINT)) AS sz
        FROM part GROUP BY 1
    )
    SELECT price, sz FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.price < p.price AND q.sz >= p.sz
    )
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pareto frontier of parts: cheapest price for the largest size
    # (minimize p_retailprice, maximize p_size). The oracle is the
    # textbook quadratic NOT EXISTS (affordable in DuckDB at sf0.01);
    # the Spark side is the distributive two-phase sort-scan
    # (operators/skyline.py) whose quadratic term never materializes.
    from ..operators.skyline import skyline_2d

    p = Catalog(spark, sf_dir).part.select(
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("long").alias("sz"),
    )
    return skyline_2d(p, "price", "sz", minimize_x=True, maximize_y=True)


# --- AN2: deterministic exact-k sample --------------------------------------


@query(
    "q_sample_exact_k",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296, doc_id
    LIMIT 500
    """,
)
def q_sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exactly-k uniform sample without replacement: rank every row by
    # the Knuth multiplicative hash of its id and keep the k smallest —
    # the deterministic, one-pass replacement for reservoir sampling
    # (same marginal distribution under hash uniformity, but
    # reproducible and mergeable). Spark plans this as
    # TakeOrderedAndProject: per-partition top-k heaps + a k-sized
    # driver merge — no global sort, no RNG state, scales to any input.
    # Complements the fraction-based Bernoulli samplers (L6), which
    # cannot hit an exact row budget.
    d = Catalog(spark, sf_dir).documents
    h = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(2147483648)) * F.lit(2654435761),
        F.lit(4294967296),
    )
    return (
        d.select("doc_id", "lang", h.alias("h"))
        .orderBy("h", "doc_id")
        .limit(500)
        .select("doc_id", "lang")
    )


# --- AN4: grid-bucketed spatial distance join -------------------------------

# synthetic fixed-point coordinates in a 10-degree box of micro-degrees
# (0 .. 1e7), derived from the customer key via the Knuth multiplicative
# hash (decorrelated lat/lon via a key offset) — both engines construct
# the same values, so only exact integers cross the comparison
_LAT_SQL = "(((c_custkey % 2147483648) * 2654435761) % 4294967296) % 10000000"
_LON_SQL = (
    "((((c_custkey + 999331) % 2147483648) * 2654435761) % 4294967296)"
    " % 10000000"
)
_RADIUS = 250_000  # 0.25 degrees in micro-degrees


@query(
    "q_spatial_pairs",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS id,
               CAST({_LAT_SQL} AS BIGINT) AS lat,
               CAST({_LON_SQL} AS BIGINT) AS lon
        FROM customer
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST((a.lat - b.lat) * (a.lat - b.lat)
              + (a.lon - b.lon) * (a.lon - b.lon) AS BIGINT) AS dist2
    FROM pts a JOIN pts b ON a.id < b.id
    WHERE (a.lat - b.lat) * (a.lat - b.lat)
        + (a.lon - b.lon) * (a.lon - b.lon) <= {_RADIUS * _RADIUS}
    """,
)
def q_spatial_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # proximity self-join: all point pairs within 0.25 degrees. The
    # oracle runs the quadratic distance self-join DuckDB can afford at
    # sf0.01; the Spark side buckets points into radius-sized grid
    # cells and equi-joins the 3x3 neighborhood
    # (operators/spatial.py) — the cross join never materializes.
    # Integer micro-degree coords keep dist2 an exact BIGINT.
    from ..operators.spatial import grid_distance_self_join

    k = F.col("c_custkey")
    lat = F.pmod(
        F.pmod(F.pmod(k, F.lit(2147483648)) * F.lit(2654435761),
               F.lit(4294967296)),
        F.lit(10_000_000),
    )
    lon = F.pmod(
        F.pmod(F.pmod(k + F.lit(999331), F.lit(2147483648))
               * F.lit(2654435761), F.lit(4294967296)),
        F.lit(10_000_000),
    )
    pts = Catalog(spark, sf_dir).customer.select(
        k.alias("id"), lat.alias("lat"), lon.alias("lon")
    )
    return grid_distance_self_join(pts, "id", "lat", "lon", _RADIUS)


# --- AN5: PageRank (fixed-iteration, exact integer arithmetic) --------------

_PR_ITERATIONS = 5


def _pagerank_oracle(iterations: int, sink: bool = False) -> str:
    # the Spark side's iterative loop, unrolled into chained CTEs: DuckDB
    # has no mutable state, so each iteration is one join/agg CTE pair.
    # `//` is integer division — exact on the all-positive ranks, matching
    # the engine's pmod-based exact floor division. With sink=True each
    # iteration also folds in the uniform dangling-mass share
    # (dangling_total // n_vertices), replaying the engine's
    # redistribute_dangling=True formulation exactly.
    ctes = [
        """e AS (
        SELECT a.c_custkey AS u, b.c_custkey AS v
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey
         AND a.c_custkey < b.c_custkey
         AND b.c_custkey - a.c_custkey <= 100
    )""",
        "verts AS (SELECT u AS x FROM e UNION SELECT v FROM e)",
        "outd AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY u)",
        "nv AS (SELECT CAST(count(*) AS BIGINT) AS n FROM verts)",
        "r0 AS (SELECT x, CAST(1000000 AS BIGINT) AS r FROM verts)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""s{i} AS (
        SELECT e.v AS x, sum(r.r // o.d) AS s
        FROM e JOIN r{i - 1} r ON r.x = e.u JOIN outd o ON o.u = e.u
        GROUP BY e.v
    )"""
        )
        if sink:
            ctes.append(
                f"""dm{i} AS (
        SELECT CAST(COALESCE(sum(r.r), 0) AS BIGINT) // (SELECT n FROM nv)
               AS share
        FROM r{i - 1} r LEFT JOIN outd o ON o.u = r.x
        WHERE o.u IS NULL
    )"""
            )
            ctes.append(
                f"""r{i} AS (
        SELECT verts.x,
               CAST(150000 + (85 * (COALESCE(s{i}.s, 0)
                    + (SELECT share FROM dm{i}))) // 100 AS BIGINT) AS r
        FROM verts LEFT JOIN s{i} ON s{i}.x = verts.x
    )"""
            )
        else:
            ctes.append(
                f"""r{i} AS (
        SELECT verts.x,
               CAST(150000 + COALESCE((85 * s{i}.s) // 100, 0) AS BIGINT) AS r
        FROM verts LEFT JOIN s{i} ON s{i}.x = verts.x
    )"""
            )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT x AS vertex, r AS pr FROM r{iterations}"
    )


@query("q_graph_pagerank", oracle=_pagerank_oracle(_PR_ITERATIONS))
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PageRank over the same banded same-nation customer graph as
    # q_graph_triangles, directed low-key -> high-key (each nation's
    # highest keys are dangling and leak mass, per the documented
    # uncorrected formulation). Exact integer ranks (operators/graph.py
    # pagerank) make the iterative result bit-identical to the oracle's
    # unrolled-CTE replay — no float summation-order drift.
    from ..operators.graph import banded_key_edges, pagerank

    c = Catalog(spark, sf_dir).customer.select("c_custkey", "c_nationkey")
    edges = banded_key_edges(c, "c_custkey", "c_nationkey", band=100)
    return pagerank(edges, iterations=_PR_ITERATIONS)


@query(
    "q_graph_pagerank_sink",
    oracle=_pagerank_oracle(_PR_ITERATIONS, sink=True),
)
def q_graph_pagerank_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same graph as q_graph_pagerank but with the dangling-mass leak
    # closed (GR2 variant, round-6 review Next #4): each nation's
    # highest-key customers are sinks, and redistribute_dangling=True
    # spreads their rank mass uniformly each iteration via one scalar
    # agg + broadcast — the edge-sized dataflow (and so the ~1.0 scaling
    # exponent) is unchanged. Exact integer ranks, oracle replays the
    # same recursion as unrolled CTEs with the dm{i} share term.
    from ..operators.graph import banded_key_edges, pagerank

    c = Catalog(spark, sf_dir).customer.select("c_custkey", "c_nationkey")
    edges = banded_key_edges(c, "c_custkey", "c_nationkey", band=100)
    return pagerank(
        edges, iterations=_PR_ITERATIONS, redistribute_dangling=True
    )


# --- AN7: equi-depth histogram (scale-safe global ranks) --------------------


@query(
    "q_histogram_equidepth",
    oracle="""
    WITH c AS (
        SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents,
               l_orderkey, l_linenumber
        FROM lineitem
    ), n AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM c),
    r AS (
        SELECT cents,
               CAST(row_number() OVER (
                   ORDER BY cents, l_orderkey, l_linenumber) - 1
                    AS BIGINT) AS rn0
        FROM c
    )
    SELECT CAST((rn0 * 8) // cnt AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           min(cents) AS lo, max(cents) AS hi
    FROM r, n GROUP BY 1
    """,
)
def q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Equi-DEPTH histogram (quantile buckets: equal row counts, data-
    # driven boundaries — the profile a cost optimizer or drift monitor
    # wants, where equi-width bins collapse under skew). Bucket id is
    # the explicit integer formula floor(rank0 * k / n) on BOTH engines
    # — NOT ntile(), whose remainder placement differs from the formula
    # — with the rank computed scale-safely via global_row_number
    # (range partition + partition-offset stamp; the oracle affords the
    # single-reducer window DuckDB-side). min/max/count per bucket are
    # exact BIGINTs.
    from ..operators.agg import global_row_number

    li = Catalog(spark, sf_dir).lineitem.select(
        F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    ranked = global_row_number(
        li, ["cents", "l_orderkey", "l_linenumber"], out_col="rn"
    )
    total = li.agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    a = (F.col("rn") - 1) * 8
    bucket = ((a - F.pmod(a, F.col("cnt"))) / F.col("cnt")).cast("long")
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(bucket.alias("bucket"), "cents")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("lo"),
            F.max("cents").alias("hi"),
        )
    )


# --- L30: incremental distinct-count maintenance (bitmap-page IVM) ----------


@query(
    "q_incremental_distinct",
    oracle="""
    WITH all_rows AS (
        SELECT o_custkey % 50 AS grp, o_custkey AS id FROM orders
        UNION ALL
        SELECT c_custkey % 50 AS grp, c_custkey AS id
        FROM customer WHERE c_custkey % 3 = 0
    )
    SELECT grp, CAST(count(DISTINCT id) AS BIGINT) AS n_distinct
    FROM all_rows GROUP BY grp
    """,
)
def q_incremental_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # COUNT(DISTINCT) maintained INCREMENTALLY for an append-only feed:
    # bitmap-page state built from the base (orders custkeys), a delta
    # batch (a customer slice) folded in by bitwise OR — associative,
    # commutative, IDEMPOTENT, so at-least-once redelivery cannot
    # overcount — and popcounts read the current answer. The oracle
    # recomputes count(DISTINCT) over base+delta from scratch;
    # hash-equality proves the maintained state is exact, not a sketch.
    # The base table is never re-read at delta time (operators/
    # incremental.py distinct_state/apply_distinct_delta).
    from ..operators.incremental import (
        apply_distinct_delta,
        distinct_counts,
        distinct_state,
    )

    cat = Catalog(spark, sf_dir)
    base = cat.orders.select(
        (F.col("o_custkey") % 50).alias("g"), F.col("o_custkey").alias("id")
    )
    delta = cat.customer.filter(F.col("c_custkey") % 3 == 0).select(
        (F.col("c_custkey") % 50).alias("g"),
        F.col("c_custkey").alias("id"),
    )
    state = distinct_state(base, F.col("g"), F.col("id"))
    state = apply_distinct_delta(
        state, distinct_state(delta, F.col("g"), F.col("id"))
    )
    return distinct_counts(state).select(
        F.col("grp").cast("long").alias("grp"), "n_distinct"
    )


# --- AN9: interval-union coverage (overlap-aware temporal sweep) ------------


@query(
    "q_interval_coverage",
    oracle="""
    WITH iv AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS s,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000000
                 + (CAST(floor(value * 100.0 + 0.5) AS BIGINT) % 7200) AS e
        FROM events
    ), sweep AS (
        SELECT user_id, s, e,
               max(e) OVER (
                   PARTITION BY user_id ORDER BY s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_e
        FROM iv
    )
    SELECT user_id,
           CAST(sum(greatest(0, e - greatest(s, coalesce(prev_e, s))))
                AS BIGINT) AS covered_s
    FROM sweep GROUP BY user_id
    """,
)
def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Union length of possibly-OVERLAPPING intervals per key (session
    # coverage, SLA uptime, speaker-availability windows): naive
    # sum(duration) double-counts overlaps. The plane-sweep as a
    # window: order intervals by start, carry the running max end over
    # PRECEDING rows, and each interval contributes only the part past
    # that frontier — one window + one agg, both hashed on user_id (one
    # Exchange total), all arithmetic in exact whole-second BIGINTs.
    e = Catalog(spark, sf_dir).events
    s = F.unix_micros(F.col("ts").cast("timestamp"))
    s = ((s - F.pmod(s, F.lit(1_000_000))) / F.lit(1_000_000)).cast("long")
    dur = F.pmod(
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long"),
        F.lit(7200),
    )
    iv = e.select(
        "user_id", "event_id", s.alias("s"), (s + dur).alias("e")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sweep = iv.withColumn("prev_e", F.max("e").over(w))
    covered = F.greatest(
        F.lit(0).cast("long"),
        F.col("e")
        - F.greatest(F.col("s"), F.coalesce(F.col("prev_e"), F.col("s"))),
    )
    return (
        sweep.select("user_id", covered.alias("c"))
        .groupBy("user_id")
        .agg(F.sum("c").alias("covered_s"))
    )


# --- A14: bitmap-exact distinct counting (re-aggregatable) ------------------


@query(
    "q_distinct_bitmap",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def q_distinct_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # COUNT(DISTINCT) as a two-level BITMAP aggregation (Spark 4's
    # bitmap_* family — the Snowflake/BigQuery pattern): bucket ids
    # into 32k-bit bitmaps, OR-merge per group, sum the popcounts.
    # Same exact answer as count(DISTINCT) — the oracle — but the
    # partial state is a MERGEABLE fixed-width bitmap instead of a
    # per-key hash set: partials combine map-side, roll up across
    # grouping levels without re-expansion, and can be persisted as a
    # re-aggregatable distinct "sketch" that is exact, not approximate.
    # At 100 TB this is the difference between shuffling every distinct
    # (group, user) pair and shuffling bounded bitmap pages.
    e = Catalog(spark, sf_dir).events
    pages = e.groupBy(
        "event_type",
        F.bitmap_bucket_number(F.col("user_id")).alias("bucket"),
    ).agg(
        F.bitmap_construct_agg(
            F.bitmap_bit_position(F.col("user_id"))
        ).alias("bm")
    )
    return pages.groupBy("event_type").agg(
        F.sum(F.bitmap_count(F.col("bm"))).alias("n_users")
    )


# --- L29: heavy hitters (Misra-Gries candidates + exact verify) -------------


@query(
    "q_heavy_hitters",
    oracle=r"""
    SELECT term AS value, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split_regex(text, '\s+')) AS term
          FROM documents)
    WHERE term <> ''
    GROUP BY term HAVING count(*) >= 200
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact heavy hitters WITHOUT the vocabulary-sized shuffle: per-
    # partition Misra-Gries summaries propose a guaranteed-superset
    # candidate set (counters x partitions rows), an exact recount of
    # candidates only disposes (operators/heavy.py). The oracle is the
    # plain GROUP BY ... HAVING — identical output, different plan
    # class at scale.
    from ..operators.heavy import heavy_hitters

    d = Catalog(spark, sf_dir).documents
    toks = d.select(
        F.explode(F.split(F.col("text"), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    return heavy_hitters(toks, "term", min_count=200)


# --- UD2: Spark 4 Python UDTF (table function, lateral-join form) -----------


@query(
    "q_fn_udtf",
    oracle="""
    WITH idx AS (
        SELECT doc_id, n_chars,
               unnest(range(0, CAST(ceil(n_chars / 200.0) AS BIGINT)))
                   AS chunk_idx
        FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(least(200, n_chars - chunk_idx * 200) AS BIGINT) AS chunk_len
    FROM idx
    """,
)
def q_fn_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark 4's Python user-defined TABLE function (SPIP in 3.5,
    # stable in 4.x): one input row expands to N output rows with a
    # declared schema — the lateral-join form of mapInPandas, usable
    # straight from SQL. The UDTF plans fixed-length chunk spans from
    # n_chars alone (like the paged source plans from footer stats);
    # DuckDB's generate_series lateral join is the oracle twin. The
    # eval runs per row in Python — right for control-flow-heavy
    # expansion logic; for bulk numeric paths prefer the Arrow-batched
    # pandas UDF family (UD1).
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx bigint, chunk_len bigint")
    class ChunkSpans:
        def eval(self, n_chars: int, size: int):
            if n_chars is None or n_chars <= 0:
                return
            full = (n_chars + size - 1) // size
            for i in range(full):
                yield i, min(size, n_chars - i * size)

    spark.udtf.register("chunk_spans", ChunkSpans)
    d = Catalog(spark, sf_dir).documents
    d.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.chunk_idx, s.chunk_len
        FROM __udtf_docs d,
             LATERAL chunk_spans(d.n_chars, 200) s
        """
    )


@query(
    "q_fn_udtf_arrow",
    oracle="""
    WITH idx AS (
        SELECT doc_id, n_chars,
               unnest(range(0, CAST(ceil(n_chars / 200.0) AS BIGINT)))
                   AS chunk_idx
        FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(least(200, n_chars - chunk_idx * 200) AS BIGINT) AS chunk_len
    FROM idx
    """,
)
def q_fn_udtf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UD2b: the SAME table function under Arrow-optimized execution
    # (`useArrow=True`, Spark 4): eval logic is unchanged Python, but
    # output rows cross the boundary as Arrow batches instead of
    # pickled rows — the serialization tier that matters once a UDTF's
    # fan-out is large (chunk expansion at corpus scale emits ~n_chars/
    # size rows per doc). Same oracle as the row-serialized UD2 twin;
    # identical results is exactly the point.
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx bigint, chunk_len bigint", useArrow=True)
    class ChunkSpansArrow:
        def eval(self, n_chars: int, size: int):
            if n_chars is None or n_chars <= 0:
                return
            full = (n_chars + size - 1) // size
            for i in range(full):
                yield i, min(size, n_chars - i * size)

    spark.udtf.register("chunk_spans_arrow", ChunkSpansArrow)
    d = Catalog(spark, sf_dir).documents
    d.createOrReplaceTempView("__udtf_docs_arrow")
    return spark.sql(
        """
        SELECT d.doc_id, s.chunk_idx, s.chunk_len
        FROM __udtf_docs_arrow d,
             LATERAL chunk_spans_arrow(d.n_chars, 200) s
        """
    )


# --- AN8: chi-square contingency (categorical association) ------------------


@query(
    "q_chi_square",
    oracle="""
    WITH obs AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS o
        FROM documents GROUP BY lang, source
    ), m AS (
        SELECT lang, source, o,
               CAST(sum(o) OVER (PARTITION BY lang) AS BIGINT) AS rt,
               CAST(sum(o) OVER (PARTITION BY source) AS BIGINT) AS ct,
               CAST(sum(o) OVER () AS BIGINT) AS n
        FROM obs
    )
    SELECT lang, source, o,
           CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
           (CAST(o AS DOUBLE)
              - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(o AS DOUBLE)
              - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))
           / (CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE)) AS chi2_term
    FROM m
    """,
)
def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Chi-square contingency analysis of two categoricals (lang x
    # source): observed cell counts vs independence expectations, with
    # the per-cell (O-E)^2/E terms whose sum is the test statistic —
    # the feature-association profile a curation pipeline uses to spot
    # source/language confounds. One groupBy over the corpus; the
    # marginals come from windows OVER THE CELL TABLE (cardinality
    # |lang|x|source|, never the data), so the corpus is scanned once.
    # Counts stay exact BIGINTs; every double op is pinned to the same
    # order in the oracle. NOTE df.stat.crosstab exists but collects a
    # driver-sized pivot; this form stays distributed and composable.
    d = Catalog(spark, sf_dir).documents
    obs = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rt = F.sum("o").over(Window.partitionBy("lang"))
    ct = F.sum("o").over(Window.partitionBy("source"))
    n = F.sum("o").over(Window.partitionBy())
    m = obs.select(
        "lang",
        "source",
        "o",
        rt.alias("rt"),
        ct.alias("ct"),
        n.alias("n"),
    )
    expected = (F.col("rt") * F.col("ct")).cast("double") / F.col("n").cast(
        "double"
    )
    diff = F.col("o").cast("double") - expected
    return m.select(
        "lang",
        "source",
        "o",
        expected.alias("expected"),
        (diff * diff / expected).alias("chi2_term"),
    )


# --- S8: schema-evolution merged read ---------------------------------------


@query(
    "q_schema_evolution",
    oracle="""
    SELECT c_custkey, c_name, CAST(NULL AS BIGINT) AS cents
    FROM customer
    UNION ALL
    SELECT c_custkey, c_name,
           CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
    FROM customer
    """,
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Schema drift is the steady state of a long-lived 100 TB table:
    # old files lack columns newer files carry. The engine reads both
    # generations in ONE scan with mergeSchema=true — parquet footers
    # union into the widest schema, absent columns surface as NULL —
    # instead of per-generation reads + unionByName (which re-plans per
    # generation and defeats partition-level listing). The oracle is
    # the explicit NULL-padded union of the same two projections.
    import os
    import tempfile

    c = Catalog(spark, sf_dir).customer
    root = tempfile.mkdtemp(prefix="phe_evo_")
    v1, v2 = os.path.join(root, "gen=1"), os.path.join(root, "gen=2")
    c.select("c_custkey", "c_name").write.mode("overwrite").parquet(v1)
    c.select(
        "c_custkey",
        "c_name",
        F.floor(F.col("c_acctbal") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    ).write.mode("overwrite").parquet(v2)
    return spark.read.option("mergeSchema", "true").parquet(v1, v2)


# --- L28: BPE tokenizer training (word counts -> merge table) ---------------


@query("q_bpe_train", oracle=None)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BPE merge learning over the documents corpus (llm/bpe.py): the
    # corpus-sized word count runs distributed; the merge loop runs on
    # the vocab-sized aggregate, as every production trainer does.
    # Deterministic (frequency then lexicographic tie-break) but not
    # SQL-expressible -> rows-only; exactness is pinned by
    # tests/test_bpe.py against a hand-derived reference corpus.
    from ..llm.bpe import bpe_train, merge_table, word_counts

    d = Catalog(spark, sf_dir).documents
    wc = word_counts(d, min_count=2)
    return merge_table(spark, bpe_train(wc, n_merges=200))


# --- AN6: time-weighted average over irregular event series -----------------


@query(
    "q_twap",
    oracle="""
    WITH s AS (
        SELECT event_type,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
               epoch_us(CAST(ts AS TIMESTAMP)) AS t,
               lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                   PARTITION BY event_type
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS t_next
        FROM events
    ), w AS (
        SELECT event_type, cents, (t_next - t) // 1000000 AS dur_s
        FROM s WHERE t_next IS NOT NULL
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(CAST(sum(CAST(cents * dur_s AS DECIMAL(38,0)))
                     AS DOUBLE)
                / CAST(CAST(sum(CAST(dur_s AS DECIMAL(38,0)))
                            AS DOUBLE) AS DOUBLE) AS DOUBLE) AS twap
    FROM w GROUP BY event_type
    """,
)
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Time-weighted average price/value over an IRREGULARLY sampled
    # series: each observation holds until the next one of the same key,
    # so its weight is that interval's duration. Plain avg() is wrong on
    # irregular series (burst periods dominate); TWAP is the standard
    # fix (finance VWAP/TWAP family, monitoring rollups). Per-key lead()
    # window + one exact-integer aggregation: value cents x whole-second
    # durations accumulate in DECIMAL(38,0) (exact at any row count —
    # int64 would saturate near 1e11 rows), one pinned double division
    # at the end. Durations floor to whole seconds via exact integer
    # division on both engines.
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    # the catalog's events.ts is TIMESTAMP_NTZ; the session is pinned
    # UTC, so the cast to (ltz) TIMESTAMP for unix_micros is lossless
    # and matches DuckDB's epoch_us
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    s = (
        e.select(
            "event_type",
            F.floor(F.col("value") * 100.0 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
            t.alias("t"),
            F.lead(t).over(w).alias("t_next"),
        )
        .filter(F.col("t_next").isNotNull())
        .withColumn(
            "dur_s",
            (
                (F.col("t_next") - F.col("t"))
                - F.pmod(F.col("t_next") - F.col("t"), F.lit(1_000_000))
            )
            / F.lit(1_000_000),
        )
        .withColumn("dur_s", F.col("dur_s").cast("long"))
    )
    return s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        (
            F.sum((F.col("cents") * F.col("dur_s")).cast("decimal(38,0)"))
            .cast("double")
            / F.sum(F.col("dur_s").cast("decimal(38,0)")).cast("double")
        )
        .cast("double")
        .alias("twap"),
    )


# --- AN3: event transition matrix (first-order Markov counts) ---------------


@query(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
        FROM events
    ), t AS (
        SELECT prev_type, event_type AS next_type,
               CAST(count(*) AS BIGINT) AS transitions
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT prev_type, next_type, transitions,
           CAST(transitions AS DOUBLE)
               / CAST(sum(transitions) OVER (PARTITION BY prev_type)
                      AS DOUBLE) AS prob
    FROM t
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # First-order Markov transition matrix over per-user event
    # sequences: lag() within each user's timeline, then count (prev,
    # next) pairs and normalize per source state. The lag window and
    # the later per-prev_type window both hash on small keys; the heavy
    # shuffle is the per-user window, keyed on user_id (high
    # cardinality, no skew). The oracle orders by CAST(ts AS TIMESTAMP)
    # — DuckDB truncates the stored nanos to Spark's microsecond
    # precision, keeping tie-break (event_id) behavior identical.
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("transitions"))
    )
    wp = Window.partitionBy("prev_type")
    return t.select(
        "prev_type",
        "next_type",
        "transitions",
        (
            F.col("transitions").cast("double")
            / F.sum("transitions").over(wp).cast("double")
        ).alias("prob"),
    )


# --- AN10: cohort retention matrix -------------------------------------------


@query(
    "q_retention_cohort",
    oracle="""
    WITH weekly AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)
                   AS week
        FROM events
    ), c AS (
        SELECT user_id, week,
               min(week) OVER (PARTITION BY user_id) AS cohort_week
        FROM weekly
    ), a AS (
        SELECT cohort_week,
               CAST(date_diff('day', cohort_week, week) // 7 AS BIGINT)
                   AS week_offset,
               CAST(count(*) AS BIGINT) AS active_users
        FROM c
        GROUP BY 1, 2
    )
    SELECT cohort_week, week_offset, active_users,
           max(CASE WHEN week_offset = 0 THEN active_users END)
               OVER (PARTITION BY cohort_week) AS cohort_size,
           CAST(active_users AS DOUBLE)
               / CAST(max(CASE WHEN week_offset = 0 THEN active_users END)
                      OVER (PARTITION BY cohort_week) AS DOUBLE)
               AS retention
    FROM a
    """,
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Weekly cohort retention matrix (the product-analytics staple the
    # reference's row loops could never express): cohort = the Monday of
    # a user's FIRST active week; cell (cohort, k) = how many of that
    # cohort were active k weeks later. Scale shape, stage by stage:
    # (1) distinct (user_id, week) — ONE corpus-sized shuffle on a
    #     high-cardinality composite key, map-side combined;
    # (2) cohort_week as a min() window over user_id — a second shuffle
    #     keyed on user_id (high cardinality, no skew), NOT a
    #     groupBy+self-join (which would shuffle the same rows twice);
    # (3) the (cohort, offset) rollup counts plain rows — the distinct
    #     in (1) already made (user, week) unique, so count(*) IS
    #     count(DISTINCT user) with no second distinct shuffle;
    # (4) cohort_size via a window over the AGGREGATED matrix
    #     (weeks x offsets rows, data-size-independent) — never a
    #     join back to user-level data. Offset 0 always exists (every
    #     user's first week is in `weekly`), so cohort_size is never
    #     NULL. All counts are exact BIGINTs; the single retention
    #     division is one pinned double op.
    # Body shared with the unit tests via operators/analytics.py
    # (round-5 ADVICE: one implementation, two callers).
    from ..operators.analytics import weekly_retention

    e = Catalog(spark, sf_dir).events
    return weekly_retention(e)


# --- AN11: LOCF gap-fill over a generated time spine -------------------------


@query(
    "q_fill_locf",
    oracle="""
    WITH ranked AS (
        SELECT event_type,
               date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
               value,
               row_number() OVER (
                   PARTITION BY event_type,
                                date_trunc('hour', CAST(ts AS TIMESTAMP))
                   ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
               ) AS rn
        FROM events
    ), hourly AS (
        SELECT event_type, hour, value AS v FROM ranked WHERE rn = 1
    ), bounds AS (
        SELECT event_type, min(hour) AS h0, max(hour) AS h1
        FROM hourly GROUP BY 1
    ), spine AS (
        SELECT event_type,
               unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        FROM bounds
    )
    SELECT s.event_type, s.hour,
           last_value(h.v IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_locf,
           h.v IS NOT NULL AS observed
    FROM spine s
    LEFT JOIN hourly h
      ON s.event_type = h.event_type AND s.hour = h.hour
    """,
)
def q_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gap-fill + last-observation-carried-forward: densify each
    # event_type's hourly series over a generated spine (G1's
    # sequence+explode shape) and forward-fill missing hours with the
    # last observed value. The per-(type, hour) "last observation" is a
    # max_by over a struct order key — a DeclarativeAggregate with
    # map-side partial merge, ONE corpus shuffle on a high-cardinality
    # composite key (the oracle's row_number pick is the same total
    # order spelled for DuckDB). The LOCF window partitions by
    # event_type — few partitions, but over the AGGREGATED spine
    # (|types| x |hours| rows, data-size-independent), so the
    # single-task-per-type concern that rules out low-cardinality
    # windows on raw data does not apply. Values are COPIED doubles
    # (no arithmetic), so the hash is exact.
    # Body shared with the unit tests via operators/analytics.py.
    from ..operators.analytics import locf_fill

    e = Catalog(spark, sf_dir).events
    return locf_fill(e)


# --- AN12: linear interpolation over a generated time spine ------------------


@query(
    "q_fill_interpolate",
    oracle="""
    WITH ranked AS (
        SELECT event_type,
               date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
               value,
               row_number() OVER (
                   PARTITION BY event_type,
                                date_trunc('hour', CAST(ts AS TIMESTAMP))
                   ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
               ) AS rn
        FROM events
    ), hourly AS (
        SELECT event_type, hour, value AS v FROM ranked WHERE rn = 1
    ), bounds AS (
        SELECT event_type, min(hour) AS h0, max(hour) AS h1
        FROM hourly GROUP BY 1
    ), spine AS (
        SELECT event_type,
               unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        FROM bounds
    ), joined AS (
        SELECT s.event_type, s.hour, h.v
        FROM spine s
        LEFT JOIN hourly h
          ON s.event_type = h.event_type AND s.hour = h.hour
    ), anchored AS (
        SELECT event_type, hour, v,
               last_value(v IGNORE NULLS) OVER w_prev AS prev_v,
               last_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
                   OVER w_prev AS prev_h,
               first_value(v IGNORE NULLS) OVER w_next AS next_v,
               first_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
                   OVER w_next AS next_h
        FROM joined
        WINDOW
            w_prev AS (PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            w_next AS (PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, hour,
           CASE WHEN v IS NOT NULL THEN v
                ELSE prev_v + (next_v - prev_v)
                     * (CAST(date_diff('second', prev_h, hour) AS DOUBLE)
                        / CAST(date_diff('second', prev_h, next_h) AS DOUBLE))
           END AS value_interp,
           v IS NOT NULL AS observed
    FROM anchored
    """,
)
def q_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Linear interpolation over the same generated spine as q_fill_locf:
    # unobserved hours blend the surrounding observations by time
    # fraction instead of holding the last one. Spine bounds are the
    # per-type min/max OBSERVED hours, so every gap row has both a
    # preceding and a following anchor — the blend never divides by
    # zero and needs no edge CASE. The four anchor columns are two
    # forward and two backward ignorenulls window passes over the SAME
    # (event_type, hour) sort — Catalyst plans them in two Window
    # operators sharing one Exchange+Sort, all over the aggregated
    # spine (|types| x |hours| rows, data-size-independent). The blend
    # arithmetic is spelled identically on both engines: one integer
    # second-diff ratio, one multiply, one add.
    # Body shared with the unit tests via operators/analytics.py.
    from ..operators.analytics import interpolate_fill

    e = Catalog(spark, sf_dir).events
    return interpolate_fill(e)


# --- AN13: association rules (market-basket support/confidence/lift) ---------


@query(
    "q_basket_rules",
    oracle="""
    WITH baskets AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), nb AS (
        SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n FROM baskets
    ), items AS (
        SELECT brand, CAST(count(*) AS BIGINT) AS c FROM baskets
        GROUP BY brand
    ), pair AS (
        SELECT a.brand AS brand_a, b.brand AS brand_b,
               CAST(count(*) AS BIGINT) AS support_n
        FROM baskets a JOIN baskets b
          ON a.okey = b.okey AND a.brand < b.brand
        GROUP BY 1, 2
        HAVING count(*) >= 10
    )
    SELECT brand_a, brand_b, support_n,
           ia.c AS count_a, ib.c AS count_b,
           CAST(support_n AS DOUBLE) / ia.c AS confidence,
           CAST(support_n AS DOUBLE) * nb.n / (CAST(ia.c AS DOUBLE) * ib.c)
               AS lift
    FROM pair
    JOIN items ia ON brand_a = ia.brand
    JOIN items ib ON brand_b = ib.brand
    CROSS JOIN nb
    """,
)
def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Association-rule mining (the market-basket classic): which brand
    # pairs co-occur in an order more than independence predicts.
    # support_n = co-occurring baskets, confidence = P(b|a), lift =
    # P(a,b)/(P(a)P(b)). Scale shape: the brand dim broadcasts onto the
    # lineitem scan; distinct (order, brand) is one corpus shuffle on a
    # high-cardinality composite key; the pair fact self-joins ON THE
    # BASKET KEY (co-partitioned — the quadratic term is bounded by
    # items-per-basket², here <= |brands|², never corpus²); pair and
    # item counts map-side combine to brand²-sized tables, and every
    # ratio derives from exact BIGINTs, cast to double BEFORE the
    # cross-multiply so the int64 product-overflow trap (the PMI
    # lesson) can't arise at any corpus size.
    # Body shared with the unit tests via operators/analytics.py.
    from ..operators.analytics import basket_rules

    c = Catalog(spark, sf_dir)
    li, part = c.lineitem, c.part
    baskets = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li.l_partkey == part.p_partkey,
        )
        .select(
            F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand")
        )
        .distinct()
    )
    return basket_rules(baskets, min_support=10)


# --- AN14: one-pass pairwise correlation matrix ------------------------------


@query(
    "q_corr_matrix",
    oracle="""
    WITH m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(q) AS BIGINT) AS sq,
               CAST(sum(p) AS BIGINT) AS sp,
               CAST(sum(d) AS BIGINT) AS sd,
               CAST(sum(q * q) AS BIGINT) AS sqq,
               CAST(sum(p * p) AS BIGINT) AS spp,
               CAST(sum(d * d) AS BIGINT) AS sdd,
               CAST(sum(q * p) AS BIGINT) AS sqp,
               CAST(sum(q * d) AS BIGINT) AS sqd,
               CAST(sum(p * d) AS BIGINT) AS spd
        FROM (
            SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
                   CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS p,
                   CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS d
            FROM lineitem
        )
    )
    , der AS (
        SELECT n,
               CAST(sq AS DOUBLE) / n AS mq,
               CAST(sp AS DOUBLE) / n AS mp,
               CAST(sd AS DOUBLE) / n AS md,
               CAST(sqq AS DOUBLE) / n AS eqq,
               CAST(spp AS DOUBLE) / n AS epp,
               CAST(sdd AS DOUBLE) / n AS edd,
               CAST(sqp AS DOUBLE) / n AS eqp,
               CAST(sqd AS DOUBLE) / n AS eqd,
               CAST(spd AS DOUBLE) / n AS epd
        FROM m
    )
    SELECT n,
           (eqp - mq * mp)
               / (sqrt(eqq - mq * mq) * sqrt(epp - mp * mp))
               AS corr_qty_price,
           (eqd - mq * md)
               / (sqrt(eqq - mq * mq) * sqrt(edd - md * md))
               AS corr_qty_disc,
           (epd - mp * md)
               / (sqrt(epp - mp * mp) * sqrt(edd - md * md))
               AS corr_price_disc
    FROM der
    """,
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pairwise Pearson correlations of k columns in ONE aggregation pass
    # (the data-profiling "corr matrix in one scan"): all k sums, k
    # squares, and k·(k−1)/2 cross-products accumulate as exact BIGINTs
    # in a single map-side-combined agg — one scan, one 1-row shuffle —
    # and every correlation derives from the same exact integers in
    # pinned double expressions (built-in corr() merges floats in
    # nondeterministic partial order; A10's argument, extended to the
    # full matrix). Quantization bounds as q_agg_stats: qty <= 50,
    # price in whole units <= ~1e5, discount in hundredths <= 10 —
    # the largest SUM (spp ≈ 1e10 per row) is exact to ~1e8 rows;
    # lift the sums to DECIMAL(38,0) beyond that.
    # Body shared with the unit tests via operators/analytics.py; the
    # generic helper emits corr_<a>_<b> per (i<j) pair in input order,
    # so (qty, price, disc) yields exactly the oracle's three columns.
    # floor(x + 0.5) on BOTH engines for every column: Spark's
    # cast('long') truncates toward zero while DuckDB's CAST AS BIGINT
    # rounds to nearest, so a bare cast is only engine-portable for
    # integer-valued doubles — round explicitly instead.
    from ..operators.analytics import corr_matrix_exact

    li = Catalog(spark, sf_dir).lineitem
    return corr_matrix_exact(
        li,
        [
            ("qty", F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")),
            (
                "price",
                F.floor(F.col("l_extendedprice") + F.lit(0.5)).cast("long"),
            ),
            (
                "disc",
                F.floor(F.col("l_discount") * 100.0 + F.lit(0.5)).cast(
                    "long"
                ),
            ),
        ],
    )


# --- AN16: PSI drift between two corpus versions ----------------------------


@query(
    "q_drift_psi",
    oracle="""
    WITH src AS (
        SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents,
               l_orderkey % 2 AS side
        FROM lineitem
    ), binned AS (
        SELECT least(greatest(cents, 0), 7500000) // 500000 AS bin, side
        FROM src
    ),
    a AS (SELECT bin, CAST(count(*) AS BIGINT) AS ref_n
          FROM binned WHERE side = 0 GROUP BY bin),
    b AS (SELECT bin, CAST(count(*) AS BIGINT) AS cur_n
          FROM binned WHERE side = 1 GROUP BY bin),
    na AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM binned WHERE side = 0),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM binned WHERE side = 1),
    spine AS (SELECT unnest(range(0, 16)) AS bin)
    SELECT CAST(spine.bin AS BIGINT) AS bin,
           COALESCE(ref_n, 0) AS ref_n,
           COALESCE(cur_n, 0) AS cur_n,
           CAST(floor(
               (CAST(COALESCE(ref_n, 0) + 1 AS DOUBLE) / (na.nt + 16)
                - CAST(COALESCE(cur_n, 0) + 1 AS DOUBLE) / (nb.nt + 16))
               * ln(CAST((COALESCE(ref_n, 0) + 1) * (nb.nt + 16) AS DOUBLE)
                    / CAST((COALESCE(cur_n, 0) + 1) * (na.nt + 16)
                           AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT) AS psi_micro
    FROM spine LEFT JOIN a ON a.bin = spine.bin
               LEFT JOIN b ON b.bin = spine.bin
               CROSS JOIN na CROSS JOIN nb
    """,
)
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AN16: Population Stability Index between two corpus "versions"
    # (even- vs odd-orderkey halves of lineitem — a deterministic stand-
    # in for last-week-vs-this-week), the standard data-drift monitor a
    # 100 TB ingest pipeline runs per feature per refresh. Per-bin PSI
    # terms are micro-unit-quantized exact BIGINTs (the perplexity
    # pattern), so the row set value-hashes and a consumer's total PSI
    # is an order-independent integer sum. operators/analytics.psi_drift.
    from ..functions.core import fixed_cents
    from ..operators.analytics import psi_drift

    li = Catalog(spark, sf_dir).lineitem.select(
        fixed_cents(F.col("l_extendedprice")).alias("cents"),
        F.pmod(F.col("l_orderkey"), F.lit(2)).alias("side"),
    )
    return psi_drift(
        li.filter(F.col("side") == 0),
        li.filter(F.col("side") == 1),
        "cents",
        bin_width=500_000,
        n_bins=16,
    )


# --- AN17: rolling-window distinct users (trailing-7-day WAU) ---------------


@query(
    "q_rolling_distinct",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
        FROM events
    ), mx AS (SELECT max(day) AS mxd FROM pairs)
    SELECT day + CAST(i AS INTEGER) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS wau,
           CAST(count(*) AS BIGINT) AS active_pairs
    FROM pairs, unnest(range(0, 7)) AS t(i), mx
    WHERE day + CAST(i AS INTEGER) <= mx.mxd
    GROUP BY 1
    """,
)
def q_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AN17: trailing-7-day distinct active users per day (rolling WAU)
    # — the sliding-window COUNT DISTINCT that a naive per-day self-join
    # makes O(days x corpus) and a window-frame count_distinct simply
    # cannot express (Spark forbids DISTINCT aggregates over frames).
    # Shape: distinct (day, user) pairs (one corpus shuffle, heavy
    # map-side combine), then each pair is EXPLODED to the <= 7 window
    # end-days it participates in (day+0 .. day+6) and re-aggregated —
    # turning the range join into an equi groupBy whose fan-out is the
    # window length, independent of corpus size. Identical formulation
    # on both engines, bounded by the max day broadcast.
    e = Catalog(spark, sf_dir).events
    pairs = e.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    mx = pairs.agg(F.max("day").alias("mxd"))
    return (
        pairs.select(
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
            "day",
            "user_id",
        )
        .select(F.date_add(F.col("day"), F.col("i")).alias("day"), "user_id")
        .crossJoin(F.broadcast(mx))
        .filter(F.col("day") <= F.col("mxd"))
        .groupBy("day")
        .agg(
            F.count_distinct("user_id").alias("wau"),
            F.count(F.lit(1)).alias("active_pairs"),
        )
    )


# --- AN18: closed-form OLS per group (exact integer moments) ----------------


@query(
    "q_regression_ols",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sx,
               CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                   AS HUGEINT) AS sy,
               CAST(sum(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sxx,
               CAST(sum(CAST(l_quantity AS BIGINT)
                        * CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                   AS HUGEINT) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                      / CAST(n * sxx - sx * sx AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT) AS slope_micro,
           CAST(floor((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                       - CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE)
                         * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                      * 1000000.0 + 0.5) AS BIGINT) AS intercept_micro
    FROM m
    """,
)
def q_regression_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AN18: per-group closed-form least squares (price-cents vs
    # quantity) from the five exact integer moments — the one-pass,
    # shuffle-of-6-rows regression a 100 TB feature pipeline runs
    # instead of MLlib's iterative solver. Moments accumulate in
    # DECIMAL(38,0) / HUGEINT (n·Sxy overflows int64 beyond ~sf0.1);
    # the only inexact steps are the two pinned double divisions and
    # one multiply-subtract, spelled identically in the oracle, then
    # micro-quantized. (The A10 moments query gates stddev/corr; this
    # gates the fitted-line form feature normalization wants.)
    li = Catalog(spark, sf_dir).lineitem.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    dec = "decimal(38,0)"
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast(dec).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    slope = num / den
    mean_y = F.col("sy").cast("double") / F.col("n").cast("double")
    mean_x = F.col("sx").cast("double") / F.col("n").cast("double")
    intercept = mean_y - slope * mean_x
    return m.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.floor(slope * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("slope_micro"),
        F.floor(intercept * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("intercept_micro"),
    )


# --- A5b: re-aggregatable distinct sketches (HLL build -> merge -> read) ----


@query("q_agg_hll_union")  # rows-only BY DESIGN: HLL register layout is
# engine-internal (Apache DataSketches); no external SQL replays the
# estimate bit-for-bit. The EXACT twin ships in the same rows (exact
# distinct via the same rollup) and the 5% envelope is asserted inline —
# A14's bitmap query is the fully-oracled exact re-aggregatable form.
def q_agg_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A5b: the sketch lifecycle a 100 TB rollup pipeline runs — build
    # per-nation HLL sketches of the customer id set ONCE (one corpus
    # pass), then MERGE sketches to the region grain without touching
    # the corpus again (hll_union_agg over 25 nation rows). That
    # re-aggregatability is what approx_count_distinct (A5) lacks: its
    # partial state dies inside one query, while sketch columns persist
    # in rollup tables and merge across days/partitions/grains.
    cat = Catalog(spark, sf_dir)
    c = cat.customer.select("c_custkey", "c_nationkey")
    n = cat.nation.select("n_nationkey", "n_regionkey")
    per_nation = (
        c.groupBy("c_nationkey")
        .agg(
            F.hll_sketch_agg("c_custkey").alias("sk"),
            F.count_distinct("c_custkey").alias("exact_n"),
        )
        .join(
            F.broadcast(n),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    per_region = per_nation.groupBy("n_regionkey").agg(
        F.hll_union_agg("sk").alias("sk"),
        F.sum("exact_n").alias("exact_distinct"),  # custkeys are disjoint
    )
    out = per_region.select(
        F.col("n_regionkey").cast("long").alias("region"),
        F.hll_sketch_estimate("sk").alias("approx_distinct"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
    )
    rows = out.collect()
    assert rows, "empty hll rollup"
    for r in rows:
        rel = abs(r.approx_distinct - r.exact_distinct) / max(
            r.exact_distinct, 1
        )
        assert rel < 0.05, (r.region, r.approx_distinct, r.exact_distinct)
    return out


# --- A14b: built-in bitmap exact re-aggregatable distinct -------------------


@query(
    "q_distinct_bitmap_builtin",
    oracle="""
    SELECT CAST(n_regionkey AS BIGINT) AS region,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1
    """,
)
def q_distinct_bitmap_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A14b: the JVM-native twin of A14's hand-built bitmap pages —
    # Spark 4's bitmap_* family gives EXACT re-aggregatable distinct
    # counting entirely inside codegen: per (nation, 32k-value bucket)
    # build a bitmap of positions (bitmap_construct_agg), OR-merge the
    # bitmaps up to the region grain with NO re-scan (bitmap_or_agg),
    # popcount (bitmap_count) and sum across buckets. Same lifecycle as
    # the HLL rollup (A5b) but exact — and unlike count(DISTINCT), the
    # intermediate (grain, bucket, bitmap) table is a persistable
    # rollup artifact that merges across days/partitions. The oracle is
    # the plain exact distinct — bitmaps must not lose or double-count
    # a single key.
    cat = Catalog(spark, sf_dir)
    c = cat.customer.select("c_custkey", "c_nationkey")
    n = cat.nation.select("n_nationkey", "n_regionkey")
    per_nation_bucket = c.groupBy(
        "c_nationkey",
        F.bitmap_bucket_number(F.col("c_custkey")).alias("bucket"),
    ).agg(
        F.bitmap_construct_agg(
            F.bitmap_bit_position(F.col("c_custkey"))
        ).alias("bm")
    )
    per_region_bucket = (
        per_nation_bucket.join(
            F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("n_regionkey", "bucket")
        .agg(F.bitmap_or_agg(F.col("bm")).alias("bm"))
    )
    return per_region_bucket.groupBy(
        F.col("n_regionkey").cast("long").alias("region")
    ).agg(F.sum(F.bitmap_count(F.col("bm"))).cast("long").alias("n_distinct"))


# --- GR3: multi-source BFS shortest hops ------------------------------------


def _bfs_oracle(max_hops: int) -> str:
    # frontier expansion unrolled into CTEs (same policy as the
    # pagerank oracle: DuckDB has no mutable state, each BFS level is
    # one join + anti-filter CTE pair); UNION (not ALL) in `e`
    # symmetrizes + dedups the edge list exactly as the engine's
    # union/distinct does.
    ctes = [
        """e0 AS (
        SELECT a.c_custkey AS u, b.c_custkey AS v
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey
         AND a.c_custkey < b.c_custkey
         AND b.c_custkey - a.c_custkey <= 100
    )""",
        "e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0)",
        """d0 AS (
        SELECT CAST(min(c_custkey) AS BIGINT) AS x, 0 AS hops
        FROM customer GROUP BY c_nationkey
    )""",
        "f0 AS (SELECT x FROM d0)",
    ]
    for h in range(1, max_hops + 1):
        ctes.append(
            f"""f{h} AS (
        SELECT DISTINCT e.v AS x
        FROM e JOIN f{h - 1} f ON e.u = f.x
        WHERE e.v NOT IN (SELECT x FROM d{h - 1})
    )"""
        )
        ctes.append(
            f"d{h} AS (SELECT x, hops FROM d{h - 1} "
            f"UNION ALL SELECT x, {h} FROM f{h})"
        )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT x AS vertex, CAST(hops AS INT) AS hops"
        f" FROM d{max_hops}"
    )


_BFS_HOPS = 3


@query("q_graph_bfs", oracle=_bfs_oracle(_BFS_HOPS))
def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Multi-source BFS over the undirected banded same-nation customer
    # graph (the q_graph_pagerank fixture, symmetrized): sources are
    # each nation's minimum custkey, output is every vertex within 3
    # hops with its exact minimum hop count. Scale shape: per level one
    # frontier⋈edges equi-join + one anti-join against the visited set
    # — frontier-sized probes, never an all-vertex scan
    # (operators/graph.py bfs_hops).
    from ..operators.graph import banded_key_edges, bfs_hops

    c = Catalog(spark, sf_dir).customer.select("c_custkey", "c_nationkey")
    edges = banded_key_edges(c, "c_custkey", "c_nationkey", band=100)
    sources = c.groupBy("c_nationkey").agg(
        F.min("c_custkey").cast("long").alias("x")
    ).select("x")
    return bfs_hops(edges, sources, max_hops=_BFS_HOPS, undirected=True)


# --- GR4: k-core decomposition (iterative peeling) --------------------------


def _kcore_oracle(k: int, rounds: int) -> str:
    # peeling rounds unrolled into CTEs (the pagerank/BFS oracle
    # policy); UNION (not ALL) in `e0` symmetrizes + dedups exactly as
    # the engine does.
    ctes = [
        """eb AS (
        SELECT a.c_custkey AS u, b.c_custkey AS v
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey
         AND a.c_custkey < b.c_custkey
         AND b.c_custkey - a.c_custkey <= 100
    )""",
        "e0 AS (SELECT u, v FROM eb UNION SELECT v, u FROM eb)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""k{r} AS (
        SELECT u FROM e{r - 1} GROUP BY u HAVING count(*) >= {k}
    )"""
        )
        ctes.append(
            f"""e{r} AS (
        SELECT e.u, e.v FROM e{r - 1} e
        JOIN k{r} a ON e.u = a.u JOIN k{r} b ON e.v = b.u
    )"""
        )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT u AS vertex, CAST(count(*) AS BIGINT) AS deg"
        f" FROM e{rounds} GROUP BY u"
    )


_KCORE_K, _KCORE_ROUNDS = 3, 4


@query("q_graph_kcore", oracle=_kcore_oracle(_KCORE_K, _KCORE_ROUNDS))
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GR4: 3-core of the banded same-nation customer graph by 4
    # peeling rounds (operators/graph.py k_core_peel) — per round one
    # map-side-combined degree count + two vertex-keyed semi-joins
    # over the SHRINKING live edge set; oracle is the unrolled
    # peel-round replay.
    from ..operators.graph import banded_key_edges, k_core_peel

    c = Catalog(spark, sf_dir).customer.select("c_custkey", "c_nationkey")
    edges = banded_key_edges(c, "c_custkey", "c_nationkey", band=100)
    return k_core_peel(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS)


# --- AN19: rolling z-score anomaly detection (exact integer test) -----------

_ANOMALY_ORACLE = """
WITH c AS (
    SELECT event_id, user_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           ts
    FROM events
), stats AS (
    SELECT event_id, user_id, cents,
           CAST(count(*) OVER w AS BIGINT) AS n,
           CAST(sum(cents) OVER w AS BIGINT) AS s,
           CAST(sum(cents * cents) OVER w AS BIGINT) AS ss
    FROM c
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, cents, n
FROM stats
WHERE n >= 4
  AND n * ss - s * s > 0
  AND (cents * n - s) * (cents * n - s) * (n - 1)
      > 9 * n * (n * ss - s * s)
"""


@query("q_anomaly_zscore", oracle=_ANOMALY_ORACLE)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AN19: streaming-shaped anomaly detection — flag any event whose
    # value sits more than 3 sample standard deviations from the mean
    # of its user's previous (up to) 8 events. The test is evaluated
    # in EXACT integer arithmetic on cents (cross-multiplied:
    # (c·n − s)²·(n−1) > 9·n·(n·ss − s²)), so no float sqrt/division
    # order can drift the flag set — the monitoring twin of the MAD
    # outlier operator (AN12), windowed instead of grouped. Scale: one
    # user-keyed shuffle shared by the three frame aggregates; the
    # degenerate zero-variance window (all prior values equal) is
    # excluded explicitly, matching the z-score's undefined case.
    from ..functions.core import fixed_cents

    ev = Catalog(spark, sf_dir).events
    c = ev.select(
        "event_id",
        "user_id",
        fixed_cents(F.col("value")).alias("cents"),
        "ts",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-8, -1)
    )
    stats = c.select(
        "event_id",
        "user_id",
        "cents",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("cents").over(w).cast("long").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).over(w).cast("long").alias("ss"),
    )
    n, s, ss, cc = F.col("n"), F.col("s"), F.col("ss"), F.col("cents")
    return stats.filter(
        (n >= 4)
        & (n * ss - s * s > 0)
        & (
            (cc * n - s) * (cc * n - s) * (n - 1)
            > F.lit(9) * n * (n * ss - s * s)
        )
    ).select("event_id", "user_id", "cents", "n")


# --- AN20: Mann-Kendall trend test (exact integer S statistic) --------------

_MANN_KENDALL_ORACLE = """
WITH c AS (
    SELECT user_id, ts, event_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
), win AS (
    SELECT user_id, ts, event_id, cents FROM c WHERE rn <= 20
), pairs AS (
    SELECT a.user_id,
           CASE WHEN b.cents > a.cents THEN 1
                WHEN b.cents < a.cents THEN -1 ELSE 0 END AS sgn
    FROM win a JOIN win b
      ON a.user_id = b.user_id
     AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
)
SELECT user_id,
       CAST(sum(sgn) AS BIGINT) AS s_stat,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CASE WHEN sum(sgn) * 10 > count(*) THEN 'up'
            WHEN sum(sgn) * 10 < -count(*) THEN 'down'
            ELSE 'flat' END AS trend
FROM pairs
GROUP BY user_id
"""


@query("q_trend_mann_kendall", oracle=_MANN_KENDALL_ORACLE)
def q_trend_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AN20: Mann-Kendall monotone-trend detection per user — S =
    # Σ_{i<j} sign(v_j − v_i) over each user's LAST 20 events (the
    # bounded-window production shape: an unbounded per-group pair
    # join is quadratic in group size, so the window cap is what
    # makes the operator scale — ≤190 pairs per user regardless of
    # history length). All-integer: sign comparisons on exact cents,
    # trend classed by |S| > n_pairs/10 via cross-multiplication (no
    # float tau). Scale: one user-keyed window shuffle to cap the
    # history, then a user-keyed self-join whose output is bounded by
    # the cap — the nonparametric twin of the OLS slope (AN18).
    from ..functions.core import fixed_cents

    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    win = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            fixed_cents(F.col("value")).alias("cents"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 20)
        .drop("rn")
    )
    a, b = win.alias("a"), win.alias("b")
    earlier = (F.col("a.ts") < F.col("b.ts")) | (
        (F.col("a.ts") == F.col("b.ts"))
        & (F.col("a.event_id") < F.col("b.event_id"))
    )
    sgn = (
        F.when(F.col("b.cents") > F.col("a.cents"), 1)
        .when(F.col("b.cents") < F.col("a.cents"), -1)
        .otherwise(0)
    )
    pairs = a.join(
        b, (F.col("a.user_id") == F.col("b.user_id")) & earlier
    ).select(F.col("a.user_id").alias("user_id"), sgn.alias("sgn"))
    s, n = F.sum("sgn"), F.count(F.lit(1))
    return pairs.groupBy("user_id").agg(
        s.cast("long").alias("s_stat"),
        n.cast("long").alias("n_pairs"),
        F.when(s * 10 > n, "up")
        .when(s * 10 < -n, "down")
        .otherwise("flat")
        .alias("trend"),
    )
