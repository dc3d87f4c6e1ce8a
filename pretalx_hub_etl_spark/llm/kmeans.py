"""Exact-integer Lloyd k-means over embedding columns (L36).

MLlib's KMeans (``similarity.py:kmeans_centroids``) is the production
coarse-quantizer trainer, but its float arithmetic merges in partition
order — two runs on different partitionings can flip borderline
assignments, so it can only ever be rows-only/recall-checked.  This
operator is the DETERMINISTIC twin: components quantize once to
micro-unit BIGINTs, every distance and every centroid update is exact
integer arithmetic, ties break on the lowest centroid id — so the full
clustering replays bit-identically on any engine and any partitioning
(the PageRank argument, applied to clustering).  Use it when the
assignment itself must be reproducible/auditable (dataset curation
lineage, IVF list stability across rebuilds); use MLlib when you want
kmeans|| init and don't need determinism.

Execution shape (round-17 optimization): the centroid table is K×dim
integers — metadata-scale — so the Lloyd loop holds it on the DRIVER
and compiles each assignment into a scan-fused ``array_min`` argmin
over K literal distance expressions.  Per iteration that costs exactly
ONE Spark job (the (cluster, dim)-keyed map-side-combined mean
aggregation, K·dim result rows collected to fold the update); the
previous shape paid a centroid broadcast, an n×K cross join, a
vec_id-hashed EXCHANGE and a per-vector sort/window for every
assignment, plus checkpoint jobs to pin the loop depth.  The dataflow
the corpus sees is unchanged — one fused pass per iteration — and every
distance/mean is the same exact integer arithmetic, so assignments are
bit-identical (ties still break to the lowest centroid id:
``array_min`` on ``struct(d2, cid)`` orders by d2 then cid).

Negative components are handled by a constant OFFSET added at
quantization: distances are translation-invariant, and all-positive
integers make the floor-division mean identical across engines
(negative integer division truncates differently between conventions —
sidestepped entirely).

K ceiling of the literal-argmin shape (r17 ADVICE): every assignment
plan embeds K·dim long literals, so the DRIVER-side analysis/codegen
cost grows superlinearly with K·dim while execution stays scan-linear.
Measured (r18, Spark 4.1, dim=64): K·dim = 4k ≈ negligible, 16k ≈
5 s, 65k ≈ 35 s, 131k ≈ 85 s of added per-plan driver time — no
Janino/constant-pool failure up to 131k (codegen splits; the
interpreted path backstops), i.e. a soft cost cliff, not a crash.
Keep K·dim ≲ 16,384 per plan (K ≤ 256 at dim 64); past that, prefer a
broadcast-join assignment (join the corpus against a K-row centroid
table and take the window/row_number min — the pre-r17 shape) whose
plan size is O(1) in K. Under the SemDeDup K∝n contract the Lloyd
trainer here is for metadata-scale K; production coarse quantizers
with large K should train via ``similarity.kmeans_centroids`` (MLlib)
instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.partitioning import fan_out, local_rows

SCALE = 1_000_000
OFFSET = 10_000_000  # > SCALE * max|component|; keeps everything positive

#: driver-held centroids: [(cid, [component, ...]), ...] — K×dim ints
Centroids = list[tuple[int, list[int]]]


def _quantize(vec: Column) -> Column:
    # fail fast when a component breaches the positivity invariant
    # (|x| < OFFSET/SCALE): a negative quantized value would make
    # per-dim cluster sums negative, where DuckDB's integer division
    # truncates toward zero but the Spark floor-mean floors — a SILENT
    # 1-micro-unit centroid divergence. An explicit error beats that.
    lim = OFFSET / SCALE
    bad = F.exists(
        vec, lambda x: F.abs(x.cast("double")) >= F.lit(float(lim))
    )
    q = F.transform(
        vec,
        lambda x: (
            F.floor(x.cast("double") * SCALE + F.lit(0.5)).cast("long")
            + F.lit(OFFSET)
        ),
    )
    return F.when(
        bad,
        F.raise_error(
            F.lit(
                f"kmeans_exact: |component| >= {lim} breaks the "
                "positivity invariant; rescale or raise OFFSET"
            )
        ).cast("array<bigint>"),
    ).otherwise(q)


def _dist2(a: Column, b: Column) -> Column:
    # exact: diffs cancel the OFFSET; |diff| <= ~2*SCALE so the
    # 64-dim sum stays far inside int64
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _lit_vec(qc: list[int]) -> Column:
    return F.array(*[F.lit(int(v)) for v in qc]).cast("array<bigint>")


def _scored(q: Column, cents: Centroids) -> Column:
    """``array<struct<d2, cid>>`` of exact distances to every literal
    centroid.  ONE shared distance lambda over a literal
    array-of-centroid-arrays — K separate ``aggregate(zip_with(...))``
    subtrees made Catalyst analysis + Janino compilation the dominant
    per-iteration cost (each Lloyd iteration is a fresh plan with fresh
    literals, so nothing amortizes across iterations)."""
    carr = F.array(*[_lit_vec(qc) for _, qc in cents])
    cids = F.array(
        *[F.lit(int(cid)).cast("long") for cid, _ in cents]
    )
    return F.zip_with(
        carr,
        cids,
        lambda c, i: F.named_struct(
            F.lit("d2"), _dist2(q, c), F.lit("cid"), i
        ),
    )


def _nearest(q: Column, cents: Centroids) -> Column:
    """``struct(d2, cid)`` of the exact nearest literal centroid, ties
    to the lowest cid (``array_min`` orders structs field by field —
    exactly the old ``row_number() OVER (ORDER BY d2, cid) = 1``)."""
    return F.array_min(_scored(q, cents))


def _ranked(q: Column, cents: Centroids, n: int) -> Column:
    """The ``n`` nearest literal centroids as a sorted struct array —
    the probe-list form of :func:`_nearest` (d2 asc, cid asc)."""
    return F.slice(F.array_sort(_scored(q, cents)), 1, n)


def _init_centroids(q: DataFrame, k: int) -> Centroids:
    """The ``k`` lowest-``vec_id`` quantized vectors, cids 0..k-1."""
    rows = q.orderBy(F.col("vec_id").asc()).limit(k).collect()
    return [(i, list(r["q"])) for i, r in enumerate(rows)]


def _train(q: DataFrame, k: int, iterations: int) -> Centroids:
    """Lloyd loop over pre-quantized vectors -> final (cid, qc) list.

    One job per iteration: assign via the literal argmin (scan-fused),
    aggregate (cluster, dim) sums map-side, collect K·dim rows, fold
    the exact floor mean on the driver.  Empty clusters keep their
    previous centroid, as before.
    """
    cents = _init_centroids(q, k)
    if not cents:
        return cents
    dim = len(cents[0][1])
    for _ in range(iterations):
        # per-dim sums as STATIC GetArrayItem columns (one codegen'd
        # hash agg to K rows × dim columns) — never posexplode: a
        # generator multiplies the rows 64× and re-evaluates the argmin
        # grouping expression per exploded row (measured 15 s/iteration
        # vs <1 s for this form at sf0.1)
        per = (
            q.select(
                _nearest(F.col("q"), cents).getField("cid").alias("cluster"),
                "q",
            )
            .groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                *[
                    F.sum(F.col("q").getItem(d)).alias(f"s{d}")
                    for d in range(dim)
                ],
            )
        )
        sums = {
            r["cluster"]: (
                r["cnt"],
                [r[f"s{d}"] for d in range(dim)],
            )
            for r in per.collect()  # K rows — metadata-scale
        }
        # exact floor mean of POSITIVE ints: Python // == the engine's
        # (s - pmod(s, cnt)) / cnt form == DuckDB's s // cnt
        cents = [
            (
                cid,
                [s // by[0] for s in by[1]]
                if (by := sums.get(cid)) is not None
                else qc,
            )
            for cid, qc in cents
        ]
    return cents


def _quantized(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("vec_id"), _quantize(F.col(vec_col)).alias("q")
    )


def kmeans_exact(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iterations: int = 3,
) -> DataFrame:
    """Deterministic Lloyd k-means: ``(vec_id, cluster, dist2)``.

    Init: the ``k`` lowest-``id_col`` vectors (quantized), clusters
    0..k-1.  Assignment: exact integer squared distance, ties to the
    lowest cluster id.  Update: element-wise exact floor mean of the
    members (empty clusters keep their previous centroid).  ``d2``
    is the final exact integer distance in (micro-unit)² space.
    """
    wide = fan_out(df)
    q = _quantized(wide, vec_col, id_col)
    q = q.persist()  # scanned once per iteration
    cents = _train(q, k, iterations)
    q.unpersist()
    # final assignment: a single scan-fused projection (no join, no
    # exchange, no window) — CollapseProject keeps the struct argmin
    # evaluated once (it never duplicates non-cheap expressions)
    return (
        _quantized(wide, vec_col, id_col)
        .select("vec_id", _nearest(F.col("q"), cents).alias("__nc"))
        .select(
            "vec_id",
            F.col("__nc").getField("cid").alias("cluster"),
            F.col("__nc").getField("d2").alias("d2"),
        )
    )


def kmeans_centroid_table(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iterations: int = 3,
) -> DataFrame:
    """The final ``(cid, qc)`` centroid table of :func:`kmeans_exact` —
    for consumers that index against the centroids (IVF lists) rather
    than wanting per-vector assignments.  Same ``_train`` loop, one
    implementation."""
    q = _quantized(df, vec_col, id_col).persist()
    cents = _train(q, k, iterations)
    q.unpersist()
    spark = SparkSession.getActiveSession() or df.sparkSession
    return local_rows(
        spark,
        [(int(cid), [int(v) for v in qc]) for cid, qc in cents],
        "cid bigint, qc array<bigint>",
    )


def ivf_exact_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    n_centroids: int = 8,
    iterations: int = 3,
    n_probe: int = 2,
) -> DataFrame:
    """IVF ANN with a fully deterministic, engine-replayable pipeline:
    coarse quantizer = :func:`kmeans_exact` centroids (exact integers),
    corpus lists = exact-integer nearest-centroid assignment, probes =
    each query's ``n_probe`` nearest centroids by the SAME metric,
    rerank = fixed-point pinned-double cosine with (sim desc, id asc)
    ties.  Every stage replays in external SQL, so the RANKED result
    value-hashes — the witness for the float IVF paths
    (``similarity.py:ivf_cosine_topk`` and the materialized index).

    Scale shape identical to production IVF: centroids are literal
    K-row metadata compiled into the corpus/query scans (one fused
    pass each, no exchange), probe lists bound candidates to
    ~n_probe/K of the corpus, rerank joins vectors once per candidate.
    """
    from ..functions.core import fixed_point
    from .similarity import cosine

    wide = fan_out(corpus)
    qc = _quantized(wide, vec_col, id_col).persist()
    cents = _train(qc, n_centroids, iterations)
    qc.unpersist()
    lists = _quantized(wide, vec_col, id_col).select(
        "vec_id",
        _nearest(F.col("q"), cents).getField("cid").alias("cluster"),
    )

    probes = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            _quantize(F.col(vec_col)).alias("q"),
        )
        .select(
            "query_id",
            F.explode(_ranked(F.col("q"), cents, n_probe)).alias("__p"),
        )
        .select("query_id", F.col("__p").getField("cid").alias("cluster"))
    )
    cand = lists.join(F.broadcast(probes), "cluster").select(
        "query_id", "vec_id"
    )
    vecs_c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cvec")
    )
    vecs_q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
    )
    scored = (
        cand.join(vecs_c, "vec_id")
        .join(F.broadcast(vecs_q), "query_id")
        .select(
            "query_id",
            "vec_id",
            fixed_point(cosine(F.col("__qvec"), F.col("__cvec")), 6).alias(
                "cos_sim"
            ),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(wr).cast("long")
    ).filter(F.col("rank") <= k)


def pq_exact_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    m: int = 8,
    k_codes: int = 16,
    iterations: int = 2,
    refine: int = 3,
) -> DataFrame:
    """Product-quantization ANN with every stage exact and replayable:
    per-subspace codebooks from the SAME deterministic Lloyd loop
    (sliced subvectors), integer code assignment, integer ADC
    lookup-sum, fixed-point cosine rerank of ``refine·k`` candidates —
    the witness for the float production PQ (``llm/pq.py``, numpy
    codebooks + Arrow encode).

    Scale shape mirrors production PQ, with the codebooks (m·K·dsub
    integers — metadata-scale) held on the driver: ALL m subspaces
    train in one fused Lloyd loop (one corpus-scan job per iteration,
    not one per subspace), encoding is a single projection computing
    every subspace's argmin code in one pass, the ADC distance table is
    a query-side projection, and only refine·k candidate ids per query
    touch the full vectors.  (Round-17: the previous shape paid per-
    subspace broadcast joins, windows and checkpoints — m·iterations
    extra shuffles for identical integer results.)
    """
    from ..functions.core import fixed_point
    from .similarity import _probe_dim, cosine

    dim = _probe_dim(corpus, vec_col)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m

    qc = _quantized(fan_out(corpus), vec_col, id_col).persist()

    # one Lloyd loop for ALL subspaces: the k_codes lowest-id vectors
    # seed every subspace's codebook (identical to training each
    # subspace separately — init and updates are per-subspace either
    # way), and each iteration runs ONE corpus scan whose per-dim sums
    # fold into every codebook on the driver.
    init_rows = qc.orderBy(F.col("vec_id").asc()).limit(k_codes).collect()
    books: dict[int, Centroids] = {
        j: [
            (c, list(r["q"])[j * dsub : (j + 1) * dsub])
            for c, r in enumerate(init_rows)
        ]
        for j in range(m)
    }

    def _sub(j: int) -> Column:
        return F.slice(F.col("q"), j * dsub + 1, dsub)

    for _ in range(iterations):
        new_books: dict[int, Centroids] = {}
        for j in range(m):
            # per-subspace update: one codegen'd hash agg to K rows ×
            # dsub static GetArrayItem sum columns (no posexplode — a
            # generator re-evaluates the argmin grouping expression per
            # exploded row, see _train)
            per = (
                qc.select(
                    _nearest(_sub(j), books[j])
                    .getField("cid")
                    .alias("code"),
                    "q",
                )
                .groupBy("code")
                .agg(
                    F.count(F.lit(1)).alias("cnt"),
                    *[
                        F.sum(
                            F.col("q").getItem(j * dsub + d)
                        ).alias(f"s{d}")
                        for d in range(dsub)
                    ],
                )
            )
            sums = {
                r["code"]: (r["cnt"], [r[f"s{d}"] for d in range(dsub)])
                for r in per.collect()  # K rows — metadata-scale
            }
            new_books[j] = [
                (
                    cid,
                    [s // by[0] for s in by[1]]
                    if (by := sums.get(cid)) is not None
                    else qv,
                )
                for cid, qv in books[j]
            ]
        books = new_books

    # integer code assignment: every subspace's argmin in ONE projection
    codes = qc.select(
        "vec_id",
        *[
            _nearest(_sub(j), books[j])
            .getField("cid")
            .alias(f"code_{j}")
            for j in range(m)
        ],
    )

    # ADC distance table: |queries|·m·k_codes rows from a query-side
    # projection (literal codebooks — no cross join, no checkpoint)
    qq = queries.select(
        F.col(query_id_col).alias("query_id"),
        _quantize(F.col(vec_col)).alias("q"),
    )
    def _dt_entry(jj: int):
        # single-arg lambda: a second parameter would make PySpark pass
        # the ARRAY INDEX into it (the (element, index) transform form)
        return lambda s: F.named_struct(
            F.lit("j"), F.lit(jj),
            F.lit("code"), s.getField("cid"),
            F.lit("d2"), s.getField("d2"),
        )

    dt = qq.select(
        "query_id",
        F.explode(
            F.concat(
                *[
                    F.transform(_scored(_sub(j), books[j]), _dt_entry(j))
                    for j in range(m)
                ]
            )
        ).alias("__e"),
    ).select("query_id", "__e.j", "__e.code", "__e.d2")
    qc.unpersist()

    melted = codes.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.col(f"code_{j}").alias("code"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select("vec_id", "s.j", "s.code")
    adc = (
        melted.join(F.broadcast(dt), ["j", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").alias("approx_d2"))
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2").asc(), F.col("vec_id").asc()
    )
    cand = (
        adc.withColumn("__r", F.row_number().over(wc))
        .filter(F.col("__r") <= refine * k)
        .select("query_id", "vec_id")
    )
    vecs_c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cvec")
    )
    vecs_q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
    )
    scored = (
        cand.join(vecs_c, "vec_id")
        .join(F.broadcast(vecs_q), "query_id")
        .select(
            "query_id",
            "vec_id",
            fixed_point(cosine(F.col("__qvec"), F.col("__cvec")), 6).alias(
                "cos_sim"
            ),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(wr).cast("long")
    ).filter(F.col("rank") <= k)
