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

Per iteration: ONE broadcast of the K centroids onto the corpus (the
n×K distance table never shuffles raw vectors), one vec_id-partitioned
window for the argmin, and one (cid, dim)-keyed map-side-combined sum
for the update — all hashing on high-cardinality or K·dim-sized keys,
no single-reducer stage.  Centroid tables are K×dim rows
(data-size-independent).

Negative components are handled by a constant OFFSET added at
quantization: distances are translation-invariant, and all-positive
integers make the floor-division mean identical across engines
(negative integer division truncates differently between conventions —
sidestepped entirely).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1_000_000
OFFSET = 10_000_000  # > SCALE * max|component|; keeps everything positive


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


def _init_centroids(q: DataFrame, k: int) -> DataFrame:
    w0 = Window.orderBy(F.col("vec_id").asc())
    return (
        q.orderBy(F.col("vec_id").asc())
        .limit(k)
        .select(
            (F.row_number().over(w0) - 1).cast("long").alias("cid"),
            F.col("q").alias("qc"),
        )
    )


def _assign(q: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, q, cluster, d2): each vector's exact-integer nearest
    centroid, ties to the lowest cid."""
    scored = q.crossJoin(F.broadcast(cents)).select(
        "vec_id", "q", "cid", _dist2(F.col("q"), F.col("qc")).alias("d2")
    )
    wa = Window.partitionBy("vec_id").orderBy(
        F.col("d2").asc(), F.col("cid").asc()
    )
    return (
        scored.withColumn("__r", F.row_number().over(wa))
        .filter(F.col("__r") == 1)
        .select("vec_id", "q", F.col("cid").alias("cluster"), "d2")
    )


def _train(q: DataFrame, k: int, iterations: int) -> DataFrame:
    """Lloyd loop over pre-quantized vectors -> final (cid, qc) table."""
    cents = _init_centroids(q, k)
    for _ in range(iterations):
        members = _assign(q, cents)
        per_dim = (
            members.select("cluster", F.posexplode("q").alias("idx", "val"))
            .groupBy("cluster", "idx")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("cnt"))
        )
        # exact floor mean of POSITIVE ints: subtract the remainder so
        # the double division is exact (operators/graph.py:_fdiv shape)
        mean = (
            (F.col("s") - F.pmod(F.col("s"), F.col("cnt"))) / F.col("cnt")
        ).cast("long")
        upd = (
            per_dim.select("cluster", "idx", mean.alias("mv"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "mv"))),
                    lambda x: x.getField("mv"),
                ).alias("qc_new")
            )
            .select(F.col("cluster").alias("cid"), "qc_new")
        )
        cents = (
            cents.join(upd, "cid", "left")
            .select(
                "cid", F.coalesce(F.col("qc_new"), F.col("qc")).alias("qc")
            )
            .localCheckpoint(eager=False)  # K×dim rows; pins the loop depth
        )
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
    q = _quantized(df, vec_col, id_col)
    q = q.persist()  # scanned once per iteration
    # eager checkpoint of the K-row result releases the corpus cache
    # immediately (round-6 advice: harness sessions accumulate persists);
    # the final assignment re-derives q lazily — one extra scan+quantize,
    # deterministic, instead of a corpus-sized cache pinned forever
    cents = _train(q, k, iterations).localCheckpoint()
    q.unpersist()
    return _assign(_quantized(df, vec_col, id_col), cents).select(
        "vec_id", "cluster", "d2"
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
    cents = _train(q, k, iterations).localCheckpoint()  # K×dim rows
    q.unpersist()
    return cents


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

    Scale shape identical to production IVF: centroids broadcast (K
    rows), corpus scored against K centroids in one fused pass, probe
    lists bound candidates to ~n_probe/K of the corpus, rerank joins
    vectors once per candidate.
    """
    from ..functions.core import fixed_point
    from .similarity import cosine

    qc = _quantized(corpus, vec_col, id_col).persist()
    # eager K-row checkpoint, then release the corpus cache (the list
    # assignment below re-derives qc lazily — one extra deterministic
    # scan instead of a forever-pinned corpus cache)
    cents = _train(qc, n_centroids, iterations).localCheckpoint()
    qc.unpersist()
    lists = _assign(_quantized(corpus, vec_col, id_col), cents).select(
        "vec_id", "cluster"
    )

    qq = queries.select(
        F.col(query_id_col).alias("query_id"),
        _quantize(F.col(vec_col)).alias("q"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("cid").asc()
    )
    probes = (
        qq.crossJoin(F.broadcast(cents))
        .select(
            "query_id", "cid", _dist2(F.col("q"), F.col("qc")).alias("d2")
        )
        .withColumn("__r", F.row_number().over(wp))
        .filter(F.col("__r") <= n_probe)
        .select("query_id", F.col("cid").alias("cluster"))
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
    (:func:`_train` on sliced subvectors), integer code assignment,
    integer ADC lookup-sum, fixed-point cosine rerank of ``refine·k``
    candidates — the witness for the float production PQ (``llm/pq.py``,
    numpy codebooks + Arrow encode).

    Scale shape mirrors production PQ: codebook training is per-subspace
    Lloyd (sample it at 100 TB, as pq_train does); encoding scores each
    vector against K sub-centroids per subspace (broadcast); ADC joins
    the melted codes against a |queries|·m·K distance table (broadcast);
    only refine·k candidate ids per query touch the full vectors.
    """
    from ..functions.core import fixed_point
    from .similarity import _probe_dim, cosine

    dim = _probe_dim(corpus, vec_col)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m

    qc = _quantized(corpus, vec_col, id_col).persist()
    qq = queries.select(
        F.col(query_id_col).alias("query_id"),
        _quantize(F.col(vec_col)).alias("q"),
    ).persist()

    # Per-subspace intermediates are EAGERLY checkpointed so their
    # vec-sized caches can be released inside the loop (round-6 advice:
    # the old shape persisted m+2 DataFrames per call and never
    # unpersisted, accumulating cached partitions across a long-lived
    # harness session). cents_j is k_codes×dsub rows; assign_j is one
    # (vec_id, code) pair per corpus row — both are what the lazy plan
    # would compute anyway, materialized once instead of cached forever.
    codes = None
    dts = []
    for j in range(m):
        sub = F.slice(F.col("q"), j * dsub + 1, dsub)
        # ONE partition per subspace frame: this is the WITNESS path —
        # the production trainer (llm/pq.py pq_train) samples its
        # training set first, so the Lloyd input here is sample-sized
        # by contract, and each of the loop's m·(iterations+1) tiny
        # jobs otherwise pays a full shuffle-partition fan-out it
        # cannot use (the r11 IVF-quantizer coalesce, applied to PQ:
        # measured 18.2 -> ~8 s on the parity fixture, values
        # hash-identical)
        qj = qc.select("vec_id", sub.alias("q")).coalesce(1).persist()
        cents_j = _train(qj, k_codes, iterations).localCheckpoint()
        assign_j = (
            _assign(qj, cents_j)
            .select("vec_id", F.col("cluster").alias(f"code_{j}"))
            .localCheckpoint()
        )
        qj.unpersist()
        codes = (
            assign_j if codes is None else codes.join(assign_j, "vec_id")
        )
        dts.append(
            qq.select("query_id", sub.alias("q"))
            .crossJoin(F.broadcast(cents_j))
            .select(
                "query_id",
                F.lit(j).alias("j"),
                F.col("cid").alias("code"),
                _dist2(F.col("q"), F.col("qc")).alias("d2"),
            )
        )
    dt = dts[0]
    for d in dts[1:]:
        dt = dt.unionByName(d)
    # |queries|·m·k_codes rows (query-count-sized); materializing it
    # releases the quantized corpus/query caches for good
    dt = dt.localCheckpoint()
    qc.unpersist()
    qq.unpersist()

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
