"""Similarity search over embedding columns (SURVEY.md L3).

- ``brute_force_cosine_topk``: the exact baseline — broadcast the (small)
  query set against the corpus, dot products via ``zip_with``/``aggregate``
  (JVM-side, no Python), top-k per query via the standard window trick.
  Linear in |corpus| × |queries|; right whenever queries are few.
- ``lsh_cosine_topk``: the scale path — random-hyperplane LSH bucketing
  (Charikar, "Similarity estimation techniques from rounding algorithms",
  STOC 2002)
  (sign-bit signatures from seeded xxhash64-derived pseudo-random planes):
  corpus and queries land in hash buckets, candidates are an equi-join on
  the bucket key, then exact rerank. Sub-linear candidate sets at 100 TB,
  with recall traded via number of tables/bits.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators.partitioning import fan_out, local_rows


def _dot(a: Column, b: Column) -> Column:
    # cast to double BEFORE multiplying: float32 products lose bits the
    # accumulator can't recover, and the all-double fold is bitwise
    # reproducible against DuckDB's list_dot_product(DOUBLE[], DOUBLE[])
    # (verified exact over the corpus) — which is what lets the
    # brute-force query carry a full value-hash oracle
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (query side broadcast)."""
    from ..functions.core import fixed_point

    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    # |corpus|×|queries| fused dot products: the narrow-input case must be
    # widened or the whole scan scores on one core
    c = fan_out(corpus).select(F.col(id_col), F.col(vec_col).alias("__cvec"))
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        # fixed_point, not round(): the quantized value is compared (and
        # ranked) identically in the DuckDB oracle
        fixed_point(cosine(F.col("__qvec"), F.col("__cvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _hyperplane_sign_bits(vec: Column, n_bits: int, seed: int, salt: Column) -> Column:
    """LSH bucket id: sign bits of dot(vec, R_j) for pseudo-random planes R.

    Plane component R[j][d] is derived from xxhash64(seed, salt, j, d) mapped
    to (-1, 1) — deterministic, seeded, no stored model; ``salt`` varies per
    hash table so tables cut space independently. Entirely built-in
    expressions; evaluation is O(n_bits × dim) per row, fused by codegen.
    """
    def component(j: Column, d: Column) -> Column:
        h = F.xxhash64(F.lit(seed), salt, j, d)
        return (h % 2 == 0).cast("double") * 2 - 1

    def sign_bit(j: Column) -> Column:
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(F.sequence(F.lit(0), F.size(vec) - 1), lambda d: component(j, d)),
                lambda x, r: x.cast("double") * r,
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        return F.when(proj > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")

    # Horner assembly (acc*2 + bit): Spark's shift functions need a literal
    # shift amount, so the bucket id is built arithmetically.
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(n_bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, j: acc * 2 + sign_bit(j),
    )


#: (dim, n_bits, n_tables, seed) -> np.ndarray plane cache (driver-side).
#: Process-lifetime by design: an entry is n_tables×n_bits×dim float64s
#: (~200 KB at 8×16×1536) and real workloads use a handful of fixed LSH
#: configs, so an eviction policy would add state for no bound that
#: matters. Guarded anyway: refuse to grow past _PLANE_CACHE_MAX entries.
_PLANE_CACHE: dict = {}
_PLANE_CACHE_MAX = 64


def _probe_dim(corpus: DataFrame, vec_col: str) -> int:
    """Vector width from one row; a clear error beats ``first()[0]``'s
    TypeError when the corpus is empty."""
    row = corpus.select(F.size(F.col(vec_col))).limit(1).first()
    if row is None:
        raise ValueError(f"cannot infer {vec_col!r} dim: corpus is empty")
    return int(row[0])


def _plane_matrix(spark, dim: int, n_bits: int, n_tables: int, seed: int):
    """The ±1 hyperplane components as a numpy (tables, bits, dim) array.

    Derived from the SAME xxhash64 expression `_hyperplane_sign_bits`
    evaluates per row — but planes depend only on (seed, table, bit, dim),
    not on data, so they are computed ONCE via a tiny Spark job over the
    index grid (n_tables x n_bits x dim rows) and broadcast to the
    vectorized bucketizer. Buckets match the expression form (same ±1
    components, same strict `proj > 0` sign rule) except when a
    projection lands within float rounding of zero: numpy's matmul sums
    in a different order than Spark's sequential `aggregate` fold, so a
    near-zero projection can flip sign between the two forms. Harmless
    for LSH (a measure-zero tie either way), but not a bitwise identity.
    """
    key = (dim, n_bits, n_tables, seed)
    if key not in _PLANE_CACHE:
        bd = n_bits * dim
        grid = (
            spark.range(n_tables * bd)
            .select(
                (F.col("id") / bd).cast("int").alias("t"),
                (F.col("id") % bd / dim).cast("int").alias("j"),
                (F.col("id") % dim).cast("int").alias("d"),
            )
            .select(
                "t",
                "j",
                "d",
                (
                    (
                        F.xxhash64(
                            F.lit(seed), F.col("t"), F.col("j"), F.col("d")
                        )
                        % 2
                        == 0
                    ).cast("double")
                    * 2
                    - 1
                ).alias("r"),
            )
        )
        M = np.zeros((n_tables, n_bits, dim))
        for row in grid.collect():
            M[row.t, row.j, row.d] = row.r
        if len(_PLANE_CACHE) >= _PLANE_CACHE_MAX:
            _PLANE_CACHE.clear()  # pathological config churn: reset, don't grow
        _PLANE_CACHE[key] = M
    return _PLANE_CACHE[key]


def _bucket_all_tables(spark, vec: Column, dim: int, n_bits: int, n_tables: int, seed: int) -> Column:
    """All hash-table buckets for a vector in ONE Arrow-batched matmul.

    The expression form (`_hyperplane_sign_bits` inside transform) is a
    nested higher-order function — interpreted per element, O(tables x
    bits x dim) xxhash calls per ROW. This pandas-UDF form hoists the
    planes out (they're data-independent) and evaluates every bucket for
    a batch of rows as a single (n, dim) @ (dim, tables*bits) product —
    SIMD inside numpy, Arrow across the boundary. Measured ~10x on the
    LSH operators at sf0.1; the gap widens with corpus size.
    """
    from pyspark.sql.functions import pandas_udf

    planes = _plane_matrix(spark, dim, n_bits, n_tables, seed)
    T, B, D = planes.shape
    P = planes.reshape(T * B, D).T.copy()  # (dim, T*B)
    pows = (2 ** np.arange(B - 1, -1, -1)).astype(np.int64)

    @pandas_udf("array<long>")
    def buckets(col: pd.Series) -> pd.Series:
        X = np.array(col.tolist(), dtype=np.float64)  # (n, dim)
        S = (X @ P) > 0.0  # strict sign rule, as the expression form
        S = S.reshape(len(X), T, B)
        out = (S * pows).sum(axis=2)  # Horner == weighted bit sum
        return pd.Series(list(out))

    return buckets(vec)


def md5_plane_int(t: int, b: int, i: int) -> int:
    """The (table, bit, dim) hyperplane component both engines derive
    from md5: ``u32(md5('pl:t:b:i')) % 1001 - 500`` — an integer in
    [-500, 500], so a quantized-embedding dot product (micro-ints up to
    ~1e6/component) stays exact in int64 across hundreds of dims."""
    import hashlib

    u32 = int(hashlib.md5(f"pl:{t}:{b}:{i}".encode()).hexdigest()[:8], 16)
    return u32 % 1001 - 500


def _portable_buckets(
    vec: Column, dim: int, n_bits: int, n_tables: int
) -> Column:
    """array<long> of per-table buckets (index = table id, the
    ``_bucket_all_tables`` contract) from EXACT integer plane dots:
    quantize components to micro-ints (``floor(x*1e6 + 0.5)``), dot
    against the md5-derived integer planes, bit = strict sign —
    bit-identical on any engine/partitioning (float plane dots can flip
    knife-edge signs between engines; int64 dots cannot).

    Evaluated as ONE Arrow-batched int64 matmul per batch, mirroring the
    float path (:func:`_bucket_all_tables`): the previous expression
    form inlined tables*bits*dim plane literals plus an aggregate-lambda
    chain into a single projection — ~4k-node Catalyst trees whose
    analysis/codegen cost tens of driver-side seconds at ANY data size
    (the round-8 parity-tail finding). numpy int64 matmul is exact, so
    the results are unchanged. Magnitudes: |component| <= ~1e6 micro-ints,
    |plane| <= 500, so |dot| <= dim * 5e8 — comfortably inside int64 for
    any realistic dim."""
    P = np.array(
        [
            [md5_plane_int(t, b, i) for t in range(n_tables) for b in range(n_bits)]
            for i in range(dim)
        ],
        dtype=np.int64,
    )  # (dim, T*B), column order t*B + b
    pows = (1 << np.arange(n_bits)).astype(np.int64)  # bit b -> 2^b
    T, B = n_tables, n_bits

    @F.pandas_udf("array<long>")
    def buckets(col: pd.Series) -> pd.Series:
        X = np.array(col.tolist(), dtype=np.float64)  # (n, dim)
        Q = np.floor(X * 1_000_000 + 0.5).astype(np.int64)
        S = (Q @ P) > 0  # strict sign rule, exact int64 dots
        out = (S.reshape(len(Q), T, B) * pows).sum(axis=2)
        return pd.Series(list(out))

    return buckets(vec)


def embedding_near_duplicates(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cosine_threshold: float = 0.9,
    n_bits: int = 8,
    n_tables: int = 6,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos_sim >= t).

    Scale shape: LSH self-join — rows pair only within shared (table,
    bucket) cells, never all-pairs. Candidates are deduped then exact-cosine
    verified. Recall is tuned by n_tables/n_bits (more tables -> higher
    recall, more candidates).

    ``portable=True``: buckets from exact INTEGER dots against
    md5-derived integer hyperplanes (:func:`_portable_buckets`) and a
    fixed-point cosine instead of ``round`` — every stage replayable by
    an external SQL engine (the full-oracle witness for the
    hyperplane-LSH family, like the MinHash/SimHash md5 twins).
    """
    # sign-bit evaluation is O(n_tables × n_bits × dim) per row — by far
    # the dominant cost, so it runs as ONE vectorized matmul per Arrow
    # batch (see _bucket_all_tables), parallelized across the cluster
    dim = _probe_dim(corpus, vec_col)
    if portable:
        buckets = _portable_buckets(F.col(vec_col), dim, n_bits, n_tables)
    else:
        buckets = _bucket_all_tables(
            corpus.sparkSession, F.col(vec_col), dim, n_bits, n_tables, seed
        )
    bucketed = fan_out(corpus).select(
        F.col(id_col),
        F.posexplode(buckets).alias("table_id", "bucket"),
    )
    # the sign-bit postings feed BOTH self-join sides — cache, or the
    # dominant hyperplane evaluation runs twice (mirrors minhash's sigs)
    bucketed = bucketed.cache()

    # The banded self-join moves IDS ONLY: an embedding would otherwise ride
    # the exchange n_tables times and twice more per duplicated candidate
    # pair. Candidates are deduped first, then vectors join back exactly once
    # per verified pair — the same shape as the MinHash twin
    # (dedup.py minhash_near_duplicates).
    # One exchange serves both the pair dedup and the verify stage: the
    # ids-only pair stream is hash-partitioned on id_a at cluster
    # parallelism (compute-bound verify stage: partitions ≈ cores), and
    # hashpartitioning(id_a) already satisfies the (id_a, id_b) dedup's
    # clustering, so dropDuplicates adds NO second exchange — and AQE
    # cannot coalesce the verify stage below the cluster width the
    # per-pair cosine needs (guide §2.4; round-17: the old shape let AQE
    # shrink the few-MB pair shuffle to a handful of tasks while 30+
    # cores idled under the dominant cosine work).
    par = corpus.sparkSession.sparkContext.defaultParallelism
    candidates = (
        bucketed.select(F.col(id_col).alias("id_a"), "table_id", "bucket")
        .join(
            bucketed.select(F.col(id_col).alias("id_b"), "table_id", "bucket"),
            ["table_id", "bucket"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .repartition(par, "id_a")
        .dropDuplicates(["id_a", "id_b"])
    )
    # per-vector norms computed ONCE per side (n rows) instead of once
    # per candidate pair (the dot is per-pair work either way, but the
    # two norms were ~2/3 of the per-pair lambda evaluations); the float
    # result is bit-identical — same expression over the same vector,
    # evaluated earlier (guide §2.3 "shuffle keys and metadata", applied
    # to re-computation)
    vecs = corpus.select(F.col(id_col), F.col(vec_col))
    paired = candidates.join(
        vecs.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("__va"),
            _norm(F.col(vec_col)).alias("__na"),
        ),
        "id_a",
    ).join(
        vecs.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("__vb"),
            _norm(F.col(vec_col)).alias("__nb"),
        ),
        "id_b",
    )
    raw_sim = _dot(F.col("__va"), F.col("__vb")) / (
        F.col("__na") * F.col("__nb")
    )
    if portable:
        from ..functions.core import fixed_point

        # fixed_point, not round(): the quantized cosine is compared to
        # the oracle's identical floor(x*1e6+0.5)/1e6
        sim = fixed_point(raw_sim, 6)
    else:
        sim = F.round(raw_sim, 6)
    return (
        paired.select("id_a", "id_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= cosine_threshold)
    )


def kmeans_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
    max_iter: int = 20,
    train_fraction: float | None = None,
    init_mode: str = "k-means||",
) -> DataFrame:
    """Coarse-quantizer centroids via MLlib k-means (seeded).

    Returns ``(centroid_id int, __cent array<double>)`` — the shape
    ``ivf_cosine_topk`` broadcasts. ``train_fraction`` subsamples the
    training set: at 100 TB the quantizer is fit on a small sample (a few
    million vectors bound centroid quality; FAISS trains IVF coarse
    quantizers the same way), then ALL vectors are assigned in one
    distributed pass.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus if train_fraction is None else corpus.sample(
        fraction=train_fraction, seed=seed
    )
    # the TRAINING set is sample-sized by contract (a few million
    # vectors bound quantizer quality regardless of corpus size), so
    # pack it into few partitions before fitting: k-means|| init plus
    # every Lloyd iteration is a distributed JOB, and running dozens of
    # 32-task rounds over a few MB is pure scheduler overhead — at any
    # scale the right shape is wide for the assignment pass (fan_out in
    # the callers), narrow for the iterative fit
    feats = train.coalesce(4).select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, initMode=init_mode
    ).fit(feats)
    centers = [
        (i + 1, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return local_rows(
        corpus.sparkSession, centers, "centroid_id int, __cent array<double>"
    )


def _coarse_centroids(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    n_centroids: int,
    strategy: str,
    seed: int,
    max_iter: int = 20,
    init_mode: str = "k-means||",
) -> DataFrame:
    """(centroid_id, __cent): the IVF coarse quantizer's centroid set."""
    if strategy == "kmeans":
        return kmeans_centroids(
            corpus,
            vec_col=vec_col,
            n_centroids=n_centroids,
            seed=seed,
            max_iter=max_iter,
            init_mode=init_mode,
        )
    if strategy == "lowest_id":
        w0 = Window.orderBy(F.col(id_col).asc())
        return (
            corpus.select(id_col, vec_col)
            .orderBy(F.col(id_col).asc())
            .limit(n_centroids)
            .select(
                F.row_number().over(w0).alias("centroid_id"),
                F.col(vec_col).cast("array<double>").alias("__cent"),
            )
        )
    raise ValueError(f"unknown centroid strategy {strategy!r}")


def _assign_nearest(
    df: DataFrame,
    cents: DataFrame,
    vec_col: str,
    idc: str,
    vec_alias: str,
    keep: int,
) -> DataFrame:
    """(idc, vec_alias, centroid_id): each row's ``keep`` nearest centroids
    (one broadcast of the centroid set, fused dot products)."""
    scored = df.select(F.col(idc), F.col(vec_col).alias(vec_alias)).crossJoin(
        F.broadcast(cents)
    )
    sim = cosine(F.col(vec_alias), F.col("__cent"))
    wa = Window.partitionBy(idc).orderBy(sim.desc(), F.col("centroid_id").asc())
    return (
        scored.withColumn("__r", F.row_number().over(wa))
        .filter(F.col("__r") <= keep)
        .select(idc, vec_alias, "centroid_id")
    )


def _rerank_topk(
    scored: DataFrame, query_id_col: str, id_col: str, k: int
) -> DataFrame:
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: str = "kmeans",
    seed: int = 42,
    max_iter: int = 20,
    init_mode: str = "k-means||",
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer.

    The structure popularized by FAISS's IVF indexes (Johnson/Douze/Jégou,
    "Billion-scale similarity search with GPUs", 2017), re-expressed as
    DataFrame joins.

    The other classic ANN scale path, complementing ``lsh_cosine_topk``:

      1. pick ``n_centroids`` coarse centroids — ``centroids="kmeans"``
         (default) fits a seeded MLlib k-means; ``"lowest_id"`` takes the
         lowest-id corpus vectors (a deterministic degenerate quantizer,
         useful when a test must not depend on MLlib's iteration order),
      2. assign every corpus vector to its nearest centroid — the inverted
         lists (one broadcast of the centroid set, |corpus|·n_centroids
         fused dot products, computed once at index build),
      3. assign each query to its ``n_probe`` nearest centroids and
         equi-join on centroid_id — only those lists are scanned,
      4. exact cosine rerank + top-k window.

    This in-memory form recomputes the lists per call — right for one-shot
    batch ANN over a corpus already in hand. Repeated-query users should
    materialize the lists ONCE with :func:`build_ivf_index` and serve
    probes via :func:`ivf_probe_topk`, which reads only the probed
    n_probe/n_centroids partition directories.
    """
    cents = _coarse_centroids(
        corpus, vec_col, id_col, n_centroids, centroids, seed,
        max_iter=max_iter, init_mode=init_mode,
    )
    lists = _assign_nearest(fan_out(corpus), cents, vec_col, id_col, "__cvec", 1)
    probes = _assign_nearest(queries, cents, vec_col, query_id_col, "__qvec", n_probe)
    scored = (
        lists.join(F.broadcast(probes), "centroid_id")
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col("__qvec"), F.col("__cvec")), 6).alias("cos_sim"),
        )
        .dropDuplicates([query_id_col, id_col])
    )
    return _rerank_topk(scored, query_id_col, id_col, k)


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    centroids: str = "kmeans",
    seed: int = 42,
    train_fraction: float | None = None,
    max_iter: int = 20,
    init_mode: str = "k-means||",
) -> None:
    """Materialize an IVF index: inverted lists partitioned by centroid.

    Writes two parquet tables under ``path``:

    - ``lists/`` — ``(vec_id, vec, centroid_id)`` with
      ``partitionBy(centroid_id)``: one directory per inverted list, so a
      probe's ``centroid_id IN (...)`` filter prunes at PLANNING time
      (``PartitionFilters`` on the scan) and reads n_probe/n_centroids of
      the corpus bytes. Directory partitioning (not ``bucketBy``) is the
      right layout here: centroid cardinality is small and fixed, the
      probe is a pruned READ rather than a shuffle-free join, and any
      engine can list-prune directories.
    - ``centroids/`` — ``(centroid_id, centroid)``: the coarse quantizer,
      a few KB, read back whole by every probe.

    Index build is the one full-corpus pass (assignment = one broadcast of
    the centroid set + fused dot products); FAISS builds IVF the same way.
    ``train_fraction`` subsamples the k-means training set — at 100 TB fit
    the quantizer on a few million sampled vectors, assign everything.
    """
    if centroids == "kmeans" and train_fraction is not None:
        cents = kmeans_centroids(
            corpus,
            vec_col=vec_col,
            n_centroids=n_centroids,
            seed=seed,
            train_fraction=train_fraction,
            max_iter=max_iter,
            init_mode=init_mode,
        )
    else:
        cents = _coarse_centroids(
            corpus, vec_col, id_col, n_centroids, centroids, seed,
            max_iter=max_iter, init_mode=init_mode,
        )
    lists = _assign_nearest(
        fan_out(corpus), cents, vec_col, id_col, "__vec", 1
    ).select(F.col(id_col), F.col("__vec").alias(vec_col), "centroid_id")
    lists.write.mode("overwrite").partitionBy("centroid_id").parquet(
        f"{path}/lists"
    )
    cents.select("centroid_id", F.col("__cent").alias("centroid")).write.mode(
        "overwrite"
    ).parquet(f"{path}/centroids")


def probe_centroid_ids(probes: DataFrame) -> list[int]:
    """The distinct centroid ids a probe set touches, as driver-side
    literals (bounded by n_queries × n_probe and by n_centroids — never
    data-sized): inlining them is what turns the lists read into a
    planning-time-pruned scan."""
    return sorted(
        r.centroid_id for r in probes.select("centroid_id").distinct().collect()
    )


def ivf_probe_topk(
    spark,
    path: str,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k probe against a materialized :func:`build_ivf_index`.

    Reads the (tiny) centroid table, assigns each query to its ``n_probe``
    nearest centroids, then scans ONLY those inverted-list partition
    directories: the probed centroid ids are collected driver-side —
    bounded by ``n_queries × n_probe`` and by ``n_centroids``, never
    data-sized — and inlined as literals so Catalyst prunes the
    partitioned scan at planning time (the plan's ``PartitionFilters``
    carries the IN-list; verified in tests/test_partitioning.py). The
    scan fraction is n_probe/n_centroids of the corpus instead of 1.
    """
    cents = spark.read.parquet(f"{path}/centroids").select(
        "centroid_id", F.col("centroid").alias("__cent")
    )
    probes = _assign_nearest(
        queries, cents, vec_col, query_id_col, "__qvec", n_probe
    )
    probe_ids = probe_centroid_ids(probes)
    lists = spark.read.parquet(f"{path}/lists").filter(
        F.col("centroid_id").isin(probe_ids)
    )
    scored = (
        lists.join(F.broadcast(probes), "centroid_id")
        .select(
            query_id_col,
            id_col,
            F.round(
                cosine(F.col("__qvec"), F.col(vec_col)), 6
            ).alias("cos_sim"),
        )
        .dropDuplicates([query_id_col, id_col])
    )
    return _rerank_topk(scored, query_id_col, id_col, k)


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Approximate top-k: LSH-bucketed candidates, exact cosine rerank.

    Candidates = rows sharing a bucket with the query in ANY of ``n_tables``
    hash tables (explode over tables -> equi-join on (table, bucket)).

    ``portable=True``: md5-derived integer hyperplanes
    (:func:`_portable_buckets`, exact bucket signs) + fixed-point cosine
    — the candidate set AND the ranked result replay exactly in external
    SQL, because ranking ties break on the quantized sim then the id.
    """
    dim = _probe_dim(corpus, vec_col)

    def bucketed(df: DataFrame, idc: str, vec_alias: str) -> DataFrame:
        if portable:
            buckets = _portable_buckets(
                F.col(vec_col), dim, n_bits, n_tables
            )
        else:
            buckets = _bucket_all_tables(
                df.sparkSession, F.col(vec_col), dim, n_bits, n_tables, seed
            )
        return df.select(
            F.col(idc),
            F.col(vec_col).alias(vec_alias),
            F.posexplode(buckets).alias("table_id", "bucket"),
        )

    cb = bucketed(fan_out(corpus), id_col, "__cvec")
    qb = bucketed(queries, query_id_col, "__qvec")
    candidates = (
        cb.join(F.broadcast(qb), ["table_id", "bucket"])
        .select(query_id_col, id_col, "__qvec", "__cvec")
        .dropDuplicates([query_id_col, id_col])
    )
    if portable:
        from ..functions.core import fixed_point

        sim = fixed_point(cosine(F.col("__qvec"), F.col("__cvec")), 6)
    else:
        sim = F.round(cosine(F.col("__qvec"), F.col("__cvec")), 6)
    scored = candidates.select(
        query_id_col,
        id_col,
        sim.alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def knn_graph(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 3,
    n_bits: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """k-nearest-neighbor GRAPH: for every corpus vector, its top-k
    most-cosine-similar LSH-bucket neighbors — ``(src, dst, cos_sim,
    rank)``, directed (each side owns its own neighbor list).

    The corpus-vs-corpus sibling of :func:`lsh_cosine_topk` (which
    broadcasts a small query set — wrong when every vector is a query)
    and of :func:`embedding_near_duplicates` (which thresholds pairs —
    a kNN graph keeps the BEST k regardless of absolute similarity,
    the building block for graph-based dedup/clustering and
    HNSW/NN-descent-style index construction). Scale shape: the
    candidate generator is the SAME ids-only (table, bucket) banded
    self-join as the near-dup op — never all-pairs — and the per-source
    top-k is a window over candidates, so reducer work is bounded by
    bucket co-occupancy, not corpus size. Recall is the LSH trade: a
    true neighbor sharing no bucket is missed (raise n_tables for
    recall, n_bits for precision — the standard dial).

    SCALE CONTRACT (measured, KNN_SCALE.json): bucket occupancy — and
    with it candidate pairwork PER ROW — grows linearly with the corpus
    at fixed ``n_bits``, so total work is quadratic unless ``n_bits``
    grows with the corpus: ``n_bits(n) = n_bits(n0) + log2(n / n0)``
    holds occupancy (and recall geometry) constant. At the synthetic
    10x corpus, fixed n_bits=4 multiplied pairs/row 13.3x (1030 ->
    13680) while the contract's n_bits=7 returned it to 2187 — the
    SemDeDup K∝n rule, transposed to hash width.

    ``portable=True`` uses the md5-integer hyperplanes + fixed-point
    cosine so the whole graph (candidates AND ranks) replays exactly in
    external SQL.
    """
    from ..functions.core import fixed_point

    dim = _probe_dim(corpus, vec_col)
    if portable:
        buckets = _portable_buckets(F.col(vec_col), dim, n_bits, n_tables)
    else:
        buckets = _bucket_all_tables(
            corpus.sparkSession, F.col(vec_col), dim, n_bits, n_tables, seed
        )
    bucketed = fan_out(corpus).select(
        F.col(id_col), F.posexplode(buckets).alias("table_id", "bucket")
    ).cache()
    a = bucketed.select(
        "table_id", "bucket", F.col(id_col).alias("src")
    )
    b = bucketed.select(
        "table_id", "bucket", F.col(id_col).alias("dst")
    )
    # ONE exchange keyed on src serves three consumers: the (src, dst)
    # candidate dedup (hashpartitioning(src) satisfies its clustering),
    # the cosine verify stage (kept at cluster width — AQE would
    # otherwise coalesce the few-MB ids-only shuffle to a handful of
    # tasks under the dominant per-pair scoring), and the per-src top-k
    # window, which reuses the partitioning shuffle-free (guide §2.4).
    par = corpus.sparkSession.sparkContext.defaultParallelism
    cand = (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .repartition(par, "src")
        .dropDuplicates(["src", "dst"])
    )
    # norms once per vector, not once per candidate pair (bit-identical
    # float result; the two norms were ~2/3 of the per-pair lambda work)
    va = corpus.select(
        F.col(id_col).alias("src"),
        F.col(vec_col).alias("__vs"),
        _norm(F.col(vec_col)).alias("__ns"),
    )
    vb = corpus.select(
        F.col(id_col).alias("dst"),
        F.col(vec_col).alias("__vd"),
        _norm(F.col(vec_col)).alias("__nd"),
    )
    sim = _dot(F.col("__vs"), F.col("__vd")) / (
        F.col("__ns") * F.col("__nd")
    )
    sim = fixed_point(sim, 6) if portable else F.round(sim, 6)
    scored = (
        cand.join(va, "src")
        .join(vb, "dst")
        .select("src", "dst", sim.alias("cos_sim"))
    )
    w = Window.partitionBy("src").orderBy(
        F.col("cos_sim").desc(), F.col("dst").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)
