"""Deduplication operators for training-data pipelines (SURVEY.md L1/L2).

- ``exact_dedup``: hash-groupBy keeping the lowest id — one shuffle on the
  dedup key; at 100 TB, group on ``sha2(text)`` (fixed 64-byte key) instead
  of the raw text so shuffle rows stay small.
- ``minhash_near_duplicates``: MinHash (Broder, "On the resemblance and
  containment of documents", 1997) + LSH banding (Leskovec/Rajaraman/
  Ullman, *Mining of Massive Datasets* ch. 3). Entirely built-in
  expressions (xxhash64 with per-function salts; no Python UDFs), so every
  stage is codegen'd:

    shingle -> K minhashes -> B bands -> band-bucket equi-join -> exact
    Jaccard verify on candidates only.

  Scale shape: candidate generation is an equi-join on (band_id, band_hash)
  — hash-partitioned, linear in bucket collisions — never an all-pairs
  comparison. Hot buckets (boilerplate shingles) are AQE-skew-split.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators.partitioning import fan_out


def exact_dedup(df: DataFrame, on: Sequence[str], id_col: str) -> DataFrame:
    """Keep one row (lowest ``id_col``) per distinct ``on`` combination."""
    return df.groupBy(*on).agg(
        F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dups")
    )


def _shingles(text_col: str, k: int) -> F.Column:
    """k-word shingles as an array<string> (distinct, order-free set)."""
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))
    )


def _shingle_hashes(text_col: str, k: int) -> F.Column:
    """Distinct 64-bit hashes of each k-word shingle, as array<long>.

    Each k-word shingle string is hashed immediately inside the transform
    (never materialized in the row), and the ``array_distinct`` dedupes
    8-byte longs instead of k-word strings. Set-identical to hashing
    ``_shingles`` output, up to hash collisions.
    """
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, k)))
        )
    )


def _shingle_hashes_md5(
    text_col: str, k: int, hex_chars: int = 8
) -> F.Column:
    """Distinct 32-bit md5-derived hashes of each k-word shingle.

    The engine-portable twin of :func:`_shingle_hashes`: the first
    ``hex_chars`` hex chars of md5(shingle) parse to the same integer in
    Spark (``conv(substring(md5(s),1,h),16,10)``) and DuckDB
    (``('0x' || substr(md5(s),1,h))::BIGINT``), so an external engine
    can replay the EXACT candidate set — xxhash64 has no DuckDB twin.
    ``hex_chars=8`` gives the uint32 range the MinHash universal-hash
    coefficient bounds assume; ``hex_chars=15`` gives the 60-bit range
    SimHash needs (one vote per signature bit, < 2^63 signed-safe).
    One parametrized implementation keeps the MinHash and SimHash
    portable paths from drifting apart.
    """
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.conv(
                F.substring(
                    F.md5(F.concat_ws(" ", F.slice(words, i + 1, k))),
                    1,
                    hex_chars,
                ),
                16,
                10,
            ).cast("long"),
        )
    )


_MERSENNE61 = (1 << 61) - 1


def minhash_coefficients(
    num_hashes: int = 32, seed: int = 42
) -> list[tuple[int, int]]:
    """The seeded universal-hash coefficients ``(a_i, b_i)`` shared by the
    Spark signatures and any external oracle replaying them."""
    import random

    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, 1 << 30), rnd.randrange(0, 1 << 30))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    shingle_k: int = 3,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """(id, sh_hashes, sig) — seeded, deterministic MinHash.

    Each shingle is hashed ONCE (xxhash64 -> 32-bit base hash); the K hash
    functions are universal-hash permutations ``(a_i·h + b_i) mod 2^61-1``
    with seeded literal coefficients. Bounds keep every product under 2^62,
    so the arithmetic is ANSI-overflow-safe, and the whole signature costs
    |shingles| hashes + one K-wide min-fold per row (re-hashing per
    function was ~10× slower).

    ``sh_hashes`` (array<long>, the hashed shingle set) stands in for the
    string shingles downstream: Jaccard over the hash set equals Jaccard
    over the strings up to 32-bit collisions, and an 8-byte element
    shuffles/intersects far cheaper than a k-word string.

    ``portable=True`` swaps the xxhash64 base hash for the md5-derived
    one (:func:`_shingle_hashes_md5`) so an external engine can replay
    the signatures exactly; banding/verification logic is IDENTICAL, so
    the portable path is also the oracle-checked witness that the
    production banding is correct.
    """
    # shingling + the K-wide min-fold are the hottest expressions in the
    # engine; a narrow input (one parquet split) would run them on one core
    df = fan_out(df)
    coeffs = minhash_coefficients(num_hashes, seed)
    if portable:
        base = _shingle_hashes_md5(text_col, shingle_k).alias("sh_hashes")
    else:
        sh = _shingle_hashes(text_col, shingle_k)
        base = F.transform(
            sh, lambda h: F.pmod(h, F.lit(1 << 32))
        ).alias("sh_hashes")
    # one aggregate pass over the shingle set, carrying all K running minima
    # in a single array accumulator — one generated loop instead of K
    # transform+array_min expressions (smaller codegen, ~1.7× faster cold)
    a_arr = F.array(*[F.lit(a).cast("long") for a, _ in coeffs])
    b_arr = F.array(*[F.lit(b).cast("long") for _, b in coeffs])
    init = F.array(*([F.lit(_MERSENNE61).cast("long")] * num_hashes))
    sig = F.aggregate(
        F.col("sh_hashes"),
        init,
        lambda acc, h: F.transform(
            acc,
            lambda cur, i: F.least(
                cur,
                F.pmod(
                    h * F.element_at(a_arr, i + 1) + F.element_at(b_arr, i + 1),
                    F.lit(_MERSENNE61),
                ),
            ),
        ),
    ).alias("sig")
    return (
        df.select(F.col(id_col).alias("id"), base)
        .select("id", "sh_hashes", sig)
    )


def _band_hashes(
    sigs: DataFrame, bands: int, rows_per_band: int, portable: bool
) -> DataFrame:
    """(id, band_id, band_hash) from a signature frame — the narrow
    exploded representation both the self-join candidate generator and
    the incremental batch⋈index probe shuffle on."""
    band_fn = F.md5 if portable else F.xxhash64
    return sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    band_fn(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(
                                    F.col("sig"),
                                    b * rows_per_band + 1,
                                    rows_per_band,
                                ),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("id", "band.band_id", "band.band_hash")


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.6,
    portable: bool = False,
) -> DataFrame:
    """Candidate near-duplicate pairs with exact-Jaccard verification.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.

    ``portable=True``: md5-derived shingle hashes, md5 band buckets, and
    an unrounded pinned-double jaccard — every stage replayable by an
    external SQL engine (the full-oracle witness for the banding logic).
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    rows_per_band = num_hashes // bands
    # cache: the banded self-join and the shingle re-join would otherwise
    # recompute every signature 2-4x
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_k, portable=portable
    ).cache()

    # banded rows carry ONLY (id, band_id, band_hash): the exploded shuffle
    # stays narrow; hashed shingle sets re-join AFTER candidate dedup, so the
    # heavy arrays move once per verified pair, not once per band.
    banded = _band_hashes(sigs, bands, rows_per_band, portable)

    candidates = (
        banded.select(F.col("id").alias("id_a"), "band_id", "band_hash")
        .join(banded.select(F.col("id").alias("id_b"), "band_id", "band_hash"),
              ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    shingle_sets = sigs.select("id", "sh_hashes")
    paired = candidates.join(
        shingle_sets.select(F.col("id").alias("id_a"), F.col("sh_hashes").alias("sh_a")),
        "id_a",
    ).join(
        shingle_sets.select(F.col("id").alias("id_b"), F.col("sh_hashes").alias("sh_b")),
        "id_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    # portable mode: NO round() — Spark rounds HALF_UP, DuckDB HALF_EVEN;
    # the bare division of two exact set sizes is bit-identical instead
    jac = inter / union if portable else F.round(inter / union, 6)
    return (
        paired.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    jaccard_threshold: float = 0.6,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs via an inverted-index self-join.

    The exact counterpart of ``minhash_near_duplicates`` (which approximates
    the same measure): explode each doc's distinct k-word grams into
    postings, equi-join postings on the gram, count per-pair intersections,
    then ``|A∩B| / (|A|+|B|-|A∩B|)``. Fully SQL-expressible → DuckDB oracle.

    Scale shape: cost is Σ_g df(g)², driven entirely by hot grams
    (boilerplate). ``max_doc_freq`` drops grams appearing in more than that
    many docs BEFORE the self-join — the standard stop-shingle cap; a gram
    shared by half the corpus identifies nothing and would otherwise create
    a quadratic bucket. At 100 TB this cap is mandatory, not tuning.
    """
    inter, sizes = _ngram_pair_intersections(
        df, text_col, id_col, k, max_doc_freq
    )
    jaccard = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        inter.join(
            sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a"
        )
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _ngram_pair_intersections(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    max_doc_freq: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared inverted-index core of the exact n-gram measures:
    per-pair intersection counts + per-doc distinct-gram sizes."""
    # postings carry the 64-bit gram hash, not the k-word string: the
    # self-join shuffles 8-byte keys, and pair counts are unchanged up to
    # same-doc-pair xxhash64 collisions (~|grams|²/2^64, negligible)
    grams = fan_out(df).select(
        F.col(id_col).alias("id"), F.explode(_shingle_hashes(text_col, k)).alias("g")
    )
    if max_doc_freq is not None:
        # cache the RAW postings too: the stop-shingle df-count consumes
        # them once and the semi-join a second time — without this the
        # corpus is re-read and re-shingled for each (verified by plan
        # Location count). At cluster scale: DISK_ONLY.
        grams = grams.cache()
        rare = (
            grams.groupBy("g")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("g")
        )
        grams = grams.join(rare, "g", "left_semi")
    grams = grams.cache()  # postings feed sizes + both self-join sides
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        grams.select(F.col("id").alias("id_a"), "g")
        .join(grams.select(F.col("id").alias("id_b"), "g"), "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return inter, sizes


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    containment_threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """EXACT n-gram containment pairs: ``|A∩B| / min(|A|, |B|)``.

    The measure Jaccard systematically MISSES: a short doc fully embedded
    in a long one (quote, boilerplate wrapper, concatenated shard) has
    tiny Jaccard — the union is dominated by the long doc — but
    containment ≈ 1. Standard practice in pretraining dedup (the
    "containment" of Broder's resemblance/containment pair, 1997) is to
    run BOTH measures over the same postings.

    Same inverted-index shape and stop-gram cap as
    :func:`ngram_jaccard_pairs`; only the final ratio differs, so the
    cost is identical and the operator is fully SQL-expressible (DuckDB
    oracle with ``least(sa.n, sb.n)``).
    """
    inter, sizes = _ngram_pair_intersections(
        df, text_col, id_col, k, max_doc_freq
    )
    containment = F.col("n_common").cast("double") / F.least(
        F.col("na"), F.col("nb")
    )
    return (
        inter.join(
            sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a"
        )
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .withColumn("containment", containment)
        .filter(F.col("containment") >= containment_threshold)
        .select("id_a", "id_b", "containment")
    )


def duplicate_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    max_iterations: int = 20,
) -> DataFrame:
    """(id, cluster): connected components over a near-duplicate pair graph.

    Turns pairwise near-dup output (``minhash_near_duplicates`` /
    ``ngram_jaccard_pairs``) into dedup CLUSTERS: every document gets the
    minimum reachable doc id as its cluster label, so "keep one per
    cluster" is a trivial ``filter(id == cluster)``. Min-label propagation
    (the MapReduce connected-components family — Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014): each round
    every node adopts the smallest label among itself, its neighbors, AND
    its current label's label (pointer doubling). Rounds needed =
    ~1.44·log2(diameter)+O(1) thanks to the shortcutting — 12 rounds for
    a 1000-node path, the adversarial worst case — and near-dup
    components are dense clusters of tiny diameter, so 2-3 rounds
    converge in practice.

    Scale shape per round: one equi-join of the edge list against the
    label table (both hash-partitioned on the node key) + a min-aggregate
    — no all-pairs work, no driver-side graph. The driver only runs the
    convergence loop: one ``count`` action per round (an iterative
    algorithm's unavoidable control flow), and ``localCheckpoint``
    truncates the growing lineage so round N's plan does not replay
    rounds 1..N-1. Only nodes that appear in an edge iterate; singleton
    documents attach at the end as their own cluster — at 100 TB the pair
    graph is orders of magnitude smaller than the corpus.
    """
    # materialize the edge list ONCE: every round joins against it, and
    # without this the whole upstream pair computation (minhash/Jaccard
    # candidate generation — the expensive part) would re-execute per
    # round inside the join. The edge list itself is tiny relative to the
    # corpus, so an eager localCheckpoint is cheap and bounds each round
    # to join+agg over materialized edges.
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("cluster"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("cluster").alias("neighbor_cluster"))
        )
        # pointer doubling (Shiloach–Vishkin shortcutting): also adopt my
        # LABEL's label from the same snapshot. Neighbor-min alone moves a
        # component's min one hop per round (diameter rounds — a planted
        # path graph is the worst case); with shortcutting the distance
        # covered compounds geometrically, converging in
        # ~1.44·log2(diameter)+O(1) rounds (measured: 12 rounds for a
        # 1000-node path, 16 for 10000 — see tests/test_cluster_properties).
        label_of_label = labels.select(
            F.col("id").alias("__pid"), F.col("cluster").alias("__pcluster")
        )
        updated = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left")
            .join(label_of_label, F.col("cluster") == F.col("__pid"), "left")
            .select(
                "id",
                F.least(
                    F.col("cluster"),
                    F.coalesce("neighbor_cluster", F.col("cluster")),
                    F.coalesce("__pcluster", F.col("cluster")),
                ).alias("__new_cluster"),
                F.col("cluster").alias("__old_cluster"),
            )
            .select(
                "id",
                F.col("__new_cluster").alias("cluster"),
                (F.col("__new_cluster") < F.col("__old_cluster")).alias(
                    "__lowered"
                ),
            )
            .localCheckpoint()
        )
        changed = updated.filter(F.col("__lowered")).count()
        labels = updated.drop("__lowered")
        if changed == 0:
            break
    return (
        df.select(F.col(id_col).alias("id"))
        .join(labels.withColumnRenamed("id", "__lid"), F.col("id") == F.col("__lid"), "left")
        .select("id", F.coalesce("cluster", F.col("id")).alias("cluster"))
    )


def simhash64(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 2,
    portable: bool = False,
) -> DataFrame:
    """63-bit SimHash per document (id, simhash) — built-ins only.

    Bit j of the signature is the sign of the per-shingle vote
    ``±1 = bit j of xxhash64(shingle)`` summed over the shingle set. 63 bits
    so the accumulator never touches the long sign bit (ANSI overflow).
    Near-dup candidates: low Hamming distance (``bit_count(a ^ b)``), or
    equi-join on signature prefixes.

    ``portable=True``: 60-bit signatures over md5-derived shingle hashes
    (:func:`_shingle_hashes_md5` at 60 bits) — identical vote/assembly logic,
    every stage replayable in external SQL (the full-oracle witness for
    the SimHash pipeline, like the MinHash md5 twin).
    """
    nbits = 60 if portable else 63
    # hash each shingle ONCE (straight off the word array), then ONE fold
    # over the shingle set carrying all bit-vote counters in an array
    # accumulator (the indexed-transform lambda gives each slot its bit
    # index j) — one traversal instead of one per bit
    hashes = (
        _shingle_hashes_md5(text_col, shingle_k, hex_chars=15)
        if portable
        else _shingle_hashes(text_col, shingle_k)
    ).alias("hashes")
    init = F.array(*([F.lit(0).cast("long")] * nbits))
    votes = F.aggregate(
        F.col("hashes"),
        init,
        lambda acc, h: F.transform(
            acc,
            lambda cur, j: cur + (F.getbit(h, j).cast("long") * 2 - 1),
        ),
    ).alias("votes")
    # assemble the signature from the vote signs: bit j set iff votes[j] > 0
    sim = F.aggregate(
        F.zip_with(
            F.col("votes"),
            F.array(*[F.lit(1 << j).cast("long") for j in range(nbits)]),
            lambda v, w: F.when(v > 0, w).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return (
        fan_out(df)
        .select(F.col(id_col).alias("id"), hashes)
        .select("id", votes)
        .select("id", sim.alias("simhash"))
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    jaccard_threshold: float = 0.6,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """:func:`ngram_jaccard_pairs` with PREFIX FILTERING — identical
    output, far fewer candidates.

    The full postings self-join costs Σ_g df(g)² over EVERY gram. Prefix
    filtering (Chaudhuri, Ganti & Kaushik, "A Primitive Operator for
    Similarity Joins", ICDE 2006; Xiao et al., PPJoin, WWW 2008) proves
    that for ``J(A,B) >= t`` the two docs must share a gram inside each
    doc's PREFIX — its ``n - floor(t·n) + 1`` rarest grams under a
    global canonical order (ascending document frequency, gram hash as
    tiebreak). Pigeonhole: overlap >= ceil(t·n) elements can't all hide
    in the suffix. (``floor`` rather than the tight ``ceil`` sidesteps
    float-boundary ambiguity at the cost of a slightly longer prefix —
    a superset of candidates, never a miss.)

    So the quadratic term shrinks from Σ_g df(g)² to Σ_g df_prefix(g)²,
    and the prefix is dominated by RARE grams — precisely the ones with
    tiny df. At t=0.5 the prefix is ~half of each doc; the verify step
    touches only surviving candidate pairs, joining their full gram
    SETS (arrays bounded by doc length) for one JVM-side
    ``array_intersect``. The stop-gram cap still applies first and
    defines the same gram universe as the exact form, so outputs match
    bit-for-bit (asserted in tests; same DuckDB oracle).

    Measured at sf0.1 (5k docs): candidate pairs 1.13M → 419k (−63%),
    but wall time 1.6s → 4.5s — the df-join, per-doc prefix window, and
    set-verify stages cost more than the avoided join work while the
    corpus fits one node. The crossover is corpus growth: Σ_g df(g)²
    grows superlinearly (df scales with corpus for every gram under the
    cap) while the added stages stay linear, so at pretraining scale
    the plain join's shuffle explodes and this form is the one that
    survives. Use the plain :func:`ngram_jaccard_pairs` below ~10⁵
    docs; switch here above it.
    """
    grams = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.explode(_shingle_hashes(text_col, k)).alias("g"),
    )
    if max_doc_freq is not None:
        grams = grams.cache()
        rare = (
            grams.groupBy("g")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("g")
        )
        grams = grams.join(rare, "g", "left_semi")
    grams = grams.cache()  # feeds dfreq, prefixes, and the verify sets
    dfreq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("dfg"))
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    wp = Window.partitionBy("id").orderBy("dfg", "g")
    prefix_len = (
        F.col("n")
        - F.floor(F.lit(jaccard_threshold) * F.col("n")).cast("long")
        + 1
    )
    prefix = (
        grams.join(dfreq, "g")
        .withColumn("rn", F.row_number().over(wp))
        .join(sizes, "id")
        .filter(F.col("rn") <= prefix_len)
        .select("id", "g")
    )
    cands = (
        prefix.select(F.col("id").alias("id_a"), "g")
        .join(prefix.select(F.col("id").alias("id_b"), "g"), "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    gsets = grams.groupBy("id").agg(F.collect_set("g").alias("gs"))
    jaccard = F.col("n_common").cast("double") / (
        F.size("gsa") + F.size("gsb") - F.col("n_common")
    )
    return (
        cands.join(
            gsets.select(F.col("id").alias("id_a"), F.col("gs").alias("gsa")),
            "id_a",
        )
        .join(
            gsets.select(F.col("id").alias("id_b"), F.col("gs").alias("gsb")),
            "id_b",
        )
        .withColumn(
            "n_common", F.size(F.array_intersect("gsa", "gsb")).cast("long")
        )
        .withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_incremental(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.6,
    portable: bool = False,
) -> DataFrame:
    """Incremental NEAR-dup ingestion gate: for every batch document,
    ``(doc_id, dup_of, is_new_content)`` — ``dup_of`` the smallest
    corpus id whose exact shingle-Jaccard with it clears the
    threshold, NULL for novel content.

    The near-dup sibling of the exact incremental index
    (``q_dedup_incremental``): at 100 TB the corpus side of this is a
    STORED band index (id, band_id, band_hash) maintained across
    ingests — only the batch recomputes signatures, and the probe is a
    batch-sized equi-join against the index on (band_id, band_hash),
    never a corpus self-join and never a batch×corpus product.
    Verification re-joins shingle sets for candidate pairs only, then
    one min-aggregate per batch doc; novel docs survive via the final
    left join. Same signature/banding code as
    :func:`minhash_near_duplicates` (one implementation, both
    modalities; ``portable=True`` is the oracle-witness hash choice).
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    rpb = num_hashes // bands
    csigs = minhash_signatures(
        corpus, text_col, id_col, num_hashes, shingle_k, portable=portable
    ).cache()
    bsigs = minhash_signatures(
        batch, text_col, id_col, num_hashes, shingle_k, portable=portable
    ).cache()
    cand = (
        _band_hashes(bsigs, bands, rpb, portable)
        .withColumnRenamed("id", "bid")
        .join(
            _band_hashes(csigs, bands, rpb, portable).withColumnRenamed(
                "id", "cid"
            ),
            ["band_id", "band_hash"],
        )
        .select("bid", "cid")
        .dropDuplicates(["bid", "cid"])
    )
    paired = cand.join(
        bsigs.select(F.col("id").alias("bid"), F.col("sh_hashes").alias("sh_b")),
        "bid",
    ).join(
        csigs.select(F.col("id").alias("cid"), F.col("sh_hashes").alias("sh_c")),
        "cid",
    )
    inter = F.size(F.array_intersect("sh_b", "sh_c")).cast("double")
    union = F.size(F.array_union("sh_b", "sh_c")).cast("double")
    hit = (
        paired.filter(inter / union >= jaccard_threshold)
        .groupBy("bid")
        .agg(F.min("cid").alias("dup_of"))
    )
    return (
        batch.select(F.col(id_col).alias("doc_id"))
        .join(hit.withColumnRenamed("bid", "doc_id"), "doc_id", "left")
        .select(
            "doc_id", "dup_of", F.col("dup_of").isNull().alias("is_new_content")
        )
    )
