"""Deduplication operators for training-data pipelines (SURVEY.md L1/L2).

- ``exact_dedup``: hash-groupBy keeping the lowest id — one shuffle on the
  dedup key; at 100 TB, group on ``sha2(text)`` (fixed 64-byte key) instead
  of the raw text so shuffle rows stay small.
- ``minhash_near_duplicates``: MinHash + LSH banding. Entirely built-in
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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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


_MERSENNE61 = (1 << 61) - 1


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, shingles, sig: array<bigint>) — seeded, deterministic MinHash.

    Each shingle is hashed ONCE (xxhash64 -> 32-bit base hash); the K hash
    functions are universal-hash permutations ``(a_i·h + b_i) mod 2^61-1``
    with seeded literal coefficients. Bounds keep every product under 2^62,
    so the arithmetic is ANSI-overflow-safe, and the whole signature costs
    |shingles| hashes + K cheap array traversals per row (re-hashing per
    function was ~10× slower).
    """
    import random

    rnd = random.Random(seed)
    coeffs = [
        (rnd.randrange(1, 1 << 30), rnd.randrange(0, 1 << 30))
        for _ in range(num_hashes)
    ]
    sh = _shingles(text_col, shingle_k).alias("shingles")
    base = F.transform(
        F.col("shingles"), lambda s: F.pmod(F.xxhash64(s), F.lit(1 << 32))
    ).alias("__base")
    def perm(a: int, b: int):
        # closure factory (NOT default-arg capture: PySpark reads lambda
        # arity to bind HOF variables, so extra params break the bind)
        return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE61))

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("__base"), perm(a, b)))
            for a, b in coeffs
        ]
    ).alias("sig")
    return (
        df.select(F.col(id_col).alias("id"), sh)
        .select("id", "shingles", base)
        .select("id", "shingles", sig)
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.6,
) -> DataFrame:
    """Candidate near-duplicate pairs with exact-Jaccard verification.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    rows_per_band = num_hashes // bands
    # cache: the banded self-join and the shingle re-join would otherwise
    # recompute every signature 2-4x
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k).cache()

    # banded rows carry ONLY (id, band_id, band_hash): the exploded shuffle
    # stays narrow; shingle sets re-join AFTER candidate dedup, so the heavy
    # arrays move once per verified pair, not once per band.
    banded = sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("id", "band.band_id", "band.band_hash")

    candidates = (
        banded.select(F.col("id").alias("id_a"), "band_id", "band_hash")
        .join(banded.select(F.col("id").alias("id_b"), "band_id", "band_hash"),
              ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    shingle_sets = sigs.select("id", "shingles")
    paired = candidates.join(
        shingle_sets.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")),
        "id_a",
    ).join(
        shingle_sets.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")),
        "id_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        paired.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(df: DataFrame, text_col: str, id_col: str, shingle_k: int = 2) -> DataFrame:
    """63-bit SimHash per document (id, simhash) — built-ins only.

    Bit j of the signature is the sign of the per-shingle vote
    ``±1 = sgn(xxhash64(j, shingle))`` summed over shingles (a fresh salted
    hash per bit — no bit-twiddling, which Spark's shift functions can't do
    with a Column shift amount). The signature is assembled Horner-style
    (``acc*2 + bit``), MSB first; 63 bits so the accumulator never touches
    the long sign bit (ANSI overflow). Near-dup candidates: low Hamming
    distance (``bit_count(a ^ b)``), or equi-join on signature prefixes.
    """
    sh = _shingles(text_col, shingle_k).alias("shingles")
    # hash each shingle ONCE; each signature bit reads one bit of that hash
    # (literal shift amounts, so the 63 votes are cheap array traversals,
    # not 63 rounds of re-hashing)
    hashes = F.transform(F.col("shingles"), lambda s: F.xxhash64(s)).alias("hashes")

    def vote(j: int) -> Column:
        return F.aggregate(
            F.col("hashes"),
            F.lit(0).cast("long"),
            lambda a, h: a + (F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1),
        )

    sim: Column = F.lit(0).cast("long")
    for j in range(63):
        sim = sim + F.when(vote(j) > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return (
        df.select(F.col(id_col).alias("id"), sh)
        .select("id", hashes)
        .select("id", sim.alias("simhash"))
    )
