"""Fuzzy string matching via deletion-neighborhood blocking (SymSpell
family: Garbe's symmetric-delete algorithm, public domain description).

Spark has no fuzzy join. The naive form — crossJoin + `levenshtein` —
is O(n²) and dead at any scale. This operator uses the symmetric-delete
property instead: if ``lev(a, b) <= 1`` then the deletion neighborhoods
of ``a`` and ``b`` (each string plus every single-character deletion of
it) intersect. So:

1. explode each string into its ``len+1`` deletion variants (+ itself);
2. equi-join on the variant (candidates share a block — never all-pairs);
3. verify candidates with the exact ``levenshtein`` distance.

Shuffle moves (variant_hash, id) postings — O(n·len) fixed-width rows —
and the verify is pair-local. Hot blocks (a variant shared by many keys,
e.g. serial-numbered names) bound candidates by Σ block² like every
blocking scheme; AQE skew-split handles outliers.

The blocking generalizes to any edit distance d via depth-d deletion
neighborhoods (all strings reachable by deleting up to d characters):
if ``lev(a, b) <= d``, an optimal edit script yields a common string
reachable by <= d deletions from each side, so the neighborhoods
intersect. Variant count grows ~len^d/d!, so depth 1 (len+1 variants)
and depth 2 (+len·(len-1)/2) are the practical keys-dedup range; both
are implemented here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(s: Column, max_deletes: int = 1) -> Column:
    """The depth-``max_deletes`` deletion neighborhood of ``s`` (array):
    the string itself, every single-character deletion, and (depth 2)
    every two-character deletion, distinct."""
    if max_deletes not in (1, 2):
        raise ValueError("deletion neighborhoods implemented for depth 1..2")
    one_deleted = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            s.substr(F.lit(1), i - 1), s.substr(i + 1, F.length(s))
        ),
    )
    out = F.array_append(one_deleted, s)
    if max_deletes == 2:
        # delete positions i < j: prefix[1..i-1] + mid[i+1..j-1] + tail
        # (Spark's sequence(a, b) runs DESCENDING when a > b, so both
        # loops need explicit emptiness guards)
        two_deleted = F.when(
            F.length(s) >= 2,
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length(s) - 1),
                    lambda i: F.transform(
                        F.sequence(i + 1, F.length(s)),
                        lambda j: F.concat(
                            s.substr(F.lit(1), i - 1),
                            s.substr(i + 1, j - i - 1),
                            s.substr(j + 1, F.length(s)),
                        ),
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))
        out = F.concat(out, two_deleted)
    return F.array_distinct(out)


def fuzzy_self_pairs(
    df: DataFrame,
    col: str,
    id_col: str,
    max_edits: int = 1,
) -> DataFrame:
    """(id_a, id_b, a, b, dist): pairs with ``lev(a, b) <= max_edits``.

    ``max_edits`` may be 1 or 2 (the depths the deletion blocking is
    implemented for; the postings size grows from O(n·len) to
    O(n·len²/2) at depth 2). Pairs are id-ordered and distinct;
    identical strings pair too (dist 0) — filter ``dist > 0`` if exact
    dups are handled elsewhere.
    """
    if max_edits not in (1, 2):
        raise ValueError("deletion blocking implemented for max_edits in 1..2")
    base = df.select(F.col(id_col).alias("id"), F.col(col).alias("s"))
    posts = base.select(
        "id",
        "s",
        F.explode(deletion_variants(F.col("s"), max_edits)).alias("var"),
    )
    left = posts.select(
        F.col("id").alias("id_a"), F.col("s").alias("a"), "var"
    )
    right = posts.select(
        F.col("id").alias("id_b"), F.col("s").alias("b"), "var"
    )
    return (
        left.join(right, "var")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "a", "b")
        .distinct()  # a pair can share several variants
        .withColumn("dist", F.levenshtein(F.col("a"), F.col("b")).cast("long"))
        .filter(F.col("dist") <= max_edits)
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    left_id: str,
    right_id: str,
    max_edits: int = 1,
) -> DataFrame:
    """(left_id, right_id, left_val, right_val, dist): cross-table pairs
    with ``lev(left_val, right_val) <= max_edits``.

    The two-table form of :func:`fuzzy_self_pairs` — the "join messy keys
    to a reference table" operation (typo'd names against a canonical
    dim, crawl URLs against an allowlist). Same symmetric-delete
    blocking: both sides explode their deletion neighborhoods, candidates
    meet in an equi-join on the variant, exact ``levenshtein`` verifies.
    When the right side is a small reference table its postings are
    broadcast — the whole join then runs without shuffling the left side.
    """
    if max_edits not in (1, 2):
        raise ValueError("deletion blocking implemented for max_edits in 1..2")

    def posts(df: DataFrame, col: str, idc: str, ida: str, va: str) -> DataFrame:
        return df.select(
            F.col(idc).alias(ida),
            F.col(col).alias(va),
            F.explode(deletion_variants(F.col(col), max_edits)).alias("var"),
        )

    lp = posts(left, left_col, left_id, "left_id", "left_val")
    rp = posts(right, right_col, right_id, "right_id", "right_val")
    return (
        lp.join(rp, "var")
        .select("left_id", "right_id", "left_val", "right_val")
        .distinct()  # a pair can share several variants
        .withColumn(
            "dist", F.levenshtein(F.col("left_val"), F.col("right_val")).cast("long")
        )
        .filter(F.col("dist") <= max_edits)
    )
