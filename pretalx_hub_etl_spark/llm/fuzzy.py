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

Edit distance > 1 needs depth-2+ deletion neighborhoods (variant count
grows ~len^d); depth 1 covers the fuzzy-key dedup this engine targets
(typo'd titles, off-by-one-char URLs/ids).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(s: Column) -> Column:
    """The string plus every single-character-deletion of it (array)."""
    one_deleted = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            s.substr(F.lit(1), i - 1), s.substr(i + 1, F.length(s))
        ),
    )
    return F.array_append(one_deleted, s)


def fuzzy_self_pairs(
    df: DataFrame,
    col: str,
    id_col: str,
    max_edits: int = 1,
) -> DataFrame:
    """(id_a, id_b, a, b, dist): pairs with ``lev(a, b) <= max_edits``.

    ``max_edits`` must be 1 (the depth the deletion blocking is complete
    for). Pairs are id-ordered and distinct; identical strings pair too
    (dist 0) — filter ``dist > 0`` if exact dups are handled elsewhere.
    """
    if max_edits != 1:
        raise ValueError("deletion blocking is complete only for max_edits=1")
    base = df.select(F.col(id_col).alias("id"), F.col(col).alias("s"))
    posts = base.select(
        "id", "s", F.explode(deletion_variants(F.col("s"))).alias("var")
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
