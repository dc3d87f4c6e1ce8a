"""Grid-bucketed spatial distance joins.

Spark has no spatial join; the naive form — crossJoin + distance
filter — is O(n²) and dead at any scale. The standard fix (the
Sedona/Magellan playbook, and the same blocking idea as the MinHash and
symmetric-delete operators) is **grid partitioning**: hash each point
into a square cell whose side equals the search radius, then a pair
within the radius can only live in the same or an adjacent cell — so a
9-cell neighborhood equi-join replaces the cross join.

Coordinates are **nonnegative integers** (micro-degrees, millimeters —
any fixed-point unit): integer cells avoid float-boundary ambiguity,
and the squared distance stays an exact BIGINT, so results value-hash
across engines with no epsilon.

Scale shape: one shuffle on cell keys with a constant 9× replication of
one side; candidate pairs are bounded by Σ(cell population)² like every
blocking scheme — dense cells are a data property, and AQE skew-split
handles outliers. No driver-side state, no index build.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(coord: Column, size: int) -> Column:
    # exact floor division for nonnegative integer coords: the
    # subtraction makes the numerator exactly divisible, so the double
    # division is exact for any value < 2^53
    return ((coord - F.pmod(coord, F.lit(size))) / F.lit(size)).cast("long")


def grid_distance_self_join(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """All pairs ``(id_a < id_b)`` within squared Euclidean distance
    ``radius²``, as ``(id_a, id_b, dist2)`` with ``dist2`` exact.

    One side is replicated into its 3×3 cell neighborhood and the other
    stays at its home cell, so each qualifying pair joins on exactly one
    (offset, home) combination — no post-dedup. The ``id_a < id_b``
    filter keeps one orientation of each pair.
    """
    from .partitioning import fan_out

    # cell assignment + neighborhood explode are scan-fused: a one-split
    # points table would run the whole grid join on one core (r17;
    # no-op on wide inputs)
    p = fan_out(points).select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
        _cell(F.col(x_col).cast("long"), radius).alias("cx"),
        _cell(F.col(y_col).cast("long"), radius).alias("cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = p.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(offsets).alias("o"),
        "cx",
        "cy",
    ).select(
        "id_a",
        "xa",
        "ya",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    right = p.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dx, dy = F.col("xa") - F.col("xb"), F.col("ya") - F.col("yb")
    dist2 = (dx * dx + dy * dy).alias("dist2")
    return (
        left.join(right, ["jx", "jy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist2)
        # radius² squared in Python: a 32-bit lit * lit would overflow
        # in ANSI constant folding for micro-degree-sized radii
        .filter(F.col("dist2") <= F.lit(radius * radius).cast("long"))
    )
