"""Pareto-frontier (skyline) extraction over DataFrames.

The skyline of a point set — rows not dominated by any other row — is
the classic multi-criteria "best tradeoffs" operator (Börzsönyi,
Kossmann & Stocker, "The Skyline Operator", ICDE 2001). Spark has no
built-in form; the naive formulation is a quadratic NOT EXISTS
self-join, dead at any scale.

This module implements the 2-D case (minimize one column, maximize the
other) with the sort-scan algorithm made distributive:

**skyline is distributive over union** — ``skyline(A ∪ B) =
skyline(skyline(A) ∪ skyline(B))`` — because a point dominated inside
any subset is dominated in the union, and a dominator of a union point
survives into its own subset's skyline or is itself dominated by a
surviving one (domination is transitive). So the plan is the classic
two-phase combiner shape:

1. reduce to one candidate per x (``max(y) per x`` — any lower y at the
   same x is dominated; one map-side-combined shuffle);
2. partition-LOCAL sort-scan prune (window over
   ``spark_partition_id()``): ordered by x ascending, a point survives
   iff its y strictly exceeds the running max of all smaller-x y's.
   Locally dominated ⇒ globally dominated, so dropping is always safe;
3. the SAME sort-scan globally over the pruned candidates. This window
   is intentionally unpartitioned — by then the input is ~P·E[|skyline
   of a random subset|] rows (E ≈ O(log n) per partition for
   independent dims), not the data. The true skyline itself must fit
   one task: the operator's output is driver-adjacent by definition.

Worst case (perfectly anti-correlated x, y) the skyline IS the input
and no algorithm compresses it; phase 2 then degrades gracefully to a
per-partition sort, and phase 3 carries the output-sized cost any
skyline consumer pays anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x: str,
    y: str,
    minimize_x: bool = True,
    maximize_y: bool = True,
) -> DataFrame:
    """Distinct non-dominated ``(x, y)`` points.

    With the default orientation (minimize x, maximize y), point ``p``
    is dominated iff some ``q`` has ``q.x <= p.x`` and ``q.y >= p.y``
    with at least one strict. Other orientations flip the comparison by
    negating the work columns (exact for numeric types; doubles negate
    bitwise). Output columns keep the input names and values.
    """
    wx = F.col(x) if minimize_x else -F.col(x)
    wy = F.col(y) if maximize_y else -F.col(y)
    # phase 1: one candidate per x — any same-x lower-y point is
    # strictly dominated by the max. Map-side combined single shuffle.
    per_x = (
        df.select(wx.alias("_wx"), wy.alias("_wy"), F.col(x), F.col(y))
        # domination is undefined for NULL coordinates: excluded, like
        # the NOT EXISTS formulation (NULL comparisons are never true)
        .filter(F.col("_wx").isNotNull() & F.col("_wy").isNotNull())
        .groupBy("_wx")
        .agg(
            F.max("_wy").alias("_wy"),
            # carry ONE original-value pair for the surviving candidate
            F.max_by(F.struct(x, y), F.col("_wy")).alias("_orig"),
        )
    )

    def _prune(frame: DataFrame, partition_cols: list[str]) -> DataFrame:
        w = (
            Window.partitionBy(*partition_cols)
            .orderBy("_wx")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        pruned = frame.withColumn("_prev", F.max("_wy").over(w))
        return pruned.filter(
            F.col("_prev").isNull() | (F.col("_prev") < F.col("_wy"))
        ).drop("_prev")

    local = _prune(
        per_x.withColumn("_pid", F.spark_partition_id()), ["_pid"]
    ).drop("_pid")
    return _prune(local, []).select("_orig.*")
