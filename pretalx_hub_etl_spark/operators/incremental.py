"""Incremental aggregate maintenance (IVM) from a CDC change feed.

At 100 TB, recomputing a grouped aggregate because 0.1% of rows changed
is the single biggest avoidable cost in a warehouse. This operator
maintains a materialized SUM/COUNT aggregate from the change feed
(`sinks.merge.version_diff`) instead: each change row contributes a
signed delta — delete retracts the old payload, insert adds the new one,
update does both (which also handles a row MOVING between groups) — and
one groupBy folds the deltas into the previous aggregate state. Cost is
O(|delta| + |groups touched|), independent of the fact table size.

Only works for ALGEBRAIC aggregates (sum, count, and anything derivable
from maintained sums: avg, stddev via moment sums). min/max are NOT
maintainable under deletes without re-scanning the group — refuse rather
than silently recompute.

Exactness: maintain integer columns (e.g. fixed-point cents) so the fold
is order-independent and the maintained state is bit-identical to a
from-scratch aggregation — float sums would drift by merge order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def agg_state(df: DataFrame, group_col: Column, sum_col: Column) -> DataFrame:
    """Materialize the aggregate state (grp, cnt, total) from scratch."""
    return (
        df.groupBy(group_col.alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(sum_col).alias("total"),
        )
    )


def apply_agg_delta(
    state: DataFrame,
    diff: DataFrame,
    group_expr,
    sum_expr,
) -> DataFrame:
    """Fold a CDC diff into the aggregate state; returns the new state.

    ``diff`` is `version_diff` output: (key, change, old struct, new
    struct). ``group_expr(payload_col)`` / ``sum_expr(payload_col)`` map a
    payload struct column to the grouping value / summed value, so the
    same expressions derive the delta's contributions from ``old`` and
    ``new`` sides. Groups whose count reaches zero are dropped (they no
    longer exist in the base table).

    Scale shape: the retract/add union is 2×|diff| rows; one shuffle on
    the group key folds it with the (groups-sized) previous state. The
    fact table is never read.
    """
    retract = diff.filter(F.col("change").isin("delete", "update")).select(
        group_expr(F.col("old")).alias("grp"),
        F.lit(-1).alias("cnt"),
        (-sum_expr(F.col("old"))).alias("total"),
    )
    add = diff.filter(F.col("change").isin("insert", "update")).select(
        group_expr(F.col("new")).alias("grp"),
        F.lit(1).alias("cnt"),
        sum_expr(F.col("new")).alias("total"),
    )
    return (
        state.select("grp", "cnt", "total")
        .unionByName(retract)
        .unionByName(add)
        .groupBy("grp")
        .agg(F.sum("cnt").alias("cnt"), F.sum("total").alias("total"))
        .filter(F.col("cnt") > 0)
    )
