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


# --- incremental DISTINCT counting (append-only, bitmap pages) --------------


def distinct_state(
    df: DataFrame, group_col: Column, id_col: Column
) -> DataFrame:
    """Materialize distinct-count state as mergeable bitmap pages:
    ``(grp, bucket, bm)``.

    COUNT/SUM fold under deltas (``apply_agg_delta``); COUNT(DISTINCT)
    does NOT — a plain counter cannot know whether an arriving id is
    new. The classic fix is auxiliary state that absorbs duplicates
    idempotently: Spark 4's bitmap pages (32k-bit blocks keyed by
    ``bitmap_bucket_number``). State size is O(id-range) bits per
    group, the merge is a bitwise OR — associative, commutative,
    idempotent — so maintenance never re-reads the fact table and
    re-delivered rows are harmless (exactly the at-least-once delivery
    a CDC/stream feed gives).
    """
    return (
        df.groupBy(
            group_col.alias("grp"),
            F.bitmap_bucket_number(id_col).alias("bucket"),
        ).agg(
            F.bitmap_construct_agg(F.bitmap_bit_position(id_col)).alias("bm")
        )
    )


def apply_distinct_delta(
    state: DataFrame, delta_state: DataFrame
) -> DataFrame:
    """OR-merge new bitmap pages into the state; returns the new state.

    APPEND-ONLY by construction: a bitmap cannot retract an id (it holds
    no per-id multiplicity). For feeds with deletes, keep per-(grp,
    bucket, position) counts instead — a strictly heavier state — or
    rebuild affected groups; this operator refuses nothing but
    documents that deletes folded in as inserts would overcount, so
    callers must route only inserts here.

    Cost: one shuffle of |delta pages| + |state pages touched|, never
    the fact table.
    """
    return (
        state.unionByName(delta_state)
        .groupBy("grp", "bucket")
        .agg(F.bitmap_or_agg(F.col("bm")).alias("bm"))
    )


def distinct_counts(state: DataFrame) -> DataFrame:
    """``(grp, n_distinct)`` from the bitmap-page state (popcount sum)."""
    return state.groupBy("grp").agg(
        F.sum(F.bitmap_count(F.col("bm"))).alias("n_distinct")
    )
