"""Join operators.

The reference implements every join as an O(n·m) nested Python loop
(main.py:136-142, 151-157). Here each becomes a declarative DataFrame join so
Catalyst picks hash strategies, and the semantic quirks (first-match-wins,
case-insensitive keys) are made explicit and deterministic.

Scale notes (100 TB design point):
- Small dims are broadcast (`F.broadcast`) — no shuffle of the fact side.
- Large-large equi-joins shuffle on the key; AQE skew-join handles hot keys.
- The range join avoids Spark's BroadcastNestedLoopJoin fallback by
  bucketizing the range key into equi-join buckets (linear work per bucket),
  which is the only shape that survives a 100× scale-up.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_lookup(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Broadcast-hash join of a fact table against a small dim.

    Spark-first port of the reference's in-memory lookup dicts
    (``speaker_map`` main.py:107-110, ``MAP_ROOMS`` settings.py.template:7-11):
    the dict IS a hand-rolled broadcast hash table; here the broadcast hint
    makes that explicit and keeps the fact side shuffle-free.
    """
    return fact.join(F.broadcast(dim), on, how)


def first_match_left_join(
    src: DataFrame,
    tgt: DataFrame,
    on: Sequence[str],
    order_by: Sequence[Column | str],
    flag_col: str = "op_flag",
    match_flag: str = "update",
    miss_flag: str = "create",
) -> DataFrame:
    """Left join with deterministic FIRST-MATCH semantics on the target side.

    The reference scans target events and takes the first tag match, then
    ``break``s (main.py:133-143) — under duplicate keys only one target row
    may pair with each source row. Port: rank the target by ``order_by``
    within each key (`row_number`) and keep rank 1 BEFORE joining, which is
    (a) deterministic where the reference was input-order-dependent, and
    (b) one shuffle of the target, not an O(n·m) scan.

    Adds ``flag_col``: `match_flag` when a target row matched, else
    `miss_flag` (the reference's create/update classification).
    """
    w = Window.partitionBy(*[F.col(c) for c in on]).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order_by]
    )
    tgt_first = (
        tgt.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumn("__matched", F.lit(True))
    )
    joined = src.join(tgt_first, list(on), "left")
    return joined.withColumn(
        flag_col,
        F.when(F.col("__matched").isNotNull(), F.lit(match_flag)).otherwise(F.lit(miss_flag)),
    ).drop("__matched")


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with explicit key salting for a skewed left side.

    AQE's skew-join split (on by default in this engine) handles most skew;
    this is the manual form for engines/joins where AQE can't apply (e.g.
    the skewed side feeds a single hot key into a non-AQE stage). The
    skewed side gets a deterministic salt in [0, salt_buckets) hashed from
    its whole row; the small side is exploded across every salt value, so
    the hot key's rows spread over ``salt_buckets`` reducers.

    Cost: small side is replicated ``salt_buckets``× — use only when the
    small side is dim-sized (same regime as a broadcast, but salting still
    helps when the *output* of the join is what's skewed).
    """
    skew_cols = [F.col(c) for c in skewed.columns]
    lhs = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*skew_cols), F.lit(salt_buckets)).cast("int")
    )
    rhs = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return lhs.join(rhs, [on, "__salt"], how).drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_values: Sequence[str] = (),
    matched_prefix: str = "matched_",
    tolerance: Column | None = None,
) -> DataFrame:
    """Backward as-of join: latest right row with ``right.ts <= left.ts``.

    Spark has no native as-of join; the naive formulation (theta-join on
    ``r.ts <= l.ts`` + row_number) explodes to O(n·m) per key. This is the
    union-sort formulation — ONE shuffle, linear work:

      1. union both sides on (key, ts) with right rows sorted before left
         rows at equal ts (backward-inclusive semantics),
      2. per key, in ts order, carry the most recent right values forward
         with ``last(col, ignorenulls=True)`` over an unbounded-preceding
         row frame,
      3. keep only left rows — each has inherited the as-of match.

    Output: all left columns + ``{matched_prefix}{right_ts}`` +
    ``{matched_prefix}{v}`` for each v in ``right_values`` (NULL when no
    right row precedes). With ``tolerance`` (an INTERVAL column, e.g.
    ``F.expr("INTERVAL 1 HOUR")``), matches older than ``left_ts -
    tolerance`` are nulled out.

    Ties: if the right side has duplicate (key, ts) rows the carried row is
    arbitrary among them — pre-aggregate the right side to one row per
    (key, ts) for deterministic output.
    """
    keys = [on] if isinstance(on, str) else list(on)
    mts = f"{matched_prefix}{right_ts}"
    matched_cols = [mts, *(f"{matched_prefix}{c}" for c in right_values)]
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.col(right_ts).alias(mts),
        *[F.col(c).alias(f"{matched_prefix}{c}") for c in right_values],
    ).withColumn("__is_left", F.lit(0))
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *left.columns,
        F.col("__is_left"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in matched_cols],
    ).filter(F.col("__is_left") == 1)
    if tolerance is not None:
        within = F.col(mts) >= F.col(left_ts) - tolerance
        filled = filled.select(
            *left.columns,
            F.col("__is_left"),
            *[F.when(within, F.col(c)).otherwise(F.lit(None)).alias(c)
              for c in matched_cols],
        )
    return filled.drop("__is_left")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    extra_on: Sequence[str] = (),
) -> DataFrame:
    """Interval join: pair (l, r) where ``r.ts <= l.ts < r.ts + window``.

    Spark has no native range join; a raw theta-join degenerates to
    BroadcastNestedLoopJoin (O(n·m) — fine at 6k rows, dead at 100 TB).
    Scale path: bucketize both sides into `window_seconds`-wide epoch
    buckets; each right row can only match left rows in its own or the next
    bucket, so explode the right side into those two bucket ids and equi-join
    on bucket (+ any ``extra_on`` keys), then filter the exact range
    predicate. Work is linear in matches per bucket and shuffles hash-
    partition on the bucket key.
    """
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / window_seconds).cast("long")
    rb = F.floor(F.unix_timestamp(F.col(right_ts)) / window_seconds).cast("long")
    lhs = left.withColumn("__bucket", lb)
    rhs = right.withColumn(
        "__bucket", F.explode(F.array(rb.cast("long"), (rb + 1).cast("long")))
    )
    on = ["__bucket", *extra_on]
    cond = (F.col(left_ts) >= F.col(right_ts)) & (
        F.col(left_ts) < F.col(right_ts) + F.make_interval(secs=F.lit(window_seconds))
    )
    return lhs.join(rhs, on, "inner").filter(cond).drop("__bucket")


def point_in_time_join(
    facts: DataFrame,
    dim_versions: DataFrame,
    key: str,
    fact_ts: str,
    version_ts: str,
    version_values: Sequence[str],
    matched_prefix: str = "version_",
) -> DataFrame:
    """Point-in-time (SCD2 / FOR SYSTEM_TIME AS OF) join: each fact row
    picks the dimension version valid AT its timestamp — the version
    with the latest ``version_ts`` <= ``fact_ts`` (J9).

    Semantically this is the interval join against the SCD2 validity
    table (``valid_from <= ts < valid_to``); executing it that way costs
    building the intervals (one window) AND a range join. Because SCD2
    intervals are by construction non-overlapping and gap-free from the
    first version onward, "the version whose interval contains ts" IS
    "the latest version at-or-before ts" — so the engine plans it as
    the union-sort as-of carry (``asof_join``): ONE shuffle on the key,
    linear work, no interval table, no range join. An external replay
    can use the naive interval formulation; results are identical
    (facts before the first version get NULLs — LEFT semantics).

    ``dim_versions`` must have one row per (key, version_ts) —
    pre-aggregate if a key can version twice in one tick, or the
    carried row is arbitrary among the ties (the asof_join contract).
    """
    return asof_join(
        facts,
        dim_versions,
        on=key,
        left_ts=fact_ts,
        right_ts=version_ts,
        right_values=list(version_values),
        matched_prefix=matched_prefix,
    )
