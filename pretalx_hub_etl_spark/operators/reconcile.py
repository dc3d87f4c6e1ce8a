"""Reconcile / merge planner — the engine's flagship operator (SURVEY.md ST5).

The reference's entire Transform phase (main.py:105-166) is a stateful merge
computed with two nested-loop passes: classify each source row as
create/update against the target (main.py:133-143), then a reverse pass
emitting deletes for targets absent from the source (main.py:150-163).

Spark-first: ONE full-outer join on the (normalized) key produces the whole
plan — ``op_flag ∈ {create, update, delete, noop}`` — in a single shuffle.
The reference cannot express "noop" (it always rewrites matched rows; its
README documents the destructive-overwrite caveat); the engine classifies
unchanged rows as noop so a sink can skip them.

Scale notes: the full-outer join hash-partitions both sides on the key —
the same partitioning a downstream keyed sink wants, so no extra exchange.
Skewed keys are handled by AQE skew-join splitting. `noop` rows can be
filtered before the sink, which at 100 TB is the difference between
rewriting the world and touching only the delta.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OP_CREATE = "create"
OP_UPDATE = "update"
OP_DELETE = "delete"
OP_NOOP = "noop"


def reconcile(
    src: DataFrame,
    tgt: DataFrame,
    key: Sequence[str],
    compare: Sequence[str] = (),
    src_prefix: str = "src_",
    tgt_prefix: str = "tgt_",
    flag_col: str = "op_flag",
    normalize_key: bool = False,
) -> DataFrame:
    """Full-outer reconcile of a source snapshot against a target snapshot.

    Output columns: the key columns (coalesced across sides), every
    ``compare`` column from both sides prefixed ``src_``/``tgt_``, and
    ``flag_col``:

    - ``create``: key only in src (reference main.py:134 default branch)
    - ``delete``: key only in tgt (reference main.py:150-163 reverse pass)
    - ``update``: key on both sides, any compare column differs
      (NULL-safely) (reference main.py:140)
    - ``noop``:   key on both sides, all compare columns equal

    ``normalize_key=True`` lowercases string key columns on both sides
    before joining (the reference lowers its tag keys, main.py:135-155) —
    computed once per row, not per comparison.
    """
    def prep(df: DataFrame, prefix: str) -> DataFrame:
        cols: list[Column] = []
        for k in key:
            c = F.col(k)
            if normalize_key and dict(df.dtypes).get(k) == "string":
                c = F.lower(c)
            cols.append(c.alias(k))
        cols.extend(F.col(c0).alias(f"{prefix}{c0}") for c0 in compare)
        return df.select(*cols).withColumn(f"__in_{prefix.rstrip('_')}", F.lit(True))

    s = prep(src, src_prefix)
    t = prep(tgt, tgt_prefix)
    joined = s.join(t, list(key), "full_outer")

    in_src = F.col("__in_src").isNotNull()
    in_tgt = F.col("__in_tgt").isNotNull()
    changed = F.lit(False)
    for c in compare:
        changed = changed | ~F.col(f"{src_prefix}{c}").eqNullSafe(F.col(f"{tgt_prefix}{c}"))

    flag = (
        F.when(in_src & ~in_tgt, F.lit(OP_CREATE))
        .when(~in_src & in_tgt, F.lit(OP_DELETE))
        .when(changed, F.lit(OP_UPDATE))
        .otherwise(F.lit(OP_NOOP))
    )
    return joined.withColumn(flag_col, flag).drop("__in_src", "__in_tgt")


def apply_plan_counts(plan: DataFrame, flag_col: str = "op_flag") -> DataFrame:
    """Summary counts per op (the reference prints these, main.py:146,165)."""
    return plan.groupBy(flag_col).agg(F.count(F.lit(1)).alias("n"))
