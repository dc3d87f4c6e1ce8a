"""Aggregation operators beyond plain ``groupBy().agg()``.

Spark already plans partial (map-side) + final aggregation for every
``groupBy`` — that handles *data volume*. What it cannot fix alone is
*key skew in the final stage*: one hot key's partial results still all
land on one reducer. ``salted_two_level_agg`` is the standard fix —
spread each key over N salt buckets, aggregate, then aggregate the
buckets — for the aggregations where AQE's skew handling doesn't apply
(AQE splits skewed JOIN partitions, not aggregation state).

Only algebraic aggregates (reassociatable: sum/count/min/max, and avg as
sum+count) can be two-leveled; holistic ones (exact median, distinct
lists) cannot — use their approximate forms at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (first-level expr builder, second-level combiner) per supported agg.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_two_level_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-resistant groupBy: per-(key, salt) partials, then per-key final.

    ``aggs`` maps output column -> (agg_name, input_col) with agg_name in
    {sum, count, min, max}. Results are identical to the plain groupBy
    (integer/min/max exactly; float sums up to reassociation, same caveat
    as Spark's own partial aggregation) — but the hot key's rows spread
    over ``salt_buckets`` reducers in the wide first stage, and the second
    stage only sees ``buckets`` rows per key.
    """
    unknown = {a for a, _ in aggs.values()} - set(_ALGEBRAIC)
    if unknown:
        raise ValueError(f"non-algebraic aggs not supported: {sorted(unknown)}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    level1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                _ALGEBRAIC[name][0](col).alias(out)
                for out, (name, col) in aggs.items()
            ]
        )
    )
    return level1.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[name][1](out).alias(out)
            for out, (name, _) in aggs.items()
        ]
    )
