"""Pre-sink validation / dead-lettering (S5).

The reference validates AFTER submitting each row — it scrapes the target's
error banner and optionally blocks on human input (main.py:234-250). The
engine validates BEFORE the sink with a declarative predicate and routes
failures to a quarantine DataFrame (dead-letter pattern): no wasted sink
round-trips, no interactive blocking, and the quarantine table is itself
queryable/persistable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_validity(df: DataFrame, predicate: Column, flag_col: str = "is_valid") -> DataFrame:
    """Annotate rows with the validation verdict (NULL predicate -> invalid)."""
    return df.withColumn(flag_col, F.coalesce(predicate, F.lit(False)))


def validate_split(
    df: DataFrame, predicate: Column, flag_col: str = "is_valid"
) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined) split by predicate.

    Flag once, filter twice off the same plan — with the flagged frame
    persisted by the caller if both sides are consumed, the scan is shared.
    """
    flagged = with_validity(df, predicate, flag_col)
    valid = flagged.filter(F.col(flag_col)).drop(flag_col)
    quarantined = flagged.filter(~F.col(flag_col)).drop(flag_col)
    return valid, quarantined
