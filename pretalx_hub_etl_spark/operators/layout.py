"""Data-layout operators: multi-dimensional clustering keys.

A single-column sort gives parquet row-group min/max skipping on ONE
column; filters on any other column still scan everything. Z-ordering
(bit-interleaving the dimensions into one key, then range-partitioning and
sorting by it) gives *every* interleaved column partial locality, so
footer statistics prune scans on each of them — the technique behind
Delta/Iceberg's ``OPTIMIZE ZORDER BY`` and the reason it exists at 100 TB:
one layout serves many filter patterns.

The z-value is pure integer bit arithmetic (shift/mask/or), identically
expressible in Spark expressions and ANSI SQL — fully codegen'd, no UDF,
no shuffle (the key computation; the subsequent repartitionByRange is the
one layout shuffle any re-clustering costs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column into one z-value.

    Dimension d's bit i lands at position ``i * n_dims + d`` — the classic
    Morton code. Inputs are masked to ``bits`` bits (values must be
    non-negative; normalize/rank first for arbitrary domains). For 2
    dimensions at 16 bits the result fits in 32 bits; n_dims * bits must
    stay < 63.
    """
    n = len(cols)
    if n * bits >= 63:
        raise ValueError("n_dims * bits must fit in a signed 64-bit key")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    out = F.lit(0).cast("long")
    for d, c in enumerate(cs):
        x = c.cast("long")
        for i in range(bits):
            out = out + (
                F.shiftleft(
                    F.shiftright(x, i).bitwiseAND(F.lit(1)), i * n + d
                )
            )
    return out


def zorder_key_sql(cols: Sequence[str], bits: int = 16) -> str:
    """The identical z-value as an ANSI SQL expression (oracle twin)."""
    n = len(cols)
    terms = []
    for d, c in enumerate(cols):
        for i in range(bits):
            terms.append(f"((({c} >> {i}) & 1) << {i * n + d})")
    return " + ".join(terms)


def cluster_by_zorder(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Re-cluster rows by z-order: range-partition + sort on the z-value.

    The write-side half of the technique: files produced from this layout
    carry tight min/max footer ranges on EVERY interleaved column, so
    later scans filtering on any of them skip most row groups.
    """
    keyed = df.withColumn("__z", zorder_key(list(cols), bits))
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        keyed.repartitionByRange(parts, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def zorder_normalize(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    known_mins: dict | None = None,
) -> tuple[DataFrame, list[str]]:
    """Map arbitrary-domain columns to non-negative ints for z-ordering.

    ``zorder_key`` interleaves the LOW BITS of non-negative integers;
    strings, floats, and negative ints would silently degenerate (a
    string cast to long is NULL -> the whole z-value goes NULL and the
    layout collapses to one range). This prepares each dimension:

    - non-negative integral columns pass through unchanged (their own
      low bits carry the most locality);
    - everything else gets an EQUI-DEPTH RANGE BUCKET id via the
      distributed range-partition trick (Delta's range_partition_id):
      ``repartitionByRange(2^b, col)`` orders the domain across
      partitions and ``spark_partition_id()`` IS the bucket — fully
      distributed, no global-order window, no driver-side quantiles.
      One extra shuffle per normalized column; acceptable for a
      MAINTENANCE op (OPTIMIZE), never on a read path.

    Returns (df with any helper columns added, per-dimension column
    names to interleave). Bucketed dimensions use up to 2^12 buckets
    (12 bits carries the locality; finer buckets just cost shuffles).
    """
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
    )

    int_types = (ByteType, ShortType, IntegerType, LongType)
    out = df
    names: list[str] = []
    for c in cols:
        f = out.schema[c]
        if isinstance(f.dataType, int_types):
            # sign probe: manifest-provided min when the caller has it
            # (zero jobs), else one driver-side agg; negative or
            # unknown domains take the bucket path
            if known_mins is not None and c in known_mins:
                mn = known_mins[c]
            else:
                mn = out.agg(F.min(c)).collect()[0][0]
            if mn is not None and not isinstance(mn, str) and mn >= 0:
                names.append(c)
                continue
        b = min(bits, 12)
        helper = f"__zn_{c}"
        out = out.repartitionByRange(1 << b, F.col(c)).withColumn(
            helper, F.spark_partition_id().cast("long")
        )
        names.append(helper)
    return out, names
