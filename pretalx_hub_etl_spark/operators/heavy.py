"""Heavy hitters: Misra-Gries candidate generation + exact verification.

Finding all tokens above a frequency threshold with a full
``groupBy(token).count()`` shuffles EVERY distinct token — at 100 TB
that is a shuffle the size of the corpus vocabulary, almost all of it
long-tail garbage that can never qualify. The two-pass
sketch-then-verify pattern avoids it:

1. **Candidates** — each partition runs the Misra-Gries summary (Misra
   & Gries, "Finding repeated elements", 1982) with ``k`` counters: a
   stream item either increments its counter, claims a free one, or
   decrements all. Guarantee: an item with in-partition frequency
   ``> n_p/k`` always holds a counter. Summing the guarantee over
   partitions: any item with GLOBAL frequency ``>= n/k`` appears in at
   least one partition's counter set — so the union of per-partition
   candidates is a SUPERSET of every item at or above threshold
   fraction ``1/k``. The union is at most ``k × P`` rows — counters ×
   partitions, never vocabulary-sized.
2. **Verify** — exact counts for candidates only: semi-join the corpus
   against the broadcast candidate set, one map-side-combined groupBy
   over the (tiny) surviving stream, filter to the threshold.

The output is EXACT (the sketch only proposes; the recount disposes),
which is what lets the operator carry a plain GROUP BY/HAVING DuckDB
oracle — the "approximate candidates, exact answer" pattern, same
shape as the LSH/IVF/PQ rerank steps and the prefix-filter verify.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries(values: Iterator[str], k: int) -> dict[str, int]:
    counters: dict[str, int] = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            dead = [key for key in counters if counters[key] == 1]
            for key in counters:
                counters[key] -= 1
            for key in dead:
                del counters[key]
    return counters


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    min_count: int,
    k: int | None = None,
) -> DataFrame:
    """``(value, n)``: every value occurring at least ``min_count``
    times, exactly.

    ``k`` (counters per partition) defaults to ``n // min_count + 1``
    computed from the corpus size, which makes the Misra-Gries
    candidate union a guaranteed superset of the qualifying set; pass
    a larger ``k`` to trade candidate-set size for skew tolerance.
    ``min_count`` must be a meaningful heavy-hitter threshold —
    ``min_count <= n/k`` degrades k toward the vocabulary size and the
    plain groupBy becomes the better plan (use ``word_counts`` /
    ``q_text_termfreq`` for full counting).
    """
    src = df.select(F.col(value_col).cast("string").alias("v"))
    if k is None:
        n = src.count()
        k = max(1, n // max(min_count, 1)) + 1

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one summary per PARTITION (batch boundaries are invisible to
        # the stream). The MG logic is INLINED rather than calling the
        # module-level helper: a local closure cloudpickles by VALUE,
        # while a module-level reference requires Python workers to
        # import this package — which the external driver's plain
        # session cannot (sys.path is driver-side only).
        import pandas as pd  # noqa: F811 — worker-side import

        counters: dict[str, int] = {}
        for pdf in batches:
            for v in pdf["v"]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = [key for key in counters if counters[key] == 1]
                    for key in counters:
                        counters[key] -= 1
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"v": list(counters.keys())})

    cands = src.mapInPandas(mg, "v string").distinct()
    return (
        src.join(F.broadcast(cands), "v", "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .select(F.col("v").alias("value"), "n")
    )
