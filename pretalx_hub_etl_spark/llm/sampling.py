"""Deterministic sampling operators for training-data pipelines.

Corpus subsampling at 100 TB must be (a) a pure per-row filter — no
shuffle, no driver round-trip, fully pushed into the scan stage — and
(b) reproducible across reruns and engines (a training set that changes
under retry is a silent experiment-killer). Both operators therefore
sample by hashing a stable id into [0, denom) and keeping rows under a
cutoff, instead of `df.sample()` (whose output depends on partitioning).

``mode="hash"`` (default) uses xxhash64 — decorrelated from id assignment
order. ``mode="modulo"`` uses `id % denom` — correlated with sequential
ids but expressible in ANSI SQL, which is what the DuckDB-oracle parity
checks exercise.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DENOM = 10_000

#: Knuth multiplicative hash constant (2^32 / phi), also used by
#: curation.shuffle_order.
KNUTH_C = 2654435761


def _slot(id_col: str, mode: str, seed: int) -> Column:
    if mode == "hash":
        return F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(_DENOM))
    if mode == "modulo":
        return F.pmod(F.col(id_col) + F.lit(seed), F.lit(_DENOM))
    raise ValueError(f"unknown sampling mode {mode!r}")


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str,
    mode: str = "hash",
    seed: int = 0,
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per row from a stable id."""
    return df.filter(_slot(id_col, mode, seed) < int(fraction * _DENOM))


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    val_fraction: float = 0.01,
    test_fraction: float = 0.01,
    mode: str = "hash",
    seed: int = 0,
) -> DataFrame:
    """Append ``split`` ∈ {train, val, test} decided per row from the id.

    The holdout assignment every training pipeline needs: pure per-row
    expression (no shuffle, no sampling state), reproducible across
    reruns, engines, and — critically — across corpus growth: a document's
    split never changes when other documents are added or removed, so
    yesterday's eval set is still disjoint from today's training set.
    Slots [0, val) -> val, [val, val+test) -> test, rest -> train.
    """
    val_cut = int(val_fraction * _DENOM)
    test_cut = val_cut + int(test_fraction * _DENOM)
    slot = _slot(id_col, mode, seed)
    return df.withColumn(
        "split",
        F.when(slot < val_cut, F.lit("val"))
        .when(slot < test_cut, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    id_col: str,
    default_fraction: float = 0.0,
    mode: str = "hash",
    seed: int = 0,
) -> DataFrame:
    """Per-stratum sampling fractions (e.g. rebalance a corpus by lang).

    One CASE expression per stratum — still a pure filter; no groupBy, no
    `sampleBy` (which is partitioning-dependent). Strata absent from
    ``fractions`` fall back to ``default_fraction``.
    """
    cutoff: Column = F.lit(int(default_fraction * _DENOM))
    for value, frac in sorted(fractions.items()):
        cutoff = F.when(
            F.col(strata_col) == value, F.lit(int(frac * _DENOM))
        ).otherwise(cutoff)
    return df.filter(_slot(id_col, mode, seed) < cutoff)


def weighted_sample(
    df: DataFrame,
    weight: Column | None = None,
    id_col: str = "doc_id",
    weight_num: Column | None = None,
    weight_den: Column | None = None,
) -> DataFrame:
    """Deterministic per-row Bernoulli keep with probability ``weight``
    — quality-weighted / importance sampling.

    The coin is a Knuth multiplicative hash of the id mapped to
    [0, 2^32); the id is masked to 31 bits before multiplying so the
    product stays inside int64 in EVERY engine (unmasked ids >= ~3.5e9
    would silently wrap in Spark but promote to HUGEINT in DuckDB,
    breaking cross-engine reproducibility).

    Two keep-test forms:

    * ``weight_num`` / ``weight_den`` (integer columns, the exact path):
      keep iff ``coin * den < num * 2^32`` — pure 64-bit integer
      arithmetic, never a float compare, bit-identical in any engine.
      Safe for ``den`` up to 2^22 (product bound 2^54 < int64 max).
    * ``weight`` (a float column in [0, 1], the convenient path): keep
      iff ``coin < weight * 2^32`` in doubles — exact only when
      ``weight * 2^32`` is exactly representable; boundary ids can
      differ across engines by one rounding step otherwise.

    Zero shuffle either way — the filter fuses into the scan.
    """
    coin = F.pmod(
        F.pmod(F.col(id_col).cast("long"), F.lit(1 << 31)) * F.lit(KNUTH_C),
        F.lit(2**32),
    )
    if (weight_num is None) != (weight_den is None):
        raise ValueError("weight_num and weight_den must be given together")
    if weight_num is not None:
        if weight is not None:
            raise ValueError("pass either weight or weight_num/weight_den")
        keep = coin * weight_den.cast("long") < weight_num.cast("long") * F.lit(2**32)
    elif weight is not None:
        keep = coin < weight * F.lit(2**32)
    else:
        raise ValueError("one of weight or weight_num/weight_den is required")
    return df.filter(keep)


def md5_u32(col: Column) -> Column:
    """First 8 hex chars of md5 as a uint32-ranged BIGINT — the
    engine-portable hash primitive (DuckDB: ``('0x'||substr(md5(x),1,8))
    ::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def mixture_keys(
    doc_id_col: str = "doc_id", source_col: str = "source"
) -> tuple[Column, Column, Column]:
    """The source-mixture interleave's three deterministic keys —
    (weight_tenths, keep_bucket, mix_key) — shared by
    ``q_mixture_interleave`` and the composed ``q_pipeline_pretrain``
    (one implementation, two callers).

    weight_tenths in 1..8 is a pure md5 function of the domain name
    (stand-in for a user-supplied weights table); keep iff
    ``bucket·10 < weight·2^32`` (all-integer, no float boundary);
    mix_key orders the global interleave.
    """
    weight = F.lit(1) + md5_u32(F.col(source_col)) % 8
    bucket = md5_u32(
        F.concat(F.lit("mix:"), F.col(doc_id_col).cast("string"))
    )
    mix_key = F.md5(
        F.concat(F.lit("ord:"), F.col(doc_id_col).cast("string"))
    )
    return weight.cast("long"), bucket, mix_key


def temperature_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    total_target: int,
    temperature: float = 2.0,
) -> DataFrame:
    """Temperature-scaled mixture resampling (L39): per-group budgets
    ``k_g ∝ n_g^(1/T)``, filled by deterministic md5 rank.

    The standard multilingual/multi-source rebalancing recipe
    (``p_l ∝ p_l^alpha``, alpha = 1/T — mBERT/XLM-R exponent-smoothed
    sampling): T=1 keeps natural proportions, T→∞ approaches uniform,
    intermediate T up-weights tail groups without flattening heads.

    Determinism/portability: only T=2 (alpha = 0.5) is accepted, because
    ``sqrt`` is the ONE power IEEE-754 specifies correctly rounded —
    ``w_g = floor(sqrt(n_g)·1e6 + 0.5)`` is bit-identical on any engine,
    then budgets are exact BIGINT floor divisions ``k_g = total·w_g // Σw``
    and rows fill by (md5(id), id) rank. A general alpha needs ``pow``,
    whose last ulp is libm-dependent — the knife-edge this engine's
    oracle discipline forbids (same reason the LSH planes are integer).

    Scale shape: one map-side-combined count per group (G rows), budgets
    broadcast back, one window shuffle on the group key — corpus scanned
    twice, nothing else grows. Budgets round DOWN, so Σk_g ≤ total.
    """
    if temperature != 2.0:
        raise ValueError(
            "temperature_sample: only T=2 (alpha=0.5, exact IEEE sqrt) "
            "is supported — general pow() is not engine-portable"
        )
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    w = F.floor(F.sqrt(F.col("__n").cast("double")) * 1_000_000 + F.lit(0.5)).cast(
        "long"
    )
    weights = counts.select(group_col, w.alias("__w"))
    tot_w = weights.agg(F.sum("__w").alias("__tw"))
    # exact BIGINT floor division via the pmod trick (operators/graph.py
    # _fdiv shape) — a double division could misfloor an exact-integer
    # quotient by one ulp
    num = F.lit(int(total_target)).cast("long") * F.col("__w")
    budgets = weights.crossJoin(F.broadcast(tot_w)).select(
        group_col,
        ((num - F.pmod(num, F.col("__tw"))) / F.col("__tw"))
        .cast("long")
        .alias("__k"),
    )
    win = Window.partitionBy(group_col).orderBy(
        md5_u32(F.concat(F.lit("t:"), F.col(id_col).cast("string"))).asc(),
        F.col(id_col).asc(),
    )
    return (
        df.join(F.broadcast(budgets), group_col)
        .withColumn("__r", F.row_number().over(win))
        .filter(F.col("__r") <= F.col("__k"))
        .drop("__r", "__k")
    )
