"""Corpus-curation operators for training-data pipelines.

The stages between "raw crawl" and "training batches" that SURVEY.md's
LLM mandate implies but no single reference operator covers:

- ``pii_scrub``: regex redaction of emails / phone numbers / IPv4s —
  pure ``regexp_replace`` + ``regexp_count`` expressions, codegen'd,
  zero shuffle: the scrub rides the scan stage at 100 TB.
- ``repetition_stats``: n-gram repetition quality signal (the "mostly
  boilerplate" filter every crawl pipeline applies): explode n-grams →
  per-doc distinct/total/max-count. One shuffle on doc_id, map-side
  combined.
- ``contamination_overlap``: benchmark-contamination check — documents
  sharing ≥ m raw n-grams with any benchmark document. The benchmark
  side is tiny by construction (eval sets are KBs-MBs), so its exploded
  n-grams BROADCAST; the corpus side never shuffles: explode → broadcast
  hash join → per-doc agg.
- ``pack_sequences``: assign documents to fixed-token-budget training
  packs. Packing is BUCKET-LOCAL by design: a global greedy pack would
  serialize the corpus through one task, and training order inside a
  shard is free to choose anyway. ``mode="chunk"`` splits each bucket's
  running token sum at budget boundaries (pure window expression, SQL-
  expressible, oracle-checkable; packs may overflow by at most one
  document). ``mode="greedy"`` is true first-fit-sequential per bucket
  via ``applyInPandas`` (Arrow-batched; a pack never exceeds the budget
  unless a single document does).
- ``shuffle_order``: deterministic global training-order shuffle — a
  Knuth-multiplicative key per doc. Scale shape: ``repartitionByRange``
  on the key + ``sortWithinPartitions`` gives a total order across
  output files without a single-task global sort.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.core import fixed_point

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
#: TPC-H phone shape (nn-nnn-nnn-nnnn); anchored on digit boundaries.
PHONE_RE = r"\d{2}-\d{3}-\d{3}-\d{4}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_KNUTH = 2654435761  # Knuth multiplicative hash constant (2^32 * phi)


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails/phones/IPv4s; count each redaction type per row.

    Counts come from ``regexp_count`` BEFORE replacement — the audit
    trail a compliance pipeline keeps alongside the scrubbed text.
    """
    t = F.col(text_col)
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        IPV4_RE,
        "<IP>",
    )
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
    )


def _raw_ngrams(text_col: str, n: int) -> Column:
    """All word n-grams (with duplicates) as array<string>."""
    words = F.split(F.col(text_col), " ")
    cnt = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram repetition: total, distinct, max count, ratio.

    ``rep_ratio = 1 - distinct/total`` — 0 for repetition-free text, → 1
    for boilerplate loops. The per-(doc, gram) count aggregates map-side
    before the single doc_id shuffle.
    """
    grams = df.select(
        F.col(id_col), F.explode(_raw_ngrams(text_col, n)).alias("g")
    )
    per_gram = grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_gram.groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("total_grams"),
            F.count(F.lit(1)).cast("long").alias("distinct_grams"),
            F.max("c").cast("long").alias("max_gram_count"),
        )
        .withColumn(
            "rep_ratio",
            # fixed_point, not round(): HALF_UP vs banker's disagreement
            # between engines breaks value-hash parity
            fixed_point(
                1 - F.col("distinct_grams") / F.col("total_grams"), 6
            ),
        )
    )


def contamination_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_overlap: int = 1,
) -> DataFrame:
    """Documents sharing ≥ ``min_overlap`` distinct n-grams with the
    benchmark set (decontamination before training).

    The benchmark's exploded distinct n-grams broadcast (eval sets are
    tiny vs the corpus); corpus grams join without shuffling the corpus.
    Output: doc_id, n_overlapping_grams — one row per contaminated doc.
    """
    doc_grams = docs.select(
        F.col(id_col), F.explode(F.array_distinct(_raw_ngrams(text_col, n))).alias("g")
    )
    bench_grams = (
        benchmark.select(F.explode(F.array_distinct(_raw_ngrams(text_col, n))).alias("g"))
        .distinct()
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlapping_grams"))
        .filter(F.col("n_overlapping_grams") >= min_overlap)
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8,
    mode: str = "chunk",
) -> DataFrame:
    """Assign docs to fixed-token-budget packs within hash buckets.

    Output: (doc_id, bucket, n_tokens, pack_id). Bucket = pmod(id,
    n_buckets) — at scale, set n_buckets ≈ cluster parallelism so each
    bucket's window/greedy scan is one comfortable task, and pack
    identity is the (bucket, pack_id) pair.
    """
    from pyspark.sql import Window

    toks = F.size(F.split(F.col(text_col), " ")).cast("long")
    base = df.select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(n_buckets)).cast("long").alias("bucket"),
        toks.alias("n_tokens"),
    )
    if mode == "chunk":
        w = (
            Window.partitionBy("bucket")
            .orderBy(F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        return base.withColumn(
            "pack_id", F.floor(cum_before / F.lit(budget)).cast("long")
        )
    if mode == "greedy":
        out_schema = (
            f"{id_col} long, bucket long, n_tokens long, pack_id long"
        )

        def pack(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(id_col).reset_index(drop=True)
            packs, fill, cur = [], 0, 0
            for t in pdf["n_tokens"]:
                if fill and fill + t > budget:
                    cur += 1
                    fill = 0
                packs.append(cur)
                fill += t
            pdf["pack_id"] = pd.Series(packs, dtype="int64")
            return pdf[[id_col, "bucket", "n_tokens", "pack_id"]]

        return base.groupBy("bucket").applyInPandas(pack, schema=out_schema)
    raise ValueError(f"unknown packing mode {mode!r}")


def shuffle_order(
    df: DataFrame, id_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Deterministic training-order shuffle key + scale-safe total order.

    ``shuffle_key = ((id + seed) mod 2^31) * KNUTH mod 2^32`` —
    reproducible across engines and reruns (no RNG state). The 2^31 mask
    keeps the product inside int64 (an unmasked id >= ~3.5e9 would
    overflow, wrapping in Spark but promoting to HUGEINT in other
    engines); the odd multiplier is bijective mod 2^32, so keys are
    unique for ids below 2^31 and ties beyond that are broken by the
    secondary ``id`` sort — the output order is total either way. The
    plan range-partitions on the key and sorts within partitions: a
    total order across output shards with NO single-task global sort.
    """
    key = F.pmod(
        F.pmod(F.col(id_col) + F.lit(seed), F.lit(1 << 31)) * F.lit(_KNUTH),
        F.lit(1 << 32),
    ).cast("long")
    keyed = df.withColumn("shuffle_key", key)
    return keyed.repartitionByRange(
        F.col("shuffle_key"), F.col(id_col)
    ).sortWithinPartitions("shuffle_key", id_col)


def _selection_key(id_col: str):
    """The deterministic per-row selection key shared by the cap's exact
    rank and its hot-group pre-filter (Knuth hash, 31-bit input mask)."""
    return F.pmod(
        F.pmod(F.col(id_col), F.lit(1 << 31)) * F.lit(_KNUTH), F.lit(1 << 32)
    )


def thin_hot_groups(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
    overshoot: float = 8.0,
    max_widenings: int = 3,
) -> DataFrame:
    """Bernoulli pre-filter that shrinks hot groups BEFORE an exact
    top-``cap``-by-selection-key rank, provably without changing it.

    The rank window one-tasks each group; hot groups (the skewed keys a
    per-domain cap exists for) would put half the corpus through one
    reducer at 100 TB. Because the rank orders by a hash key uniform in
    [0, 2^32), the true winners of a group of size ``n`` are its ``cap``
    smallest keys — so dropping every row with
    ``key >= 2^32 * cap * overshoot / n`` keeps them as long as at least
    ``cap`` rows survive, which a post-filter guard checks exactly: the
    result is IDENTICAL to the unfiltered rank whenever the guard
    passes (survivors >= cap ⟹ the cap smallest (key, id) pairs all sit
    below the threshold). On a guard miss (probability ~e^-(cap·overshoot/4)
    per hot group by Chernoff; ~e^-40 at the defaults) the threshold is
    doubled and retried; after ``max_widenings`` misses the exact input
    is returned unchanged.

    Scale shape: one count agg (map-side combined, group-cardinality
    rows) to find hot groups, a broadcast of ONLY the hot groups (heavy
    hitters — few by definition) onto the scan, and a tiny survivors agg
    as the guard; the guard's ``collect`` touches one row per hot group,
    never data. Non-hot groups stream through untouched.
    """
    hot_min = int(cap * overshoot)
    hot = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("__gc"))
        .filter(F.col("__gc") > hot_min)
    )
    key = _selection_key(id_col)
    for attempt in range(max_widenings):
        width = cap * overshoot * (2**attempt)
        thr = F.lit(float(1 << 32)) * F.lit(width) / F.col("__gc")
        thinned = df.join(F.broadcast(hot), group_col, "left").filter(
            F.col("__gc").isNull() | (key < thr)
        )
        # exact guard: every hot group must keep >= cap survivors, else
        # a true winner may have been dropped -> widen and retry
        surv = (
            thinned.filter(F.col("__gc").isNotNull())
            .groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("__sc"))
        )
        bad = (
            hot.join(surv, group_col, "left")
            .filter(F.coalesce(F.col("__sc"), F.lit(0)) < cap)
            .limit(1)
            .count()
        )
        if bad == 0:
            # the join moved group_col first: restore the input order so
            # the pre-filter is schema-invisible to the rank consumer
            return thinned.select(*df.columns)
    return df


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
    thin_out: bool = True,
    overshoot: float = 8.0,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically.

    The per-domain cap every crawl-curation pipeline applies (a handful
    of hot domains otherwise dominate the token budget). Selection order
    is the Knuth hash of the id (31-bit-masked, engine-reproducible, see
    :func:`shuffle_order`), id-tiebroken — so the kept subset is a stable
    pseudo-random sample per group, not "whatever sorted first".

    Scale shape: one shuffle on ``group_col`` + a rank window, preceded
    (``thin_out=True``, the default) by :func:`thin_hot_groups` — a
    guarded Bernoulli pre-filter that caps what any one reducer sees at
    ~``cap * overshoot`` rows for hot groups while provably returning
    the same rows the unfiltered rank would. ``thin_out=False`` is the
    reference exact form the pre-filter is verified against.
    """
    from pyspark.sql import Window

    if thin_out:
        df = thin_hot_groups(df, group_col, cap, id_col, overshoot)
    key = _selection_key(id_col)
    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 50,
    stride: int = 25,
) -> DataFrame:
    """Overlapping token-window chunks: one row per (doc, chunk).

    The context-window preprocessing step for long documents: whitespace
    tokens, chunk starts every ``stride`` tokens while inside the doc,
    each chunk spanning ``chunk_tokens`` (the tail chunk is shorter).
    Entirely built-in array expressions — ``split`` once, ``sequence``
    for the starts, ``slice`` per chunk — so chunking fuses into the
    scan stage: zero shuffle, output rows ≈ n_tokens/stride per doc.
    """
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    out = (
        df.withColumn("__toks", toks)
        .withColumn("__n", F.size("__toks"))
        .filter(F.col("__n") > 0)
        .select(
            id_col,
            "__toks",
            "__n",
            F.posexplode(
                F.sequence(F.lit(0), F.col("__n") - 1, F.lit(stride))
            ).alias("chunk_id", "__start"),
        )
    )
    return out.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(
            F.slice(F.col("__toks"), F.col("__start") + 1, F.lit(chunk_tokens)),
            " ",
        ).alias("chunk_text"),
        F.least(F.lit(chunk_tokens), F.col("__n") - F.col("__start"))
        .cast("long")
        .alias("n_tokens"),
    )


__all__ = [
    "pii_scrub",
    "repetition_stats",
    "contamination_overlap",
    "pack_sequences",
    "shuffle_order",
    "cap_per_group",
    "thin_hot_groups",
    "chunk_documents",
]
