"""Exact substring-level deduplication (the Lee et al. "Deduplicating
Training Data Makes Language Models Better" modality): find token spans
that repeat ACROSS documents, not just whole-doc or whole-doc-near dupes.

The reference pipeline passes text through opaquely (reference
``main.py:116,122`` — no text analytics at all); this operator is part of
the builder brief's training-data extension family (L2f).

Spark formulation (no suffix array — gram postings are the
shuffle-native equivalent):

1. tokenize (whitespace split, empties dropped) — pure codegen;
2. slide a k-token window over each doc and hash each window with md5
   (engine-portable, unlike xxhash64) via ``transform`` over
   ``sequence`` — an array expression fused into the scan, zero UDFs;
3. posexplode to (doc_id, pos, gram) postings — ONE corpus-sized
   shuffle keyed on the gram hash;
4. grams whose distinct-doc frequency >= min_doc_freq are duplicate
   grams; a semi-join marks every posting window covered by one;
5. per-doc interval union (the island window shape shared with
   q_interval_coverage) merges overlapping/adjacent windows into
   maximal duplicate spans.

Scale posture: the postings table is |corpus tokens|-sized — the
inherent cost of substring dedup — and everything downstream of the
gram groupBy is bounded by the number of DUPLICATED windows, not the
corpus. The island window partitions by doc_id (high cardinality, no
single-reducer stage). Candidate marking is a semi-join keyed on the
gram hash, never an all-pairs comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.partitioning import fan_out


def _tokens(text_col: str) -> F.Column:
    return F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
    )


def gram_postings(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(doc_id, pos, g): md5 hash of every k-token sliding window, with
    1-based positions — the shared substrate of :func:`duplicate_spans`
    (find) and :func:`remove_duplicate_spans` (apply)."""
    toks = _tokens(text_col)
    n = F.size(toks)
    # sequence(1, n-k+1) would generate a DESCENDING [1, 0] when n < k
    # (Spark auto-steps -1); guard with an empty array instead
    idx = F.when(
        n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, k)))
    )
    # the sliding-window md5 work is scan-fused, so its parallelism is
    # the INPUT's split count — a few-MB documents table is one split
    # and the whole gram pass ran on one core (r17; fan_out no-ops on
    # wide corpora)
    return fan_out(df).select(
        F.col(id_col).alias("doc_id"), F.posexplode(grams).alias("p0", "g")
    ).select("doc_id", (F.col("p0") + 1).cast("long").alias("pos"), "g")


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_doc_freq: int = 2,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    A k-token window is *duplicated* when its md5 gram hash occurs in at
    least ``min_doc_freq`` DISTINCT documents.  Overlapping or adjacent
    (gap 0) duplicated windows merge into one span.  Returns one row per
    maximal span: ``(doc_id, span_start, span_end, span_tokens,
    n_windows)`` with 1-based inclusive token positions.
    """
    posting = gram_postings(df, text_col, id_col, k)
    posting = posting.persist()  # scanned twice: df() agg + candidate join
    dup = (
        posting.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_doc_freq)
        .select("g")
    )
    cand = posting.join(dup, "g", "left_semi").select(
        "doc_id",
        F.col("pos").alias("s"),
        (F.col("pos") + F.lit(k - 1)).alias("e"),
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_e = F.max("e").over(w_prev)
    flagged = cand.withColumn(
        "new_island",
        F.when(
            prev_e.isNull() | (F.col("s") > prev_e + 1), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    isl = flagged.withColumn("island", F.sum("new_island").over(w_run))
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("s").alias("span_start"),
            F.max("e").alias("span_end"),
            (F.max("e") - F.min("s") + 1).alias("span_tokens"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            "doc_id", "span_start", "span_end", "span_tokens", "n_windows"
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """APPLY substring-level dedup: cut duplicated spans, keeping each
    duplicated gram's occurrence only in its lowest-id owning document.

    Keep-first-owner policy (deterministic, engine-portable): for every
    gram with distinct-doc frequency >= 2, the doc with the MINIMUM
    doc_id among its owners keeps its windows; every other doc removes
    theirs.  Removed windows union into spans; surviving tokens rejoin
    in position order.  One row per input doc: ``(doc_id, clean_text,
    n_tokens, n_removed)`` — docs with nothing to cut pass through, a
    fully-duplicated doc yields an empty clean_text.

    Scale shape: the posting shuffle and the token reassembly are the
    two corpus-token-sized stages (inherent to the operation); the
    covered-position explode is bounded by k × removed windows, never
    the corpus. The reassembly groupBy collects (pos, token) structs per
    doc — bounded by per-doc length, the same bound any text rewrite
    carries.
    """
    posting = gram_postings(df, text_col, id_col, k).persist()
    owners = (
        posting.groupBy("g")
        .agg(
            F.min("doc_id").alias("min_doc"),
            F.countDistinct("doc_id").alias("df"),
        )
        .filter(F.col("df") >= 2)
        .select("g", "min_doc")
    )
    removed = (
        posting.join(owners, "g")
        .filter(F.col("doc_id") != F.col("min_doc"))
        .select(
            "doc_id",
            F.col("pos").alias("s"),
            (F.col("pos") + F.lit(k - 1)).alias("e"),
        )
    )
    covered = removed.select(
        "doc_id", F.explode(F.sequence("s", "e")).alias("p")
    ).distinct()

    base = fan_out(df).select(
        F.col(id_col).alias("doc_id"), _tokens(text_col).alias("t")
    )
    base = base.persist()  # token explode + final left join
    tok = base.select(
        "doc_id", F.posexplode("t").alias("p0", "tk")
    ).select("doc_id", (F.col("p0") + 1).cast("long").alias("p"), "tk")
    kept = tok.join(covered, ["doc_id", "p"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tk"))),
                lambda x: x.getField("tk"),
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        F.size("t").cast("long").alias("n_tokens"),
        (F.size("t") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
    )
