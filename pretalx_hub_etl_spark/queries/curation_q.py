"""Corpus-curation queries (llm.curation): PII scrub, repetition quality,
benchmark decontamination, sequence packing, deterministic shuffle.

Oracle notes:
- the documents table is word-salad with no natural PII, so the scrub
  query CONSTRUCTS representative PII text from TPC-H customer columns
  (name/phone/key) identically on both sides — the operator under test
  is the redaction, not the synthesis;
- DuckDB n-grams replicate the Spark ``_raw_ngrams`` window exactly:
  i ∈ [1, greatest(len(w)-2, 1)] over inclusive slices ``w[i:i+2]``;
- ratios go through the floor-scale fixed-point pattern on both sides
  (never ``round()`` — HALF_UP vs banker's rounding breaks hashes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..llm.curation import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    contamination_overlap,
    pack_sequences,
    pii_scrub,
    repetition_stats,
    shuffle_order,
)
from . import query

# --- PII scrub ---------------------------------------------------------------

# testdata's customer has no phone column — synthesize one from the key
# digits, identically on both sides (the operator under test is redaction)
_PII_TEXT_SQL = (
    "c_name || ' ph 25-989-' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')"
    " || '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || ' mail ' || "
    "lower(replace(c_name, '#', '')) || '@example.com ip 10.0.' || "
    "CAST(c_custkey % 256 AS VARCHAR) || '.1'"
)


def _pii_text_col() -> F.Column:
    return F.concat(
        F.col("c_name"),
        F.lit(" ph 25-989-"),
        F.lpad(F.pmod(F.col("c_custkey"), F.lit(1000)).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad(F.pmod(F.col("c_custkey"), F.lit(10000)).cast("string"), 4, "0"),
        F.lit(" mail "),
        F.lower(F.regexp_replace("c_name", "#", "")),
        F.lit("@example.com ip 10.0."),
        F.pmod(F.col("c_custkey"), F.lit(256)).cast("string"),
        F.lit(".1"),
    )


@query(
    "q_pii_scrub",
    oracle=f"""
    WITH raw AS (
        SELECT c_custkey AS doc_id, {_PII_TEXT_SQL} AS text FROM customer
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(
               text, '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{PHONE_RE}', '<PHONE>', 'g'),
               '{IPV4_RE}', '<IP>', 'g') AS clean_text,
           CAST(length(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(length(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT)
               AS n_phones,
           CAST(length(regexp_extract_all(text, '{IPV4_RE}')) AS BIGINT)
               AS n_ips
    FROM raw
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Redaction is a pure per-row expression chain: at 100 TB it fuses
    # into the scan stage (zero shuffle, WholeStageCodegen), which is the
    # only shape a corpus-wide scrub can afford.
    c = Catalog(spark, sf_dir).customer
    raw = c.select(
        F.col("c_custkey").alias("doc_id"), _pii_text_col().alias("text")
    )
    return pii_scrub(raw)


# --- n-gram machinery shared by repetition + contamination oracles ----------

_GRAMS_CTES = """
    words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    grams AS (
        SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g
        FROM words,
             unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS t(i)
    )
"""


@query(
    "q_text_repetition",
    oracle=f"""
    WITH {_GRAMS_CTES},
    per AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS total_grams,
           CAST(count(*) AS BIGINT) AS distinct_grams,
           CAST(max(c) AS BIGINT) AS max_gram_count,
           CAST(floor((1 - count(*) / CAST(sum(c) AS DOUBLE)) * 1000000.0
                + 0.5) AS BIGINT) / 1000000.0 AS rep_ratio
    FROM per GROUP BY doc_id
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The boilerplate-ratio quality signal: per-(doc, gram) counts combine
    # map-side, then ONE doc_id shuffle; the filter consuming rep_ratio
    # composes downstream without rescanning text.
    d = Catalog(spark, sf_dir).documents
    return repetition_stats(d, n=3)


@query(
    "q_contamination",
    oracle=f"""
    WITH {_GRAMS_CTES},
    dgrams AS (SELECT DISTINCT doc_id, g FROM grams),
    bench AS (SELECT DISTINCT g FROM dgrams WHERE doc_id % 50 = 0),
    corpus AS (SELECT doc_id, g FROM dgrams WHERE doc_id % 50 <> 0)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlapping_grams
    FROM corpus JOIN bench USING (g)
    GROUP BY doc_id
    HAVING count(*) >= 5
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Decontamination: every 50th doc stands in for the benchmark/eval
    # set. The benchmark grams broadcast (eval sets are tiny); the corpus
    # side joins without a shuffle and aggregates per doc.
    d = Catalog(spark, sf_dir).documents
    bench = d.filter(F.col("doc_id") % 50 == 0)
    corpus = d.filter(F.col("doc_id") % 50 != 0)
    return contamination_overlap(corpus, bench, n=3, min_overlap=5)


# --- sequence packing --------------------------------------------------------


@query(
    "q_pack_chunk",
    oracle="""
    WITH t AS (
        SELECT doc_id, doc_id % 8 AS bucket,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT doc_id, bucket, n_tokens,
           CAST(floor(coalesce(sum(n_tokens) OVER (
                    PARTITION BY bucket ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) / 512.0) AS BIGINT) AS pack_id
    FROM t
    """,
)
def q_pack_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Budget-boundary chunking: the SQL-expressible packing — one window
    # per bucket, fully parallel across buckets.
    d = Catalog(spark, sf_dir).documents
    return pack_sequences(d, budget=512, n_buckets=8, mode="chunk")


@query(
    "q_pack_greedy",
    oracle="""
    WITH RECURSIVE t AS (
        SELECT doc_id, doc_id % 8 AS bucket,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id)
                   AS rn
        FROM documents
    ), rec AS (
        SELECT bucket, rn, doc_id, n_tokens,
               CAST(0 AS BIGINT) AS pack_id, n_tokens AS fill
        FROM t WHERE rn = 1
        UNION ALL
        SELECT t.bucket, t.rn, t.doc_id, t.n_tokens,
               CASE WHEN r.fill + t.n_tokens > 512
                    THEN r.pack_id + 1 ELSE r.pack_id END,
               CASE WHEN r.fill + t.n_tokens > 512
                    THEN t.n_tokens ELSE r.fill + t.n_tokens END
        FROM rec r JOIN t ON t.bucket = r.bucket AND t.rn = r.rn + 1
    )
    SELECT doc_id, bucket, n_tokens, pack_id FROM rec
    """,
)
def q_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # True greedy packing per bucket (applyInPandas): packs never exceed
    # the budget unless one document alone does. The sequential
    # prefix-dependence has no WINDOW form, but it IS a deterministic
    # linear recurrence over the doc_id-ordered rows of each bucket —
    # replayed exactly by the oracle's recursive CTE (one recursion step
    # per row rank, all buckets advancing in lockstep), graduating this
    # from the rows-only set to a full hash-checked row. The budget
    # invariant additionally stays pinned by tests/test_curation.py.
    d = Catalog(spark, sf_dir).documents
    return pack_sequences(d, budget=512, n_buckets=8, mode="greedy")


# --- deterministic training-order shuffle -----------------------------------


@query(
    "q_shuffle_order",
    oracle="""
    SELECT doc_id,
           CAST(((doc_id % 2147483648) * 2654435761) % 4294967296 AS BIGINT)
               AS shuffle_key
    FROM documents
    """,
)
def q_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reproducible global shuffle for training order: multiplicative-hash
    # key, then repartitionByRange + sortWithinPartitions — total order
    # across shards with no single-task sort.
    d = Catalog(spark, sf_dir).documents
    return shuffle_order(d).select("doc_id", "shuffle_key")
