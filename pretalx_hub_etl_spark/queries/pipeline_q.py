"""End-to-end training-data curation pipeline as ONE declared query.

The showcase composition of the LLM-pipeline operators (SURVEY.md §2.11):
quality filter -> exact dedup -> near-dup removal -> stratified rebalance,
exactly the stages a 100 TB pretraining-corpus build runs. Every stage is
a filter or same-key aggregation over the document corpus — the whole
pipeline is one Catalyst plan (no driver round-trips, no collect), and
every stage is individually oracle-validated by its own declared query
(q_text_quality, q_dedup_exact, q_dedup_ngram_jaccard,
q_sample_stratified), so the composite oracle below is assembled from
already-proven SQL fragments.

Near-dup removal here uses the EXACT n-gram Jaccard operator so the
composite stays hash-checkable end-to-end; at scale the MinHash-LSH
operator is the drop-in replacement for that stage (same pair-output
contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..llm.dedup import exact_dedup, ngram_jaccard_pairs
from ..llm.sampling import stratified_sample
from ..llm.text import DEFAULT_STOPWORDS, text_quality
from . import query

_STOP_SQL = ", ".join(f"'{w}'" for w in DEFAULT_STOPWORDS)

_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, lang, text,
           list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS ts
    FROM documents
),
quality AS (
    SELECT doc_id, lang, text, CAST(len(ts) AS BIGINT) AS n_tokens
    FROM toks
    WHERE len(ts) >= 25
      AND CAST(floor(len(list_filter(ts, t -> lower(t) IN ({_STOP_SQL})))
               / greatest(len(ts), 1) * 10000.0 + 0.5) AS BIGINT) / 10000.0
          <= 0.10
      AND CAST(floor(len(list_distinct(ts)) / greatest(len(ts), 1)
               * 10000.0 + 0.5) AS BIGINT) / 10000.0 >= 0.30
),
keep1 AS (SELECT min(doc_id) AS doc_id FROM quality GROUP BY text),
dedup AS (SELECT q.* FROM quality q JOIN keep1 USING (doc_id)),
words AS (SELECT doc_id, string_split(text, ' ') AS w FROM dedup),
grams_all AS (
    SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g
    FROM words, unnest(range(1, len(w) - 1)) AS t(i)
),
grams AS (
    SELECT doc_id, g FROM grams_all
    QUALIFY count(*) OVER (PARTITION BY g) <= 100
),
sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS nc
    FROM grams a JOIN grams b USING (g)
    WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
neardups AS (
    SELECT DISTINCT id_b
    FROM pairs JOIN sizes sa ON id_a = sa.doc_id
               JOIN sizes sb ON id_b = sb.doc_id
    WHERE CAST(nc AS DOUBLE) / (sa.n + sb.n - nc) >= 0.5
)
SELECT doc_id, lang, n_tokens
FROM dedup
WHERE doc_id NOT IN (SELECT id_b FROM neardups)
  AND (doc_id % 10000) < CASE lang
      WHEN 'en' THEN 5000
      WHEN 'zh' THEN 9000
      ELSE 7500 END
"""


@query("q_pipeline_curation", oracle=_ORACLE)
def q_pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents

    # 1. quality gate: minimum length, low stopword share, enough
    #    distinct tokens (the quantized metrics are the oracle's formulas).
    #    fan_out_by=doc_id: the fan-out shuffle every stage rides on is
    #    hash(doc_id), so the dedup semi-join, near-dup anti-join, and
    #    gram sizes agg all reuse the cached partitioning instead of
    #    re-exchanging the corpus (round-6 review Next #9).
    scored = text_quality(d, fan_out_by="doc_id")
    survivors = scored.filter(
        (F.col("q_n_tokens") >= 25)
        & (F.col("q_stopword_ratio") <= 0.10)
        & (F.col("q_distinct_ratio") >= 0.30)
    ).select("doc_id", "lang", "text", F.col("q_n_tokens").alias("n_tokens"))
    # The DAG below references survivors 2x (dedup agg + semi join) and
    # deduped 3x (jaccard self-join sides + final anti join): without a
    # persist Catalyst re-derives each branch from the SCAN, re-reading
    # and re-tokenizing the corpus 6x (verified via plan Location count).
    # Caching the post-quality minority is the 100 TB shape too — at
    # cluster scale this persist is StorageLevel.DISK_ONLY or a
    # checkpoint to the shuffle service.
    survivors = survivors.persist()

    # 2. exact dedup: keep the lowest doc_id per identical text
    keep = exact_dedup(survivors, on=["text"], id_col="doc_id").select("doc_id")
    deduped = survivors.join(keep, "doc_id", "left_semi").persist()

    # 3. near-dup removal: drop the higher-id side of every exact-Jaccard
    #    pair (>= 0.5, stop-shingle cap 100); MinHash-LSH is the at-scale
    #    drop-in for this stage
    dup_pairs = ngram_jaccard_pairs(
        deduped, text_col="text", id_col="doc_id",
        k=3, jaccard_threshold=0.5, max_doc_freq=100,
    )
    losers = dup_pairs.select(F.col("id_b").alias("doc_id")).distinct()
    unique_docs = deduped.join(losers, "doc_id", "left_anti")

    # 4. stratified rebalance: halve dominant 'en', keep most 'zh'
    return stratified_sample(
        unique_docs,
        strata_col="lang",
        fractions={"en": 0.5, "zh": 0.9},
        id_col="doc_id",
        default_fraction=0.75,
        mode="modulo",
    ).select("doc_id", "lang", "n_tokens")
