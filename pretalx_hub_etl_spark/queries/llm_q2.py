"""Second LLM-pipeline batch: Gopher-style quality rules, token-length
histograms, and exact embedding norms/centroids.

These extend the L4 (text analysis) and L3 (similarity) families with the
remaining signals a pretraining curation pipeline computes corpus-wide:

- rule-based quality gating (the Gopher/C4 filter family) as pure codegen
  expressions that ride the scan — the only affordable shape at 100 TB;
- corpus shape statistics (token-length histogram per language) — one
  map-side-combined shuffle on a tiny key space;
- embedding norms and per-class centroids in FIXED-POINT integers: each
  component quantizes to floor(x·1e6 + 0.5) once, all sums happen on
  exact BIGINTs (order-independent, cross-engine bit-identical), and the
  only doubles are final divisions / one sqrt of an exact integer.

Oracle notes: DuckDB's lambda syntax (``list_transform(l, x -> ...)``)
mirrors Spark's ``transform``/``aggregate`` higher-order functions; both
engines convert float32 components to double EXACTLY before quantizing,
so the quantized integers agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from . import query

# --- quality: Gopher-style rule gate ----------------------------------------

_STOPWORDS = ("the", "a", "of", "to", "and", "in")


def _stop_hits_sql() -> str:
    return " + ".join(
        f"(CASE WHEN ' ' || text || ' ' LIKE '% {w} %' THEN 1 ELSE 0 END)"
        for w in _STOPWORDS
    )


def _stop_hits_col() -> Column:
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    hits = [
        F.when(padded.contains(f" {w} "), F.lit(1)).otherwise(F.lit(0))
        for w in _STOPWORDS
    ]
    out = hits[0]
    for h in hits[1:]:
        out = out + h
    return out


@query(
    "q_quality_gopher",
    oracle=f"""
    WITH sig AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_alpha,
               CAST(length(text)
                    - length(regexp_replace(text, '[^a-z ]', '', 'g'))
                    AS BIGINT) AS n_symbols,
               CAST({_stop_hits_sql()} AS BIGINT) AS stop_hits
        FROM documents
    )
    SELECT doc_id, lang, n_words, n_symbols, stop_hits,
           CAST(floor(n_alpha * 100.0 / n_words) AS BIGINT) AS mean_wlen_c,
           CAST(
               n_words BETWEEN 20 AND 100000
               AND floor(n_alpha * 100.0 / n_words) BETWEEN 100 AND 1000
               AND stop_hits >= 2
               AND n_symbols * 10 < n_alpha
               AS BOOLEAN) AS keep
    FROM sig
    """,
)
def q_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The Gopher rule family (word-count bounds, mean-word-length band,
    # stopword presence, symbol ratio) as one expression chain: zero
    # shuffle, fully codegen'd, the gate fuses into the corpus scan.
    # mean word length stays in integer centi-chars (floor of an exact
    # small-int division — identical doubles on both engines).
    d = Catalog(spark, sf_dir).documents
    n_words = F.size(F.split(F.col("text"), " ")).cast("long")
    n_alpha = F.length(F.regexp_replace("text", " ", "")).cast("long")
    # symbol count as a length delta (this DuckDB build lacks regexp_count)
    n_symbols = (
        F.length("text") - F.length(F.regexp_replace("text", "[^a-z ]", ""))
    ).cast("long")
    sig = d.select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        n_alpha.alias("n_alpha"),
        n_symbols.alias("n_symbols"),
        _stop_hits_col().cast("long").alias("stop_hits"),
    )
    mean_wlen_c = F.floor(F.col("n_alpha") * 100.0 / F.col("n_words")).cast("long")
    keep = (
        F.col("n_words").between(20, 100000)
        & mean_wlen_c.between(100, 1000)
        & (F.col("stop_hits") >= 2)
        & (F.col("n_symbols") * 10 < F.col("n_alpha"))
    )
    return sig.select(
        "doc_id",
        "lang",
        "n_words",
        "n_symbols",
        "stop_hits",
        mean_wlen_c.alias("mean_wlen_c"),
        keep.alias("keep"),
    )


# --- corpus shape: token-length histogram per language ----------------------


@query(
    "q_token_histogram",
    oracle="""
    SELECT lang,
           CAST(least(len(string_split(text, ' ')) // 20, 19) AS BIGINT)
               AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
               AS n_tokens
    FROM documents
    GROUP BY 1, 2
    """,
)
def q_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sequence-length distribution per language — the statistic that sizes
    # packing budgets and batch shapes. Bucketing is integer floor-div
    # capped at 19; the groupBy key space is |langs| x 20, so the shuffle
    # is map-side combined down to nothing.
    d = Catalog(spark, sf_dir).documents
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    bucket = F.least(F.floor(n_tok / 20), F.lit(19)).cast("long")
    return (
        d.select("lang", bucket.alias("bucket"), n_tok.alias("n_tok"))
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


# --- embeddings: exact L2 norm ----------------------------------------------

#: DuckDB-side quantizer for one component (float -> exact micro-units).
_Q_SQL = "CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)"


def _q_col(x: Column) -> Column:
    return F.floor(x.cast("double") * 1000000.0 + F.lit(0.5)).cast("long")


@query(
    "q_embed_norm",
    oracle=f"""
    SELECT vec_id, label,
           CAST(len(embedding) AS BIGINT) AS dim,
           sqrt(CAST(list_sum(list_transform(embedding,
               x -> {_Q_SQL} * {_Q_SQL})) AS BIGINT)) / 1000000.0 AS l2_norm
    FROM embeddings
    """,
)
def q_embed_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L2 norms for normalization / outlier pruning before ANN indexing.
    # Components quantize to micro-unit BIGINTs; the sum of squares is an
    # exact integer (64 terms x <= ~1e12 each — far inside int64), so the
    # one sqrt is of an identical value on both engines. Pure higher-order
    # expressions: no UDF, no shuffle.
    e = Catalog(spark, sf_dir).embeddings
    sq_sum = F.aggregate(
        F.col("embedding"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + _q_col(x) * _q_col(x),
    )
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        (F.sqrt(sq_sum.cast("double")) / 1000000.0).alias("l2_norm"),
    )


# --- embeddings: per-label centroids (leading dims) -------------------------


@query(
    "q_embed_centroid",
    oracle=f"""
    WITH comp AS (
        SELECT label,
               unnest(range(len(embedding))) AS pos,
               unnest(list_transform(embedding, x -> {_Q_SQL})) AS q_c
        FROM embeddings
    )
    SELECT label, CAST(pos AS BIGINT) AS pos,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(q_c) AS BIGINT) / (1000000.0 * count(*)) AS centroid
    FROM comp
    WHERE pos < 8
    GROUP BY 1, 2
    """,
)
def q_embed_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-class mean embedding (leading 8 dims declared; the full-width
    # version is the same plan) — the IVF coarse-quantizer update step and
    # the per-domain drift monitor. posexplode -> one shuffle on the tiny
    # (label, pos) key space with map-side combine; sums are exact
    # BIGINTs so partial-aggregation order cannot change the result.
    e = Catalog(spark, sf_dir).embeddings
    comp = e.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "x")
    ).filter(F.col("pos") < 8)
    return (
        comp.select("label", F.col("pos").cast("long").alias("pos"), _q_col(F.col("x")).alias("q_c"))
        .groupBy("label", "pos")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.sum("q_c") / (F.lit(1000000.0) * F.count(F.lit(1)))).alias("centroid"),
        )
    )


# --- sampling: quality-weighted keep (importance sampling) ------------------


@query(
    "q_sample_weighted",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE ((doc_id % 2147483648) * 2654435761) % 4294967296 * 500
          < least(n_chars, 500) * 4294967296
    """,
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Importance sampling: keep probability scales with document length
    # (least(n_chars,500)/500). The Bernoulli coin is a Knuth
    # multiplicative hash of the 31-bit-masked id; the keep test
    # cross-multiplies to EXACT 64-bit integers on both sides (the
    # num/den path — never a float compare). Pure per-row filter —
    # fuses into the scan, zero shuffle.
    from ..llm.sampling import weighted_sample

    d = Catalog(spark, sf_dir).documents.select("doc_id", "lang", "n_chars")
    return weighted_sample(
        d,
        id_col="doc_id",
        weight_num=F.least(F.col("n_chars"), F.lit(500)),
        weight_den=F.lit(500),
    )


# --- relevance ranking: Okapi BM25 + conjunctive search ---------------------


@query(
    "q_text_bm25",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ), dl AS (
        SELECT doc_id, len(t) AS dl FROM base
    ), stats AS (
        SELECT count(*) AS n, sum(dl) / count(*) AS avgdl FROM dl
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(t) AS term FROM base)
        WHERE term IN ('join', 'vector', 'stream')
        GROUP BY doc_id, term
    ), dfq AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ), contrib AS (
        -- constants appear as the SAME IEEE expressions the Spark side
        -- computes ((1.2 + 1.0), (1.0 - 0.75)): both engines fold them
        -- with identical doubles, and each per-term contribution is
        -- quantized BEFORE the per-doc sum so the total is an exact,
        -- order-independent BIGINT
        SELECT tf.doc_id,
               CAST(floor(
                   ln(1.0 + (n - df + 0.5) / (df + 0.5))
                   * (tf * (1.2 + 1.0))
                   / (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / avgdl))
                   * 1000000.0 + 0.5) AS BIGINT) AS q
        FROM tf JOIN dfq USING (term) JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(q) AS BIGINT) AS score_micro,
           CAST(sum(q) AS BIGINT) / 1000000.0 AS bm25
    FROM contrib
    GROUP BY doc_id
    """,
)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Okapi BM25 relevance (Robertson/Sparck Jones probabilistic ranking)
    # for the 3-term query {join, vector, stream} over the corpus: the
    # search-engine scoring shape every retrieval pipeline needs. The
    # postings explode keeps ONLY query-term hits (scan-side filter), df
    # and the (N, avgdl) stats broadcast, and the per-doc total sums
    # INTEGER-quantized per-term contributions — order-independent, so
    # the query carries a full value-hash oracle despite the ln().
    from ..llm.text import bm25_scores

    d = Catalog(spark, sf_dir).documents
    return bm25_scores(d, ("join", "vector", "stream"))


@query(
    "q_text_search",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE len(list_intersect(
        list_distinct(list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> '')),
        ['merge', 'vector', 'stream'])) = 3
    """,
)
def q_text_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Conjunctive keyword search (docs containing ALL of {merge,
    # vector, stream}) fused into the scan: one codegen predicate,
    # zero shuffle, zero index. The postings-table alternative for
    # repeated queries shares these semantics (see
    # llm/text.py contains_all_terms).
    from ..llm.text import contains_all_terms

    d = Catalog(spark, sf_dir).documents
    return contains_all_terms(d, ("merge", "vector", "stream")).select(
        "doc_id", "lang", "source"
    )


# --- tokenizer prep: frequency-ranked vocabulary ----------------------------


@query(
    "q_vocab_build",
    oracle="""
    WITH c AS (
        SELECT term, count(*) AS n
        FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                        x -> x <> '')) AS term
              FROM documents)
        GROUP BY term
        HAVING count(*) >= 5
    )
    SELECT term, n,
           row_number() OVER (ORDER BY n DESC, term) AS vocab_id
    FROM c
    """,
)
def q_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Frequency-ranked dense vocabulary ids (tokenizer prep): the oracle
    # uses the single-reducer global window DuckDB can afford; the Spark
    # side computes the identical ids via global_row_number's
    # range-partition + offset-stamp decomposition (operators/agg.py),
    # which never funnels the vocabulary through one task.
    from ..llm.text import build_vocab

    d = Catalog(spark, sf_dir).documents
    return build_vocab(d, min_count=5)


@query(
    "q_text_perplexity",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ), tok AS (
        SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS pos
        FROM base
    ), big AS (
        SELECT a.doc_id, a.w AS w1, b.w AS w2
        FROM tok a
        JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ), uni AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM tok GROUP BY w
    ), vocab AS (
        SELECT CAST(count(*) AS BIGINT) AS v FROM uni
    ), cab AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS cab
        FROM big GROUP BY w1, w2
    ), contrib AS (
        SELECT big.doc_id,
               CAST(floor(
                   ln(CAST(c1 + v AS DOUBLE) / (cab + 1.0))
                   * 1000000.0 + 0.5) AS BIGINT) AS q
        FROM big
        JOIN cab USING (w1, w2)
        JOIN uni ON big.w1 = uni.w
        CROSS JOIN vocab
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(q) AS BIGINT) AS nll_micro,
           CAST(sum(q) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0
               AS avg_nll
    FROM contrib
    GROUP BY doc_id
    """,
)
def q_text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Perplexity-style quality scoring (L31): each document's average
    # negative log-likelihood under an add-one-smoothed bigram LM
    # trained on the corpus itself — the CCNet/KenLM-shaped curation
    # signal, with per-bigram NLLs integer-quantized to micro-nats
    # before the per-doc sum so the value hash survives the ln()
    # (llm/text.py bigram_nll_scores documents the scale shape:
    # partitioning-reusing (w1, w2) join, broadcast unigram table).
    from ..llm.text import bigram_nll_scores

    d = Catalog(spark, sf_dir).documents
    return bigram_nll_scores(d)


@query(
    "q_feature_zscore",
    oracle="""
    WITH m AS (
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(n_chars) AS BIGINT) AS sx,
               CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
        FROM documents GROUP BY 1
    ), s AS (
        SELECT lang, n,
               CAST(sx AS DOUBLE) / n AS mean_chars,
               sqrt(greatest(
                   0.0,
                   CAST(sxx AS DOUBLE) / n
                   - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)
               )) AS std_chars
        FROM m
    )
    SELECT d.doc_id, d.lang, d.n_chars, s.mean_chars, s.std_chars,
           CASE WHEN s.std_chars <> 0
                THEN (CAST(d.n_chars AS DOUBLE) - s.mean_chars)
                     / s.std_chars
           END AS z
    FROM documents d JOIN s USING (lang)
    """,
)
def q_feature_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-group feature standardization (the ML-preprocessing staple):
    # z-score each doc's length against its language's distribution.
    # Moments accumulate as EXACT BIGINTs (the q_agg_stats trick —
    # built-in stddev() merges floats in partial-merge order and is
    # nondeterministic at 1000 executors); mean/std are derived once per
    # group in pinned double ops, and the per-row z is one subtract +
    # one divide of those shared values, so the hash is exact. Scale
    # shape: the stats agg map-side combines to |langs| rows, the
    # join-back broadcasts that tiny table onto the corpus scan — ONE
    # data-sized pass, zero data-sized shuffles. Variance is derived in
    # doubles as E[x^2] - E[x]^2 over the exact integer moments (the
    # q_corr_matrix form): the n*sxx - sx*sx integer form overflows
    # int64 at only ~3e5 rows per group for 10k-char docs, while the
    # per-moment sums alone stay exact to ~9e10 rows; the identical
    # double expression is mirrored in the oracle so the hash is
    # portable, with greatest(0, var) guarding FP-negative variance on
    # constant groups.
    d = Catalog(spark, sf_dir).documents
    x = F.col("n_chars")
    m = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    mean = sx.cast("double") / n
    s = m.select(
        "lang",
        "n",
        mean.alias("mean_chars"),
        F.sqrt(
            F.greatest(F.lit(0.0), sxx.cast("double") / n - mean * mean)
        ).alias("std_chars"),
    )
    return d.join(F.broadcast(s), "lang").select(
        "doc_id",
        "lang",
        "n_chars",
        "mean_chars",
        "std_chars",
        # constant group -> std 0: NULL, guarded identically on both
        # engines (ANSI Spark THROWS on double/0 where DuckDB yields
        # inf — an unguarded z diverges, or crashes, on degenerate
        # groups; the unit test pins this)
        F.when(
            F.col("std_chars") != 0,
            (F.col("n_chars").cast("double") - F.col("mean_chars"))
            / F.col("std_chars"),
        ).alias("z"),
    )


@query(
    "q_sample_split_grouped",
    oracle="""
    SELECT doc_id, source,
           CASE WHEN CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT)
                     % 10 < 1 THEN 'val'
                WHEN CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT)
                     % 10 < 2 THEN 'test'
                ELSE 'train' END AS split
    FROM documents
    """,
)
def q_sample_split_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Leakage-safe holdout split: the unit of assignment is the GROUP
    # (source), not the document — near-duplicate docs from one crawl
    # domain can never straddle train/test, the classic contamination
    # path per-row splits leave open. The bucket is the first 8 hex
    # chars of md5(source) (a JVM/DuckDB-portable hash — xxhash64, the
    # engine default elsewhere, has no DuckDB twin), so assignment is an
    # engine-independent pure function of the group key: one per-row
    # expression fused into the scan, zero shuffles, stable under
    # corpus growth and reruns.
    d = Catalog(spark, sf_dir).documents
    bucket = (
        F.conv(F.substring(F.md5(F.col("source")), 1, 8), 16, 10)
        .cast("long")
        % 10
    )
    return d.select(
        "doc_id",
        "source",
        F.when(bucket < 1, "val")
        .when(bucket < 2, "test")
        .otherwise("train")
        .alias("split"),
    )


@query(
    "q_feature_winsorize",
    oracle="""
    WITH r AS (
        SELECT lang, n_chars,
               row_number() OVER (PARTITION BY lang ORDER BY n_chars)
                   AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM documents
    ), q AS (
        SELECT lang,
               max(CASE WHEN rn = greatest(1, CAST(ceil(0.05 * n) AS BIGINT))
                        THEN n_chars END) AS p05,
               max(CASE WHEN rn = greatest(1, CAST(ceil(0.95 * n) AS BIGINT))
                        THEN n_chars END) AS p95
        FROM r GROUP BY lang
    )
    SELECT d.doc_id, d.lang, d.n_chars, q.p05, q.p95,
           least(greatest(d.n_chars, q.p05), q.p95) AS n_chars_winsor
    FROM documents d JOIN q USING (lang)
    """,
)
def q_feature_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-group winsorization (outlier clipping): clamp each doc's
    # length into its language's [p05, p95] band — the robust
    # alternative to dropping tail rows, and the standard companion to
    # z-scoring (q_feature_zscore) when heavy tails would dominate the
    # moments. The cut points are A12's EXACT discrete quantiles
    # (value at rank ceil(q·n) — an actual element, no interpolation),
    # so integers flow through untouched and the operator carries a
    # full value hash; the clip itself is least/greatest, no
    # arithmetic. Scale shape: one shuffle + per-group sort for the
    # quantile pass (|langs| output rows), then the tiny cut-point
    # table broadcasts back onto the corpus scan.
    from ..operators.agg import exact_group_quantiles

    d = Catalog(spark, sf_dir).documents
    cuts = exact_group_quantiles(
        d, ["lang"], "n_chars", fractions=(0.05, 0.95)
    )
    return d.join(F.broadcast(cuts), "lang").select(
        "doc_id",
        "lang",
        "n_chars",
        "p05",
        "p95",
        F.least(
            F.greatest(F.col("n_chars"), F.col("p05")), F.col("p95")
        ).alias("n_chars_winsor"),
    )


# --- L39: temperature-scaled mixture resampling ------------------------------


@query(
    "q_mixture_temperature",
    oracle="""
    -- sqrt-temperature (T=2) budgets + md5-rank fill, replayed exactly:
    -- IEEE-754 specifies sqrt correctly rounded, so floor(sqrt(n)*1e6+0.5)
    -- is bit-identical across engines (general pow() is not)
    WITH counts AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY lang
    ), w AS (
        SELECT lang,
               CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000 + 0.5)
                    AS BIGINT) AS w
        FROM counts
    ), tw AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
    k AS (
        SELECT lang, ((SELECT CAST(count(*) AS BIGINT) FROM documents)
                      // 2 * w) // tw AS k
        FROM w, tw
    ), ranked AS (
        SELECT doc_id, lang, row_number() OVER (
            PARTITION BY lang
            ORDER BY CAST(('0x' || substr(
                md5('t:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT),
                doc_id
        ) AS rn
        FROM documents
    )
    SELECT r.doc_id, r.lang FROM ranked r JOIN k USING (lang)
    WHERE r.rn <= k.k
    """,
)
def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L39: exponent-smoothed mixture resampling (the mBERT/XLM-R
    # p_l ∝ p_l^alpha recipe) at T=2 — tail languages gain share,
    # heads shrink, total budget = half the corpus, all arithmetic
    # engine-exact (IEEE sqrt + BIGINT floor divisions + md5 rank
    # fill; llm/sampling.temperature_sample). At 100 TB: two corpus
    # scans, one G-row broadcast, one window shuffle on the group key.
    from ..llm.sampling import temperature_sample

    d = Catalog(spark, sf_dir).documents
    total = d.count() // 2
    return temperature_sample(
        d.select("doc_id", "lang"), "lang", "doc_id", total_target=total
    ).select("doc_id", "lang")
