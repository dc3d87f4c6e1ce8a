"""Text-analysis operators for training-data pipelines (SURVEY.md L4).

All pure built-in expressions over the ``documents`` table shape
(doc_id, text, lang, source, n_chars): language-ID heuristic, quality
scoring, token counting, document fingerprinting. Everything stays in
whole-stage codegen — per-row work, no shuffles except the final term-freq
groupBy (map-side combined).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.core import fixed_point
from ..operators.partitioning import fan_out

DEFAULT_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def tokens(text_col: Column | str) -> Column:
    """Whitespace tokenization (array<string>, empties removed)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_count(text_col: Column | str) -> Column:
    return F.size(tokens(text_col)).cast("long")


def bpe_ish_token_count(text_col: Column | str) -> Column:
    """Regex sub-word token estimate (BPE-ish): word pieces of <=4 chars.

    ceil(len(word)/4) summed over words — a deterministic stand-in for a
    real tokenizer's piece count, computable JVM-side.
    """
    return F.aggregate(
        tokens(text_col),
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("long"),
    )


def term_frequencies(
    df: DataFrame, text_col: str = "text", stopwords: Sequence[str] = DEFAULT_STOPWORDS
) -> DataFrame:
    """Corpus-wide term frequencies, stopword-filtered.

    explode -> filter -> groupBy(term): one shuffle with map-side partial
    counts; at 100 TB add a salted two-level agg only if term skew shows up
    (AQE usually covers it).
    """
    # no fan_out here: whitespace split is cheap relative to a pre-shuffle
    # of the raw text (measured ~2× slower with one), and the groupBy
    # redistributes the exploded terms anyway
    return (
        df.select(F.explode(tokens(text_col)).alias("term"))
        .filter(~F.col("term").isin(list(stopwords)))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def tfidf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: Sequence[str] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """Per-(doc, term) tf-idf: ``tf * ln((N+1)/(df+1))``, smoothed.

    Three aggregations, all map-side combined: term counts per doc (tf),
    doc counts per term (df), and the corpus size N (a 1-row broadcast).
    The score is fixed-pointed to 6 dp so two engines' ``ln`` (which may
    differ in the last ulp) hash identically.

    Scale: the (doc, term) fact is the big side (|docs| × avg distinct
    terms). The per-term df table is vocabulary-sized — small for curated
    corpora, but web-scale text has an unbounded tail, so it carries NO
    broadcast hint: under the threshold Catalyst broadcasts it, above it
    the join falls back to a shuffle on the term key (which the tf side
    is already partitioned by from its own groupBy).
    """
    toks = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term"))
        .filter(~F.col("term").isin(list(stopwords)))
    )
    # tf feeds BOTH the final join and the df aggregation; without a
    # persist each consumer re-derives it from the corpus scan (Catalyst
    # does not common-subexpression across actions' consumers here).
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")).persist()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("n"))
    idf = F.log((F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            fixed_point(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every matching doc for one term set.

    (doc_id, n_terms, score_micro, bm25): docs matching >= 1 query term,
    with the integer-quantized score (``score_micro`` = Σ per-term
    floor(contribution·1e6 + 0.5)) alongside the double form. Summing
    QUANTIZED per-term contributions — not doubles — makes the total
    order-independent and cross-engine bit-identical, so ranking by
    (score_micro, doc_id) is deterministic and the operator carries a
    full value-hash oracle (same trick as the centroid family).

    Scale shape: the postings explode filters to the query terms AT THE
    SCAN (the (doc, term) fact holds only query-term hits — a few rows
    per matching doc, not the corpus vocabulary); per-term df and the
    (N, avgdl) stats are query-sized / 1-row broadcasts; the only big
    shuffle is the doc-length join on ``id_col``, partitioned the same
    way the tf groupBy already left it.

    The constants must reach both engines as IDENTICAL decimal literals
    (no cross-engine arithmetic on them): pass k1/b here exactly as they
    are spelled in the oracle SQL.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("__t")
    )
    # dl feeds BOTH the (N, avgdl) stats and the per-doc join; it is two
    # longs per doc, so persisting it caps the corpus at two scans total
    # (dl pass + postings pass) instead of three
    dl = base.select(
        "doc_id", F.size("__t").cast("long").alias("dl")
    ).persist()
    # N and avgdl: exact BIGINT sum / count -> one identical double each
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        base.select("doc_id", F.explode("__t").alias("term"))
        .filter(F.col("term").isin(list(query_terms)))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = (
        idf
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + (F.lit(b) * F.col("dl")) / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.floor(contrib * 1000000.0 + 0.5).cast("long").alias("__q"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("__q").alias("score_micro"),
        )
        .select(
            "doc_id",
            "n_terms",
            "score_micro",
            (F.col("score_micro") / 1000000.0).alias("bm25"),
        )
    )


def contains_all_terms(
    df: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
) -> DataFrame:
    """Conjunctive (AND) keyword search, fused into the scan.

    ``size(array_intersect(distinct_tokens, terms)) == len(terms)`` is a
    pure codegen predicate: zero shuffle, zero index — the right shape
    when the term set changes per query. A repeated-query serving path
    would materialize a postings table (term -> doc ids, partitioned by
    term) exactly like the IVF inverted lists; this operator is the
    scan-side semantics both share.
    """
    toks = F.array_distinct(tokens(text_col))
    hit = F.array_intersect(
        toks, F.array(*[F.lit(t) for t in query_terms])
    )
    return df.filter(F.size(hit) == len(query_terms))


def text_quality(
    df: DataFrame, text_col: str = "text", fan_out_by: str | None = None
) -> DataFrame:
    """Per-document quality features (length / ratios) appended as columns.

    ``fan_out_by``: hash-partition the fan-out shuffle on that column
    (usually the doc id) so downstream same-key joins/aggs reuse the
    partitioning instead of re-exchanging (see ``fan_out``).
    """
    toks = tokens(text_col)
    n_toks = F.size(toks).cast("long")
    text_len = F.length(text_col).cast("long")
    stop_hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(list(DEFAULT_STOPWORDS)))
    ).cast("long")
    return (
        fan_out(df, by=fan_out_by)
        .withColumn("q_n_chars", text_len)
        .withColumn("q_n_tokens", n_toks)
        .withColumn(
            "q_avg_token_len",
            fixed_point((text_len - (n_toks - 1)) / F.greatest(n_toks, F.lit(1)), 4),
        )
        .withColumn(
            "q_stopword_ratio", fixed_point(stop_hits / F.greatest(n_toks, F.lit(1)), 4)
        )
        .withColumn(
            "q_distinct_ratio",
            fixed_point(
                F.size(F.array_distinct(toks)) / F.greatest(n_toks, F.lit(1)), 4
            ),
        )
    )


#: Tiny per-language marker vocabularies for the n-gram/stopword language-ID
#: heuristic. Real pipelines plug fastText-style models in via pandas_udf;
#: the heuristic keeps the operator oracle-checkable.
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "es": ("el", "los", "que"),
    "fr": ("le", "les", "des"),
    "zh": ("de", "shi", "bu"),
}


def lang_id_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-hit counts per language + argmax guess (deterministic)."""
    toks = tokens(text_col)
    out = fan_out(df)
    for lang, markers in LANG_MARKERS.items():
        out = out.withColumn(
            f"score_{lang}",
            F.size(F.filter(toks, lambda t: F.lower(t).isin(list(markers)))).cast("long"),
        )
    # argmax with deterministic tie-break on language code order
    best = None
    for lang in sorted(LANG_MARKERS):
        cond = F.lit(True)
        for other in sorted(LANG_MARKERS):
            if other < lang:
                cond = cond & (F.col(f"score_{lang}") > F.col(f"score_{other}"))
            elif other > lang:
                cond = cond & (F.col(f"score_{lang}") >= F.col(f"score_{other}"))
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    return out.withColumn("lang_guess", best.otherwise(F.lit(sorted(LANG_MARKERS)[0])))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical document fingerprint (id, fp).

    md5 over the sorted distinct token set — whitespace/ordering-insensitive,
    portable (DuckDB md5 produces identical digests, so it's oracle-able).
    """
    canonical = F.concat_ws(" ", F.sort_array(F.array_distinct(tokens(text_col))))
    return fan_out(df).select(F.col(id_col), F.md5(canonical).alias("fp"))


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    stopwords: Sequence[str] = (),
) -> DataFrame:
    """(term, n, vocab_id): frequency-ranked contiguous vocabulary ids.

    The tokenizer-prep step every pretraining pipeline runs: count terms
    corpus-wide, cut the tail below ``min_count``, and assign dense ids
    by (count desc, term asc) — id 1 is the most frequent term, ties
    broken lexically so the mapping is reproducible across runs and
    engines.

    Scale shape: one map-side-combined count shuffle, then the dense ids
    come from :func:`~..operators.agg.global_row_number` — the
    range-partition + offset-stamp decomposition — because a global
    ``row_number()`` window would sort the whole vocabulary on one
    reducer (fine for curated corpora, wrong for web-scale token tails).
    """
    from ..operators.agg import global_row_number

    counts = term_frequencies(df, text_col, stopwords=stopwords).filter(
        F.col("n") >= min_count
    )
    return global_row_number(
        counts, [F.col("n").desc(), F.col("term").asc()], out_col="vocab_id"
    )


def bigram_nll_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document negative log-likelihood under an add-one-smoothed
    bigram language model trained on the SAME corpus (the classic
    KenLM-shaped "perplexity filter" signal for pretraining data
    curation — docs whose own corpus finds them surprising are
    boilerplate/garbage candidates).

    (doc_id, n_bigrams, nll_micro, avg_nll): for each doc with >= 1
    bigram, nll_micro = Σ floor(ln((c1 + V) / (cab + 1)) · 1e6 + 0.5)
    over its bigrams — the per-bigram NLL of P(w2|w1) =
    (cab + 1)/(c1 + V) quantized to micro-nats BEFORE the per-doc sum,
    so the total is an exact, order-independent BIGINT and the operator
    carries a full value-hash oracle despite the ln() (the BM25 /
    centroid trick). avg_nll divides two exact integers in a pinned
    order (sum / count / 1e6).

    Scale shape: the doc-bigram fact and the bigram count table derive
    from the SAME groupBy key (w1, w2), so their equi-join reuses one
    hash partitioning; unigram counts and the vocabulary size are
    vocabulary-sized / 1-row broadcasts (the PMI layout). Nothing
    all-pairs, nothing driver-side. Self-scoring guarantees cab >= 1,
    so no OOV branch is needed; docs under 2 tokens have no bigrams
    and are (deliberately, deterministically) absent from the output.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("__t")
    ).filter(F.size("__t") >= 2)
    # (doc, w1, w2) bigram fact — one explode, zero shuffle at this
    # stage; everything downstream aggregates it
    big = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(__t) - 1),"
                " i -> struct(__t[i-1] AS w1, __t[i] AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    big = big.persist()
    tok = df.select(F.explode(tokens(text_col)).alias("w"))
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    cab = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cab"))
    contrib = (
        big.join(cab, ["w1", "w2"])  # same key as cab's groupBy: one
        # partitioning serves both the agg and the join
        .join(F.broadcast(uni.withColumnRenamed("w", "w1")), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.floor(
                F.log(
                    (F.col("c1") + F.col("v")).cast("double")
                    / (F.col("cab") + F.lit(1.0))
                )
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("q"),
        )
    )
    out = contrib.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("q").alias("nll_micro"),
    )
    return out.select(
        "doc_id",
        "n_bigrams",
        "nll_micro",
        (
            F.col("nll_micro").cast("double")
            / F.col("n_bigrams").cast("double")
            / F.lit(1000000.0)
        ).alias("avg_nll"),
    )


def normalize_text(col: Column) -> Column:
    """C4-style canonicalization: lowercase, strip non-alphanumerics,
    collapse/trim whitespace — pure regexp chains that fuse into the
    scan. Shared by ``q_text_normalize`` and ``q_pipeline_pretrain``
    (one implementation, two callers); the DuckDB twin needs the
    explicit 'g' flag (Spark replaces ALL matches, DuckDB first-only).
    """
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), "[^a-z0-9 ]", " "), " +", " "
        )
    )
