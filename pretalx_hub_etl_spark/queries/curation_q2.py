"""Curation / pipeline queries, second set: per-domain caps, single-pass
column profiling, overlapping chunking, CDC version diff, bigram PMI,
incremental aggregate maintenance, fuzzy key matching.

Oracle notes:
- the deterministic per-group selection order reuses the engine-portable
  Knuth hash ``((id mod 2^31) * 2654435761) mod 2^32`` (llm.curation);
- the PMI query returns the PMI RATIO, not its log: every input is an
  exact int64 count, the numerator/denominator are assembled in one
  fixed operation order, and the single double division is exactly
  rounded identically by Spark and DuckDB — a `ln()` would instead
  differ in the last ulp between libm implementations;
- the CDC oracle recomputes the v1→v2 diff relationally from the same
  deterministic update/insert/delete rule the Spark side feeds the sink.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.core import fixed_cents, fixed_point
from ..llm.curation import cap_per_group, chunk_documents
from ..operators.profile import profile_columns
from . import query

# --- per-domain cap ---------------------------------------------------------


@query(
    "q_domain_caps",
    oracle="""
    SELECT doc_id, source
    FROM documents
    QUALIFY row_number() OVER (
        PARTITION BY source
        ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296, doc_id
    ) <= 20
    """,
)
def q_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The hot-domain cap every crawl curation applies: keep at most 20
    # docs per source, selected by the engine-portable Knuth hash (a
    # stable pseudo-random per-domain sample). One shuffle on source.
    d = Catalog(spark, sf_dir).documents.select("doc_id", "source")
    return cap_per_group(d, "source", cap=20, id_col="doc_id")


# --- single-pass column profile ---------------------------------------------


@query(
    "q_profile_columns",
    oracle="""
    SELECT 'doc_id' AS col_name, count(*) AS n_rows,
           count(*) - count(doc_id) AS n_null,
           count(DISTINCT doc_id) AS n_distinct,
           CAST(min(doc_id) AS VARCHAR) AS min_val,
           CAST(max(doc_id) AS VARCHAR) AS max_val
    FROM documents
    UNION ALL
    SELECT 'lang', count(*), count(*) - count(lang), count(DISTINCT lang),
           min(lang), max(lang)
    FROM documents
    UNION ALL
    SELECT 'source', count(*), count(*) - count(source),
           count(DISTINCT source), min(source), max(source)
    FROM documents
    UNION ALL
    SELECT 'n_chars', count(*), count(*) - count(n_chars),
           count(DISTINCT n_chars),
           CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
    FROM documents
    """,
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deequ-style table profile: every metric for every column in ONE
    # aggregate pass (the oracle's 4 scans express the semantics; the
    # Spark plan is a single scan + single partial-agg shuffle).
    d = Catalog(spark, sf_dir).documents
    return profile_columns(d, ["doc_id", "lang", "source", "n_chars"]).withColumnRenamed(
        "column", "col_name"
    )


# --- overlapping token chunks -----------------------------------------------


@query(
    "q_chunk_overlap",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'),
                           x -> x <> '') AS toks
        FROM documents
    ), e AS (
        SELECT doc_id, toks, len(toks) AS n,
               unnest(generate_series(0, len(toks) - 1, 20)) AS start
        FROM t
        WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST(start // 20 AS BIGINT) AS chunk_id,
           array_to_string(toks[start + 1 : least(start + 40, n)], ' ')
               AS chunk_text,
           CAST(least(40, n - start) AS BIGINT) AS n_tokens
    FROM e
    """,
)
def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Context-window preprocessing: 40-token chunks every 20 tokens
    # (50% overlap), tail chunk shorter. Pure array expressions fused
    # into the scan — zero shuffle, ~n_tokens/20 output rows per doc.
    d = Catalog(spark, sf_dir).documents
    return chunk_documents(d, "text", "doc_id", chunk_tokens=40, stride=20)


# --- CDC: diff two committed versions of a merge table ----------------------


@query(
    "q_cdc_version_diff",
    oracle="""
    WITH c AS (
        SELECT c_custkey,
               CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) / 100.0
                   AS c_acctbal
        FROM customer
    )
    SELECT c_custkey + 1000000 AS c_custkey, 'insert' AS change,
           CAST(NULL AS DOUBLE) AS old_acctbal,
           0.0 AS new_acctbal
    FROM c WHERE c_custkey % 11 = 0
    UNION ALL
    SELECT c_custkey, 'update', c_acctbal, c_acctbal + 100.0
    FROM c WHERE c_custkey % 7 = 0 AND c_custkey % 13 <> 0
    UNION ALL
    SELECT c_custkey, 'delete', c_acctbal, CAST(NULL AS DOUBLE)
    FROM c WHERE c_custkey % 13 = 0
    """,
)
def q_cdc_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Build v1 (base) and v2 (merge of updates+inserts+deletes, same
    # deterministic rule as q_sink_merge_upsert), then read the CHANGE
    # FEED between them: a full-outer self-join of two immutable version
    # scans. A key updated and deleted in the same merge surfaces as
    # delete with its v1 value (delete wins in MERGE).
    from ..sinks.merge import MergeSink, version_diff

    c = Catalog(spark, sf_dir).customer.select(
        "c_custkey",
        "c_name",
        (fixed_cents(F.col("c_acctbal")) / 100.0).alias("c_acctbal"),
    )
    sink = MergeSink(
        os.path.join(tempfile.mkdtemp(prefix="phe_cdc_"), "customers"),
        key="c_custkey",
    )
    sink.init(c)
    updates = c.filter(F.col("c_custkey") % 7 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 100.0
    )
    inserts = c.filter(F.col("c_custkey") % 11 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        "c_name",
        F.lit(0.0).alias("c_acctbal"),
    )
    deletes = c.filter(F.col("c_custkey") % 13 == 0).select("c_custkey")
    sink.merge(spark, updates.unionByName(inserts), deletes=deletes)
    diff = version_diff(spark, sink.path, "c_custkey", 1, 2)
    return diff.select(
        "c_custkey",
        "change",
        F.col("old.c_acctbal").alias("old_acctbal"),
        F.col("new.c_acctbal").alias("new_acctbal"),
    )


# --- adjacent-bigram PMI ----------------------------------------------------


@query(
    "q_pmi_bigrams",
    oracle="""
    WITH toks AS (
        SELECT list_filter(string_split_regex(text, '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ), uni AS (
        SELECT unnest(t) AS w FROM toks
    ), ucnt AS (
        SELECT w, count(*) AS c FROM uni GROUP BY w
    ), nu AS (
        SELECT sum(c) AS total_u FROM ucnt
    ), idx AS (
        SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks
    ), big AS (
        SELECT t[i] AS w1, t[i + 1] AS w2 FROM idx
    ), bcnt AS (
        SELECT w1, w2, count(*) AS c_ab FROM big GROUP BY w1, w2
    ), nb AS (
        SELECT sum(c_ab) AS total_b FROM bcnt
    )
    SELECT b.w1, b.w2, b.c_ab,
           CAST(floor(
               CAST(b.c_ab AS DOUBLE) * nu.total_u * nu.total_u
               / (CAST(ua.c AS DOUBLE) * ub.c * nb.total_b)
               * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS pmi_ratio
    FROM bcnt b
    JOIN ucnt ua ON b.w1 = ua.w
    JOIN ucnt ub ON b.w2 = ub.w
    CROSS JOIN nu CROSS JOIN nb
    WHERE b.c_ab >= 5
    """,
)
def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Collocation mining: PMI ratio p(ab)/(p(a)p(b)) for adjacent word
    # pairs seen >= 5 times. The ratio is computed in doubles from the
    # first multiply (overflow-safe at any corpus size), in a fixed op
    # order mirrored in the oracle — each step rounds identically under
    # IEEE 754, so the query carries a full value-hash oracle. Scale shape: two token
    # shuffles (bigram + unigram counts, both map-side combined); the
    # unigram count table is vocabulary-sized -> broadcast onto bigrams
    # twice; the scalar totals cross-join as 1-row broadcasts.
    d = Catalog(spark, sf_dir).documents
    toks = d.select(
        F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "").alias("t")
    ).filter(F.size("t") > 0)
    toks = toks.cache()  # feeds unigram AND bigram explodes: scan once

    # both count tables are vocabulary-sized (≪ corpus) and each feeds two
    # consumers (per-word joins + scalar total) -> cache so the token
    # explodes run once, not per consumer
    ucnt = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .cache()
    )
    n = F.size("t")
    ball = (
        toks.select(
            F.explode(
                F.zip_with(
                    F.slice("t", 1, n - 1),
                    F.slice("t", 2, n - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .cache()
    )
    bcnt = ball.filter(F.col("c_ab") >= 5)
    total_u = ucnt.agg(F.sum("c").alias("total_u"))
    total_b = ball.agg(F.sum("c_ab").alias("total_b"))
    ua = ucnt.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    ub = ucnt.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    out = (
        bcnt.join(F.broadcast(ua), "w1")
        .join(F.broadcast(ub), "w2")
        .crossJoin(F.broadcast(total_u))
        .crossJoin(F.broadcast(total_b))
    )
    # cast to double BEFORE any multiply: int64 products like
    # c_ab * total_u overflow at ~3e9-token corpora, and divergently so
    # (DuckDB raises on BIGINT overflow, non-ANSI Spark wraps silently).
    # The op order below is mirrored exactly in the oracle so the one
    # double rounding per step is bit-identical across engines.
    ratio = (
        F.col("c_ab").cast("double")
        * F.col("total_u")
        * F.col("total_u")
        / (F.col("c_a").cast("double") * F.col("c_b") * F.col("total_b"))
    )
    return out.select(
        "w1", "w2", "c_ab", fixed_point(ratio, 6).alias("pmi_ratio")
    )


# --- IVM: incremental aggregate maintenance from the CDC feed ---------------


@query(
    "q_incremental_agg",
    oracle="""
    WITH c AS (
        SELECT c_custkey,
               CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
        FROM customer
    ), merged AS (
        -- final state after the deterministic merge (upserts win, deletes
        -- drop, inserts append) -- same rule as q_cdc_version_diff
        SELECT c_custkey, cents + CASE WHEN c_custkey % 7 = 0
                                       THEN 10000 ELSE 0 END AS cents
        FROM c WHERE c_custkey % 13 <> 0
        UNION ALL
        SELECT c_custkey + 1000000, 0 FROM c WHERE c_custkey % 11 = 0
    )
    SELECT c_custkey % 100 AS grp,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(cents) AS BIGINT) AS total
    FROM merged
    GROUP BY grp
    """,
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Incremental view maintenance: the per-group (custkey mod 100)
    # count + balance-cents sum is maintained from the CDC diff alone --
    # the v2 fact table is never re-aggregated. The oracle aggregates the
    # recomputed final state directly; hash-equality of the two proves
    # the maintained state is bit-identical to a from-scratch rebuild
    # (cents are exact BIGINTs, so the fold is order-independent).
    from ..operators.incremental import agg_state, apply_agg_delta
    from ..sinks.merge import MergeSink, version_diff

    c = Catalog(spark, sf_dir).customer.select(
        "c_custkey",
        "c_name",
        fixed_cents(F.col("c_acctbal")).alias("cents"),
    )
    sink = MergeSink(
        os.path.join(tempfile.mkdtemp(prefix="phe_ivm_"), "customers"),
        key="c_custkey",
    )
    sink.init(c)
    state_v1 = agg_state(
        sink.read(spark), F.col("c_custkey") % 100, F.col("cents")
    )
    updates = c.filter(F.col("c_custkey") % 7 == 0).withColumn(
        "cents", F.col("cents") + 10000
    )
    inserts = c.filter(F.col("c_custkey") % 11 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        "c_name",
        F.lit(0).cast("long").alias("cents"),
    )
    deletes = c.filter(F.col("c_custkey") % 13 == 0).select("c_custkey")
    sink.merge(spark, updates.unionByName(inserts), deletes=deletes)

    diff = version_diff(spark, sink.path, "c_custkey", 1, 2)
    # the group key (custkey) lives OUTSIDE the payload structs here, so
    # re-attach it; sum payload is the cents column inside old/new
    diff = diff.withColumn(
        "old", F.when(F.col("change") != "insert",
                      F.struct((F.col("c_custkey") % 100).alias("grp"),
                               F.col("old.cents").alias("cents")))
    ).withColumn(
        "new", F.when(F.col("change") != "delete",
                      F.struct((F.col("c_custkey") % 100).alias("grp"),
                               F.col("new.cents").alias("cents")))
    )
    maintained = apply_agg_delta(
        state_v1,
        diff,
        group_expr=lambda p: p["grp"],
        sum_expr=lambda p: p["cents"],
    )
    return maintained.select(
        F.col("grp").cast("long").alias("grp"),
        F.col("cnt").cast("long").alias("cnt"),
        F.col("total").cast("long").alias("total"),
    )


# --- fuzzy key matching (deletion-neighborhood blocking) --------------------


@query(
    "q_fuzzy_pairs",
    oracle="""
    WITH base AS (
        SELECT c_custkey AS id, c_name AS s FROM customer
        WHERE c_custkey < 300
    ), posts AS (
        SELECT id, s,
               unnest(list_append(
                   list_transform(range(1, length(s) + 1),
                       i -> substr(s, 1, i - 1) || substr(s, i + 1, 1000)),
                   s)) AS var
        FROM base
    )
    SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.s AS a, b.s AS b,
           CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
    FROM posts a JOIN posts b ON a.var = b.var AND a.id < b.id
    WHERE levenshtein(a.s, b.s) <= 1
    """,
)
def q_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fuzzy key dedup without a cross join: serial-numbered customer
    # names differ by one digit, so deletion-neighborhood blocking finds
    # every lev<=1 pair through shared variants and the exact levenshtein
    # verify confirms. Both engines build the identical variant set, so
    # the pair list value-hash matches.
    from ..llm.fuzzy import fuzzy_self_pairs

    c = Catalog(spark, sf_dir).customer.filter(F.col("c_custkey") < 300)
    return fuzzy_self_pairs(c, col="c_name", id_col="c_custkey")


@query(
    "q_fuzzy_pairs_d2",
    oracle="""
    WITH base AS (
        SELECT c_custkey AS id, c_name AS s FROM customer
        WHERE c_custkey < 200
    ), posts AS (
        SELECT id, s,
               unnest(list_distinct(list_concat(
                   list_append(
                       list_transform(range(1, length(s) + 1),
                           i -> substr(s, 1, i - 1) || substr(s, i + 1, 1000)),
                       s),
                   flatten(list_transform(range(1, length(s)),
                       i -> list_transform(range(i + 1, length(s) + 1),
                           j -> substr(s, 1, i - 1)
                                || substr(s, i + 1, j - i - 1)
                                || substr(s, j + 1, 1000))))))) AS var
        FROM base
    )
    SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.s AS a, b.s AS b,
           CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
    FROM posts a JOIN posts b ON a.var = b.var AND a.id < b.id
    WHERE levenshtein(a.s, b.s) <= 2
    """,
)
def q_fuzzy_pairs_d2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Distance-2 fuzzy matching: serial-numbered customer names give a
    # dense supply of planted 2-edit pairs (two digits differ, e.g.
    # Customer#...123 vs ...145). Depth-2 symmetric-delete blocking
    # finds every lev<=2 pair via shared (up-to-)two-deletion variants
    # — an equi-join on the variant, never a cross join — and the exact
    # levenshtein verify keeps the result exact, so the pair list
    # carries a full value-hash oracle (both engines construct the
    # identical variant set, DuckDB via half-open range()).
    from ..llm.fuzzy import fuzzy_self_pairs

    c = Catalog(spark, sf_dir).customer.filter(F.col("c_custkey") < 200)
    return fuzzy_self_pairs(c, col="c_name", id_col="c_custkey", max_edits=2)

@query(
    "q_fuzzy_join",
    oracle="""
    WITH lft AS (
        SELECT c_custkey AS id, c_name AS s FROM customer
        WHERE c_custkey < 250
    ), rgt AS (
        SELECT c_custkey AS id, c_name AS s FROM customer
        WHERE c_custkey < 250 AND c_custkey % 2 = 0
    ), lposts AS (
        SELECT id, s,
               unnest(list_append(
                   list_transform(range(1, length(s) + 1),
                       i -> substr(s, 1, i - 1) || substr(s, i + 1, 1000)),
                   s)) AS var
        FROM lft
    ), rposts AS (
        SELECT id, s,
               unnest(list_append(
                   list_transform(range(1, length(s) + 1),
                       i -> substr(s, 1, i - 1) || substr(s, i + 1, 1000)),
                   s)) AS var
        FROM rgt
    )
    SELECT DISTINCT a.id AS left_id, b.id AS right_id,
           a.s AS left_val, b.s AS right_val,
           CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
    FROM lposts a JOIN rposts b ON a.var = b.var
    WHERE levenshtein(a.s, b.s) <= 1
    """,
)
def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-table fuzzy join: messy keys (customer names) against a
    # reference table (the even-key subset): serial-numbered names match
    # at dist 0 (same key) and dist 1 (one digit differs), so the
    # blocking is exercised non-trivially and the exact levenshtein
    # verify keeps the result value-hash oracled. The reference side's
    # postings broadcast; the left side never shuffles.
    from ..llm.fuzzy import fuzzy_join

    c = Catalog(spark, sf_dir).customer
    left = c.filter(F.col("c_custkey") < 250)
    right = (
        c.filter((F.col("c_custkey") < 250) & (F.col("c_custkey") % 2 == 0))
        .select("c_custkey", F.col("c_name").alias("c_name_ref"))
    )
    return fuzzy_join(
        left, right, "c_name", "c_name_ref", "c_custkey", "c_custkey",
        max_edits=1,
    )


# --- L23c: entity resolution end-to-end (block -> verify -> cluster -> golden)


@query(
    "q_pipeline_entity_resolution",
    oracle="""
    WITH RECURSIVE base AS (
        SELECT c_custkey AS id, c_name AS s, c_acctbal FROM customer
        WHERE c_custkey % 100 IN (11, 44, 77)
    ), posts AS (
        SELECT id, s,
               unnest(list_append(
                   list_transform(range(1, length(s) + 1),
                       i -> substr(s, 1, i - 1) || substr(s, i + 1, 1000)),
                   s)) AS var
        FROM base
    ), pairs AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM posts a JOIN posts b ON a.var = b.var AND a.id < b.id
        WHERE levenshtein(a.s, b.s) <= 1
    ), edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL
        SELECT id_b AS u, id_a AS v FROM pairs
    ), reach(id, r) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id
    ), clusters AS (
        SELECT id, min(r) AS cluster FROM reach GROUP BY id
    ), withc AS (
        SELECT base.id, COALESCE(clusters.cluster, base.id) AS cluster,
               base.s, base.c_acctbal
        FROM base LEFT JOIN clusters ON clusters.id = base.id
    )
    SELECT CAST(cluster AS BIGINT) AS cluster,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(id) AS BIGINT) AS canonical_id,
           min(CASE WHEN id = cluster THEN s END) AS canonical_name,
           max(c_acctbal) AS best_acctbal
    FROM withc GROUP BY cluster
    """,
)
def q_pipeline_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L23c: the record-linkage stages COMPOSED end-to-end — symmetric-
    # delete blocking + exact levenshtein verify (L23) -> min-label
    # connected components over the match graph (L2d) -> one golden
    # record per entity cluster (L2e shape): canonical id/name from the
    # cluster minimum, consolidated attribute via max. Two different
    # fixpoint algorithms (label propagation vs the oracle's recursive
    # transitive closure) must agree on the CLUSTERING, and then both
    # sides aggregate it identically — the hash gates the composition,
    # not just each stage. Scale shape: variant equi-join (never cross),
    # pair-graph-sized iteration, one corpus-keyed golden-record agg.
    from ..llm.dedup import duplicate_clusters
    from ..llm.fuzzy import fuzzy_self_pairs

    # residue classes 11/44/77 mod 100: within a class, serial names
    # chain via single-digit edits (lev 1); across classes every pair
    # differs in >= 2 digits — so the match graph has three REAL
    # entity clusters instead of one degenerate all-connected blob
    c = Catalog(spark, sf_dir).customer.filter(
        F.pmod(F.col("c_custkey"), F.lit(100)).isin(11, 44, 77)
    )
    pairs = fuzzy_self_pairs(c, col="c_name", id_col="c_custkey")
    clusters = duplicate_clusters(
        c.select(F.col("c_custkey")), pairs, id_col="c_custkey"
    )
    withc = c.select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("s"),
        "c_acctbal",
    ).join(clusters.withColumnRenamed("id", "cid"),
           F.col("id") == F.col("cid"), "left")
    withc = withc.select(
        "id", "s", "c_acctbal",
        F.coalesce(F.col("cluster"), F.col("id")).alias("cluster"),
    )
    return withc.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("id").alias("canonical_id"),
        F.min(F.when(F.col("id") == F.col("cluster"), F.col("s"))).alias(
            "canonical_name"
        ),
        F.max("c_acctbal").alias("best_acctbal"),
    )
