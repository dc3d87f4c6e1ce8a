"""Round-6 query batch: substring-level dedup (find + apply),
source-mixture interleave, the witness-query family, streaming rows
under the driver gate, and the new analytics/DQ operators.

Three themes:

1. **Training-data dedup, completed**: ``q_dedup_substrings`` /
   ``q_dedup_substrings_clean`` (the Lee-et-al. repeated-span modality,
   ``llm/spans.py``), ``q_dedup_incremental`` (batch vs corpus hash
   index), ``q_mixture_interleave`` (weights → deterministic keep →
   global interleave order).
2. **Witness queries**: the SAME pipeline code as each seeded/float
   production path with the hash/arithmetic primitive swapped for an
   engine-portable one, putting previously rows-only logic under the
   full value-hash oracle — ``q_dedup_near_md5`` (MinHash banding),
   ``q_dedup_simhash_md5`` (SimHash votes), ``q_dedup_embed_md5``
   (hyperplane LSH), ``q_sim_topk_lsh_md5`` (ranked LSH ANN),
   ``q_sim_topk_ivf_exact`` / ``q_sim_topk_pq_exact`` (IVF/PQ on the
   deterministic Lloyd trainer, ``llm/kmeans.py``), ``q_kmeans_exact``.
3. **Streaming under the gate**: ``q_stream_merge_equiv`` (foreachBatch
   MERGE ≡ batch), ``q_stream_stateful_totals``
   (applyInPandasWithState), plus ``q_stream_interval_join`` in
   ``queries/stream.py``.

Plus: ``q_resample_ohlc`` (AN15), ``q_text_normalize`` (L4b), and
``q_quality_expectations`` (DQ1).

Oracle notes: every hash here is md5 (the JVM/DuckDB-portable choice,
per the q_sample_split_grouped precedent); no ``round()`` anywhere
(HALF_UP vs HALF_EVEN; ``fixed_point`` floor-scale instead); counts and
positions are BIGINTs on both engines; float sums only ever over exact
integers-in-doubles (order-independent) or pinned single divisions.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..operators.partitioning import local_rows
from ..functions.core import fixed_cents
from . import query

# --- L2f: exact substring-level dedup ---------------------------------------

_SPAN_K = 8  # window tokens; docs in this corpus run ~55 tokens


@query(
    "q_dedup_substrings",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ), posting AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               md5(array_to_string(t[i:i+{_SPAN_K - 1}], ' ')) AS g
        FROM base,
             unnest(generate_series(1, greatest(len(t) - {_SPAN_K - 1}, 0)))
                 AS u(i)
    ), dup AS (
        SELECT g FROM posting GROUP BY g
        HAVING count(DISTINCT doc_id) >= 2
    ), cand AS (
        SELECT doc_id, pos AS s, pos + {_SPAN_K - 1} AS e
        FROM posting WHERE g IN (SELECT g FROM dup)
    ), flagged AS (
        SELECT doc_id, s, e,
               CASE WHEN max(e) OVER w IS NULL
                         OR s > max(e) OVER w + 1
                    THEN 1 ELSE 0 END AS new_island
        FROM cand
        WINDOW w AS (PARTITION BY doc_id ORDER BY s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), isl AS (
        SELECT doc_id, s, e,
               sum(new_island) OVER (
                   PARTITION BY doc_id ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS island
        FROM flagged
    )
    SELECT doc_id,
           CAST(min(s) AS BIGINT) AS span_start,
           CAST(max(e) AS BIGINT) AS span_end,
           CAST(max(e) - min(s) + 1 AS BIGINT) AS span_tokens,
           CAST(count(*) AS BIGINT) AS n_windows
    FROM isl GROUP BY doc_id, island
    """,
)
def q_dedup_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact substring-level dedup (the Lee et al. repeated-span shape):
    # maximal token spans whose k-gram windows occur in >= 2 distinct
    # documents. Sliding md5 k-gram hashes built with transform+sequence
    # (zero UDFs, fused into the scan); ONE posting shuffle keyed on the
    # gram hash; duplicate marking is a semi-join (never all-pairs, the
    # plan sweep enforces it); span merge is the q_interval_coverage
    # island window, partitioned by doc_id. See llm/spans.py for the
    # full scale argument. Reference counterpart: none (its texts pass
    # through opaquely, main.py:116,122) — builder-brief extension.
    from ..llm.spans import duplicate_spans

    d = Catalog(spark, sf_dir).documents
    return duplicate_spans(d, k=_SPAN_K, min_doc_freq=2)


@query(
    "q_dedup_substrings_clean",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ), posting AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               md5(array_to_string(t[i:i+{_SPAN_K - 1}], ' ')) AS g
        FROM base,
             unnest(generate_series(1, greatest(len(t) - {_SPAN_K - 1}, 0)))
                 AS u(i)
    ), owners AS (
        SELECT g, min(doc_id) AS min_doc FROM posting GROUP BY g
        HAVING count(DISTINCT doc_id) >= 2
    ), removed AS (
        SELECT p.doc_id, p.pos AS s, p.pos + {_SPAN_K - 1} AS e
        FROM posting p JOIN owners o ON p.g = o.g AND p.doc_id <> o.min_doc
    ), covered AS (
        SELECT DISTINCT doc_id, CAST(q AS BIGINT) AS p
        FROM removed, unnest(generate_series(s, e)) v(q)
    ), tok AS (
        SELECT doc_id, CAST(generate_subscripts(t, 1) AS BIGINT) AS p,
               unnest(t) AS tk
        FROM base
    ), kept AS (
        SELECT doc_id, p, tk FROM tok
        WHERE NOT EXISTS (SELECT 1 FROM covered c
                          WHERE c.doc_id = tok.doc_id AND c.p = tok.p)
    ), agg AS (
        SELECT doc_id, string_agg(tk, ' ' ORDER BY p) AS clean_text,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT b.doc_id,
           coalesce(a.clean_text, '') AS clean_text,
           CAST(len(b.t) AS BIGINT) AS n_tokens,
           CAST(len(b.t) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
    FROM base b LEFT JOIN agg a ON b.doc_id = a.doc_id
    """,
)
def q_dedup_substrings_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The APPLY side of L2f: cut every duplicated window from all but its
    # lowest-id owning doc (deterministic keep-first-owner policy) and
    # reassemble the surviving tokens — the operator that actually
    # produces the deduplicated training corpus. Same gram-posting
    # substrate as q_dedup_substrings (llm/spans.py:gram_postings); the
    # clean text, token counts, and removed counts are all value-hashed
    # against the oracle's identical replay.
    from ..llm.spans import remove_duplicate_spans

    d = Catalog(spark, sf_dir).documents
    return remove_duplicate_spans(d, k=_SPAN_K)


# --- L35: source-mixture interleave ------------------------------------------


@query(
    "q_mixture_interleave",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, source,
               1 + CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % 8
                   AS weight_tenths,
               CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)),
                                    1, 8)) AS BIGINT) AS bucket
        FROM documents
    ), kept AS (
        SELECT doc_id, source, weight_tenths,
               md5('ord:' || CAST(doc_id AS VARCHAR)) AS mix_key
        FROM keyed
        WHERE bucket * 10 < weight_tenths * 4294967296
    )
    SELECT doc_id, source, CAST(weight_tenths AS BIGINT) AS weight_tenths,
           CAST(row_number() OVER (ORDER BY mix_key, doc_id) AS BIGINT)
               AS interleave_rank
    FROM kept
    """,
)
def q_mixture_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Source-mixture interleave: the operator a pretraining dataloader
    # actually consumes — per-domain target weights, a deterministic
    # Bernoulli keep hitting each domain's proportion, and ONE
    # interleaved global order (so a sequential reader sees domains
    # blended at their target rates, not domain-sorted runs). Three
    # engine-portable stages:
    # (1) weight_tenths in 1..8 is a pure function of the domain name
    #     (md5 bucket) — stands in for a user-supplied weights table; a
    #     real pipeline would broadcast-join that table instead;
    # (2) keep iff hash(doc) < weight: all-integer compare
    #     (bucket·10 < w·2^32 — no float rounding at the boundary),
    #     per-row, fused into the scan, zero shuffles, stable under
    #     corpus growth and reruns (the L16 selection-key argument);
    # (3) global interleave order by md5('ord:'||doc_id) — a
    #     multiplicative-hash-style blend — ranked by global_row_number
    #     (operators/agg.py): repartitionByRange + per-partition offsets,
    #     NO single-reducer global window; (mix_key, doc_id) is unique so
    #     the rank replays identically in the oracle's row_number.
    from ..llm.sampling import mixture_keys
    from ..operators.agg import global_row_number

    d = Catalog(spark, sf_dir).documents
    weight, bucket, mix_key = mixture_keys("doc_id", "source")
    kept = (
        d.select(
            "doc_id",
            "source",
            weight.alias("weight_tenths"),
            bucket.alias("bucket"),
        )
        .filter(
            F.col("bucket") * 10
            < F.col("weight_tenths") * F.lit(4294967296)
        )
        .select("doc_id", "source", "weight_tenths", mix_key.alias("mix_key"))
    )
    ranked = global_row_number(
        kept, ["mix_key", "doc_id"], out_col="interleave_rank"
    )
    return ranked.select(
        "doc_id", "source", "weight_tenths", "interleave_rank"
    )


# --- L2g: portable-hash MinHash witness --------------------------------------


def _minhash_md5_oracle(
    shingle_k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.6,
) -> str:
    """DuckDB replay of the md5-portable MinHash path.

    Embeds the SAME seeded universal-hash coefficients the Spark
    signatures use (llm/dedup.py:minhash_coefficients), computes every
    doc's 32 minima by unnest+min, takes pairs agreeing on any band's
    minima (band-hash equality == minima-tuple equality, md5 collisions
    aside), then verifies exact Jaccard over the md5 shingle-hash sets.
    """
    from ..llm.dedup import _MERSENNE61, minhash_coefficients

    coeffs = minhash_coefficients(num_hashes)
    mins = ",\n               ".join(
        f"min((h * {a} + {b}) % {_MERSENNE61}) AS m{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    rpb = num_hashes // bands
    band_eq = "\n           OR ".join(
        "("
        + " AND ".join(
            f"a.m{b * rpb + j} = b.m{b * rpb + j}" for j in range(rpb)
        )
        + ")"
        for b in range(bands)
    )
    return f"""
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(w) - {shingle_k}, 0) + 1),
                   i -> CAST(('0x' || substr(md5(
                            array_to_string(w[i:i+{shingle_k - 1}], ' ')
                        ), 1, 8)) AS BIGINT)
               )) AS hs
        FROM base
    ), shx AS (
        SELECT doc_id, unnest(hs) AS h FROM sh
    ), sig AS (
        SELECT doc_id,
               {mins}
        FROM shx GROUP BY doc_id
    ), pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE {band_eq}
    ), verified AS (
        SELECT p.id_a, p.id_b,
               CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                   / len(list_distinct(list_concat(sa.hs, sb.hs)))
                   AS jaccard
        FROM pairs p
        JOIN sh sa ON sa.doc_id = p.id_a
        JOIN sh sb ON sb.doc_id = p.id_b
    )
    SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= {threshold}
    """


@query("q_dedup_near_md5", oracle=_minhash_md5_oracle())
def q_dedup_near_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MinHash-LSH near-dup with every hash engine-portable (md5 shingle
    # base hashes, md5 band buckets, unrounded jaccard): byte-identical
    # banding/verification CODE to the production q_dedup_near
    # (portable=True only swaps the hash primitive), so this row's full
    # hash match is the oracle-checked witness that the LSH candidate
    # generation is correct — the production xxhash64 path keeps its
    # (cheaper) JVM hash and its recall-floor tests. Scale shape
    # unchanged: banded equi-join candidates, never all-pairs.
    from ..llm.dedup import minhash_near_duplicates

    d = Catalog(spark, sf_dir).documents
    return minhash_near_duplicates(
        d,
        "text",
        "doc_id",
        num_hashes=32,
        bands=8,
        shingle_k=3,
        jaccard_threshold=0.6,
        portable=True,
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "jaccard",
    )


# --- L2h: portable-hash SimHash witness --------------------------------------


def _simhash_md5_oracle(
    shingle_k: int = 2, nbits: int = 60, prefix_shift: int = 45,
    max_hamming: int = 23,
) -> str:
    """DuckDB replay of the 60-bit md5 SimHash path: per-doc bit votes by
    unnest+sum, sign-assembled signature, top-(nbits-shift)-bit blocking,
    Hamming verify — mirroring llm/dedup.py:simhash64(portable=True) and
    the q_dedup_simhash blocking exactly."""
    votes = ",\n               ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(nbits)
    )
    assemble = "\n               + ".join(
        f"(CASE WHEN v{j} > 0 THEN CAST({1 << j} AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END)"
        for j in range(nbits)
    )
    return f"""
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(w) - {shingle_k}, 0) + 1),
                   i -> CAST(('0x' || substr(md5(
                            array_to_string(w[i:i+{shingle_k - 1}], ' ')
                        ), 1, 15)) AS BIGINT)
               )) AS hs
        FROM base
    ), shx AS (
        SELECT doc_id, unnest(hs) AS h FROM sh
    ), votes AS (
        SELECT doc_id,
               {votes}
        FROM shx GROUP BY doc_id
    ), sig AS (
        SELECT doc_id,
               {assemble} AS simhash
        FROM votes
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b
      ON (a.simhash >> {prefix_shift}) = (b.simhash >> {prefix_shift})
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


@query("q_dedup_simhash_md5", oracle=_simhash_md5_oracle())
def q_dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SimHash near-dup with every hash engine-portable: 60-bit signatures
    # from md5 shingle hashes, SAME vote/assembly/blocking code as the
    # production q_dedup_simhash (portable=True swaps only the hash
    # primitive and width) — this row's full hash match is the
    # oracle-checked witness that the SimHash vote fold, signature
    # assembly, prefix blocking, and Hamming verify are all correct.
    # Threshold 23 ≈ the production 24 scaled from 63 to 60 bits.
    from ..llm.dedup import simhash64

    d = Catalog(spark, sf_dir).documents
    sigs = simhash64(d, "text", "doc_id", portable=True).cache()
    blocked = sigs.withColumn(
        "block", F.shiftright(F.col("simhash"), 45)
    )
    left = blocked.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sig_a"), "block"
    )
    right = blocked.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sig_b"), "block"
    )
    return (
        left.join(right, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast(
                "long"
            ),
        )
        .filter(F.col("hamming") <= 23)
        .select("id_a", "id_b", "hamming")
    )


# --- ST7: batch ≡ streaming merge equivalence --------------------------------


@query(
    "q_stream_merge_equiv",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value FROM (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               event_type, value,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
               ) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_stream_merge_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The streaming layer's first driver-gated CORRECTNESS row: replay
    # the events table as a REAL multi-batch file stream (3 files, one
    # microbatch each — 8 in r9, 4 in r10, 3 now: each batch is a fixed
    # foreachBatch + CoW-commit cost, the equivalence argument below is
    # file-count independent, and the claim only needs GENUINELY
    # multi-batch) through the foreachBatch
    # incremental MERGE
    # (streaming/structured.py:merge_stream_into), then return the final
    # durable state table. Oracle = the one-shot batch answer (latest
    # event per user by (ts, event_id)) — hash equality IS the
    # batch≡streaming equivalence claim.
    #
    # Equivalence argument: each user's rows are co-located in ONE input
    # file (repartition on the key), so the per-batch keep-last-by-ord
    # dedup resolves every key within its single batch and the final
    # state is independent of batch ARRIVAL ORDER — the property that
    # makes the claim robust rather than an artifact of file listing
    # order. At scale this is the standard CDC-compaction layout: route
    # by key, merge per batch, OCC-rename commit (sinks/merge.py).
    from ..sinks.merge import MergeSink
    from ..streaming.structured import (
        fixture_session,
        merge_stream_into,
        stream_from_parquet_dir,
    )

    e = Catalog(spark, sf_dir).events.select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    tmp = tempfile.mkdtemp(prefix="phe_stream_equiv_")
    src_dir = os.path.join(tmp, "in")
    e.repartition(3, "user_id").write.parquet(src_dir)

    s2 = fixture_session(spark)
    stream = stream_from_parquet_dir(
        s2, src_dir, e.schema, max_files_per_trigger=1
    ).withColumn("ord", F.struct("ts", "event_id"))
    sink = MergeSink(os.path.join(tmp, "state"), key="user_id")
    sink.init(local_rows(spark, [], stream.schema))
    q = merge_stream_into(
        stream, sink, name="q_stream_merge_equiv", order_by="ord"
    )
    q.processAllAvailable()
    q.stop()
    # eager localCheckpoint materializes the final state off the temp
    # parquet, so the whole tempdir (input copy + versioned snapshots)
    # can be removed NOW instead of leaking events-sized dirs per run
    result = (
        sink.read(spark)
        .select("user_id", "event_id", "ts", "event_type", "value")
        .localCheckpoint(eager=True)
    )
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return result


@query(
    "q_stream_mor_equiv",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           event_type, value
    FROM (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               event_type, value,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
               ) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_stream_mor_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ST7b: the streaming MERGE equivalence on the MERGE-ON-READ sink —
    # each microbatch commits ONLY its delta (latest event per key in
    # batch) via foreachBatch + MorTable.merge, no state rewrite per
    # batch (contrast q_stream_merge_equiv's CoW sink, which rewrites
    # the full state every commit — the write-amplification trade this
    # sink exists to avoid); the READER then resolves latest-wins across
    # the version chain. Equivalence argument is the same key-routing as
    # the CoW twin: each user's rows land in ONE file -> one batch, so
    # the per-batch keep-last-by-(ts, event_id) fully resolves the key
    # and each key appears in exactly one delta — the final read is
    # independent of batch arrival order. Oracle = one-shot batch
    # latest-per-key.
    import shutil

    from pyspark.sql import Window

    from ..sinks.mor import MorTable
    from ..streaming.structured import (
        fixture_session,
        stream_from_parquet_dir,
    )

    e = Catalog(spark, sf_dir).events.select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    tmp = tempfile.mkdtemp(prefix="phe_mor_stream_")
    src_dir = os.path.join(tmp, "in")
    # 3 key-routed files -> 3 delta commits: the equivalence argument
    # (each key resolved within its one batch) needs multi-batch, not
    # any particular count; 8 batches doubled the fixed foreachBatch
    # cost for no stronger claim (round-8 review, Next #8; 4 -> 3 in
    # r11's tail trim on the same reasoning)
    e.repartition(3, "user_id").write.parquet(src_dir)

    s2 = fixture_session(spark)
    stream = stream_from_parquet_dir(
        s2, src_dir, e.schema, max_files_per_trigger=1
    )
    t = MorTable(os.path.join(tmp, "state"), "user_id")
    t.init(local_rows(spark, [], e.schema))

    def commit_delta(bdf, _bid):
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        latest = (
            bdf.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        t.merge(bdf.sparkSession, source=latest)

    q = (
        stream.writeStream.foreachBatch(commit_delta)
        .option(
            "checkpointLocation", os.path.join(tmp, "ckpt")
        )
        .start()
    )
    q.processAllAvailable()
    q.stop()
    result = (
        t.read(spark)
        .select(
            "user_id",
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "event_type",
            "value",
        )
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(tmp, ignore_errors=True)
    return result


# --- AN15: OHLC bar resampling ----------------------------------------------


@query(
    "q_resample_ohlc",
    oracle="""
    WITH e AS (
        SELECT event_type,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900) * 900
                    AS BIGINT) AS bar_start,
               CAST(ts AS TIMESTAMP) AS ts, event_id,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ), r AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type, bar_start
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY event_type, bar_start
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM e
    ), agg AS (
        SELECT event_type, bar_start,
               CAST(count(*) AS BIGINT) AS n,
               CAST(max(cents) AS BIGINT) AS high_c,
               CAST(min(cents) AS BIGINT) AS low_c,
               CAST(sum(cents) AS BIGINT) AS sum_c
        FROM e GROUP BY 1, 2
    )
    SELECT agg.event_type, agg.bar_start, agg.n,
           o.cents AS open_c, agg.high_c, agg.low_c,
           c.cents AS close_c, agg.sum_c
    FROM agg
    JOIN (SELECT event_type, bar_start, cents FROM r WHERE rn_a = 1) o
      ON agg.event_type = o.event_type AND agg.bar_start = o.bar_start
    JOIN (SELECT event_type, bar_start, cents FROM r WHERE rn_d = 1) c
      ON agg.event_type = c.event_type AND agg.bar_start = c.bar_start
    """,
)
def q_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AN15: downsample an irregular event series to 15-minute OHLC bars
    # (the market-data / metrics-rollup staple). ONE map-side-combined
    # groupBy on (type, bar): open/close are min_by/max_by over the
    # total (ts, event_id) order — DeclarativeAggregates with partial
    # merge, deterministic under any partitioning because the order key
    # is unique; high/low/sum are exact BIGINT cents (floor-scale
    # fixed-point, never round()); the bar key is integer floor-division
    # of epoch seconds, identical on both engines. Zero joins, zero
    # windows — the cheapest possible shape for a corpus-wide rollup.
    e = Catalog(spark, sf_dir).events
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    epoch_s = F.unix_timestamp("ts")
    bar = (F.floor(epoch_s / 900) * 900).cast("long")
    ordkey = F.struct("ts", "event_id")
    return (
        e.select(
            "event_type",
            bar.alias("bar_start"),
            cents.alias("cents"),
            ordkey.alias("o"),
        )
        .groupBy("event_type", "bar_start")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min_by("cents", F.col("o")).alias("open_c"),
            F.max("cents").alias("high_c"),
            F.min("cents").alias("low_c"),
            F.max_by("cents", F.col("o")).alias("close_c"),
            F.sum("cents").alias("sum_c"),
        )
    )


# --- L36: deterministic exact-integer k-means --------------------------------


def _kmeans_cte_list(
    k: int, iterations: int, prefix: str = "", vec_expr: str = "embedding"
) -> tuple[list, str]:
    """Shared unrolled Lloyd CTEs (quantize, init, T× assign/update);
    returns (cte_list, final_centroid_cte_name). Used by the k-means,
    exact-IVF, and exact-PQ oracles. ``prefix`` namespaces the CTEs (PQ
    trains one independent codebook per subspace); ``vec_expr`` selects
    the (sub)vector to quantize."""
    P = prefix
    q_expr = (
        f"list_transform({vec_expr}, x -> "
        "CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) + 10000000)"
    )
    dist = (
        "CAST(list_sum(list_transform(list_zip(e.q, c.qc), "
        "s -> (s[1] - s[2])*(s[1] - s[2]))) AS BIGINT)"
    )
    ctes = [
        f"{P}e AS (SELECT vec_id, {q_expr} AS q FROM embeddings)",
        f"""{P}c0 AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
                   AS cid, q AS qc
        FROM (SELECT vec_id, q FROM {P}e ORDER BY vec_id LIMIT {k})
    )""",
    ]
    for t in range(iterations):
        ctes.append(
            f"""{P}s{t} AS (
        SELECT e.vec_id, e.q, c.cid, {dist} AS d2
        FROM {P}e e CROSS JOIN {P}c{t} c
    )"""
        )
        ctes.append(
            f"""{P}a{t} AS (
        SELECT vec_id, q, cid AS cluster FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY d2, cid) AS rn
            FROM {P}s{t}
        ) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""{P}p{t} AS (
        SELECT cluster, CAST(generate_subscripts(q, 1) AS BIGINT) AS idx,
               unnest(q) AS v
        FROM {P}a{t}
    )"""
        )
        ctes.append(
            f"""{P}m{t} AS (
        SELECT cluster, idx,
               CAST((s - (s % cnt)) / cnt AS BIGINT) AS mv
        FROM (
            SELECT cluster, idx,
                   CAST(sum(v) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM {P}p{t}
            GROUP BY cluster, idx
        )
    )"""
        )
        ctes.append(
            f"""{P}u{t} AS (
        SELECT cluster AS cid, list(mv ORDER BY idx) AS qc
        FROM {P}m{t} GROUP BY cluster
    )"""
        )
        ctes.append(
            f"""{P}c{t + 1} AS (
        SELECT o.cid, coalesce(n.qc, o.qc) AS qc
        FROM {P}c{t} o LEFT JOIN {P}u{t} n USING (cid)
    )"""
        )
    return ctes, f"{P}c{iterations}"


_KM_DIST = (
    "CAST(list_sum(list_transform(list_zip(e.q, c.qc), "
    "s -> (s[1] - s[2])*(s[1] - s[2]))) AS BIGINT)"
)


def _kmeans_oracle(k: int = 8, iterations: int = 3) -> str:
    """Unrolled-CTE DuckDB replay of llm/kmeans.py:kmeans_exact — one
    assignment + one centroid-update CTE pair per Lloyd iteration (the
    PageRank unrolled-oracle pattern applied to clustering)."""
    ctes, cfinal = _kmeans_cte_list(k, iterations)
    ctes = ctes + [
        f"""sf AS (
        SELECT e.vec_id, c.cid, {_KM_DIST} AS d2
        FROM e CROSS JOIN {cfinal} c
    )"""
    ]
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT vec_id, cid AS cluster, d2 FROM (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM sf
    ) WHERE rn = 1
    """


@query("q_kmeans_exact", oracle=_kmeans_oracle())
def q_kmeans_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L36: deterministic Lloyd k-means in exact integer arithmetic — the
    # auditable twin of MLlib's float KMeans (which merges partials in
    # partition order and can flip borderline assignments between runs).
    # Micro-unit quantization + a positivity OFFSET (distances are
    # translation-invariant; positive ints make the floor-mean engine-
    # portable), ties to the lowest cluster id. Per iteration: one
    # broadcast of K centroids, one vec-keyed argmin window, one
    # (cluster, dim)-keyed map-side-combined sum. See llm/kmeans.py for
    # the full scale shape.
    from ..llm.kmeans import kmeans_exact

    e = Catalog(spark, sf_dir).embeddings
    return kmeans_exact(e, k=8, iterations=3)


# --- L4b: text normalization (the C4-style pre-dedup canonicalizer) ----------


@query(
    "q_text_normalize",
    oracle="""
    WITH n AS (
        SELECT doc_id,
               trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                   ' +', ' ', 'g')) AS norm_text
        FROM documents
    )
    SELECT doc_id, norm_text,
           CASE WHEN norm_text = '' THEN CAST(0 AS BIGINT)
                ELSE CAST(len(string_split(norm_text, ' ')) AS BIGINT)
           END AS n_tokens_norm
    FROM n
    """,
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L4b: canonicalize text BEFORE hashing/dedup (the C4/CCNet
    # preprocessing step): lowercase, strip non-alphanumerics,
    # collapse/trim whitespace. Pure regexp_replace chains fused into
    # the scan — zero shuffles, the only affordable shape for a
    # corpus-wide rewrite at 100 TB. Spark's regexp_replace is
    # replace-ALL by default; DuckDB needs the explicit 'g' flag —
    # without it the oracle would silently replace first-match-only and
    # diverge on any doc with two strippable characters.
    from ..llm.text import normalize_text

    d = Catalog(spark, sf_dir).documents
    norm = normalize_text(F.col("text"))
    return d.select("doc_id", norm.alias("norm_text")).select(
        "doc_id",
        "norm_text",
        F.when(F.col("norm_text") == "", F.lit(0).cast("long"))
        .otherwise(F.size(F.split(F.col("norm_text"), " ")).cast("long"))
        .alias("n_tokens_norm"),
    )


# --- DQ1: data-quality expectation suite -------------------------------------


@query(
    "q_quality_expectations",
    oracle="""
    WITH m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(c_name) AS BIGINT) AS m0,
               CAST(count(DISTINCT c_custkey) AS BIGINT) AS m1,
               CAST(sum(CASE WHEN c_acctbal BETWEEN -1000.0 AND 10000.0
                             THEN 1 ELSE 0 END) AS BIGINT) AS m2,
               CAST(sum(CASE WHEN c_mktsegment IN
                             ('AUTOMOBILE','BUILDING','FURNITURE',
                              'HOUSEHOLD','MACHINERY')
                             THEN 1 ELSE 0 END) AS BIGINT) AS m3,
               CAST(sum(CASE WHEN c_acctbal > 0.0
                             THEN 1 ELSE 0 END) AS BIGINT) AS m4
        FROM customer
    )
    SELECT 'completeness' AS check_name, 'c_name' AS col_name,
           CAST(m0 AS DOUBLE) / n AS metric, CAST(1.0 AS DOUBLE) AS threshold,
           CAST(m0 AS DOUBLE) / n >= 1.0 AS passed FROM m
    UNION ALL
    SELECT 'unique', 'c_custkey', CAST(m1 AS DOUBLE) / n, CAST(1.0 AS DOUBLE),
           CAST(m1 AS DOUBLE) / n >= 1.0 FROM m
    UNION ALL
    SELECT 'in_range', 'c_acctbal', CAST(m2 AS DOUBLE) / n, CAST(1.0 AS DOUBLE),
           CAST(m2 AS DOUBLE) / n >= 1.0 FROM m
    UNION ALL
    SELECT 'in_set', 'c_mktsegment', CAST(m3 AS DOUBLE) / n, CAST(1.0 AS DOUBLE),
           CAST(m3 AS DOUBLE) / n >= 1.0 FROM m
    UNION ALL
    SELECT 'positive_balance', 'c_acctbal', CAST(m4 AS DOUBLE) / n, CAST(0.5 AS DOUBLE),
           CAST(m4 AS DOUBLE) / n >= 0.5 FROM m
    """,
)
def q_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DQ1: a deequ-style expectation suite — five checks (completeness,
    # key uniqueness, range, set membership, business-rule fraction)
    # compiled into ONE aggregation pass + a 5-row report
    # (operators/expectations.py). Exact BIGINT numerators; the metric
    # is one pinned double division, so the report value-hashes. Scale
    # caveat documented in the module: each `unique` check adds an
    # Expand duplicate of the scan rows — budget them.
    from ..operators.expectations import (
        completeness,
        expectation_report,
        in_range,
        in_set,
        satisfies,
        unique,
    )

    c = Catalog(spark, sf_dir).customer
    return expectation_report(
        c,
        [
            completeness("c_name"),
            unique("c_custkey"),
            in_range("c_acctbal", -1000.0, 10000.0),
            in_set(
                "c_mktsegment",
                ["AUTOMOBILE", "BUILDING", "FURNITURE",
                 "HOUSEHOLD", "MACHINERY"],
            ),
            satisfies(
                "positive_balance", "c_acctbal",
                F.col("c_acctbal") > 0.0, 0.5,
            ),
        ],
    )


# --- L1b: incremental ingest dedup (new batch vs existing corpus) ------------


@query(
    "q_dedup_incremental",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, sha256(text) AS h FROM documents
        WHERE doc_id % 5 <> 0
    ), batch AS (
        SELECT doc_id, sha256(text) AS h FROM documents
        WHERE doc_id % 5 = 0
    ), hit AS (
        SELECT h, min(doc_id) AS dup_of FROM corpus GROUP BY h
    )
    SELECT b.doc_id, hit.dup_of,
           hit.dup_of IS NULL AS is_new_content
    FROM batch b LEFT JOIN hit ON b.h = hit.h
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L1b: the INGEST form of exact dedup — an arriving batch is checked
    # against the already-ingested corpus, not against itself. Each new
    # doc reports the lowest corpus doc_id carrying identical content
    # (or NULL -> genuinely new). Shape: both sides reduce to
    # (sha2, id) — fixed 64-byte keys, never raw text, the only shuffle
    # row that stays small at 100 TB — the corpus side pre-aggregates
    # min(doc_id) per hash (map-side combined; also the contract that
    # makes the left join 1:1), then one equi-join on the hash. At
    # scale, the corpus hash index is exactly what a MergeSink-backed
    # dedup table maintains incrementally (L30's argument applied to
    # membership instead of counting).
    d = Catalog(spark, sf_dir).documents
    corpus = d.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id", F.sha2(F.col("text"), 256).alias("h")
    )
    batch = d.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.sha2(F.col("text"), 256).alias("h")
    )
    hit = corpus.groupBy("h").agg(F.min("doc_id").alias("dup_of"))
    return batch.join(hit, "h", "left").select(
        "doc_id", "dup_of", F.col("dup_of").isNull().alias("is_new_content")
    )


def _fixed_cos_sql(a: str, b: str) -> str:
    """The fixed-point pinned-double cosine between two embedding table
    aliases — ONE spelling shared by every witness oracle (a fix here
    lands everywhere; four hand-copies drifted apart would compile
    individually and disagree silently)."""
    return (
        f"floor(list_dot_product(CAST({a}.embedding AS DOUBLE[]),"
        f" CAST({b}.embedding AS DOUBLE[]))"
        f" / (sqrt(list_dot_product(CAST({a}.embedding AS DOUBLE[]),"
        f" CAST({a}.embedding AS DOUBLE[])))"
        f" * sqrt(list_dot_product(CAST({b}.embedding AS DOUBLE[]),"
        f" CAST({b}.embedding AS DOUBLE[]))))"
        " * 1000000.0 + 0.5) / 1000000.0"
    )


def _plane_bucket_ctes(n_bits: int, n_tables: int, dim: int = 64) -> str:
    """The md5-integer-hyperplane bucket pipeline (pl/q/qe/dots/buckets
    CTEs) shared by the embedding near-dup and LSH ANN witness oracles —
    mirrors llm/similarity.py:_portable_buckets exactly."""
    return f"""pl AS (
        SELECT t, b, i,
               CAST(('0x' || substr(md5('pl:' || t || ':' || b || ':' || i),
                                    1, 8)) AS BIGINT) % 1001 - 500 AS p
        FROM range({n_tables}) tt(t), range({n_bits}) bb(b),
             range({dim}) ii(i)
    ), q AS (
        SELECT vec_id,
               list_transform(embedding, x ->
                   CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
               ) AS qv
        FROM embeddings
    ), qe AS (
        SELECT vec_id, CAST(generate_subscripts(qv, 1) AS BIGINT) - 1 AS i,
               unnest(qv) AS v
        FROM q
    ), dots AS (
        SELECT qe.vec_id, pl.t, pl.b, CAST(sum(qe.v * pl.p) AS BIGINT) AS d
        FROM qe JOIN pl ON qe.i = pl.i
        GROUP BY 1, 2, 3
    ), buckets AS (
        SELECT vec_id, t,
               CAST(sum(CASE WHEN d > 0
                             THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
                    AS BIGINT) AS bucket
        FROM dots GROUP BY 1, 2
    )"""


# --- L2i: portable hyperplane-LSH embedding near-dup witness -----------------


def _embed_lsh_oracle(
    n_bits: int = 4, n_tables: int = 8, threshold: float = 0.3
) -> str:
    """DuckDB replay of embedding_near_duplicates(portable=True): the
    integer hyperplanes derive IN SQL from the same md5 formula the
    Spark side uses (llm/similarity.py:md5_plane_int), buckets from
    exact integer dot signs, verification via the pinned list_dot_product
    cosine quantized with the fixed-point floor (no round())."""
    cos = _fixed_cos_sql("a", "b")
    return f"""
    WITH {_plane_bucket_ctes(n_bits, n_tables)}, cand AS (
        SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
        FROM buckets x JOIN buckets y
          ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id
    )
    SELECT c.id_a, c.id_b, {cos} AS cos_sim
    FROM cand c
    JOIN embeddings a ON a.vec_id = c.id_a
    JOIN embeddings b ON b.vec_id = c.id_b
    WHERE {cos} >= {threshold}
    """


@query("q_dedup_embed_md5", oracle=_embed_lsh_oracle())
def q_dedup_embed_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L2i: the hyperplane-LSH embedding near-dup with every stage
    # engine-portable — integer planes from md5 (exact dot SIGNS: float
    # plane dots can flip knife-edge signs between engines; integer dots
    # cannot), banded candidate join, fixed-point pinned-double cosine
    # verify. The full hash match witnesses the LSH bucketing + verify
    # logic for the production q_dedup_embed (same banded-join code,
    # vectorized float planes). Same parameters as the production query
    # (threshold 0.3, bits=4, tables=8 — see its docstring for why).
    from ..llm.similarity import embedding_near_duplicates

    e = Catalog(spark, sf_dir).embeddings
    return embedding_near_duplicates(
        e, cosine_threshold=0.3, n_bits=4, n_tables=8, portable=True
    )


# --- L3b: portable LSH ANN witness -------------------------------------------


def _lsh_topk_oracle(
    n_bits: int = 4, n_tables: int = 16, k: int = 10, n_queries: int = 5
) -> str:
    """DuckDB replay of lsh_cosine_topk(portable=True): md5-derived
    integer hyperplane buckets for corpus AND queries, candidate
    equi-join on (table, bucket), fixed-point cosine rerank with
    (sim desc, id asc) tie-breaks — the ranked ANN result replays
    exactly, graduating the LSH ANN family from rows-only."""
    cos = _fixed_cos_sql("qa", "ca")
    return f"""
    WITH {_plane_bucket_ctes(n_bits, n_tables)}, cand AS (
        SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS vec_id
        FROM buckets qb
        JOIN buckets cb ON qb.t = cb.t AND qb.bucket = cb.bucket
        WHERE qb.vec_id < {n_queries}
    ), scored AS (
        SELECT c.query_id, c.vec_id, {cos} AS cos_sim
        FROM cand c
        JOIN embeddings qa ON qa.vec_id = c.query_id
        JOIN embeddings ca ON ca.vec_id = c.vec_id
    )
    SELECT query_id, vec_id, cos_sim, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC
        ) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= {k}
    """


@query("q_sim_topk_lsh_md5", oracle=_lsh_topk_oracle())
def q_sim_topk_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L3b: the LSH ANN path made fully replayable — the same banded
    # candidate join + exact rerank CODE as the production
    # q_sim_topk_lsh, with md5-derived integer-plane buckets (exact
    # sign bits) and a fixed-point cosine. Because rerank ties break on
    # (quantized sim desc, id asc), the RANKED result — not just the
    # candidate set — hash-matches the oracle, graduating the ANN
    # family's logic from rows-only+recall-floor to value-checked.
    from ..llm.similarity import lsh_cosine_topk

    e = Catalog(spark, sf_dir).embeddings
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_cosine_topk(
        e, queries, k=10, n_bits=4, n_tables=16, portable=True
    )


# --- L3c: exact-IVF ANN witness (kmeans_exact coarse quantizer) --------------


def _ivf_exact_oracle(
    n_centroids: int = 8,
    iterations: int = 3,
    n_probe: int = 2,
    k: int = 10,
    n_queries: int = 5,
) -> str:
    """DuckDB replay of llm/kmeans.py:ivf_exact_topk: the shared Lloyd
    CTEs train the quantizer, corpus lists and query probes assign by
    the same exact-integer metric, rerank is the fixed-point cosine."""
    ctes, cfinal = _kmeans_cte_list(n_centroids, iterations)
    cos = _fixed_cos_sql("qa", "ca")
    ctes = ctes + [
        f"""sl AS (
        SELECT e.vec_id, c.cid, {_KM_DIST} AS d2
        FROM e CROSS JOIN {cfinal} c
    )""",
        """lists AS (
        SELECT vec_id, cid AS cluster FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY d2, cid) AS rn
            FROM sl
        ) WHERE rn = 1
    )""",
        f"""probes AS (
        SELECT vec_id AS query_id, cid AS cluster FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY d2, cid) AS rn
            FROM sl WHERE vec_id < {n_queries}
        ) WHERE rn <= {n_probe}
    )""",
        """cand AS (
        SELECT p.query_id, l.vec_id
        FROM probes p JOIN lists l ON l.cluster = p.cluster
    )""",
        f"""scored AS (
        SELECT c.query_id, c.vec_id, {cos} AS cos_sim
        FROM cand c
        JOIN embeddings qa ON qa.vec_id = c.query_id
        JOIN embeddings ca ON ca.vec_id = c.vec_id
    )""",
    ]
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT query_id, vec_id, cos_sim, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC
        ) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= {k}
    """


@query("q_sim_topk_ivf_exact", oracle=_ivf_exact_oracle())
def q_sim_topk_ivf_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L3c: IVF ANN with the deterministic coarse quantizer — kmeans_exact
    # centroids, exact-integer list assignment and probe selection,
    # fixed-point cosine rerank with (sim desc, id asc) ties. The RANKED
    # result value-hashes against the oracle's identical replay,
    # witnessing the IVF list/probe/rerank logic that the float
    # production paths (q_sim_topk_ivf, q_sim_topk_ivf_indexed) share.
    from ..llm.kmeans import ivf_exact_topk

    e = Catalog(spark, sf_dir).embeddings
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_exact_topk(
        e, queries, k=10, n_centroids=8, iterations=3, n_probe=2
    )


# --- ST9: custom stateful operator (applyInPandasWithState) ------------------


@query(
    "q_stream_stateful_totals",
    oracle="""
    SELECT user_id AS key,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               / 1.0 AS total
    FROM events
    GROUP BY user_id
    """,
)
def q_stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ST9: the custom-stateful escape hatch (applyInPandasWithState)
    # under the driver gate: per-key running (count, sum) state carried
    # across micro-batches of a REAL 4-file stream, returned as the
    # final per-key totals. Determinism/portability argument:
    # (a) each key's rows are routed to ONE input file -> one batch, so
    #     every key emits exactly one update row (no last-row-wins
    #     ambiguity in the memory sink);
    # (b) the summed value is integer CENTS carried in doubles — float
    #     addition of integers < 2^53 is exact in ANY order, so the
    #     pandas in-batch sum equals DuckDB's aggregate exactly (the
    #     only float-sum shape that is order-independent).
    # State is one tuple per key (O(|keys|) memory, key-partitioned) —
    # the shape that survives an unbounded stream.
    import uuid

    from ..streaming.stateful import running_totals
    from ..streaming.structured import (
        fixture_session,
        run_to_memory,
        stream_from_parquet_dir,
    )

    e = Catalog(spark, sf_dir).events.select(
        "user_id",
        F.floor(F.col("value") * 100.0 + F.lit(0.5))
        .cast("double")
        .alias("cents"),
    )
    tmp = os.path.join(tempfile.mkdtemp(prefix="phe_stateful_"), "in")
    e.repartition(4, "user_id").write.parquet(tmp)
    s2 = fixture_session(spark)
    stream = stream_from_parquet_dir(
        s2, tmp, e.schema, max_files_per_trigger=1
    )
    out = running_totals(stream, "user_id", "cents")
    name = f"stateful_{uuid.uuid4().hex}"
    run_to_memory(out, name, output_mode="update")
    import shutil

    # the memory sink holds the result; drop the input copy immediately
    shutil.rmtree(os.path.dirname(tmp), ignore_errors=True)
    return s2.table(name).select("key", "n", "total")


@query(
    "q_stream_stateful_totals_tws",
    oracle="""
    SELECT user_id AS key,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               / 1.0 AS total
    FROM events
    GROUP BY user_id
    """,
)
def q_stream_stateful_totals_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ST9b: the SAME per-key running-totals contract as
    # q_stream_stateful_totals, executed on transformWithStateInPandas —
    # Spark 4's typed-state successor API (named ValueState handles in
    # the RocksDB store, one column family per state variable). The
    # protobuf runtime the TWS protocol needs is discovered and injected
    # at runtime (streaming/protobuf_compat.enable_tws): driver sys.path
    # + worker PYTHONPATH/env ride on sc.environment, so this works under
    # an externally-created plain session too. Determinism argument is
    # identical to the applyInPandasWithState twin above (one file per
    # key -> one update row per key; integer cents in doubles sum
    # exactly). On a host with no protobuf anywhere the query falls back
    # to the applyInPandasWithState implementation — same semantics, same
    # oracle — and the capability is visible via tws_available().
    import uuid

    from ..streaming.protobuf_compat import tws_available
    from ..streaming.stateful import running_totals, running_totals_tws
    from ..streaming.structured import (
        fixture_session,
        run_to_memory,
        stream_from_parquet_dir,
    )

    e = Catalog(spark, sf_dir).events.select(
        "user_id",
        F.floor(F.col("value") * 100.0 + F.lit(0.5))
        .cast("double")
        .alias("cents"),
    )
    tmp = os.path.join(tempfile.mkdtemp(prefix="phe_tws_"), "in")
    e.repartition(2, "user_id").write.parquet(tmp)
    s2 = fixture_session(spark)
    stream = stream_from_parquet_dir(
        s2, tmp, e.schema, max_files_per_trigger=1
    )
    op = running_totals_tws if tws_available() else running_totals
    out = op(stream, "user_id", "cents")
    name = f"tws_{uuid.uuid4().hex}"
    run_to_memory(out, name, output_mode="update")
    import shutil

    shutil.rmtree(os.path.dirname(tmp), ignore_errors=True)
    return s2.table(name).select("key", "n", "total")


@query(
    "q_stream_topn_tws",
    oracle="""
    SELECT user_id AS key, CAST(rn AS BIGINT) AS rank, c AS value
    FROM (
        SELECT user_id,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(floor(value * 100.0 + 0.5) AS BIGINT) DESC
               ) AS rn
        FROM events
    ) WHERE rn <= 3
    """,
)
def q_stream_topn_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ST9c: TWS **ListState** under the gate — per-key running top-3
    # across a REAL 2-file multi-batch stream (files deliberately NOT
    # key-routed: the top-n multiset is arrival-order independent, so
    # unlike the totals queries no batch-routing construction is needed
    # — any replay order converges to the same final state). Each batch
    # emits a key's current top-3 with a strictly-increasing n_seen; the
    # final answer per key is its max-n_seen emission, selected
    # relationally. Values are exact integer cents. Falls back to a
    # batch window when no protobuf runtime exists on the host (same
    # policy as ST9b), keeping the row green with identical semantics.
    import shutil
    import uuid

    from pyspark.sql import Window

    from ..streaming.protobuf_compat import tws_available
    from ..streaming.stateful import running_topn_tws
    from ..streaming.structured import (
        fixture_session,
        run_to_memory,
        stream_from_parquet_dir,
    )

    e = Catalog(spark, sf_dir).events.select(
        "user_id",
        F.floor(F.col("value") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    if not tws_available():
        w = Window.partitionBy("user_id").orderBy(F.col("cents").desc())
        return (
            e.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= 3)
            .select(
                F.col("user_id").alias("key"), "rank",
                F.col("cents").alias("value"),
            )
        )
    tmp = os.path.join(tempfile.mkdtemp(prefix="phe_topn_"), "in")
    e.repartition(2).write.parquet(tmp)
    s2 = fixture_session(spark)
    stream = stream_from_parquet_dir(
        s2, tmp, e.schema, max_files_per_trigger=1
    )
    out = running_topn_tws(stream, "user_id", "cents", n=3)
    name = f"topn_{uuid.uuid4().hex}"
    run_to_memory(out, name, output_mode="update")
    shutil.rmtree(os.path.dirname(tmp), ignore_errors=True)
    snap = s2.table(name)
    wlast = Window.partitionBy("key")
    return (
        snap.withColumn("__mx", F.max("n_seen").over(wlast))
        .filter(F.col("n_seen") == F.col("__mx"))
        .select("key", "rank", "value")
    )


@query(
    "q_stream_mapstate_tws",
    oracle="""
    SELECT user_id AS key, event_type AS subkey,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_mapstate_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ST9d: TWS **MapState** under the gate — per-(user, event_type)
    # running counts across a REAL 2-file multi-batch stream, completing
    # the typed-state trio (ValueState: ST9b totals; ListState: ST9c
    # top-n). Updates touch only the subkeys present in each batch
    # (point getValue/updateValue ops); each batch emits the key's full
    # current map with a strictly-increasing n_seen, final map selected
    # relationally as the max-n_seen emission. Counts are arrival-order
    # independent — no key-routing construction needed. Batch-window
    # fallback with identical semantics when no protobuf runtime exists.
    import shutil
    import uuid

    from pyspark.sql import Window

    from ..streaming.protobuf_compat import tws_available
    from ..streaming.stateful import running_subkey_counts_tws
    from ..streaming.structured import (
        fixture_session,
        run_to_memory,
        stream_from_parquet_dir,
    )

    e = Catalog(spark, sf_dir).events.select("user_id", "event_type")
    if not tws_available():
        return (
            e.groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                F.col("user_id").alias("key"),
                F.col("event_type").alias("subkey"),
                "cnt",
            )
        )
    tmp = os.path.join(tempfile.mkdtemp(prefix="phe_mapst_"), "in")
    e.repartition(2).write.parquet(tmp)
    s2 = fixture_session(spark)
    stream = stream_from_parquet_dir(
        s2, tmp, e.schema, max_files_per_trigger=1
    )
    out = running_subkey_counts_tws(stream, "user_id", "event_type")
    name = f"mapst_{uuid.uuid4().hex}"
    run_to_memory(out, name, output_mode="update")
    shutil.rmtree(os.path.dirname(tmp), ignore_errors=True)
    snap = s2.table(name)
    wlast = Window.partitionBy("key")
    return (
        snap.withColumn("__mx", F.max("n_seen").over(wlast))
        .filter(F.col("n_seen") == F.col("__mx"))
        .select("key", "subkey", "cnt")
    )


def _semantic_dedup_oracle(
    threshold: float = 0.5, k: int = 8, iterations: int = 3
) -> str:
    """DuckDB replay of llm/semdedup.semantic_dedup: the shared unrolled
    Lloyd CTEs -> final-centroid assignment -> cluster-local pair scan
    with the fixed-point cosine -> keep-lowest-id rule."""
    ctes, cfinal = _kmeans_cte_list(k, iterations)
    dist = (
        "CAST(list_sum(list_transform(list_zip(e.q, c.qc), "
        "s -> (s[1] - s[2])*(s[1] - s[2]))) AS BIGINT)"
    )
    cos = _fixed_cos_sql("a", "b")
    ctes.append(
        f"""sl AS (
        SELECT e.vec_id, c.cid, {dist} AS d2
        FROM e e CROSS JOIN {cfinal} c
    )"""
    )
    ctes.append(
        """asg AS (
        SELECT vec_id, cid AS cluster FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY d2, cid) AS rn
            FROM sl
        ) WHERE rn = 1
    )"""
    )
    ctes.append(
        f"""dropped AS (
        SELECT DISTINCT y.vec_id
        FROM asg x JOIN asg y ON x.cluster = y.cluster
                              AND x.vec_id < y.vec_id
        JOIN embeddings a ON a.vec_id = x.vec_id
        JOIN embeddings b ON b.vec_id = y.vec_id
        WHERE {cos} >= {threshold}
    )"""
    )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT g.vec_id, g.cluster,
           (d.vec_id IS NULL) AS kept
    FROM asg g LEFT JOIN dropped d USING (vec_id)
    """


@query("q_dedup_semantic", oracle=_semantic_dedup_oracle())
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L38: SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic
    # near-dup removal with the pairwise scan confined to k-means
    # clusters, the published recipe for web-scale embedding dedup. The
    # deterministic exact-integer k-means makes the WHOLE pipeline
    # (clustering included) hash-replayable; the keep-lowest-id rule and
    # the fixed-point cosine mirror the other embedding witnesses. At
    # 100 TB: centroid count grows with the corpus (cluster-local pairs
    # stay bounded), clustering is broadcast-centroid linear.
    from ..llm.semdedup import semantic_dedup

    e = Catalog(spark, sf_dir).embeddings
    return semantic_dedup(
        e, cosine_threshold=0.5, n_centroids=8, iterations=3
    )


# --- L3d: exact-PQ ANN witness ----------------------------------------------


def _pq_exact_oracle(
    m: int = 4,
    k_codes: int = 8,
    iterations: int = 2,
    k: int = 10,
    refine: int = 3,
    n_queries: int = 5,
    dim: int = 64,
) -> str:
    """DuckDB replay of llm/kmeans.py:pq_exact_topk — per-subspace Lloyd
    CTEs (namespaced via _kmeans_cte_list), integer code assignment,
    integer ADC lookup-sum, fixed-point cosine rerank."""
    dsub = dim // m
    cos = _fixed_cos_sql("qa", "ca")
    ctes: list = []
    parts = []
    for j in range(m):
        sub = f"embedding[{j * dsub + 1}:{(j + 1) * dsub}]"
        sub_ctes, cfinal = _kmeans_cte_list(
            k_codes, iterations, prefix=f"b{j}", vec_expr=sub
        )
        ctes += sub_ctes
        ctes.append(
            f"""b{j}sl AS (
        SELECT e.vec_id, c.cid,
               CAST(list_sum(list_transform(list_zip(e.q, c.qc),
                   s -> (s[1] - s[2])*(s[1] - s[2]))) AS BIGINT) AS d2
        FROM b{j}e e CROSS JOIN {cfinal} c
    )"""
        )
        ctes.append(
            f"""b{j}code AS (
        SELECT vec_id, cid AS code, d2 FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY d2, cid) AS rn
            FROM b{j}sl
        ) WHERE rn = 1
    )"""
        )
        parts.append(
            f"SELECT q.vec_id AS query_id, c.vec_id, q.d2\n"
            f"        FROM b{j}code c JOIN b{j}sl q\n"
            f"          ON q.cid = c.code AND q.vec_id < {n_queries}"
        )
    ctes.append(
        "adcparts AS (\n        " + "\n        UNION ALL\n        ".join(parts) + "\n    )"
    )
    ctes.append(
        """adc AS (
        SELECT query_id, vec_id, CAST(sum(d2) AS BIGINT) AS approx_d2
        FROM adcparts GROUP BY 1, 2
    )"""
    )
    ctes.append(
        f"""cand AS (
        SELECT query_id, vec_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY approx_d2, vec_id) AS rn
            FROM adc
        ) WHERE rn <= {refine * k}
    )"""
    )
    ctes.append(
        f"""scored AS (
        SELECT c.query_id, c.vec_id, {cos} AS cos_sim
        FROM cand c
        JOIN embeddings qa ON qa.vec_id = c.query_id
        JOIN embeddings ca ON ca.vec_id = c.vec_id
    )"""
    )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT query_id, vec_id, cos_sim, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC
        ) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= {k}
    """


@query("q_sim_topk_pq_exact", oracle=_pq_exact_oracle())
def q_sim_topk_pq_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L3d: PQ ANN with everything exact — per-subspace codebooks from the
    # deterministic Lloyd loop, integer code assignment, integer ADC
    # lookup-sum, fixed-point cosine rerank. With this, all FOUR ANN
    # paths (brute force, LSH, IVF, PQ) have a value-hash-checked form;
    # the float production PQ (llm/pq.py: numpy codebooks, Arrow encode)
    # keeps its vectorized speed and its lossless-codebook exactness
    # tests. Witness geometry is m=4 subspaces x 8 codes (vs
    # production's 8x16): the exactness claim is per-STAGE (Lloyd,
    # assignment, ADC, rerank), not per-geometry, and the smaller loop
    # halves the per-subspace checkpoint chain that dominated the
    # parity sweep (round-8 review, Next #8).
    from ..llm.kmeans import pq_exact_topk

    e = Catalog(spark, sf_dir).embeddings
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_exact_topk(
        e, queries, k=10, m=4, k_codes=8, iterations=2, refine=3
    )


# --- L6b: per-group exact-k sample -------------------------------------------


@query(
    "q_sample_group_exact_k",
    oracle="""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY ((doc_id % 2147483648) * 2654435761)
                            % 4294967296, doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= 30
    """,
)
def q_sample_group_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L6b: exactly k rows PER GROUP (the stratified form of AN2's
    # exact-k sample): rank rows within each lang by the Knuth
    # multiplicative hash of the id and keep the k smallest — a
    # reproducible, mergeable per-stratum budget the fraction-based
    # samplers can't hit exactly. One window shuffle keyed on the
    # group; group cardinality is the partitioning dimension, so this
    # holds for any number of groups (unlike a global ORDER BY ... the
    # per-group heap is the window's sort, bounded per task).
    d = Catalog(spark, sf_dir).documents
    from pyspark.sql import Window

    h = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(2147483648)) * F.lit(2654435761),
        F.lit(4294967296),
    )
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 30)
        .select("doc_id", "lang")
    )


# --- ST6b: streaming keep-first dedup under the gate -------------------------


@query(
    "q_stream_dedup_equiv",
    oracle="""
    SELECT user_id, event_type, event_id, ts FROM (
        SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
               row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY CAST(ts AS TIMESTAMP), event_id
               ) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_stream_dedup_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ST6b: the REAL dropDuplicatesWithinWatermark stream (ST6's batch
    # twin q_stream_dedup is already gated; this gates the streaming
    # path itself). Equivalence construction: files are key-routed (each
    # (user, type)'s rows in ONE batch) AND sorted by (ts, event_id)
    # within each file, so "first arrival" — the operator's keep rule —
    # IS the earliest event, which the oracle computes relationally.
    # The watermark delay spans the fixture's full time range: batches
    # arrive key-routed, not time-ordered, so a short horizon would
    # DROP (not dedup) later batches' older events once batch 1
    # advanced the watermark — with a full-range horizon nothing is
    # late and state stays bounded by |keys|. Multi-batch keep-first
    # with out-of-order arrival and a tight horizon is deliberately
    # watermark-dependent and stays covered (un-oracle-ably) by
    # tests/test_structured_streaming.py.
    import uuid

    from ..streaming.structured import (
        dedup_stream,
        fixture_session,
        run_to_memory,
        stream_from_parquet_dir,
    )

    e = Catalog(spark, sf_dir).events.select(
        "user_id", "event_type", "event_id", "ts"
    )
    tmp = os.path.join(tempfile.mkdtemp(prefix="phe_sdedup_"), "in")
    # file count scales with the corpus so each key-routed file stays
    # under the one-split bound asserted below (~25k of these narrow
    # rows ≈ well under 1 MiB parquet); min 4 keeps the multi-batch
    # replay meaningful at small SFs
    n_files = max(4, int(e.count()) // 25_000 + 1)
    (
        e.repartition(n_files, "user_id", "event_type")
        .sortWithinPartitions("ts", "event_id")
        .write.parquet(tmp)
    )
    # The keep-first ≡ keep-earliest argument needs each file to stay ONE
    # input split (a split boundary would scatter a key's sorted run
    # across racing scan tasks and make "first arrival" order-dependent,
    # round-6 advice). Files at or under openCostInBytes (4 MiB default)
    # are never split — maxSplitBytes = min(maxPartitionBytes,
    # max(openCostInBytes, bytesPerCore)) ≥ openCostInBytes — so assert
    # the fixture stays inside that bound rather than hoping.
    try:
        open_cost = int(
            spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
        )
    except ValueError:  # human-form value like "4MB"
        open_cost = 4 * 1024 * 1024
    for fname in os.listdir(tmp):
        if fname.endswith(".parquet"):
            fsize = os.path.getsize(os.path.join(tmp, fname))
            assert fsize <= open_cost, (
                f"q_stream_dedup_equiv fixture file {fname} is {fsize} B > "
                f"openCostInBytes {open_cost}; it could split and break "
                "the keep-first ordering argument — shrink the fixture"
            )
    s2 = fixture_session(spark)
    stream = stream_from_parquet_dir(
        s2, tmp, e.schema, max_files_per_trigger=1
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = dedup_stream(
        stream,
        keys=["user_id", "event_type"],
        ts="ts",
        watermark="3650 days",
    )
    name = f"sdedup_{uuid.uuid4().hex}"
    run_to_memory(out, name, output_mode="append")
    import shutil

    shutil.rmtree(os.path.dirname(tmp), ignore_errors=True)
    return s2.table(name).select("user_id", "event_type", "event_id", "ts")


# --- L7b: end-to-end pretraining-prep pipeline (round-6 ops composed) --------

_PRETRAIN_ORACLE = """
WITH norm AS (
    SELECT doc_id, source,
           trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g')) AS norm_text
    FROM documents
), dedup AS (
    SELECT doc_id, source, norm_text FROM (
        SELECT *, row_number() OVER (
            PARTITION BY md5(norm_text) ORDER BY doc_id) AS rn
        FROM norm
    ) WHERE rn = 1
), kept AS (
    SELECT doc_id, source, norm_text,
           md5('ord:' || CAST(doc_id AS VARCHAR)) AS mix_key
    FROM dedup
    WHERE CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)),
                               1, 8)) AS BIGINT) * 10
          < (1 + CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % 8)
            * 4294967296
), ranked AS (
    SELECT doc_id, source,
           CASE WHEN norm_text = '' THEN CAST(0 AS BIGINT)
                ELSE CAST(len(string_split(norm_text, ' ')) AS BIGINT)
           END AS n_tokens,
           CAST(row_number() OVER (ORDER BY mix_key, doc_id) AS BIGINT)
               AS interleave_rank
    FROM kept
)
SELECT doc_id, source, n_tokens, interleave_rank,
       CAST(floor(coalesce(sum(n_tokens) OVER (
                PARTITION BY interleave_rank % 8 ORDER BY interleave_rank
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
            ), 0) / 512.0) AS BIGINT) AS pack_id
FROM ranked
"""


@query("q_pipeline_pretrain", oracle=_PRETRAIN_ORACLE)
def q_pipeline_pretrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L7b: the round-6 operators COMPOSED into one end-to-end
    # pretraining-prep pipeline, hash-checked through every stage:
    # normalize (L4b scan-fused rewrite) -> exact dedup on the
    # normalized content (keep-lowest-id per md5) -> deterministic
    # mixture keep + global interleave rank (L35) -> fixed-budget chunk
    # packing (L11) bucketed BY THE INTERLEAVE RANK, so each pack reads
    # as a contiguous run of the blended training order. Scale shape:
    # one scan-fused rewrite, one hash-keyed dedup shuffle, one
    # scan-fused keep, the scale-safe global rank, and one bucketed
    # running-sum window — no stage materializes more than the corpus
    # once. The composition is what a user actually runs; hash equality
    # end-to-end is the guarantee the stages compose without semantic
    # drift (the q_pipeline_curation argument, extended to round 6).
    from ..llm.sampling import mixture_keys
    from ..llm.text import normalize_text
    from ..operators.agg import global_row_number

    d = Catalog(spark, sf_dir).documents
    n = d.select(
        "doc_id", "source", normalize_text(F.col("text")).alias("norm_text")
    )
    wdup = Window.partitionBy(F.md5(F.col("norm_text"))).orderBy(
        F.col("doc_id").asc()
    )
    dedup = (
        n.withColumn("__rn", F.row_number().over(wdup))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    weight, bucket, mix_key = mixture_keys("doc_id", "source")
    kept = dedup.filter(bucket * 10 < weight * F.lit(4294967296)).select(
        "doc_id",
        "source",
        F.when(F.col("norm_text") == "", F.lit(0).cast("long"))
        .otherwise(F.size(F.split(F.col("norm_text"), " ")).cast("long"))
        .alias("n_tokens"),
        mix_key.alias("mix_key"),
    )
    ranked = global_row_number(
        kept, ["mix_key", "doc_id"], out_col="interleave_rank"
    ).drop("mix_key")
    wpack = (
        Window.partitionBy(F.pmod(F.col("interleave_rank"), F.lit(8)))
        .orderBy(F.col("interleave_rank").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(wpack), F.lit(0))
    return ranked.select(
        "doc_id",
        "source",
        "n_tokens",
        "interleave_rank",
        F.floor(cum_before / F.lit(512.0)).cast("long").alias("pack_id"),
    )


# --- A12b: exact interpolated global quantiles -------------------------------


def _cont_quantile_oracle(fractions=(0.5, 0.9, 0.99)) -> str:
    """Explicit type-7 interpolation over an exact global rank — NEVER
    DuckDB's quantile_cont, whose internal blend order could differ; the
    lerp is spelled with the same IEEE expression the Spark side uses."""
    parts = []
    for q in fractions:
        parts.append(f"""
    SELECT CAST({q} AS DOUBLE) AS fraction,
           CAST(max(CASE WHEN rn = lo THEN cents END) AS DOUBLE)
           + (CAST(coalesce(max(CASE WHEN rn = hi THEN cents END),
                            max(CASE WHEN rn = lo THEN cents END))
                   AS DOUBLE)
              - CAST(max(CASE WHEN rn = lo THEN cents END) AS DOUBLE))
             * (h - floor(h)) AS value
    FROM (
        SELECT cents, rn,
               (CAST({q} AS DOUBLE) * (n - 1)) AS h,
               CAST(floor(CAST({q} AS DOUBLE) * (n - 1)) AS BIGINT) + 1
                   AS lo,
               least(CAST(floor(CAST({q} AS DOUBLE) * (n - 1)) AS BIGINT)
                     + 2, n) AS hi
        FROM r
    ) GROUP BY h""")
    body = "\n    UNION ALL\n".join(parts)
    return f"""
    WITH v AS (
        SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL
    ), r AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents) AS rn,
               count(*) OVER () AS n
        FROM v
    )
    {body}
    """


@query("q_agg_global_quantiles_cont", oracle=_cont_quantile_oracle())
def q_agg_global_quantiles_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A12b: exact INTERPOLATED (numpy/pandas/R type-7) global quantiles —
    # the convention ML feature pipelines actually use — with the same
    # no-single-reducer decomposition as the discrete A12: range
    # partition, local sort, driver prefix sums, a <= 2 fractions-sized
    # rank pick, one pinned-double lerp. h = (n-1)·q and the blend are
    # computed with the identical double expression on both engines
    # (never the engines' own quantile_cont/percentile — internal blend
    # order is unspecified).
    from ..operators.agg import exact_global_quantiles_cont

    li = Catalog(spark, sf_dir).lineitem.select(
        fixed_cents(F.col("l_extendedprice")).alias("cents")
    )
    return exact_global_quantiles_cont(
        li, "cents", fractions=(0.5, 0.9, 0.99)
    )


# --- ST1b: streaming windowed aggregation under the gate ---------------------


@query(
    "q_stream_tumbling_equiv",
    oracle="""
    SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT)
               AS bucket_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ST1b: the REAL watermarked streaming tumbling-window aggregation
    # (ST1's batch twin q_stream_tumbling is already gated; this gates
    # the streaming path itself). Output mode COMPLETE makes the
    # equivalence unconditional: the sink always holds the full current
    # aggregate, so the final snapshot equals the batch answer for ANY
    # batching/arrival order — no key routing needed (unlike the
    # append/update-mode equivalence constructions). Sums are exact
    # integer cents; the watermark is present (bounding state is the
    # production contract) but cannot drop completed windows in
    # complete mode.
    import uuid

    from ..streaming.structured import (
        fixture_session,
        run_to_memory,
        stream_from_parquet_dir,
        windowed_counts_stream,
    )

    e = Catalog(spark, sf_dir).events.select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    tmp = os.path.join(tempfile.mkdtemp(prefix="phe_stumb_"), "in")
    e.repartition(4).write.parquet(tmp)
    s2 = fixture_session(spark)
    stream = stream_from_parquet_dir(
        s2, tmp, e.schema, max_files_per_trigger=1
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    agg = windowed_counts_stream(
        stream,
        ts="ts",
        width="1 hour",
        watermark="10 minutes",
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("total_cents"),
        ],
    )
    name = f"stumb_{uuid.uuid4().hex}"
    run_to_memory(agg, name, output_mode="complete")
    import shutil

    shutil.rmtree(os.path.dirname(tmp), ignore_errors=True)
    return s2.table(name).select(
        F.unix_timestamp("window_start").cast("long").alias("bucket_start"),
        "event_type",
        "n",
        "total_cents",
    )


# --- ST3b: streaming session-window aggregation under the gate ---------------


@query(
    "q_stream_session_equiv",
    oracle="""
    -- lag-gap-cumsum sessionization (30-minute idle gap per user), the
    -- same recursion as q_stream_session's oracle but with exact cents
    WITH gapped AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
               -- >= : Spark's session_window is END-EXCLUSIVE ([start,
               -- start+gap)), so a pair exactly gap apart starts a NEW
               -- session; the oracle split must agree at the boundary
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM gapped
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_s,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_stream_session_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ST3b: the REAL watermarked streaming session-window aggregation
    # (round-6 review Next #7 — ST3's batch twin q_stream_session is
    # gated; this gates the streaming session path itself, completing
    # the real-stream equivalence family: tumbling/dedup/merge/
    # interval-join/stateful all have one). Output mode COMPLETE makes
    # the final snapshot the full current aggregate, and session merging
    # is order-free set union of overlapping [ts, ts+gap) intervals — so
    # the snapshot equals the batch F.session_window answer provided no
    # input row is dropped as late. Unlike plain window aggs, the
    # session operator DOES late-filter inputs against the watermark
    # even in complete mode (measured: 4-file replay loses a
    # run-varying ~48% of sessions at "10 minutes"), so the gate pins a
    # watermark wider than the fixture's whole time span: the stream is
    # still a real 4-file multi-batch run through the watermarked
    # operator, but no arrival order can make any row late. Production
    # uses a real horizon + append mode; that path's late-drop semantics
    # is deliberately watermark-dependent and not oracle-able.
    # Sums are exact integer cents.
    import shutil
    import uuid

    from ..streaming.structured import (
        fixture_session,
        run_to_memory,
        sessionized_stream,
        stream_from_parquet_dir,
    )

    e = Catalog(spark, sf_dir).events.select(
        "user_id",
        "ts",
        F.floor(F.col("value") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    tmp = os.path.join(tempfile.mkdtemp(prefix="phe_ssess_"), "in")
    e.repartition(4).write.parquet(tmp)
    s2 = fixture_session(spark)
    stream = stream_from_parquet_dir(
        s2, tmp, e.schema, max_files_per_trigger=1
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    agg = sessionized_stream(
        stream,
        ts="ts",
        gap="30 minutes",
        watermark="3650 days",
        keys=["user_id"],
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("total_cents"),
        ],
    )
    name = f"ssess_{uuid.uuid4().hex}"
    run_to_memory(agg, name, output_mode="complete")
    shutil.rmtree(os.path.dirname(tmp), ignore_errors=True)
    return s2.table(name).select(
        "user_id",
        F.unix_timestamp("window_start").cast("long").alias("session_start_s"),
        "n_events",
        "total_cents",
    )


# --- L37: preference-pair construction (RLHF data prep) ---------------------


@query(
    "q_preference_pairs",
    oracle="""
    WITH scored AS (
        SELECT source, doc_id,
               CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                    t -> t <> '')) AS BIGINT) AS score
        FROM documents
    ), ranked AS (
        SELECT source, doc_id, score,
               row_number() OVER (
                   PARTITION BY source ORDER BY score DESC, doc_id ASC
               ) AS rtop,
               row_number() OVER (
                   PARTITION BY source ORDER BY score ASC, doc_id DESC
               ) AS rbot
        FROM scored
    )
    SELECT b.source,
           b.doc_id AS chosen_id, w.doc_id AS rejected_id,
           b.score AS chosen_score, w.score AS rejected_score,
           b.score - w.score AS margin
    FROM ranked b JOIN ranked w
      ON b.source = w.source AND b.rtop = 1 AND w.rbot <= 5
     AND w.doc_id <> b.doc_id
    """,
)
def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L37: (chosen, rejected) preference-pair construction — the DPO/
    # reward-model data-prep shape: per group (source here; prompt id in
    # production), pair the top-scoring document against each of the
    # bottom-5, carrying the score margin. Deterministic total order
    # ((score desc, id asc) / (score asc, id desc)) pins tie handling on
    # both engines; the quality signal is the exact token count (swap in
    # any scorer — perplexity L31, Gopher gates L13 — same shape). Scale:
    # two windows sharing ONE source-keyed shuffle, then a per-group
    # <=5-row self-join on the group key — output bounded at 5 pairs per
    # group, never quadratic in group size.
    d = Catalog(spark, sf_dir).documents
    from ..llm.text import tokens

    scored = d.select(
        "source", "doc_id", F.size(tokens("text")).cast("long").alias("score")
    )
    wtop = Window.partitionBy("source").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    wbot = Window.partitionBy("source").orderBy(
        F.col("score").asc(), F.col("doc_id").desc()
    )
    ranked = scored.select(
        "source",
        "doc_id",
        "score",
        F.row_number().over(wtop).alias("rtop"),
        F.row_number().over(wbot).alias("rbot"),
    )
    best = ranked.filter(F.col("rtop") == 1).select(
        "source",
        F.col("doc_id").alias("chosen_id"),
        F.col("score").alias("chosen_score"),
    )
    worst = ranked.filter(F.col("rbot") <= 5).select(
        "source",
        F.col("doc_id").alias("rejected_id"),
        F.col("score").alias("rejected_score"),
    )
    return (
        best.join(worst, "source")
        .filter(F.col("rejected_id") != F.col("chosen_id"))
        .select(
            "source",
            "chosen_id",
            "rejected_id",
            "chosen_score",
            "rejected_score",
            (F.col("chosen_score") - F.col("rejected_score")).alias("margin"),
        )
    )
