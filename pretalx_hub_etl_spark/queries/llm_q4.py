"""Round-8 second query batch: the post-training data-prep family
(rejection sampling L40, the composed RLHF pipeline L41), the mergeable
histogram-quantile rollup (A15), and the remaining first-class API
surfaces (df.observe DQ metrics DQ2, raw-Arrow mapInArrow UD4).

Reference parity note: the reference (3cola/pretalx-hub-etl `main.py`)
has no counterpart for any of these — they are mandated by the
LLM-pipeline north star (`BASELINE.json`), cited to fixture tables.

Oracle notes follow the registry conventions (queries/__init__.py):
identical aliases on both sides, BIGINT pins on computed integers, md5
as the engine-portable hash primitive, no ``round()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..operators.partitioning import local_rows
from . import query

# --- L40: rejection sampling (verifier-gated best-of-n) ---------------------

_REJECTION_ORACLE = """
WITH cand AS (
    SELECT CAST(doc_id % 50 AS BIGINT) AS prompt_id,
           doc_id,
           CAST(CAST(('0x' || substr(md5('rw:' || CAST(doc_id AS VARCHAR)),
                                     1, 8)) AS BIGINT) % 1000
                AS BIGINT) AS reward
    FROM documents
), ranked AS (
    SELECT prompt_id, doc_id, reward,
           row_number() OVER (
               PARTITION BY prompt_id
               ORDER BY reward DESC, doc_id ASC) AS rn,
           CAST(count(*) OVER (PARTITION BY prompt_id) AS BIGINT)
               AS n_candidates,
           CAST(sum(CASE WHEN reward >= 700 THEN 1 ELSE 0 END) OVER (
               PARTITION BY prompt_id) AS BIGINT) AS n_pass
    FROM cand
)
SELECT prompt_id,
       doc_id AS chosen_id,
       reward AS chosen_reward,
       n_candidates,
       n_pass
FROM ranked
WHERE rn = 1 AND reward >= 700
"""


@query("q_rejection_sampling", oracle=_REJECTION_ORACLE)
def q_rejection_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L40: rejection sampling — the RFT/STaR data-prep shape: per
    # prompt group, score every candidate with a verifier/reward,
    # keep the single best candidate, and REJECT whole groups whose
    # best score fails the acceptance threshold (the "no sample
    # survived the verifier" case). Here prompt_id is a hash bucket of
    # doc_id (50 groups) and the reward is the engine-portable md5
    # coin (llm/sampling.py md5_u32) — swap in any real scorer
    # (perplexity L31, quality gates L13), same shape. Scale: ONE
    # prompt-keyed shuffle shared by all three window functions
    # (row_number / count / conditional sum over the same partition
    # key), then a scan-fused filter — output bounded at one row per
    # accepted group, never candidate-sized.
    from ..llm.sampling import md5_u32

    d = Catalog(spark, sf_dir).documents
    cand = d.select(
        F.pmod(F.col("doc_id"), F.lit(50)).cast("long").alias("prompt_id"),
        "doc_id",
        (
            md5_u32(F.concat(F.lit("rw:"), F.col("doc_id").cast("string")))
            % 1000
        )
        .cast("long")
        .alias("reward"),
    )
    w = Window.partitionBy("prompt_id")
    worder = w.orderBy(F.col("reward").desc(), F.col("doc_id").asc())
    ranked = cand.select(
        "prompt_id",
        "doc_id",
        "reward",
        F.row_number().over(worder).alias("rn"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_candidates"),
        F.sum(F.when(F.col("reward") >= 700, 1).otherwise(0))
        .over(w)
        .cast("long")
        .alias("n_pass"),
    )
    return ranked.filter(
        (F.col("rn") == 1) & (F.col("reward") >= 700)
    ).select(
        "prompt_id",
        F.col("doc_id").alias("chosen_id"),
        F.col("reward").alias("chosen_reward"),
        "n_candidates",
        "n_pass",
    )


# --- A15: mergeable equi-width-histogram quantile rollup --------------------

_HIST_QUANTILE_ORACLE = """
WITH cents AS (
    SELECT l_returnflag,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
    FROM lineitem
), partial AS (
    SELECT l_returnflag,
           (c - (((c % 100000) + 100000) % 100000)) // 100000 AS bin,
           count(*) AS n
    FROM cents GROUP BY l_returnflag, bin
), merged AS (
    SELECT bin, sum(n) AS n FROM partial GROUP BY bin
), cum AS (
    SELECT bin,
           CAST(sum(n) OVER (ORDER BY bin
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum,
           CAST(sum(n) OVER () AS BIGINT) AS total
    FROM merged
)
SELECT q.q_pct,
       CAST(min(cum.bin) * 100000 AS BIGINT) AS est_cents
FROM cum JOIN (VALUES (CAST(25 AS BIGINT)), (50), (75), (95)) q(q_pct)
  ON cum.cum * 100 >= q.q_pct * cum.total
GROUP BY q.q_pct
"""


@query("q_quantile_histogram_rollup", oracle=_HIST_QUANTILE_ORACLE)
def q_quantile_histogram_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A15: quantiles from a MERGEABLE equi-width histogram
    # (operators/agg.py histogram_quantile_rollup): the corpus scan
    # produces partial per-returnflag histograms (map-side-combined),
    # the partials merge by summing bin counts — the step that lets
    # stored per-day summaries roll up without re-scanning 100 TB —
    # and p25/50/75/95 finalize from a bins-sized cumulative window
    # ($1000-wide bins over exact cents; estimate = bin lower edge,
    # error bounded by bin width). Exact twins for comparison:
    # q_agg_global_quantiles (full-precision two-phase exact) and
    # q_histogram_equidepth (rank-based equi-depth).
    from ..functions.core import fixed_cents
    from ..operators.agg import histogram_quantile_rollup

    li = Catalog(spark, sf_dir).lineitem
    cents = li.select(
        "l_returnflag", fixed_cents(F.col("l_extendedprice")).alias("c")
    )
    return histogram_quantile_rollup(
        cents,
        "c",
        width_cents=100_000,
        q_pcts=[25, 50, 75, 95],
        partial_col="l_returnflag",
    )


# --- DQ2: in-flight Observation metrics (observe-on-the-sink-pass) ----------

_OBSERVE_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_price_cents,
       CAST(max(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS max_qty_cents,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_returned
FROM lineitem
"""


@query("q_dq_observe", oracle=_OBSERVE_ORACLE)
def q_dq_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DQ2: pipeline observability via the Observation API — the DQ
    # metrics (row count, exact-cents sum, max, predicate count) are
    # computed ON THE SAME PASS that writes the sink, as accumulator-
    # style aggregates piggybacked on the task stream. At 100 TB this
    # is the difference between free monitoring and a second full
    # scan (the DQ1 expectation suite re-aggregates; this observes).
    # The observed frame is written to a real parquet sink (the
    # action that populates the metrics); the returned 1-row frame is
    # the metrics record itself, oracle-checked against a direct SQL
    # aggregate of the same table.
    import os
    import tempfile

    from pyspark.sql import Observation

    from ..functions.core import fixed_cents

    li = Catalog(spark, sf_dir).lineitem.select(
        "l_orderkey",
        "l_returnflag",
        fixed_cents(F.col("l_extendedprice")).alias("price_cents"),
        fixed_cents(F.col("l_quantity")).alias("qty_cents"),
    )
    obs = Observation("dq_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("price_cents").alias("sum_price_cents"),
        F.max("qty_cents").alias("max_qty_cents"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("n_returned"),
    )
    out = os.path.join(tempfile.mkdtemp(prefix="phe_observe_"), "sink")
    observed.write.parquet(out)  # the action that populates obs
    m = obs.get
    return local_rows(
        spark,
        [
            (
                int(m["n_rows"]),
                int(m["sum_price_cents"]),
                int(m["max_qty_cents"]),
                int(m["n_returned"]),
            )
        ],
        "n_rows long, sum_price_cents long, max_qty_cents long, "
        "n_returned long",
    )


# --- UD4: mapInArrow (zero-pandas Arrow-native batch transform) -------------

_MAPARROW_ORACLE = """
SELECT vec_id,
       CAST(list_sum(list_transform(embedding, x ->
                CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
                * CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)))
            AS BIGINT) AS qnorm2,
       CAST(len(embedding) AS INT) AS dim
FROM embeddings
"""


@query("q_fn_maparrow", oracle=_MAPARROW_ORACLE)
def q_fn_maparrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UD4: the mapInArrow surface — RecordBatch-in/RecordBatch-out with
    # NO pandas materialization: the list<float> column is consumed
    # through the raw Arrow buffers (values + offsets), vectorized as
    # one flat numpy segment-sum, and emitted as a new RecordBatch.
    # Relative to the pandas UDF path this skips the Arrow->pandas
    # Series conversion entirely (for nested types that conversion
    # builds a Python object per LIST CELL — the dominant cost);
    # same quantize-to-int64 exactness contract as the similarity
    # family (llm/similarity.py), so the squared norm value-hashes.
    import numpy as np
    import pyarrow as pa

    def qnorm(batches):
        for b in batches:
            lst = b.column(1)
            values = lst.values.to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            q = np.floor(values * 1e6 + 0.5).astype(np.int64)
            csum = np.concatenate(([0], np.cumsum(q * q)))
            off = lst.offsets.to_numpy().astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(0),
                    pa.array(csum[off[1:]] - csum[off[:-1]], pa.int64()),
                    pa.array(
                        (off[1:] - off[:-1]).astype(np.int32), pa.int32()
                    ),
                ],
                ["vec_id", "qnorm2", "dim"],
            )

    emb = Catalog(spark, sf_dir).embeddings.select("vec_id", "embedding")
    return emb.mapInArrow(qnorm, "vec_id long, qnorm2 long, dim int")


# --- L41: composed post-training (RLHF) data-prep pipeline ------------------

_POSTTRAIN_ORACLE = """
WITH norm AS (
    SELECT doc_id,
           trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g')) AS norm_text
    FROM documents
), dedup AS (
    SELECT doc_id, norm_text FROM (
        SELECT *, row_number() OVER (
            PARTITION BY md5(norm_text) ORDER BY doc_id) AS rn
        FROM norm
    ) WHERE rn = 1
), cand AS (
    SELECT CAST(doc_id % 50 AS BIGINT) AS prompt_id, doc_id,
           CAST(CAST(('0x' || substr(md5('rw:' || CAST(doc_id AS VARCHAR)),
                                     1, 8)) AS BIGINT) % 1000
                AS BIGINT) AS reward,
           CASE WHEN norm_text = '' THEN CAST(0 AS BIGINT)
                ELSE CAST(len(string_split(norm_text, ' ')) AS BIGINT)
           END AS n_tokens
    FROM dedup
), ranked AS (
    SELECT *,
           row_number() OVER (PARTITION BY prompt_id
                              ORDER BY reward DESC, doc_id ASC) AS rtop,
           row_number() OVER (PARTITION BY prompt_id
                              ORDER BY reward ASC, doc_id DESC) AS rbot
    FROM cand
), best AS (
    SELECT prompt_id, doc_id AS chosen_id, reward AS chosen_reward,
           n_tokens AS chosen_tokens
    FROM ranked WHERE rtop = 1 AND reward >= 500
), worst AS (
    SELECT prompt_id, doc_id AS rejected_id, reward AS rejected_reward
    FROM ranked WHERE rbot <= 2
)
SELECT b.prompt_id, b.chosen_id, w.rejected_id,
       CAST(b.chosen_reward - w.rejected_reward AS BIGINT) AS margin,
       b.chosen_tokens
FROM best b JOIN worst w ON b.prompt_id = w.prompt_id
WHERE w.rejected_id <> b.chosen_id
"""


@query("q_pipeline_posttrain", oracle=_POSTTRAIN_ORACLE)
def q_pipeline_posttrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L41: the post-training (RLHF/DPO) data-prep COMPOSITION, hash-
    # checked through every stage (the q_pipeline_pretrain argument
    # applied to the alignment side): normalize (L4b) -> exact dedup on
    # normalized content (L1) -> deterministic reward scoring (the L40
    # md5 coin; swap in a real RM under the same shape) -> rejection
    # gate (prompt groups whose best reward < 500 drop entirely) ->
    # (chosen, rejected, margin) preference pairs against each group's
    # bottom-2 (L37 shape). Scale: one scan-fused rewrite, one
    # hash-keyed dedup shuffle, ONE prompt-keyed shuffle shared by both
    # ranking windows, and a <=2-row-per-group self-join — output
    # bounded at 2 pairs per accepted prompt.
    from ..llm.sampling import md5_u32
    from ..llm.text import normalize_text, token_count

    d = Catalog(spark, sf_dir).documents
    norm = d.select(
        "doc_id", normalize_text(F.col("text")).alias("norm_text")
    )
    wdup = Window.partitionBy(F.md5(F.col("norm_text"))).orderBy(
        F.col("doc_id").asc()
    )
    dedup = (
        norm.withColumn("__rn", F.row_number().over(wdup))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    cand = dedup.select(
        F.pmod(F.col("doc_id"), F.lit(50)).cast("long").alias("prompt_id"),
        "doc_id",
        (
            md5_u32(F.concat(F.lit("rw:"), F.col("doc_id").cast("string")))
            % 1000
        )
        .cast("long")
        .alias("reward"),
        F.when(F.col("norm_text") == "", F.lit(0).cast("long"))
        .otherwise(token_count(F.col("norm_text")))
        .alias("n_tokens"),
    )
    wtop = Window.partitionBy("prompt_id").orderBy(
        F.col("reward").desc(), F.col("doc_id").asc()
    )
    wbot = Window.partitionBy("prompt_id").orderBy(
        F.col("reward").asc(), F.col("doc_id").desc()
    )
    ranked = cand.select(
        "*",
        F.row_number().over(wtop).alias("rtop"),
        F.row_number().over(wbot).alias("rbot"),
    )
    best = ranked.filter(
        (F.col("rtop") == 1) & (F.col("reward") >= 500)
    ).select(
        "prompt_id",
        F.col("doc_id").alias("chosen_id"),
        F.col("reward").alias("chosen_reward"),
        F.col("n_tokens").alias("chosen_tokens"),
    )
    worst = ranked.filter(F.col("rbot") <= 2).select(
        "prompt_id",
        F.col("doc_id").alias("rejected_id"),
        F.col("reward").alias("rejected_reward"),
    )
    return (
        best.join(worst, "prompt_id")
        .filter(F.col("rejected_id") != F.col("chosen_id"))
        .select(
            "prompt_id",
            "chosen_id",
            "rejected_id",
            (F.col("chosen_reward") - F.col("rejected_reward"))
            .cast("long")
            .alias("margin"),
            "chosen_tokens",
        )
    )


# --- L42: incremental NEAR-dup ingestion gate (MinHash index probe) ---------


def _minhash_incremental_oracle(
    shingle_k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.6,
) -> str:
    # the q_dedup_near_md5 replay (same seeded coefficients, same md5
    # shingle hashes) with the pair space split corpus x batch and a
    # final min-per-batch-doc + left join so novel docs survive
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
            f"c.m{b * rpb + j} = b.m{b * rpb + j}" for j in range(rpb)
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
        SELECT b.doc_id AS bid, c.doc_id AS cid
        FROM sig c JOIN sig b
          ON c.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
        WHERE {band_eq}
    ), hit AS (
        SELECT p.bid, min(p.cid) AS dup_of
        FROM pairs p
        JOIN sh sb ON sb.doc_id = p.bid
        JOIN sh sc ON sc.doc_id = p.cid
        WHERE CAST(len(list_intersect(sb.hs, sc.hs)) AS DOUBLE)
              / len(list_distinct(list_concat(sb.hs, sc.hs)))
              >= {threshold}
        GROUP BY p.bid
    )
    SELECT d.doc_id, h.dup_of, h.dup_of IS NULL AS is_new_content
    FROM documents d LEFT JOIN hit h ON h.bid = d.doc_id
    WHERE d.doc_id % 5 = 0
    """


@query("q_dedup_incremental_near", oracle=_minhash_incremental_oracle())
def q_dedup_incremental_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L42: the near-dup sibling of q_dedup_incremental — a batch of new
    # documents (doc_id % 5 == 0) probed against the corpus's MinHash
    # BAND INDEX (llm/dedup.py minhash_incremental): only the batch
    # recomputes signatures at ingest time, candidates come from a
    # batch-sized equi-join on (band_id, band_hash) against the stored
    # index — never a corpus self-join, never batch x corpus — and
    # exact-Jaccard verification touches candidate pairs only. Portable
    # md5 hashing puts the whole gate under the full value-hash oracle
    # (the q_dedup_near_md5 witness argument, applied to the
    # incremental modality).
    from ..llm.dedup import minhash_incremental

    d = Catalog(spark, sf_dir).documents
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    batch = d.filter(F.col("doc_id") % 5 == 0)
    return minhash_incremental(
        corpus,
        batch,
        "text",
        "doc_id",
        num_hashes=32,
        bands=8,
        shingle_k=3,
        jaccard_threshold=0.6,
        portable=True,
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("dup_of").cast("long").alias("dup_of"),
        "is_new_content",
    )
