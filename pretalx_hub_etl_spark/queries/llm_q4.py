"""Round-8 second query batch: RLHF/RFT-style rejection sampling and
mergeable-summary analytics.

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
