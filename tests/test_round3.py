"""Round-3 operators: adapted partsupp TPC-H shapes, distribution/frame
windows, skew-operator queries, quality gate, exact embedding math.

Split between value checks (against independent recomputation — numpy for
vector math, brute-force Python for windows) and plan-shape checks (the
100 TB guarantees: single fact scan, broadcast anti/semi joins, no
global sort)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pretalx_hub_etl_spark.queries import load_all
from tests.conftest import SF_SMOKE
from tests.test_plans import plan_of


@pytest.fixture(scope="module")
def registry():
    return load_all()


def run(registry, spark, name, sf=SF_SMOKE):
    return registry[name].fn(spark, sf)


# --- adapted TPC-H plan shapes ----------------------------------------------


def _fact_scan_count(plan: str, table: str = "lineitem") -> int:
    # "formatted" plans name tables in the per-node Location: detail lines
    return sum(
        1
        for ln in plan.splitlines()
        if "Location" in ln and f"{table}.parquet" in ln
    )


def test_q2_correlated_min_is_single_pass(spark, registry):
    # the correlated min must NOT duplicate the partsupp derivation:
    # exactly one lineitem scan in the whole plan
    plan = plan_of(spark, "q_tpch_q2")
    assert _fact_scan_count(plan) == 1, plan
    assert "Window" in plan


def test_q11_threshold_is_single_fact_scan(spark, registry):
    plan = plan_of(spark, "q_tpch_q11")
    assert _fact_scan_count(plan) == 1, plan


def test_q16_exclusion_is_broadcast_anti_join(spark, registry):
    plan = plan_of(spark, "q_tpch_q16")
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_q20_in_subqueries_are_semi_joins(spark, registry):
    plan = plan_of(spark, "q_tpch_q20")
    assert plan.count("LeftSemi") >= 2


def test_q2_min_cost_matches_brute_force(spark, registry):
    rows = run(registry, spark, "q_tpch_q2").collect()
    # every returned (part, supplier) really is that part's min supplycost
    by_part: dict[int, list] = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, []).append(r.supplycost)
    for costs in by_part.values():
        assert all(abs(c - costs[0]) < 1e-9 for c in costs)


# --- window distribution / frames -------------------------------------------


def test_ntile_tiles_are_balanced(spark, registry):
    rows = run(registry, spark, "q_window_ntile").collect()
    by_nation: dict[int, list[int]] = {}
    for r in rows:
        by_nation.setdefault(r.c_nationkey, []).append(r.tile)
    for tiles in by_nation.values():
        counts = [tiles.count(t) for t in (1, 2, 3, 4)]
        assert sum(counts) == len(tiles)
        assert max(counts) - min(counts) <= 1  # ntile's balance guarantee


def test_firstlast_frame_is_whole_partition(spark, registry):
    rows = run(registry, spark, "q_window_firstlast").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for rs in by_user.values():
        firsts = {r.first_v for r in rs}
        lasts = {r.last_v for r in rs}
        assert len(firsts) == 1 and len(lasts) == 1  # constant per partition


def test_time_range_frame_matches_brute_force(spark, registry):
    out = {
        r.event_id: r.trail_hour_value
        for r in run(registry, spark, "q_window_time_range").collect()
    }
    base = run(registry, spark, "q_window_time_range")  # reuse projection
    rows = base.select("event_id", "user_id", "ts_s").collect()
    # recompute the trailing sum for a sample of events via brute force
    from pretalx_hub_etl_spark.catalog import Catalog
    from pyspark.sql import functions as F

    ev = (
        Catalog(spark, SF_SMOKE)
        .events.select(
            "event_id",
            "user_id",
            F.unix_timestamp("ts").cast("long").alias("ts_s"),
            F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("v_c"),
        )
        .collect()
    )
    by_user: dict[int, list] = {}
    for e in ev:
        by_user.setdefault(e.user_id, []).append(e)
    for probe in rows[:50]:
        peers = by_user[probe.user_id]
        want = (
            sum(
                p.v_c
                for p in peers
                if probe.ts_s - 3600 <= p.ts_s <= probe.ts_s
            )
            / 100.0
        )
        assert abs(out[probe.event_id] - want) < 1e-9


# --- embedding math vs numpy ------------------------------------------------


def test_embed_norm_matches_numpy(spark, registry):
    from pretalx_hub_etl_spark.catalog import Catalog

    got = {r.vec_id: r.l2_norm for r in run(registry, spark, "q_embed_norm").collect()}
    raw = Catalog(spark, SF_SMOKE).embeddings.collect()
    for r in raw[:100]:
        q = np.floor(np.asarray(r.embedding, dtype=np.float64) * 1e6 + 0.5)
        want = math.sqrt(float((q * q).sum())) / 1e6
        assert abs(got[r.vec_id] - want) < 1e-12
        # quantized norm is within quantization error of the true norm
        true = float(np.linalg.norm(np.asarray(r.embedding, dtype=np.float64)))
        assert abs(got[r.vec_id] - true) < 1e-4


def test_embed_centroid_matches_numpy(spark, registry):
    from pretalx_hub_etl_spark.catalog import Catalog

    got = {
        (r.label, r.pos): (r.n, r.centroid)
        for r in run(registry, spark, "q_embed_centroid").collect()
    }
    raw = Catalog(spark, SF_SMOKE).embeddings.collect()
    sums: dict[tuple, list] = {}
    for r in raw:
        for pos in range(8):
            q = math.floor(float(r.embedding[pos]) * 1e6 + 0.5)
            acc = sums.setdefault((r.label, pos), [0, 0])
            acc[0] += q
            acc[1] += 1
    for key, (qsum, n) in sums.items():
        gn, gc = got[key]
        assert gn == n
        assert abs(gc - qsum / (1e6 * n)) < 1e-12


# --- quality gate -----------------------------------------------------------


def test_gopher_gate_recomputes(spark, registry):
    from pretalx_hub_etl_spark.catalog import Catalog

    got = {r.doc_id: r for r in run(registry, spark, "q_quality_gopher").collect()}
    docs = Catalog(spark, SF_SMOKE).documents.collect()
    stop = ("the", "a", "of", "to", "and", "in")
    for d in docs[:100]:
        words = d.text.split(" ")
        r = got[d.doc_id]
        assert r.n_words == len(words)
        hits = sum(1 for w in stop if f" {w} " in f" {d.text} ")
        assert r.stop_hits == hits
        mean_c = math.floor(
            sum(len(w) for w in words) * 100.0 / len(words)
        )
        assert r.mean_wlen_c == mean_c
        want_keep = (
            20 <= len(words) <= 100000
            and 100 <= mean_c <= 1000
            and hits >= 2
            and r.n_symbols * 10 < sum(len(w) for w in words)
        )
        assert r.keep == want_keep


# --- stream dedup -----------------------------------------------------------


def test_stream_dedup_keeps_earliest(spark, registry):
    rows = run(registry, spark, "q_stream_dedup").collect()
    seen = set()
    for r in rows:
        key = (r.user_id, r.event_type)
        assert key not in seen  # one row per key
        seen.add(key)
    # spot-check: kept ts is the min for that key
    from pretalx_hub_etl_spark.catalog import Catalog
    from pyspark.sql import functions as F

    mins = {
        (r.user_id, r.event_type): r.m
        for r in Catalog(spark, SF_SMOKE)
        .events.groupBy("user_id", "event_type")
        .agg(F.min(F.unix_timestamp("ts").cast("long")).alias("m"))
        .collect()
    }
    for r in rows:
        assert r.first_ts_s == mins[(r.user_id, r.event_type)]


# --- salted operators' queries match plain shapes ---------------------------


def test_salted_join_query_has_no_broadcast_free_skew(spark, registry):
    # the salted join must still be an equi-join on (key, salt) — i.e. a
    # join, not a cartesian — and the small side carries the explode
    plan = plan_of(spark, "q_join_salted")
    assert "CartesianProduct" not in plan
    assert "Generate explode" in plan or "Explode" in plan or "explode" in plan


# --- SCD2 / sessionization / stats ------------------------------------------


def test_scd2_intervals_are_half_open_chain(spark, registry):
    rows = run(registry, spark, "q_scd2_intervals").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for rs in by_user.values():
        rs.sort(key=lambda r: (r.valid_from_s, r.event_id))
        currents = [r for r in rs if r.is_current]
        assert len(currents) == 1  # exactly one open version per user
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to_s == b.valid_from_s  # gapless chain


def test_sessionize_gap_rule(spark, registry):
    rows = run(registry, spark, "q_sessionize_batch").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for rs in by_user.values():
        rs.sort(key=lambda r: (r.ts_s, r.event_id))
        assert rs[0].session_idx == 1
        for a, b in zip(rs, rs[1:]):
            if b.ts_s - a.ts_s > 1800:
                assert b.session_idx == a.session_idx + 1
            else:
                assert b.session_idx == a.session_idx


def test_agg_stats_matches_numpy(spark, registry):
    from pretalx_hub_etl_spark.catalog import Catalog

    got = {r.l_returnflag: r for r in run(registry, spark, "q_agg_stats").collect()}
    li = Catalog(spark, SF_SMOKE).lineitem.select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).collect()
    groups: dict[str, list] = {}
    for r in li:
        groups.setdefault(r.l_returnflag, []).append(
            (int(r.l_quantity), math.floor(r.l_extendedprice + 0.5))
        )
    for flag, xy in groups.items():
        x = np.array([a for a, _ in xy], dtype=np.float64)
        y = np.array([b for _, b in xy], dtype=np.float64)
        g = got[flag]
        assert g.n == len(xy)
        assert abs(g.mean_qty - x.mean()) < 1e-9
        assert abs(g.stddev_qty - x.std()) < 1e-6
        assert abs(g.corr_qty_price - np.corrcoef(x, y)[0, 1]) < 1e-6


# --- vectorized LSH bucketizer ≡ expression form ----------------------------


def test_bucket_udf_matches_expression_form(spark):
    from pyspark.sql import functions as F

    from pretalx_hub_etl_spark.catalog import Catalog
    from pretalx_hub_etl_spark.llm.similarity import (
        _bucket_all_tables,
        _hyperplane_sign_bits,
    )

    e = Catalog(spark, SF_SMOKE).embeddings
    expr = e.select(
        "vec_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda t: F.struct(
                    t.cast("int").alias("table_id"),
                    _hyperplane_sign_bits(F.col("embedding"), 6, 42, t).alias(
                        "bucket"
                    ),
                ),
            )
        ).alias("tb"),
    ).select("vec_id", "tb.table_id", "tb.bucket")
    udf = e.select(
        "vec_id",
        F.posexplode(
            _bucket_all_tables(spark, F.col("embedding"), 64, 6, 4, 42)
        ).alias("table_id", "bucket"),
    )
    a = {(r.vec_id, r.table_id): r.bucket for r in expr.collect()}
    b = {(r.vec_id, r.table_id): r.bucket for r in udf.collect()}
    assert a == b  # same planes, same sign rule -> identical bucket ids


# --- z-order layout ---------------------------------------------------------


def test_zorder_key_roundtrips_bits(spark):
    from pretalx_hub_etl_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 255, 65535) for y in (0, 2, 9, 1023)],
        "x long, y long",
    )
    rows = df.select("x", "y", zorder_key(["x", "y"], 16).alias("z")).collect()
    for r in rows:
        x = y = 0
        for i in range(16):
            x |= ((r.z >> (2 * i)) & 1) << i
            y |= ((r.z >> (2 * i + 1)) & 1) << i
        assert (x, y) == (r.x, r.y)  # de-interleave recovers both dims


def test_cluster_by_zorder_preserves_rows(spark):
    from pretalx_hub_etl_spark.catalog import Catalog
    from pretalx_hub_etl_spark.operators.layout import cluster_by_zorder

    li = Catalog(spark, SF_SMOKE).lineitem.select("l_orderkey", "l_partkey")
    out = cluster_by_zorder(li, ["l_orderkey", "l_partkey"], bits=16)
    assert out.count() == li.count()
    assert out.columns == li.columns  # __z never leaks
