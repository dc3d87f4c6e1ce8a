"""Round-10 regression tests for the round-9 ADVICE findings:
q_autocorr at the real overflow bound (the scaled numerator must not
overflow BIGINT — it runs in DECIMAL(38,0) now), salted_group_topk's
salt distribution with an empty tiebreak (must not collapse to one
bucket on order-value ties), and the AvailableNow fixture's bounded
drain (no resident stream on failure)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _events_fixture(spark, tmp, rows):
    (
        spark.createDataFrame(
            rows,
            "event_id long, user_id long, event_type string, value double,"
            " props string, ts_s string",
        )
        .selectExpr(
            "event_id", "user_id", "event_type", "value", "props",
            "CAST(ts_s AS TIMESTAMP) AS ts",
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/events.parquet")
    )
    return str(tmp)


def test_autocorr_survives_max_magnitude_values(spark, tmp_path):
    # ADVICE r9 (medium): with values near the documented bound the
    # scaled numerator num*1e6 reaches ~7e23 — ~5000x past BIGINT.
    # Alternating 0 / 800000.00 dollars gives d_i = ±3.2e8 cents,
    # num = -7*(3.2e8)^2 ≈ -7.2e17 (BIGINT-safe), num*1e6 ≈ 7.2e23
    # (NOT BIGINT-safe): the pre-fix long arithmetic errors under ANSI
    # or wraps; the DECIMAL(38,0) path must return floor(-7/8 * 1e6).
    from pretalx_hub_etl_spark.queries.modern_q import q_autocorr

    rows = [
        (i, 7, "click", [0.0, 800_000.0][i % 2], "{}",
         f"2024-01-01 02:0{i}:00")
        for i in range(8)
    ]
    got = {
        r.user_id: r
        for r in q_autocorr(
            spark, _events_fixture(spark, tmp_path, rows)
        ).collect()
    }
    r = got[7]
    # exact integer identities: num = -(n-1)*c^2, den = n*c^2, c=3.2e8
    c2 = (32_000_000_0) ** 2
    assert r.acf_den == 8 * c2
    assert r.acf_num == -7 * c2
    assert r.acf_micro == -875_000


def test_salted_topk_salt_spreads_order_value_ties(spark):
    # ADVICE r9 (low): with tiebreak=() the salt used to hash
    # order_col alone, so heavy ties on the order value all landed in
    # ONE bucket (skew mitigation silently off). The fix salts on the
    # whole row; pin both the distribution and the exactness contract.
    from pyspark.sql import Row

    from pretalx_hub_etl_spark.operators.agg import salted_group_topk

    n = 2000
    df = spark.createDataFrame(
        [Row(g="hot", rid=i, score=1.0) for i in range(n)]
    )
    # distribution: the operator's salt expression (whole-row hash when
    # tiebreak is empty) must occupy many buckets despite total ties
    buckets = (
        df.select(
            F.pmod(
                F.xxhash64(F.col("g"), F.col("rid"), F.col("score")),
                F.lit(16),
            ).alias("b")
        )
        .distinct()
        .count()
    )
    assert buckets >= 12  # pre-fix (hash of score alone) this is 1
    # exactness contract unchanged: k rows back, all from the group,
    # ranks 1..k (row set is nondeterministic under total ties, as the
    # docstring says — same as the plain window)
    out = salted_group_topk(
        df, keys=["g"], order_col="score", k=5, tiebreak=()
    ).collect()
    assert sorted(r.rank for r in out) == [1, 2, 3, 4, 5]
    assert all(r.g == "hot" and r.score == 1.0 for r in out)


def test_merge_schema_evolution_semantics(spark, tmp_path):
    from pretalx_hub_etl_spark.sinks.merge import MergeSink

    sink = MergeSink(str(tmp_path / "t"), key="k")
    sink.init(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, name string"
        )
    )
    # off by default: an unexpected schema change errors
    import pytest as _pytest

    with _pytest.raises(ValueError, match="allow_evolution"):
        sink.merge(
            spark, spark.createDataFrame([(1, 9)], "k long, extra long")
        )
    out = {
        r.k: (r.name, r.extra)
        for r in sink.merge(
            spark,
            spark.createDataFrame(
                [(2, 7), (4, 8)], "k long, extra long"
            ),
            allow_evolution=True,
        ).collect()
    }
    # matched row: omitted column KEEPS target value, new column set;
    # untouched rows: new column NULL; insert: omitted column NULL
    assert out == {
        1: ("a", None),
        2: ("b", 7),
        3: ("c", None),
        4: (None, 8),
    }
    # history not rewritten: v1 still reads with its own narrow schema
    v1 = sink.read_version(spark, 1)
    assert v1.columns == ["k", "name"]
    assert v1.count() == 3


def test_salted_topk_empty_tiebreak_matches_plain_window_values(spark):
    # with distinct order values and no tiebreak the salted plan must
    # return exactly the plain-window top-k values
    from pyspark.sql import Row

    from pretalx_hub_etl_spark.operators.agg import salted_group_topk

    df = spark.createDataFrame(
        [Row(g=str(i % 3), rid=i, score=float((i * 37) % 101))
         for i in range(300)]
    )
    got = {
        (r.g, r.score)
        for r in salted_group_topk(
            df, keys=["g"], order_col="score", k=4, tiebreak=()
        ).collect()
    }
    import itertools

    rows = df.collect()
    want = set()
    for g, grp in itertools.groupby(
        sorted(rows, key=lambda r: r.g), key=lambda r: r.g
    ):
        top = sorted(grp, key=lambda r: -r.score)[:4]
        want |= {(g, r.score) for r in top}
    assert got == want


def test_pyds_register_and_read_work_on_child_session(spark):
    # r17 pin: q_stream_pyds / q_stream_pyds_parallel moved onto
    # fixture_session so their stateful complete-mode aggs run with the
    # fixture state-store count instead of the session default. That is
    # only sound if Python DataSource registration works on a
    # newSession child — an older round recorded the child's format()
    # lookup failing NOT_FOUND; this pins the behavior the queries now
    # rely on (register on the child, batch-read through the child).
    from pretalx_hub_etl_spark.sources.pyds import register
    from pretalx_hub_etl_spark.streaming.structured import fixture_session

    # r18 pin (the plan-sweep py4j failure): register on the MAIN
    # session FIRST. Spark 4.1's pre-register probe is global (a name
    # held by any session vetoes `dataSource.register`) while resolution
    # is session-local (newSession children inherit NOTHING), so the old
    # swallow-ALREADY_EXISTS register() left a child that could never
    # resolve the source once any sibling had registered it. The
    # sources/registry.py path registers directly into the child's own
    # DataSourceManager instead.
    register(spark)
    s2 = fixture_session(spark)
    register(s2)
    mgr = s2._jsparkSession.sessionState().dataSourceManager()
    assert mgr.dataSourceExists("paged_parquet"), (
        "register(child) did not land in the child's DataSourceManager"
    )
    path = "/root/testdata/sf0.001/orders.parquet"
    got = (
        s2.read.format("paged_parquet")
        .option("path", path)
        .option("key", "o_orderkey")
        .option("page_size", "1000")
        .option("columns", "o_orderkey")
        .load()
        .count()
    )
    assert got == 1500
