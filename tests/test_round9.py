"""Edge tests for the round-9 surface batch: XML escaping roundtrip
(S17), session-variable rebinding (SQL7), polymorphic UDTF schemas
(UD6), autocorrelation degenerate series (AN26), weighted-vs-unweighted
median divergence (A16), and kNN-graph shape invariants (L44)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_xml_roundtrip_escapes_markup_characters(spark, tmp_path):
    # the S17 claim is losslessness; markup metacharacters and unicode
    # are where a text-format roundtrip actually breaks
    rows = [
        (1, "a < b & c > d"),
        (2, 'quotes "double" and \'single\''),
        (3, "unicode: café — 你好"),
        (4, "]]> cdata-closer and <tag>inner</tag>"),
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    xdir = str(tmp_path / "x")
    df.coalesce(1).write.format("xml").option("rowTag", "r").save(xdir)
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("s", T.StringType())]
    )
    back = (
        spark.read.format("xml").option("rowTag", "r").schema(schema)
        .load(xdir)
    )
    assert {(r.id, r.s) for r in back.collect()} == set(rows)


def test_session_variable_rebinding_last_set_wins(spark):
    spark.sql("DECLARE OR REPLACE VARIABLE phe_t9 BIGINT DEFAULT 1")
    assert spark.sql("SELECT phe_t9 AS v").collect()[0].v == 1
    spark.sql("SET VARIABLE phe_t9 = 41")
    spark.sql("SET VARIABLE phe_t9 = phe_t9 + 1")  # RHS sees current value
    assert spark.sql("SELECT phe_t9 AS v").collect()[0].v == 42
    # EXECUTE IMMEDIATE resolves the variable at execution time
    got = spark.sql(
        "EXECUTE IMMEDIATE 'SELECT phe_t9 * 2 AS v'"
    ).collect()[0].v
    assert got == 84


def test_polymorphic_udtf_schema_tracks_argument(spark):
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeResult

    class _SplitFixed:
        @staticmethod
        def analyze(text, n):
            k = int(n.value)
            return AnalyzeResult(
                StructType(
                    [StructField(f"p{i}", StringType()) for i in range(k)]
                )
            )

        def eval(self, text, n):
            parts = (text or "").split(" ")
            yield tuple(
                parts[i] if i < len(parts) else "" for i in range(int(n))
            )

    spark.udtf.register("phe_split_t9", udtf(_SplitFixed))
    two = spark.sql("SELECT * FROM phe_split_t9('a b c', 2)")
    five = spark.sql("SELECT * FROM phe_split_t9('a b c', 5)")
    assert two.columns == ["p0", "p1"]
    assert five.columns == ["p0", "p1", "p2", "p3", "p4"]
    assert five.collect()[0].asDict() == {
        "p0": "a", "p1": "b", "p2": "c", "p3": "", "p4": ""
    }
    # empty input: one row of out-of-range '' cells, matching split_part
    empty = spark.sql("SELECT * FROM phe_split_t9('', 2)").collect()[0]
    assert (empty.p0, empty.p1) == ("", "")


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


def test_autocorr_constant_series_excluded_alternating_is_minus_one(
    spark, tmp_path
):
    from pretalx_hub_etl_spark.queries.modern_q import q_autocorr

    rows = [
        # user 1: constant -> den = 0, must be absent
        (i, 1, "click", 5.0, "{}", f"2024-01-01 00:0{i}:00")
        for i in range(6)
    ]
    rows += [
        # user 2: perfect alternation 1,3,1,3,... -> r1 = -1 exactly
        (10 + i, 2, "click", [1.0, 3.0][i % 2], "{}",
         f"2024-01-01 01:0{i}:00")
        for i in range(8)
    ]
    got = {
        r.user_id: r
        for r in q_autocorr(
            spark, _events_fixture(spark, tmp_path, rows)
        ).collect()
    }
    assert 1 not in got  # zero variance: no defined autocorrelation
    # finite-sample alternation: num = -(n-1)c^2, den = n*c^2, so
    # r1 = -(n-1)/n = -7/8 EXACTLY at n=8 — and floor(-0.875e6)
    assert got[2].acf_num * 8 == -7 * got[2].acf_den
    assert got[2].acf_micro == -875_000


def test_weighted_median_diverges_from_unweighted(spark, tmp_path):
    import duckdb

    from pretalx_hub_etl_spark.queries.modern_q import q_agg_weighted_median

    # values 1..5 at price v dollars, but weight (quantity) piles onto
    # the top value: unweighted median = 3, weighted = 5
    rows = [(i, float(i), 1.0 if i < 5 else 100.0) for i in range(1, 6)]
    (
        spark.createDataFrame(
            rows, "l_orderkey long, l_extendedprice double, l_quantity double"
        )
        .withColumn("l_returnflag", F.lit("A"))
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/lineitem.parquet")
    )
    out = q_agg_weighted_median(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].wmedian_cents == 500  # the heavy top value wins
    assert out[0].total_weight == 104
    # the committed oracle agrees on the same fixture
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW lineitem AS FROM "
        f"'{tmp_path}/lineitem.parquet/*.parquet'"
    )
    from pretalx_hub_etl_spark.queries import load_all

    oracle = load_all()["q_agg_weighted_median"].oracle
    assert con.sql(oracle).fetchall() == [("A", 104, 500)]


def test_knn_graph_shape_and_identical_vector_affinity(spark):
    from pretalx_hub_etl_spark.llm.similarity import knn_graph

    # three identical vectors + one orthogonal-ish: identical ones must
    # rank each other first at cos 1.0; every src has <= k neighbors
    vecs = [
        (1, [1.0] * 8), (2, [1.0] * 8), (3, [1.0] * 8),
        (4, [1.0, -1.0] * 4),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = knn_graph(df, k=2, n_bits=2, n_tables=4, portable=True).collect()
    per_src = {}
    for r in out:
        per_src.setdefault(r.src, []).append(r)
    assert all(len(v) <= 2 for v in per_src.values())
    for src in (1, 2, 3):
        top = min(per_src[src], key=lambda r: r.rank)
        assert top.dst in {1, 2, 3} - {src}
        assert top.cos_sim == 1.0
    assert all(
        r.rank == i + 1
        for rs in per_src.values()
        for i, r in enumerate(sorted(rs, key=lambda r: r.rank))
    )


def test_time_travel_respects_vacuum_retention(spark, tmp_path):
    # S20 x S11: read_version reaches any committed snapshot until
    # vacuum removes it; travel past the retention boundary must raise,
    # never silently read a half-deleted directory
    import pytest as _pytest

    from pretalx_hub_etl_spark.sinks.merge import MergeSink

    base = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long"
    )
    sink = MergeSink(str(tmp_path / "t"), key="k")
    sink.init(base)  # v1
    sink.merge(spark, spark.createDataFrame([(2, 99)], "k long, v long"))
    assert {(r.k, r.v) for r in sink.read_version(spark, 1).collect()} == {
        (1, 10), (2, 20), (3, 30)
    }
    assert {(r.k, r.v) for r in sink.read_version(spark, 2).collect()} == {
        (1, 10), (2, 99), (3, 30)
    }
    with _pytest.raises(FileNotFoundError):
        sink.read_version(spark, 7)  # never committed
    sink.vacuum(keep_last=1)
    with _pytest.raises(FileNotFoundError):
        sink.read_version(spark, 1)  # vacuumed away
    assert sink.read_version(spark, 2).count() == 3  # current survives
