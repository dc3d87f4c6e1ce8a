"""Source and sink tests (SURVEY.md S1/S2/S4/S5)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from pretalx_hub_etl_spark.sinks import CollectingSink, ParquetSink, validate_split
from pretalx_hub_etl_spark.sources import (
    fixture_schedule,
    n_pages_for,
    normalize_schedule,
    read_paginated,
)
from pretalx_hub_etl_spark.sources.json_doc import schedule_df
from pretalx_hub_etl_spark.sources.paginated import parquet_page_reader
from tests.conftest import SF_SMOKE


def test_n_pages_for():
    assert n_pages_for(0, 100) == 0
    assert n_pages_for(1, 100) == 1
    assert n_pages_for(100, 100) == 1
    assert n_pages_for(101, 100) == 2


def test_paginated_read_equals_full_scan(spark):
    path = f"{SF_SMOKE}/orders.parquet"
    cols = ["o_orderkey", "o_custkey"]
    full = spark.read.parquet(path).select(*cols)
    hi = full.agg(F.max("o_orderkey")).collect()[0][0]
    fetch = parquet_page_reader(path, "o_orderkey", 256, cols)
    paged = read_paginated(
        spark, fetch, n_pages_for(int(hi) + 1, 256), "o_orderkey bigint, o_custkey bigint"
    )
    assert paged.count() == full.count()
    assert paged.exceptAll(full).count() == 0


def test_schedule_normalize(spark):
    doc = schedule_df(spark, fixture_schedule())
    speakers, talks = normalize_schedule(doc)
    assert speakers.count() == 8
    assert talks.count() == 5
    # tz offsets with and without colon both parse (FIXTURES.md §B4)
    from pretalx_hub_etl_spark.functions.core import parse_offset_ts

    parsed = talks.select(parse_offset_ts("start").alias("ts")).collect()
    assert all(r.ts is not None for r in parsed)
    assert parsed[1].ts == datetime.datetime(2026, 8, 1, 10, 0, 0)  # +0100 -> UTC


def test_parquet_sink_roundtrip(spark, tmp_path):
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    sink = ParquetSink(str(tmp_path / "out"))
    sink.write(df)
    back = sink.read_back(spark)
    assert back.count() == 10
    assert back.exceptAll(df).count() == 0


def test_collecting_sink(spark):
    sink = CollectingSink()
    sink.write(spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string"))
    assert sorted(r["id"] for r in sink.rows) == [1, 2]


def test_two_phase_sink_publish_gate(spark, tmp_path):
    from pretalx_hub_etl_spark.sinks.base import two_phase_sink

    df = spark.createDataFrame(
        [(1, False), (2, True), (3, False)], "id int, is_invalid boolean"
    ).coalesce(1)
    submit_log = str(tmp_path / "submit.log")
    publish_log = str(tmp_path / "publish.log")

    def factory(path):
        def make():
            f = open(path, "a")
            return (lambda row: f.write(f"{row['id']}\n")), f.close
        return make

    def read(path):
        try:
            with open(path) as f:
                return sorted(int(x) for x in f.read().split())
        except FileNotFoundError:
            return []

    # flag off: every row submitted, nothing published (S6 gate)
    two_phase_sink(df, factory(submit_log), factory(publish_log), auto_publish=False)
    assert read(submit_log) == [1, 2, 3]
    assert read(publish_log) == []

    # flag on: the invalid row is submitted but NOT published
    two_phase_sink(df, factory(submit_log), factory(publish_log), auto_publish=True)
    assert read(submit_log) == [1, 1, 2, 2, 3, 3]
    assert read(publish_log) == [1, 3]


def test_validate_split(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None)], "id int, v double"
    )
    valid, quarantined = validate_split(df, F.col("v") >= 0)
    assert {r.id for r in valid.collect()} == {1}
    # NULL predicate rows are quarantined, not dropped (dead-letter pattern)
    assert {r.id for r in quarantined.collect()} == {2, 3}


def test_parquet_key_upper_bound_matches_max():
    from pretalx_hub_etl_spark.sources.paginated import parquet_key_upper_bound

    import pyarrow.parquet as pq

    path = f"{SF_SMOKE}/orders.parquet"
    true_max = pq.read_table(path, columns=["o_orderkey"])["o_orderkey"]
    import pyarrow.compute as pc

    assert parquet_key_upper_bound(path, "o_orderkey") == pc.max(true_max).as_py() + 1


def _start_fixture_server(rows, require_token=None):
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if require_token is not None:
                auth = self.headers.get("Authorization", "")
                if auth != f"Bearer {require_token}":
                    self.send_response(401)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
            q = parse_qs(urlparse(self.path).query)
            page = int(q.get("page", ["0"])[0])
            page_size = int(q.get("page_size", ["100"])[0])
            lo = page * page_size
            payload = {
                "pagination": {
                    "total": len(rows),
                    "page": page,
                    "page_size": page_size,
                },
                "results": rows[lo : lo + page_size],
            }
            body = json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet test output
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}/items"


def test_http_paginated_fetch(spark):
    from pretalx_hub_etl_spark.sources.paginated import (
        http_page_fetcher,
        http_pagination_total,
    )

    rows = [{"id": i, "name": f"item-{i:03d}"} for i in range(257)]
    srv, url = _start_fixture_server(rows)
    try:
        total = http_pagination_total(url, page_size=100)
        assert total == 257
        fetch = http_page_fetcher(url, page_size=100, columns=["id", "name"])
        df = read_paginated(
            spark, fetch, n_pages_for(total, 100), "id bigint, name string"
        )
        got = df.orderBy("id").collect()
        assert len(got) == 257
        assert got[0].name == "item-000" and got[256].name == "item-256"
        # envelope parsing: a page past the end yields zero rows, not an error
        assert len(fetch(99)) == 0
    finally:
        srv.shutdown()


def test_http_paginated_fetch_with_bearer_auth(spark):
    """Auth-header passthrough matches the reference's bearer-token API
    (main.py:20-23,30-35,63): 401 without the token, full read with it."""
    import urllib.error

    import pytest as _pytest

    from pretalx_hub_etl_spark.sources.paginated import (
        http_page_fetcher,
        http_pagination_total,
    )

    rows = [{"id": i, "name": f"item-{i:03d}"} for i in range(42)]
    srv, url = _start_fixture_server(rows, require_token="sekrit-42")
    try:
        # no token → the server rejects both probe and page fetch
        with _pytest.raises(urllib.error.HTTPError) as exc:
            http_pagination_total(url, page_size=25)
        assert exc.value.code == 401
        bare = http_page_fetcher(url, page_size=25, columns=["id", "name"])
        with _pytest.raises(urllib.error.HTTPError):
            bare(0)

        # with the bearer header both the driver probe and the
        # executor-side page fetches succeed
        hdrs = {"Authorization": "Bearer sekrit-42"}
        total = http_pagination_total(url, page_size=25, headers=hdrs)
        assert total == 42
        fetch = http_page_fetcher(url, page_size=25, columns=["id", "name"], headers=hdrs)
        df = read_paginated(
            spark, fetch, n_pages_for(total, 25), "id bigint, name string"
        )
        got = df.orderBy("id").collect()
        assert len(got) == 42 and got[41].name == "item-041"
    finally:
        srv.shutdown()


# --- MergeSink (S7) ---------------------------------------------------------


def test_merge_sink_versions_and_semantics(spark, tmp_path):
    from pyspark.sql import functions as F

    from pretalx_hub_etl_spark.sinks.merge import MergeSink, current_version_path

    sink = MergeSink(str(tmp_path / "t"), key="k")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k INT, name STRING, v DOUBLE"
    )
    sink.init(base)
    assert current_version_path(sink.path).endswith("v1")

    # merge 1: update k=2 (source wins), insert k=4, delete k=3
    src = spark.createDataFrame([(2, "B", 99.0), (4, "d", 40.0)], "k INT, name STRING, v DOUBLE")
    dels = spark.createDataFrame([(3,)], "k INT")
    out = {r.k: (r.name, r.v) for r in sink.merge(spark, src, deletes=dels).collect()}
    assert out == {1: ("a", 10.0), 2: ("B", 99.0), 4: ("d", 40.0)}
    assert current_version_path(sink.path).endswith("v2")

    # merge 2 on top: prior version still intact on disk (torn-write safety)
    out2 = {r.k for r in sink.merge(spark, spark.createDataFrame([(5, "e", 1.0)], "k INT, name STRING, v DOUBLE")).collect()}
    assert out2 == {1, 2, 4, 5}
    v2 = spark.read.parquet(str(tmp_path / "t" / "v2"))
    assert v2.count() == 3


def test_merge_sink_rejects_schema_drift(spark, tmp_path):
    import pytest as _pytest

    from pretalx_hub_etl_spark.sinks.merge import MergeSink

    sink = MergeSink(str(tmp_path / "t2"), key="k")
    sink.init(spark.createDataFrame([(1, "a")], "k INT, name STRING"))
    bad = spark.createDataFrame([(1, 2.0)], "k INT, other DOUBLE")
    with _pytest.raises(ValueError):
        sink.merge(spark, bad)


def test_merge_sink_init_twice_fails(spark, tmp_path):
    import pytest as _pytest

    from pretalx_hub_etl_spark.sinks.merge import MergeSink

    sink = MergeSink(str(tmp_path / "t3"), key="k")
    sink.init(spark.createDataFrame([(1, "a")], "k INT, name STRING"))
    with _pytest.raises(FileExistsError):
        sink.init(spark.createDataFrame([(2, "b")], "k INT, name STRING"))


# --- Python DataSource API (paged_parquet) ----------------------------------


def test_paged_parquet_datasource_partitions_and_rows(spark):
    from pretalx_hub_etl_spark.sources.pyds import register

    register(spark)
    register(spark)  # idempotent re-registration
    df = (
        spark.read.format("paged_parquet")
        .option("path", "/root/testdata/sf0.001/supplier.parquet")
        .option("key", "s_suppkey")
        .option("page_size", "3")
        .load()
    )
    plain = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
    n = plain.count()
    assert df.count() == n
    # one partition per key page, planned from footer stats
    import math

    upper = plain.agg(F.max("s_suppkey")).first()[0] + 1
    assert df.rdd.getNumPartitions() == math.ceil(upper / 3)
    assert df.exceptAll(plain.select(*df.columns)).count() == 0


def test_paged_parquet_datasource_projects_columns(spark):
    from pretalx_hub_etl_spark.sources.pyds import register

    register(spark)
    df = (
        spark.read.format("paged_parquet")
        .option("path", "/root/testdata/sf0.001/nation.parquet")
        .option("key", "n_nationkey")
        .option("page_size", "100")
        .option("columns", "n_nationkey,n_name")
        .load()
    )
    assert df.columns == ["n_nationkey", "n_name"]
    assert df.count() == 25


def test_merge_sink_ignores_torn_versions(spark, tmp_path):
    """A version directory without _SUCCESS (writer died mid-write) must
    never be resolved as current state."""
    import os

    from pretalx_hub_etl_spark.sinks.merge import MergeSink, current_version_path

    sink = MergeSink(str(tmp_path / "t4"), key="k")
    sink.init(spark.createDataFrame([(1, "a")], "k INT, name STRING"))
    # simulate a torn v2: directory exists, no _SUCCESS marker
    torn = tmp_path / "t4" / "v2"
    torn.mkdir()
    (torn / "part-00000.parquet").write_bytes(b"garbage")
    assert current_version_path(sink.path).endswith("v1")
    assert {r.k for r in sink.read(spark).collect()} == {1}
    # the next merge skips past the torn dir and commits v3
    out = sink.merge(spark, spark.createDataFrame([(2, "b")], "k INT, name STRING"))
    assert {r.k for r in out.collect()} == {1, 2}
    assert current_version_path(sink.path).endswith("v3")


def test_version_diff_change_feed(spark, tmp_path):
    from pretalx_hub_etl_spark.sinks.merge import MergeSink, version_diff

    sink = MergeSink(str(tmp_path / "t"), key="k")
    sink.init(spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "k INT, name STRING, v DOUBLE",
    ))
    # update k=2 (value change), "update" k=3 to identical values (no-op),
    # insert k=4, delete k=1
    src = spark.createDataFrame(
        [(2, "b", 99.0), (3, "c", 3.0), (4, "d", 4.0)],
        "k INT, name STRING, v DOUBLE",
    )
    sink.merge(spark, src, deletes=spark.createDataFrame([(1,)], "k INT"))

    diff = {r.k: (r.change, r.old, r.new)
            for r in version_diff(spark, sink.path, "k", 1, 2).collect()}
    assert set(diff) == {1, 2, 4}  # k=3 unchanged -> absent from the feed
    assert diff[1][0] == "delete" and diff[1][2] is None
    assert diff[2][0] == "update" and diff[2][1].v == 2.0 and diff[2][2].v == 99.0
    assert diff[4][0] == "insert" and diff[4][1] is None and diff[4][2].v == 4.0


def test_profile_columns_metrics(spark):
    from pretalx_hub_etl_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x"), (None, "y")], "a INT, b STRING"
    )
    rows = {r.column: r for r in profile_columns(df).collect()}
    a, b = rows["a"], rows["b"]
    assert (a.n_rows, a.n_null, a.n_distinct, a.min_val, a.max_val) == (4, 1, 3, "1", "3")
    assert (b.n_rows, b.n_null, b.n_distinct, b.min_val, b.max_val) == (4, 1, 2, "x", "y")
    # approximate mode keeps the same shape
    approx = {r.column: r.n_distinct
              for r in profile_columns(df, exact_distinct=False).collect()}
    assert approx["a"] >= 2 and approx["b"] >= 1


def test_foreach_partition_rate_limit(spark, tmp_path):
    """Token-bucket throttle: 10 rows at 50 rows/s in one partition must
    take >= 9 inter-row intervals (~0.18 s); unthrottled is instant."""
    import time

    from pretalx_hub_etl_spark.sinks.base import foreach_partition_write

    df = spark.range(10).coalesce(1)
    log = str(tmp_path / "sink.log")

    def factory():
        f = open(log, "a")
        return (lambda row: f.write(f"{row['id']}\n")), f.close

    t0 = time.monotonic()
    foreach_partition_write(df, factory, rate_limit_rows_per_sec=50.0)
    throttled = time.monotonic() - t0
    with open(log) as f:
        assert len(f.read().split()) == 10
    # first row is a free burst token; 9 paced rows at 20 ms each
    assert throttled >= 0.17

    t0 = time.monotonic()
    foreach_partition_write(df, factory)
    unthrottled = time.monotonic() - t0
    assert unthrottled < throttled


def test_compact_parquet_dir(spark, tmp_path):
    from pretalx_hub_etl_spark.sinks.base import compact_parquet_dir

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "out")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") * 3).alias("v")
    )
    df.repartition(32).write.parquet(src)
    import os

    n_in = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_in >= 32
    out = compact_parquet_dir(spark, src, dst, target_file_bytes=1 << 30)
    n_out = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert n_out == 1  # total bytes far below one target file
    # lossless: same multiset of rows
    assert out.count() == 10_000
    assert out.exceptAll(df).isEmpty() and df.exceptAll(out).isEmpty()


def test_pyds_streaming_pages_and_replay(spark, tmp_path):
    """The python streaming source serves pages as microbatches and its
    readBetweenOffsets replay returns the same rows as the live read."""
    import uuid

    from pretalx_hub_etl_spark.sources.pyds import (
        build_paged_parquet_source,
        register,
    )

    path = str(tmp_path / "keyed.parquet")
    spark.range(100).selectExpr("id AS k", "id * 2 AS v").coalesce(
        1
    ).write.parquet(path)
    # the parquet dir has one part file; point the source at it
    import glob

    part = glob.glob(path + "/part-*.parquet")[0]

    register(spark)
    stream = (
        spark.readStream.format("paged_parquet")
        .option("path", part)
        .option("key", "k")
        .option("page_size", "30")
        .load()
    )
    name = f"pyds_t_{uuid.uuid4().hex}"
    q = (
        stream.groupBy()
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    row = spark.table(name).collect()[0]
    assert (row.n, row.sv) == (100, 9900)

    # direct replay contract: readBetweenOffsets == the union of pages
    src = build_paged_parquet_source()(
        {"path": part, "key": "k", "page_size": "30"}
    )
    rdr = src.simpleStreamReader(None)
    rows = list(rdr.readBetweenOffsets({"lo": 0}, {"lo": 60}))
    assert len(rows) == 60
    assert {r[0] for r in rows} == set(range(60))


def test_mor_table_resolution_compaction_and_write_amp(spark, tmp_path):
    from pretalx_hub_etl_spark.sinks.mor import MorTable

    base = spark.range(1000).selectExpr(
        "id AS k", "concat('n', id) AS name", "id * 10 AS cents"
    )
    t = MorTable(str(tmp_path / "mor"), "k")
    t.init(base)

    # delta commit: 20 updates + 5 inserts — write amp must be O(delta)
    delta = spark.range(25).selectExpr(
        "CASE WHEN id < 20 THEN id * 50 ELSE 1000 + id END AS k",
        "concat('u', id) AS name",
        "id AS cents",
    )
    v2 = t.merge(spark, source=delta.coalesce(1))
    # O(delta) write: 25 rows vs 1000 (parquet per-file overhead keeps
    # the tiny-fixture ratio far above 25/1000; the point is it is a
    # fraction of the base, not a rewrite of it)
    assert t.delta_bytes(v2) < t.delta_bytes(1) / 4

    # tombstones, then a re-insert of one tombstoned key
    t.merge(spark, deletes=spark.range(10).selectExpr("id * 100 AS k"))
    t.merge(
        spark,
        source=spark.createDataFrame(
            [(200, "back", 7)], "k long, name string, cents long"
        ),
    )

    def as_map(df):
        return {r.k: (r.name, r.cents) for r in df.collect()}

    got = as_map(t.read(spark))
    # latest-wins: updated key
    assert got[50] == ("u1", 1)
    # tombstoned keys gone, except the re-inserted one
    assert 100 not in got and 300 not in got
    assert got[200] == ("back", 7)
    # untouched key
    assert got[7] == ("n7", 70)
    assert len(got) == 1000 + 5 - 10 + 1

    # compaction: checkpointed state equals the resolved chain, and the
    # reader now starts from the checkpoint (chain length 1)
    before = as_map(t.read(spark))
    cv = t.compact(spark)
    assert as_map(t.read(spark)) == before
    start, chain = t._chain()
    assert start == cv and chain == [cv]

    # deltas after a checkpoint still resolve on top of it
    t.merge(
        spark,
        source=spark.createDataFrame(
            [(7, "post", 1)], "k long, name string, cents long"
        ),
    )
    assert as_map(t.read(spark))[7] == ("post", 1)


def test_mor_changes_since_cursor(spark, tmp_path):
    from pretalx_hub_etl_spark.sinks.mor import MorTable

    t = MorTable(str(tmp_path / "morcdc"), "k")
    t.init(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    t.merge(spark, source=spark.createDataFrame([(3, "c")], "k long, v string"))
    t.merge(spark, deletes=spark.createDataFrame([(1,)], "k long"))

    all_changes = t.changes_since(spark, 1).collect()
    got = sorted((r["__op"], r["__commit"], r.k, r.v) for r in all_changes)
    assert got == [("delete", 3, 1, None), ("upsert", 2, 3, "c")]
    # a caught-up cursor sees nothing
    assert t.changes_since(spark, 3).count() == 0
