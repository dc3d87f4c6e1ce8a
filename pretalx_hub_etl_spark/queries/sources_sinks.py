"""Source/sink declared queries (SURVEY.md §2.1, S1/S2/S4/S5)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions import falsy_coalesce, plural_label
from ..functions.core import fixed_cents, parse_offset_ts
from ..sinks import ParquetSink, with_validity
from ..sources import fixture_schedule, normalize_schedule
from ..sources.json_doc import schedule_df
from ..sources.paginated import (
    n_pages_for,
    parquet_key_upper_bound,
    parquet_page_reader,
    read_paginated,
)
from . import query

# --- S1: JSON document normalize (golden-row oracle: fixture in, plan out) --


@query(
    "q_scan_json_normalize",
    oracle="""
    SELECT * FROM (VALUES
      ('Opening Keynote', 1, 'welcome talk', 'Speaker: Speaker Number 0',
       TIMESTAMP '2026-08-01 09:00:00', '00:30', 'TALK-A'),
      ('Duplicate Code Talk', 1, 'dup', 'Speaker: Speaker Number 6',
       TIMESTAMP '2026-08-01 11:00:00', '00:30', 'TALK-A'),
      ('', 2, '', 'Speakers: Speaker Number 1, Speaker Number 2',
       TIMESTAMP '2026-08-01 10:00:00', '01:00', 'TALK-B'),
      ('Workshop', 3, '',
       'Speakers: Speaker Number 3, Speaker Number 4, Speaker Number 5',
       TIMESTAMP '2026-08-01 10:15:00', '00:45', ''),
      ('Closing', 2, 'bye', 'Speaker: Speaker Number 7',
       TIMESTAMP '2026-08-02 09:30:00', '00:15', 'talk-c')
    ) AS t(name, room_id, abstract, description_en, schedule_start,
           duration, tags)
    """,
)
def q_scan_json_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The oracle is the GOLDEN OUTPUT for the fixture schedule: it pins
    # every surveyed edge case end-to-end — falsy-coalesce of null/empty
    # title/abstract/code (main.py:116,122,132), both %z offset spellings
    # normalized to UTC (main.py:128), singular/plural speaker labels
    # (main.py:125-127), and speaker-code resolution (main.py:123).
    doc = schedule_df(spark, fixture_schedule())
    speakers, talks = normalize_schedule(doc)
    # Resolve speaker codes -> names via broadcast join (the reference's
    # speaker_map dict, main.py:107-110,123), then the P1/P2/P3/F2 projection.
    exploded = talks.withColumnRenamed("code", "talk_code").select(
        "*", F.explode_outer("speakers").alias("speaker_code")
    )
    spk = speakers.select(F.col("code").alias("s_code"), F.col("name").alias("s_name"))
    resolved = (
        exploded.join(F.broadcast(spk), F.col("speaker_code") == F.col("s_code"), "left")
        .groupBy("title", "room", "abstract", "start", "duration", "talk_code")
        .agg(F.sort_array(F.collect_list("s_name")).alias("speaker_names"))
    )
    return resolved.select(
        falsy_coalesce("title", "").alias("name"),
        F.col("room").alias("room_id"),
        falsy_coalesce("abstract", "").alias("abstract"),
        plural_label("Speaker", "speaker_names").alias("description_en"),
        parse_offset_ts("start").alias("schedule_start"),
        "duration",
        falsy_coalesce(F.col("talk_code"), "").alias("tags"),
    )


# --- S2: paginated source (parallel page fetch ≡ full table) ----------------


@query(
    "q_scan_paginated",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM orders
    """,
)
def q_scan_paginated(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    path = f"{cat.sf_dir}/orders.parquet"
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"]
    # total comes from footer statistics (metadata-only), NOT a max() scan —
    # the pre-scan would read the whole key column before the job starts.
    total = parquet_key_upper_bound(path, "o_orderkey")
    page_size = 1000
    fetch = parquet_page_reader(path, "o_orderkey", page_size, cols)
    return read_paginated(
        spark,
        fetch,
        n_pages_for(total, page_size),
        schema="o_orderkey bigint, o_custkey bigint, o_totalprice double, o_orderpriority string",
    )


# --- S4: sink roundtrip -----------------------------------------------------


@query("q_sink_roundtrip", oracle="SELECT * FROM nation")
def q_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = Catalog(spark, sf_dir).nation
    out = os.path.join(tempfile.mkdtemp(prefix="phe_sink_"), "nation_roundtrip")
    sink = ParquetSink(out)
    sink.write(nation)
    return sink.read_back(spark)


# --- partitioned write + partition-pruned read ------------------------------


@query(
    "q_scan_partition_pruned",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(year(o_orderdate) AS BIGINT) AS order_year
    FROM orders WHERE year(o_orderdate) = 1999
    """,
)
def q_scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Write orders hive-partitioned by year, read back with a partition
    # filter: at 100 TB this is the layout that turns a full scan into a
    # single-directory read (partition pruning happens at planning time —
    # the scan's PartitionFilters, not a data filter).
    orders = Catalog(spark, sf_dir).orders.withColumn(
        "order_year", F.year("o_orderdate").cast("long")
    )
    out = os.path.join(tempfile.mkdtemp(prefix="phe_part_"), "orders_by_year")
    ParquetSink(out, partition_by=["order_year"]).write(
        orders.select("o_orderkey", "o_totalprice", "order_year")
    )
    back = spark.read.parquet(out)
    # partition-column type is re-inferred on read (int) — pin it to long
    return back.filter(F.col("order_year") == 1999).select(
        "o_orderkey", "o_totalprice", F.col("order_year").cast("long").alias("order_year")
    )


# --- bucketed layout: shuffle-free co-located join --------------------------


@query(
    "q_join_bucketed",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) / 100.0 AS lineitem_total
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_totalprice
    """,
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pay the shuffle once at write time: both tables bucketed 8-ways on
    # the order key, then join + groupBy on that key run with ZERO
    # exchanges (asserted in tests/test_plans.py). At 100 TB this is the
    # layout for any fact table that joins on the same key repeatedly.
    from ..operators.bucketing import bucketed_join, write_bucketed

    cat = Catalog(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="phe_bucket_")
    write_bucketed(
        cat.orders.select("o_orderkey", "o_totalprice"),
        "phe_orders_b", ["o_orderkey"], 8, path=os.path.join(base, "orders"),
    )
    write_bucketed(
        cat.lineitem.select(
            F.col("l_orderkey"), fixed_cents(F.col("l_extendedprice")).alias("cents")
        ),
        "phe_lineitem_b", ["l_orderkey"], 8, path=os.path.join(base, "lineitem"),
    )
    joined = spark.table("phe_orders_b").join(
        spark.table("phe_lineitem_b"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    return joined.groupBy("o_orderkey", "o_totalprice").agg(
        (F.sum("cents") / F.lit(100.0)).alias("lineitem_total")
    )


# --- additional sink formats (JSON / CSV roundtrips) ------------------------


@query("q_sink_roundtrip_json", oracle="SELECT n_nationkey, n_name FROM nation")
def q_sink_roundtrip_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = Catalog(spark, sf_dir).nation.select("n_nationkey", "n_name")
    out = os.path.join(tempfile.mkdtemp(prefix="phe_json_"), "nation_json")
    nation.write.mode("overwrite").json(out)
    schema = "n_nationkey int, n_name string"
    return spark.read.schema(schema).json(out)


@query("q_sink_roundtrip_csv", oracle="SELECT c_custkey, c_name, c_acctbal FROM customer")
def q_sink_roundtrip_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = Catalog(spark, sf_dir).customer.select("c_custkey", "c_name", "c_acctbal")
    out = os.path.join(tempfile.mkdtemp(prefix="phe_csv_"), "customer_csv")
    cust.write.mode("overwrite").option("header", True).csv(out)
    schema = "c_custkey bigint, c_name string, c_acctbal double"
    return spark.read.schema(schema).option("header", True).csv(out)


# --- multimodal decode plumbing (stub codec is sha256 -> SQL-reproducible) --

_FEATURE_TERMS = "\n       + ".join(
    f"CAST(('0x' || substr(hx, {2 * i + 1}, 2)) AS INTEGER) / 255.0"
    for i in range(8)
)


@query(
    "q_multimodal_decode",
    oracle=f"""
    WITH h AS (
        SELECT doc_id AS media_id,
               sha256('mediabytes:' || CAST(doc_id AS VARCHAR)) AS hx
        FROM documents
    )
    SELECT media_id, CAST(8 AS BIGINT) AS n_features,
           CAST(floor((
             {_FEATURE_TERMS}
           ) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS feature_sum
    FROM h
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Even the STUB codec is oracle-checked: the fake feature vector is
    # sha256-derived, which DuckDB reproduces byte-for-byte (hex-pair
    # extraction in the oracle), so the Arrow round-trip through
    # mapInPandas is verified end-to-end, not just row-counted.
    from ..functions.core import fixed_point
    from ..llm.multimodal import attach_fake_media, decode_features

    docs = Catalog(spark, sf_dir).documents.select(
        F.col("doc_id").alias("media_id")
    )
    media = attach_fake_media(docs, "media_id")
    feats = decode_features(media, n_features=8)
    return feats.select(
        "media_id",
        F.size("features").cast("long").alias("n_features"),
        fixed_point(
            F.aggregate("features", F.lit(0.0), lambda a, v: a + v), 6
        ).alias("feature_sum"),
    )


# --- multimodal frame sampling (1:N row-expanding pandas UDF) ---------------


@query(
    "q_multimodal_frames",
    oracle="""
    WITH media AS (
        SELECT doc_id AS media_id, (doc_id % 10) * 500 + 1000 AS duration_ms
        FROM documents
    )
    SELECT media_id, CAST(i AS BIGINT) AS frame_idx,
           CAST(i * 400 AS BIGINT) AS frame_ts_ms
    FROM media, unnest(range(0, duration_ms // 400 + 1)) AS t(i)
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    # video -> frame rows: the frame enumeration (metadata-driven 1:N
    # expansion inside mapInPandas) hash-matches a generate_series oracle;
    # the stub frame payload itself is codec territory and is dropped here.
    from ..llm.multimodal import attach_fake_media, sample_frames

    docs = Catalog(spark, sf_dir).documents.select(
        F.col("doc_id").alias("media_id"),
        ((F.col("doc_id") % 10) * 500 + 1000).cast("long").alias("duration_ms"),
    )
    media = attach_fake_media(docs, "media_id")
    frames = sample_frames(media, every_ms=400)
    return frames.select("media_id", "frame_idx", "frame_ts_ms")


# --- S5: pre-sink validation / dead-letter split ----------------------------


@query(
    "q_validate_split",
    oracle="""
    SELECT event_id, event_type, value,
           (value >= 1.0 AND event_type <> 'error') AS is_valid
    FROM events
    """,
)
def q_validate_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    predicate = (F.col("value") >= 1.0) & (F.col("event_type") != "error")
    return with_validity(e, predicate).select("event_id", "event_type", "value", "is_valid")


# --- S4 extension: ORC roundtrip (second columnar format) -------------------


@query("q_sink_roundtrip_orc", oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier")
def q_sink_roundtrip_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark's other native columnar format: same writer API, same
    # predicate-pushdown/column-pruning story as parquet (ORC readers are
    # vectorized + indexed). The oracle reads the ORIGINAL parquet table —
    # the roundtrip must be lossless.
    supp = Catalog(spark, sf_dir).supplier
    out = os.path.join(tempfile.mkdtemp(prefix="phe_orc_"), "supplier_orc")
    supp.write.mode("overwrite").orc(out)
    return spark.read.orc(out)


@query(
    "q_sink_roundtrip_avro",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey,
           CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,
           CASE WHEN s_suppkey % 3 = 0 THEN NULL ELSE s_name END AS opt_name
    FROM supplier
    """,
)
def q_sink_roundtrip_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S4 completion (VERDICT r9 item 3): Avro — the remaining mainstream
    # interchange format (the Kafka-adjacent one). No spark-avro jar and
    # no avro/fastavro package ships in this sandbox, so the Object
    # Container File format is implemented from its public spec
    # (sources/avro_ocf.py, the llm/ codec policy) and driven
    # DISTRIBUTED on both sides: one OCF file per partition written from
    # inside mapInPandas (deflate codec — compression exercised), read
    # back via binaryFile + mapInPandas with the EXPLICIT schema. The
    # oracle reads the ORIGINAL parquet (S4 roundtrip policy: the
    # format hop must be invisible); a nullable column exercises the
    # ["null", T] union encoding, money crosses as integer cents.
    import shutil

    from ..sources.avro_ocf import read_avro, write_avro

    supp = Catalog(spark, sf_dir).supplier.select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        fixed_cents(F.col("s_acctbal")).alias("bal_cents"),
        F.when(F.col("s_suppkey") % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("s_name"))
        .alias("opt_name"),
    )
    root = tempfile.mkdtemp(prefix="phe_avro_")
    out = os.path.join(root, "supplier_avro")
    write_avro(supp, out, codec="deflate")
    back = read_avro(spark, out, supp.schema).localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return back


# --- S7: copy-on-write MERGE sink (upsert + delete, versioned parquet) ------


@query(
    "q_sink_merge_upsert",
    oracle="""
    WITH fixed AS (
        SELECT c_custkey, c_name,
               CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) / 100.0 AS bal
        FROM customer
    ),
    src AS (
        SELECT c_custkey, c_name, bal + 100.0 AS bal
        FROM fixed WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey + 1000000, c_name, 0.0 AS bal
        FROM fixed WHERE c_custkey % 11 = 0
    ),
    merged AS (
        SELECT coalesce(s.c_custkey, t.c_custkey) AS c_custkey,
               CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name
                    ELSE t.c_name END AS c_name,
               CASE WHEN s.c_custkey IS NOT NULL THEN s.bal
                    ELSE t.bal END AS c_acctbal
        FROM fixed t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
    )
    SELECT c_custkey, c_name, c_acctbal
    FROM merged
    WHERE c_custkey NOT IN
          (SELECT c_custkey FROM fixed WHERE c_custkey % 13 = 0)
    """,
)
def q_sink_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference's entire Load phase as ONE durable operation: init the
    # target table, MERGE a source of updates (source-wins) + inserts, and
    # a delete key set; read back the new version. The returned state is
    # durable parquet — the oracle recomputes the same merge relationally.
    from ..sinks.merge import MergeSink

    c = Catalog(spark, sf_dir).customer.select(
        "c_custkey",
        "c_name",
        (fixed_cents(F.col("c_acctbal")) / 100.0).alias("c_acctbal"),
    )
    sink = MergeSink(
        os.path.join(tempfile.mkdtemp(prefix="phe_merge_"), "customers"),
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
    return sink.merge(spark, updates.unionByName(inserts), deletes=deletes)


# --- multimodal resize (1:1 mapInPandas, stub codec oracle-checked) ---------


@query(
    "q_multimodal_resize",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(64 AS BIGINT) AS width, CAST(48 AS BIGINT) AS height,
           sha256('mediabytes:' || CAST(doc_id AS VARCHAR) || '64x48')
               AS payload_hex
    FROM documents
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same contract as q_multimodal_decode: the stub "resize" payload is
    # sha256(raw || "WxH"), which DuckDB reproduces exactly, so the 1:1
    # Arrow round-trip (binary in, binary out, metadata updated) is
    # value-verified, not just row-counted.
    from ..llm.multimodal import attach_fake_media, resize_images

    docs = Catalog(spark, sf_dir).documents.select(
        F.col("doc_id").alias("media_id")
    )
    out = resize_images(attach_fake_media(docs, "media_id"), width=64, height=48)
    return out.select(
        "media_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.lower(F.hex("payload")).alias("payload_hex"),
    )


# --- S2 via the Python DataSource API (Spark 4 native custom source) --------


@query(
    "q_scan_datasource",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) / 100.0
               AS total_price
    FROM orders
    """,
)
def q_scan_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The paginated source as a FIRST-CLASS Spark source: the DataSource
    # itself plans one InputPartition per key page (from parquet footer
    # statistics, no data scan), executors decode only row groups
    # overlapping their page, and Arrow batches cross the Python/JVM
    # boundary. Equivalent rows to the plain scan — which is the oracle.
    from ..sources.pyds import register

    register(spark)
    ds = (
        spark.read.format("paged_parquet")
        .option("path", f"{sf_dir.rstrip('/')}/orders.parquet")
        .option("key", "o_orderkey")
        .option("page_size", "4000")
        .option("columns", "o_orderkey,o_custkey,o_totalprice")
        .load()
    )
    return ds.select(
        "o_orderkey",
        "o_custkey",
        (fixed_cents(F.col("o_totalprice")) / 100.0).alias("total_price"),
    )


# --- L5 real-codec path: PNG decode / resize (round-6 review Next #3) -------


@query(
    "q_multimodal_decode_png",
    oracle="""
    -- closed-form replay of the gradient fixture: pixel(x,y) =
    -- (3x + 5y + id) mod 256 over an (8+id%5) x (8+id%7) grid
    WITH m AS (
        SELECT doc_id AS media_id,
               8 + doc_id % 5 AS w, 8 + doc_id % 7 AS h
        FROM documents
    )
    SELECT media_id,
           CAST(max(w) AS BIGINT) AS width,
           CAST(max(h) AS BIGINT) AS height,
           'L' AS mode,
           CAST(count(*) AS BIGINT) AS n_bytes,
           CAST(sum((3 * x.i + 5 * y.i + media_id) % 256) AS BIGINT)
               AS pixel_sum
    FROM m, unnest(range(0, w)) AS x(i), unnest(range(0, h)) AS y(i)
    GROUP BY media_id
    """,
)
def q_multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    # REAL image decode under the oracle: attach_png_media emits actual
    # PNG bytes (stdlib encoder, cycling None/Sub/Up scanline filters),
    # decode_image zlib-inflates and unfilters them executor-side in
    # Arrow batches, and the decoded-pixel aggregate must match the
    # closed-form gradient — a decoder that shortcuts real unfiltering
    # cannot hash-match. codec="pure" pins the stdlib decoder so the
    # declared row is engine-stable; codec="auto" (PIL when importable)
    # is exercised by tests/test_multimodal_png.py.
    from ..llm.multimodal import attach_png_media, decode_image

    docs = Catalog(spark, sf_dir).documents.select(
        F.col("doc_id").alias("media_id")
    )
    media = attach_png_media(docs, "media_id")
    return decode_image(media, codec="pure")


@query(
    "q_sink_merge_mor",
    oracle="""
    -- replay of the 4-commit MoR chain: v1 base, v2 upserts (%5, *),
    -- v3 tombstones (%7), v4 upserts (%3, +) — later commit wins per key,
    -- a tombstoned key returns only via a LATER upsert
    WITH base AS (
        SELECT c_custkey AS k, c_name AS name,
               CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
        FROM customer
    ), fin AS (
        SELECT k,
               CASE WHEN k % 3 = 0 THEN name || '+'
                    WHEN k % 5 = 0 THEN name || '*'
                    ELSE name END AS name,
               CASE WHEN k % 3 = 0 THEN cents + 777
                    WHEN k % 5 = 0 THEN cents + 10000
                    ELSE cents END AS cents,
               (k % 3 <> 0 AND k % 7 = 0) AS gone
        FROM base
    )
    SELECT k AS c_custkey, name AS c_name, cents AS acct_cents
    FROM fin WHERE NOT gone
    """,
)
def q_sink_merge_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S15: merge-on-read MERGE — the other half of the lakehouse trade
    # (the CoW MergeSink rewrites the touched slice per commit; MoR
    # writes ONLY the delta and the READER resolves per-key latest-wins
    # across the version chain, Hudi-MOR/Iceberg-equality-delete style).
    # Four commits: checkpointed base, an upsert delta, a tombstone-only
    # delta, a second upsert delta that re-inserts some tombstoned keys
    # — the returned read exercises the full resolution (union of delta
    # scans + one key-window). Exact integer cents. Write amplification
    # and compaction are pinned in tests/test_sources_sinks.py.
    import shutil

    from ..sinks.mor import MorTable

    c = Catalog(spark, sf_dir).customer.select(
        "c_custkey",
        "c_name",
        fixed_cents(F.col("c_acctbal")).alias("acct_cents"),
    )
    path = os.path.join(tempfile.mkdtemp(prefix="phe_mor_"), "t")
    t = MorTable(path, "c_custkey")
    t.init(c)
    t.merge(
        spark,
        source=c.filter(F.col("c_custkey") % 5 == 0).select(
            "c_custkey",
            F.concat(F.col("c_name"), F.lit("*")).alias("c_name"),
            (F.col("acct_cents") + 10000).alias("acct_cents"),
        ),
    )
    t.merge(
        spark,
        deletes=c.filter(F.col("c_custkey") % 7 == 0).select("c_custkey"),
    )
    t.merge(
        spark,
        source=c.filter(F.col("c_custkey") % 3 == 0).select(
            "c_custkey",
            F.concat(F.col("c_name"), F.lit("+")).alias("c_name"),
            (F.col("acct_cents") + 777).alias("acct_cents"),
        ),
    )
    out = t.read(spark).localCheckpoint()
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return out


@query(
    "q_sink_merge_mor_dv",
    oracle="""
    -- IDENTICAL oracle to q_sink_merge_mor: the same 4-commit history,
    -- but commit 3's deletes are POSITION deletes (deletion vectors) —
    -- the storage shape must be invisible in the answer
    WITH base AS (
        SELECT c_custkey AS k, c_name AS name,
               CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
        FROM customer
    ), fin AS (
        SELECT k,
               CASE WHEN k % 3 = 0 THEN name || '+'
                    WHEN k % 5 = 0 THEN name || '*'
                    ELSE name END AS name,
               CASE WHEN k % 3 = 0 THEN cents + 777
                    WHEN k % 5 = 0 THEN cents + 10000
                    ELSE cents END AS cents,
               (k % 3 <> 0 AND k % 7 = 0) AS gone
        FROM base
    )
    SELECT k AS c_custkey, name AS c_name, cents AS acct_cents
    FROM fin WHERE NOT gone
    """,
)
def q_sink_merge_mor_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S24: merge-on-read with POSITION DELETES (the Delta deletion-
    # vector / Iceberg-v2 position-delete shape) — S15's exact history
    # with commit 3 expressed as `DELETE WHERE c_custkey % 7 = 0`
    # committing (file, row-position) pairs instead of key tombstones:
    # no key values are written, the reader anti-resolves the targeted
    # physical rows into delete EVENTS at the DV's commit version (so
    # v1 history shadowed by a DV'd v2 row does NOT resurface — keys
    # %35==0 pin that), and commit 4's upserts re-insert %3 keys
    # through the DV exactly as through a tombstone. Same oracle as
    # q_sink_merge_mor BY DESIGN: layout must be invisible. DV write
    # amplification and compaction dropping applied DVs are pinned in
    # tests/test_mor_dv.py.
    import shutil

    from ..sinks.mor import MorTable

    c = Catalog(spark, sf_dir).customer.select(
        "c_custkey",
        "c_name",
        fixed_cents(F.col("c_acctbal")).alias("acct_cents"),
    )
    path = os.path.join(tempfile.mkdtemp(prefix="phe_mor_dv_"), "t")
    t = MorTable(path, "c_custkey")
    t.init(c)
    t.merge(
        spark,
        source=c.filter(F.col("c_custkey") % 5 == 0).select(
            "c_custkey",
            F.concat(F.col("c_name"), F.lit("*")).alias("c_name"),
            (F.col("acct_cents") + 10000).alias("acct_cents"),
        ),
    )
    t.delete_where(spark, F.col("c_custkey") % 7 == 0)  # v3: DV commit
    t.merge(
        spark,
        source=c.filter(F.col("c_custkey") % 3 == 0).select(
            "c_custkey",
            F.concat(F.col("c_name"), F.lit("+")).alias("c_name"),
            (F.col("acct_cents") + 777).alias("acct_cents"),
        ),
    )
    out = t.read(spark).localCheckpoint()
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return out


@query(
    "q_cdc_mor_feed",
    oracle="""
    -- the deltas ARE the change log: commits 2..4 replayed as typed
    -- change events (upserts carry rows, deletes carry NULL payloads)
    WITH base AS (
        SELECT c_custkey AS k, c_name AS name,
               CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
        FROM customer
    )
    SELECT 'upsert' AS __op, CAST(2 AS BIGINT) AS __commit,
           k AS c_custkey, name || '*' AS c_name,
           cents + 10000 AS acct_cents
    FROM base WHERE k % 5 = 0
    UNION ALL
    SELECT 'delete', 3, k, NULL, NULL FROM base WHERE k % 7 = 0
    UNION ALL
    SELECT 'upsert', 4, k, name || '+', cents + 777
    FROM base WHERE k % 3 = 0
    """,
)
def q_cdc_mor_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S16: incremental consumption of the MoR chain — changes_since(1)
    # returns exactly the commits a consumer has not seen, typed as
    # upsert/delete events; no state diffing (contrast q_cdc_version_diff,
    # which reconstructs changes by comparing two CoW snapshots), and
    # scan cost is the consumed deltas only. The same 4-commit chain as
    # q_sink_merge_mor; feed hashed event-for-event.
    import shutil

    from ..sinks.mor import MorTable

    c = Catalog(spark, sf_dir).customer.select(
        "c_custkey",
        "c_name",
        fixed_cents(F.col("c_acctbal")).alias("acct_cents"),
    )
    path = os.path.join(tempfile.mkdtemp(prefix="phe_morcdc_"), "t")
    t = MorTable(path, "c_custkey")
    t.init(c)
    t.merge(
        spark,
        source=c.filter(F.col("c_custkey") % 5 == 0).select(
            "c_custkey",
            F.concat(F.col("c_name"), F.lit("*")).alias("c_name"),
            (F.col("acct_cents") + 10000).alias("acct_cents"),
        ),
    )
    t.merge(
        spark,
        deletes=c.filter(F.col("c_custkey") % 7 == 0).select("c_custkey"),
    )
    t.merge(
        spark,
        source=c.filter(F.col("c_custkey") % 3 == 0).select(
            "c_custkey",
            F.concat(F.col("c_name"), F.lit("+")).alias("c_name"),
            (F.col("acct_cents") + 777).alias("acct_cents"),
        ),
    )
    out = t.changes_since(spark, 1).localCheckpoint()
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return out


@query(
    "q_stream_pyds",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders
    GROUP BY 1
    """,
)
def q_stream_pyds(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ST10: a CUSTOM Python streaming source (Spark 4
    # SimpleDataSourceStreamReader) driven as a real streaming query —
    # the streaming twin of S2/S3's paginated batch source: each
    # microbatch serves one key page of orders (offset = next page lower
    # bound, replay via readBetweenOffsets), aggregated in COMPLETE mode
    # so the final snapshot equals the batch answer regardless of page
    # boundaries. The upper bound comes from parquet footer statistics;
    # ~3 pages -> a genuinely multi-batch run (each microbatch pays a
    # full python-runner round trip, so page count is the query's whole
    # cost — trimmed 4->3 in round 10, the minimum that still exercises
    # multiple offsets plus the exhaustion batch). Exact integer cents.
    import uuid

    from ..sources.paginated import parquet_key_upper_bound
    from ..sources.pyds import register
    from ..streaming.structured import run_to_memory

    # fixture_session (r17): the complete-mode agg is STATEFUL, so its
    # shuffle-partition count is the state-store count per microbatch —
    # the engine's streaming fixtures all size it via fixture_session
    # (state partitions track state volume, not cluster width).
    # register(s2) lands in the CHILD's own DataSourceManager even when
    # a sibling session registered the name first (sources/registry.py;
    # pinned in test_round10.py — the r17 swallow-ALREADY_EXISTS path
    # left the child unable to resolve the source in that order).
    from ..streaming.structured import fixture_session

    s2 = fixture_session(spark)
    register(s2)
    path = f"{sf_dir.rstrip('/')}/orders.parquet"
    upper = parquet_key_upper_bound(path, "o_orderkey")
    stream = (
        s2.readStream.format("paged_parquet")
        .option("path", path)
        .option("key", "o_orderkey")
        .option("page_size", str(max(1, upper // 3 + 1)))
        .option("columns", "o_orderkey,o_orderpriority,o_totalprice")
        .load()
    )
    agg = stream.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(fixed_cents(F.col("o_totalprice"))).alias("total_cents"),
    )
    name = f"pyds_{uuid.uuid4().hex}"
    run_to_memory(agg, name, output_mode="complete")
    return s2.table(name)


@query(
    "q_scan_binaryfile",
    oracle="""
    -- the binaryFile scan feeds the SAME decode as q_multimodal_decode_png,
    -- restricted to the 40 smallest doc_ids (the files the fixture writes);
    -- length is the real on-disk PNG byte count, checked via n_bytes > 0
    -- indirectly by the decode columns
    WITH ids AS (
        SELECT doc_id AS media_id FROM documents ORDER BY doc_id LIMIT 40
    ), m AS (
        SELECT media_id, 8 + media_id % 5 AS w, 8 + media_id % 7 AS h
        FROM ids
    )
    SELECT media_id,
           CAST(max(w) AS BIGINT) AS width,
           CAST(max(h) AS BIGINT) AS height,
           'L' AS mode,
           CAST(count(*) AS BIGINT) AS n_bytes,
           CAST(sum((3 * x.i + 5 * y.i + media_id) % 256) AS BIGINT)
               AS pixel_sum
    FROM m, unnest(range(0, w)) AS x(i), unnest(range(0, h)) AS y(i)
    GROUP BY media_id
    """,
)
def q_scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S14: Spark's binaryFile source — THE ingestion path for an image/
    # audio corpus that arrives as loose object-store files rather than
    # parquet-packed payload columns. The scan yields (path, length,
    # modificationTime, content) with content as the raw bytes; at 100 TB
    # pathGlobFilter + partitioned prefixes prune at the listing level
    # and each file is one task input (no splitting — exactly right for
    # encoded media). Fixture: 40 real PNG files written driver-side
    # (id-named, the decode gradient), scanned back with binaryFile,
    # ids re-derived from the PATH (regexp on the filename — the lineage
    # idiom for file-per-record corpora), bytes decoded by the real
    # codec, aggregates oracle-checked against the closed form.
    import shutil

    from ..llm.multimodal import decode_image
    from ..llm.png_codec import png_encode

    ids = [
        int(r[0])
        for r in Catalog(spark, sf_dir)
        .documents.select("doc_id")
        .orderBy("doc_id")
        .limit(40)
        .collect()
    ]
    tmp = os.path.join(tempfile.mkdtemp(prefix="phe_binfile_"), "imgs")
    os.makedirs(tmp)
    for i in ids:
        w, h = 8 + i % 5, 8 + i % 7
        px = bytes(
            (3 * x + 5 * y + i) % 256 for y in range(h) for x in range(w)
        )
        with open(os.path.join(tmp, f"{i}.png"), "wb") as fh:
            fh.write(png_encode(px, w, h, "L"))

    scanned = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(tmp)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.png$", 1)
            .cast("long")
            .alias("media_id"),
            F.col("content").alias("payload"),
            "length",
        )
    )
    out = decode_image(scanned, codec="pure")
    # eager localCheckpoint forces the scan+decode BEFORE the fixture
    # dir is removed; 40 tiny rows, no lingering cache
    result = out.localCheckpoint()
    shutil.rmtree(os.path.dirname(tmp), ignore_errors=True)
    return result


@query(
    "q_multimodal_decode_jpeg",
    oracle="""
    -- closed-form replay of the block-uniform JPEG fixture:
    -- pixel(x,y) = 128 + 2*(((3*(x//8) + 5*(y//8) + id) % 50) - 25)
    -- over a (12+id%9) x (12+id%11) grid; DC-only blocks with even
    -- level-shifted values decode EXACTLY at quality 50 (Q00=16)
    WITH ids AS (
        SELECT doc_id AS media_id FROM documents ORDER BY doc_id LIMIT 150
    ), m AS (
        SELECT media_id,
               12 + media_id % 9 AS w, 12 + media_id % 11 AS h
        FROM ids
    )
    SELECT media_id,
           CAST(max(w) AS BIGINT) AS width,
           CAST(max(h) AS BIGINT) AS height,
           'L' AS mode,
           CAST(count(*) AS BIGINT) AS n_bytes,
           CAST(sum(128 + 2 * (((3 * (x.i // 8) + 5 * (y.i // 8)
                                 + media_id) % 50) - 25)) AS BIGINT)
               AS pixel_sum
    FROM m, unnest(range(0, w)) AS x(i), unnest(range(0, h)) AS y(i)
    GROUP BY media_id
    """,
)
def q_multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L5d: REAL lossy-format decode under the oracle. attach_jpeg_media
    # emits actual baseline JFIF bytes (full encoder: DCT, Annex-K
    # quantization, zigzag, DC prediction, canonical Huffman with byte
    # stuffing) and decode_image runs the full inverse chain
    # executor-side. The fixture is block-uniform with even level-shifted
    # values, the one shape where the lossy pipeline is integer-exact
    # (DC-only blocks at quality 50) — so the decoded-pixel aggregate
    # value-hashes against the closed form while the entropy stream still
    # exercises multi-MCU Huffman decode. A decoder that shortcuts the
    # real bitstream cannot reproduce the per-block DC prediction chain.
    # Gradients/color are covered by round-trip-bounded tests
    # (tests/test_multimodal_jpeg.py); PIL is preferred under
    # codec='auto' on clusters that ship it.
    from ..llm.multimodal import attach_jpeg_media, decode_image

    # 150-doc subset: the per-image cost is a PYTHON Huffman decode
    # (~50 ms each — the honest price of a pure-python entropy decoder);
    # the subset keeps the parity sweep proportionate while every
    # bitstream feature is still exercised
    docs = (
        Catalog(spark, sf_dir)
        .documents.select(F.col("doc_id").alias("media_id"))
        .orderBy("media_id")
        .limit(150)
    )
    media = attach_jpeg_media(docs, "media_id")
    return decode_image(media, codec="pure")


@query(
    "q_multimodal_transcode_jpeg",
    oracle="""
    -- JPEG in -> nearest-resize -> PNG out -> decode, replayed via the
    -- pinned source-index formula src = (dst * src_size) // dst_size
    -- over the block-uniform JPEG closed form
    WITH ids AS (
        SELECT doc_id AS media_id FROM documents ORDER BY doc_id LIMIT 150
    ), m AS (
        SELECT media_id,
               12 + media_id % 9 AS w, 12 + media_id % 11 AS h
        FROM ids
    )
    SELECT media_id,
           CAST(10 AS BIGINT) AS width,
           CAST(9 AS BIGINT) AS height,
           'L' AS mode,
           CAST(90 AS BIGINT) AS n_bytes,
           CAST(sum(128 + 2 * (((3 * (((x.i * w) // 10) // 8)
                                 + 5 * (((y.i * h) // 9) // 8)
                                 + media_id) % 50) - 25)) AS BIGINT)
               AS pixel_sum
    FROM m, unnest(range(0, 10)) AS x(i), unnest(range(0, 9)) AS y(i)
    GROUP BY media_id
    """,
)
def q_multimodal_transcode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L5e: cross-codec transcode chain, value-checked end-to-end — real
    # JPEG bytes in (full Huffman/IDCT decode), nearest-neighbor resize,
    # re-encode to PNG (the normalize-to-lossless shape vision training
    # shards use: resampling destroys 8x8-block alignment, so a lossy
    # re-encode would forfeit exactness), final decode must reproduce
    # exactly the source pixels the pinned index formula selects from
    # the block-uniform JPEG closed form. Exercises both codecs' encode
    # AND decode halves in one row.
    from ..llm.multimodal import (
        attach_jpeg_media,
        decode_image,
        resize_encoded_images,
    )

    docs = (
        Catalog(spark, sf_dir)
        .documents.select(F.col("doc_id").alias("media_id"))
        .orderBy("media_id")
        .limit(150)
    )
    media = attach_jpeg_media(docs, "media_id")
    resized = resize_encoded_images(media, width=10, height=9, codec="pure")
    return decode_image(resized, codec="pure")


@query(
    "q_multimodal_resize_png",
    oracle="""
    -- nearest-neighbor with the pinned source formula
    -- src = (dst * src_size) // dst_size over the same gradient fixture
    WITH m AS (
        SELECT doc_id AS media_id,
               8 + doc_id % 5 AS w, 8 + doc_id % 7 AS h
        FROM documents
    )
    SELECT media_id,
           CAST(5 AS BIGINT) AS width,
           CAST(4 AS BIGINT) AS height,
           'L' AS mode,
           CAST(20 AS BIGINT) AS n_bytes,
           CAST(sum((3 * ((x.i * w) // 5) + 5 * ((y.i * h) // 4)
                     + media_id) % 256) AS BIGINT) AS pixel_sum
    FROM m, unnest(range(0, 5)) AS x(i), unnest(range(0, 4)) AS y(i)
    GROUP BY media_id
    """,
)
def q_multimodal_resize_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    # REAL decode -> resize -> re-encode -> decode chain, value-checked:
    # the resized payload is itself a valid PNG, and re-decoding it must
    # reproduce the exact source pixels the pinned nearest-neighbor
    # formula selects from the gradient. Exercises BOTH codec halves
    # twice (encode at attach + after resize, decode before resize +
    # at verify) per row.
    from ..llm.multimodal import (
        attach_png_media,
        decode_image,
        resize_encoded_images,
    )

    docs = Catalog(spark, sf_dir).documents.select(
        F.col("doc_id").alias("media_id")
    )
    media = attach_png_media(docs, "media_id")
    resized = resize_encoded_images(media, width=5, height=4, codec="pure")
    return decode_image(resized, codec="pure")


# --- S9: small-file compaction (OPTIMIZE/rewrite maintenance op) ------------


@query(
    "q_sink_compact",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    """,
)
def q_sink_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S9: fragment orders into 64 small files (the streaming-sink
    # pathology), compact to footer-sized output files, and return the
    # compacted table — the oracle is the ORIGINAL table, so the
    # rewrite is proven lossless. The file-count collapse itself is
    # asserted here (64 -> computed-from-bytes) and covered by
    # tests/test_sources_sinks.py.
    from ..sinks.base import compact_parquet_dir

    o = Catalog(spark, sf_dir).orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="phe_compact_")
    frag = os.path.join(root, "frag")
    out = os.path.join(root, "out")
    o.repartition(64).write.parquet(frag)
    compacted = compact_parquet_dir(
        spark, frag, out, target_file_bytes=32 * 1024 * 1024
    )
    n_in = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    n_out = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_out < n_in, (n_in, n_out)
    return compacted


# --- S10: malformed-record handling (PERMISSIVE scan + dead-letter column) --


@query(
    "q_scan_badrecords",
    oracle="""
    SELECT s_suppkey,
           CASE WHEN s_suppkey % 10 = 0 THEN NULL ELSE s_acctbal END
               AS s_acctbal,
           (s_suppkey % 10 = 0) AS is_corrupt
    FROM supplier
    """,
)
def q_scan_badrecords(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S10: schema-enforced CSV scan under PERMISSIVE mode — the
    # malformed-input contract every production ingest needs pinned:
    # bad rows are not dropped (DROPMALFORMED) and do not kill the job
    # (FAILFAST); the typed column comes back NULL and the raw line is
    # captured in columnNameOfCorruptRecord — the scan-level dead-letter
    # channel (S5's post-scan validation handles semantic badness; this
    # handles rows that don't even parse). The fixture corrupts every
    # suppkey%10==0 acctbal with a non-numeric token, so which rows are
    # corrupt — and that good rows' values survive untouched — is fully
    # oracle-checked against the clean parquet original.
    supp = Catalog(spark, sf_dir).supplier.select("s_suppkey", "s_acctbal")
    root = tempfile.mkdtemp(prefix="phe_badcsv_")
    path = os.path.join(root, "supp.csv")
    rows = supp.collect()  # supplier is dim-sized; fixture gen only
    with open(path, "w") as fh:
        fh.write("s_suppkey,s_acctbal\n")
        for r in sorted(rows, key=lambda r: r.s_suppkey):
            if r.s_suppkey % 10 == 0:
                fh.write(f"{r.s_suppkey},NOT_A_NUMBER\n")
            else:
                fh.write(f"{r.s_suppkey},{r.s_acctbal!r}\n")
    read = (
        spark.read.schema(
            "s_suppkey long, s_acctbal double, _corrupt string"
        )
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )
    return read.select(
        "s_suppkey",
        "s_acctbal",
        F.col("_corrupt").isNotNull().alias("is_corrupt"),
    )


# --- L5c real-codec audio: WAV/PCM16 decode + framing -----------------------


@query(
    "q_multimodal_decode_wav",
    oracle="""
    -- closed-form replay of the PCM fixture: sample(i) =
    -- ((id*31 + i*7) mod 2003) - 1001 over n = 50 + id%20 samples
    WITH m AS (
        SELECT doc_id AS media_id, 50 + doc_id % 20 AS n FROM documents
    )
    SELECT media_id,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(1 AS BIGINT) AS n_channels,
           CAST(max(n) AS BIGINT) AS n_samples,
           CAST(sum((media_id * 31 + i.i * 7) % 2003 - 1001) AS BIGINT)
               AS sample_sum,
           CAST(sum(abs((media_id * 31 + i.i * 7) % 2003 - 1001)) AS BIGINT)
               AS abs_sum
    FROM m, unnest(range(0, n)) AS i(i)
    GROUP BY media_id
    """,
)
def q_multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L5c: REAL audio decode under the oracle — attach_wav_media emits
    # actual RIFF/WAVE PCM16 bytes (stdlib encoder), decode_audio parses
    # header chunks and unpacks little-endian int16 samples executor-
    # side in Arrow batches, and the decoded-sample aggregates must
    # match the closed-form waveform. The audio sibling of
    # q_multimodal_decode_png.
    from ..llm.multimodal import attach_wav_media, decode_audio

    docs = Catalog(spark, sf_dir).documents.select(
        F.col("doc_id").alias("media_id")
    )
    return decode_audio(attach_wav_media(docs, "media_id"))


@query(
    "q_multimodal_frames_wav",
    oracle="""
    -- full 16-sample frames hopping by 8: frame j covers [8j, 8j+16)
    WITH m AS (
        SELECT doc_id AS media_id, 50 + doc_id % 20 AS n FROM documents
    ), frames AS (
        SELECT media_id, n, CAST(j.j AS BIGINT) AS frame_idx
        FROM m, unnest(range(0, (n - 16) // 8 + 1)) AS j(j)
        WHERE n >= 16
    )
    SELECT media_id, frame_idx,
           CAST(frame_idx * 8 AS BIGINT) AS start_sample,
           CAST(sum((media_id * 31 + (frame_idx * 8 + k.k) * 7) % 2003
                    - 1001) AS BIGINT) AS frame_sum
    FROM frames, unnest(range(0, 16)) AS k(k)
    GROUP BY media_id, frame_idx
    """,
)
def q_multimodal_frames_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L5c: decode -> fixed-length analysis frames (the STFT framing
    # convention: full 16-sample windows, hop 8) as a 1:N row-expanding
    # mapInPandas — the real-codec upgrade of q_multimodal_frames'
    # metadata-driven expansion, with per-frame sample sums value-
    # checked against the closed-form waveform.
    from ..llm.multimodal import attach_wav_media, frame_audio

    docs = Catalog(spark, sf_dir).documents.select(
        F.col("doc_id").alias("media_id")
    )
    return frame_audio(
        attach_wav_media(docs, "media_id"), frame_len=16, hop=8
    )


# --- L5f real-codec path: AVI video decode / frame sampling -----------------


@query(
    "q_multimodal_decode_avi",
    oracle="""
    -- closed-form replay of the video fixture: pixel(x,y,f) =
    -- (3x + 5y + 11f + id) mod 256 over (8+id%5) x (6+id%7) x (4+id%4);
    -- decoded bytes are 24-bit B=G=R, so sums carry a factor 3, and the
    -- position-weighted checksum pins stride-strip / row-flip / frame
    -- order (see llm/multimodal.decode_video)
    WITH m AS (
        SELECT doc_id AS media_id, 8 + doc_id % 5 AS w,
               6 + doc_id % 7 AS h, 4 + doc_id % 4 AS nf
        FROM documents
    )
    SELECT media_id,
           CAST(max(w) AS BIGINT) AS width,
           CAST(max(h) AS BIGINT) AS height,
           CAST(max(nf) AS BIGINT) AS n_frames,
           CAST(40 AS BIGINT) AS frame_ms,
           CAST(3 * sum((3 * x.i + 5 * y.i + 11 * f.i + media_id) % 256)
                AS BIGINT) AS pixel_sum,
           CAST(3 * sum((x.i + 2 * y.i + 3 * f.i) *
                        ((3 * x.i + 5 * y.i + 11 * f.i + media_id) % 256))
                AS BIGINT) AS weighted_sum
    FROM m, unnest(range(0, w)) AS x(i), unnest(range(0, h)) AS y(i),
         unnest(range(0, nf)) AS f(i)
    GROUP BY media_id
    """,
)
def q_multimodal_decode_avi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L5f: REAL video decode under the oracle — attach_avi_media emits
    # actual RIFF/AVI containers (avih/strh/strf headers, bottom-up
    # stride-padded 24-bit DIB '00db' frames, idx1 index; stdlib
    # encoder, llm/avi_codec.py), decode_video chunk-walks the
    # container and reconstructs top-down RGB frames executor-side in
    # Arrow batches. pixel_sum checks the byte multiset; weighted_sum
    # (position-weighted) additionally pins padding strip, row flip,
    # and frame order. Closes the last stub-only modality (video) —
    # reference has no media at all (SURVEY.md L5 family).
    from ..llm.multimodal import attach_avi_media, decode_video

    docs = Catalog(spark, sf_dir).documents.select(
        F.col("doc_id").alias("media_id")
    )
    return decode_video(attach_avi_media(docs, "media_id"))


@query(
    "q_multimodal_frames_avi",
    oracle="""
    -- every 2nd frame of each video, re-encoded as a grayscale PNG
    -- image shard and then IMAGE-decoded: pixel_sum is the plain gray
    -- sum (mode 'L', no x3) of frame f at (3x + 5y + 11f + id) mod 256
    WITH m AS (
        SELECT doc_id AS media_id, 8 + doc_id % 5 AS w,
               6 + doc_id % 7 AS h, 4 + doc_id % 4 AS nf
        FROM documents
    ), sampled AS (
        SELECT media_id, w, h, CAST(f.i AS BIGINT) AS frame_idx
        FROM m, unnest(range(0, nf)) AS f(i)
        WHERE f.i % 2 = 0
    )
    SELECT media_id, frame_idx,
           CAST(frame_idx * 40 AS BIGINT) AS frame_ts_ms,
           CAST(max(w) AS BIGINT) AS width,
           CAST(max(h) AS BIGINT) AS height,
           CAST(sum((3 * x.i + 5 * y.i + 11 * frame_idx + media_id) % 256)
                AS BIGINT) AS pixel_sum
    FROM sampled, unnest(range(0, w)) AS x(i), unnest(range(0, h)) AS y(i)
    GROUP BY media_id, frame_idx
    """,
)
def q_multimodal_frames_avi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L5f: the video-to-image-shard pipeline, whole chain value-hashed —
    # AVI decode -> sample every 2nd frame -> LOSSLESS PNG re-encode
    # (sample_video_frames) -> the SAME decode_image operator the image
    # queries use. Sampled-frame rows carry a composite id through the
    # image decoder (media_id*16 + frame_idx; n_frames <= 7 < 16) and
    # split back after, so one mapInPandas chain checks the AVI
    # decoder's frame selection, the PNG encoder's output, and the PNG
    # decoder's pixels in a single oracle. This is the normalize-to-
    # lossless shape vision training shards use (cf. L5e transcode).
    from ..llm.multimodal import (
        attach_avi_media,
        decode_image,
        sample_video_frames,
    )

    docs = Catalog(spark, sf_dir).documents.select(
        F.col("doc_id").alias("media_id")
    )
    frames = sample_video_frames(
        attach_avi_media(docs, "media_id"), every_n=2
    )
    shards = frames.select(
        (F.col("media_id") * 16 + F.col("frame_idx")).alias("fid"),
        "payload",
    )
    decoded = decode_image(shards, id_col="fid", codec="pure")
    return decoded.select(
        (F.col("fid") / 16).cast("long").alias("media_id"),
        F.pmod(F.col("fid"), F.lit(16)).cast("long").alias("frame_idx"),
        (F.pmod(F.col("fid"), F.lit(16)) * 40).cast("long").alias("frame_ts_ms"),
        "width",
        "height",
        "pixel_sum",
    )


# --- S11: version retention vacuum on the MERGE table -----------------------


@query(
    "q_sink_vacuum",
    oracle="""
    WITH fixed AS (
        SELECT c_custkey, c_name,
               CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) / 100.0 AS bal
        FROM customer
    )
    SELECT c_custkey, c_name,
           CASE WHEN c_custkey % 7 = 0 THEN bal + 100.0 ELSE bal END
               AS c_acctbal
    FROM fixed
    WHERE c_custkey % 13 <> 0
    """,
)
def q_sink_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S11: the retention half of table maintenance (S9 compacts files,
    # this expires history): init -> merge updates -> merge deletes
    # leaves three versions on disk; vacuum(keep_last=1) must remove
    # exactly the two superseded ones — asserted by version number —
    # while the surviving current version still reads back the correct
    # merged state, which the oracle recomputes relationally. Time
    # travel (L20 CDC diffs) and vacuum are the two sides of the
    # version-directory trade: history for storage.
    from ..sinks.merge import MergeSink, _versions

    c = Catalog(spark, sf_dir).customer.select(
        "c_custkey",
        "c_name",
        (fixed_cents(F.col("c_acctbal")) / 100.0).alias("c_acctbal"),
    )
    sink = MergeSink(
        os.path.join(tempfile.mkdtemp(prefix="phe_vac_"), "customers"),
        key="c_custkey",
    )
    sink.init(c)
    updates = c.filter(F.col("c_custkey") % 7 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 100.0
    )
    sink.merge(spark, updates)
    deletes = c.filter(F.col("c_custkey") % 13 == 0).select("c_custkey")
    sink.merge(spark, c.limit(0), deletes=deletes)
    assert _versions(sink.path) == [1, 2, 3]
    removed = sink.vacuum(keep_last=1)
    assert removed == [1, 2], removed
    assert _versions(sink.path) == [3]
    return sink.read(spark)


# --- S12: dynamic partition overwrite (touched partitions only) -------------


@query(
    "q_sink_dynamic_overwrite",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderstatus = 'F'
                THEN CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) + 777
                ELSE CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
           END AS total_cents
    FROM orders
    """,
)
def q_sink_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S12: partitionOverwriteMode=dynamic — mode("overwrite") replaces
    # ONLY the partitions present in the incoming frame instead of
    # truncating the whole table (the static default that silently
    # deletes every other partition — the classic warehouse footgun).
    # The restated 'F' partition lands; 'O'/'P' survive byte-identical
    # (asserted on the physical files). The oracle recomputes the
    # expected post-overwrite state from the source table.
    o = Catalog(spark, sf_dir).orders.select(
        "o_orderkey",
        "o_orderstatus",
        fixed_cents(F.col("o_totalprice")).alias("total_cents"),
    )
    path = os.path.join(tempfile.mkdtemp(prefix="phe_dynow_"), "orders")
    o.write.partitionBy("o_orderstatus").parquet(path)

    def partition_files(status: str) -> dict[str, int]:
        d = os.path.join(path, f"o_orderstatus={status}")
        return {
            f: os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before_o = partition_files("O")
    restated = o.filter(F.col("o_orderstatus") == "F").withColumn(
        "total_cents", F.col("total_cents") + 777
    )
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        restated.write.mode("overwrite").partitionBy(
            "o_orderstatus"
        ).parquet(path)
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", old_mode
        )
    assert partition_files("O") == before_o, "untouched partition rewritten"
    return spark.read.parquet(path).select(
        "o_orderkey", "o_orderstatus", "total_cents"
    )


# --- S13: provenance via hidden file-metadata columns -----------------------


@query(
    "q_scan_provenance",
    oracle="""
    SELECT o_orderkey, 'orders.parquet' AS src_file
    FROM orders
    """,
)
def q_scan_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S13: ingest provenance from the scan itself — Spark's hidden
    # _metadata struct (file_path/file_name/file_size/...) is the
    # zero-cost way to stamp every row with its source file at 100 TB
    # (vs a per-file loop or input_file_name()'s whole-plan quirks);
    # the column materializes from the scan's split info, no extra IO.
    # Deterministic here because each fixture table is one file; the
    # oracle pins the basename.
    o = spark.read.parquet(f"{sf_dir.rstrip('/')}/orders.parquet")
    return o.select(
        "o_orderkey", F.col("_metadata.file_name").alias("src_file")
    )
