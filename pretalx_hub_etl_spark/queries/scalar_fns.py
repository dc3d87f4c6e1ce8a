"""Scalar-function declared queries (SURVEY.md §2.8, F1-F10).

Each pins the exact semantics surveyed from the reference (notably the F4
``find(...) > 0`` off-by-one and the F2 conditional-plural formatting) while
staying entirely inside built-in JVM expressions / whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions import found_after_first, strict_map_lookup
from ..functions.core import fixed_point
from . import query

# --- F1/F3: string functions ------------------------------------------------


@query(
    "q_fn_string",
    oracle="""
    SELECT c_custkey,
           lower(c_name) AS name_lower,
           upper(c_mktsegment) AS seg_upper,
           CAST(length(c_name) AS BIGINT) AS name_len,
           substr(c_name, 1, 8) AS name_prefix,
           trim(c_name || '  ') AS name_trimmed,
           c_name || '/' || c_mktsegment AS name_seg
    FROM customer
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.trim(F.concat(F.col("c_name"), F.lit("  "))).alias("name_trimmed"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("name_seg"),
    )


# --- F2: conditional-plural label (reference main.py:125-127) ---------------


@query(
    "q_fn_format_concat",
    oracle="""
    SELECT n_name,
           'Customer' || CASE WHEN count(*) = 1 THEN '' ELSE 's' END || ': '
               || string_agg(c_name, ', ' ORDER BY c_name) AS member_label,
           count(*) AS n_members
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_fn_format_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    grouped = (
        cat.customer.join(
            F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("n_name")
        .agg(
            F.sort_array(F.collect_list("c_name")).alias("names"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )
    label = F.concat(
        F.lit("Customer"),
        F.when(F.size("names") == 1, F.lit("")).otherwise(F.lit("s")),
        F.lit(": "),
        F.concat_ws(", ", "names"),
    )
    return grouped.select("n_name", label.alias("member_label"), "n_members")


# --- F4: substring search with the reference's `> 0` off-by-one -------------


@query(
    "q_fn_substring_search",
    oracle="""
    SELECT doc_id,
           CAST(strpos(lower(text), 'merge') AS BIGINT) AS pos,
           strpos(lower(text), 'merge') > 1 AS found_after_first
    FROM documents
    """,
)
def q_fn_substring_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select(
        "doc_id",
        F.locate("merge", F.lower(F.col("text"))).cast("long").alias("pos"),
        found_after_first("text", "merge").alias("found_after_first"),
    )


# --- F5: timestamp parse with tz offset (reference %z, main.py:128) ---------


@query(
    "q_fn_timestamp_parse",
    oracle="""
    SELECT o_orderkey,
           CAST(floor(epoch(strptime(
               strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') || '+01:00',
               '%Y-%m-%dT%H:%M:%S%z'))) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def q_fn_timestamp_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    stamped = F.concat(
        F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss"), F.lit("+01:00")
    )
    parsed = F.to_timestamp(stamped, "yyyy-MM-dd'T'HH:mm:ssXXX")
    return o.select(
        "o_orderkey", F.unix_timestamp(parsed).cast("long").alias("epoch_s")
    )


# --- F6: datetime field extraction (reference main.py:221-225) --------------


@query(
    "q_fn_date_extract",
    oracle="""
    SELECT event_id,
           CAST(year(CAST(ts AS TIMESTAMP)) AS BIGINT) AS y,
           CAST(month(CAST(ts AS TIMESTAMP)) AS BIGINT) AS mo,
           CAST(day(CAST(ts AS TIMESTAMP)) AS BIGINT) AS d,
           CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS h,
           CAST(minute(CAST(ts AS TIMESTAMP)) AS BIGINT) AS mi,
           CAST(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) AS BIGINT) AS day_bucket
    FROM events
    """,
)
def q_fn_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return e.select(
        "event_id",
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("mo"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.minute("ts").cast("long").alias("mi"),
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).cast("long").alias("day_bucket"),
    )


# --- F7: array functions (reference array ops, main.py:123,126,137) ---------


@query(
    "q_fn_array",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           list_extract(string_split(text, ' '), 1) AS first_word,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           array_to_string(string_split(text, ' ')[1:3], '|') AS first3
    FROM documents
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.concat_ws("|", F.slice(words, 1, 3)).alias("first3"),
    )


# --- F8: map functions (oracle: CASE mapping — the output is scalar) --------


@query(
    "q_fn_map",
    oracle="""
    SELECT n_nationkey,
           CASE n_regionkey
               WHEN 0 THEN 'Room Zero'
               WHEN 1 THEN 'Room One'
               WHEN 2 THEN 'Room Two'
               WHEN 3 THEN 'Room Three'
               WHEN 4 THEN 'Room Four'
           END AS room_name
    FROM nation
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    # strict_map_lookup replicates the reference's MAP_ROOMS dict lookup
    # (KeyError-on-miss under ANSI mode; settings.py.template:7-11).
    n = Catalog(spark, sf_dir).nation
    room_map = {0: "Room Zero", 1: "Room One", 2: "Room Two", 3: "Room Three", 4: "Room Four"}
    return n.select(
        "n_nationkey",
        strict_map_lookup(room_map, F.col("n_regionkey")).alias("room_name"),
    )


# --- F9: math ---------------------------------------------------------------


@query(
    "q_fn_math",
    # fixed-point floor-quantization instead of round(): bitwise-identical
    # across engines (see functions.core.fixed_point).
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)
               / 100.0 AS revenue,
           CAST(floor(l_extendedprice * l_tax * 100.0 + 0.5) AS BIGINT)
               / 100.0 AS tax_amt,
           CAST(floor(sqrt(l_quantity) * 1000000.0 + 0.5) AS BIGINT)
               / 1000000.0 AS qty_sqrt,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(abs(l_quantity - 25.0) * 100.0 + 0.5) AS BIGINT)
               / 100.0 AS qty_dev
    FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.select(
        "l_orderkey",
        "l_linenumber",
        fixed_point(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        fixed_point(F.col("l_extendedprice") * F.col("l_tax")).alias("tax_amt"),
        fixed_point(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        fixed_point(F.abs(F.col("l_quantity") - 25.0)).alias("qty_dev"),
    )


# --- F10: JSON access (reference JSON-path Extract phase) -------------------


@query(
    "q_fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


# --- F11: regex functions (extract / global replace / match predicate) ------


@query(
    "q_fn_regex",
    oracle=r"""
    SELECT c_custkey,
           regexp_extract(c_name, '#(0*)([0-9]+)$', 2) AS cust_num,
           regexp_replace(c_name, '[aeiou]', '_', 'g') AS consonants,
           regexp_matches(c_name, '^Customer#0{6}') AS low_id
    FROM customer
    """,
)
def q_fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Java regex (Spark) and RE2 (DuckDB) agree on this pattern subset;
    # note DuckDB regexp_replace needs the 'g' flag to match Spark's
    # replace-all semantics.
    c = Catalog(spark, sf_dir).customer
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"#(0*)([0-9]+)$", 2).alias("cust_num"),
        F.regexp_replace("c_name", "[aeiou]", "_").alias("consonants"),
        F.col("c_name").rlike("^Customer#0{6}").alias("low_id"),
    )


# --- A8: collect_list / collect_set (sorted for determinism) ----------------


@query(
    "q_agg_collect",
    oracle="""
    SELECT n_nationkey,
           array_to_string(list_sort(list_distinct(list(c_mktsegment))), '|')
               AS segments,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # collect_set is unordered (partition-dependent): sort_array makes the
    # output deterministic. The sorted array is then serialized to a
    # '|'-joined string because the verify driver canonicalizes results
    # through pandas, where numpy-array cells are unhashable (round-2
    # CORRECTNESS err) — a flat string hashes identically on both sides.
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.join(
            F.broadcast(cat.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_nationkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("c_mktsegment")), "|"
            ).alias("segments"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


# --- F12: ANSI-safe try_* variants (error containment at scale) -------------

_NEAR_MAX = (1 << 63) - 1 - 1000


@query(
    "q_fn_try",
    oracle=f"""
    SELECT c_custkey,
           TRY_CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS cust_num,
           TRY_CAST(c_mktsegment AS BIGINT) AS not_a_number,
           c_acctbal / c_nationkey AS bal_per_nation,
           CASE WHEN c_custkey <= 1000 THEN c_custkey + {_NEAR_MAX} END
               AS near_overflow
    FROM customer
    """,
)
def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The engine runs ANSI mode ON (session.py): bad casts, x/0, and
    # overflow ERROR instead of silently corrupting — but a 100 TB job
    # must also be able to CONTAIN row-level badness without dying, which
    # is what the try_* family is for: failures become NULL, routable to
    # a dead-letter side (validate_split) instead of killing the stage.
    # DuckDB oracles: TRY_CAST is exact; double/0 is NULL there like
    # try_divide here; try_add's overflow->NULL is emulated with a CASE
    # at the known threshold.
    c = Catalog(spark, sf_dir).customer
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)$", 1).try_cast("bigint").alias("cust_num"),
        F.col("c_mktsegment").try_cast("bigint").alias("not_a_number"),
        F.try_divide(F.col("c_acctbal"), F.col("c_nationkey")).alias("bal_per_nation"),
        F.try_add(F.col("c_custkey"), F.lit(_NEAR_MAX)).alias("near_overflow"),
    )


@query(
    "q_fn_variant",
    oracle="""
    WITH j AS (
        SELECT c_custkey,
               json_object(
                   'key', c_custkey,
                   'bal_cents', CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT),
                   'tags', [c_mktsegment, c_name]
               ) AS doc
        FROM customer
    )
    SELECT c_custkey,
           CAST(json_extract(doc, '$.key') AS BIGINT) AS k,
           CAST(json_extract(doc, '$.bal_cents') AS BIGINT) AS bal_cents,
           json_extract_string(doc, '$.tags[0]') AS seg,
           json_extract_string(doc, '$.tags[1]') AS cname,
           CAST(json_extract(doc, '$.missing.path') AS BIGINT) AS absent
    FROM j
    """,
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark 4 VARIANT path: build a semi-structured JSON doc per row,
    # parse_json to the binary VARIANT encoding, then typed path
    # extraction (variant_get) incl. array indexing and a try_ miss ->
    # NULL. Each engine CONSTRUCTS its own doc from the same source
    # values (formatting never crosses engines — only extracted values
    # are compared), so the query value-hashes exactly. VARIANT keeps
    # shredded semi-structured access JVM-side — the scan-fused shape
    # for schema-on-read at scale, vs. regex or per-row Python JSON.
    from ..functions.core import fixed_cents

    c = Catalog(spark, sf_dir).customer
    doc = F.to_json(
        F.struct(
            F.col("c_custkey").alias("key"),
            fixed_cents(F.col("c_acctbal")).alias("bal_cents"),
            F.array(F.col("c_mktsegment"), F.col("c_name")).alias("tags"),
        )
    )
    v = F.parse_json(doc)
    return c.select(
        "c_custkey",
        F.variant_get(v, "$.key", "long").alias("k"),
        F.variant_get(v, "$.bal_cents", "long").alias("bal_cents"),
        F.variant_get(v, "$.tags[0]", "string").alias("seg"),
        F.variant_get(v, "$.tags[1]", "string").alias("cname"),
        F.try_variant_get(v, "$.missing.path", "long").alias("absent"),
    )


# --- F16: URL parsing (web-corpus domain extraction) ------------------------


@query(
    "q_fn_url",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://host' || CAST(doc_id % 7 AS VARCHAR)
               || '.example.org/path/' || CAST(doc_id AS VARCHAR)
               || '?q=' || CAST(doc_id % 3 AS VARCHAR) AS url
        FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?q=([0-9]+)', 1) AS q_param
    FROM u
    """,
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F16: parse_url — the scalar the web-corpus curation family leans
    # on (host extraction feeds L17 per-domain caps and the mixture
    # weights; query-param stripping feeds URL canonicalization before
    # L1 dedup). Spark's parse_url(HOST/PATH/QUERY) against a regexp
    # replay in the oracle, over deterministically synthesized URLs.
    d = Catalog(spark, sf_dir).documents
    url = F.concat(
        F.lit("https://host"),
        F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
        F.lit(".example.org/path/"),
        F.col("doc_id").cast("string"),
        F.lit("?q="),
        F.pmod(F.col("doc_id"), F.lit(3)).cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("q")).alias(
            "q_param"
        ),
    )


# --- F17: edit distance (levenshtein) ---------------------------------------


@query(
    "q_fn_levenshtein",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand
     AND a.p_partkey < b.p_partkey
     AND b.p_partkey - a.p_partkey <= 25
    WHERE levenshtein(a.p_name, b.p_name) <= 12
    """,
)
def q_fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F17: built-in Levenshtein edit distance (JVM-side, no UDF) over a
    # BANDED same-brand self-join — the band keeps candidate pairs
    # linear in the table (the fuzzy-matching rule: never feed an edit
    # distance an unbounded cross product; the symmetric-delete
    # blocking operator llm/fuzzy.py is the scale path when no natural
    # band exists). Both engines implement classic unit-cost
    # Wagner-Fischer, so the distances value-hash exactly.
    # candidate pairs via the bucketized band join (banded_key_edges —
    # a brand-only equi key is 25 values, a quadratic in disguise; the
    # (brand, key-bucket) key's cardinality grows with the table)
    from ..operators.graph import banded_key_edges

    p = Catalog(spark, sf_dir).part.select("p_partkey", "p_brand", "p_name")
    pairs = banded_key_edges(p, "p_partkey", "p_brand", band=25)
    names = p.select("p_partkey", "p_name")
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        pairs.join(
            names.select(
                F.col("p_partkey").alias("u"), F.col("p_name").alias("name_a")
            ),
            "u",
        )
        .join(
            names.select(
                F.col("p_partkey").alias("v"), F.col("p_name").alias("name_b")
            ),
            "v",
        )
        .filter(dist <= 12)
        .select(
            F.col("u").alias("key_a"),
            F.col("v").alias("key_b"),
            dist.cast("int").alias("edit_dist"),
        )
    )


# --- F18: collation-aware comparison (Spark 4 COLLATE) ----------------------


@query(
    "q_fn_collation",
    oracle="""
    WITH mixed AS (
        SELECT c_nationkey,
               CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                    ELSE lower(c_mktsegment) END AS seg
        FROM customer
    )
    SELECT c_nationkey,
           CAST(count(DISTINCT seg) AS BIGINT) AS n_cs,
           CAST(count(DISTINCT lower(seg)) AS BIGINT) AS n_ci
    FROM mixed GROUP BY c_nationkey
    """,
)
def q_fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F18: collation-aware semantics (Spark 4 `collate`): the same
    # distinct-count under binary (UTF8_BINARY, default) vs
    # case-insensitive (UTF8_LCASE) collation, on a mixed-case column
    # synthesized from the segment name. Collation changes the EQUALITY
    # the hash aggregate keys on — no lower() rewrite of the data, the
    # comparison itself is collation-aware (the rewrite IS the oracle:
    # UTF8_LCASE distinct ≡ lower() distinct, which is the property
    # under test). Scale: one map-side-combined distinct per key, same
    # plan as any countDistinct.
    c = Catalog(spark, sf_dir).customer
    mixed = c.select(
        "c_nationkey",
        F.when(
            F.col("c_custkey") % 2 == 0, F.upper(F.col("c_mktsegment"))
        )
        .otherwise(F.lower(F.col("c_mktsegment")))
        .alias("seg"),
    )
    return mixed.groupBy("c_nationkey").agg(
        F.count_distinct(F.col("seg")).cast("long").alias("n_cs"),
        F.count_distinct(F.collate(F.col("seg"), "UTF8_LCASE"))
        .cast("long")
        .alias("n_ci"),
    )
