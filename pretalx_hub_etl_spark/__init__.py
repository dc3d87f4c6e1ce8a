"""pretalx_hub_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the data-processing
capabilities of the reference ETL (3cola/pretalx-hub-etl, surveyed in
SURVEY.md), generalized into a reusable engine:

- ``session``    — SparkSession factory with the engine's config baseline
                   (ANSI on, UTC, AQE on — SURVEY.md §4.3).
- ``catalog``    — schema registry + parquet table loading for the test
                   corpus (TESTDATA.md) and temp-view registration.
- ``functions``  — scalar expression helpers pinning the reference's exact
                   semantics (falsy-coalesce, `find() > 0` off-by-one, ...).
- ``operators``  — relational operators: projections, joins (incl.
                   first-match and range joins), aggregations, windows,
                   sorts, set ops, and the reconcile/merge planner that is
                   the reference's whole Transform phase as one query.
- ``sources``    — JSON document normalization, paginated REST source
                   (parallel page fetch), parquet scan helpers.
- ``sinks``      — Sink interface with parquet / collecting-mock
                   implementations + predicate-based dead-letter split.
- ``streaming``  — tumbling / sliding / session windows and watermark-style
                   late-data filtering (batch-first, streaming variants).
- ``llm``        — LLM-data-pipeline operators: dedup (exact / MinHash-LSH /
                   SimHash), similarity search, text analysis, multimodal
                   column plumbing.

Everything is built on the public PySpark DataFrame/SQL API; no custom
Catalyst rules are needed (SURVEY.md §4.2).
"""

__version__ = "0.1.0"
