"""Table catalog for the synthetic corpus (TESTDATA.md / FIXTURES.md §A).

Fixed, explicit schemas per source (SURVEY.md §1.3): schema-on-read inference
is a full extra scan at 100 TB, so every table is loaded with the parquet
footer schema it was written with, plus engine-level normalization:

- ``events.ts`` is stored as parquet TIMESTAMP(NANOS); Spark reads it as
  int64 nanos (``spark.sql.legacy.parquet.nanosAsLong``) and the catalog
  projects it to microsecond TimestampType (Spark's native precision) in one
  vectorized expression — the scan itself stays native/columnar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import ensure_engine_conf

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class Catalog:
    """Lazy parquet-table loader rooted at one scale-factor directory.

    ``Catalog(spark, "/root/testdata/sf0.01").lineitem`` returns the
    DataFrame; ``register_views()`` exposes every table to ``spark.sql``.
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = ensure_engine_conf(spark)
        self.sf_dir = sf_dir.rstrip("/")
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; known: {TABLES}")
        if name not in self._cache:
            df = self.spark.read.parquet(f"{self.sf_dir}/{name}.parquet")
            if name == "events" and dict(df.dtypes).get("ts") == "bigint":
                # int64 nanos -> microsecond timestamp (lossless for this
                # corpus, which is generated at microsecond precision).
                # Integer `div`, NOT `/`: float division of int64 nanos
                # (~1.7e18 > 2^53) loses the low bits and lands ±1 µs off.
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            self._cache[name] = df
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self) -> None:
        for name in TABLES:
            self.table(name).createOrReplaceTempView(name)
