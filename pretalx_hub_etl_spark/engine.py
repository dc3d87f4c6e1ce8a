"""Engine facade: one handle for session + catalog + SQL (SURVEY.md §3.4).

The engine writes no planner — ``Engine.sql`` hands straight to Spark SQL /
Catalyst; named transforms compose with ``DataFrame.transform``. This class
just bundles the session config baseline, the fixed-schema catalog, and
view registration so a user's whole program is:

    eng = Engine.local(sf_dir)
    eng.sql("SELECT ... FROM lineitem JOIN orders ...")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import TABLES, Catalog
from .session import ensure_engine_conf, get_spark


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str, register: bool = True):
        self.spark = ensure_engine_conf(spark)
        self.catalog = Catalog(spark, sf_dir)
        if register:
            self.catalog.register_views()

    @classmethod
    def local(cls, sf_dir: str, app_name: str = "pretalx-hub-etl-spark") -> Engine:
        return cls(get_spark(app_name), sf_dir)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        return self.catalog.table(name)

    @property
    def tables(self) -> tuple[str, ...]:
        return TABLES
