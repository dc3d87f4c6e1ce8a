"""SQL catalog for the lakehouse tables: named views + VERSION AS OF.

The engine API serves programmatic users (`MergeSink.read_pruned`,
`MorTable.read(as_of=...)`); this layer is the SQL face a warehouse user
expects (VERDICT r10 item 1):

    cat = LakehouseSqlCatalog(spark)
    cat.register_cow("orders_t", "/data/orders_t")
    cat.register_mor("cust_t", "/data/cust_t", key="c_custkey")
    cat.sql("SELECT * FROM orders_t VERSION AS OF 2 WHERE o_orderkey < 9")

Resolution model (the "thin view-generation" shape the real formats
implement inside their catalogs):

- CoW tables resolve through the ``lakehouse`` Python DataSource
  (`sources/lakehouse_ds.py`): a registered DataSourceV2 relation whose
  file list comes from the commit manifests and whose ``pushFilters``
  applies manifest min/max skipping INSIDE the planner — the WHERE
  clause of the SQL text above prunes files before any is opened.
- MoR tables cannot be a per-file relation (latest-wins needs a key
  shuffle), so they resolve to a GENERATED TEMP VIEW over
  ``MorTable.read`` — the same union + window plan the engine API
  serves, reachable from plain SQL.
- ``<table> VERSION AS OF <n>`` is rewritten before parsing to a
  version-pinned view (``<table>__asof_<n>``), created on demand from
  the same reader with ``version``/``as_of`` pinned. Real formats do
  this rewrite in the parser; a Python-level engine does it one step
  earlier — same observable SQL.

Freshness: every ``sql()`` call re-registers the views of the tables it
mentions, so each query sees the table's CURRENT committed version
(catalog semantics), while version-pinned views are immutable by
construction.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_ASOF_RE = re.compile(
    r"\b([A-Za-z_][A-Za-z0-9_]*)\s+VERSION\s+AS\s+OF\s+(\d+)\b",
    re.IGNORECASE,
)


class LakehouseSqlCatalog:
    """Session-scoped SQL namespace over CoW/MoR lakehouse tables."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, tuple[str, str, str | None]] = {}
        from ..sources.lakehouse_ds import register

        register(spark)

    def register_cow(self, name: str, path: str) -> None:
        self._tables[name] = ("cow", path, None)

    def register_mor(self, name: str, path: str, key: str) -> None:
        self._tables[name] = ("mor", path, key)

    def _frame(self, name: str, version: int | None) -> DataFrame:
        kind, path, key = self._tables[name]
        if kind == "cow":
            r = self.spark.read.format("lakehouse").option("path", path)
            if version is not None:
                r = r.option("version", str(version))
            # resolve the schema DRIVER-side (one manifest + one parquet
            # footer) and pass it explicitly: without it Spark spins up
            # a Python worker just to call DataSource.schema() on every
            # load — a whole process round trip for one footer read
            return r.schema(self._cow_schema(path, version)).load()
        from ..sinks.mor import MorTable

        return MorTable(path, key=key).read(self.spark, as_of=version)

    def _cow_schema(self, path: str, version: int | None):
        import os

        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        from ..sinks.manifest import CommitLog

        log = CommitLog(path)
        v = log.current_version() if version is None else version
        files, _ = log.files_for(v)
        if not files:
            raise FileNotFoundError(
                f"lakehouse table at {path} has no data files in v{v}"
            )
        return from_arrow_schema(pq.ParquetFile(files[0]).schema_arrow)

    def _ensure_view(self, name: str, version: int | None) -> str:
        view = name if version is None else f"{name}__asof_{version}"
        self._frame(name, version).createOrReplaceTempView(view)
        return view

    def sql(self, query: str) -> DataFrame:
        """Run SQL against the registered tables. ``VERSION AS OF n``
        after a registered table name time-travels that reference."""

        def _pin(m: re.Match) -> str:
            name, v = m.group(1), int(m.group(2))
            if name not in self._tables:
                raise ValueError(
                    f"VERSION AS OF on unregistered table {name!r}"
                )
            return self._ensure_view(name, v)

        rewritten = _ASOF_RE.sub(_pin, query)
        # current-version views for every registered table the query
        # still mentions (cheap: one manifest resolution per table)
        for name in self._tables:
            if re.search(rf"\b{re.escape(name)}\b", rewritten):
                self._ensure_view(name, None)
        return self.spark.sql(rewritten)
