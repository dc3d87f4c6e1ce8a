"""Python DataSource API (Spark 4) form of the paginated source (S2).

``read_paginated`` (paginated.py) expresses page-parallel fetching as a
``mapInPandas`` over a page-id range. Spark 4's Python DataSource API is
the first-class form of the same idea: the source itself tells Spark its
partitioning (one ``InputPartition`` per page), so page fetches ARE the
scan tasks — no seed DataFrame, and the source composes with
``spark.read.format(...)`` like any built-in.

``paged_parquet`` reads a parquet file as a paginated collection keyed by
a monotonically increasing integer column (the test corpus's primary
keys): each partition serves one ``[lo, hi)`` key page via pyarrow
row-group pruning — row groups whose footer min/max statistics miss the
page are never decoded, the same skipping a real REST backend does with
its index. Arrow RecordBatches cross the Python/JVM boundary (the fast
path), never per-row tuples.

At 100 TB the same class wraps the HTTP fetcher (http_page_fetcher) —
partitions stay "one page each", only ``read`` changes.

SHIPPING CONSTRAINT (driver-contract, caught by plain-session
emulation): Spark pickles the DataSource class — and later the reader —
into dedicated Python workers (``create_data_source`` /
``plan_data_source_read``), which do NOT share the driver's ``sys.path``
additions. A module-level class pickles BY REFERENCE and those workers
then fail with ModuleNotFoundError when the engine is used as a
path-injected library rather than an installed package. The classes are
therefore built inside :func:`build_paged_parquet_source` — local
classes cloudpickle BY VALUE, and every helper they call is either
inlined or imported from installed libraries (pyarrow, pyspark) at call
time.
"""

from __future__ import annotations


def build_paged_parquet_source():
    """The ``paged_parquet`` DataSource class, built as a LOCAL class so
    cloudpickle ships it by value (see module docstring)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )
    from pyspark.sql.types import StructType

    class _PagePartition(InputPartition):
        def __init__(self, lo: int, hi: int):
            self.lo = lo
            self.hi = hi

    class _PagedParquetReader(DataSourceReader):
        def __init__(self, options, columns):
            self.path = options["path"]
            self.key = options["key"]
            self.page_size = int(options.get("page_size", "1000"))
            self.columns = columns

        def partitions(self):
            # plan pages from FOOTER statistics only (never a data
            # scan): [0, upper) sliced into page_size key ranges. The
            # upper-bound logic mirrors paginated.parquet_key_upper_bound,
            # inlined because this method runs in the planning worker.
            import pyarrow.parquet as pq

            meta = pq.ParquetFile(self.path).metadata
            idx = meta.schema.names.index(self.key)
            hi = None
            for rg in range(meta.num_row_groups):
                stats = meta.row_group(rg).column(idx).statistics
                if stats is None or not stats.has_min_max:
                    raise ValueError(
                        f"no min/max statistics for {self.key!r}"
                        f" in {self.path}"
                    )
                hi = stats.max if hi is None else max(hi, stats.max)
            upper = 0 if hi is None else int(hi) + 1
            return [
                _PagePartition(lo, min(lo + self.page_size, upper))
                for lo in range(0, upper, self.page_size)
            ]

        def read(self, partition):
            # executor-side: decode only row groups whose min/max
            # overlap the page, then slice the exact key range; emit
            # Arrow RecordBatches
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            pf = pq.ParquetFile(self.path)
            idx = pf.metadata.schema.names.index(self.key)
            groups = []
            for rg in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(rg).column(idx).statistics
                if st is None or st.min is None:
                    groups.append(rg)  # no stats -> cannot prune
                elif st.min < partition.hi and st.max >= partition.lo:
                    groups.append(rg)
            if not groups:
                return
            tbl = pf.read_row_groups(groups, columns=self.columns)
            mask = pc.and_(
                pc.greater_equal(tbl[self.key], partition.lo),
                pc.less(tbl[self.key], partition.hi),
            )
            for batch in tbl.filter(mask).to_batches():
                yield batch

    class PagedParquetDataSource(DataSource):
        """``spark.read.format("paged_parquet")`` with options:

        - ``path``: parquet file
        - ``key``: integer pagination key column
        - ``page_size``: rows-per-page in KEY units (pages are key ranges)
        - ``columns`` (optional): comma-separated projection
        """

        @classmethod
        def name(cls) -> str:
            return "paged_parquet"

        def schema(self):
            import pyarrow as pa
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import from_arrow_schema

            sch = pq.ParquetFile(self.options["path"]).schema_arrow
            cols = self._columns()
            if cols:
                sch = pa.schema([sch.field(c) for c in cols])
            return from_arrow_schema(sch)

        def _columns(self):
            cols = self.options.get("columns")
            return [c.strip() for c in cols.split(",")] if cols else None

        def reader(self, schema: StructType) -> DataSourceReader:
            return _PagedParquetReader(self.options, self._columns())

        def simpleStreamReader(self, schema: StructType):
            return _PagedParquetStreamReader(self.options, self._columns())

    class _PagedParquetStreamReader(SimpleDataSourceStreamReader):
        """ST10: the STREAMING form of the paged source — one key page
        per microbatch, offset = the next page's lower bound.

        ``SimpleDataSourceStreamReader`` is the prefetch-on-driver tier
        of Spark 4's Python streaming source API: ``read(start)`` hands
        back (rows, nextOffset) and the engine persists the batch for
        replay; ``readBetweenOffsets`` re-serves a committed range after
        restart. Right for control-plane-sized pages (an HTTP cursor, a
        CDC ledger); the partition-parallel ``DataSourceStreamReader``
        tier is the 100 TB path and shares this offset scheme. When the
        page range is exhausted, ``read`` returns an empty batch with an
        unchanged offset — "no data available", which lets
        ``processAllAvailable`` terminate.
        """

        def __init__(self, options, columns):
            self.path = options["path"]
            self.key = options["key"]
            self.page_size = int(options.get("page_size", "1000"))
            self.columns = columns
            self._upper = None

        def _upper_bound(self) -> int:
            if self._upper is None:
                import pyarrow.parquet as pq

                meta = pq.ParquetFile(self.path).metadata
                idx = meta.schema.names.index(self.key)
                hi = None
                for rg in range(meta.num_row_groups):
                    st = meta.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        raise ValueError(
                            f"no min/max statistics for {self.key!r}"
                        )
                    hi = st.max if hi is None else max(hi, st.max)
                self._upper = 0 if hi is None else int(hi) + 1
            return self._upper

        def initialOffset(self) -> dict:
            return {"lo": 0}

        def _page_rows(self, lo: int, hi: int):
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            pf = pq.ParquetFile(self.path)
            idx = pf.metadata.schema.names.index(self.key)
            groups = []
            for rg in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(rg).column(idx).statistics
                if st is None or st.min is None:
                    groups.append(rg)
                elif st.min < hi and st.max >= lo:
                    groups.append(rg)
            if not groups:
                return iter([])
            tbl = pf.read_row_groups(groups, columns=self.columns)
            mask = pc.and_(
                pc.greater_equal(tbl[self.key], lo),
                pc.less(tbl[self.key], hi),
            )
            # a LIST ITERATOR, not a generator: the engine both calls
            # next() on it (empty-batch validation) and pickles it into
            # the prefetch cache for replay — list_iterator supports both
            return iter(
                [tuple(r.values()) for r in tbl.filter(mask).to_pylist()]
            )

        def read(self, start: dict):
            lo = int(start["lo"])
            upper = self._upper_bound()
            if lo >= upper:
                return iter([]), {"lo": lo}  # exhausted: no new data
            hi = min(lo + self.page_size, upper)
            return self._page_rows(lo, hi), {"lo": hi}

        def readBetweenOffsets(self, start: dict, end: dict):
            return self._page_rows(int(start["lo"]), int(end["lo"]))

        def commit(self, end: dict) -> None:
            pass  # nothing upstream to acknowledge for a parquet page

    return PagedParquetDataSource


def build_paged_parquet_parallel_source():
    """ST10b: the partition-parallel ``DataSourceStreamReader`` tier —
    the "100 TB path" the SimpleDataSourceStreamReader docstring names.

    The simple tier prefetches every microbatch ON THE DRIVER (one
    ``read(start)`` call returning rows), which is right for
    control-plane-sized pages and wrong for data-plane volume: one
    Python process serializes the whole batch. This tier splits each
    microbatch's offset range into one ``InputPartition`` PER PAGE, so
    Spark schedules the page reads as parallel executor tasks — the
    driver only plans offsets. Admission control (the
    maxRecordsPerBatch/maxFilesPerTrigger shape): ``latestOffset``
    advances at most ``max_pages_per_batch`` pages past the committed
    offset, so a backlog drains in bounded microbatches instead of one
    giant batch — backpressure by offset arithmetic, no data touched.
    Replay after restart needs no extra machinery: ``partitions(start,
    end)`` + ``read`` re-derive any committed range deterministically
    from the immutable parquet file (same contract readBetweenOffsets
    serves in the simple tier). Built as LOCAL classes for the same
    pickle-by-value shipping constraint as ``build_paged_parquet_source``.
    """
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )
    from pyspark.sql.types import StructType

    class _PagePartition(InputPartition):
        def __init__(self, lo: int, hi: int):
            self.lo = lo
            self.hi = hi

    class _ParallelPagedStreamReader(DataSourceStreamReader):
        def __init__(self, options, columns):
            self.path = options["path"]
            self.key = options["key"]
            self.page_size = int(options.get("page_size", "1000"))
            self.max_pages = int(options.get("max_pages_per_batch", "2"))
            self.columns = columns
            self._upper = None
            self._cursor = 0  # last offset handed out by latestOffset

        def _upper_bound(self) -> int:
            if self._upper is None:
                import pyarrow.parquet as pq

                meta = pq.ParquetFile(self.path).metadata
                idx = meta.schema.names.index(self.key)
                hi = None
                for rg in range(meta.num_row_groups):
                    st = meta.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        raise ValueError(
                            f"no min/max statistics for {self.key!r}"
                        )
                    hi = st.max if hi is None else max(hi, st.max)
                self._upper = 0 if hi is None else int(hi) + 1
            return self._upper

        def initialOffset(self) -> dict:
            return {"lo": 0}

        def latestOffset(self) -> dict:
            # admission control: advance <= max_pages pages per batch
            upper = self._upper_bound()
            nxt = min(
                self._cursor + self.max_pages * self.page_size, upper
            )
            self._cursor = nxt
            return {"lo": nxt}

        def partitions(self, start: dict, end: dict):
            lo, hi = int(start["lo"]), int(end["lo"])
            # restart recovery: a fresh reader's cursor starts at 0, and
            # the engine does NOT replay commit() for already-committed
            # batches — it DOES, however, re-plan the checkpointed batch
            # through this method, and any range it asks for was
            # previously reported available, so advancing the admission
            # cursor to >= end never fabricates data. Without this, the
            # first post-restart latestOffset returns <= the committed
            # offset and the engine concludes the source is drained
            # (observed: restart served page 0 only).
            self._cursor = max(self._cursor, hi)
            # one scan task per page: THIS is the parallel tier
            return [
                _PagePartition(p, min(p + self.page_size, hi))
                for p in range(lo, hi, self.page_size)
            ] or [_PagePartition(lo, lo)]

        def read(self, partition):
            # executor-side, Arrow batches across the boundary;
            # row-group pruning identical to the batch reader
            if partition.lo >= partition.hi:
                return
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            pf = pq.ParquetFile(self.path)
            idx = pf.metadata.schema.names.index(self.key)
            groups = []
            for rg in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(rg).column(idx).statistics
                if st is None or st.min is None:
                    groups.append(rg)
                elif st.min < partition.hi and st.max >= partition.lo:
                    groups.append(rg)
            if not groups:
                return
            tbl = pf.read_row_groups(groups, columns=self.columns)
            mask = pc.and_(
                pc.greater_equal(tbl[self.key], partition.lo),
                pc.less(tbl[self.key], partition.hi),
            )
            for batch in tbl.filter(mask).to_batches():
                yield batch

        def commit(self, end: dict) -> None:
            # resume-after-restart: Spark replays from its checkpoint log,
            # so the reader only needs its cursor not to regress
            self._cursor = max(self._cursor, int(end["lo"]))

    class ParallelPagedParquetDataSource(DataSource):
        """``spark.readStream.format("paged_parquet_par")`` — options as
        ``paged_parquet`` plus ``max_pages_per_batch`` (admission cap)."""

        @classmethod
        def name(cls) -> str:
            return "paged_parquet_par"

        def schema(self):
            import pyarrow as pa
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import from_arrow_schema

            sch = pq.ParquetFile(self.options["path"]).schema_arrow
            cols = self._columns()
            if cols:
                sch = pa.schema([sch.field(c) for c in cols])
            return from_arrow_schema(sch)

        def _columns(self):
            cols = self.options.get("columns")
            return [c.strip() for c in cols.split(",")] if cols else None

        def streamReader(self, schema: StructType):
            return _ParallelPagedStreamReader(self.options, self._columns())

    return ParallelPagedParquetDataSource


def register(spark) -> None:
    """Idempotently register the sources on THIS session.

    ``newSession`` children do NOT inherit the parent's registration
    (each session owns a fresh DataSourceManager), and Spark 4.1's
    ``dataSource.register`` refuses a name any OTHER session holds —
    ``sources/registry.py`` documents the asymmetry and registers
    directly into this session's manager, so the source is resolvable
    here no matter what sibling sessions did. A session-local sentinel
    skips the (cheap) existence probes after the first call."""
    if getattr(spark, "_phe_pyds_registered", False):
        return
    from .registry import ensure_registered

    ensure_registered(spark, build_paged_parquet_source())
    ensure_registered(spark, build_paged_parquet_parallel_source())
    spark._phe_pyds_registered = True
