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

_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+([A-Za-z_]\w*)\s+(.+)$", re.IGNORECASE | re.DOTALL
)
_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+([A-Za-z_]\w*)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+([A-Za-z_]\w*)(?:\s+WHERE\s+(.+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_VACUUM_RE = re.compile(
    r"^\s*VACUUM\s+([A-Za-z_]\w*)(?:\s+RETAIN\s+(\d+))?\s*$", re.IGNORECASE
)
_OPTIMIZE_RE = re.compile(
    r"^\s*OPTIMIZE\s+([A-Za-z_]\w*)\s*$", re.IGNORECASE
)
_HISTORY_RE = re.compile(
    r"^\s*DESCRIBE\s+HISTORY\s+([A-Za-z_]\w*)\s*$", re.IGNORECASE
)
_RESTORE_RE = re.compile(
    r"^\s*RESTORE\s+(?:TABLE\s+)?([A-Za-z_]\w*)\s+TO\s+VERSION\s+AS\s+OF"
    r"\s+(\d+)\s*$",
    re.IGNORECASE,
)


def _split_assignments(s: str) -> list[tuple[str, str]]:
    """``a = expr, b = f(x, y)`` -> [(a, expr), (b, f(x, y))] — split on
    top-level commas only (function-call commas stay inside their
    parentheses)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    out = []
    for p in parts:
        col, eq, expr = p.partition("=")
        if not eq or not col.strip() or not expr.strip():
            raise ValueError(f"malformed SET assignment: {p.strip()!r}")
        out.append((col.strip(), expr.strip()))
    return out


class LakehouseSqlCatalog:
    """Session-scoped SQL namespace over CoW/MoR lakehouse tables."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, tuple[str, str, str | None]] = {}
        from ..sources.lakehouse_ds import register

        register(spark)

    def register_cow(
        self, name: str, path: str, key: str | None = None
    ) -> None:
        """``key`` is required only for DML (UPDATE/DELETE route through
        the keyed MERGE); read-only registrations can omit it."""
        self._tables[name] = ("cow", path, key)

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
        from ..sources.lakehouse_ds import cow_read_schema

        return cow_read_schema(path, version)

    def _ensure_view(self, name: str, version: int | None) -> str:
        view = name if version is None else f"{name}__asof_{version}"
        self._frame(name, version).createOrReplaceTempView(view)
        return view

    def sql(self, query: str) -> DataFrame:
        """Run SQL against the registered tables.

        Reads: any Spark SQL, with ``<table> VERSION AS OF n`` after a
        registered name time-traveling that reference. DML (one
        statement per call, each returning a one-row summary frame
        ``(operation, table, version)`` like the real formats' command
        metrics):

        - ``INSERT INTO <t> <query|VALUES ...>`` — CoW: an append
          commit through the write surface (hardlink file reuse); MoR:
          a keyed upsert delta (INSERT into a keyed table IS upsert).
          The payload query itself goes back through :meth:`sql`, so it
          can read registered tables and time travel.
        - ``UPDATE <t> SET a = expr[, ...] [WHERE cond]`` — CoW: MERGE
          of the recomputed matched rows; MoR: an upsert delta of them.
        - ``DELETE FROM <t> [WHERE cond]`` — CoW: MERGE with key
          deletes; MoR: a POSITION-DELETE commit (``delete_where`` —
          the SQL face of the S24 deletion vectors).
        - ``VACUUM <t> [RETAIN n]`` / ``OPTIMIZE <t>`` — retention /
          compaction maintenance (OPTIMIZE on MoR = compact; on CoW it
          needs the table's standing cluster spec).

        UPDATE/DELETE on CoW need the table registered with its merge
        ``key``.
        """
        for handler in (
            self._try_insert,
            self._try_update,
            self._try_delete,
            self._try_vacuum,
            self._try_optimize,
            self._try_history,
            self._try_restore,
        ):
            out = handler(query)
            if out is not None:
                return out
        return self._select(query)

    def _summary(self, op: str, name: str, version: int) -> DataFrame:
        return self.spark.createDataFrame(
            [(op, name, version)], "operation string, table string, version int"
        )

    def _current_version(self, name: str) -> int:
        from ..sinks.manifest import CommitLog

        return CommitLog(self._tables[name][1]).current_version()

    def _require(self, name: str) -> tuple[str, str, str | None]:
        if name not in self._tables:
            raise ValueError(f"unregistered lakehouse table {name!r}")
        return self._tables[name]

    def _require_key(self, name: str) -> str:
        key = self._require(name)[2]
        if key is None:
            raise ValueError(
                f"DML on {name!r} needs the merge key: register with "
                "register_cow(name, path, key=...)"
            )
        return key

    def _try_insert(self, query: str) -> DataFrame | None:
        m = _INSERT_RE.match(query)
        if m is None:
            return None
        name, payload = m.group(1), m.group(2)
        kind, path, key = self._require(name)
        df = self._select(payload)
        # standard INSERT column resolution: by name when the payload
        # already carries the table's column set, POSITIONALLY otherwise
        # (`VALUES (...)` yields col1/col2/... names); then CAST to the
        # table's types — `VALUES (100, 1)` literals are INT while the
        # table column may be BIGINT, and appending a narrower parquet
        # file would poison the version with mixed physical schemas
        from pyspark.sql import functions as F

        target = self._frame(name, None).schema
        target_cols = target.fieldNames()
        if set(df.columns) == set(target_cols):
            df = df.select(*target_cols)
        elif len(df.columns) == len(target_cols):
            df = df.toDF(*target_cols)
        else:
            raise ValueError(
                f"INSERT INTO {name}: payload has {len(df.columns)} "
                f"columns, table has {len(target_cols)} ({target_cols})"
            )
        df = df.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in target.fields
            ]
        )
        if kind == "cow":
            from ..sources.lakehouse_ds import write_table

            write_table(df, path, mode="append")
        else:
            from ..sinks.mor import MorTable

            MorTable(path, key=key).merge(self.spark, source=df)
        return self._summary("insert", name, self._current_version(name))

    def _try_update(self, query: str) -> DataFrame | None:
        m = _UPDATE_RE.match(query)
        if m is None:
            return None
        from pyspark.sql import functions as F

        name, sets, cond = m.group(1), m.group(2), m.group(3)
        kind, path, _ = self._require(name)
        key = self._require_key(name)
        matched = self._frame(name, None).filter(
            F.expr(cond) if cond else F.lit(True)
        )
        for col, expr in _split_assignments(sets):
            matched = matched.withColumn(col, F.expr(expr))
        if kind == "cow":
            from ..sinks.merge import MergeSink

            MergeSink(path, key=key).merge(self.spark, matched)
        else:
            from ..sinks.mor import MorTable

            MorTable(path, key=key).merge(self.spark, source=matched)
        return self._summary("update", name, self._current_version(name))

    def _try_delete(self, query: str) -> DataFrame | None:
        m = _DELETE_RE.match(query)
        if m is None:
            return None
        from pyspark.sql import functions as F

        name, cond = m.group(1), m.group(2)
        kind, path, _ = self._require(name)
        key = self._require_key(name)
        predicate = F.expr(cond) if cond else F.lit(True)
        if kind == "cow":
            from ..sinks.merge import MergeSink

            sink = MergeSink(path, key=key)
            state = self._frame(name, None)
            sink.merge(
                self.spark,
                self.spark.createDataFrame([], state.schema),
                deletes=state.filter(predicate).select(key),
            )
        else:
            from ..sinks.mor import MorTable

            # the SQL face of S24: DELETE on a MoR table commits a
            # deletion-vector delta, never key values
            MorTable(path, key=key).delete_where(self.spark, predicate)
        return self._summary("delete", name, self._current_version(name))

    def _try_vacuum(self, query: str) -> DataFrame | None:
        m = _VACUUM_RE.match(query)
        if m is None:
            return None
        name, retain = m.group(1), m.group(2)
        kind, path, key = self._require(name)
        if kind == "cow":
            from ..sinks.merge import MergeSink

            MergeSink(path, key=key or "_").vacuum(
                keep_last=int(retain) if retain else 1
            )
        else:
            from ..sinks.mor import MorTable

            if retain is not None:
                raise ValueError(
                    "VACUUM ... RETAIN applies to CoW tables; MoR vacuum "
                    "retention is the newest checkpoint (run OPTIMIZE "
                    "first to advance it)"
                )
            MorTable(path, key=key).vacuum()
        return self._summary("vacuum", name, self._current_version(name))

    def _try_optimize(self, query: str) -> DataFrame | None:
        m = _OPTIMIZE_RE.match(query)
        if m is None:
            return None
        name = m.group(1)
        kind, path, key = self._require(name)
        if kind == "cow":
            from ..sinks.merge import MergeSink

            sink = MergeSink(path, key=key or "_")
            if sink.cluster_by is None:
                raise ValueError(
                    f"OPTIMIZE {name}: the registered CoW handle carries "
                    "no cluster spec; run MergeSink.optimize(cluster_by=...) "
                    "through the engine API"
                )
            sink.optimize(self.spark)
        else:
            from ..sinks.mor import MorTable

            MorTable(path, key=key).compact(self.spark)
        return self._summary("optimize", name, self._current_version(name))

    def _try_restore(self, query: str) -> DataFrame | None:
        m = _RESTORE_RE.match(query)
        if m is None:
            return None
        # `RESTORE [TABLE] <t> TO VERSION AS OF n` (the Delta RESTORE
        # shape): a NEW commit whose content is the old snapshot —
        # history-preserving rollback. CoW relinks the old version's
        # files (zero data rewrite); MoR re-commits the as-of state as
        # a checkpoint (a compaction of history).
        name, version = m.group(1), int(m.group(2))
        kind, path, key = self._require(name)
        if kind == "cow":
            from ..sinks.merge import MergeSink

            MergeSink(path, key=key or "_").restore(self.spark, version)
        else:
            from ..sinks.mor import MorTable

            MorTable(path, key=key).restore(self.spark, version)
        return self._summary("restore", name, self._current_version(name))

    def _try_history(self, query: str) -> DataFrame | None:
        m = _HISTORY_RE.match(query)
        if m is None:
            return None
        # `DESCRIBE HISTORY <t>` (the Delta command shape): one row per
        # LIVE version with the commit's kind, file/row/byte totals per
        # role, and the streaming batch id when the commit came from the
        # streaming sink — answered entirely from the commit log
        # (manifests_range: one rolled checkpoint + the per-commit tail,
        # never a directory listing or a data scan)
        name = m.group(1)
        kind, path, _ = self._require(name)
        from ..sinks.manifest import CommitLog

        log = CommitLog(path)
        hist = log.manifests_range(1, log.current_version())
        rows = []
        for v in sorted(hist, reverse=True):
            man = hist[v]
            by_role: dict[str, list[dict]] = {}
            for e in man["files"]:
                by_role.setdefault(e.get("role", "data"), []).append(e)
            roles = sorted(by_role)
            op = "checkpoint" if man.get("checkpoint") else (
                "delta" if kind == "mor" else "snapshot"
            )
            rows.append(
                (
                    v,
                    op,
                    ",".join(roles),
                    sum(len(v_) for v_ in by_role.values()),
                    sum(
                        e.get("rows", 0)
                        for e in by_role.get("data", [])
                    ),
                    sum(e.get("bytes", 0) for e in man["files"]),
                    man.get("stream_batch_id"),
                )
            )
        return self.spark.createDataFrame(
            rows,
            "version int, operation string, roles string, n_files int, "
            "data_rows long, bytes long, stream_batch_id long",
        )

    def _select(self, query: str) -> DataFrame:
        """Read-only path: VERSION AS OF rewrite + view refresh."""

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
