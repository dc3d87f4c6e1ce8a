"""Streaming CDC source over the MoR table: offsets are COMMIT VERSIONS.

The batch face of incremental consumption is ``MorTable.changes_since``
(q_cdc_mor_feed) — a consumer polls for commits it has not seen. This is
its STREAMING face, composing the round's two layers: a Spark 4
``DataSourceStreamReader`` whose offset is the table's commit version
(``{"v": N}``), whose ``latestOffset`` is one commit-log read
(`CommitLog.current_version` — the listing-free resolution), and whose
``partitions(start, end)`` come straight from the MANIFESTS of commits
(start, end] — one ``InputPartition`` per committed FILE, tagged with
its version and role, so a commit of K files fans out to K parallel
executor tasks with no directory listing anywhere. ``read`` decodes one
parquet file and emits Arrow batches with ``__op``
('upsert'/'delete') and ``__commit`` prepended — the exact row shape
``changes_since`` serves in batch, which is what makes the equivalence
oracle-able.

Exactly-once across restarts needs no extra machinery: versions are
immutable and the manifest of a committed version is immutable, so
``partitions(start, end)`` + ``read`` re-derive any checkpointed range
deterministically (the same argument as the paged source's replay).

Delete tombstones carry only the key; payload columns are NULL-padded
executor-side so every batch shares one schema.

SHIPPING CONSTRAINT: same as ``pyds.py`` — Spark pickles the DataSource
class into dedicated workers that do not share the driver's sys.path,
so the classes are built inside the factory (local classes cloudpickle
BY VALUE) and import only installed libraries at call time.
"""

from __future__ import annotations


def build_mor_cdc_stream_source():
    """The ``mor_cdc`` DataSource class (local for by-value pickling).

    Options: ``path`` (MoR table root), ``key`` (merge key column),
    ``start_after`` (optional: consume only commits > this version;
    default 0 = from the beginning, init commit included as upserts).
    """
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )
    from pyspark.sql.types import StructType

    class _CommitFile(InputPartition):
        def __init__(self, version: int, path: str, role: str):
            self.version = version
            self.path = path
            self.role = role

    def _manifest(table_path: str, version: int) -> dict:
        import json
        import os

        with open(
            os.path.join(table_path, "_manifest", f"{version}.json")
        ) as fh:
            return json.load(fh)

    def _current_version(table_path: str) -> int:
        # inline CommitLog.current_version (hint + forward probe): the
        # reader ships by value into workers that cannot import the
        # engine package
        import os

        mdir = os.path.join(table_path, "_manifest")
        try:
            with open(os.path.join(mdir, "_latest")) as fh:
                v = int(fh.read().strip() or 0)
        except (FileNotFoundError, ValueError):
            v = 0
        if v > 0 and not os.path.exists(os.path.join(mdir, f"{v}.json")):
            v = 0
        while os.path.exists(os.path.join(mdir, f"{v + 1}.json")):
            v += 1
        return v

    def _data_schema_file(table_path: str) -> str:
        # first data file of the LATEST published data commit. Schema
        # evolution on the MoR table is append-only (S22/S15 contract),
        # so the newest data commit carries the superset of columns —
        # anchoring the donor there means columns added by later deltas
        # appear in the feed (older files are NULL-padded against it)
        # instead of being silently dropped, matching batch
        # changes_since's allowMissingColumns behavior. Captured once at
        # stream start (Spark fixes a stream's schema then anyway; a
        # column added MID-stream shows up on restart, the Delta CDF
        # contract).
        import os

        v = _current_version(table_path)
        while v >= 1:
            try:
                m = _manifest(table_path, v)
            except FileNotFoundError:
                v -= 1
                continue
            for ent in m["files"]:
                if ent.get("role") == "data":
                    return os.path.join(table_path, f"v{v}", ent["path"])
            v -= 1
        raise FileNotFoundError(f"no data commit in {table_path}")

    class _MorCdcStreamReader(DataSourceStreamReader):
        def __init__(self, options):
            self.path = options["path"]
            self.key = options["key"]
            self.start_after = int(options.get("start_after", "0"))
            # schema donor resolved ONCE at stream start (driver-side)
            # and pickled into every read task: the stream's row shape
            # must stay the schema() the source declared even if a
            # wider delta commits mid-stream
            self.donor_file = _data_schema_file(self.path)

        def initialOffset(self) -> dict:
            return {"v": self.start_after}

        def latestOffset(self) -> dict:
            # ONE commit-log read — no listing, no admission cap needed:
            # a microbatch is naturally bounded by commits since the
            # last trigger
            return {"v": max(self.start_after, _current_version(self.path))}

        def partitions(self, start: dict, end: dict):
            import os

            lo, hi = int(start["v"]), int(end["v"])
            parts = []
            for v in range(lo + 1, hi + 1):
                try:
                    m = _manifest(self.path, v)
                except FileNotFoundError:
                    # unpublished manifest: a torn claim (physical dir
                    # without _SUCCESS, never a commit) is a benign gap;
                    # a missing DIRECTORY means the version was VACUUMED
                    # — silently skipping it would lose change events
                    # (deletes in vacuumed deltas never reappear) and
                    # diverge downstream state, so fail loudly like
                    # Delta CDF does for a vacuumed CDC range
                    if os.path.exists(os.path.join(self.path, f"v{v}")):
                        continue  # torn claim, no data to serve
                    raise RuntimeError(
                        f"requested CDC range ({lo}, {hi}] includes "
                        f"version {v} of {self.path}, which was removed "
                        "by vacuum; restart the stream from a retained "
                        "offset (start_after >= the vacuum boundary)"
                    ) from None
                for ent in m["files"]:
                    parts.append(
                        _CommitFile(
                            v,
                            os.path.join(self.path, f"v{v}", ent["path"]),
                            ent.get("role", "data"),
                        )
                    )
            return parts or [_CommitFile(lo, "", "empty")]

        def read(self, partition):
            if partition.role == "empty":
                return
            import pyarrow as pa
            import pyarrow.parquet as pq

            # footer-only schema fetch: the donor file is never decoded
            donor_schema = pq.ParquetFile(self.donor_file).schema_arrow
            if partition.role == "pos_deletes":
                # a deletion-vector commit: the DV names (file, row)
                # pairs — recover the deleted KEYS by reading only the
                # key column of the referenced files at the named
                # positions (bounded by the files the DV touches), and
                # emit them as delete events, NULL payloads — the same
                # row shape batch changes_since serves for DV commits
                from urllib.parse import unquote, urlparse

                dv = pq.read_table(partition.path)
                by_file: dict[str, list[int]] = {}
                for f, p in zip(
                    dv["__file"].to_pylist(), dv["__pos"].to_pylist()
                ):
                    by_file.setdefault(f, []).append(p)
                for uri, positions in by_file.items():
                    local = (
                        unquote(urlparse(uri).path)
                        if uri.startswith("file:")
                        else uri
                    )
                    keys = (
                        pq.read_table(local, columns=[self.key])[self.key]
                        .combine_chunks()
                        .take(pa.array(sorted(positions), pa.int64()))
                    )
                    n = len(positions)
                    cols = {
                        "__op": pa.array(["delete"] * n, pa.string()),
                        "__commit": pa.array(
                            [partition.version] * n, pa.int64()
                        ),
                    }
                    for field in donor_schema:
                        cols[field.name] = (
                            keys.cast(field.type)
                            if field.name == self.key
                            else pa.nulls(n, field.type)
                        )
                    yield from pa.table(cols).to_batches()
                return
            tbl = pq.read_table(partition.path)
            n = tbl.num_rows
            op = "upsert" if partition.role == "data" else "delete"
            cols = {
                "__op": pa.array([op] * n, pa.string()),
                "__commit": pa.array([partition.version] * n, pa.int64()),
            }
            for field in donor_schema:
                if field.name in tbl.schema.names:
                    cols[field.name] = tbl[field.name].combine_chunks()
                else:  # tombstone: NULL-pad the payload columns
                    cols[field.name] = pa.nulls(n, field.type)
            out = pa.table(cols)
            for batch in out.to_batches():
                yield batch

        def commit(self, end: dict) -> None:
            pass  # versions are immutable; nothing to acknowledge

    class MorCdcDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "mor_cdc"

        def schema(self):
            import pyarrow as pa
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import from_arrow_schema

            donor = pq.ParquetFile(
                _data_schema_file(self.options["path"])
            ).schema_arrow
            fields = [
                pa.field("__op", pa.string()),
                pa.field("__commit", pa.int64()),
            ] + list(donor)
            return from_arrow_schema(pa.schema(fields))

        def streamReader(self, schema: StructType):
            return _MorCdcStreamReader(self.options)

    return MorCdcDataSource


def register(spark) -> None:
    """Idempotently register mor_cdc on THIS session (see
    sources/registry.py for the cross-session caveat)."""
    from .registry import ensure_registered

    ensure_registered(spark, build_mor_cdc_stream_source())
