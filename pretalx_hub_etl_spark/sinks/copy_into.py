"""COPY INTO: idempotent file ingestion into a lakehouse table (S42).

``COPY INTO t FROM '<dir>' FILEFORMAT = PARQUET|CSV|JSON`` loads every
matching source file EXACTLY ONCE across statement re-runs — the
retry-friendly ingestion front door every scheduled pipeline needs
(re-running a failed-downstream job must not double-load yesterday's
files). Exactly-once is CRASH-PROOF because the loaded-file record
rides the data commit itself: each COPY commits through the S45
transaction protocol (sinks/txn.py) with ``copy_files`` stamped into
the commit's manifest, so there is no window where data is committed
but unrecorded (the classic double-load crash) or recorded but
uncommitted (silent loss). A crash mid-publish is completed by the
heal pass at the top of the next COPY; a crash pre-prepare loads
nothing and re-runs cleanly. The side file
(``_manifest/_copy_state.json``) is a CACHE of the manifest records —
it makes the loaded-set survive VACUUM of old manifests; the union of
both (:func:`loaded_effective`) is the truth a re-run diffs against.

Semantics follow the public Databricks/Delta COPY INTO surface:

- files are identified by PATH — a file rewritten in place with the
  same name is SKIPPED (use ``FORCE = true`` to reload everything);
- ``PATTERN = '<glob>'`` filters on the path relative to the source
  root; hidden files (``_*``, ``.*`` components) are never loaded;
- loading is append-only on CoW tables and a keyed upsert delta on MoR
  tables (MoR's INSERT-is-upsert contract);
- row counts are collected with ``Observation`` INSIDE the write job —
  no second pass over the loaded files.

Concurrency: the loaded-set update is last-writer-wins with a
read-union-write under the table props' tmp+rename discipline; two
COPY INTO statements racing the SAME source files can both load them
(single-ingestor-per-staging-area is the assumed deployment, as in the
modeled surface). RESTORE does not roll the loaded-set back — reload
after a restore with FORCE, which matches the modeled behavior.

No reference counterpart (the reference re-scrapes its full source on
every run — ``main.py:93-102``); this is the incremental version of
that extract contract.
"""

from __future__ import annotations

import fnmatch
import json
import os
import uuid
from typing import Any

from .manifest import _mdir

_COPY_STATE = "_copy_state.json"


def _state_path(table_path: str) -> str:
    return os.path.join(_mdir(table_path), _COPY_STATE)


def loaded_files(table_path: str) -> dict[str, dict[str, Any]]:
    """Already-loaded source files: absolute path -> {size, mtime_ns}
    (the side-file CACHE; :func:`loaded_effective` is the truth)."""
    try:
        with open(_state_path(table_path)) as fh:
            return json.load(fh)
    except (FileNotFoundError, ValueError):
        return {}


def loaded_effective(table_path: str) -> dict[str, dict[str, Any]]:
    """The authoritative loaded set: the side-file cache UNIONED with
    every live commit manifest's ``copy_files`` record. The manifest
    record is written ATOMICALLY with the data commit (the loaded-set
    rides the commit — sinks/txn.py), so a crash between commit and any
    side bookkeeping can never double-load; the side file survives
    VACUUM of old manifests. O(live versions) tiny JSON reads — an
    ingestion-statement cost, not a read-path cost."""
    from .manifest import CommitLog

    out = loaded_files(table_path)
    log = CommitLog(table_path)
    if log.exists():
        for v in log.versions():
            try:
                cf = log.manifest(v).get("copy_files")
            except FileNotFoundError:
                continue
            if cf:
                out.update(cf)
    return out


def record_loaded(table_path: str, newly: dict[str, dict[str, Any]]) -> None:
    """Union the newly-loaded files into the persisted set (tmp+rename)."""
    merged = loaded_files(table_path)
    merged.update(newly)
    os.makedirs(_mdir(table_path), exist_ok=True)
    tmp = os.path.join(_mdir(table_path), f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump(merged, fh, separators=(",", ":"))
    os.rename(tmp, _state_path(table_path))


def list_source_files(
    src: str, pattern: str | None
) -> dict[str, dict[str, Any]]:
    """Candidate files under ``src``: absolute path -> {size, mtime_ns}.

    Driver-side listing of the STAGING area (bounded by the ingestion
    batch, not the table) — hidden files and dirs (``_*``/``.*`` path
    components, Spark markers like _SUCCESS) are excluded, PATTERN
    matches the path relative to ``src``."""
    out: dict[str, dict[str, Any]] = {}
    src = os.path.abspath(src)
    if not os.path.isdir(src):
        raise ValueError(f"COPY INTO source is not a directory: {src}")
    for root, dirs, files in os.walk(src):
        dirs[:] = [
            d for d in dirs if not d.startswith(("_", "."))
        ]
        for f in files:
            if f.startswith(("_", ".")):
                continue
            full = os.path.join(root, f)
            rel = os.path.relpath(full, src)
            if pattern and not fnmatch.fnmatch(rel, pattern):
                continue
            st = os.stat(full)
            out[full] = {"size": st.st_size, "mtime_ns": st.st_mtime_ns}
    return out
