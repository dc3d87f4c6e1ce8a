"""Commit log + file manifests for the versioned tables (CoW and MoR).

Round-9's admitted architectural gap: version discovery in the CoW/MoR
sinks was a directory listing (`merge.py _versions`), which at 100 TB
with thousands of commits — plus MoR delta chains — makes every read pay
O(files in table root) metadata calls. Real table formats (Delta's
`_delta_log` + `_last_checkpoint`, Iceberg's snapshot manifests) solved
this with a commit log: each commit publishes ONE small object recording
its file list and per-file column stats, and readers resolve "current
version" / "files of version N" / "changes since N" by reading those
objects only.

This module is that layer, kept deliberately minimal and layered ON TOP
of the existing OCC rename protocol (which stays the commit atom):

    <table>/_manifest/<N>.json   one per commit: file list (relative
                                 paths), per-file rows/bytes and
                                 min/max/null-count column stats from
                                 the parquet footers, role tags
                                 (data/deletes for MoR), checkpoint flag
    <table>/_manifest/_latest    hint file holding the highest published
                                 version; updated by tmp-write + atomic
                                 rename after each publish

Read protocol (listing-free): read `_latest` (missing -> 0), then roll
FORWARD by probing `<N+1>.json`, `<N+2>.json`, ... with single-file
stats until one is absent — the Delta `_last_checkpoint` shape, so a
stale or lost-race hint only costs a few extra probes, never a wrong
answer. No `os.listdir` on any read path; a test pins that.

Two-phase commit visibility: the v<N> directory rename CLAIMS the
version number (unchanged — POSIX gives exactly one winner); publishing
`<N>.json` makes it VISIBLE. A writer that crashes between the two
leaves a claimed-but-unpublished version; the next writer's claim of N
fails (EEXIST), detects the missing manifest, and HEALS by publishing
the manifest from the visible v<N> contents (the one code path allowed
to list, and only inside that crashed-writer recovery). Readers in the
gap serve N-1 — consistent, just not yet showing the unpublished commit
(its effective commit point is the manifest publish).

Stats come from the parquet footers of the staged files (driver-side
footer reads, no data scan — the same moment Delta computes stats).
They power `files_for` predicate pruning: a reader with a range
predicate on a stats column opens only the files whose [min, max]
envelope intersects it — manifest-level data skipping before Spark ever
plans the scan.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

_MANIFEST_DIR = "_manifest"
_LATEST = "_latest"
_LATEST_CKPT = "_latest_ckpt"
#: staged-commit marker carrying a streaming commit's exactly-once
#: identity (JSON: stream_batch_id + stream_run_id); written into the
#: stage dir BEFORE the rename claim so heal can restore the stamp
_STREAM_BATCH = "_STREAM_BATCH"
#: staged-commit marker carrying a multi-table transaction commit's
#: identity (JSON: txn {id, coord, entry} + txn_inherited + copy_files
#: + checkpoint_at); written into the work dir BEFORE the rename claim
#: (sinks/txn.py _publish_one) so a heal of a crash between rename and
#: publish restores the marker — without it the healed manifest would
#: make the pending entry visible before its transaction committed
_TXN_STAMP = "_TXN"
#: table-properties object (`_manifest/_table.json`): kind (cow|mor),
#: merge key, and optionally a DDL schema for empty tables — written at
#: table creation so a catalog can discover DML routing from the PATH
#: alone instead of requiring the caller to re-supply the key per session
_TABLE_PROPS = "_table.json"

#: roll a checkpoint manifest every N commits (the Delta
#: checkpoint-parquet shape, transposed to the commit log itself): cold
#: history walks (changes_since(0), audits) read ONE rolled object plus
#: the <N per-commit tail instead of every per-commit JSON since v1
CHECKPOINT_EVERY = 10

# columns whose parquet logical types we can compare / JSON-serialize for
# min/max skipping; everything else gets rows/bytes but no range stats
_STATS_TYPES = (int, float, str, bool)

#: per-file Bloom geometry: bits per key (m rounds up to a power of two)
#: and probe count — ~1 % fpr at the default; m is CAPPED so a single
#: file's bloom never exceeds ~16 KiB raw in the manifest JSON (the
#: inline form keeps a commit ONE object; at petabyte file counts real
#: formats shard index bits to sidecar objects — documented trade)
BLOOM_BITS_PER_KEY = 10
BLOOM_K = 7
BLOOM_MAX_BITS = 1 << 17


class _Unbounded:
    """Order sentinel for one-sided prune ranges: ``UNBOUNDED_LO``
    compares below every value, ``UNBOUNDED_HI`` above — so
    ``files_for``'s ``max < lo or min > hi`` disjointness test works
    unchanged for half-open predicates (``col < 5`` prunes as
    ``(UNBOUNDED_LO, 5)``) across int/float/str stats alike. Reflected
    comparisons make ``int < UNBOUNDED_HI`` resolve here (int returns
    NotImplemented against a foreign type)."""

    __slots__ = ("top",)

    def __init__(self, top: bool):
        self.top = top

    def __lt__(self, other):  # -inf < x: True; +inf < x: False
        return not self.top

    def __gt__(self, other):
        return self.top

    def __le__(self, other):
        return not self.top

    def __ge__(self, other):
        return self.top

    def __eq__(self, other):
        return self is other

    def __hash__(self):
        return id(self)

    def __repr__(self):
        return "+inf" if self.top else "-inf"


UNBOUNDED_LO = _Unbounded(False)
UNBOUNDED_HI = _Unbounded(True)


def _bloom_key_bytes(v: Any) -> bytes:
    """Canonical byte encoding for bloom membership: numerics are
    CANONICALIZED across Python types before hashing (True/1/1.0/
    Decimal('1.00') all encode as b"1", 1.5/Decimal('1.5') as b"1.5")
    because the probe side hashes the PREDICATE literal while the build
    side hashed the STORED value: if 5 and 5.0 encoded differently, a
    point probe ``read_pruned(col, 5.0, 5.0)`` against an int column
    would skip a file that actually CONTAINS the value — a false
    NEGATIVE that silently drops rows. Canonicalization can only merge
    values Python already compares equal (``5 == 5.0 == Decimal('5')``),
    so it never adds even a false positive. Strings stay utf-8 verbatim
    (no numeric coercion: '5' and 5 are distinct values)."""
    import decimal

    if isinstance(v, bool):
        v = int(v)
    elif isinstance(v, float):
        if v.is_integer():
            v = int(v)
    elif isinstance(v, decimal.Decimal):
        # integral -> int; fractional -> the repr of its float value,
        # matching how an equal float literal encodes (equal Decimals
        # map to equal floats, so equality is preserved; any precision
        # collision merges UNEQUAL values, which is a false positive —
        # allowed by the bloom contract)
        if v == v.to_integral_value():
            v = int(v)
        else:
            v = float(v)
            if v.is_integer():
                v = int(v)
    return str(v).encode()


def _bloom_positions(v: Any, m: int, k: int):
    import hashlib

    h = hashlib.sha256(_bloom_key_bytes(v)).digest()
    h1 = int.from_bytes(h[:8], "big")
    h2 = int.from_bytes(h[8:16], "big") | 1  # odd: full-period stride
    return ((h1 + i * h2) % m for i in range(k))


def build_file_bloom(values, bits_per_key: int = BLOOM_BITS_PER_KEY,
                     k: int = BLOOM_K) -> dict[str, Any]:
    """Bloom filter over one file's key values (sha256 double hashing —
    deterministic across processes/runs, unlike PYTHONHASHSEED hashes).
    Returns {m, k, b64} for inline manifest storage."""
    import base64

    vals = [v for v in values if v is not None]
    n = max(1, len(vals))
    m = 1 << max(6, (n * bits_per_key - 1).bit_length())
    m = min(m, BLOOM_MAX_BITS)
    bits = bytearray(m // 8)
    for v in vals:
        for b in _bloom_positions(v, m, k):
            bits[b >> 3] |= 1 << (b & 7)
    # enc 2 = numeric canonicalization (round 13): float/Decimal/bool
    # probes against OLDER persisted filters would false-negative
    # (5.0 hashed as b"5.0" then, b"5" now) — files_for gates on this
    return {
        "m": m,
        "k": k,
        "enc": 2,
        "b64": base64.b64encode(bytes(bits)).decode(),
    }


def _bloom_probe_safe(bloom: dict[str, Any], value: Any, st) -> bool:
    """True when a point probe of ``value`` against this file's Bloom
    cannot false-negative: the stored stats type family matches the
    probe's (no SQL implicit cast can make unequal encodings equal),
    and canonicalized types only probe enc-2 filters."""
    import decimal

    if isinstance(value, (bool, float, decimal.Decimal)):
        if int(bloom.get("enc", 1)) < 2:
            return False  # pre-canonicalization filter: don't probe
    if st is None:
        return False  # no stats: cannot verify the stored family
    ref = st.get("min")
    if ref is None:
        ref = st.get("max")
    if ref is None:
        return False
    num = (int, float, bool, decimal.Decimal)
    if isinstance(value, num) and isinstance(ref, (int, float, bool)):
        return True
    if isinstance(value, str) and isinstance(ref, str):
        return True
    return False


def bloom_might_contain(bloom: dict[str, Any], value: Any) -> bool:
    """False ONLY when the file provably lacks the value (no false
    negatives — the same soundness contract as min/max skipping)."""
    import base64

    bits = base64.b64decode(bloom["b64"])
    m, k = int(bloom["m"]), int(bloom["k"])
    return all(
        bits[b >> 3] & (1 << (b & 7)) for b in _bloom_positions(value, m, k)
    )


def _mdir(table_path: str) -> str:
    return os.path.join(table_path, _MANIFEST_DIR)


def _mpath(table_path: str, version: int) -> str:
    return os.path.join(_mdir(table_path), f"{version}.json")


def _parquet_files(root: str) -> list[str]:
    """Relative paths of the parquet files under a STAGED commit dir
    (write-side only: the writer is allowed to enumerate what it just
    wrote; readers never call this)."""
    out: list[str] = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for f in filenames:
            if f.endswith(".parquet"):
                out.append(
                    os.path.relpath(os.path.join(dirpath, f), root)
                )
    return sorted(out)


def _file_stats(path: str) -> dict[str, Any]:
    """rows/bytes + per-column min/max/null_count from the parquet
    footer (row-group statistics aggregated per file). Columns with
    non-scalar or absent stats are recorded without a range — pruning
    simply cannot skip on them."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    cols: dict[str, dict[str, Any]] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            name = c.path_in_schema
            if "." in name:  # nested leaf: skip (no top-level pruning)
                continue
            st = c.statistics
            ent = cols.setdefault(
                name, {"min": None, "max": None, "null_count": 0}
            )
            if st is None or not st.has_min_max:
                ent["min"] = ent["max"] = None
                ent.setdefault("no_range", True)
                continue
            try:
                mn, mx = st.min, st.max
            except Exception:
                # pyarrow cannot extract stats for some physical types
                # (e.g. the NULL type an all-NULL column writes) —
                # stats are optional by contract: no range, no skip
                ent["no_range"] = True
                continue
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode(), mx.decode()
                except UnicodeDecodeError:
                    ent["no_range"] = True
                    continue
            if hasattr(mn, "isoformat"):
                mn, mx = mn.isoformat(), mx.isoformat()
            if not isinstance(mn, _STATS_TYPES):
                ent["no_range"] = True
                continue
            if ent.get("no_range"):
                continue
            ent["min"] = mn if ent["min"] is None else min(ent["min"], mn)
            ent["max"] = mx if ent["max"] is None else max(ent["max"], mx)
            if st.null_count is not None:
                ent["null_count"] += st.null_count
    return {
        "rows": md.num_rows,
        "bytes": os.path.getsize(path),
        "columns": {
            k: v for k, v in cols.items() if not v.pop("no_range", False)
        },
    }


def build_manifest(
    version: int,
    staged_dir: str,
    *,
    checkpoint: bool = False,
    bloom_on: str | None = None,
) -> dict[str, Any]:
    """Assemble the manifest dict for a commit from its STAGED directory
    (call before the rename — the file set is final once staged).

    Footer reads run on a thread pool: they are tiny I/O-bound metadata
    fetches, and a commit of N files paid N serial opens otherwise
    (measured: +5.8 s on the 3-commit version_diff fixture, 32 files per
    commit). At real scale the same stats would be computed by the
    writing tasks themselves and attached to the commit, not re-read —
    the footer pass is the single-node stand-in for that."""
    rels = _parquet_files(staged_dir)
    from concurrent.futures import ThreadPoolExecutor

    # streaming commits persist their exactly-once identity with the
    # STAGED files (a `_STREAM_BATCH` marker written before the rename
    # claim), so a heal of a crashed streaming commit restores the
    # (run id, batch id) stamp — without it, a crash between rename and
    # publish would lose the stamp and a Spark replay of that batch
    # would commit AGAIN through the sink's own recovery path
    stream_stamp: dict[str, Any] = {}
    try:
        with open(os.path.join(staged_dir, _STREAM_BATCH)) as fh:
            raw = json.load(fh)
        if "stream_batch_id" in raw:
            stream_stamp["stream_batch_id"] = int(raw["stream_batch_id"])
        if "stream_run_id" in raw:
            stream_stamp["stream_run_id"] = str(raw["stream_run_id"])
    except (FileNotFoundError, ValueError):
        pass
    # multi-table transaction commits persist their identity the same
    # way (`_TXN` stamp, sinks/txn.py): restoring it here is what keeps
    # a HEALED txn commit invisible until its transaction commits
    try:
        with open(os.path.join(staged_dir, _TXN_STAMP)) as fh:
            raw = json.load(fh)
        for k in ("txn", "txn_inherited", "copy_files", "checkpoint_at"):
            if k in raw:
                stream_stamp[k] = raw[k]
    except (FileNotFoundError, ValueError):
        pass

    if rels:
        with ThreadPoolExecutor(max_workers=min(16, len(rels))) as pool:
            stats = list(
                pool.map(
                    lambda r: _file_stats(os.path.join(staged_dir, r)),
                    rels,
                )
            )
    else:
        stats = []
    files = []
    for rel, fstats in zip(rels, stats):
        role = "data"
        top = rel.split(os.sep, 1)[0]
        if top in ("data", "deletes", "pos_deletes", "cdf"):
            # MoR layout dirs + the S51 change-data member (cdf/):
            # change rows are commit METADATA, not table state — every
            # read path filters role == "data"
            role = top
        ent = {"path": rel, "role": role}
        ent.update(fstats)
        # per-file Bloom on the declared key column (Delta's bloom-index
        # idea, inline): point lookups on hash-scattered layouts get
        # file skipping that min/max envelopes cannot give (every file's
        # range spans the domain). One column read per staged file —
        # write-side cost, column-pruned through the parquet reader.
        # "deletes" files carry the key column too (MoR tombstones),
        # so they take the same index; pos_deletes files name physical
        # rows, no key column — the KeyError guard leaves them alone
        if bloom_on is not None and role in ("data", "deletes"):
            import pyarrow.parquet as pq

            try:
                col = pq.read_table(
                    os.path.join(staged_dir, rel), columns=[bloom_on]
                )[bloom_on]
                ent["bloom"] = {
                    bloom_on: build_file_bloom(col.to_pylist())
                }
            except KeyError:
                pass  # column absent in this file: no bloom, no skip
        # hive partition values from the path (key=value segments):
        # partition columns never appear in footers, so min=max=value
        # here is what lets files_for prune on them — manifest-level
        # partition pruning through the same mechanism as stats skipping
        for seg in rel.split(os.sep)[:-1]:
            if "=" in seg:
                k, _, raw = seg.partition("=")
                if raw == "__HIVE_DEFAULT_PARTITION__":
                    # null partition value: no range, never prunable
                    ent.setdefault("columns", {})[k] = {
                        "min": None,
                        "max": None,
                        "null_count": 1,
                        "partition": True,
                    }
                    continue
                # TYPED partition values (the path segment is always a
                # string): numeric-looking values are stored as numbers
                # so an int/float predicate compares numerically — raw
                # strings would make '10' < '2' lexicographically and
                # UNSOUNDLY skip files, while a typed predicate against
                # a string stat just hits files_for's TypeError
                # keep-path (sound, skips nothing)
                val: object = raw
                try:
                    val = int(raw)
                except ValueError:
                    try:
                        val = float(raw)
                    except ValueError:
                        pass
                ent.setdefault("columns", {})[k] = {
                    "min": val,
                    "max": val,
                    "null_count": 0,
                    "partition": True,
                }
        files.append(ent)
    out: dict[str, Any] = {
        "version": version,
        "checkpoint": bool(
            checkpoint
            or os.path.exists(os.path.join(staged_dir, "_CHECKPOINT"))
        ),
        "files": files,
    }
    out.update(stream_stamp)
    return out


#: process-local read-your-own-writes floor: the highest version THIS
#: process has published (or observed committed) per table root. The
#: round-13/14 driver gate twice recorded a read serving a snapshot
#: BELOW a commit the same process had just completed — consistent with
#: delayed cross-process visibility of the published manifest on the
#: harness filesystem (the engine's own box never reproduced it in ~300
#: replays). The floor makes that structurally impossible: any read
#: that resolves below it RETRIES with backoff and, still stale, raises
#: with captured diagnostics instead of silently serving old data —
#: the correct posture on eventually-consistent object stores too.
_COMMITTED_FLOOR: dict[str, int] = {}


def note_committed(table_path: str, version: int) -> None:
    """Record that ``version`` of the table is durably committed, as
    witnessed by this process (publish-time, or a fenced await)."""
    k = os.path.realpath(table_path)
    if version > _COMMITTED_FLOOR.get(k, 0):
        _COMMITTED_FLOOR[k] = version


def committed_floor(table_path: str) -> int:
    """Lowest version any read of the table may legally serve (0 =
    no write witnessed by this process — no constraint)."""
    return _COMMITTED_FLOOR.get(os.path.realpath(table_path), 0)


def forget_committed(table_path: str) -> None:
    """Drop the process-local floor for a table. Crash-SIMULATION and
    teardown helper: a real crashed writer loses its floor with its
    process, but an in-process test that deletes a published manifest
    to emulate the crash must also forget the floor — otherwise the
    fence (correctly) refuses to serve the regressed state."""
    _COMMITTED_FLOOR.pop(os.path.realpath(table_path), None)


class CommitLog:
    """Listing-free version resolution for one versioned table root."""

    def __init__(self, table_path: str):
        self.table_path = table_path

    # -- write side ----------------------------------------------------------

    def publish(self, manifest: dict[str, Any]) -> None:
        """Make commit ``manifest['version']`` visible: O_EXCL-safe write
        of ``<N>.json`` (tmp + rename), then advance the ``_latest``
        hint. Idempotent per version — the heal path may re-publish.

        Stamps ``committed_at`` (epoch MILLISECONDS) at publish time,
        clamped to be strictly greater than the newest published commit's
        stamp — so ``TIMESTAMP AS OF`` resolution is well-defined even
        under clock regression. Timestamps are ADVISORY (wall clocks
        skew); version numbers remain the authoritative order — the
        clamp just makes the advisory order agree with it."""
        os.makedirs(_mdir(self.table_path), exist_ok=True)
        if "committed_at" not in manifest:
            manifest["committed_at"] = self._stamp_for(manifest["version"])
        final = _mpath(self.table_path, manifest["version"])
        tmp = os.path.join(
            _mdir(self.table_path), f".tmp-{uuid.uuid4().hex}"
        )
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, separators=(",", ":"))
        os.rename(tmp, final)  # atomic publish (replace is fine: same bytes)
        self._advance_hint(manifest["version"])
        v = manifest["version"]
        if (
            v == 1
            and committed_floor(self.table_path) > 1
            and not os.path.exists(_mpath(self.table_path, 2))
        ):
            # v1 of a table with NO history above it at a path whose
            # floor is higher: the old table was dropped and recreated
            # (tests/tools rmtree table roots directly) — the stale
            # floor would otherwise fail every read of the new table.
            # A legacy-history backfill publishing v1 keeps its floor:
            # its higher manifests exist.
            _COMMITTED_FLOOR.pop(os.path.realpath(self.table_path), None)
        note_committed(self.table_path, v)
        if v % CHECKPOINT_EVERY == 0 and not os.path.exists(
            self._ckpt_path(v)
        ):
            self._write_log_checkpoint(v)

    def _stamp_for(self, version: int) -> int:
        """``committed_at`` for a publish of ``version``: wall-clock now,
        clamped so stamps are NONDECREASING in version order even when a
        heal/backfill publishes a version BELOW already-published ones —
        floor = newest published stamp below, ceiling = oldest published
        stamp above (heals of old commits inherit their neighbors' era
        rather than claiming "now")."""
        import time

        now = int(time.time() * 1000)
        floor = 0
        v = version - 1
        while v >= 1:
            if os.path.exists(_mpath(self.table_path, v)):
                floor = int(self.manifest(v).get("committed_at", 0))
                break
            v -= 1
        stamp = max(now, floor + 1)
        cur = self.current_version()
        v = version + 1
        while v <= cur:
            if os.path.exists(_mpath(self.table_path, v)):
                ceil = int(self.manifest(v).get("committed_at", 0))
                if ceil:
                    stamp = min(stamp, max(ceil, floor + 1))
                break
            v += 1
        return stamp

    def version_at(self, ts_ms: int) -> int:
        """``TIMESTAMP AS OF`` resolution (the Delta rule): the HIGHEST
        live version whose ``committed_at`` <= ``ts_ms``. Raises when the
        timestamp predates the oldest live commit (nothing was visible
        then) — including when history below was vacuumed away. Pre-stamp
        manifests (upgraded tables) count as committed_at=0, i.e. always
        visible."""
        hist = self.manifests_range(1, self.current_version())
        best = max(
            (
                v
                for v, m in hist.items()
                if int(m.get("committed_at", 0)) <= ts_ms
            ),
            default=0,
        )
        if best == 0:
            raise FileNotFoundError(
                f"no version of {self.table_path} committed at or before "
                f"timestamp {ts_ms} (first live commit is later, or "
                "history was vacuumed)"
            )
        return best

    # -- table properties (catalog discovery) ---------------------------------

    def write_table_props(self, props: dict[str, Any]) -> None:
        """Persist table-level metadata (kind/merge key/schema DDL) at
        creation — what lets a catalog register a table from its PATH
        alone. Tmp+rename; last writer wins (properties are
        creation-time, concurrent creation is already an init race)."""
        if self._probe_version() == 0:
            # props written for a table with NO manifests = fresh
            # creation: a leftover floor from a dropped table at the
            # same path no longer applies (see current_version fence)
            _COMMITTED_FLOOR.pop(os.path.realpath(self.table_path), None)
        os.makedirs(_mdir(self.table_path), exist_ok=True)
        tmp = os.path.join(
            _mdir(self.table_path), f".tmp-{uuid.uuid4().hex}"
        )
        with open(tmp, "w") as fh:
            json.dump(props, fh, separators=(",", ":"))
        os.rename(tmp, os.path.join(_mdir(self.table_path), _TABLE_PROPS))

    def table_props(self) -> dict[str, Any]:
        """Stored table properties; {} for tables created before the
        props layer (callers fall back to explicit registration)."""
        try:
            with open(
                os.path.join(_mdir(self.table_path), _TABLE_PROPS)
            ) as fh:
                return json.load(fh)
        except (FileNotFoundError, ValueError):
            return {}

    def _advance_hint(self, version: int) -> None:
        # The check-then-rename below has a benign race: two publishers
        # can interleave so the lower version lands last and the hint
        # regresses one step. Correctness is unaffected — the hint is a
        # HINT: current_version() probes FORWARD from it, so a stale
        # value costs a few extra single-file stats and the next publish
        # re-advances it. Only the published manifests are truth.
        cur = self._hint()
        if version <= cur:
            return  # a later commit already advanced it; never regress
        tmp = os.path.join(
            _mdir(self.table_path), f".tmp-{uuid.uuid4().hex}"
        )
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.rename(tmp, os.path.join(_mdir(self.table_path), _LATEST))

    def heal(self, version: int) -> None:
        """Crashed-writer recovery: v<version> is claimed (directory
        committed, `_SUCCESS` present) but its manifest was never
        published. Publish it from the visible directory — the ONLY
        read-path-adjacent place allowed to enumerate files."""
        vdir = os.path.join(self.table_path, f"v{version}")
        if not os.path.exists(os.path.join(vdir, "_SUCCESS")):
            raise FileNotFoundError(
                f"cannot heal v{version}: not a committed version dir"
            )
        # restore the per-file blooms too (the declared key column is
        # table metadata): a healed commit must skip like any other
        self.publish(
            build_manifest(
                version, vdir, bloom_on=self.table_props().get("bloom_on")
            )
        )
        # healing may be this table's FIRST manifest (legacy table whose
        # upgrading writer crashed pre-publish): bring the rest of the
        # legacy history into the log too, or `versions()` would serve
        # only the healed commit and silently drop everything below
        self.backfill_legacy()

    def backfill_legacy(self) -> list[int]:
        """Upgrade path for tables written before the manifest layer:
        publish a manifest for every COMMITTED legacy version directory
        (``v<N>/_SUCCESS`` present, ``<N>.json`` absent). Without this,
        the first manifest-era commit makes ``versions()`` the source of
        truth and all pre-upgrade history silently vanishes — time
        travel / CDC to legacy versions breaks and vacuum never reclaims
        them. Write-side only (the one listdir is the same crash-recovery
        allowance ``heal`` has); idempotent; vacuumed versions (directory
        gone) and torn claims (no ``_SUCCESS``) are skipped. Returns the
        versions backfilled."""
        import re

        try:
            names = os.listdir(self.table_path)
        except FileNotFoundError:
            return []
        healed: list[int] = []
        for n in names:
            m = re.match(r"^v(\d+)$", n)
            if m is None:
                continue
            v = int(m.group(1))
            if os.path.exists(_mpath(self.table_path, v)):
                continue
            vdir = os.path.join(self.table_path, n)
            if not os.path.exists(os.path.join(vdir, "_SUCCESS")):
                continue
            self.publish(build_manifest(v, vdir))
            healed.append(v)
        return sorted(healed)

    # -- rolled log checkpoints (cold-history cost bound) ----------------------

    def _ckpt_path(self, version: int) -> str:
        return os.path.join(_mdir(self.table_path), f"_ckpt_{version}.json")

    def _latest_log_ckpt(self) -> int:
        """Newest rolled checkpoint version: hint + forward probe in
        CHECKPOINT_EVERY strides (same recovery story as `_latest` —
        the hint is a hint, the checkpoint objects are truth)."""
        try:
            with open(
                os.path.join(_mdir(self.table_path), _LATEST_CKPT)
            ) as fh:
                k = int(fh.read().strip() or 0)
        except (FileNotFoundError, ValueError):
            k = 0
        if k > 0 and not os.path.exists(self._ckpt_path(k)):
            k = 0
        while os.path.exists(self._ckpt_path(k + CHECKPOINT_EVERY)):
            k += CHECKPOINT_EVERY
        return k

    def _write_log_checkpoint(self, version: int) -> None:
        """Roll manifests 1..version into one object, INCREMENTALLY:
        previous checkpoint + the per-commit tail since it — O(EVERY)
        reads per roll, never O(history). Written tmp+rename; losers of
        a concurrent roll race are idempotent (same content)."""
        base = self._latest_log_ckpt()
        manifests: dict[str, Any] = {}
        if base > 0:
            with open(self._ckpt_path(base)) as fh:
                manifests = json.load(fh)["manifests"]
            # drop carried entries whose <v>.json was retired by vacuum
            # (same liveness probe manifests_range does): without this,
            # every roll copies vacuumed versions' full file lists
            # forward FOREVER and checkpoints grow without bound
            manifests = {
                s: m
                for s, m in manifests.items()
                if os.path.exists(_mpath(self.table_path, int(s)))
            }
        for v in range(base + 1, version + 1):
            try:
                manifests[str(v)] = self.manifest(v)
            except FileNotFoundError:
                pass  # torn claim / vacuumed / not-yet-backfilled
        tmp = os.path.join(
            _mdir(self.table_path), f".tmp-{uuid.uuid4().hex}"
        )
        with open(tmp, "w") as fh:
            json.dump(
                {"version": version, "manifests": manifests},
                fh,
                separators=(",", ":"),
            )
        os.rename(tmp, self._ckpt_path(version))
        hint = os.path.join(_mdir(self.table_path), _LATEST_CKPT)
        if self._latest_log_ckpt() <= version:
            tmp2 = os.path.join(
                _mdir(self.table_path), f".tmp-{uuid.uuid4().hex}"
            )
            with open(tmp2, "w") as fh:
                fh.write(str(version))
            os.rename(tmp2, hint)

    def manifests_range(self, lo: int, hi: int) -> dict[int, dict]:
        """All LIVE manifests in [lo, hi] with a bounded content-read
        cost: one rolled checkpoint + per-commit JSONs only for versions
        above it (< CHECKPOINT_EVERY in steady state) or missing from it
        (healed/backfilled after the roll). Liveness comes from
        `versions()` (existence probes, no content reads), so manifests
        retired by vacuum never resurface from an old checkpoint."""
        live = self.versions(lo, hi)
        out: dict[int, dict] = {}
        k = self._latest_log_ckpt()
        if k >= lo and live:
            with open(self._ckpt_path(k)) as fh:
                rolled = json.load(fh)["manifests"]
            alive = set(live)
            for s, m in rolled.items():
                v = int(s)
                if lo <= v <= hi and v in alive:
                    out[v] = m
        for v in live:
            if v not in out:
                out[v] = self.manifest(v)
        return out

    def retire(self, versions: list[int]) -> None:
        """Vacuum companion: drop manifests of physically removed
        versions (the `_latest` hint never regresses, and forward
        probing starts at the hint, so gaps below it are harmless)."""
        for v in versions:
            try:
                os.remove(_mpath(self.table_path, v))
            except FileNotFoundError:
                pass

    # -- read side (listing-free) ---------------------------------------------

    def _hint(self) -> int:
        try:
            with open(os.path.join(_mdir(self.table_path), _LATEST)) as fh:
                return int(fh.read().strip() or 0)
        except (FileNotFoundError, ValueError):
            return 0

    def exists(self) -> bool:
        """True iff this table has a commit log at all (legacy tables
        predating the manifest layer fall back to directory listing)."""
        return self.current_version() > 0

    def await_min_version(self, floor: int, timeout_s: float = 10.0) -> int:
        """Read-your-own-writes fence: block until ``current_version()``
        reaches ``floor`` (a version this process KNOWS was committed —
        e.g. by a DataSource writer whose commit ran in a separate
        Python worker), busting negative dentry caches with a directory
        listing between probes. Raises with captured diagnostics
        (listing tail + hint) instead of letting a caller proceed
        against a stale snapshot. Returns the observed version."""
        import time

        cur = self.current_version()
        if floor <= 0 or cur >= floor:
            if cur > 0:
                note_committed(self.table_path, cur)
            return cur
        mdir = _mdir(self.table_path)
        deadline = time.monotonic() + timeout_s
        delay = 0.02
        while time.monotonic() < deadline:
            try:
                os.listdir(mdir)  # refresh cached dentries
            except OSError:
                pass
            cur = self.current_version()
            if cur >= floor:
                note_committed(self.table_path, cur)
                return cur
            time.sleep(delay)
            delay = min(delay * 2, 0.5)
        try:
            listing = sorted(os.listdir(mdir))[-50:]
        except OSError as exc:
            listing = [f"<listdir failed: {exc}>"]
        try:
            with open(os.path.join(mdir, _LATEST)) as fh:
                hint = fh.read().strip()
        except OSError as exc:
            hint = f"<{exc}>"
        raise RuntimeError(
            "read-your-own-writes fence: committed version "
            f"v{floor} of {self.table_path} is still not visible after "
            f"{timeout_s:.1f}s (current={cur}, _latest hint={hint!r}, "
            f"_manifest listing tail={listing})"
        )

    def _probe_version(self) -> int:
        """Raw probe: `_latest` hint, then roll forward probing single
        manifest files. 0 when no manifest exists. No fence — internal
        to :meth:`current_version` and the fence loops themselves."""
        v = self._hint()
        if v > 0 and not os.path.exists(_mpath(self.table_path, v)):
            # hint points at a retired/never-published version: restart
            # the probe from 0 (recovery; normal operation never regresses)
            v = 0
        while os.path.exists(_mpath(self.table_path, v + 1)):
            v += 1
        return v

    def current_version(self) -> int:
        """Highest PUBLISHED version — FENCED: if the probe resolves
        BELOW this process's committed floor (a version this process
        already witnessed durably committed — ``note_committed``), the
        filesystem is serving a stale view; retry with listdir
        cache-busts and, still stale, raise with diagnostics rather
        than silently hand callers an old snapshot. Cost in the normal
        case: one dict lookup."""
        v = self._probe_version()
        floor = committed_floor(self.table_path)
        if v >= floor:
            return v
        mdir = _mdir(self.table_path)
        if not os.path.isdir(mdir):
            # the table was DROPPED (root removed out from under us)
            # and possibly not recreated yet: the floor no longer
            # applies — forget it rather than failing every future
            # read of a fresh table at the same path
            _COMMITTED_FLOOR.pop(os.path.realpath(self.table_path), None)
            return v
        import time

        deadline = time.monotonic() + 10.0
        delay = 0.02
        while time.monotonic() < deadline:
            try:
                os.listdir(mdir)
            except OSError:
                pass
            v = self._probe_version()
            if v >= floor:
                return v
            time.sleep(delay)
            delay = min(delay * 2, 0.5)
        try:
            listing = sorted(os.listdir(mdir))[-50:]
        except OSError as exc:
            listing = [f"<listdir failed: {exc}>"]
        raise RuntimeError(
            "read-your-own-writes fence: this process committed "
            f"v{floor} of {self.table_path} but version resolution "
            f"still serves v{v} after 10s (_latest hint={self._hint()}, "
            f"_manifest listing tail={listing})"
        )

    def visible_version(self) -> int:
        """Highest version VISIBLE to readers: like
        :meth:`current_version`, but steps DOWN past head manifests
        whose ``txn`` marker refers to a not-yet-committed multi-table
        transaction (sinks/txn.py) — the read side of cross-table
        atomic visibility. Cost: zero for tables never touched by a
        transaction (no marker -> no check); one ``os.path.exists`` per
        marked manifest otherwise. Writers keep building on
        ``current_version`` — a prepared transaction is INEVITABLE
        (roll-forward only), so pending data never vanishes under
        them."""
        from .txn import manifest_is_visible

        v = self.current_version()
        while v > 0:
            try:
                m = self.manifest(v)
            except FileNotFoundError:
                v -= 1  # torn/vacuumed hole below a pending head
                continue
            if manifest_is_visible(m):
                return v
            v -= 1
        return 0

    def manifest(self, version: int) -> dict[str, Any]:
        try:
            with open(_mpath(self.table_path, version)) as fh:
                return json.load(fh)
        except FileNotFoundError:
            raise FileNotFoundError(
                f"version v{version} of {self.table_path} is not published "
                "(never committed, or removed by vacuum)"
            ) from None

    def versions(self, lo: int = 1, hi: int | None = None) -> list[int]:
        """Published versions in [lo, hi] by single-file probes —
        bounded by the version range, never by file count."""
        hi = self.current_version() if hi is None else hi
        return [
            v
            for v in range(max(1, lo), hi + 1)
            if os.path.exists(_mpath(self.table_path, v))
        ]

    def files_for(
        self,
        version: int,
        *,
        role: str = "data",
        prune: tuple[str, Any, Any] | list[tuple[str, Any, Any]] | None = None,
    ) -> tuple[list[str], int]:
        """Absolute parquet paths of commit ``version`` (one role), after
        optional stats pruning — one ``(column, lo, hi)`` or a LIST of
        them (conjunctive, like ANDed predicates: a file skips if ANY
        range is provably disjoint): keep a file iff its manifest
        [min, max] envelope intersects every requested range (files
        without range stats for a column are always kept for that
        conjunct — skipping must be sound, never required). Returns
        (paths, n_skipped)."""
        m = self.manifest(version)
        vdir = os.path.join(self.table_path, f"v{version}")
        prunes: list[tuple[str, Any, Any]] = (
            []
            if prune is None
            else ([prune] if isinstance(prune, tuple) else list(prune))
        )
        kept, skipped = [], 0
        for ent in m["files"]:
            if ent.get("role", "data") != role:
                continue
            disjoint = False
            for col, lo, hi in prunes:
                st = ent.get("columns", {}).get(col)
                if (
                    st is not None
                    and st.get("min") is not None
                    and st.get("max") is not None
                ):
                    try:
                        disjoint = st["max"] < lo or st["min"] > hi
                    except TypeError:
                        # incomparable predicate/stat types (e.g. int
                        # range vs string partition value): cannot
                        # soundly skip on this conjunct
                        disjoint = False
                if not disjoint and lo == hi:
                    # POINT lookup: probe the per-file Bloom (if the
                    # table declared one) — the skip min/max cannot give
                    # on hash-scattered layouts; false positives keep
                    # the file (sound), false negatives are impossible
                    # GIVEN the probe hashes what the build hashed:
                    # probe only when the literal's type FAMILY matches
                    # the file's stored stats family (SQL would CAST a
                    # numeric literal against a string column — '05'
                    # equals 5 there, but b"05" != b"5" here), and only
                    # against enc-2 filters for canonicalized types
                    bl = ent.get("bloom", {}).get(col)
                    if bl is not None and _bloom_probe_safe(
                        bl, lo, st
                    ) and not bloom_might_contain(bl, lo):
                        disjoint = True
                if disjoint:
                    break
            if disjoint:
                skipped += 1
                continue
            kept.append(os.path.join(vdir, ent["path"]))
        return kept, skipped
