"""Runtime discovery of a pure-python ``google.protobuf`` for TWS.

``transformWithStateInPandas`` (Spark 4's typed-state successor to
``applyInPandasWithState``) speaks a protobuf protocol between the Python
worker and the JVM state server, so it needs ``google.protobuf``
importable on BOTH the driver and the Python workers. This container's
site-packages ships PySpark without protobuf, but protobuf's pure-python
runtime is frequently present elsewhere on a host (vendored inside other
public tooling, a second interpreter's site-packages, a conda env). This
module finds such a copy at runtime and injects it:

- driver side: ``sys.path`` insertion + the documented
  ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` escape hatch (public
  protobuf API, ``google/protobuf/runtime_version.py``) for the
  patch-level gencode/runtime skew between PySpark's checked-in gencode
  and whatever runtime we found;
- worker side: the package is zipped once and shipped with
  ``sc.addPyFile`` (workers put the zip on ``sys.path`` via the normal
  python-includes mechanism), and the version-check env var rides on
  ``sc.environment``, which PySpark snapshots into every PythonFunction's
  worker env (``pyspark/core/rdd.py:_prepare_for_python_RDD``).

Both injection channels are *runtime* channels, so this works on an
externally-created plain SparkSession (the verify driver's) — no env vars
needed before JVM launch. Nothing is vendored into the repo: discovery
only, honest ``tws_available()`` gate when no copy exists.

TWS additionally requires a state-store provider that supports multiple
column families (one per named state variable); ``enable_tws`` sets the
RocksDB provider, which is also the right provider at 100 TB (incremental
checkpointing, state far larger than executor heap).
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile

from pyspark.sql import SparkSession

#: Probe list for a pure-python google/protobuf package dir (the parent
#: directory that CONTAINS ``google/``). First match wins; the env var
#: lets a deployment point at its own copy.
_CANDIDATE_PARENTS: tuple[str, ...] = (
    os.environ.get("SPARK_GRAFT_PROTOBUF_PATH", ""),
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
    "/usr/local/lib/google-cloud-sdk/platform/google_appengine",
    os.path.expanduser("~/google-cloud-sdk/platform/google_appengine"),
)

_VERSION_CHECK_ENV = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _native_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def find_protobuf_parent() -> str | None:
    """Directory whose ``google/protobuf/__init__.py`` exists, or None."""
    for parent in _CANDIDATE_PARENTS:
        if parent and os.path.isfile(
            os.path.join(parent, "google", "protobuf", "__init__.py")
        ):
            return parent
    return None


def ensure_driver_protobuf() -> bool:
    """Make ``google.protobuf`` importable in THIS process. Idempotent."""
    os.environ[_VERSION_CHECK_ENV] = "true"
    if _native_protobuf():
        return True
    parent = find_protobuf_parent()
    if parent is None:
        return False
    if parent not in sys.path:
        sys.path.insert(0, parent)
    return _native_protobuf()


def tws_available() -> bool:
    """True iff a protobuf runtime is importable or discoverable."""
    return _native_protobuf() or find_protobuf_parent() is not None


def _protobuf_zip(parent: str) -> str:
    """Zip ``google/protobuf`` (pure-python only) for ``addPyFile``.

    Cached per-process in the temp dir, keyed by source path hash. The
    zip carries a pkgutil-style ``google/__init__.py`` because zipimport
    needs an explicit package marker where the source tree relies on a
    PEP-420 namespace package.
    """
    import hashlib

    tag = hashlib.md5(parent.encode()).hexdigest()[:10]
    out = os.path.join(
        tempfile.gettempdir(), f"phe_protobuf_runtime_{tag}.zip"
    )
    if os.path.exists(out):
        return out
    src = os.path.join(parent, "google", "protobuf")
    skip_dirs = {"pyext", "testdata", "blaze-out", "__pycache__"}
    tmp = out + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "google/__init__.py",
            "__path__ = __import__('pkgutil').extend_path(__path__, __name__)\n",
        )
        for root, dirs, files in os.walk(src):
            dirs[:] = [d for d in dirs if d not in skip_dirs]
            for name in files:
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                rel = os.path.relpath(full, parent)
                zf.write(full, rel)
    os.replace(tmp, out)
    return out


def enable_tws(spark: SparkSession) -> bool:
    """Wire TWS prerequisites into a LIVE session. Returns success.

    Safe on any session (including externally-created ones) and
    idempotent; returns False — without side effects beyond env probing —
    when no protobuf runtime exists on the host.
    """
    if not ensure_driver_protobuf():
        return False
    sc = spark.sparkContext
    # Snapshotted into each subsequently-created PythonFunction's worker
    # env: covers the version check inside the worker's pb2 import.
    sc.environment[_VERSION_CHECK_ENV] = "true"
    parent = None if _native_importable_without_path() else find_protobuf_parent()
    if parent is not None:
        # PYTHONPATH in the function's envVars is MERGED into the worker
        # process's PYTHONPATH by PythonWorkerFactory — and, critically,
        # it reaches the TWS *driver worker* (StreamingPythonRunner),
        # which imports the pb2 modules at module-import time, before the
        # python-includes mechanism ever runs. Same-host path: exact for
        # local mode; for a real cluster the addPyFile zip below covers
        # task workers and deployments ship protobuf properly.
        prev = sc.environment.get("PYTHONPATH", "")
        if parent not in prev.split(os.pathsep):
            sc.environment["PYTHONPATH"] = (
                parent + (os.pathsep + prev if prev else "")
            )
        zip_path = _protobuf_zip(parent)
        try:
            sc.addPyFile(zip_path)
        except Exception:
            pass  # already added this session
    try:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
    except Exception:
        return False
    return True


def _native_importable_without_path() -> bool:
    """Would a FRESH worker (no injected sys.path) see google.protobuf?

    True only if protobuf resolves from site-packages rather than from a
    directory this module inserted into ``sys.path``.
    """
    try:
        import google.protobuf as gp

        origin = os.path.dirname(os.path.dirname(os.path.dirname(gp.__file__)))
        return origin not in {
            p for p in _CANDIDATE_PARENTS if p
        } and "site-packages" in gp.__file__
    except ImportError:
        return False
