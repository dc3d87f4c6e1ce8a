"""CONVERT TO LAKEHOUSE: adopt an existing parquet directory in place.

The Delta ``CONVERT TO DELTA parquet.`/path``` shape: a directory of
plain parquet files (flat or hive-partitioned) becomes a versioned
lakehouse table WITHOUT rewriting a byte — v1 is built by HARDLINKING
the existing files under ``<dir>/v1/`` (preserving relative layout, so
hive partition columns keep reconstructing), footer stats land in the
commit manifest, and the table properties make the result
path-discoverable (``register_path``). The original files stay where
they were (immutable, shared inodes — same contract as SHALLOW CLONE);
at 100 TB this is the difference between a metadata migration and a
table-sized copy job.

One deliberate directory listing: conversion is a one-time migration
op — the listing bootstraps the manifest that makes every LATER read
listing-free.
"""

from __future__ import annotations

import os

from .manifest import CommitLog, build_manifest
from .merge import MergeSink, _versions


def convert_to_lakehouse(
    src_dir: str,
    key: str | None = None,
    bloom_on: str | None = None,
) -> MergeSink:
    """Convert ``src_dir`` (plain/hive-partitioned parquet) into a
    lakehouse table rooted at the SAME path; returns its MergeSink.
    Raises if the directory is already a lakehouse table or holds no
    parquet files. The ORIGINAL loose files remain beside ``v1/`` and
    may be deleted once nothing else reads them (the hardlinks keep the
    data alive — shared inodes); until then, reading the raw directory
    with a plain ``spark.read.parquet(dir)`` would double-count. ``key`` (optional) stores the merge key for DML
    routing; ``bloom_on`` builds the S33 per-file index during
    conversion (one column read per file, the only data touched)."""
    import shutil
    import uuid

    log = CommitLog(src_dir)
    if log.exists() or _versions(src_dir) or log.table_props():
        raise FileExistsError(
            f"{src_dir} is already a lakehouse table (CONVERT is for "
            "plain parquet directories)"
        )
    rels: list[str] = []
    for root, dirs, files in os.walk(src_dir):
        # never descend into hidden dirs (in-flight stages, metadata)
        dirs[:] = [d for d in dirs if not d.startswith(".")]
        for f in files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                rels.append(
                    os.path.relpath(os.path.join(root, f), src_dir)
                )
    if not rels:
        raise FileNotFoundError(f"no parquet files under {src_dir}")
    stage = os.path.join(src_dir, f".stage-{uuid.uuid4().hex}")
    os.makedirs(stage)
    try:
        for rel in rels:
            dst = os.path.join(stage, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            src = os.path.join(src_dir, rel)
            try:
                os.link(src, dst)  # zero-copy: shared inode
            except OSError:
                shutil.copy2(src, dst)  # cross-device fallback
        open(os.path.join(stage, "_SUCCESS"), "w").close()
        manifest = build_manifest(1, stage, bloom_on=bloom_on)
        os.rename(stage, os.path.join(src_dir, "v1"))
        log.publish(manifest)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    # hive partition fields from the adopted layout -> table props, so
    # later commits and DESCRIBE agree with the physical partitioning
    part_cols: list[str] = []
    for rel in rels:
        for seg in rel.split(os.sep)[:-1]:
            if "=" in seg:
                c = seg.partition("=")[0]
                if c not in part_cols:
                    part_cols.append(c)
    props: dict = {"kind": "cow"}
    if key:
        props["merge_key"] = key
    if part_cols:
        props["partition_by"] = part_cols
    if bloom_on:
        props["bloom_on"] = bloom_on
    log.write_table_props(props)
    return MergeSink(
        src_dir,
        key=key or "_",
        partition_by=part_cols or None,
        bloom_on=bloom_on,
    )
