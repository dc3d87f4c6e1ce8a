"""ST18: exactly-once multi-table streaming fan-out.

One stream, N lakehouse tables, atomic per microbatch: each batch
commits through the S45 multi-table transaction (sinks/txn.py), so a
reader either sees the batch in EVERY destination table or in NONE —
and a replayed batch (restart from checkpoint) commits nothing twice.

``fanout_sink(coordinator, tables)`` builds the ``foreachBatch``
callable:

>>> sink = fanout_sink("/pipelines/orders_fanout", {
...     bronze_path: lambda b: b,                       # raw append
...     silver_path: lambda b: b.groupBy("k").agg(...), # keyed upsert
... })
>>> stream.writeStream.foreachBatch(sink).option(
...     "checkpointLocation", ckpt).start()

Routing follows each table's stored kind: CoW tables take the batch as
an APPEND, MoR tables as a keyed UPSERT delta (INSERT-is-upsert).

Exactly-once across restarts: the COORDINATOR is the dedup record, not
Spark state. Each batch's intent carries ``stream_batch_id``; a batch
is committed iff a committed intent with that id exists. The callback
heals pending transactions first (a crash mid-publish completes, never
repeats), then answers "did batch B already commit?" from the
coordinator: a side lower-bound file (``_stream_state.json``, advanced
AFTER commit) short-circuits the common case, and the intent scan
covers the crash window between commit and the lower-bound write —
the window that a bare side-file design double-loads. Committed
intents at-or-below the lower bound are garbage-collected (they are no
longer needed as dedup witnesses); above it they are kept (``gc``'s
``keep`` filter).

Contract: ONE coordinator directory per (stream checkpoint, fan-out) —
Spark batch ids are only unique within a checkpoint, so sharing a
coordinator across streams would cross-deduplicate them (same 1:1
pairing rule as a sink checkpoint itself). Sequential microbatches per
stream are guaranteed by Spark; concurrent DIFFERENT streams need
separate coordinators.

No reference counterpart; composes ST16 (table as sink) with S45
(multi-table atomicity) the way the public Delta docs recommend
idempotent foreachBatch writes (txnAppId/txnVersion), generalized to
N tables per batch.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any, Callable

from pyspark.sql import DataFrame

from ..sinks.manifest import CommitLog
from ..sinks.txn import LakehouseTransaction
from ..sinks.txn import gc as txn_gc
from ..sinks.txn import heal as txn_heal

_STATE = "_stream_state.json"


def _state_lb(coord: str) -> int:
    try:
        with open(os.path.join(coord, _STATE)) as fh:
            return int(json.load(fh).get("last_batch_id", -1))
    except (FileNotFoundError, ValueError):
        return -1


def _write_state_lb(coord: str, batch_id: int) -> None:
    tmp = os.path.join(coord, f".state-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump({"last_batch_id": batch_id}, fh)
    os.replace(tmp, os.path.join(coord, _STATE))


def _batch_committed(coord: str, batch_id: int) -> bool:
    """The crash-window probe: a COMMITTED intent carrying this batch
    id exists. O(intents above the lower bound) tiny JSON reads — on
    the happy path the lower-bound file short-circuits before this."""
    if not os.path.isdir(coord):
        return False
    for fn in os.listdir(coord):
        if not fn.endswith(".json") or fn == _STATE:
            continue
        try:
            with open(os.path.join(coord, fn)) as fh:
                intent = json.load(fh)
        except (FileNotFoundError, ValueError):
            continue
        if intent.get("stream_batch_id") != batch_id:
            continue
        if os.path.exists(
            os.path.join(coord, f"{intent['id']}.committed")
        ):
            return True
    return False


def fanout_sink(
    coordinator: str,
    tables: dict[str, Callable[[DataFrame], DataFrame]],
) -> Callable[[DataFrame, int], None]:
    """Build the exactly-once multi-table ``foreachBatch`` callable.

    ``tables``: destination table path -> transform of the batch frame
    into that table's rows (identity for raw mirrors). Every
    destination must already exist with stored props (kind; merge key
    for MoR)."""
    if not tables:
        raise ValueError("fanout_sink needs at least one table")
    coord = os.path.abspath(coordinator)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        # 1) roll forward anything a previous crash left mid-publish
        txn_heal(coord)
        # 2) replay dedup: lower bound fast path, intent scan for the
        #    commit-vs-lower-bound crash window
        lb = _state_lb(coord)
        if batch_id <= lb or _batch_committed(coord, batch_id):
            return
        # 3) one multi-table transaction for the whole batch; a staging
        #    failure (constraint violation, executor loss) ABORTS so a
        #    Spark batch retry never accumulates orphaned stage dirs
        txn = LakehouseTransaction(coord)
        try:
            for path, transform in tables.items():
                rows = transform(batch_df)
                kind = CommitLog(path).table_props().get("kind", "cow")
                if kind == "mor":
                    txn.stage_mor_upsert(path, source=rows)
                else:
                    txn.stage_append(path, rows)
            txn.commit(extra={"stream_batch_id": batch_id})
        except BaseException:
            if txn._state == "open":
                txn.abort()  # post-prepare failures roll FORWARD (heal)
            raise
        # 4) advance the dedup lower bound, then reclaim intents at or
        #    below it (they are no longer needed as replay witnesses)
        _write_state_lb(coord, batch_id)
        txn_gc(
            coord,
            keep=lambda i: i.get("stream_batch_id", batch_id + 1)
            > batch_id,
        )

    return _sink
