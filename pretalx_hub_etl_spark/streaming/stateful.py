"""Custom stateful streaming operator via ``applyInPandasWithState``.

The engine's escape hatch for stateful semantics Spark's built-in windowed
aggregations can't express (SURVEY.md §2.9 note): arbitrary per-key state
carried across micro-batches, updated in Arrow-batched pandas.

``running_totals`` is the reference implementation: per-key running
count/sum that persists across batches — the streaming generalization of
the reconcile job's "current target state". State is one tiny tuple per
key, so at scale memory is O(|keys|), partitioned by the grouping key.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key bigint, n bigint, total double"
STATE_SCHEMA = "n bigint, total double"

# NOTE: the per-group update functions are defined INSIDE their wrapper
# functions below, not at module level. cloudpickle serializes
# module-level functions BY REFERENCE (the worker re-imports this
# module — ModuleNotFoundError under the driver's plain path-injected
# session, the round-4 lesson in ARCHITECTURE.md), but closures pickle
# BY VALUE with only installed-library imports — the rule applied to
# every function shipped to workers.

UPSERT_OUTPUT_SCHEMA = "key bigint, value double, op_flag string"
UPSERT_STATE_SCHEMA = "last_value double"


def upsert_flags(stream_df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Streaming reconcile (ST5, streaming form): per-key create/update/noop.

    The batch flagship (``operators.reconcile``) recomputes the whole
    create/update/delete plan against a target snapshot; this is the
    incremental form — per-key state holds the last applied value, each
    micro-batch emits the op the sink should perform for keys that
    arrived. State is one scalar per key, partitioned by key.

    Deletes are intentionally absent: a stream can't observe absence —
    deletion arrives as an explicit tombstone event (handle upstream) or
    via a periodic batch anti-join sweep against the full snapshot.
    """
    def upsert(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        import pandas as pd

        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        new = float(rows["value"].iloc[-1])  # last arrival in-batch wins
        if not state.exists:
            flag = "create"
        elif float(state.get[0]) != new:
            flag = "update"
        else:
            flag = "noop"
        state.update((new,))
        yield pd.DataFrame(
            {"key": [key[0]], "value": [new], "op_flag": [flag]}
        )

    prepared = stream_df.selectExpr(
        f"{key_col} AS key", f"CAST({value_col} AS DOUBLE) AS value"
    )
    return prepared.groupBy("key").applyInPandasWithState(
        upsert,
        outputStructType=UPSERT_OUTPUT_SCHEMA,
        stateStructType=UPSERT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals(stream_df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    Input: a streaming DataFrame; output (update mode): one row per key per
    batch with the cumulative totals so far.
    """
    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"key": [key[0]], "n": [n], "total": [round(total, 2)]}
        )

    prepared = stream_df.selectExpr(
        f"{key_col} AS key", f"CAST({value_col} AS DOUBLE) AS value"
    )
    return prepared.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- transformWithStateInPandas (Spark 4 successor API) ---------------------

# Discovery + injection of the protobuf runtime TWS needs lives in
# protobuf_compat; re-exported here so callers keep one import site.
from .protobuf_compat import enable_tws, tws_available  # noqa: E402,F401


def running_totals_tws(stream_df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """``running_totals`` on the transformWithStateInPandas API (Spark 4).

    The successor to applyInPandasWithState: state lives in named typed
    handles (ValueState/ListState/MapState) managed by the state store —
    composable, TTL-able, and queryable — instead of one opaque per-key
    tuple. Same semantics as ``running_totals``; kept alongside it because
    real deployments migrate operator-by-operator.

    Requires a discoverable protobuf runtime (``tws_available()``) —
    ``enable_tws`` injects it into driver and workers at runtime and
    switches the session to the RocksDB state-store provider (TWS needs
    column families; RocksDB is also the 100-TB-correct provider). On
    hosts with no protobuf anywhere, use ``running_totals``
    (applyInPandasWithState), same test contract, no extra dependency.
    """
    spark = stream_df.sparkSession
    if not enable_tws(spark):
        raise NotImplementedError(
            "transformWithStateInPandas requires google.protobuf and no "
            "pure-python runtime was found on this host "
            "(set SPARK_GRAFT_PROTOBUF_PATH)"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                # TWS hands the processor positionally-named non-key
                # columns (observed: ['key', '_1']) — select by position,
                # not by the pre-groupBy alias.
                total += float(pdf.iloc[:, -1].sum())
            self._state.update((n, total))
            yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})

        def close(self) -> None:
            pass

    prepared = stream_df.select(
        F.col(key_col).alias("key"), F.col(value_col).alias("__v")
    )
    return prepared.groupBy("key").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


MAPCOUNT_OUTPUT_SCHEMA = (
    "key bigint, n_seen bigint, subkey string, cnt bigint"
)


def running_subkey_counts_tws(
    stream_df: DataFrame, key_col: str, subkey_col: str
) -> DataFrame:
    """Per-(key, subkey) running counts on TWS **MapState** — the third
    typed-state handle (ValueState: totals; ListState: top-n).

    MapState is the right container for per-key sub-dictionaries
    (per-user event-type counters, per-session feature maps): updates
    touch ONLY the subkeys present in the batch — ``getValue``/
    ``updateValue`` point ops against the state store, not a rewrite of
    the whole per-key blob the ValueState encoding would need. Each
    batch that contains a key emits that key's FULL current map with a
    strictly-increasing ``n_seen``, so a consumer selects each key's
    final map as its max-``n_seen`` emission; final counts are
    arrival-order independent, so no key-routing construction is needed.
    """
    spark = stream_df.sparkSession
    if not enable_tws(spark):
        raise NotImplementedError(
            "transformWithStateInPandas requires google.protobuf and no "
            "pure-python runtime was found on this host "
            "(set SPARK_GRAFT_PROTOBUF_PATH)"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SubkeyCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._map = handle.getMapState(
                "counts", "subkey string", "cnt bigint"
            )
            self._seen = handle.getValueState("seen", "n_seen bigint")

        def handleInputRows(self, key, rows, timerValues):
            seen = int(self._seen.get()[0]) if self._seen.exists() else 0
            delta: dict[str, int] = {}
            for pdf in rows:
                seen += len(pdf)
                for s in pdf.iloc[:, -1]:
                    delta[str(s)] = delta.get(str(s), 0) + 1
            for sk, d in delta.items():
                prev = (
                    int(self._map.getValue((sk,))[0])
                    if self._map.containsKey((sk,))
                    else 0
                )
                self._map.updateValue((sk,), (prev + d,))
            self._seen.update((seen,))
            items = sorted(
                (str(k_[0]), int(v_[0])) for k_, v_ in self._map.iterator()
            )
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(items),
                    "n_seen": [seen] * len(items),
                    "subkey": [s for s, _ in items],
                    "cnt": [c for _, c in items],
                }
            )

        def close(self) -> None:
            pass

    prepared = stream_df.select(
        F.col(key_col).alias("key"),
        F.col(subkey_col).cast("string").alias("__s"),
    )
    return prepared.groupBy("key").transformWithStateInPandas(
        SubkeyCounts(),
        outputStructType=MAPCOUNT_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


TOPN_OUTPUT_SCHEMA = "key bigint, n_seen bigint, rank bigint, value bigint"


def running_topn_tws(
    stream_df: DataFrame, key_col: str, value_col: str, n: int = 3
) -> DataFrame:
    """Per-key running top-``n`` values across micro-batches on TWS
    **ListState** — the second typed-state handle (``running_totals_tws``
    covers ValueState).

    ListState is the right container for bounded ranked state: ``put``
    rewrites the ≤n survivors each batch, state stays O(n) per key no
    matter how long the stream runs. Each batch that contains a key
    emits that key's current top-n as ranked rows together with
    ``n_seen`` (rows observed so far — strictly increasing per key, so a
    consumer selects each key's final answer as its max-``n_seen``
    emission). The top-n MULTISET of a stream is arrival-order
    independent, which is what makes this operator's final state
    oracle-able without any batch-routing construction.
    """
    spark = stream_df.sparkSession
    if not enable_tws(spark):
        raise NotImplementedError(
            "transformWithStateInPandas requires google.protobuf and no "
            "pure-python runtime was found on this host "
            "(set SPARK_GRAFT_PROTOBUF_PATH)"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTopN(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._top = handle.getListState("topn", "value bigint")
            self._seen = handle.getValueState("seen", "n_seen bigint")

        def handleInputRows(self, key, rows, timerValues):
            vals = [int(t[0]) for t in self._top.get()]
            seen = int(self._seen.get()[0]) if self._seen.exists() else 0
            for pdf in rows:
                seen += len(pdf)
                vals.extend(int(v) for v in pdf.iloc[:, -1])
            vals = sorted(vals, reverse=True)[:n]
            self._top.put([(v,) for v in vals])
            self._seen.update((seen,))
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(vals),
                    "n_seen": [seen] * len(vals),
                    "rank": list(range(1, len(vals) + 1)),
                    "value": vals,
                }
            )

        def close(self) -> None:
            pass

    prepared = stream_df.select(
        F.col(key_col).alias("key"),
        F.col(value_col).cast("long").alias("__v"),
    )
    return prepared.groupBy("key").transformWithStateInPandas(
        RunningTopN(),
        outputStructType=TOPN_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


TIMER_OUTPUT_SCHEMA = (
    "key bigint, n bigint, total double, finalize_ms bigint"
)
TIMER_STATE_SCHEMA = "n bigint, total double, last_ms bigint, timer_ms bigint"


def idle_finalize_tws(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str = "ts",
    idle_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """Per-key idle-timeout finalization on TWS **event-time timers** —
    the fourth leg of the typed-state API (ValueState/ListState/
    MapState/timers): nothing is emitted on input; a key's totals are
    emitted ONLY from ``handleExpiredTimer`` once the global watermark
    passes ``last event + idle_ms`` — the "close the session when the
    user goes quiet" shape (cart abandonment, session finalization,
    TTL-style compaction triggers).

    Timer discipline: state carries the registered expiry; each batch
    that moves a key's max event time DELETES the stale timer and
    registers the new one, so exactly one timer (and thus one
    emission) exists per key regardless of how batches route rows —
    arrival-order independence comes from the max() in state, not from
    any key-routing construction. ``finalize_ms`` is the fired timer's
    own expiry timestamp (``ExpiredTimerInfo.getExpiryTimeInMs``), so
    the oracle can check the timer VALUE flowed through expiry, not
    just that rows appeared. State is cleared on fire — a later event
    for the key would start a fresh accumulation (not exercised by the
    bounded replay, which ends after one firing per key).
    """
    spark = stream_df.sparkSession
    if not enable_tws(spark):
        raise NotImplementedError(
            "transformWithStateInPandas requires google.protobuf and no "
            "pure-python runtime was found on this host "
            "(set SPARK_GRAFT_PROTOBUF_PATH)"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class IdleFinalize(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState(
                "acc", TIMER_STATE_SCHEMA
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total, last_ms, timer_ms = (
                self._state.get() if self._state.exists() else (0, 0.0, -1, -1)
            )
            for pdf in rows:
                n += len(pdf)
                # positional non-key columns (the observed TWS naming),
                # oldest convention: [-2] = value, [-1] = ts
                total += float(pdf.iloc[:, -2].sum())
                # pandas datetime64[ns/us] -> epoch ms, floor
                batch_max = pdf.iloc[:, -1].max()
                ms = int(pd.Timestamp(batch_max).value // 1_000_000)
                last_ms = max(last_ms, ms)
            new_timer = last_ms + idle_ms
            if new_timer != timer_ms:
                if timer_ms >= 0:
                    self._handle.deleteTimer(timer_ms)
                self._handle.registerTimer(new_timer)
            self._state.update((n, total, last_ms, new_timer))
            return iter(())  # emission happens only on expiry

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if not self._state.exists():  # already finalized
                return
            n, total, _last_ms, _timer_ms = self._state.get()
            self._state.clear()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "n": [n],
                    "total": [total],
                    "finalize_ms": [expiredTimerInfo.getExpiryTimeInMs()],
                }
            )

        def close(self) -> None:
            pass

    # the event-time column keeps its NAME (and thus its watermark
    # attribute) — renaming could detach the caller's withWatermark tag
    prepared = stream_df.select(
        F.col(key_col).alias("key"),
        F.col(value_col).alias("__v"),
        F.col(ts_col),
    )
    return prepared.groupBy("key").transformWithStateInPandas(
        IdleFinalize(),
        outputStructType=TIMER_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )
