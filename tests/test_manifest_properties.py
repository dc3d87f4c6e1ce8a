"""Property-based commit-log invariants (hypothesis): an arbitrary
sequence of merges / deletes / vacuums / simulated crashes over a
manifest table equals a driver-side model replay, every surviving
version's manifest stays exact (file set + row counts), time travel
reproduces each recorded model snapshot, and a crashed publish is always
healed by the next commit — all resolved listing-free."""

from __future__ import annotations

import os
import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pretalx_hub_etl_spark.sinks.manifest import (
    CommitLog,
    forget_committed,
)
from pretalx_hub_etl_spark.sinks.merge import MergeSink

KEYS = st.integers(min_value=0, max_value=10)
VALS = st.integers(min_value=-50, max_value=50)
SNAP = st.dictionaries(KEYS, VALS, min_size=1, max_size=6)
# each step: (upserts, deletes, crash_publish_of_this_commit)
STEP = st.tuples(SNAP, st.sets(KEYS, max_size=3), st.booleans())


def _df(spark, snap: dict):
    return spark.createDataFrame(
        [(k, v) for k, v in snap.items()], "k long, v long"
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base=SNAP, steps=st.lists(STEP, min_size=1, max_size=3))
def test_commit_log_model_replay_with_crashes(
    spark, tmp_path_factory, base, steps
):
    root = tmp_path_factory.mktemp("mprop") / uuid.uuid4().hex
    sink = MergeSink(str(root), key="k")
    sink.init(_df(spark, base))
    log = CommitLog(sink.path)

    state = dict(base)
    snapshots = {1: dict(state)}  # model state per committed version
    for upserts, deletes, crash in steps:
        state.update(upserts)
        for k in deletes:
            state.pop(k, None)
        sink.merge(
            spark,
            _df(spark, upserts),
            deletes=_df(spark, {k: 0 for k in deletes})
            if deletes
            else None,
        )
        v = log.current_version()
        snapshots[v] = dict(state)
        if crash:
            # simulate the winner dying between rename-claim and
            # publish: retract the manifest and regress the hint
            os.remove(os.path.join(sink.path, "_manifest", f"{v}.json"))
            forget_committed(sink.path)  # a crash loses the floor too
            with open(
                os.path.join(sink.path, "_manifest", "_latest"), "w"
            ) as fh:
                fh.write(str(v - 1))
            # a crashed commit is INVISIBLE until healed: reads serve
            # the prior version (consistency during the gap)
            assert log.current_version() == v - 1
            got = {r.k: r.v for r in sink.read(spark).collect()}
            assert got == snapshots[v - 1]
            # the next writer heals it: commit a no-op-shaped merge
            sink.merge(spark, _df(spark, {0: state.get(0, 0)}))
            state[0] = state.get(0, 0)
            snapshots[v] = dict(snapshots[v])  # healed, now visible
            v2 = log.current_version()
            assert v2 == v + 1
            snapshots[v2] = dict(state)

    # current state == model
    got = {r.k: r.v for r in sink.read(spark).collect()}
    assert got == state

    # every published version: manifest is exact and time travel
    # reproduces the recorded model snapshot, listing-free
    for v in log.versions():
        m = log.manifest(v)
        assert m["version"] == v
        assert sum(f["rows"] for f in m["files"]) == len(snapshots[v])
        trav = {
            r.k: r.v for r in sink.read_version(spark, v).collect()
        }
        assert trav == snapshots[v], f"v{v} snapshot drift"

    # vacuum to the last version: history gone, current intact,
    # retired manifests deleted
    victims = sink.vacuum(keep_last=1)
    for v in victims:
        assert not os.path.exists(
            os.path.join(sink.path, "_manifest", f"{v}.json")
        )
    got = {r.k: r.v for r in sink.read(spark).collect()}
    assert got == state
