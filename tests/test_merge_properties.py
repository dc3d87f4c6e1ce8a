"""Property-based MergeSink invariants (hypothesis): an arbitrary sequence
of merges + deletes over the versioned table equals a driver-side dict
replay (source-wins upsert, delete removes the key), and every historical
version stays readable (torn-write safety)."""

from __future__ import annotations

import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pretalx_hub_etl_spark.sinks.merge import MergeSink, current_version_path

KEYS = st.integers(min_value=0, max_value=12)
VALS = st.integers(min_value=-100, max_value=100)
SNAP = st.dictionaries(KEYS, VALS, min_size=1, max_size=8)
STEP = st.tuples(SNAP, st.sets(KEYS, max_size=4))  # (upserts, deletes)


def _df(spark, snap: dict):
    return spark.createDataFrame(
        [(k, float(v)) for k, v in snap.items()], "k long, v double"
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base=SNAP, steps=st.lists(STEP, min_size=1, max_size=3))
def test_merge_sequence_equals_dict_replay(spark, tmp_path_factory, base, steps):
    root = tmp_path_factory.mktemp("merge_prop") / uuid.uuid4().hex
    sink = MergeSink(str(root), key="k")
    sink.init(_df(spark, base))

    state = dict(base)
    for upserts, deletes in steps:
        state.update(upserts)
        for k in deletes:
            state.pop(k, None)
        got = sink.merge(
            spark,
            _df(spark, upserts),
            deletes=spark.createDataFrame([(k,) for k in deletes], "k long")
            if deletes
            else None,
        )
        assert {r.k: r.v for r in got.collect()} == {
            k: float(v) for k, v in state.items()
        }

    # every version remains readable and the version chain is complete
    assert current_version_path(sink.path).endswith(f"v{len(steps) + 1}")
    for v in range(1, len(steps) + 2):
        assert spark.read.parquet(str(root / f"v{v}")).count() >= 0
