"""Property-based reconcile invariants (SURVEY.md §5.2.4, hypothesis)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pretalx_hub_etl_spark.operators.reconcile import reconcile

KEYS = st.integers(min_value=0, max_value=30)
PAYLOADS = st.sampled_from(["p0", "p1", "p2", None])
SNAPSHOT = st.dictionaries(KEYS, PAYLOADS, max_size=25)


def _df(spark, snap: dict):
    rows = [(f"k{k}", v) for k, v in snap.items()]
    return spark.createDataFrame(rows, "k string, payload string")


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(src=SNAPSHOT, tgt=SNAPSHOT)
def test_reconcile_partition_invariants(spark, src, tgt):
    if not src and not tgt:
        return
    plan = reconcile(
        _df(spark, src), _df(spark, tgt), key=["k"], compare=["payload"]
    ).collect()
    flags = {r.k: r.op_flag for r in plan}

    # exactly one verdict per key in src ∪ tgt
    assert set(flags) == {f"k{k}" for k in set(src) | set(tgt)}
    for k in set(src) | set(tgt):
        kk = f"k{k}"
        if k in src and k not in tgt:
            assert flags[kk] == "create"
        elif k in tgt and k not in src:
            assert flags[kk] == "delete"
        elif src[k] == tgt[k]:
            assert flags[kk] == "noop"
        else:
            assert flags[kk] == "update"
