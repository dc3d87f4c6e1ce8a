"""Property-based as-of join check against a per-row Python reference."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pretalx_hub_etl_spark.operators.joins import asof_join

KEYS = st.integers(min_value=0, max_value=3)
TS = st.integers(min_value=0, max_value=50)

LEFT = st.lists(st.tuples(KEYS, TS), min_size=1, max_size=15)
# right side unique per (key, ts): the operator's documented determinism
# precondition (ties among identical (key, ts) rows are arbitrary)
RIGHT = st.dictionaries(st.tuples(KEYS, TS), st.integers(0, 99), max_size=15)


def _reference(left, right):
    out = {}
    for i, (k, ts) in enumerate(left):
        best = None
        for (rk, rts), v in right.items():
            if rk == k and rts <= ts and (best is None or rts > best[0]):
                best = (rts, v)
        out[i] = best
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=LEFT, right=RIGHT)
def test_asof_join_matches_reference_model(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)], "row_id long, k long, ts long"
    )
    rdf = spark.createDataFrame(
        [(k, ts, v) for (k, ts), v in right.items()] or [(None, None, None)],
        "k long, ts long, v long",
    )
    if not right:
        rdf = rdf.filter("k IS NOT NULL")
    got = {
        r.row_id: (r.matched_ts, r.matched_v)
        for r in asof_join(ldf, rdf, on="k", right_values=["v"]).collect()
    }
    want = {
        i: (None, None) if best is None else best
        for i, best in _reference(left, right).items()
    }
    assert got == want
