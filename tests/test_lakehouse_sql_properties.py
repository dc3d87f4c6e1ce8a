"""Property-based invariants for the round-11 SQL surface (hypothesis):
an arbitrary sequence of SQL DML statements (INSERT / UPDATE / DELETE)
against a MoR lakehouse table equals a driver-side dict replay — with
every DELETE travelling as a deletion-vector commit — and arbitrary
batch-writer append sequences equal list concatenation with every
intermediate version still readable."""

from __future__ import annotations

import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pretalx_hub_etl_spark.plans.lakehouse_sql import LakehouseSqlCatalog
from pretalx_hub_etl_spark.sinks.merge import MergeSink
from pretalx_hub_etl_spark.sinks.mor import MorTable

KEYS = st.integers(min_value=0, max_value=9)
VALS = st.integers(min_value=-50, max_value=50)
SNAP = st.dictionaries(KEYS, VALS, min_size=1, max_size=5)

# a DML step: ("insert", {k: v}) | ("update", delta, mod) | ("delete", mod)
STEP = st.one_of(
    st.tuples(st.just("insert"), SNAP),
    st.tuples(
        st.just("update"),
        st.integers(min_value=1, max_value=7),
        st.integers(min_value=2, max_value=4),
    ),
    st.tuples(st.just("delete"), st.integers(min_value=2, max_value=4)),
)


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
def test_sql_dml_sequence_equals_dict_replay(
    spark, tmp_path_factory, base, steps
):
    root = tmp_path_factory.mktemp("dml_prop") / uuid.uuid4().hex
    t = MorTable(str(root), key="k")
    t.init(_df(spark, base))
    cat = LakehouseSqlCatalog(spark)
    name = f"p{uuid.uuid4().hex[:8]}"
    cat.register_mor(name, t.path, key="k")

    state = dict(base)
    for step in steps:
        if step[0] == "insert":
            snap = step[1]
            values = ", ".join(f"({k}, {v})" for k, v in snap.items())
            cat.sql(f"INSERT INTO {name} VALUES {values}")
            state.update(snap)  # keyed table: INSERT is upsert
        elif step[0] == "update":
            _, delta, mod = step
            cat.sql(
                f"UPDATE {name} SET v = v + {delta} WHERE k % {mod} = 0"
            )
            state = {
                k: (v + delta if k % mod == 0 else v)
                for k, v in state.items()
            }
        else:
            _, mod = step
            cat.sql(f"DELETE FROM {name} WHERE k % {mod} = 0")
            state = {k: v for k, v in state.items() if k % mod != 0}
        got = {
            r.k: r.v
            for r in cat.sql(f"SELECT k, v FROM {name}").collect()
        }
        assert got == state, (step, got, state)


APPENDS = st.lists(
    st.lists(
        st.tuples(KEYS, VALS), min_size=1, max_size=4
    ),
    min_size=1,
    max_size=3,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base=st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=4),
       appends=APPENDS)
def test_writer_append_sequence_equals_concat(
    spark, tmp_path_factory, base, appends
):
    from pretalx_hub_etl_spark.sources.lakehouse_ds import write_table

    root = tmp_path_factory.mktemp("wr_prop") / uuid.uuid4().hex
    path = str(root)
    rows = list(base)
    write_table(
        spark.createDataFrame(rows, "k long, v long"), path, "overwrite"
    )
    for i, batch in enumerate(appends, start=2):
        write_table(
            spark.createDataFrame(batch, "k long, v long"), path, "append"
        )
        rows.extend(batch)
        sink = MergeSink(path, key="k")
        got = sorted(
            (r.k, r.v) for r in sink.read(spark).collect()
        )
        assert got == sorted(rows)
        # every intermediate version stays readable (hardlink reuse
        # must never mutate history)
        assert sink.read_version(spark, 1).count() == len(base)
        assert sink.read_version(spark, i).count() == len(rows)
