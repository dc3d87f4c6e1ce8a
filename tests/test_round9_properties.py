"""Property tests for the round-9 operators vs naive references:
Bloom membership (never a false negative, any geometry), salted
group-top-k ≡ the plain window, and weighted median ≡ the unweighted
lower median of the weight-expanded multiset."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from pretalx_hub_etl_spark.operators.agg import salted_group_topk
from pretalx_hub_etl_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
)

_SETTINGS = settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)


@_SETTINGS
@given(
    st.lists(
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    st.integers(min_value=6, max_value=10),  # m_bits = 2^e: 64..1024 bits
    st.integers(min_value=1, max_value=4),  # k probes
)
def test_bloom_never_false_negative_any_geometry(spark, keys, e, k):
    m_bits = 1 << e
    members = spark.createDataFrame([(x,) for x in keys], "k long")
    bloom = bloom_build(members, "k", m_bits=m_bits, k=k)
    passed = {
        r.k
        for r in members.join(F.broadcast(bloom))
        .filter(bloom_might_contain(F.col("__bloom"), F.col("k"), m_bits, k))
        .collect()
    }
    # the one hard guarantee of a Bloom filter, at ANY geometry, even
    # fully saturated: a member is never rejected
    assert passed == set(keys)


@_SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # group
            st.integers(min_value=-50, max_value=50),  # order value (ties!)
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=4),  # k
    st.integers(min_value=1, max_value=5),  # salt buckets (1 = degenerate)
)
def test_salted_topk_equals_plain_window(spark, rows, k, buckets):
    data = [(g, v, i) for i, (g, v) in enumerate(rows)]  # i = unique tiebreak
    df = spark.createDataFrame(data, "g int, v int, id long")
    got = sorted(
        (r.g, r.rank, r.id, r.v)
        for r in salted_group_topk(
            df, ["g"], "v", k=k, tiebreak=["id"], salt_buckets=buckets
        ).collect()
    )
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id").asc())
    want = sorted(
        (r.g, r.rank, r.id, r.v)
        for r in df.withColumn(
            "rank", F.row_number().over(w).cast("long")
        )
        .filter(F.col("rank") <= k)
        .collect()
    )
    assert got == want


@_SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-100, max_value=100),  # value (ties ok)
            st.integers(min_value=1, max_value=9),  # weight
        ),
        min_size=1,
        max_size=30,
    )
)
def test_weighted_median_equals_expanded_lower_median(spark, pairs):
    # integer weights make the reference model exact: the weighted
    # median IS the lower median of the multiset with each value
    # repeated weight times
    df = spark.createDataFrame(pairs, "cents long, w long")
    g = df.groupBy("cents").agg(F.sum("w").alias("w"))
    wcum = (
        Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = g.select(
        "cents",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(Window.partitionBy()).alias("tw"),
    )
    got = (
        c.filter(2 * F.col("cw") >= F.col("tw"))
        .agg(F.min("cents").alias("m"))
        .collect()[0]
        .m
    )
    expanded = sorted(v for v, w in pairs for _ in range(w))
    want = expanded[(len(expanded) - 1) // 2]  # lower median
    assert got == want
