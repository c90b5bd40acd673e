"""Property test: the union+window as-of composition matches a brute-force
python reference on randomized inputs (keys, times, gaps)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from dbt_parquet_spark.operators.temporal import asof_join

event_rows = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 100)), min_size=1, max_size=25, unique=True
)
ref_rows = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 100)), min_size=0, max_size=15, unique=True
)


@settings(max_examples=10, deadline=None)
@given(event_rows, ref_rows)
def test_asof_matches_bruteforce(spark, evs, refs):
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(evs)], "k: long, t: long, eid: long"
    )
    right = spark.createDataFrame(
        [(k, t, k * 1000 + t) for k, t in refs], "k: long, t: long, payload: long"
    ) if refs else spark.createDataFrame([], "k: long, t: long, payload: long")

    out = asof_join(left, right, key="k", left_time="t", right_time="t", payload=["payload"])
    got = {r.eid: r.payload for r in out.collect()}

    for i, (k, t) in enumerate(evs):
        candidates = [(rt, k * 1000 + rt) for rk, rt in refs if rk == k and rt <= t]
        want = max(candidates)[1] if candidates else None
        assert got[i] == want, (i, k, t, got[i], want)


@settings(max_examples=10, deadline=None)
@given(event_rows, ref_rows)
def test_asof_forward_matches_bruteforce(spark, evs, refs):
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(evs)], "k: long, t: long, eid: long"
    )
    right = spark.createDataFrame(
        [(k, t, k * 1000 + t) for k, t in refs], "k: long, t: long, payload: long"
    ) if refs else spark.createDataFrame([], "k: long, t: long, payload: long")

    out = asof_join(
        left, right, key="k", left_time="t", right_time="t",
        payload=["payload"], direction="forward",
    )
    got = {r.eid: r.payload for r in out.collect()}

    for i, (k, t) in enumerate(evs):
        candidates = [(rt, k * 1000 + rt) for rk, rt in refs if rk == k and rt >= t]
        want = min(candidates)[1] if candidates else None
        assert got[i] == want, (i, k, t, got[i], want)
