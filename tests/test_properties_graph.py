"""Property tests: the distributed iterative algorithms must agree with
trivial single-machine references on arbitrary inputs — not just on the
testdata's shapes."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbt_parquet_spark.operators.graph import connected_components
from dbt_parquet_spark.operators.packing import SEQ_BUDGET, _greedy_pack_bucket


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        for v in (a, b):
            parent.setdefault(v, v)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label every vertex with the minimum of its component
    comp: dict[int, list[int]] = {}
    for v in parent:
        comp.setdefault(find(v), []).append(v)
    return {v: min(ms) for r, ms in comp.items() for v in ms}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "d1: long, d2: long")
    got = {r.id: r.component for r in connected_components(df, vertex_col="id").collect()}
    want = _union_find_components(edges)
    assert got == want


def _greedy_reference(lengths: list[int]) -> list[tuple[int, int]]:
    """(n_docs, n_tokens) per pack for doc-id-ordered greedy packing."""
    packs = []
    ids, used = 0, 0
    for n in lengths:
        if ids and used + n > SEQ_BUDGET:
            packs.append((ids, used))
            ids, used = 0, 0
        ids += 1
        used += n
    if ids:
        packs.append((ids, used))
    return packs


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(1, 400), min_size=1, max_size=60))
def test_greedy_pack_matches_reference(lengths):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "bucket": [0] * len(lengths),
            "doc_id": range(len(lengths)),
            "n_tokens": lengths,
        }
    )
    out = _greedy_pack_bucket(pdf).sort_values("pack_idx")
    got = list(zip(out["n_docs"].tolist(), out["n_tokens"].tolist()))
    assert got == _greedy_reference(lengths)
