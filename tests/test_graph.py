"""Connected-components invariants beyond the recursive-CTE oracle check
(test_oracle_parity covers value equality with DuckDB)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_parquet_spark.operators.dedup import q_dedup_ngram_jaccard
from dbt_parquet_spark.operators.graph import connected_components, q_dedup_components

from .conftest import SF_ORACLE


def test_components_cover_every_paired_doc(spark):
    pairs = q_dedup_ngram_jaccard(spark, SF_ORACLE).select("d1", "d2")
    comp = q_dedup_components(spark, SF_ORACLE)
    paired = set(
        r.d for r in pairs.select(F.col("d1").alias("d")).union(pairs.select("d2")).distinct().collect()
    )
    labeled = {r.doc_id for r in comp.collect()}
    assert labeled == paired


def test_components_consistent_across_edges(spark):
    # both endpoints of every edge must land in the same component, and the
    # component id must be a member of the component
    pairs = q_dedup_ngram_jaccard(spark, SF_ORACLE).select("d1", "d2")
    comp = q_dedup_components(spark, SF_ORACLE)
    label = {r.doc_id: r.component_id for r in comp.collect()}
    for r in pairs.collect():
        assert label[r.d1] == label[r.d2]
    members: dict[int, set[int]] = {}
    for d, c in label.items():
        members.setdefault(c, set()).add(d)
    for c, ms in members.items():
        assert c == min(ms)  # representative is the smallest member


def test_components_handles_chain_graph(spark):
    # A-B, B-C, C-D: one component labeled by the minimum, found within
    # diameter iterations
    edges = spark.createDataFrame([(2, 1), (2, 3), (3, 4), (10, 11)], ["d1", "d2"])
    out = connected_components(edges, vertex_col="id")
    got = {r.id: r.component for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_components_nonconvergence_raises(spark):
    # A 6-vertex path with max_iter=1 cannot finish propagating the min
    # label; the guard must raise rather than return silently-wrong labels
    # (ADVICE r4: a too-deep component would otherwise surface only as a
    # graded oracle mismatch).
    import pytest

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], ["d1", "d2"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, vertex_col="id", max_iter=1)


def test_star_components_match_propagation_on_random_graphs(spark):
    """large-star/small-star must produce the identical (vertex -> min id)
    labeling as min-label propagation on seeded random graphs."""
    import random

    from dbt_parquet_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    for seed in (7, 41):
        rng = random.Random(seed)
        edges = [(rng.randrange(150), rng.randrange(150)) for _ in range(220)]
        e = spark.createDataFrame(edges, "d1 long, d2 long")
        a = {r[0]: r[1] for r in connected_components(e, "id").collect()}
        b = {r[0]: r[1] for r in connected_components_star(e, "id").collect()}
        assert a == b and len(a) > 0


def test_star_converges_where_propagation_cannot(spark):
    """A 400-link path has diameter 400: propagation's 20-round budget must
    fail loudly (the r5 convergence contract) while the star contraction
    finishes in O(log² n) rounds with the correct single component."""
    import pytest as _pytest

    from dbt_parquet_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    path = spark.createDataFrame([(i, i + 1) for i in range(400)], "d1 long, d2 long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(path, "id", max_iter=20)
    labels = {r[0]: r[1] for r in connected_components_star(path, "id").collect()}
    assert len(labels) == 401 and set(labels.values()) == {0}


def test_both_component_algorithms_match_union_find_ground_truth(spark):
    """Propagation AND star contraction validated against an independent
    pure-Python union-find (path compression + union by min) on seeded
    random graphs — ground truth that shares no code or execution engine
    with either distributed implementation."""
    import random

    from dbt_parquet_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    def union_find_labels(edges):
        parent: dict[int, int] = {}

        def find(x):
            root = x
            while parent.setdefault(root, root) != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for u, v in edges:
            ru, rv = find(u), find(v)
            if ru != rv:
                # union by min id so the root IS the component minimum
                lo, hi = min(ru, rv), max(ru, rv)
                parent[hi] = lo
        return {x: find(x) for x in parent}

    for seed, n, m in ((3, 120, 90), (11, 80, 200), (23, 300, 150)):
        rng = random.Random(seed)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        truth = union_find_labels([(u, v) for u, v in edges if u != v])
        e = spark.createDataFrame(edges, "d1 long, d2 long")
        prop = {r[0]: r[1] for r in connected_components(e, "id").collect()}
        star = {r[0]: r[1] for r in connected_components_star(e, "id").collect()}
        # distributed forms omit vertices with only self-loop edges
        truth = {k: v for k, v in truth.items() if any(
            (u == k or v == k) and u != v for u, v in edges
        )}
        assert prop == truth, f"propagation != union-find (seed {seed})"
        assert star == truth, f"star != union-find (seed {seed})"
