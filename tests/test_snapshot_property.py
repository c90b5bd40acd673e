"""Property test: SCD2 snapshot invariants hold over random sequences of
source states — every key's history is append-only with non-overlapping
contiguous validity, and the current view always equals the latest state."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from dbt_parquet_spark.catalog import FilesystemCatalog
from dbt_parquet_spark.snapshots import current_view, snapshot

# a source state: mapping key -> value (small domains to force churn)
state = st.dictionaries(st.integers(0, 5), st.sampled_from(["a", "b", "c"]), max_size=6)


@settings(max_examples=5, deadline=None)
@given(st.lists(state, min_size=1, max_size=4))
def test_snapshot_invariants(spark, tmp_path_factory, states):
    db = FilesystemCatalog(str(tmp_path_factory.mktemp("snapdb")))
    rel = db.relation("t")
    hist = None
    for i, s in enumerate(states):
        src = spark.createDataFrame(
            [(k, v) for k, v in s.items()] or [(None, None)], "id: long, v: string"
        ).filter("id IS NOT NULL")
        hist = snapshot(spark, db, rel, src, "id", ["v"], f"2024-0{i+1}-01 00:00:00")

    rows = hist.collect()
    # current view == last source state
    cur = {(r.id, r.v) for r in current_view(hist).collect()}
    assert cur == set(states[-1].items())
    # per-key: at most one open version; closed versions ordered & disjoint
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.id, []).append(r)
    for key, versions in by_key.items():
        opens = [r for r in versions if r.dbt_valid_to is None]
        assert len(opens) <= 1
        closed = sorted(
            (r for r in versions if r.dbt_valid_to is not None), key=lambda r: r.dbt_valid_from
        )
        for a, b in zip(closed, closed[1:]):
            assert a.dbt_valid_to <= b.dbt_valid_from
        for r in versions:
            if r.dbt_valid_to is not None:
                assert r.dbt_valid_from < r.dbt_valid_to


# timestamp-strategy twin: random monotone update sequences vs a pure-Python
# SCD2 simulator — the merge must agree exactly (not just satisfy invariants)
upd = st.dictionaries(st.integers(0, 5), st.integers(0, 2), max_size=6)


@settings(max_examples=5, deadline=None)
@given(st.lists(upd, min_size=1, max_size=4))
def test_snapshot_scd2_matches_pure_python(spark, tmp_path_factory, steps):
    from dbt_parquet_spark.snapshots import snapshot_scd2

    db = FilesystemCatalog(str(tmp_path_factory.mktemp("snap2db")))
    rel = db.relation("t")
    # step i updates key k to value f"v{val}" at time 100*(i+1): strictly
    # increasing per run, so every touched key with a DIFFERENT time opens
    model: dict[int, list] = {}  # key -> [[value, from, to|None], ...]
    for i, updates in enumerate(steps):
        t = 100 * (i + 1)
        src = spark.createDataFrame(
            [(k, f"v{v}", t) for k, v in updates.items()] or [(None, None, None)],
            "id: long, v: string, updated_at: long",
        ).filter("id IS NOT NULL")
        snapshot_scd2(spark, db, rel, src, "id", "updated_at")
        for k in updates:
            vers = model.setdefault(k, [])
            if vers and vers[-1][2] is None:
                if t > vers[-1][1]:  # strictly newer -> close & open
                    vers[-1][2] = t
                    vers.append([f"v{updates[k]}", t, None])
            else:
                vers.append([f"v{updates[k]}", t, None])

    got = {
        (r.id, r.v, r.dbt_valid_from, r.dbt_valid_to)
        for r in spark.read.parquet(rel.path).collect()
    }
    want = {
        (k, v, vf, vt) for k, vers in model.items() for v, vf, vt in vers
    }
    assert got == want
