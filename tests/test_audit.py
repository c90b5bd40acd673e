"""Release audit + semantic decontamination (operators/audit.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_parquet_spark.operators.audit import (
    EVAL_HEX_THRESHOLD,
    q_drop_reasons,
    q_semantic_decontamination,
)
from dbt_parquet_spark.operators.release import q_corpus_release
from dbt_parquet_spark.operators.similarity import BLOCKED_COSINE_THRESHOLD
from dbt_parquet_spark.functions.vector import cosine
from dbt_parquet_spark.sources.readers import load_table

from .conftest import SF_SMALL


def test_drop_reasons_kept_set_equals_release_population(spark):
    """The audit's 'kept' rows must be EXACTLY the documents the release
    pipeline publishes — same closure, same tiebreak, same quartile."""
    audit = q_drop_reasons(spark, SF_SMALL).collect()
    kept = {r.doc_id for r in audit if r.status == "kept"}
    released = {r.doc_id for r in q_corpus_release(spark, SF_SMALL).collect()}
    assert kept == released
    # the audit covers the WHOLE source population, not just survivors
    assert len(audit) == load_table(spark, SF_SMALL, "documents").count()
    # all three outcomes actually occur on the test corpus
    assert {r.status for r in audit} == {"kept", "near_dup", "low_quality"}


def test_drop_reasons_canonicals_are_kept_non_dups(spark):
    """A near-dup loser's canonical must itself be a non-near_dup row (it
    won its cluster), and canonical_id is null exactly off the near_dup
    rows."""
    rows = q_drop_reasons(spark, SF_SMALL).collect()
    status = {r.doc_id: r.status for r in rows}
    for r in rows:
        if r.status == "near_dup":
            assert r.canonical_id is not None and r.canonical_id != r.doc_id
            assert status[r.canonical_id] != "near_dup"
        else:
            assert r.canonical_id is None


def _exact_cross_set(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", F.md5(F.col("vec_id").cast("string")).alias("h")
    )
    a = emb.filter(F.col("h") < EVAL_HEX_THRESHOLD).select(
        F.col("vec_id").alias("train_id"), F.col("embedding").alias("ea")
    )
    b = emb.filter(F.col("h") >= EVAL_HEX_THRESHOLD).select(
        F.col("vec_id").alias("eval_id"), F.col("embedding").alias("eb")
    )
    return {
        (r.train_id, r.eval_id): r.cos_sim
        for r in a.crossJoin(b)
        .select("train_id", "eval_id", cosine(F.col("ea"), F.col("eb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= BLOCKED_COSINE_THRESHOLD)
        .collect()
    }


def test_semantic_decontamination_sound_vs_exact(spark):
    """Blocked cross-set pairs must be a subset of the exact cross-set scan
    at the same threshold, with EXACT cosines (blocking trims candidates,
    never scores approximately), straddling the md5 split correctly."""
    got = {
        (r.train_id, r.eval_id): r.cos_sim
        for r in q_semantic_decontamination(spark, SF_SMALL).collect()
    }
    exact = _exact_cross_set(spark, SF_SMALL)
    assert got, "driver-checked result must be non-vacuous"
    assert set(got) <= set(exact)
    for (t, e), c in got.items():
        assert c == exact[(t, e)]


def test_semantic_decontamination_recall_on_clustered_corpus(spark, clustered_emb_dir):
    """On a corpus with real neighborhood structure (where decontamination
    matters — eval leaks into train as a near-identical vector) the chunk
    blocking must recover most true cross-set near-dups. The shipped noise
    corpus can't measure this: at tau=0.35 its 'near-dups' are barely-
    correlated noise pairs the sign-blocking is DESIGNED to skip."""
    got = set(
        (r.train_id, r.eval_id)
        for r in q_semantic_decontamination(spark, clustered_emb_dir).collect()
    )
    exact = _exact_cross_set(spark, clustered_emb_dir)
    # restrict to confident leaks (cos >= 0.9 — a leaked eval item, not a
    # fringe pair near the threshold); everything is deterministic (raw-dim
    # sign chunks, md5 split, fixed fixture) so the measured 0.72 repeats
    confident = {k for k, c in exact.items() if c >= 0.9}
    assert confident, "clustered fixture must produce cross-set leaks"
    recall = len(got & confident) / len(confident)
    assert recall >= 0.6, f"blocking recall {recall:.2f} on clustered corpus"


def test_source_drift_matches_pure_python_exactly(spark):
    """chi2_ppm (observed cells + closed-form empty-cell mass) re-derived
    independently in pure Python from the raw documents."""
    import hashlib
    import math

    from dbt_parquet_spark.operators.audit import DRIFT_BUCKETS, q_source_drift

    docs = load_table(spark, SF_SMALL, "documents").select("source", "text").collect()
    cell: dict[tuple[str, int], int] = {}
    for r in docs:
        for t in r.text.split(" "):
            b = int(hashlib.md5(t.encode()).hexdigest()[:6], 16) % DRIFT_BUCKETS
            cell[(r.source, b)] = cell.get((r.source, b), 0) + 1
    bt: dict[int, int] = {}
    st: dict[str, int] = {}
    for (s, b), n in cell.items():
        bt[b] = bt.get(b, 0) + n
        st[s] = st.get(s, 0) + n
    gt = sum(cell.values())
    expected = {}
    for s in st:
        chi, nb, bto = 0, 0, 0
        for (s2, b), obs in cell.items():
            if s2 != s:
                continue
            nb += 1
            bto += bt[b]
            expd = (float(bt[b]) * float(st[s])) / float(gt)
            d = float(obs) - expd
            chi += math.floor(1000000.0 * ((d * d) / expd))
        chi += math.floor(
            1000000.0 * ((float(st[s]) * (float(gt) - float(bto))) / float(gt))
        )
        expected[s] = (nb, chi)
    got = {
        r.source: (r.n_buckets, r.chi2_ppm)
        for r in q_source_drift(spark, SF_SMALL).collect()
    }
    assert got == expected


def test_kanon_release_preserves_mass_and_hides_small_groups(spark):
    from dbt_parquet_spark.operators.audit import KANON_K, q_kanon_release

    rows = q_kanon_release(spark, SF_SMALL).collect()
    docs = load_table(spark, SF_SMALL, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    assert sum(r.total_chars for r in rows) == sum(
        r.n_chars for r in docs.select("n_chars").collect()
    )
    for r in rows:
        if not r.suppressed:
            assert r.n_docs >= KANON_K, (r.source, r.lang, r.n_docs)
    # the pooled cell exists iff any raw group was below k
    raw = docs.groupBy("source", "lang").count().collect()
    small = [r for r in raw if r["count"] < KANON_K]
    assert any(r.suppressed for r in rows) == bool(small)
    if small:
        pooled = next(r for r in rows if r.suppressed)
        assert pooled.n_docs == sum(r["count"] for r in small)
