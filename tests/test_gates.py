"""Semantic pins for operators/gates.py and q_context_pack beyond the
oracle hash-match: the gate must DISCRIMINATE (a failing constraint
actually fails), the diff must classify every synthetic change correctly,
the skew profile must agree with a brute-force recomputation, and the
context pack must stop exactly at the budget boundary."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_parquet_spark.operators.gates import (
    DIFF_ADD_OFFSET,
    EXPECTATION_THRESHOLDS,
    q_dataset_diff,
    q_expectations,
    q_key_skew_profile,
)
from dbt_parquet_spark.operators.serving import CP_BUDGET, q_context_pack
from dbt_parquet_spark.sources.readers import load_table

from .conftest import SF_ORACLE, SF_SMALL


def test_expectations_discriminate(spark):
    """The suite is not vacuous: max_chars_400 fails on the shipped corpus
    (n_chars tops out ~550) while the completeness/uniqueness constraints
    pass — at BOTH shipped scale factors."""
    for sf in (SF_SMALL, SF_ORACLE):
        rows = {r["check_name"]: r for r in q_expectations(spark, sf).collect()}
        assert set(rows) == set(EXPECTATION_THRESHOLDS)
        assert not rows["max_chars_400"]["passed"]
        assert rows["text_complete"]["passed"]
        assert rows["doc_id_unique"]["passed"]
        assert rows["text_complete"]["metric_ppm"] == 1_000_000
        for r in rows.values():
            assert r["passed"] == (r["metric_ppm"] >= r["threshold_ppm"])


def test_dataset_diff_classification(spark):
    """Every synthetic change lands in the right class, and nothing else:
    added ids are exactly the offset copies, removed exactly the % 11 == 3
    ids, modified exactly the surviving % 7 == 0 ids."""
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id")
    ids = {r["doc_id"] for r in docs.collect()}
    out = q_dataset_diff(spark, SF_SMALL).collect()
    got = {r["change_type"]: set() for r in out}
    for r in out:
        got[r["change_type"]].add(r["doc_id"])
    assert got["added"] == {i + DIFF_ADD_OFFSET for i in ids if i % 13 == 0}
    assert got["removed"] == {i for i in ids if i % 11 == 3}
    assert got["modified"] == {i for i in ids if i % 7 == 0 and i % 11 != 3}
    # removed rows carry no v2 length; added rows no v1 length
    for r in out:
        if r["change_type"] == "removed":
            assert r["len_v2"] is None and r["len_v1"] is not None
        elif r["change_type"] == "added":
            assert r["len_v1"] is None and r["len_v2"] is not None
        else:
            assert r["len_v2"] == r["len_v1"] + len(" [rev2]")


def test_key_skew_profile_matches_bruteforce(spark):
    """The histogram-side percentiles/totals equal a direct Python
    recomputation from the raw group sizes."""
    orders = load_table(spark, SF_SMALL, "orders")
    sizes = sorted(
        r["sz"]
        for r in orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("sz")).collect()
    )
    n_keys, n_rows, mx = len(sizes), sum(sizes), max(sizes)

    def disc(q: int) -> int:
        need = -(-q * n_keys // 100)  # ceil(q*n/100)
        return sizes[need - 1]

    row = q_key_skew_profile(spark, SF_SMALL).collect()[0]
    assert row["n_keys"] == n_keys and row["n_rows"] == n_rows
    assert row["max_size"] == mx
    assert row["avg_size_ppm"] == (1_000_000 * n_rows) // n_keys
    assert row["top1_share_ppm"] == (1_000_000 * mx) // n_rows
    assert row["skew_ppm"] == (1_000_000 * mx * n_keys) // n_rows
    assert row["p50_size"] == disc(50)
    assert row["p90_size"] == disc(90)
    assert row["p99_size"] == disc(99)


def test_context_pack_budget_boundary(spark):
    """Greedy prefix semantics: ranks are the contiguous 1..n prefix, the
    last kept row fits the budget, and adding the next-ranked document
    would overflow it (the cut is real at both shipped scale factors)."""
    for sf in (SF_SMALL, SF_ORACLE):
        rows = sorted(q_context_pack(spark, sf).collect(), key=lambda r: r["rank"])
        assert rows, "budget admits at least one document"
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        cum = 0
        for r in rows:
            cum += r["n_tokens"]
            assert r["cum_tokens"] == cum
        assert cum <= CP_BUDGET
        # the pack is maximal: the pool is deeper than the kept prefix
        # (CP_BUDGET cuts mid-list on the shipped corpora)
        assert len(rows) < 20


def test_bm25_batch_matches_single_query(spark):
    """The batch operator's query-1 block must equal q_bm25_topk row for
    row (same literals, same association order — scoring identity, not
    just rank agreement), at both shipped scale factors."""
    from dbt_parquet_spark.operators.text import (
        BM25_BATCH_QUERIES,
        BM25_QUERY_TERMS,
        BM25_TOP_K,
        bm25_batch_topk,
        q_bm25_topk,
    )

    assert BM25_BATCH_QUERIES[1] == BM25_QUERY_TERMS
    for sf in (SF_SMALL, SF_ORACLE):
        single = {
            (r["doc_id"], r["n_terms"], r["score_ppm"])
            for r in q_bm25_topk(spark, sf).collect()
        }
        batch = {
            (r["doc_id"], r["n_terms"], r["score_ppm"])
            for r in bm25_batch_topk(spark, sf, BM25_BATCH_QUERIES, BM25_TOP_K)
            .filter("query_id = 1")
            .collect()
        }
        assert batch == single and len(single) == BM25_TOP_K


def test_context_pack_batch_boundary_every_query(spark):
    """Each query's pack is a contiguous rank prefix with exact cumulative
    sums under the per-query budget, the cut is real (pool deeper than the
    prefix for every query), and the query-agnostic single-query packer's
    semantics are preserved per query_id."""
    from dbt_parquet_spark.operators.serving import CPB_BUDGET, q_context_pack_batch
    from dbt_parquet_spark.operators.text import BM25_BATCH_QUERIES, BM25_TOP_K

    for sf in (SF_SMALL, SF_ORACLE):
        rows = q_context_pack_batch(spark, sf).collect()
        per_q = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append(r)
        assert set(per_q) == set(BM25_BATCH_QUERIES)
        for qid, qrows in per_q.items():
            qrows.sort(key=lambda r: r["rank"])
            assert [r["rank"] for r in qrows] == list(range(1, len(qrows) + 1))
            cum = 0
            for r in qrows:
                cum += r["n_tokens"]
                assert r["cum_tokens"] == cum
            assert cum <= CPB_BUDGET
            assert len(qrows) < BM25_TOP_K  # budget cuts mid-list
