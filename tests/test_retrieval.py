"""BM25 lexical retrieval pinned bit-identical to an independent pure-Python
scorer (exactness beyond the DuckDB oracle: the idf literals, ppm freezing,
and tie-breaking are all re-derived here from the raw documents)."""

from __future__ import annotations

import math

from dbt_parquet_spark.operators.text import (
    BM25_QUERY_TERMS,
    BM25_TOP_K,
    q_bm25_topk,
)
from dbt_parquet_spark.sources.readers import load_table

from .conftest import SF_SMALL


def _py_bm25(docs, terms=BM25_QUERY_TERMS, k1=1.2, b=0.75, topk=BM25_TOP_K):
    toks = {r.doc_id: r.text.split(" ") for r in docs}
    n = len(toks)
    avgdl = float(sum(len(t) for t in toks.values())) / float(n)
    dfreq = {
        term: sum(1 for t in toks.values() if term in t) for term in terms
    }
    scores = {}
    for doc_id, t in toks.items():
        total, matched = 0, 0
        for term in terms:
            tf = t.count(term)
            if tf == 0:
                continue
            matched += 1
            dfv = dfreq[term]
            idf = math.log(1.0 + ((float(n) - float(dfv)) + 0.5) / (float(dfv) + 0.5))
            tfpart = (float(tf) * 2.2) / (
                float(tf) + 1.2 * (0.25 + 0.75 * (float(len(t)) / avgdl))
            )
            total += math.floor(1000000.0 * (idf * tfpart))
        if matched:
            scores[doc_id] = (matched, total)
    order = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))
    return {doc_id: v for doc_id, v in order[:topk]}


def test_bm25_matches_pure_python_exactly(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    expected = _py_bm25(docs)
    got = {r.doc_id: (r.n_terms, r.score_ppm) for r in q_bm25_topk(spark, SF_SMALL).collect()}
    assert got == expected
    assert len(got) == BM25_TOP_K


def test_bm25_deterministic_across_runs(spark):
    a = sorted(map(tuple, q_bm25_topk(spark, SF_SMALL).collect()))
    b = sorted(map(tuple, q_bm25_topk(spark, SF_SMALL).collect()))
    assert a == b


def test_bm25_generic_api_other_query(spark):
    """The reusable bm25_topk with a different term set / k still matches
    the pure-Python scorer exactly."""
    from dbt_parquet_spark.operators.text import bm25_topk

    terms, k = ("merge", "slow"), 25
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    expected = _py_bm25(docs, terms=terms, topk=k)
    got = {
        r.doc_id: (r.n_terms, r.score_ppm)
        for r in bm25_topk(spark, SF_SMALL, terms, k).collect()
    }
    assert got == expected


def test_retrieval_eval_matches_pure_python_exactly(spark):
    """q_retrieval_eval pinned bit-identical to an independent pure-Python
    computation: the run is re-derived by the _py_bm25 scorer above, the
    English-relevance qrels, DCG weights, ppm freezes and integer-division
    ratios are all recomputed here from the raw documents — nothing shared
    with the Spark builder or the DuckDB oracle."""
    from dbt_parquet_spark.operators.serving import (
        EVAL_CUTOFFS,
        EVAL_POOL,
        q_retrieval_eval,
    )

    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang"
    ).collect()
    run = list(_py_bm25(docs, topk=EVAL_POOL))  # doc_ids in rank order
    nt = len(BM25_QUERY_TERMS)

    def rel_of(r):
        toks = r.text.split(" ")
        n = sum(1 for t in BM25_QUERY_TERMS if t in toks)
        if r.lang == "en" and n == nt:
            return 2
        if r.lang == "en" and n == nt - 1:
            return 1
        return 0

    rels = {r.doc_id: rel_of(r) for r in docs}
    w = {i: 1.0 / math.log2(i + 1.0) for i in range(1, EVAL_POOL + 1)}
    ideal = sorted(rels.values(), reverse=True)[:EVAL_POOL]

    expected = []
    for k in EVAL_CUTOFFS:
        top = run[:k]
        n_rel = sum(1 for d in top if rels[d] >= 1)
        first = next((i + 1 for i, d in enumerate(top) if rels[d] >= 1), None)
        dcg = sum(
            math.floor(1000000.0 * rels[d] * w[i + 1]) for i, d in enumerate(top)
        )
        idcg = sum(
            math.floor(1000000.0 * rel * w[j + 1])
            for j, rel in enumerate(ideal[:k])
        )
        expected.append(
            (
                k,
                n_rel,
                (1000000 * n_rel) // k,
                (1000000 // first) if first else 0,
                dcg,
                (1000000 * dcg) // idcg if idcg else 0,
            )
        )
    got = [tuple(r) for r in q_retrieval_eval(spark, SF_SMALL).collect()]
    assert got == expected
    # non-vacuity on the shipped corpus: at least one cutoff discriminates
    assert any(0 < row[5] < 1000000 for row in got), got


def test_retrieval_eval_hybrid_comparable_and_distinct(spark):
    """The hybrid eval judges against the IDENTICAL qrels/weights as the
    lexical eval (same schema, same cutoffs), and on the shipped corpus
    the two runs genuinely rank differently — the dense leg surfaces
    English documents the lexical run buries, so the A/B discriminates."""
    from dbt_parquet_spark.operators.serving import (
        q_retrieval_eval,
        q_retrieval_eval_hybrid,
    )

    lex = [tuple(r) for r in q_retrieval_eval(spark, SF_SMALL).collect()]
    hyb = [tuple(r) for r in q_retrieval_eval_hybrid(spark, SF_SMALL).collect()]
    assert [r[0] for r in lex] == [r[0] for r in hyb]  # same cutoffs
    assert lex != hyb  # the runs rank differently on the shipped corpus
    # both bounded and well-formed
    for rows in (lex, hyb):
        for k, n_rel, prec, mrr, dcg, ndcg in rows:
            assert 0 <= n_rel <= k
            assert 0 <= prec <= 1000000 and 0 <= mrr <= 1000000
            assert 0 <= ndcg <= 1000000
