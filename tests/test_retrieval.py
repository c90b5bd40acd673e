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
