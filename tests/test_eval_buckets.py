"""Pinned parity tests for the round-8 eval operators: perplexity
bucketing bit-identical to a pure-Python bigram-LM + NTILE(3) reference,
and kNN label accuracy bit-identical to a numpy brute-force reference.
Both are also DuckDB-oracle-checked by the shared parity suite; these
tests pin the SEMANTICS against an independent implementation and the
determinism under a different partitioning."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np

from dbt_parquet_spark.operators.similarity import (
    KNN_EVAL_K,
    KNN_EVAL_QUERIES,
    q_knn_eval,
)
from dbt_parquet_spark.operators.text import q_perplexity_buckets
from dbt_parquet_spark.sources.readers import load_table

from .conftest import SF_SMALL


def _py_pplx_buckets(rows):
    """Pure-Python bigram MLE scoring + per-source NTILE(3)."""
    bg_count, ctx_count = Counter(), Counter()
    doc_bigrams = {}
    for r in rows:
        sp = r.text.split(" ")
        if len(sp) < 2:
            continue
        bgs = list(zip(sp[:-1], sp[1:]))
        doc_bigrams[r.doc_id] = (r.source, bgs)
        for b in bgs:
            bg_count[b] += 1
            ctx_count[b[0]] += 1
    scored = []
    for doc_id, (source, bgs) in doc_bigrams.items():
        s = sum(
            int(np.floor(1000000.0 * (bg_count[b] / ctx_count[b[0]]))) for b in bgs
        )
        scored.append((doc_id, source, s // len(bgs)))
    by_source = defaultdict(list)
    for doc_id, source, avg in scored:
        by_source[source].append((doc_id, avg))
    want = {}
    for source, docs in by_source.items():
        docs.sort(key=lambda x: (-x[1], x[0]))
        n = len(docs)
        base, extra = divmod(n, 3)
        sizes = [base + (1 if t < extra else 0) for t in range(3)]
        i = 0
        for tile, size in enumerate(sizes, start=1):
            for doc_id, avg in docs[i : i + size]:
                want[doc_id] = (source, avg, tile, ["head", "middle", "tail"][tile - 1])
            i += size
    return want


def test_perplexity_buckets_match_python_ntile(spark):
    rows = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    want = _py_pplx_buckets(rows)
    got = {
        r.doc_id: (r.source, r.avg_uppm, r.tile, r.bucket)
        for r in q_perplexity_buckets(spark, SF_SMALL).collect()
    }
    assert got == want
    # all three buckets non-empty somewhere → the tercile split is real
    assert {t for _, _, t, _ in got.values()} == {1, 2, 3}


def test_perplexity_buckets_deterministic_under_repartition(spark):
    base = sorted(map(tuple, q_perplexity_buckets(spark, SF_SMALL).collect()))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        again = sorted(map(tuple, q_perplexity_buckets(spark, SF_SMALL).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == again


def _py_knn_eval(vecs, labels):
    """numpy brute-force leave-one-out kNN majority vote."""
    ids = sorted(vecs)
    stats = defaultdict(lambda: [0, 0])  # label -> [n_queries, n_correct]
    for q in ids:
        if q >= KNN_EVAL_QUERIES:
            continue
        qv = vecs[q]
        qn = np.sqrt(sum(x * x for x in qv))
        scored = []
        for e in ids:
            if e == q:
                continue
            ev = vecs[e]
            # same sequential-sum dot as functions/vector.py
            dot = 0.0
            na = 0.0
            nb = 0.0
            for a, b in zip(qv, ev):
                dot += a * b
                na += a * a
                nb += b * b
            scored.append((-(dot / (np.sqrt(na) * np.sqrt(nb))), e))
        scored.sort()
        top = [labels[e] for _, e in scored[:KNN_EVAL_K]]
        votes = Counter(top)
        pred = min(votes, key=lambda l: (-votes[l], l))
        stats[labels[q]][0] += 1
        stats[labels[q]][1] += int(pred == labels[q])
    return {
        lab: (n, c, c / n) for lab, (n, c) in stats.items()
    }


def test_knn_eval_matches_numpy(spark):
    rows = load_table(spark, SF_SMALL, "embeddings").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
    labels = {r.vec_id: r.label for r in rows}
    want = _py_knn_eval(vecs, labels)
    got = {
        r.label: (r.n_queries, r.n_correct, r.accuracy)
        for r in q_knn_eval(spark, SF_SMALL).collect()
    }
    assert got == want
    assert sum(n for n, _, _ in got.values()) == KNN_EVAL_QUERIES
