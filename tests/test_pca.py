"""PCA over embeddings pinned against an independent pure-numpy pipeline:
the same integer-ppm scatter quantization, covariance, eigh, sign fix, and
projection — re-derived from the raw vectors without any engine code."""

from __future__ import annotations

import math

import numpy as np

from dbt_parquet_spark.operators.similarity import (
    PCA_K,
    q_embedding_gram,
    q_embedding_pca,
)
from dbt_parquet_spark.sources.readers import load_table

from .conftest import SF_SMALL


def _numpy_reference(vecs):
    n, dim = len(vecs), len(vecs[0])
    gram = np.zeros((dim, dim), dtype=np.int64)
    sums = np.zeros(dim, dtype=np.int64)
    for v in vecs:
        d = [float(x) for x in v]
        for i in range(dim):
            sums[i] += math.floor(1000000.0 * d[i])
            for j in range(i, dim):
                gram[i, j] += math.floor(1000000.0 * (d[i] * d[j]))
    mean = np.array([s / 1e6 / n for s in sums])
    c = np.zeros((dim, dim))
    for i in range(dim):
        for j in range(i, dim):
            v = gram[i, j] / 1e6 / n - mean[i] * mean[j]
            c[i, j] = c[j, i] = v
    vals, vecs_ = np.linalg.eigh(c)
    order = np.argsort(vals)[::-1][:PCA_K]
    comps = []
    for k in order:
        v = vecs_[:, k]
        v = v if v[int(np.argmax(np.abs(v)))] >= 0 else -v
        comps.append(v)
    return mean, comps, gram, sums


def test_gram_and_pca_match_numpy(spark):
    rows = load_table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding").collect()
    vecs = {r.vec_id: r.embedding for r in rows}
    mean, comps, gram, _ = _numpy_reference(list(vecs.values()))

    got_gram = {(r.i, r.j): (r.n, r.s_ppm) for r in q_embedding_gram(spark, SF_SMALL).collect()}
    dim = len(mean)
    assert len(got_gram) == dim * (dim + 1) // 2
    for i in range(dim):
        for j in range(i, dim):
            assert got_gram[(i + 1, j + 1)] == (len(vecs), int(gram[i, j])), (i, j)

    got = {r.vec_id: [r[f"pc{k}"] for k in range(1, PCA_K + 1)] for r in
           q_embedding_pca(spark, SF_SMALL).collect()}
    assert set(got) == set(vecs)
    for vec_id, emb in vecs.items():
        centered = np.array([float(x) for x in emb]) - mean
        for k in range(PCA_K):
            expect = float(np.dot(centered, comps[k]))
            assert abs(got[vec_id][k] - expect) <= 1e-9 + 1e-9 * abs(expect), (vec_id, k)


def test_pca_components_ordered_by_variance(spark):
    pcs = q_embedding_pca(spark, SF_SMALL).collect()
    cols = list(zip(*[[r[f"pc{k}"] for k in range(1, PCA_K + 1)] for r in pcs]))
    variances = [np.var(np.array(c)) for c in cols]
    assert all(variances[k] >= variances[k + 1] - 1e-12 for k in range(PCA_K - 1))


def test_gram_is_additive_incremental_merge(spark):
    """The SCALE claim backed in code: gram(full) == merge(gram(half_a),
    gram(half_b)) bit-exactly — int64 partial sums are associative, so a
    delta batch folds into a stored base gram without re-reading the
    corpus."""
    from pyspark.sql import functions as F

    from dbt_parquet_spark.operators.similarity import gram_ppm_of, merge_gram

    emb = load_table(spark, SF_SMALL, "embeddings")
    full = {(r.i, r.j): (r.n, r.s_ppm) for r in gram_ppm_of(emb).collect()}
    a = gram_ppm_of(emb.filter(F.col("vec_id") % 2 == 0))
    b = gram_ppm_of(emb.filter(F.col("vec_id") % 2 == 1))
    merged = {(r.i, r.j): (r.n, r.s_ppm) for r in merge_gram(a, b).collect()}
    assert merged == full
