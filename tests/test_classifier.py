"""Pinned parity for the trained quality classifier: the distributed
hashed-ngram logistic regression must reproduce a pure-Python reference
BIT-IDENTICALLY (weights and every per-doc score), and the model must
actually fit its weak supervision."""

from __future__ import annotations

import numpy as np

from dbt_parquet_spark.operators.classifier import (
    D,
    py_doc_features,
    py_label,
    py_train_and_score,
    q_quality_classifier,
    q_quality_classifier_prune,
    train_quality_classifier,
)
from dbt_parquet_spark.sources.readers import load_table

from .conftest import SF_SMALL


def _texts(spark):
    rows = (
        load_table(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .collect()
    )
    rows.sort(key=lambda r: r.doc_id)
    return [r.doc_id for r in rows], [r.text for r in rows]


def test_feature_arrays_match_python(spark):
    from pyspark.sql import functions as F

    from dbt_parquet_spark.operators.classifier import doc_features

    doc_ids, texts = _texts(spark)
    got = {
        r.doc_id: (r.y, list(r.bkts))
        for r in doc_features(spark, SF_SMALL).collect()
    }
    for doc_id, text in zip(doc_ids, texts):
        assert got[doc_id] == (py_label(text), py_doc_features(text)), doc_id


def test_trained_weights_and_scores_bit_identical(spark):
    doc_ids, texts = _texts(spark)
    w_ref, scores_ref = py_train_and_score(texts)
    w = train_quality_classifier(spark, SF_SMALL)
    assert w.shape == (D + 1,)
    assert np.array_equal(w, w_ref), "distributed weights diverged from reference"

    got = {r.doc_id: r.score_ppm for r in q_quality_classifier(spark, SF_SMALL).collect()}
    want = dict(zip(doc_ids, scores_ref))
    assert got == want, "per-doc scores diverged from reference"


def test_classifier_fits_weak_supervision(spark):
    out = q_quality_classifier(spark, SF_SMALL).collect()
    acc = sum(1 for r in out if r.pred == r.y) / len(out)
    pos = sum(r.y for r in out) / len(out)
    assert 0.2 < pos < 0.8, f"degenerate label balance {pos}"
    assert acc >= 0.80, f"classifier failed to fit its own supervision: acc={acc}"


def test_classifier_prune_composes(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    per_source = {r.source: r.cnt for r in docs.groupBy("source").count().withColumnRenamed("count", "cnt").collect()}
    out = q_quality_classifier_prune(spark, SF_SMALL).collect()
    assert {r.source for r in out} == set(per_source)
    for r in out:
        assert r.n_kept + r.n_dropped == per_source[r.source]
        # bottom-quartile prune: dropped fraction near PRUNE_PCT, never a
        # whole source emptied
        assert r.n_kept > 0
        assert r.n_dropped <= per_source[r.source] * 0.5


def test_auc_matches_pure_python_exactly(spark):
    """2U stays integral until one final division, so the distributed AUC
    must equal the pure-Python rank-sum bit-for-bit — and beat chance."""
    _, texts = _texts(spark)
    from dbt_parquet_spark.operators.classifier import (
        py_label,
        q_quality_classifier_auc,
    )

    _, scores = py_train_and_score(texts)
    ys = [py_label(t) for t in texts]
    hist: dict[int, list[int]] = {}
    for s, y in zip(scores, ys):
        e = hist.setdefault(s, [0, 0])
        e[0] += y
        e[1] += 1 - y
    u2, below = 0, 0
    for s in sorted(hist):
        npos, nneg = hist[s]
        u2 += npos * (2 * below + nneg)
        below += nneg
    n_pos = sum(ys)
    n_neg = len(ys) - n_pos
    want = (n_pos, n_neg, u2 / (2.0 * n_pos * n_neg))

    (row,) = q_quality_classifier_auc(spark, SF_SMALL).collect()
    assert (row.n_pos, row.n_neg, row.auc) == want
    assert row.auc > 0.9  # the model separates its own supervision


def test_calibration_matches_pure_python(spark):
    _, texts = _texts(spark)
    from dbt_parquet_spark.operators.classifier import (
        py_label,
        q_quality_classifier_calibration,
    )

    _, scores = py_train_and_score(texts)
    ys = [py_label(t) for t in texts]
    want: dict[int, tuple] = {}
    bins: dict[int, list] = {}
    for s, y in zip(scores, ys):
        b = bins.setdefault(s // 100000, [0, 0, 0])
        b[0] += 1
        b[1] += y
        b[2] += s
    for k, (n, npos, ssum) in bins.items():
        want[k] = (n, npos, ssum / n / 1e6, npos / n)

    got = {
        r.bin: (r.n_docs, r.n_pos, r.mean_score, r.pos_rate)
        for r in q_quality_classifier_calibration(spark, SF_SMALL).collect()
    }
    assert got == want
