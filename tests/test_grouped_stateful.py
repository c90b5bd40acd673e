from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dbt_parquet_spark.operators.grouped import (
    q_grouped_zscore,
    q_label_centroids,
    q_quality_score,
)
from dbt_parquet_spark.sources.readers import load_table
from dbt_parquet_spark.streaming.stateful import streaming_user_profiles
from dbt_parquet_spark.streaming.stream_ops import run_to_batch

from .conftest import SF_SMALL, SF_ORACLE


def test_grouped_zscore_moments(spark):
    out = q_grouped_zscore(spark, SF_ORACLE).toPandas()
    for _, grp in out.groupby("c_nationkey"):
        if len(grp) > 1 and grp["c_acctbal"].std(ddof=0) > 0:
            assert abs(grp["acctbal_z"].mean()) < 1e-9
            assert abs(grp["acctbal_z"].std(ddof=0) - 1.0) < 1e-9


def test_label_centroids_match_numpy(spark):
    cents = {r.label: np.array(r.centroid) for r in q_label_centroids(spark, SF_ORACLE).collect()}
    emb = load_table(spark, SF_ORACLE, "embeddings").toPandas()
    for label, grp in emb.groupby("label"):
        want = np.mean(np.stack(grp["embedding"].map(np.asarray, na_action=None)), axis=0)
        assert np.allclose(cents[label], want, atol=1e-6)
    assert len(cents[0]) == 64


def test_quality_score_values(spark):
    out = q_quality_score(spark, SF_ORACLE)
    rows = out.collect()
    assert all(0.0 <= r.quality <= 1.0 for r in rows)
    # pin one known value: doc with n tokens & d distinct → min(n/60,1)*(d/n)
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text").first()
    toks = docs.text.split(" ")
    expect = min(len(toks) / 60.0, 1.0) * (len(set(toks)) / len(toks))
    got = next(r.quality for r in rows if r.doc_id == docs.doc_id)
    assert abs(got - expect) < 1e-9


def test_trimmed_mean_matches_reference(spark):
    from dbt_parquet_spark.operators.grouped import q_trimmed_mean

    out = {r.c_mktsegment: r for r in q_trimmed_mean(spark, SF_ORACLE).collect()}
    pdf = load_table(spark, SF_ORACLE, "customer").toPandas()
    for seg, grp in pdf.groupby("c_mktsegment"):
        # rank-trimmed exact-cents reference: drop the n//10 lowest/highest
        cents = sorted(int(round(x * 100)) for x in grp["c_acctbal"])
        k = len(cents) // 10
        kept = cents[k : len(cents) - k]
        want = (sum(kept) / 100.0) / len(kept)
        assert out[seg].trimmed_acctbal == want  # bit-identical, not approx
        assert out[seg].n == len(grp)


def test_stateful_user_profiles(spark):
    out = run_to_batch(streaming_user_profiles(spark, SF_SMALL), spark)
    # update-mode memory sink keeps the latest row per user from the single
    # availableNow batch
    prof = {r.user_id: r for r in out.collect()}
    events = load_table(spark, SF_SMALL, "events")
    want = {
        r.user_id: r
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("ts").alias("last"))
        .collect()
    }
    assert set(prof) == set(want)
    for uid, w in want.items():
        assert prof[uid].n_events == w.n
        assert prof[uid].last_seen == w.last
        assert 1 <= prof[uid].n_sessions <= w.n
