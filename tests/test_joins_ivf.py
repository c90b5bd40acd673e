from __future__ import annotations

from pyspark.sql import functions as F

from dbt_parquet_spark.functions.joins import salted_join
from dbt_parquet_spark.operators.similarity import q_ann_ivf, q_ann_topk
from dbt_parquet_spark.sources.readers import load_table

from .conftest import SF_ORACLE


def test_salted_join_equivalent_to_plain(spark):
    orders = load_table(spark, SF_ORACLE, "orders")
    customer = load_table(spark, SF_ORACLE, "customer").withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(customer, ["o_custkey"], "inner")
    salted = salted_join(orders, customer, ["o_custkey"], "inner", salt_buckets=4)
    assert sorted(plain.columns) == sorted(salted.columns)
    cols = sorted(plain.columns)
    assert plain.count() == salted.count()
    assert plain.select(*cols).exceptAll(salted.select(*cols)).count() == 0


def test_salted_left_join_keeps_unmatched(spark):
    a = spark.range(100).select(F.col("id").alias("k"), F.lit("L").alias("lv"))
    b = spark.range(50).select(F.col("id").alias("k"), F.lit("R").alias("rv"))
    out = salted_join(a, b, ["k"], "left", salt_buckets=3)
    assert out.count() == 100
    assert out.filter(F.col("rv").isNull()).count() == 50


def test_ivf_sound_and_scores_exact(spark):
    """IVF returns true cosines for whatever it returns (the approximation
    is only in WHICH candidates are scored), and recall stays above the
    structural floor. The synthetic embeddings are isotropic noise (see
    operator docstring), so recall is bounded near nprobe/cells — the
    assertion reflects that; on clustered data it would be near 1."""
    import numpy as np

    exact_rows = q_ann_topk(spark, SF_ORACLE).collect()
    emb = load_table(spark, SF_ORACLE, "embeddings").toPandas()

    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.itertuples()}
    ivf_rows = q_ann_ivf(spark, SF_ORACLE).collect()
    for r in ivf_rows:
        a, b = vecs[r.query_id], vecs[r.neighbor_id]
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r.cos_sim - want) < 1e-9  # scores are exact cosines
        assert r.query_id != r.neighbor_id
    exact = {(r.query_id, r.neighbor_id) for r in exact_rows}
    ivf = {(r.query_id, r.neighbor_id) for r in ivf_rows}
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.15, f"IVF recall below structural floor: {recall}"


def test_pq_sound_and_high_recall(spark):
    """PQ (q_ann_pq) scores its final top-k with EXACT cosine (the
    quantization only selects the rerank pool), so returned scores must be
    true cosines; and because the PQ approximate dot uses ALL dimensions
    (unlike cell-pruning IVF), recall survives even on this isotropic-noise
    corpus — measured 1.0 at 16x4-dim codebooks with a 50-candidate rerank
    pool. The floor is set at 0.8 to allow draw variance at other SFs."""
    import numpy as np

    from dbt_parquet_spark.operators.similarity import q_ann_pq

    exact_rows = q_ann_topk(spark, SF_ORACLE).collect()
    emb = load_table(spark, SF_ORACLE, "embeddings").toPandas()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.itertuples()}
    pq_rows = q_ann_pq(spark, SF_ORACLE).collect()
    for r in pq_rows:
        a, b = vecs[r.query_id], vecs[r.neighbor_id]
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r.cos_sim - want) < 1e-9
        assert r.query_id != r.neighbor_id
    exact = {(r.query_id, r.neighbor_id) for r in exact_rows}
    pq = {(r.query_id, r.neighbor_id) for r in pq_rows}
    assert len(pq) == len(exact)
    recall = len(exact & pq) / len(exact)
    assert recall >= 0.8, f"PQ recall regression: {recall}"
