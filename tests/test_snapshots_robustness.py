from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_parquet_spark.catalog import FilesystemCatalog
from dbt_parquet_spark.materialize import create_table_as
from dbt_parquet_spark.registry import load_all
from dbt_parquet_spark.snapshots import as_of_view, current_view, snapshot
from dbt_parquet_spark.sources.readers import read_parquet

from .conftest import SF_ORACLE


@pytest.fixture()
def db(tmp_path):
    return FilesystemCatalog(str(tmp_path))


def _state(spark, rows):
    return spark.createDataFrame(rows, "id: long, name: string, bal: double")


def test_scd2_snapshot_lifecycle(spark, db):
    rel = db.relation("cust_snap")
    s1 = _state(spark, [(1, "a", 10.0), (2, "b", 20.0)])
    snapshot(spark, db, rel, s1, "id", ["name", "bal"], "2024-01-01 00:00:00")

    # change id=2, add id=3, drop id=1
    s2 = _state(spark, [(2, "b", 25.0), (3, "c", 30.0)])
    hist = snapshot(spark, db, rel, s2, "id", ["name", "bal"], "2024-02-01 00:00:00")

    cur = {(r.id, r.bal) for r in current_view(hist).collect()}
    assert cur == {(2, 25.0), (3, 30.0)}
    # id=2 has two versions with correct bounds
    v2 = sorted(hist.filter(F.col("id") == 2).collect(), key=lambda r: r.dbt_valid_from)
    assert v2[0].bal == 20.0 and v2[0].dbt_valid_to is not None
    assert v2[1].bal == 25.0 and v2[1].dbt_valid_to is None
    # time travel: January state
    jan = {(r.id, r.bal) for r in as_of_view(hist, "2024-01-15 00:00:00").collect()}
    assert jan == {(1, 10.0), (2, 20.0)}

    # idempotent: unchanged source adds no versions
    n = hist.count()
    hist2 = snapshot(spark, db, rel, s2, "id", ["name", "bal"], "2024-03-01 00:00:00")
    assert hist2.count() == n


def test_queries_survive_empty_inputs(spark, db, tmp_path):
    """Reference BaseEmpty parity: operators over empty relations produce
    empty (not erroring) results with stable schemas."""
    import os
    import shutil

    # build an empty mirror of the oracle testdata (schema-preserving)
    empty_dir = str(tmp_path / "empty_sf")
    os.makedirs(empty_dir)
    for t in ["lineitem", "orders", "customer", "nation", "region", "part",
              "events", "documents", "embeddings", "supplier"]:
        df = read_parquet(spark, os.path.join(SF_ORACLE, f"{t}.parquet")).limit(0)
        df.write.mode("overwrite").parquet(os.path.join(empty_dir, f"{t}.parquet"))

    specs = load_all()
    for name in ["q_agg_multi", "q_join_multi", "q_window_rank", "q_dedup_minhash",
                 "q_text_stats", "q_except_diff", "q_corpus_pipeline", "q_asof_join",
                 # round-8 additions
                 "q_zorder_layout", "q_epoch_order", "q_mixture_budget",
                 "q_scd2_history", "q_pit_join", "q_text_chunks",
                 "q_embedding_quantize", "q_semantic_decontamination",
                 # round-8 continuation additions
                 "q_curriculum_order", "q_bm25_topk", "q_priority_sample",
                 "q_source_drift", "q_embedding_gram", "q_embedding_pca",
                 "q_kneser_ney", "q_ann_pca", "q_kanon_release",
                 "q_vocab_coverage",
                 # round-9 additions
                 "q_substring_dedup", "q_substring_scrub",
                 "q_release_substring_scrub", "q_partitioned_scan",
                 "q_hybrid_retrieval", "q_substring_evidence"]:
        df = specs[name].builder(spark, empty_dir)
        # diff queries emit one all-zero row; the coverage curve emits one
        # (zero-coverage) row per configured k even over an empty corpus
        assert df.count() in (0, 1, 3), name
        assert len(df.schema.fields) > 0, name


def test_error_paths(spark, db):
    rel = db.relation("t")
    create_table_as(spark, db, rel, spark.range(5), single_file=True)
    # rename over an existing target replaces it (reference swap semantics)
    other = db.relation("other")
    create_table_as(spark, db, other, spark.range(9), single_file=True)
    db.rename_relation(rel, other, spark)
    assert spark.table("other").count() == 5
    # dropping a nonexistent relation is a no-op (reference impl.py:59-68)
    db.drop_relation(db.relation("never_existed"))
    # invalid model SQL raises cleanly
    from dbt_parquet_spark.project import Model, Project

    project = Project(db)
    project.add(Model("bad", "SELECT FROM nothing"))
    with pytest.raises(Exception):
        project.run(spark)
