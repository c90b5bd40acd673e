"""Multi-stage curation pipeline THROUGH the storage layer: each stage
materializes via the catalog (CTAS + atomic swap), the next stage reads the
registered view — the way a real job checkpoints between stages, vs
q_corpus_pipeline's single fused plan. Also proves durability: a second
catalog instance over the same database re-registers and sees the tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_parquet_spark.catalog import FilesystemCatalog
from dbt_parquet_spark.materialize import create_table_as
from dbt_parquet_spark.operators.dedup import q_dedup_exact
from dbt_parquet_spark.sources.readers import load_table

from .conftest import SF_SMALL


def test_staged_pipeline_materializes_and_survives_reconnect(spark, tmp_path):
    cat = FilesystemCatalog(f"file://{tmp_path}")
    docs = load_table(spark, SF_SMALL, "documents")
    n_docs = docs.count()

    # Stage 1: exact dedup -> keep one doc per content hash, materialized.
    keep = q_dedup_exact(spark, SF_SMALL).select("doc_id")
    stage1 = docs.join(keep, "doc_id")
    create_table_as(spark, cat, cat.relation("docs_dedup"), stage1)

    # Stage 2: quality gate over the REGISTERED VIEW (SQL on the published
    # table, not on the in-memory lineage).
    create_table_as(
        spark,
        cat,
        cat.relation("docs_quality"),
        """
        SELECT doc_id, lang, source, n_chars, text
        FROM docs_dedup
        WHERE size(split(text, ' ')) >= 20
        """,
    )

    # Stage 3: per-source accounting over stage 2's view.
    create_table_as(
        spark,
        cat,
        cat.relation("source_stats"),
        "SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars "
        "FROM docs_quality GROUP BY source",
    )

    dedup_n = spark.table("docs_dedup").count()
    quality_n = spark.table("docs_quality").count()
    assert 0 < dedup_n <= n_docs
    # dedup kept exactly one row per distinct text
    assert spark.table("docs_dedup").select("text").distinct().count() == dedup_n
    assert 0 < quality_n <= dedup_n
    stats = spark.table("source_stats")
    assert stats.agg(F.sum("n_docs")).collect()[0][0] == quality_n

    # Durability: a FRESH catalog over the same database re-registers all
    # three tables and the row counts survive the round trip.
    cat2 = FilesystemCatalog(f"file://{tmp_path}")
    rels = {r.table for r in cat2.list_relations("")}
    assert {"docs_dedup", "docs_quality", "source_stats"} <= rels
    reread = spark.read.parquet(cat2.relation("docs_quality").path)
    assert reread.count() == quality_n
