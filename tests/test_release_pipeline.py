"""q_corpus_release through the storage layer: publish the released corpus
via catalog CTAS, shard it with the training-shard writer, and prove a
fresh catalog round-trips the artifacts — the full decontaminate-then-ship
path a production pipeline runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_parquet_spark.catalog import FilesystemCatalog
from dbt_parquet_spark.operators.release import q_corpus_release
from dbt_parquet_spark.operators.shards import write_training_shards
from dbt_parquet_spark.sources.readers import load_table

from .conftest import SF_SMALL


def test_release_semantics(spark):
    """Stage invariants: released docs are a subset of the corpus, every
    dup cluster contributes at most its canonical member, per-source keep
    rate is >= 1 - PRUNE_PCT of the post-dedup population, and scrubbed
    token accounting is consistent."""
    from dbt_parquet_spark.operators.graph import q_dedup_components

    rel = q_corpus_release(spark, SF_SMALL)
    rows = rel.collect()
    docs = {r.doc_id for r in load_table(spark, SF_SMALL, "documents").select("doc_id").collect()}
    released = {r.doc_id for r in rows}
    assert released <= docs and 0 < len(released) < len(docs)

    comp = q_dedup_components(spark, SF_SMALL).collect()
    by_cluster: dict[int, list[int]] = {}
    for r in comp:
        by_cluster.setdefault(r.component_id, []).append(r.doc_id)
    for cluster, members in by_cluster.items():
        assert len(released & set(members)) <= 1, f"cluster {cluster} kept >1 member"

    for r in rows:
        n_kept_tokens = len(r.released_text.split(" ")) if r.released_text else 0
        assert r.n_tokens - r.n_removed == n_kept_tokens, r.doc_id


def test_release_materializes_shards_and_survives_reconnect(spark, tmp_path):
    cat = FilesystemCatalog(f"file://{tmp_path}")
    rel = q_corpus_release(spark, SF_SMALL)
    n_released = rel.count()

    # publish the released corpus, then shard it for training (shards need
    # doc_id/text/n_chars; n_chars of the RELEASED text)
    shardable = rel.select(
        "doc_id", "source", F.col("released_text").alias("text")
    ).withColumn("n_chars", F.length("text").cast("long"))
    manifest = write_training_shards(
        spark, cat, cat.relation("release_shards"), shardable
    )
    m = {r.shard_id: (r.n_docs, r.total_chars, r.content_hash) for r in manifest.collect()}
    assert sum(n for n, _, _ in m.values()) == n_released

    # fresh catalog: both artifacts re-register; shard contents re-hash to
    # the manifest
    cat2 = FilesystemCatalog(f"file://{tmp_path}")
    rels = {r.table for r in cat2.list_relations("")}
    assert {"release_shards", "release_shards_manifest"} <= rels
    written = spark.read.parquet(cat2.relation("release_shards").path)
    assert written.count() == n_released
    rowhash = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.col("text"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    re_m = {
        r.shard_id: (r.n, r.chars, r.h)
        for r in written.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").cast("long").alias("chars"),
            F.sum(rowhash).alias("h"),
        )
        .collect()
    }
    assert re_m == m
