#!/usr/bin/env python
"""End-to-end corpus-release walkthrough: the full curate-then-ship path a
training-data pipeline runs, against the bundled synthetic corpus.

    python examples/corpus_release.py --out /tmp/release_demo \
        [--sf-dir /root/testdata/sf0.001]

Stages (each one an independently oracle-checked operator):
  1. q_corpus_datasheet  — pre-release accounting per source
  2. q_corpus_release    — near-dup clusters -> canonical keep ->
                           per-source quality prune -> span scrub
  3. q_release_substring_scrub — the second scrub pass: maximal exact
                           duplicated runs (ExactSubstr) over the SAME
                           kept set, reported next to the span pass
  4. catalog CTAS        — publish the released corpus (atomic swap)
  5. write_training_shards — deterministic hash shards + additive manifest
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", required=True, help="database directory for the release")
    args = p.parse_args()

    from pyspark.sql import functions as F

    from dbt_parquet_spark.catalog import FilesystemCatalog
    from dbt_parquet_spark.materialize import create_table_as
    from dbt_parquet_spark.operators.corpus import q_corpus_datasheet
    from dbt_parquet_spark.operators.release import q_corpus_release
    from dbt_parquet_spark.operators.shards import write_training_shards
    from dbt_parquet_spark.session import get_spark

    spark = get_spark("corpus_release_example")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    cat = FilesystemCatalog(args.out)

    print("== pre-release datasheet ==")
    for r in q_corpus_datasheet(spark, args.sf_dir).orderBy("source").collect():
        print(
            f"{r.source}: docs={r.n_docs} chars={r.total_chars} "
            f"dups={r.n_exact_dup_docs} q50={r.quality_p50:.0f}ppm"
        )

    released = q_corpus_release(spark, args.sf_dir)

    from pyspark.sql import functions as _F

    from dbt_parquet_spark.operators.release import q_release_substring_scrub

    substr = q_release_substring_scrub(spark, args.sf_dir)
    span_rm, sub_rm = (
        released.agg(_F.sum("n_removed")).first()[0] or 0,
        substr.agg(_F.sum("n_removed")).first()[0] or 0,
    )
    print(f"== scrub accounting: span pass removed {span_rm} tokens, "
          f"exact-substring pass {sub_rm} tokens over the kept set")

    create_table_as(spark, cat, cat.relation("released_corpus"), released)
    n = spark.table("released_corpus").count()
    print(f"== released {n} docs -> {cat.relation('released_corpus').path}")

    shardable = (
        spark.table("released_corpus")
        .select("doc_id", "source", F.col("released_text").alias("text"))
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    manifest = write_training_shards(spark, cat, cat.relation("release_shards"), shardable)
    print("== shard manifest ==")
    for r in manifest.orderBy("shard_id").collect():
        print(f"shard={r.shard_id} docs={r.n_docs} chars={r.total_chars} hash={r.content_hash}")
    print("OK corpus release complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
