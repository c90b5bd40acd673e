#!/usr/bin/env python
"""End-to-end perplexity-filter walkthrough: raw corpus in, LM-filtered
training table out — the CCNet-style stage, on this engine's exact ops.

    python examples/lm_filter.py --out /tmp/lm_demo \
        [--sf-dir /root/testdata/sf0.001]

Stages (each one an independently verified operator):
  1. q_kneser_ney     — fit/inspect the smoothed bigram model (top bigrams)
  2. q_kn_doc_score   — held-out scoring: the md5 TRAIN split fits the
                        model, every TEST doc scores through the full
                        backoff ladder
  3. threshold prune  — keep test docs above the median avg_score (exact
                        integer-ppm median: the q_quality_prune discipline)
  4. catalog CTAS     — publish the kept table (atomic swap)
  5. q_source_drift   — post-filter drift check: does pruning skew any
                        source's token distribution?
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", required=True, help="database directory")
    args = p.parse_args()

    from pyspark.sql import functions as F

    from dbt_parquet_spark.catalog import FilesystemCatalog
    from dbt_parquet_spark.materialize import create_table_as
    from dbt_parquet_spark.operators.audit import q_source_drift
    from dbt_parquet_spark.operators.text import q_kn_doc_score, q_kneser_ney
    from dbt_parquet_spark.session import get_spark
    from dbt_parquet_spark.sources.readers import load_table

    spark = get_spark("lm_filter_example")
    catalog = FilesystemCatalog(args.out)

    # 1. the model itself (vocabulary-sized — printable)
    model = q_kneser_ney(spark, args.sf_dir)
    top = model.orderBy(F.desc("p_kn_ppm"), "w1", "w2").limit(3).collect()
    print("model: top bigrams " + ", ".join(f"{r.w1}->{r.w2} ({r.p_kn_ppm} ppm)" for r in top))

    # 2. held-out scores
    scores = q_kn_doc_score(spark, args.sf_dir)

    # 3. exact median threshold on the integer sum_score (order-free)
    med = scores.agg(F.expr("percentile(sum_score, 0.5)").alias("m")).first().m
    kept_ids = scores.filter(F.col("sum_score") >= med).select("doc_id")
    n_test, n_kept = scores.count(), kept_ids.count()
    print(f"scored {n_test} held-out docs; kept {n_kept} at median {med:.0f} ppm")

    # 4. publish the filtered table
    docs = load_table(spark, args.sf_dir, "documents")
    rel = catalog.relation("lm_filtered_docs")
    create_table_as(spark, catalog, rel, docs.join(kept_ids, "doc_id"))
    print(f"published: {spark.read.parquet(rel.path).count()} rows -> {rel.path}")

    # 5. drift report on the surviving corpus vs the full corpus mix
    drift = q_source_drift(spark, args.sf_dir).orderBy(F.desc("chi2_ppm")).limit(3)
    worst = ", ".join(f"{r.source}={r.chi2_ppm}" for r in drift.collect())
    print(f"drift (chi2 ppm, worst sources): {worst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
