#!/usr/bin/env python
"""End-to-end RAG-serving prep: curated corpus in, retrieval store out.

    python examples/rag_prep.py --out /tmp/rag_demo \
        [--sf-dir /root/testdata/sf0.001]

Stages (each one an independently verified operator):
  1. q_drop_reasons        — audit which docs survive curation (keep only
                             status='kept': the release population)
  2. q_text_chunks         — overlapping fixed-token retrieval windows
  3. catalog CTAS          — publish the chunk table (atomic swap)
  4. q_embedding_quantize  — int8-compress the vector sidecar (4× smaller,
                             per-vector exact dequant scale)
  5. Z-order layout        — cluster the chunk table by (doc hash band,
                             chunk id) so point lookups prune files
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", required=True, help="database directory for the store")
    args = p.parse_args()

    from pyspark.sql import functions as F

    from dbt_parquet_spark.catalog import FilesystemCatalog
    from dbt_parquet_spark.materialize import create_table_as
    from dbt_parquet_spark.operators.audit import q_drop_reasons
    from dbt_parquet_spark.operators.serving import q_embedding_quantize, q_text_chunks
    from dbt_parquet_spark.session import get_spark

    spark = get_spark("rag_prep_example")
    catalog = FilesystemCatalog(args.out)

    # 1. curation audit: ship only the release population
    audit = q_drop_reasons(spark, args.sf_dir)
    kept = audit.filter(F.col("status") == "kept").select("doc_id")
    by_status = {r.status: r.n for r in audit.groupBy("status").agg(F.count("*").alias("n")).collect()}
    print(f"curation: {by_status}")

    # 2-3. chunk the kept docs and publish
    chunks = q_text_chunks(spark, args.sf_dir).join(kept, "doc_id")
    chunks_rel = catalog.relation("rag_chunks")
    create_table_as(spark, catalog, chunks_rel, chunks)
    n_chunks = spark.read.parquet(chunks_rel.path).count()
    print(f"chunks: {n_chunks} -> {chunks_rel.path}")

    # 4. quantized vector sidecar
    vec_rel = catalog.relation("rag_vectors_int8")
    create_table_as(spark, catalog, vec_rel, q_embedding_quantize(spark, args.sf_dir))
    print(f"vectors: {spark.read.parquet(vec_rel.path).count()} int8 rows -> {vec_rel.path}")

    # 5. cluster the chunk table for point-lookup pruning
    from dbt_parquet_spark.maintenance import cluster_by

    cluster_by(spark, catalog, chunks_rel, ["doc_id", "chunk_id"], zorder=True)
    print("clustered rag_chunks by zorder(doc_id, chunk_id)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
