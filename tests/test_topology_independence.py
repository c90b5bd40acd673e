"""The determinism contract, enforced: representative oracle queries must
produce bit-identical results under a deliberately different execution
topology (2 cores, 5 shuffle partitions, AQE off). Runs in a subprocess
because one JVM hosts one SparkSession configuration."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "5")
         .config("spark.sql.adaptive.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import sys
sys.path.insert(0, ".")
import __spark_entry__ as e, duckdb
qs, osql = e.queries(), e.oracle_sql()
con = duckdb.connect()
sf = "/root/testdata/sf0.001"
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf}/{t}.parquet')")
from tests.oracle_utils import compare_spark_duckdb
# the queries whose determinism depends on aggregation order
names = ["q_agg_multi", "q_except_diff", "q_window_running", "q_stddev_exact",
         "q_corr_exact", "q_ann_topk", "q_dedup_ngram_jaccard", "q_histogram",
         # round-5 additions whose outputs pass through collect_set /
         # collect_list (order must be neutralized by sorting) or
         # rate-threshold floats
         "q_span_dedup", "q_source_overlap", "q_temperature_sample",
         "q_heavy_hitters", "q_retention",
         # window-carry / iterative additions
         "q_interpolate", "q_asof_forward", "q_canonical_docs",
         # round-6 additions through collect_set/collect_list buckets,
         # hierarchical cumsums, or multi-leg full-outer fusion
         "q_winnowing", "q_winnow_overlap", "q_dedup_evidence",
         "q_token_budget_sample", "q_incremental_dedup",
         "q_cross_split_decontamination", "q_quality_prune",
         "q_cooccurrence_capped", "q_inverted_index", "q_bigram_lm",
         # round-7 additions: join-back df/score shapes, additive shard
         # manifest, and the composed release (closure + quantile + span
         # scrub through the persisted stage boundary)
         "q_lm_doc_score", "q_training_shards", "q_corpus_release",
         # round-8 additions: top-k / offset-threshold draws whose SETS must
         # not depend on partitioning (ties broken by doc_id), and the
         # driver-frozen idf literals fed from collected scalars
         "q_bm25_topk", "q_priority_sample", "q_curriculum_order",
         # ppm-frozen reaggregations: the freeze must make partition count
         # irrelevant (chi2 cells, gram partials, KN marginals, backoff)
         "q_source_drift", "q_embedding_gram", "q_kneser_ney",
         "q_kn_doc_score",
         # round-9 additions: posting-group islands (collect_set order must
         # be neutralized by array_sort) and the composed release scrub
         "q_substring_dedup", "q_substring_scrub",
         "q_release_substring_scrub", "q_partitioned_scan",
         "q_hybrid_retrieval", "q_substring_evidence"]
fails = [n for n in names if not compare_spark_duckdb(qs[n](spark, sf), con, osql[n])[0]]
print("FAILS:" + ",".join(fails))
"""


def test_oracle_holds_on_alternate_topology():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True, cwd=REPO, timeout=560
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("FAILS:")][-1]
    assert line == "FAILS:", line
