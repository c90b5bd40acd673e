"""The driver verifies the FIRST 50 registered queries against their DuckDB
oracles (CORRECTNESS_r{N}.json). These tests pin the exposure order so that
window is never accidentally wasted: every checked slot must carry oracle
SQL, and the SURVEY §2C contract queries plus the LLM-pipeline / temporal /
streaming surface must sit inside it."""

from __future__ import annotations

from dbt_parquet_spark.registry import load_all

DRIVER_WINDOW = 50

CONTRACT_QUERIES = {
    "q_scan_project_cast",
    "q_filter_in",
    "q_agg_count_star",
    "q_group_having",
    "q_agg_multi",
    "q_join_using",
    "q_join_multi",
    "q_cross_join",
    "q_left_anti",
    "q_union_all",
    "q_except_diff",
    "q_cte_derived",
    "q_orderby_limit",
    "q_string_split_index",
    "q_timestamp_cast",
    "q_window_rank",
    "q_seed_roundtrip",
    "q_schema_introspect",
}

NORTH_STAR_IN_WINDOW = {
    # dedup / similarity
    "q_dedup_exact",
    "q_dedup_ngram_jaccard",
    "q_ann_topk",
    "q_embedding_cosine_dedup",
    # text / pipeline (q_explode/q_fingerprint/q_text_normalize sit outside:
    # their ops are subsumed by in-window queries, and the slots go to the
    # python extension points below)
    "q_text_stats",
    "q_token_count",
    "q_lang_id",
    "q_corpus_pipeline",
    "q_quality_score",
    # binary + Arrow decode path, value-checked end to end
    "q_multimodal_extract",
    # python extension points, all oracle-backed (incl. the recursive-CTE-
    # oracled mapInPandas packing and the iterative graph closure)
    "q_grouped_zscore",
    "q_trimmed_mean",
    "q_chunk_udtf",
    "q_sequence_packing",
    "q_dedup_components",
    # corpus accounting (q_histogram sits outside: plain groupBy, covered
    # by many in-window aggregations)
    "q_vocabulary",
    "q_cooccurrence",
    "q_train_test_split",
    "q_contamination",
    # temporal
    "q_asof_join",
    "q_range_join",
    # ALL structured-streaming execution modes (windowed, stream-stream
    # join, custom stateful) + batch sessionization; the tumbling/sliding/
    # dedup batch twins sit outside (same oracles as the executions)
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_stream_join",
    "q_stream_stateful_profile",
    "q_session_window",
}


def test_driver_window_is_fully_oracle_backed():
    specs = load_all()
    window = list(specs.values())[:DRIVER_WINDOW]
    missing = [s.name for s in window if s.oracle is None]
    assert not missing, f"rows-only queries inside the driver window: {missing}"


def test_contract_and_north_star_queries_inside_window():
    names = list(load_all())
    window = set(names[:DRIVER_WINDOW])
    assert CONTRACT_QUERIES <= window, sorted(CONTRACT_QUERIES - window)
    assert NORTH_STAR_IN_WINDOW <= window, sorted(NORTH_STAR_IN_WINDOW - window)


def test_registry_exposes_all_queries():
    specs = load_all()
    # r5: +q_cluster_roundtrip, +q_term_saliency, +q_span_dedup,
    # +q_source_overlap, +q_ann_pq, +q_retention, +q_multimodal_frames,
    # +q_heavy_hitters, +q_temperature_sample, +q_event_transitions,
    # +q_full_outer, +q_recursive_cte, +q_quantified, +q_asof_forward,
    # +q_interpolate, +q_canonical_docs, +q_quality_rules
    # r6: +q_ann_ivf_pq, +q_cooccurrence_capped,
    # +q_cross_split_decontamination, +q_winnowing, +q_token_budget_sample,
    # +q_inverted_index, +q_bigram_lm, +q_winnow_overlap, +q_dedup_evidence,
    # +q_quality_prune, +q_incremental_dedup
    # r7: +q_bpe_token_count, +q_bpe_budget_sample, +q_bpe_learn
    # (operators/subword.py), +q_lm_doc_score (operators/text.py),
    # +q_training_shards (operators/shards.py), +q_corpus_release
    # (operators/release.py), +q_stream_dedup_ingest (streaming),
    # +q_corpus_datasheet (operators/corpus.py), +q_bpe_sequence_packing
    # (operators/packing.py), +q_dedup_components_star (operators/graph.py),
    # +q_cluster_balanced_sample (operators/similarity.py)
    # r8: +q_quality_classifier, +q_quality_classifier_prune,
    # +q_quality_classifier_auc, +q_quality_classifier_calibration
    # (operators/classifier.py — trained hashed-ngram LR + distributed
    # eval), +q_media_dedup (operators/multimodal.py),
    # +q_dsir_select, +q_dsir_budget, +q_semdedup, +q_profile_table
    # (operators/selection.py — DSIR / SemDeDup / column profiling),
    # +q_perplexity_buckets (operators/text.py — CCNet head/middle/tail),
    # +q_knn_eval (operators/similarity.py — exact kNN label accuracy),
    # +q_stream_quality_ingest (streaming — model-in-stream scoring),
    # +q_drop_reasons, +q_semantic_decontamination (operators/audit.py),
    # +q_zorder_layout (operators/layout.py — Morton curve clustering),
    # +q_epoch_order (operators/shards.py — per-epoch deterministic order),
    # +q_mixture_budget (operators/selection.py — water-filling allocator),
    # +q_scd2_history (snapshots.py — SCD2 validity intervals),
    # +q_text_chunks, +q_embedding_quantize (operators/serving.py — RAG prep),
    # +q_pit_join (snapshots.py — point-in-time join against SCD2 history),
    # +q_curriculum_order (operators/shards.py — banded source-interleaved),
    # +q_bm25_topk (operators/text.py — lexical retrieval, driver-idf exact),
    # +q_priority_sample (operators/selection.py — Duffield-Lund-Thorup
    # weight-proportional k-sample with unbiased estimation weights),
    # +q_source_drift (operators/audit.py — chi-squared contingency drift),
    # +q_embedding_gram (oracle integer-ppm scatter matrix),
    # +q_embedding_pca (rows-only; numpy-pinned fit+projection),
    # +q_kneser_ney (operators/text.py — interpolated KN bigram LM, oracle),
    # +q_ann_pca (similarity.py — PCA-prefiltered ANN, rows-only + recall),
    # +q_kn_doc_score (text.py — held-out KN perplexity scoring, oracle),
    # +q_vocab_coverage (corpus.py — top-k token-mass coverage, oracle),
    # +q_kanon_release (audit.py — k-anonymous release cells, oracle)
    # r9: +q_substring_dedup, +q_substring_scrub (operators/dedup.py —
    # Lee-et-al ExactSubstr maximal duplicated runs via the covered-L-gram
    # witness-set reduction, both oracle-checked),
    # +q_release_substring_scrub (operators/release.py — the composed
    # ExactSubstr leg over the release pipeline's kept set, oracle-checked),
    # +q_partitioned_scan (operators/lifecycle.py — hive-partitioned source
    # read with directory-level pruning, oracle-checked),
    # +q_hybrid_retrieval (operators/serving.py — BM25 ⊕ dense RRF fusion,
    # oracle-checked),
    # +q_substring_evidence (operators/dedup.py — who-duplicates-whom
    # witness per maximal run, array-min over posting groups, oracle-checked)
    # r11: +q_index_recall_audit (operators/similarity.py — recall@k drift
    # monitor of the materialized ANN index vs exact, rows-only; the
    # machinery is pinned by the adversarial drift/rebuild test),
    # +q_index_verify (operators/index_verify.py — one-pass fsck of the
    # materialized index: duplicates, misplaced files, stale sidecar,
    # manifest coverage; corruption injection pinned in tests),
    # +q_retrieval_eval, +q_retrieval_eval_hybrid (operators/serving.py —
    # MRR/NDCG/precision@k of the BM25 run and the hybrid RRF run against
    # the same English-relevance graded qrels, exact integer ppm, fully
    # oracle-checked + pure-Python pinned; the lexical-vs-hybrid A/B),
    # +q_expectations, +q_dataset_diff, +q_key_skew_profile
    # (operators/gates.py — declarative data-quality gate, keyed release
    # diff, join-key skew diagnostics; all oracle-checked integer ppm),
    # +q_context_pack (operators/serving.py — greedy RAG context packing
    # of the BM25 run under a token budget, oracle-checked),
    # +q_stream_expectations (streaming/batch_windows.py — the gate as a
    # continuous Structured Streaming monitor, complete-mode one-row
    # state, fully oracle-checked via shared constraint definitions),
    # +q_time_travel, +q_version_history (versioned.py — manifest-committed
    # versioned tables: snapshot reads, time travel, rollback, vacuum;
    # both fully oracle-checked over the replace/append/rollback lifecycle),
    # +q_bm25_batch (operators/text.py — multi-query BM25 in one postings
    # pass, WindowGroupLimit per-query top-k, oracle-checked),
    # +q_versioned_skipping (versioned.py — manifest-side data skipping:
    # per-file min/max stats prune the explicit file list before the
    # scan; file-count shrink pinned in tests, oracle-checked),
    # +q_versioned_merge (versioned.py — copy-on-write MERGE at file
    # granularity via the skipping stats, oracle-checked),
    # +q_ann_filtered (operators/similarity.py — filtered vector search:
    # metadata predicate as a pre-filter equi-join before scoring,
    # exact + oracle-checked),
    # +q_ann_ivf_pq_filtered (similarity.py — the same predicate composed
    # with the materialized IVF-PQ probe: allow-list joins the posting
    # rows before ADC, rows-only + membership/fill/overlap pins),
    # +q_context_pack_batch (operators/serving.py — per-query greedy
    # packing over the batched BM25 run, oracle-checked),
    # +q_ann_filtered_recall_audit (similarity.py — recall@k of the
    # adaptive-probe filtered path vs the exact filtered baseline at three
    # predicate selectivities; rows-only, floor pinned in test_joins_ivf),
    # +q_versioned_delete (versioned.py — copy-on-write DELETE with prune
    # ranges over a range-clustered table, oracle-checked),
    # +q_schema_evolution (versioned.py — additive + widening evolution
    # read end-to-end: pinned-schema scan null-fills/upcasts pre-evolution
    # files, oracle-checked vs CAST + CASE over the source)
    assert len(specs) == 220
    # round-1 fixed rows stay inside the verified window too
    fixed = {"q_json_extract", "q_array_agg", "q_map_funcs", "q_sample", "q_approx_quantile"}
    assert fixed <= set(list(specs)[:DRIVER_WINDOW])
