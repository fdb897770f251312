#!/usr/bin/env bash
# Empirical partitioning-invariance proof: re-run the partitioning-
# sensitive query sample under 7 shuffle partitions (vs the default 32).
# Different partition boundaries, same oracle hashes — backs the
# README's determinism claim. Exits nonzero on any mismatch.
set -euo pipefail
cd "$(dirname "$0")/.."
SPARK_GRAFT_CPUS=7 exec python tools/check.py /root/testdata/sf0.01 \
  dedup_minhash_lsh dedup_simhash_pairs similarity_knn similarity_knn_ivf \
  similarity_ivf_recall sketch_frequent_items approx_top_terms \
  pricing_summary stream_tumbling stream_sessionize_stateful \
  surrogate_increment graph_pagerank corpus_mixture_sample sequence_packing \
  semantic_dedup_keep stratified_take_quota expectations_quarantine \
  versioned_delete gosales_catalog_overview temperature_mixture_tau2 \
  scd2_point_in_time_lookup paragraph_dedup_c4 dedup_canonical_quality \
  merge_upsert_contract similarity_knn_bucketed dedup_incremental_ledger \
  token_budget_take neardup_incremental_ledger multimodal_decode_embed \
  stream_dedup_ledger grouped_pandas_gap_stats cogrouped_attribution \
  asof_join_tolerance versioned_optimize map_column_ops \
  chunk_documents_udtf pipe_syntax_pricing vector_ops_hof \
  corpus_intake_pipeline dpp_partitioned_fact_join binaryfile_media_ingest \
  versioned_history_table try_functions_safe variant_props_typed
