#!/bin/bash
# Round-5 sf1 correctness, batch 2: every queries() entry NOT covered by
# the first sf1 run (tools/sf1_oracles_r05.log, 23 queries) — run under
# the identical driver protocol at the /dev/shm/datax_sf1 fixtures, in
# chunks so a slow chunk can't block the rest. Appends to
# tools/sf1_oracles_r05_batch2.log. emb_near_dup (brute all-pairs, the
# slowest Spark+DuckDB row; already PASS at sf1, commit 718df1d) runs
# LAST in its own chunk.
set -u
cd "$(dirname "$0")/.."
export SPARK_GRAFT_ORACLE_SF_DIR=${SPARK_GRAFT_ORACLE_SF_DIR:-/dev/shm/datax_sf1}
LOG=tools/sf1_oracles_r05_batch2.log

run_chunk() {
  echo "==== chunk $1 ($(date -u +%H:%M:%SZ)) ====" >> "$LOG"
  shift
  python tools/check_oracles.py "$@" >> "$LOG" 2>&1
  echo "---- chunk exit=$? ----" >> "$LOG"
}

run_chunk A \
  q2_min_cost_supplier q3_shipping q4_order_priority q5_local_supplier \
  q6_forecast_revenue q7_volume_shipping q8_market_share q10_returned_items \
  q11_important_stock q12_shipmode_priority q13_customer_distribution \
  q14_promo_revenue q15_top_supplier q16_parts_supplier q17_small_qty_revenue \
  q19_discounted_revenue q20_potential_promotion q21_suppliers_waiting \
  q22_global_sales_opp rollup_orders setops_custkeys customers_without_orders \
  window_customer_rank split_range_assign stream_source_const

run_chunk B \
  cdc_tombstones cdc_op_mix cdc_out_of_order cdc_multiver_fanout \
  cdc_cell_merge cdc_session_gaps cdc_stream_enrich shard_tail_read \
  events_windowed_counts events_value_histogram events_cube_report \
  asof_enrich_events range_join_event_windows sketch_kmv_distinct \
  hll_distinct_urls sketch_cms_words doc_hash_split url_canonicalize \
  url_blocklist

run_chunk C \
  doc_token_stats doc_quality doc_quality_score doc_fingerprint doc_lang_id \
  doc_stopword_ratio doc_repetition doc_unigram_logprob doc_shingle_idf \
  doc_paragraph_dedup doc_pii_scrub doc_nfc_normalize doc_length_quantiles \
  doc_stratified_sample doc_weighted_sample doc_decontaminate \
  corpus_curation dx_string_transforms dx_filter_digest

run_chunk D \
  dedup_ngram_jaccard dedup_simhash dedup_minhash_keep dedup_incremental_keep \
  dedup_components_keep ann_cosine_topk ann_ivf_topk ann_pq_topk \
  ann_pq_recall ann_recall emb_near_dup_lsh emb_semantic_dedup \
  media_features media_frames media_decode_features media_video_frames

run_chunk E emb_near_dup

echo "==== batch2 done ($(date -u +%H:%M:%SZ)) ====" >> "$LOG"
