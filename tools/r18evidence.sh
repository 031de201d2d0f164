#!/bin/bash
# Round-18 evidence chain, run AFTER tools/gates.sh (each step blocks
# on the shared heavy-job lock, so it can be queued while gates run):
#   1. idle-host min-of-2 full-registry bench at sf0.1 (BASELINE close)
#   2. 100x spot-gate at the round-18 surface -> CORRECTNESS_100x.json
#   3. IVF-PQ rebuild family at 100x -> CORRECTNESS_100xb.json
#   4. 100x timing record (Bench subset, warm fixtures) -> BENCH_100x.json
set -e
cd /root/repo
log=/tmp/r18evidence.log
: > "$log"
note() { echo "=== $1 ($(date +%T)) ===" | tee -a "$log"; }

Q100X="exact_dedup bloom_dedup incremental_near_dedup dup_components incremental_components \
ann_ivf_indexed ann_ivf_upsert ann_ivf_delete near_dedup_after_delete incremental_substring_dedup \
bm25_indexed incremental_bm25 bm25_after_delete \
pagerank_trade incremental_pagerank incremental_pagerank_batch2 \
coorder_triangles coorder_triangles_indexed zorder_box_scan \
bfs_hops bfs_hops_fixpoint sssp_weighted scd2_customer_merge table_diff streamed_join_pairs \
cdc_apply cdc_apply_compacted streamed_cdc_apply streamed_cdc_asof \
streamed_cdc_compacted incremental_daily_counts part_skyline sql_recursive_chain \
fuzzy_join_parts fuzzy_canonical_parts fuzzy_recall_eval attribution_last_touch \
scd2_point_in_time compacted_scan rolling_active_users source_vocab_overlap \
orders_avro_scan events_interpolate event_trigram_paths rolling_active_kmv \
streamed_attribution sssp_fixpoint \
priority_sample_weighted priority_sample_estimate streamed_priority_sample hilbert_box_scan \
ann_nsw ann_nsw_indexed ann_nsw_upsert ann_nsw_delete ann_nsw_compacted \
ann_nsw_recall_eval streamed_nsw_upsert \
image_phash_dup image_phash_dup_png image_phash_dup_png_quarantined \
events_holt_trend events_holt_winters fuzzy_multikey_pairs fuzzy_reorder_resolve"

note "bench run 1 (sf0.1 full registry, idle host)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  tools/run.sh graft.Bench 2>/dev/null | tail -1 | tee -a "$log"
cp BENCH_FULL.json /tmp/bench_run1.json
note "bench run 2"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  tools/run.sh graft.Bench 2>/dev/null | tail -1 | tee -a "$log"
cp BENCH_FULL.json /tmp/bench_run2.json

note "100x verify (round-18 surface, 65 queries)"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  tools/run.sh graft.Verify /tmp/sf10 /tmp/v100x $Q100X 2>/dev/null | tail -1 | tee -a "$log"
note "100x check"
python3 tools/check.py /tmp/sf10 /tmp/v100x CORRECTNESS_100x.json 2>&1 | tee -a "$log" | tail -2

note "100xb verify (IVF-PQ rebuild family)"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  tools/run.sh graft.Verify /tmp/sf10 /tmp/v100xb ann_ivfpq ann_ivfpq_indexed \
  ann_ivfpq_recall_eval ann_ivfpq_upsert ann_ivfpq_delete ann_pq_trained \
  ann_pq_trained_recall_eval streamed_ivfpq_upsert 2>/dev/null | tail -1 | tee -a "$log"
note "100xb check"
python3 tools/check.py /tmp/sf10 /tmp/v100xb CORRECTNESS_100xb.json 2>&1 | tee -a "$log" | tail -2

note "100x timing record (Bench subset, warm fixtures)"
SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  tools/run.sh graft.Bench $Q100X 2>/dev/null | tail -1 | tee BENCH_100x.json | tee -a "$log"

note "ALL R18 EVIDENCE DONE"
