#!/bin/bash
# Round-19 evidence chain, run AFTER tools/gates.sh (each step blocks
# on the shared heavy-job lock, so it can be queued while gates run):
#   1. idle-host min-of-2 full-registry bench at sf0.1 (BASELINE close)
#   2. 100x verify + check at the round-19 surface -> CORRECTNESS_100x.json
#   3. IVF-PQ + IVFADC rebuild family at 100x -> CORRECTNESS_100xb.json
#   4. 100x timing record (Bench subset, warm fixtures) -> BENCH_100x.json
#
# Fail-loud discipline (VERDICT r18 ask #3 + ADVICE pipefail finding):
# the r18 chain ran `cmd | tail` under plain `set -e`, which masks the
# left side's exit status, and 2>/dev/null discarded Verify's
# "[verify] INCOMPLETE" stderr — so it printed ALL DONE past a failed
# check. Every step now runs through `step`, which captures the real
# exit status (pipefail), logs PASS/FAIL per step, CONTINUES so one
# red never erases the later evidence, and exits nonzero at the end if
# anything failed.
set -uo pipefail
cd /root/repo
log=/tmp/r19evidence.log
: > "$log"
overall=0
note() { echo "=== $1 ($(date +%T)) ===" | tee -a "$log"; }
step() { # step <name> <cmd...>: log full output, record real status
  local name=$1 rc=0; shift
  note "$name"
  "$@" >> "$log" 2>&1 || rc=$?
  tail -3 "$log"   # show the step's last output lines on the console
  if [ "$rc" -eq 0 ]; then
    echo "PASS $name" | tee -a "$log"
  else
    echo "FAIL $name (exit $rc)" | tee -a "$log"
    overall=1
  fi
}

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

QB="ann_ivfpq ann_ivfpq_indexed ann_ivfpq_recall_eval ann_ivfpq_upsert ann_ivfpq_delete \
ann_pq_trained ann_pq_trained_recall_eval streamed_ivfpq_upsert \
ann_ivfadc ann_ivfadc_recall_eval ann_recall_nprobe_sweep"

step "bench run 1 (sf0.1 full registry, idle host)" \
  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  tools/run.sh graft.Bench
cp BENCH_FULL.json /tmp/bench_run1.json
step "bench run 2" \
  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  tools/run.sh graft.Bench
cp BENCH_FULL.json /tmp/bench_run2.json

# wipe the dump dir first (ADVICE r19: stale query dirs from older runs
# in /tmp/v100x became permanent no_oracle rows — mirror the v100xb fix)
rm -rf /tmp/v100x
step "100x verify (round-19 surface, 65 queries)" \
  env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  tools/run.sh graft.Verify /tmp/sf10 /tmp/v100x $Q100X
step "100x check" \
  python3 tools/check.py /tmp/sf10 /tmp/v100x CORRECTNESS_100x.json

# 100xb: wipe the dump dir first (VERDICT r18 ask #4 — stale dumps
# from older runs turned into permanent no_oracle rows in the artifact)
rm -rf /tmp/v100xb
step "100xb verify (IVF-PQ + IVFADC rebuild family)" \
  env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  tools/run.sh graft.Verify /tmp/sf10 /tmp/v100xb $QB
step "100xb check" \
  python3 tools/check.py /tmp/sf10 /tmp/v100xb CORRECTNESS_100xb.json

# pipefail INSIDE the child sh (ADVICE r19: without it the pipeline's
# status is tee's, and a Bench failure logs PASS with a stale artifact)
step "100x timing record (Bench subset, warm fixtures)" \
  env SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  sh -c "set -o pipefail; tools/run.sh graft.Bench $Q100X | tail -1 | tee BENCH_100x.json"

if [ "$overall" -ne 0 ]; then
  note "R19 EVIDENCE: ONE OR MORE STEPS FAILED (see $log)"
else
  note "ALL R19 EVIDENCE DONE"
fi
exit $overall
