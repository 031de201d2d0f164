#!/bin/bash
# Round-20 evidence chain, run AFTER tools/gates.sh (every step blocks
# on the shared heavy-job lock, so it can be queued while gates run):
#   1. protocol bench: idle-host min-of-2, full registry, sf0.1
#      local[32] — the VERDICT r19 #1 ask. Bench itself now takes the
#      lock + loadavg pre-flight and stamps run_id/load1/contended
#      into BENCH_FULL.json + BENCH_SUMMARY.json (same run, atomic
#      writes), so the two artifacts can never again be different runs.
#   2. 100x verify at /tmp/sf10 (the standing 65-query surface) ->
#      CORRECTNESS_100x.json
#   3. 100x WIDENING (r19 ask #5): +11 scaled-documents/events rows
#      verified + subset-MERGED into CORRECTNESS_100x.json (a slow new
#      oracle can never block or shrink the standing 65)
#   4. 100x graph/CDC volume gate (r19 ask #5's real gap): the
#      fixpoints/trade-graph/CDC legs read orders+lineitem, which
#      /tmp/sf10 merely symlinks at sf0.1 — /tmp/sf10g (mk100xg.py)
#      scales THOSE 100x -> CORRECTNESS_100xc.json
#   5. IVF-PQ + IVFADC rebuild family at 100x -> CORRECTNESS_100xb.json
#   6. BENCH_100x refresh at HEAD (r19 ask #3): the r18 artifact spent
#      1076/1573 s re-paying the inline NSW build; recall_eval now
#      walks the persisted graph, and the TIMING subset benches the
#      indexed NSW row instead of the inline build (index == inline is
#      hash-proven by ann_nsw_indexed in the correctness artifact).
#
# Fail-loud discipline: pipefail everywhere INCLUDING child shells
# (ADVICE r19: a plain `cmd | tail | tee` child takes tee's status and
# logs PASS over a dead Bench); every step records its real status,
# continues so one red never erases later evidence, and the chain
# exits nonzero if anything failed.
set -uo pipefail
cd /root/repo
log=/tmp/r20evidence.log
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

# defunct-writer pre-flight (the r18 method): a leftover oracle pass
# still growing spill would poison every timing below
note "pre-flight: stray heavy writers"
ps aux | grep -E 'duckdb|graft\.(Bench|Verify)|check\.py' | grep -v grep | tee -a "$log" || true

# the standing 65-query 100x surface (unchanged from r19)
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

# r19 ask #5 widening, leg A: +11 rows whose inputs (documents 500k /
# events 10M) ARE volume-scaled at /tmp/sf10 but had never run there
QWIDE="near_dedup_minhash near_dedup_jaccard simhash_dup winnow_overlap \
winnow_fingerprint substring_dedup dedup_survivors bm25_topk tfidf_topk \
streamed_bm25_fold events_sessionize"

# r19 ask #5, leg B: the shapes that read orders+lineitem, at the
# /tmp/sf10g fixture where THOSE tables are the 100x axis
QGRAPH="bfs_hops bfs_hops_fixpoint sssp_weighted sssp_fixpoint \
pagerank_trade incremental_pagerank incremental_pagerank_batch2 \
cdc_apply cdc_apply_compacted streamed_cdc_apply streamed_cdc_asof \
streamed_cdc_compacted table_diff"

QB="ann_ivfpq ann_ivfpq_indexed ann_ivfpq_recall_eval ann_ivfpq_upsert ann_ivfpq_delete \
ann_pq_trained ann_pq_trained_recall_eval streamed_ivfpq_upsert \
ann_ivfadc ann_ivfadc_recall_eval ann_recall_nprobe_sweep"

# timing subset (r19 ask #3): Q100X minus the inline NSW build — the
# index==inline equivalence is hash-proven in CORRECTNESS_100x.json,
# so the bench prices the production probe path (ann_nsw_indexed),
# not a rebuild the steady state never pays
QT=$(echo $Q100X | sed 's/\bann_nsw\b//')

step "protocol bench run 1 (sf0.1 full registry, idle host, lock held)" \
  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  tools/run.sh graft.Bench
cp BENCH_FULL.json /tmp/bench_run1.json
cp BENCH_SUMMARY.json /tmp/bench_run1_summary.json
step "protocol bench run 2" \
  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  tools/run.sh graft.Bench
cp BENCH_FULL.json /tmp/bench_run2.json
cp BENCH_SUMMARY.json /tmp/bench_run2_summary.json

# wipe dump dirs first (ADVICE r19: stale query dirs from older runs
# become permanent no_oracle rows in the merged artifact)
rm -rf /tmp/v100x /tmp/v100xw /tmp/v100xg /tmp/v100xb

step "100x verify (standing 65-query surface)" \
  env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  tools/run.sh graft.Verify /tmp/sf10 /tmp/v100x $Q100X
step "100x check" \
  python3 tools/check.py /tmp/sf10 /tmp/v100x CORRECTNESS_100x.json

step "100x widening verify (+11 scaled-doc/event rows)" \
  env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  tools/run.sh graft.Verify /tmp/sf10 /tmp/v100xw $QWIDE
step "100x widening check (subset-merge into CORRECTNESS_100x.json)" \
  python3 tools/check.py /tmp/sf10 /tmp/v100xw CORRECTNESS_100x.json $QWIDE

step "100x graph/CDC fixture build (/tmp/sf10g)" \
  python3 tools/mk100xg.py
step "100x graph/CDC verify (orders+lineitem scaled 100x)" \
  env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  tools/run.sh graft.Verify /tmp/sf10g /tmp/v100xg $QGRAPH
step "100x graph/CDC check" \
  python3 tools/check.py /tmp/sf10g /tmp/v100xg CORRECTNESS_100xc.json

step "100xb verify (IVF-PQ + IVFADC rebuild family)" \
  env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  tools/run.sh graft.Verify /tmp/sf10 /tmp/v100xb $QB
step "100xb check" \
  python3 tools/check.py /tmp/sf10 /tmp/v100xb CORRECTNESS_100xb.json

# pipefail INSIDE the child sh (ADVICE r19) so Bench's real exit
# status — not tee's — is what the step records
step "100x timing record (Bench subset, warm fixtures, indexed NSW)" \
  env SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  sh -c "set -o pipefail; tools/run.sh graft.Bench $QT | tail -1 | tee BENCH_100x.json"

if [ "$overall" -ne 0 ]; then
  note "R20 EVIDENCE: ONE OR MORE STEPS FAILED (see $log)"
else
  note "ALL R20 EVIDENCE DONE"
fi
exit $overall
