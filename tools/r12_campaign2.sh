#!/bin/bash
# Round-12 campaign, leg 2 (run SOLO after r12_campaign.sh and the test
# suite): timing + decade evidence.
#  A: REPS_r12 — two 5-rep sf0.1 sessions of the r12 watch set
#     (r11 unadjudicated movers + deliberate-regression re-bases + the
#     r11/r12 rows earning first gates + host-noise canaries).
#  B: local bench at sf0.1 (the BENCH_r12 preview + line-length check).
#  C: decade probes for the r12 rows: x10 DuckDB-oracle compare and
#     x10/x100 timing medians (ann_index_rebuild, image_png_phash,
#     ann_nprobe_eval_sampled) + x100 twin determinism dumps.
set -uo pipefail
cd /root/repo
export GRAFT_CLASSES=/root/repo/target/classes_r12snap2
R=tools/run_java.sh

run() {
  "$@" 2>&1 | tail -3
  st=${PIPESTATUS[0]}
  [ "$st" -ne 0 ] && echo "STEP_ABORTED rc=$st: $*"
  return 0
}

WATCH="agg_approx_distinct agg_approx_percentile dedup_lsh_eval \
graph_pagerank dedup_containment ann_incremental_knn dedup_cross_modal \
stream_ann_ingest ann_index_rebuild image_png_phash \
ann_nprobe_eval_sampled ann_index_health em_gmm dedup_minhash_lsh \
dedup_simhash dedup_span_coverage ann_knn_cap_eval_sampled \
audio_wav_energy text_quality_score curation_pipeline"

echo "== leg A: REPS_r12 (two 5-rep sessions, sf0.1)"
for sess in 1 2; do
  run $R graft.BenchReps target/reps_r12_s$sess.json 5 $WATCH
done
python3 tools/reps_pool.py REPS_r12.json \
  target/reps_r12_s1.json target/reps_r12_s2.json \
  && echo "REPS_r12 pooled"

echo "== leg B: local bench, sf0.1"
env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench \
  2>target/bench_r12_local_stderr.log | grep '"metric"' \
  | tee target/bench_r12_local.json || echo "BENCH_ABORTED"

echo "== leg C1: x10 verify dumps (DuckDB-oracle compare offline)"
NEWQ="ann_index_rebuild image_png_phash ann_nprobe_eval_sampled"
run $R graft.Verify target/scale10x target/r12_x10_v1 $NEWQ
echo "== leg C2: x100 twin dumps"
run $R graft.Verify target/scale100x target/r12_x100_v1 $NEWQ
run $R graft.Verify target/scale100x target/r12_x100_v2 $NEWQ
python3 tools/fd_determinism.py target/r12_x100_v1 target/r12_x100_v2 $NEWQ \
  | tee target/r12_x100_twin.json
echo "== leg C3: decade timing medians (3 reps per slice)"
for S in /root/testdata/sf0.1 target/scale10x target/scale100x; do
  run env SPARK_GRAFT_SF_DIR=$S $R graft.BenchReps \
    target/r12_scale_$(basename $S).json 3 $NEWQ
done

echo "R12_CAMPAIGN2_DONE"
