#!/bin/bash
# Round-11 campaign, part 3 — resume after the broadcast-verify patch.
# v1's stage + 4 cand passes are already on disk (one-JVM-per-step pays
# off: only the verify re-runs); v2 runs fully independent for the twin
# determinism signal. Then REPS_r11 and the local bench.
set -uo pipefail
cd /root/repo
export GRAFT_CLASSES=/root/repo/target/classes_r11snap
R=tools/run_java.sh

run() {
  "$@" 2>&1 | tail -3
  st=${PIPESTATUS[0]}
  [ "$st" -ne 0 ] && echo "STEP_ABORTED rc=$st: $*"
  return 0
}

echo "== leg 2a: v1 verify (broadcast arr)"
run $R graft.ContainmentStaged target/docs1000 target/fd_cont_staged_v1 4 verify
df -h / | tail -1

echo "== leg 2b: v2 full twin (stage/4 bands/verify)"
for step in stage 0 1 2 3 verify; do
  run $R graft.ContainmentStaged target/docs1000 target/fd_cont_staged_v2 4 $step
  df -h / | tail -1
done

echo "== leg 3: REPS_r11 (two 5-rep sessions at sf0.1)"
WATCH="agg_approx_distinct agg_approx_percentile ann_ivf_topk \
curation_pipeline decontam_overlap dedup_clusters dedup_embedding_lsh \
dedup_minhash_lsh dedup_simhash dedup_span_coverage em_gmm \
events_asof_join gamma_fixed join_salted_skew q7_volume_shipping \
text_jaccard_pairs text_quality_score ann_incremental_knn \
ann_knn_cap_eval_sampled audio_wav_energy ann_index_health"
for sess in 1 2; do
  run $R graft.BenchReps target/reps_r11_s$sess.json 5 $WATCH
done
python3 tools/reps_pool.py REPS_r11.json \
  target/reps_r11_s1.json target/reps_r11_s2.json \
  && echo "REPS_r11 pooled"

echo "== leg 4: local bench, sf0.1"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $R graft.Bench \
  2>/dev/null | grep '"metric"' > target/bench_r11_local.json
cat target/bench_r11_local.json

echo R11_CAMPAIGN3_DONE
