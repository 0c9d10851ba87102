#!/bin/bash
# *** SUPERSEDED — DO NOT RUN (ADVICE r11). Leg 2 is broken: it drives
# band steps without a preceding 'stage' step (the bands would read
# nonexistent staging parquet) and passes a non-step 'merge' token that
# throws in ContainmentStaged; the run() wrapper masks both. The working
# sequels are r11_campaign2.sh / r11_campaign3.sh / r11_campaign4.sh
# (correct step order: stage → 0 1 2 3 → verify). Kept for the resume-
# pattern documentation only. ***
#
# Round-11 campaign, strictly sequential (one heavy JVM at a time — the
# round-9 disk-collision and timing-contention lessons):
#  leg 1: fourth-decade minhash at the DERIVED width, NO env var —
#         VERDICT r10 #2's done-criterion (must reproduce the width-512
#         medians ±host noise; Parts derives 369 for docs1000);
#  leg 2: containment fourth decade via the STAGED band-pass operator,
#         one JVM per pass (scratch reclaimed at process exit), TWIN
#         runs for the determinism signal — VERDICT r10 #3;
#  leg 3: REPS_r11 watch sessions (r10 watch set + the three r10
#         rotations establishing their gates + ann_index_health);
#  leg 4: local bench at sf0.1.
# All JVMs run from a FROZEN classpath snapshot (GRAFT_CLASSES) so
# concurrent development compiles cannot mix class versions.
set -uo pipefail
cd /root/repo
export GRAFT_CLASSES=/root/repo/target/classes_r11snap
R=tools/run_java.sh

run() { # propagate JVM exit status explicitly (ADVICE r10 #5)
  "$@" 2>&1 | tail -2
  st=${PIPESTATUS[0]}
  [ "$st" -ne 0 ] && echo "STEP_ABORTED rc=$st: $*"
  return 0
}

echo "== leg 1: minhash fourth decade, derived width (no INIT_PARTS)"
SPARK_GRAFT_SF_DIR=target/docs1000 \
  run $R graft.BenchReps target/fd_minhash_derived_reps.json 3 dedup_minhash_lsh

echo "== leg 2: containment staged fourth decade, twin runs, 4 passes"
for v in 1 2; do
  for step in 0 1 2 3 merge; do
    run $R graft.ContainmentStaged target/docs1000 \
      target/fd_cont_staged_v$v 4 $step
  done
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

echo R11_CAMPAIGN_DONE
