#!/bin/bash
# Round-12 campaign, leg 1: fourth-decade containment with the DERIVED
# pass count (VERDICT r11 #2 done-criterion) — stage once, let `derive`
# size B from the staged tables' exact candidate mass and the scratch
# budget (no hand-set 4), run bands 0..B-1, verify once, then hash-twin
# the merged result against the surviving r11 artifact
# (target/fd_cont_staged_v1/merged, same fixtures).
# Steps are idempotent per-JVM; a killed campaign resumes from the
# completed artifacts.
set -uo pipefail
cd /root/repo
export GRAFT_CLASSES=/root/repo/target/classes_r12snap
R=tools/run_java.sh
OUT=target/fd_cont_staged_r12
LOG=target/r12_campaign_derive.json

run() {
  "$@" 2>&1 | tail -3
  st=${PIPESTATUS[0]}
  [ "$st" -ne 0 ] && echo "STEP_ABORTED rc=$st: $*"
  return 0
}

echo "== stage (sh/arr/prefix parquet)"
run $R graft.ContainmentStaged target/docs1000 $OUT 0 stage
df -h / | tail -1

echo "== derive B (budget ${SPARK_GRAFT_SCRATCH_BUDGET_GB:-24} GB)"
$R graft.ContainmentStaged target/docs1000 $OUT 0 derive 2>/dev/null \
  | grep derived_passes | tee $LOG
B=$(python3 -c "import json;print(json.load(open('$LOG'))['derived_passes'])")
echo "derived B=$B"

echo "== band passes 0..$((B-1))"
for step in $(seq 0 $((B-1))); do
  run $R graft.ContainmentStaged target/docs1000 $OUT $B $step
  df -h / | tail -1
done

echo "== verify (broadcast arr, 96g heap + 8g maxResultSize)"
run env SPARK_DRIVER_MEM=96g $R graft.ContainmentStaged target/docs1000 $OUT $B verify
df -h / | tail -1

echo "== hash-twin vs r11 v1 merged"
python3 tools/fd_determinism.py $OUT target/fd_cont_staged_v1 merged \
  | tee target/r12_cont_twin.json

echo "R12_CAMPAIGN_DONE"
