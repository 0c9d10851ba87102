#!/bin/bash
# Round-10 fourth-decade width-512 campaign (VERDICT r9 #1): the four
# steepest-slope ops, one decade past 100x, at the protocol heap (40g)
# with SPARK_GRAFT_INIT_PARTS=512 — the per-decade partition-width
# scaling a real cluster applies (width-32 runs OOM'd hash-map builds).
# Timing: BenchReps (noop-write action, 3 reps — same protocol as the
# three-decade fits), ONE JVM PER QUERY so an OOM abort cannot take the
# rest of the campaign down. Correctness: TWO independent Verify dumps
# per query; rows + content hashes compared in DuckDB afterwards
# (determinism signal — the DuckDB oracle duals themselves are
# documented infeasible at 5M docs).
set -uo pipefail
cd /root/repo
R=tools/run_java.sh
export SPARK_GRAFT_INIT_PARTS=512
set -x
SPARK_GRAFT_SF_DIR=target/li300 $R graft.BenchReps target/fd_salted_reps.json 3 \
  join_salted_skew 2>&1 | tail -3
vrun() {  # Verify wrapper: propagate the JVM's exit status — a crashed
  # (e.g. OOM) Verify prints nothing through the 'failed' grep, and the
  # campaign must not read that as clean-pass (ADVICE round 10)
  "$R" graft.Verify "$@" 2>&1 | grep -i 'failed'
  st=${PIPESTATUS[0]}
  [ "$st" -ne 0 ] && echo "VERIFY_ABORTED rc=$st: $*"
  return 0
}
vrun target/li300 target/fd_li300_v1 join_salted_skew
vrun target/li300 target/fd_li300_v2 join_salted_skew
for q in dedup_minhash_lsh dedup_containment dedup_span_suffix; do
  SPARK_GRAFT_SF_DIR=target/docs1000 $R graft.BenchReps target/fd_${q}_reps.json 3 \
    $q 2>&1 | tail -3
done
vrun target/docs1000 target/fd_docs1000_v1 \
  dedup_minhash_lsh dedup_containment dedup_span_suffix
vrun target/docs1000 target/fd_docs1000_v2 \
  dedup_minhash_lsh dedup_containment dedup_span_suffix
echo FOURTH_DECADE_DONE
