#!/bin/bash
set -uo pipefail
cd /root/repo
export GRAFT_CLASSES=/root/repo/target/classes_r11snap
R=tools/run_java.sh
for step in 1 2 3; do
  $R graft.ContainmentStaged target/docs1000 target/fd_cont_staged_v2 4 $step 2>&1 | tail -1
done
SPARK_DRIVER_MEM=96g $R graft.ContainmentStaged target/docs1000 target/fd_cont_staged_v2 4 verify 2>&1 | tail -1
echo TWIN_V2_DONE
