#!/bin/bash
# Round-10 slice regeneration (session scratch lives under target/, lost
# at session end — regenerate off the current driver fixtures).
set -uo pipefail
cd /root/repo
R=tools/run_java.sh
SF=/root/testdata/sf0.1
set -x
$R graft.ScaleGen $SF target/scale10x 10                       2>&1 | tail -2
$R graft.ScaleGen $SF target/scale100x 100 documents,embeddings 2>&1 | tail -2
$R graft.ScaleGen $SF target/events100x 100 events              2>&1 | tail -2
$R graft.ScaleGen $SF target/docs1000 1000 documents            2>&1 | tail -2
$R graft.ScaleGen $SF target/li300 300 lineitem,orders          2>&1 | tail -2
echo SLICES_DONE
