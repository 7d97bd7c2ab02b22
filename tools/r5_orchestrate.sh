#!/bin/bash
# round-5 measurement sequencer: waits for ladder A (r5_cluster.sh) to
# finish, runs ladder B (2-vs-8-core multi-JVM), then the sha2 ceiling
# calibration under every master used — one detached pipeline so no
# two measurements ever overlap (memory note: concurrent runs poison
# each other on this shared box).
cd /root/repo || exit 1
OUT=BENCH/scalruns_r5.jsonl

# 1. wait for ladder A
while pgrep -f r5_cluster.sh >/dev/null || pgrep -f scaling_job.py >/dev/null; do
  sleep 20
done
sleep 5

# 2. ladder B (2 vs 8 cores, multi-JVM, 5g executors)
bash tools/r5_cluster2.sh

# 3. ceiling calibration with the SAME instrument at both ladder
# geometries (and the old thread proxy for continuity)
calib() {
  local master=$1 cpus=$2 tag=$3
  pkill -f calib_cluster.py; pkill -f "spark.*executor.CoarseGrained"; sleep 3
  local line
  line=$(timeout 900 env SPARK_GRAFT_MASTER="$master" SPARK_GRAFT_CPUS="$cpus" \
    SPARK_DRIVER_MEM=8g \
    taskset -c 0-$((cpus-1)) python tools/calib_cluster.py 2>/dev/null | tail -1)
  [ -n "$line" ] && printf '{"tag": "%s", %s\n' "$tag" "${line#\{}" >> "$OUT"
}
calib "local-cluster[1,2,6144]" 2 calib_b1
calib "local-cluster[4,2,6144]" 8 calib_b4
calib "local-cluster[1,4,6144]" 4 calib_c1
calib "local-cluster[4,4,6144]" 16 calib_c4
pkill -f "spark.*executor.CoarseGrained"
echo all-done >> "$OUT"
