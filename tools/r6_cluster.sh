#!/bin/bash
# round-6 measurement sequencer (one detached pipeline — memory note:
# concurrent measurements poison each other on this shared box):
#   1. ladder B (1x2 vs 4x2 multi-JVM, 5g executors) walk job with the
#      round-6 pre-partitioned edge table, count + write sinks, 2 reps
#   2. sha2 ceiling calibration at both geometries
#   3. two full bench.py runs at sf0.1 local[32] (each line is already
#      min-of-2 inside bench.py; two runs give min-of-4 spot checks)
# Results: BENCH/scalruns_r6.jsonl + BENCH/bench_r6_local_{1,2}.json
cd /root/repo || exit 1
OUT=BENCH/scalruns_r6.jsonl

run() {
  local nexec=$1 cores=$2 tag=$3; shift 3
  local cpus=$((nexec * cores))
  pkill -f scaling_job.py; pkill -f "spark.*executor.CoarseGrained"; sleep 3
  local line
  line=$(timeout 1800 env \
    SPARK_GRAFT_MASTER="local-cluster[$nexec,$cores,6144]" \
    SPARK_GRAFT_CPUS="$cpus" SPARK_DRIVER_MEM=8g \
    SCALE_EXTRA_CONF="spark.executor.memory=5g" \
    SCALE_CONVS=${SCALE_CONVS:-240000} SCALE_SINK=${SCALE_SINK:-count} "$@" \
    taskset -c 0-$((cpus-1)) python tools/scaling_job.py 2>/dev/null | tail -1)
  if [ -n "$line" ]; then
    printf '{"tag": "%s", "git": "%s", "master": "local-cluster[%s,%s,6144]", "exec_mem": "5g", %s\n' \
      "$tag" "$(git rev-parse --short HEAD)" "$nexec" "$cores" "${line#\{}" >> "$OUT"
  else
    printf '{"tag": "%s", "error": "timeout-or-empty"}\n' "$tag" >> "$OUT"
  fi
}

# interleaved 1x2 / 4x2 so an ambient burst can't bias one arm
run 1 2 r6b1
run 4 2 r6b4
run 1 2 r6b1
run 4 2 r6b4
SCALE_SINK=write run 1 2 r6b1w
SCALE_SINK=write run 4 2 r6b4w
SCALE_SINK=write run 1 2 r6b1w
SCALE_SINK=write run 4 2 r6b4w

calib() {
  local master=$1 cpus=$2 tag=$3
  pkill -f calib_cluster.py; pkill -f "spark.*executor.CoarseGrained"; sleep 3
  local line
  line=$(timeout 900 env SPARK_GRAFT_MASTER="$master" SPARK_GRAFT_CPUS="$cpus" \
    SPARK_DRIVER_MEM=8g \
    taskset -c 0-$((cpus-1)) python tools/calib_cluster.py 2>/dev/null | tail -1)
  [ -n "$line" ] && printf '{"tag": "%s", %s\n' "$tag" "${line#\{}" >> "$OUT"
}
calib "local-cluster[1,2,6144]" 2 r6calib_b1
calib "local-cluster[4,2,6144]" 8 r6calib_b4
pkill -f "spark.*executor.CoarseGrained"

# full local bench, twice, sequenced after the ladders
for i in 1 2; do
  pkill -f scaling_job.py; pkill -f bench.py; sleep 3
  timeout 1800 env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    python bench.py > "BENCH/bench_r6_local_$i.json.tmp" 2>/dev/null \
    && tail -1 "BENCH/bench_r6_local_$i.json.tmp" > "BENCH/bench_r6_local_$i.json"
  rm -f "BENCH/bench_r6_local_$i.json.tmp"
done
echo all-done >> "$OUT"
