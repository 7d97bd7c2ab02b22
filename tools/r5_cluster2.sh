#!/bin/bash
# round-5 ladder B: multi-JVM at the SAME core counts round 4 used
# (2 vs 8) so the numbers are comparable to the thread-proxy history —
# 1 executor x 2 cores vs 4 executors x 2 cores, separate JVMs, real
# shuffle ser/de, 5g executor heaps (removes the 1g-default heap
# confounder of ladder A).
cd /root/repo || exit 1
OUT=BENCH/scalruns_r5.jsonl
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
run 1 2 r5b1
run 4 2 r5b4
run 1 2 r5b1
run 4 2 r5b4
SCALE_SINK=write run 1 2 r5b1w
SCALE_SINK=write run 4 2 r5b4w
pkill -f scaling_job.py; pkill -f "spark.*executor.CoarseGrained"
echo done >> "$OUT"
