#!/bin/bash
# round-5 scaling instrument upgrade: the SAME job under multi-JVM
# local-cluster masters — N vs 4N EXECUTORS (4 cores each), separate
# executor JVMs with their own heaps and real shuffle ser/de between
# them. This is the closest N->4N cluster proxy the sandbox can
# produce; the one-box thread-count proxy (local[2] vs local[8]) was
# exhausted in round 4 (walk-stage 0.60 rested on a bus-ceiling
# argument). Orphan-JVM hygiene per memory notes: pkill between runs,
# per-run timeout inside the script.
cd /root/repo || exit 1
OUT=BENCH/scalruns_r5.jsonl
run() {
  local nexec=$1 cores=$2 tag=$3; shift 3
  local cpus=$((nexec * cores))
  pkill -f scaling_job.py; pkill -f "spark.*executor.CoarseGrained"; sleep 3
  local line
  line=$(timeout 1200 env \
    SPARK_GRAFT_MASTER="local-cluster[$nexec,$cores,6144]" \
    SPARK_GRAFT_CPUS="$cpus" SPARK_DRIVER_MEM=8g \
    SCALE_CONVS=${SCALE_CONVS:-240000} SCALE_SINK=${SCALE_SINK:-count} "$@" \
    taskset -c 0-$((cpus-1)) python tools/scaling_job.py 2>/dev/null | tail -1)
  if [ -n "$line" ]; then
    printf '{"tag": "%s", "git": "%s", "master": "local-cluster[%s,%s,6144]", %s\n' \
      "$tag" "$(git rev-parse --short HEAD)" "$nexec" "$cores" "${line#\{}" >> "$OUT"
  else
    printf '{"tag": "%s", "error": "timeout-or-empty"}\n' "$tag" >> "$OUT"
  fi
}
# N = 1 executor x 4 cores, 4N = 4 executors x 4 cores.
# count sink = plan+shuffle scaling (the round-4 decomposition showed
# the write path is the one-box bottleneck, not the plan); one write
# pair for the full-pipeline number.
run 1 4 r5c1
run 4 4 r5c4
run 1 4 r5c1
run 4 4 r5c4
SCALE_SINK=write run 1 4 r5c1w
SCALE_SINK=write run 4 4 r5c4w
pkill -f scaling_job.py; pkill -f "spark.*executor.CoarseGrained"
echo done >> "$OUT"
