#!/bin/bash
# round-4 batch 3: post hard-checkpoint HEAD. Three pinned 8c/2c
# count-sink pairs + one phases diagnostic; per-run timeout and
# scaling_job cleanup between runs (orphan-JVM hazard — memory notes).
cd /root/repo || exit 1
OUT=BENCH/scalruns_r4.jsonl
run() {
  local cpus=$1 tag=$2; shift 2
  pkill -f scaling_job.py; sleep 2
  local line
  line=$(timeout 1400 env SPARK_GRAFT_CPUS="$cpus" SCALE_CONVS=1920000 SCALE_SINK=count "$@" \
    taskset -c 0-$((cpus-1)) python tools/scaling_job.py 2>/dev/null | tail -1)
  if [ -n "$line" ]; then
    printf '{"tag": "%s", "git": "%s", %s\n' "$tag" "$(git rev-parse --short HEAD)" "${line#\{}" >> "$OUT"
  else
    printf '{"tag": "%s", "error": "timeout-or-empty"}\n' "$tag" >> "$OUT"
  fi
}
run 2 r4L2
run 8 r4L8
run 2 r4L2
run 8 r4L8
pkill -f scaling_job.py
echo done_batch5 >> "$OUT"
