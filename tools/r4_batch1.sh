#!/bin/bash
# round-4 batch 1: fresh baseline for the walk-prep fixed-cost attack.
# count-sink pairs at pinned 8c/2c on current HEAD + SCALE_PHASES
# diagnostic. Each run has its own timeout; scaling_job leftovers are
# killed between runs (orphan-JVM hazard — see memory notes).
cd /root/repo || exit 1
OUT=BENCH/scalruns_r4.jsonl
run() {
  local cpus=$1 tag=$2; shift 2
  pkill -f scaling_job.py; sleep 2
  local line
  line=$(timeout 900 env SPARK_GRAFT_CPUS="$cpus" SCALE_CONVS=480000 SCALE_SINK=count "$@" \
    taskset -c 0-$((cpus-1)) python tools/scaling_job.py 2>/dev/null | tail -1)
  if [ -n "$line" ]; then
    printf '{"tag": "%s", "git": "%s", %s\n' "$tag" "$(git rev-parse --short HEAD)" "${line#\{}" >> "$OUT"
  else
    printf '{"tag": "%s", "error": "timeout-or-empty"}\n' "$tag" >> "$OUT"
  fi
}
run 8 r4a8_phases SCALE_PHASES=1
run 8 r4a8
run 2 r4a2
run 8 r4a8
run 2 r4a2
pkill -f scaling_job.py
echo done >> "$OUT"
