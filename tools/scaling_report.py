"""Decomposition report for the walk-stage scaling bound.

Reads a JSONL of tools/scaling_job.py runs (mixed cpus / sink /
n_turns) and emits the markdown decomposition table: for every
(sink, n_turns) with both a low- and high-cpu run, per-stage scaling
efficiency — extract, walks, total — using the MIN wall per config.

The ladder: sink=count (BFS joins only, arrays pruned) → sink=hash
(+ full token materialization, bit_xor(xxhash64(walk))) → sink=write
(+ parquet encode + one-box write). Comparing rungs separates "the
plan doesn't scale" from "one shared memory bus / write path doesn't".

Usage: python tools/scaling_report.py runs.jsonl [n_low] [n_high]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def load(path: str):
    runs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                runs.append(json.loads(line))
    return runs


def best(runs, cpus, sink, n_turns):
    sel = [
        r
        for r in runs
        if r["cpus"] == str(cpus)
        and r.get("sink", "write") == sink
        and r["n_turns"] == n_turns
    ]
    if not sel:
        return None
    b = min(sel, key=lambda r: r["wall_sec"])
    b = dict(b)
    b["n_reps"] = len(sel)
    b["all_walks_sec"] = [r["walks_sec"] for r in sel]
    return b


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scalruns_r3.jsonl"
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    factor = n_high / n_low
    runs = load(path)
    combos = sorted(
        {(r.get("sink", "write"), r["n_turns"]) for r in runs},
        key=lambda x: (x[1], x[0]),
    )
    rows = []
    for sink, n_turns in combos:
        lo = best(runs, n_low, sink, n_turns)
        hi = best(runs, n_high, sink, n_turns)
        if not lo or not hi:
            continue
        rows.append(
            {
                "sink": sink,
                "n_turns": n_turns,
                "lo": lo,
                "hi": hi,
                "eff_extract": round(
                    lo["extract_sec"] / hi["extract_sec"] / factor, 3
                ),
                "eff_walks": round(
                    lo["walks_sec"] / hi["walks_sec"] / factor, 3
                ),
                "eff_total": round(
                    lo["wall_sec"] / hi["wall_sec"] / factor, 3
                ),
            }
        )
    print(
        f"| sink | turns | walks lo/hi (s) | eff extract | eff walks "
        f"| eff total | reps lo/hi |"
    )
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['sink']} | {r['n_turns']:,} "
            f"| {r['lo']['walks_sec']}/{r['hi']['walks_sec']} "
            f"| {r['eff_extract']} | {r['eff_walks']} | {r['eff_total']} "
            f"| {r['lo']['n_reps']}/{r['hi']['n_reps']} |"
        )
    print()
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
