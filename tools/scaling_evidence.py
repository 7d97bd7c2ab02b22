"""Generate BENCH/BASELINE.md — the two-cluster-size scaling evidence —
from the JSONLs of tools/scaling_job.py runs.

North-rule criterion: throughput scaling efficiency ≥ 0.8 from N to 4N
executors. Sandbox proxy per the driver instruction: the same job on
the same input at taskset-pinned local[2] vs local[8]. Round 4 keeps
round 3's decomposition ladder + input-size sweep (historical, old
walk-prep path) and adds the round-4 A/B: the per-KG indexed-name
table (one id source, no per-run union+distinct over 2|V| tokens)
against the round-3 path, at two core counts and two input sizes.

Usage: python tools/scaling_evidence.py [r3.jsonl [r4.jsonl]]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CEILING = 0.87  # same-box calibration: sha2-over-80M-rows job, warm, 2->8 pinned


def load(path: str):
    runs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or not line.startswith("{"):
                continue
            r = json.loads(line)
            if "error" not in r:
                runs.append(r)
    return runs


def best(runs, cpus, n_turns, sink="count", tags=None, key="wall_sec"):
    sel = [
        r
        for r in runs
        if r["cpus"] == str(cpus)
        and r.get("sink", "write") == sink
        and r["n_turns"] == n_turns
        and (tags is None or any(r.get("tag", "").startswith(t) for t in tags))
    ]
    if not sel:
        return None
    b = dict(min(sel, key=lambda r: r[key]))
    b["n_reps"] = len(sel)
    b["all_wall"] = sorted(r["wall_sec"] for r in sel)
    b["all_walks"] = sorted(r["walks_sec"] for r in sel)
    return b


def eff(lo, hi, field, factor=4.0):
    return round(lo[field] / hi[field] / factor, 2)


NEW = ("r4a", "r4b", "r4s", "r4L")  # indexed-name walk-prep path (round 4)
OLD3 = ("base",)  # round-3 walk-prep path re-run in the round-4 window


def _r5_section(r5):
    """Round-5 multi-JVM instrument: local-cluster[N,C,M] ladders (1 vs
    4 executor JVMs — the north rule's N vs 4N executors literally) +
    the sha2 ceiling re-measured under the SAME instrument."""
    w_out = []
    w = w_out.append

    def b5(tag, sink="count"):
        sel = [
            r for r in r5
            if r.get("tag") == tag and r.get("sink", "count") == sink
            and "error" not in r
        ]
        if not sel:
            return None
        b = dict(min(sel, key=lambda r: r["wall_sec"]))
        b["n_reps"] = len(sel)
        b["all_wall"] = sorted(r["wall_sec"] for r in sel)
        return b

    calib = {r["tag"]: r for r in r5 if r.get("calib") == "sha2"}
    w("## Round-5 instrument upgrade: multi-JVM local-cluster ladders\n")
    w(
        "The one-box THREAD proxy above cannot separate \"the plan stops\n"
        "scaling\" from \"the box's memory bus is saturated\" (round-4\n"
        "verdict). Round 5 re-runs the same job under\n"
        "`local-cluster[N,C,6144]` masters: N SEPARATE executor JVMs —\n"
        "real shuffle serialization between executors, per-executor\n"
        "heaps, taskset-pinned to exactly N×C cores. \"1 executor vs 4\n"
        "executors\" is the north rule's N-vs-4N phrasing literally; a\n"
        "real 4N cluster would also multiply memory bandwidth and disks,\n"
        "which one box cannot, so the sha2 ceiling is re-measured under\n"
        "the SAME instrument (bottom row of each table).\n"
    )
    for ladder, cores, lo_t, hi_t, cal_lo, cal_hi in (
        ("B", 2, "r5b1", "r5b4", "calib_b1", "calib_b4"),
        ("A", 4, "r5c1", "r5c4", "calib_c1", "calib_c4"),
    ):
        pairs = []
        for sink in ("count", "write"):
            lo = b5(lo_t + ("w" if sink == "write" else ""), sink)
            hi = b5(hi_t + ("w" if sink == "write" else ""), sink)
            if lo and hi:
                pairs.append((sink, lo, hi))
        if not pairs:
            continue
        w(
            f"### Ladder {ladder}: 1×{cores} vs 4×{cores} cores "
            f"(executors × cores/executor)\n"
        )
        w("| sink | extract lo/hi (s) | walks lo/hi (s) | total lo/hi (s)"
          " | eff extract | eff walks | eff total |")
        w("|---|---|---|---|---|---|---|")
        for sink, lo, hi in pairs:
            w(
                f"| {sink} | {lo['extract_sec']} / {hi['extract_sec']} "
                f"| {lo['walks_sec']} / {hi['walks_sec']} "
                f"| {lo['wall_sec']} / {hi['wall_sec']} "
                f"| {eff(lo, hi, 'extract_sec')} "
                f"| {eff(lo, hi, 'walks_sec')} "
                f"| {eff(lo, hi, 'wall_sec')} |"
            )
        cl, ch = calib.get(cal_lo), calib.get(cal_hi)
        if cl and ch:
            ceiling = round(cl["wall_sec"] / ch["wall_sec"] / 4, 2)
            w(
                f"| **sha2 ceiling** | — | — | {cl['wall_sec']} / "
                f"{ch['wall_sec']} | — | — | **{ceiling}** |"
            )
            for sink, lo, hi in pairs:
                ratio = round(eff(lo, hi, "wall_sec") / ceiling, 2)
                w(
                    f"\n{sink}-sink total = "
                    f"{eff(lo, hi, 'wall_sec')} / {ceiling} ceiling = "
                    f"**{ratio:.0%} of what even zero-shuffle CPU work "
                    f"achieves under this instrument**."
                )
        w("")
    w(
        "### What the multi-JVM numbers mean\n\n"
        "- **The instrument's own ceiling collapses with executor\n"
        "  count**: sha2 — pure CPU, zero shuffle, zero write — drops\n"
        "  from 0.87 (thread proxy, 2→8 pinned cores) to the table\n"
        "  ceilings above once each \"executor\" is a separate JVM with\n"
        "  its own daemon, RPC scheduling, and Python workers sharing\n"
        "  one box's cores and memory bus. No job of ANY shape can\n"
        "  evidence ≥0.8 absolute under this proxy; the meaningful\n"
        "  reading is the ratio to the same-instrument ceiling.\n"
        "- **The pipeline tracks the ceiling**: the full write-sink\n"
        "  pipeline sits at ~the sha2 ceiling on both ladders, and\n"
        "  extraction matches or beats it — i.e. with real executor\n"
        "  boundaries and real shuffle ser/de, the plan adds no\n"
        "  serializing stage the instrument can detect. The walk stage's\n"
        "  count-sink number sits ~0.7× ceiling on ladder B (the bus-cap\n"
        "  signature from rounds 3-4, now reproduced under a second\n"
        "  instrument) and AT ceiling on ladder A.\n"
        "- **Both instruments exhausted**: thread proxy and multi-JVM\n"
        "  proxy agree — the residual gap is the box's shared memory\n"
        "  bus + per-executor overhead, resources a real 4N cluster\n"
        "  multiplies with N. The plan-level evidence (key-partitioned\n"
        "  joins, partition-local extraction, no driver loops, banded\n"
        "  dedup) is in BENCH/PLANS.md.\n\n"
        "### Round-5 headline-bench notes (sf0.1, local[32])\n\n"
        "- **q5 pagerank 29.2 → ~17-20 s**: fixed-iteration mode now\n"
        "  uses LAZY per-round localCheckpoints — the plan is still\n"
        "  truncated every iteration but all 20 rounds run as ONE job\n"
        "  instead of 20 driver-synchronized jobs (controlled variant\n"
        "  experiment: 18.3→16.5 s warm, 45.8→17.9 s cold).\n"
        "- **q7 back to round-3 level** (1.96-2.47 s vs r4's 2.26):\n"
        "  the r4 drift was ambient, per the new canary.\n"
        "- **q6 minhash carries a named ~2-3 s local cost**: round 5\n"
        "  re-keyed every LSH exchange by the 8-byte representative\n"
        "  doc_id (full texts no longer ride the band/pair/verify\n"
        "  shuffles — see the PLANS.md MinHash section). Interleaved\n"
        "  same-window A/B measures old 3.4-5.2 s vs new 5.9-8.8 s at\n"
        "  sf0.1, even though a stage-by-stage decomposition times the\n"
        "  id-keyed variant FASTER at every stage (hashes/pairs/verify)\n"
        "  — the residual sits in the full pipeline's cache\n"
        "  materialization interleaving, not in any exchange. Accepted\n"
        "  deliberately: sf0.1 synthetic texts are ~200 B (the id saves\n"
        "  nothing locally), while at 100-TB document scale the\n"
        "  band/pair/verify shuffles carry KB-scale documents twice —\n"
        "  the id-keying is the difference between shuffling the corpus\n"
        "  and shuffling 8-byte keys.\n"
        "- bench.py now records per-rep walls and a warm pre/mid/post\n"
        "  ambient canary (quiet ≈ 0.15-0.2 s); single-run lines (q2,\n"
        "  q8) were the only ones an ambient burst could hit\n"
        "  unprotected — q8 is min-of-2 since round 5.\n"
    )
    return "\n".join(w_out)


def _r6_section(r5, r6):
    """Round-6: ladder B re-run with the co-partitioned edge table
    (walks pre-partition + bucketed storage layout) and the q6 AQE
    single-partition fix; ceilings re-calibrated in the same window."""
    w_out = []
    w = w_out.append

    def b(runs, tag, sink="count"):
        sel = [
            r for r in runs
            if r.get("tag") == tag and r.get("sink", "count") == sink
            and "error" not in r
        ]
        if not sel:
            return None
        bst = dict(min(sel, key=lambda r: r["wall_sec"]))
        bst["all_wall"] = sorted(r["wall_sec"] for r in sel)
        return bst

    calib = {r["tag"]: r for r in r6 if r.get("calib") == "sha2"}
    w("## Round-6: co-partitioned edge reads (ladder B re-run)\n")
    w(
        "Round 6 pre-partitions + pre-sorts the cached BFS edge table on\n"
        "the frontier join key (above the broadcast limit), so every\n"
        "per-depth sort-merge join exchanges ONLY the frontier — the\n"
        "in-memory analogue of the new bucketed storage layout\n"
        "(`storage.write_bucketed_edge_ids`, plan-asserted: zero\n"
        "edge-side exchange). Ladder B re-run, same geometry and input\n"
        "as round 5 (240k convs, 2.4M turns, interleaved arms):\n"
    )
    rows = []
    for sink in ("count", "write"):
        sfx = "w" if sink == "write" else ""
        lo, hi = b(r6, "r6b1" + sfx, sink), b(r6, "r6b4" + sfx, sink)
        lo5, hi5 = b(r5, "r5b1" + sfx, sink), b(r5, "r5b4" + sfx, sink)
        if lo and hi:
            rows.append((sink, lo, hi, lo5, hi5))
    w("| sink | walks lo (s) r5→r6 | walks hi (s) r5→r6 | eff walks r5→r6 "
      "| eff extract | eff total |")
    w("|---|---|---|---|---|---|")
    for sink, lo, hi, lo5, hi5 in rows:
        e6 = eff(lo, hi, "walks_sec")
        e5 = eff(lo5, hi5, "walks_sec") if lo5 and hi5 else None
        w(
            f"| {sink} | {lo5['walks_sec'] if lo5 else '—'} → "
            f"{lo['walks_sec']} | {hi5['walks_sec'] if hi5 else '—'} → "
            f"{hi['walks_sec']} | {e5} → {e6} "
            f"| {eff(lo, hi, 'extract_sec')} | {eff(lo, hi, 'wall_sec')} |"
        )
    cl, ch = calib.get("r6calib_b1"), calib.get("r6calib_b4")
    if cl and ch:
        ceiling = round(cl["wall_sec"] / ch["wall_sec"] / 4, 2)
        w(
            f"| **sha2 ceiling (r6 window)** | — | — | — | — | "
            f"**{ceiling}** |"
        )
    w(
        "\n**Reading**: the lever sped BOTH arms in absolute terms —\n"
        "1×2 walks 37.3 → 29.4 s (−21%), 4×2 21.5 → 18.6 s (−13%),\n"
        "write-sink 69.9 → 54.9 / 35.6 → 32.6 — and the 2-core arm\n"
        "gained more (one |E| exchange per depth removed matters most\n"
        "where bandwidth is scarcest). Because the 8-core arm stays\n"
        "pinned against the shared-bus cap, the 2c/8c RATIO moves little\n"
        "(count 0.43 → ~0.40 vs a 0.58 same-window ceiling): the\n"
        "instrument-ceiling story of rounds 4-5, reproduced a third\n"
        "time — one-box efficiency falls as absolute walls improve. On a\n"
        "real 4N cluster the removed exchange is removed NETWORK bytes,\n"
        "which the one-box proxy cannot credit.\n"
    )
    w(
        "### Round-6 headline-bench notes (sf0.1, local[32], "
        "BENCH/bench_r6_local_*.json)\n\n"
        "- **Headline 96.5 → 53.3 s** (best of five sequenced runs:\n"
        "  74.7 / 58.0 / 63.2 / 64.5 / 53.3).\n"
        "- **q6 minhash 9.99 → 1.87 s — the r5 'unexplained residual'\n"
        "  is named and fixed**: job-level decomposition\n"
        "  (tools/q6_decompose.py) showed AQE coalescing the small\n"
        "  representative-agg exchange to ONE partition, serializing\n"
        "  the per-text shingle explode + md5 on a single core (a 4-7 s\n"
        "  numTasks=1 stage). An explicit-N repartition before the\n"
        "  explode restores 32-way parallelism; the id-keyed pipeline\n"
        "  is now FASTER than the r4 text-keyed one locally too\n"
        "  (2.4 vs 3.7 s interleaved), on top of its at-scale\n"
        "  shuffle-byte win.\n"
        "- **q2 BFS 8.18 → 3.34 s** (warm edge cache + co-partitioned\n"
        "  edge table), **q8 encoded write 10.29 → 9.29 s**.\n"
        "- **q5 pagerank 34.9 → 23.5 s min-of-4** (both runs carried\n"
        "  ambient load per the new per-rep tags: load1 9-20 during\n"
        "  run 1). The lazy-checkpoint chain now also RELEASES its\n"
        "  superseded per-round blocks (session.release_local_checkpoint\n"
        "  — plain unpersist is a CacheManager no-op for checkpoint\n"
        "  RDDs), adding one cheap internal materialization.\n"
        "- Every bench line is min-of-2 inside a run (q1 included, new\n"
        "  this round) and every rep carries (canary, load1_pre,\n"
        "  load1_post) ambient tags — bursts are now attributable\n"
        "  per-rep instead of per-run. Third and fourth sequenced runs\n"
        "  (bench_r6_local_{3,4}.json) put q2 at 2.64 s, q8 at 8.12 s and\n  q4a at 1.07 s; run 5 (53.3 s total) lands q8 at 6.30 s once the\n  encoded walker's integer edge table caches per KG (r6 late fix:\n  seed-independent predicate id blocks), q3 at 11.58 s;\n"
        "  q3 swings 12-46 s across same-code reps (its historical\n"
        "  variance band) — a 6-rep interleaved A/B of the sampled\n"
        "  walker's pre-partitioned edge table reads NEUTRAL locally\n"
        "  (mins 12.8 vs 13.7 s), kept for the at-scale exchange\n"
        "  elimination; q5 is a stable ~23.5 s across all three runs\n"
        "  with the release overhead measured at parity (38.99 vs\n"
        "  37.15 s warm interleaved). Stage decomposition of q5 shows\n"
        "  ~13 s of the wall is inter-job DRIVER planning (AQE +\n"
        "  optimizer per round, 20 rounds x ~9 tiny stage jobs) — the\n"
        "  static dangling set is now hoisted out of the loop, and\n"
        "  checkpointing every K>1 rounds to amortize planning was\n"
        "  measured and REJECTED (two references to the previous ranks\n"
        "  double plan nodes per un-checkpointed round: K=2 43-102 s,\n"
        "  K=4 165-173 s vs K=1 29-31 s). At 100-TB scale executor\n"
        "  time dwarfs this fixed per-round driver cost.\n"
    )
    return "\n".join(w_out)


def main():
    r3_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH", "scalruns.jsonl"
    )
    r4_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "BENCH", "scalruns_r4.jsonl"
    )
    r5_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        REPO, "BENCH", "scalruns_r5.jsonl"
    )
    r3 = load(r3_path)
    r4 = load(r4_path)
    r5 = load(r5_path) if os.path.exists(r5_path) else []

    HN = 4_800_000

    out = []
    w = out.append
    w("# BENCH / BASELINE — scaling evidence (rounds 3-6)\n")
    w(
        "North-rule criterion: throughput scaling efficiency ≥ 0.8 from N\n"
        "to 4N executors. No multi-node cluster exists in this sandbox, so\n"
        "per the driver instruction the evidence is the SAME job on the\n"
        "SAME input at two taskset-pinned local parallelism levels:\n"
        "`local[2]` (N) vs `local[8]` (4N). Minimum wall per config over\n"
        "reps sampled across the session (the box is a shared VM; ambient\n"
        "load inflates walls 1.3-2×; the extract stage doubles as a noise\n"
        "canary — quiet ≈ 21 s at 8 cores / ≈ 80 s at 2). Regenerate with\n"
        "`python tools/scaling_evidence.py`.\n"
    )
    w(
        "Job: tools/scaling_job.py — synth transcript turns → vectorized\n"
        "Arrow extraction → triples → KG build → fused BFS depth-2 +\n"
        "dictionary-encoded canonicalization (dense int ids). Round-4 runs\n"
        "use the count sink (BFS joins + encoding only) — round 3 proved\n"
        "the count/hash/write ladder FLAT, so the sink choice does not\n"
        "change the efficiency story (table below).\n"
    )

    # ---- round-4 headline: current walk-prep path, 4.8M turns, count sink
    lo = best(r4, 2, HN, tags=NEW)
    hi = best(r4, 8, HN, tags=NEW)
    # extraction is identical code in every round-4 run — pool all tags
    lo_x = best(r4, 2, HN, tags=None, key="extract_sec")
    hi_x = best(r4, 8, HN, tags=None, key="extract_sec")
    if lo and hi:
        w("## Round-4 headline (count sink, 4.8M turns, current HEAD)\n")
        w("| config | extract (s) | walks (s) | total (s) | turns/s | walks/s |")
        w("|---|---|---|---|---|---|")
        for label, r in (("local[2] (N)", lo), ("local[8] (4N)", hi)):
            w(
                f"| {label} | {r['extract_sec']} | {r['walks_sec']} "
                f"| {r['wall_sec']} | {r['turns_per_sec']:,.0f} "
                f"| {r['walks_per_sec']:,.0f} |"
            )
        w("")
        w(
            f"**Efficiency (min-wall): total {eff(lo, hi, 'wall_sec')} — "
            f"extraction {round(lo_x['extract_sec'] / hi_x['extract_sec'] / 4, 2)} "
            f"(pooled best: {hi_x['extract_sec']} s / {lo_x['extract_sec']} s), "
            f"walk stage {eff(lo, hi, 'walks_sec')}.** Rep walls: "
            f"local[2] = {lo['all_wall']}, local[8] = {hi['all_wall']}.\n"
        )

    # ---- A/B: round-3 walk-prep path vs indexed-name path, same window
    w("## Walk-prep A/B — round-3 path vs per-KG indexed-name table\n")
    w(
        "Same binary week, same box, same input (4.8M turns, count sink);\n"
        "`base*` tags re-ran the round-3 prep (per-run union+distinct over\n"
        "2|V| tokens + separate dense-id pass), `r4*` the round-4 prep\n"
        "(ONE indexed name table per KG, ids reused across walker runs).\n"
    )
    w("| path | cores | best walks (s) | walks/s | reps |")
    w("|---|---|---|---|---|")
    for label, tags in (("round-3 prep", OLD3), ("indexed names", NEW)):
        for cpus in (2, 8):
            b = best(r4, cpus, HN, tags=tags)
            if b:
                w(
                    f"| {label} | {cpus} | {b['walks_sec']} "
                    f"| {b['walks_per_sec']:,.0f} | {b['n_reps']} |"
                )
    w("")
    b2o, b2n = best(r4, 2, HN, tags=OLD3), best(r4, 2, HN, tags=NEW)
    b8o, b8n = best(r4, 8, HN, tags=OLD3), best(r4, 8, HN, tags=NEW)
    if all((b2o, b2n, b8o, b8n)):
        g2 = b2n["walks_per_sec"] / b2o["walks_per_sec"] - 1
        g8 = b8n["walks_per_sec"] / b8o["walks_per_sec"] - 1
        w(
            f"The fixed-prep cut lands asymmetrically: 2-core throughput\n"
            f"+{g2:.0%}, 8-core +{g8:.0%}. That asymmetry is the bus cap\n"
            f"(analysis below), and it DROPS the one-box 2c→8c ratio even\n"
            f"though both configs got faster — the expected signature of\n"
            f"an instrument at its ceiling, not a plan regression.\n"
        )

    # ---- size pair: 2.4M vs 4.8M on the new path
    w("## Input-size effect on the new path (count sink)\n")
    w("| turns | walks lo/hi (s) | walks/s lo/hi | eff walks | eff total |")
    w("|---|---|---|---|---|")
    new_sizes = sorted(
        {
            r["n_turns"]
            for r in r4
            if any(r.get("tag", "").startswith(t) for t in NEW)
        }
    )
    for n in new_sizes:
        lo_n = best(r4, 2, n, tags=NEW)
        hi_n = best(r4, 8, n, tags=NEW)
        if lo_n and hi_n:
            w(
                f"| {n:,} | {lo_n['walks_sec']} / {hi_n['walks_sec']} "
                f"| {lo_n['walks_per_sec'] / 1e6:.2f}M / "
                f"{hi_n['walks_per_sec'] / 1e6:.2f}M "
                f"| {eff(lo_n, hi_n, 'walks_sec')} "
                f"| {eff(lo_n, hi_n, 'wall_sec')} |"
            )
    w("")

    # ---- round-3 historical ladder + sweep (old path)
    w("## Round-3 decomposition ladder (historical, old prep path)\n")
    w(
        "Why the round-4 runs use the count sink: round 3 measured the\n"
        "count/hash/write ladder FLAT — the missing efficiency is not the\n"
        "write path. Kept here as the justification:\n"
    )
    w("| sink | walks lo/hi (s) | eff extract | eff walks | eff total |")
    w("|---|---|---|---|---|")
    for sink in ("count", "hash", "write"):
        lo3 = best(r3, 2, HN, sink=sink)
        hi3 = best(r3, 8, HN, sink=sink)
        if lo3 and hi3:
            w(
                f"| {sink} | {lo3['walks_sec']} / {hi3['walks_sec']} "
                f"| {eff(lo3, hi3, 'extract_sec')} "
                f"| {eff(lo3, hi3, 'walks_sec')} "
                f"| {eff(lo3, hi3, 'wall_sec')} |"
            )
    w("")
    w("Round-3 input-size sweep (old path, count sink):\n")
    w("| turns | walks/s lo/hi | eff walks |")
    w("|---|---|---|")
    for n in sorted({r["n_turns"] for r in r3}):
        lo3 = best(r3, 2, n, sink="count")
        hi3 = best(r3, 8, n, sink="count")
        if lo3 and hi3:
            w(
                f"| {n:,} | {lo3['walks_per_sec'] / 1e6:.2f}M / "
                f"{hi3['walks_per_sec'] / 1e6:.2f}M "
                f"| {eff(lo3, hi3, 'walks_sec')} |"
            )
    w("")

    if r5:
        w(_r5_section(r5))

    r6_path = os.path.join(REPO, "BENCH", "scalruns_r6.jsonl")
    r6 = load(r6_path) if os.path.exists(r6_path) else []
    if r6:
        w(_r6_section(r5, r6))

    w(
        "## Analysis\n\n"
        "- **Same-box calibration ceiling: "
        f"{CEILING}.** A trivially parallel sha2-over-80M-rows job (zero\n"
        "  shuffle, zero write) measures 0.87 warm at the same pinned\n"
        "  2→8 cores — no job of any shape exhibits >0.87 here. Read the\n"
        "  efficiency numbers against that ceiling, not against 1.0.\n"
        "- **Extraction** (the north-rule turns/sec metric) is partition-\n"
        "  local Arrow work with zero shuffle: ~0.9 in the round-4 window\n"
        "  (and 0.89-0.97 across round 3) — at the ceiling, i.e. parity.\n"
        "  This is the stage whose behavior transfers directly to a\n"
        "  multi-executor cluster.\n"
        "- **Walk stage: the round-4 prep cut worked, and the one-box\n"
        "  ratio fell anyway — both are real.** Round 3 isolated ~6 s of\n"
        "  size-independent prep cost (vocab shuffles) plus an 8-core\n"
        "  walks/s cap of ~3.4-3.9M at every input size (shared memory\n"
        "  bus). Round 4 removed the per-run vocab union+distinct (ONE\n"
        "  indexed name table per KG). In the CONTROLLED same-window A/B\n"
        "  (old and new prep interleaved in one batch): 2-core throughput\n"
        "  +33% (0.95M → 1.25M walks/s) — the fixed cost was a much\n"
        "  larger fraction of the 2-core wall — while the 8-core side\n"
        "  moved +12% (2.68M → 2.99M), pinned against the bus cap.\n"
        "  (Cross-round absolute comparisons are load-confounded: round\n"
        "  3's quietest windows reached 1.24M/3.31M on the OLD path —\n"
        "  every round-4 rep ran under a 1.3-1.6× canary; only the\n"
        "  interleaved A/B is controlled.) The 2c→8c ratio DROPS\n"
        "  (0.67 → ~0.6) as the code gets faster: the numerator is\n"
        "  resource-capped, the denominator isn't. The new-path size\n"
        "  sweep (2.4M → 19.2M turns) confirms both halves: 8-core\n"
        "  walks/s climbs 2.13M → 2.99M → 3.65M, converging on the\n"
        "  round-3 bus cap (3.4-3.9M) as fixed costs amortize, while\n"
        "  the efficiency curve FLATTENS (~0.6 at every size — the old\n"
        "  path's non-monotone 0.67/0.72/0.55 was the fixed cost and\n"
        "  the cap trading places as the binding constraint). On a real\n"
        "  4N-executor cluster the resource the proxy\n"
        "  holds fixed (memory bandwidth, disks) multiplies with the\n"
        "  cores; the plan itself — partition-local extraction,\n"
        "  key-partitioned BFS joins, banded dedup, zero driver loops —\n"
        "  has no stage that serializes on N.\n"
        "- **The ladder refutes the write-path hypothesis** (round 3,\n"
        "  kept above): count/hash/write efficiencies within 0.03.\n"
        "- **Measurement hygiene**: every run is taskset-pinned; the\n"
        "  extract stage is the noise canary (quiet ≈ 21 s at 8c / 80 s\n"
        "  at 2c; ambient load on this shared VM inflates 1.3-2×);\n"
        "  minimum wall over reps sampled across the session; stuck\n"
        "  py4j gateways (~1/30 runs) killed and rerun.\n\n"
        "## Design choices that hold at 1000 executors / 100 TB\n\n"
        "- one deduplicated edge table, persisted; inverse adjacency =\n"
        "  join on dst (no second copy)\n"
        "- BFS = repeated adjacency joins; broadcast below a size\n"
        "  threshold, sort-merge + AQE skew-join above; lineage\n"
        "  checkpoint every 4 depths\n"
        "- canonicalization cost is O(|V|), not O(corpus); the corpus is\n"
        "  dictionary-encoded (dense int ids + one per-KG vocab table,\n"
        "  recompute-deterministic id assignment)\n"
        "- extraction/generation are partition-local (zero shuffle)\n"
        "  Arrow batches; turns/sec scales with executors\n"
        "- MinHash-LSH band-bucket joins with bucket caps; CC via\n"
        "  alternating large/small-star with STATS-FREE checkpoints\n"
        "  (hard_local_checkpoint — multi-reference loop states compound\n"
        "  carried sizeInBytes estimates geometrically otherwise; the\n"
        "  round-4 driver-wedge fix, see SURVEY §4)\n"
        "- PageRank: dangling mass in-plan, zero per-iteration collects\n"
        "- Word2Vec: driver vocab bound enforced up front\n"
        "  (min_count / max_vocab_size pruning + loud failure)\n"
    )

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    dest = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(dest, "w") as f:
        f.write("\n".join(out))
    print("wrote", dest)


if __name__ == "__main__":
    main()
