"""q3 (DFS sampled walks) and q5 (pagerank) job-level decomposition.

Same instrument as tools/q6_decompose.py: each Spark action is one job,
job walls are read from the live UI REST API under a job-group tag, so
the per-boundary walls are measured by the scheduler itself, not by
hand. The r6 verdict's top item: q3 reads 11-21 s with a 12-46 s
same-code variance band and has never had this treatment; q5's ~13 s
of fixed per-round planning was measured by stage decomposition but
the AQE-off lever was never A/B'd.

Usage: python tools/q35_decompose.py [sf_dir] [reps] [which]
  which: comma list of q3,q5 (default both)
Prints one JSON line per (variant, rep) and a min-per-boundary summary.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyrdf2vec_spark.session import get_spark


def _jobs_for_group(app_port, group):
    url = f"http://localhost:{app_port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(url, timeout=10))
    app_id = apps[0]["id"]
    jobs = json.load(
        urllib.request.urlopen(f"{url}/{app_id}/jobs?limit=10000", timeout=10)
    )
    from datetime import datetime

    def _ts(s):
        return datetime.strptime(s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")

    out = []
    for j in jobs:
        if j.get("jobGroup") != group:
            continue
        try:
            sec = round(
                (_ts(j["completionTime"]) - _ts(j["submissionTime"]))
                .total_seconds(),
                3,
            )
        except (KeyError, ValueError):
            sec = None
        out.append(
            {
                "job": j["jobId"],
                "name": j["name"].split("\n")[0][:80],
                "sec": sec,
                "stages": len(j.get("stageIds", [])),
                "tasks": j.get("numTasks"),
            }
        )
    return sorted(out, key=lambda d: d["job"])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    which = set(
        (sys.argv[3] if len(sys.argv) > 3 else "q3,q5").split(",")
    )
    spark = get_spark("q35-decompose", extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    port = sc.uiWebUrl.rsplit(":", 1)[-1]

    from pyrdf2vec_spark.graph import SparkKG
    from pyrdf2vec_spark.samplers import pagerank
    from pyrdf2vec_spark.sources.tpch_graph import load_tables, tpch_triples
    from pyrdf2vec_spark.walks import sampled_walks

    kg = SparkKG(tpch_triples(load_tables(spark, sf_dir)))
    kg.edges.count()

    variants = []
    if "q3" in which:
        def q3():
            seeds = kg.entity_names().where(
                F.col("name").startswith("o:")
            ).limit(20000)
            return sampled_walks(
                kg, seeds, 3, 4, sampler="objfreq", seed=42
            ).count()

        variants.append(("q3_dfs_sampled", q3))
    if "q5" in which:
        variants.append(
            ("q5_pagerank",
             lambda: pagerank(kg, max_iter=20, tol=0.0).count())
        )

    results = []
    for rep in range(reps):
        for variant, fn in variants:
            group = f"{variant}-{rep}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            n = fn()
            wall = round(time.perf_counter() - t0, 3)
            sc.setJobGroup("idle", "idle")
            jobs = _jobs_for_group(port, group)
            njobs = len(jobs)
            covered = round(
                sum(j["sec"] or 0 for j in jobs), 3
            )
            rec = {
                "variant": variant, "rep": rep, "total": wall, "n": n,
                "n_jobs": njobs, "sum_job_sec": covered,
                "gap_sec": round(wall - covered, 3),
                "jobs": jobs,
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
    summary = {}
    for variant, _ in variants:
        rows = [r for r in results if r["variant"] == variant]
        summary[variant] = {
            "total_min": min(r["total"] for r in rows),
            "n_jobs": [r["n_jobs"] for r in rows],
            "sum_job_sec_min": min(r["sum_job_sec"] for r in rows),
            "gap_sec_min": min(r["gap_sec"] for r in rows),
        }
    print(json.dumps({"summary": summary}, indent=1))


if __name__ == "__main__":
    main()
