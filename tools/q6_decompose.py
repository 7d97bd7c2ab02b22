"""q6 (MinHash doc-dedup) materialization-boundary decomposition.

Three wall-clock A/B instruments failed to localize why the id-keyed
r5 pipeline reads ~2-3 s slower END-TO-END at sf0.1 than the r4
text-keyed one even though every stage times faster in isolation. This
instrument diffs the two variants at the JOB level instead: each Spark
action is one job, so the per-job walls ARE the materialization
boundaries (hashes persist -> pairs.count -> eager localCheckpoint ->
caller count). Jobs are read from the live UI REST API with job-group
tags, so nothing is re-timed by hand.

Usage: python tools/q6_decompose.py [sf_dir] [reps]
Prints one JSON line per (variant, rep): {"variant", "rep", "total",
"jobs": [{"name", "sec"}...]} and a min-per-boundary summary.
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


def _old_text_keyed_pairs(documents, shingle_words=3):
    """The r4 pipeline, verbatim (git fb35884~1): text-keyed LSH, pair
    ids mapped back at the end."""
    from pyrdf2vec_spark.canon import lsh_pairs

    word_hashes = (
        documents.select(F.col("text").alias("name"))
        .distinct()
        .select(
            "name",
            F.explode(
                F.expr(
                    f"array_distinct(transform(sequence(1, greatest(1, "
                    f"size(split(trim(lower(name)), ' +')) - {shingle_words - 1})), "
                    f"i -> array_join(slice(split(trim(lower(name)), ' +'), i, {shingle_words}), ' ')))"
                )
            ).alias("s"),
        )
        .select(
            "name",
            F.conv(F.substring(F.md5("s"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("h"),
        )
        .distinct()
    )
    pairs = lsh_pairs(word_hashes, num_hashes=12, band_size=2,
                      jaccard_threshold=0.5)
    ids = documents.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    return (
        pairs.join(ids.withColumnRenamed("text", "a"), "a")
        .withColumnRenamed("doc_id", "doc_a")
        .join(ids.withColumnRenamed("text", "b"), "b")
        .withColumnRenamed("doc_id", "doc_b")
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def _jobs_for_group(app_port, group):
    url = f"http://localhost:{app_port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(url, timeout=10))
    app_id = apps[0]["id"]
    jobs = json.load(
        urllib.request.urlopen(f"{url}/{app_id}/jobs", timeout=10)
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
                # call-site name IS the materialization boundary
                # (count at lsh_pairs / localCheckpoint at ... / count
                # at caller)
                "name": j["name"].split("\n")[0][:90],
                "sec": sec,
                "stages": len(j.get("stageIds", [])),
            }
        )
    return sorted(out, key=lambda d: d["job"])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(
        "q6-decompose",
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext
    port = sc.uiWebUrl.rsplit(":", 1)[-1]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyrdf2vec_spark.functions.dedup import minhash_dedup_pairs

    # warmup both codegen paths once
    small = docs.limit(200)
    minhash_dedup_pairs(small, jaccard_threshold=0.5).count()
    _old_text_keyed_pairs(small).count()

    results = []
    for rep in range(reps):
        for variant, fn in (
            ("new_id_keyed", lambda: minhash_dedup_pairs(
                docs, jaccard_threshold=0.5).count()),
            ("old_text_keyed", lambda: _old_text_keyed_pairs(docs).count()),
        ):
            group = f"{variant}-{rep}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            n = fn()
            wall = round(time.perf_counter() - t0, 3)
            sc.setJobGroup("idle", "idle")
            jobs = _jobs_for_group(port, group)
            rec = {"variant": variant, "rep": rep, "total": wall,
                   "n_pairs": n, "jobs": jobs}
            results.append(rec)
            print(json.dumps(rec), flush=True)
    # min-per-boundary summary: job k of variant v across reps
    summary = {}
    for variant in ("new_id_keyed", "old_text_keyed"):
        rows = [r for r in results if r["variant"] == variant]
        k = min(len(r["jobs"]) for r in rows)
        summary[variant] = {
            "total_min": min(r["total"] for r in rows),
            "per_job_min": [
                {
                    "name": rows[0]["jobs"][i]["name"],
                    "sec_min": min(
                        (r["jobs"][i]["sec"] for r in rows
                         if r["jobs"][i]["sec"] is not None),
                        default=None,
                    ),
                }
                for i in range(k)
            ],
        }
    print(json.dumps({"summary": summary}, indent=1))


if __name__ == "__main__":
    main()
