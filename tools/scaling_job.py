"""The fixed scaling workload: transcripts → extraction → triples →
KG → BFS depth-2 walk corpus. Identical input at any parallelism; the
driver's two-cluster-size criterion is evidenced by running this at
local[8] and local[32] (see tools/bench_scaling.py).

Prints one JSON line with wall seconds and turns/sec.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyrdf2vec_spark.extract import extract_triples, triples_only
from pyrdf2vec_spark.graph import SparkKG
from pyrdf2vec_spark.session import get_spark
from pyrdf2vec_spark.sources.transcripts import scaled_vocab, synth_transcripts
from pyrdf2vec_spark.walks import bfs_canonical_walks, bfs_encoded_walks


def main():
    n_convs = int(os.environ.get("SCALE_CONVS", "60000"))
    # default: dictionary-encoded corpus (array<bigint> walks + vocab
    # table) — the at-scale layout; SCALE_ENCODED=0 writes the md5-repr
    # string arrays for comparison (≈5× the bytes)
    encoded = os.environ.get("SCALE_ENCODED", "1") != "0"
    turns = 10
    # corpus parquet codec: zstd trades write bandwidth (the one-box
    # bottleneck; a cluster scales it with executors) for CPU (which
    # scales with cores) — see BENCH/BASELINE.md codec comparison
    codec = os.environ.get("SCALE_CODEC", "zstd")
    conf = {"spark.sql.parquet.compression.codec": codec}
    # shuffle partitions must scale with DATA, not cores: AQE can only
    # coalesce, never split, so too-few initial partitions make each
    # SMJ task sort ~1 GB and spill (measured superlinear walk-stage
    # blowup at 2x input with one partition per core). ~15k convs per
    # partition ≈ the 100-200 MB/task a cluster targets.
    parts = int(os.environ.get("SCALE_PARTS", str(max(32, n_convs // 15000))))
    conf["spark.sql.shuffle.partitions"] = str(parts)
    # ad-hoc conf experiments: SCALE_EXTRA_CONF="k=v;k2=v2"
    for kv in os.environ.get("SCALE_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            conf[k.strip()] = v.strip()
    spark = get_spark("scaling-job", extra_conf=conf)
    # warmup: a miniature end-to-end run (same operators, same codegen
    # paths) so JIT/whole-stage-codegen compilation — a fixed per-JVM
    # cost that a long-lived cluster pays once — is excluded from the
    # measured window; standard warm-run benchmarking practice
    if os.environ.get("SCALE_WARMUP", "1") != "0":
        wtr = synth_transcripts(spark, 2000, turns, seed=7)
        wkg = SparkKG(triples_only(extract_triples(wtr)), persist=True)
        wkg.edges.count()
        wwalks, _ = bfs_encoded_walks(wkg, wkg.entity_names(), 2, md5_bytes=8)
        wwalks.write.mode("overwrite").parquet("/dev/shm/scale_warmup")
        wkg.edges.unpersist()
    # sink selects WHAT the walk stage pays for: "write" (default) is
    # the full pipeline cost — token materialization + parquet encode +
    # one-box write bandwidth; "hash" is the compute-only decomposition
    # (sum(xxhash64(walk)) + count — xxhash64 over the array column
    # forces every token to materialize, Catalyst cannot prune it, but
    # nothing hits storage). The pair separates "the PLAN doesn't
    # scale" from "this box's single write path doesn't scale".
    sink = os.environ.get("SCALE_SINK", "write")
    t_start = time.perf_counter()
    tr = synth_transcripts(spark, n_convs, turns, seed=42, vocab=scaled_vocab(n_convs))
    triples = triples_only(extract_triples(tr))
    kg = SparkKG(triples, persist=True)
    kg.edges.count()  # materialize extraction + graph build
    t_extract = time.perf_counter()
    seeds = kg.entity_names()
    out_dir = os.environ.get("SCALE_OUT", "/dev/shm/scale_walks")
    phases = {}
    if encoded:
        if os.environ.get("SCALE_PHASES", "0") == "1":
            # diagnostic decomposition: force the id-prep sub-DAG
            # eagerly to see where 2c-vs-8c time goes (adds actions, so
            # don't compare these walls with normal runs). The indexed
            # name table is now the ONLY vocab-sized prep artifact
            # (round-4 restructure: no union+distinct, no vocab re-join)
            from pyrdf2vec_spark.walks import indexed_name_table

            t0 = time.perf_counter()
            _idx, _n_v = indexed_name_table(kg, 8)
            _idx.count()
            phases["indexed_names"] = round(time.perf_counter() - t0, 2)
        walks, vocab = bfs_encoded_walks(kg, seeds, 2, md5_bytes=8)
    else:
        walks = bfs_canonical_walks(kg, seeds, 2, md5_bytes=8)
    if sink == "hash":
        from pyspark.sql import functions as F

        walk_col = walks.columns[-1]
        row = walks.agg(
            F.count("*").alias("n"),
            # bit_xor, not sum: overflow-free under ANSI mode
            F.expr(f"bit_xor(xxhash64({walk_col}))").alias("h"),
        ).collect()[0]
        n_walks = row["n"]
    elif sink == "count":
        # joins/shuffles only: count() lets Catalyst prune the walk
        # arrays, so this isolates the BFS frontier joins from token
        # materialization — the bottom rung of the decomposition ladder
        n_walks = walks.count()
    else:
        if encoded:
            vocab.write.mode("overwrite").parquet(out_dir + "_vocab")
        walks.write.mode("overwrite").parquet(out_dir)
        n_walks = spark.read.parquet(out_dir).count()
    t_end = time.perf_counter()
    wall = t_end - t_start
    print(
        json.dumps(
            {
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
                "sink": sink,
                "encoded": encoded,
                "n_turns": n_convs * turns,
                "n_walks": n_walks,
                "extract_sec": round(t_extract - t_start, 2),
                "walks_sec": round(t_end - t_extract, 2),
                "wall_sec": round(wall, 2),
                "turns_per_sec": round(n_convs * turns / wall, 1),
                "walks_per_sec": round(n_walks / (t_end - t_extract), 1),
                **({"phases": phases} if phases else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
