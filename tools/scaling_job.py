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
    t_start = time.perf_counter()
    tr = synth_transcripts(spark, n_convs, turns, seed=42, vocab=scaled_vocab(n_convs))
    triples = triples_only(extract_triples(tr))
    kg = SparkKG(triples, persist=True)
    kg.edges.count()  # materialize extraction + graph build
    t_extract = time.perf_counter()
    seeds = kg.entity_names()
    # write the corpus (snappy parquet) rather than count(): count lets
    # Catalyst prune the walk arrays entirely — the write measures real
    # token materialization + encode, which is what a pipeline pays
    out_dir = os.environ.get("SCALE_OUT", "/dev/shm/scale_walks")
    if encoded:
        walks, vocab = bfs_encoded_walks(kg, seeds, 2, md5_bytes=8)
        vocab.write.mode("overwrite").parquet(out_dir + "_vocab")
    else:
        walks = bfs_canonical_walks(kg, seeds, 2, md5_bytes=8)
    walks.write.mode("overwrite").parquet(out_dir)
    n_walks = spark.read.parquet(out_dir).count()
    t_end = time.perf_counter()
    wall = t_end - t_start
    print(
        json.dumps(
            {
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
                "encoded": encoded,
                "n_turns": n_convs * turns,
                "n_walks": n_walks,
                "extract_sec": round(t_extract - t_start, 2),
                "walks_sec": round(t_end - t_extract, 2),
                "wall_sec": round(wall, 2),
                "turns_per_sec": round(n_convs * turns / wall, 1),
                "walks_per_sec": round(n_walks / (t_end - t_extract), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
