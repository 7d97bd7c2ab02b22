"""Benchmark harness. Runs the engine's headline operators at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Also reports turns/sec for the transcript pipeline (the BASELINE.md
walk-corpus throughput metric). Scaling evidence (local[8] vs local[32])
is produced by tools/bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from pyrdf2vec_spark.embed import SparkWord2Vec
from pyrdf2vec_spark.extract import extract_triples, triples_only
from pyrdf2vec_spark.graph import SparkKG
from pyrdf2vec_spark.samplers import pagerank
from pyrdf2vec_spark.session import get_spark
from pyrdf2vec_spark.sources.tpch_graph import load_tables, tpch_triples
from pyrdf2vec_spark.sources.transcripts import synth_transcripts
from pyrdf2vec_spark.walks import bfs_canonical_walks, sampled_walks

SF_CONVS = {"0.001": 200, "0.01": 2000, "0.1": 20000}
TURNS = 10


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    n_convs = SF_CONVS.get(sf, 2000)
    spark = get_spark("bench")

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # JIT/codegen warmup — a long-lived cluster pays compilation once;
    # excluding it from the measured window is standard warm-run practice
    # (see BENCH/BASELINE.md calibration: 0.41 cold vs 0.87 warm)
    wtr = synth_transcripts(spark, 500, TURNS, seed=7)
    wkg = SparkKG(triples_only(extract_triples(wtr)))
    from pyrdf2vec_spark.walks import bfs_canonical_walks as _bcw

    _bcw(wkg, wkg.entity_names(), 2, md5_bytes=8).count()

    def _canary_once():
        # one warm run of the fixed tiny scan+agg: its code never
        # changes, so its wall is a direct ambient-contention probe
        t0 = time.perf_counter()
        spark.read.parquet(f"{sf_dir}/documents.parquet").agg(
            F.sum(F.length("text"))
        ).collect()
        return round(time.perf_counter() - t0, 3)

    def timed(name, fn, reps=1):
        # reps=2 for side-effect-free queries: the box is a shared VM
        # whose ambient load inflates any single run 1.3-5×; min-of-2
        # is the standard least-noise estimator (BENCH/BASELINE.md
        # methodology) and keeps one bad window from dominating a query
        best, out, walls, env = None, None, [], []
        for _ in range(reps):
            # per-rep ambient tag: the pre/mid/post canary instants
            # provably miss multi-minute bursts (r5: q5 swung 17–82 s
            # same-code while instants read quiet). An ADJACENT canary
            # + loadavg before each rep, and loadavg right after it,
            # make every rep's wall attributable. load1_post during a
            # saturating local[32] rep includes our own threads — read
            # it relative to the canary, not as an absolute.
            load1 = round(os.getloadavg()[0], 2)
            canary = _canary_once()
            t0 = time.perf_counter()
            out = fn()
            wall = time.perf_counter() - t0
            walls.append(round(wall, 3))
            env.append(
                {
                    "canary": canary,
                    "load1_pre": load1,
                    "load1_post": round(os.getloadavg()[0], 2),
                }
            )
            best = wall if best is None else min(best, wall)
        timings[name] = round(best, 3)
        # every rep wall is recorded so round-over-round drift on a
        # min-of-2 number can be distinguished from one bad window
        extras.setdefault("rep_walls", {})[name] = walls
        extras.setdefault("rep_env", {})[name] = env
        return out

    # ambient-load canary: a FIXED tiny scan+agg measured at three
    # points in the run. Its wall depends only on the shared VM's
    # ambient load (code never changes), so a q6/q7-style drift that
    # tracks the canary ratio is noise, not regression — the round-4
    # q6 +28%/q7 +27% question this exists to settle.
    def _canary():
        # run twice, report the second: the first "pre" call otherwise
        # measures the cold parquet-scan/codegen path, not ambient load
        # (observed pre≈1.4 s vs mid/post≈0.2 s on a quiet box)
        _canary_once()
        return _canary_once()

    canary = {"pre": _canary()}

    # q1: transcript pipeline — synth → extract → distinct triples
    # (throughput metric: turns/sec end-to-end)
    def q1():
        tr = synth_transcripts(spark, n_convs, TURNS, seed=42)
        return triples_only(extract_triples(tr)).count()

    # reps=2: q1 feeds turns/sec — the BASELINE.md headline metric —
    # and was the one single-rep line left (r5's turns/sec "dropped"
    # 125,945 → 89,166 purely because one unprotected rep ate a burst)
    n_triples = timed("q1_transcript_extract", q1, reps=2)
    extras["turns_per_sec"] = round(
        n_convs * TURNS / timings["q1_transcript_extract"], 1
    )
    extras["n_triples"] = n_triples

    # shared KG for the graph queries
    kg = SparkKG(tpch_triples(load_tables(spark, sf_dir)))
    kg.edges.count()  # materialize the cache outside the timings

    # q2: fused BFS depth-2 + md5 canonicalization from customers; the
    # corpus persists so q4 measures the Word2Vec fit alone
    corpus_holder = {}

    def q2():
        # drop the previous rep's persisted corpus so min-of-2 measures
        # the same work twice (the per-KG token cache stays warm, as a
        # long-lived cluster's would)
        if "walks" in corpus_holder:
            corpus_holder["walks"].unpersist()
        seeds = kg.entity_names().where(F.col("name").startswith("c:"))
        walks = bfs_canonical_walks(
            kg, seeds, 2, md5_bytes=8, keep_root=True
        ).persist()
        corpus_holder["walks"] = walks
        return walks.count()

    n_walks = timed("q2_bfs_walks_depth2", q2, reps=2)
    extras["n_walks"] = n_walks

    # q3: weighted DFS sampling (objfreq), 4 walks × depth 3 per order
    def q3():
        seeds = kg.entity_names().where(F.col("name").startswith("o:")).limit(
            20000
        )
        return sampled_walks(
            kg, seeds, 3, 4, sampler="objfreq", seed=42
        ).count()

    timed("q3_dfs_sampled_walks", q3, reps=2)

    # q4a: the driver vocab-memory guard as its OWN line (one map-side
    # HLL pass over the corpus) — round 3 hid this inside the fit
    # timing and q4 looked like it regressed 3.15→8.90 s
    guard_holder = {}

    def q4a():
        n = (
            corpus_holder["walks"]
            .select(F.explode("walk").alias("_tok"))
            .agg(F.approx_count_distinct("_tok", 0.02).alias("n"))
            .first()["n"]
        )
        guard_holder["vocab_n"] = int(n * 1.06)
        return guard_holder["vocab_n"]

    timed("q4a_vocab_guard", q4a, reps=2)

    # q4: Word2Vec fit ONLY, over the persisted q2 corpus (the corpus
    # build is q2's number; the guard is q4a's — the vocab bound is
    # passed as a hint so the guard re-check is scan-free); training
    # parallelized across partitions
    def q4():
        w2v = SparkWord2Vec(
            vector_size=32, seed=42, num_partitions=8,
            vocab_size_hint=guard_holder["vocab_n"],
        ).fit(corpus_holder["walks"])
        return w2v.vectors().count()

    timed("q4_word2vec_fit", q4, reps=2)
    corpus_holder["walks"].unpersist()

    # q5: PageRank over the entity graph — fixed 20 iterations (tol=0):
    # zero driver collects per iteration (dangling mass stays in-plan)
    timed("q5_pagerank",
          lambda: pagerank(kg, max_iter=20, tol=0.0).count(), reps=2)

    canary["mid"] = _canary()

    # q6: MinHash-LSH dedup pairs over documents
    def q6():
        from pyrdf2vec_spark.functions.dedup import minhash_dedup_pairs

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return minhash_dedup_pairs(docs, jaccard_threshold=0.5).count()

    timed("q6_minhash_dedup", q6, reps=2)

    # q7: brute-force cosine top-k over embeddings
    def q7():
        from pyrdf2vec_spark.functions.similarity import brute_force_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return brute_force_topk(emb, emb.where(F.col("vec_id") < 50), k=10).count()

    timed("q7_embed_topk", q7, reps=2)

    # q8: the at-scale corpus layout end-to-end — dictionary-encoded
    # BFS walks (array<bigint> + vocab table) written as zstd parquet;
    # tracks the encoded-write path round-over-round (BENCH/BASELINE.md
    # covers it only inside the scaling job's ladder)
    def q8():
        from pyrdf2vec_spark.walks import bfs_encoded_walks

        seeds = kg.entity_names().where(F.col("name").startswith("c:"))
        walks, vocab = bfs_encoded_walks(kg, seeds, 2, md5_bytes=8)
        out = "/dev/shm/bench_q8_corpus"
        spark.conf.set("spark.sql.parquet.compression.codec", "zstd")
        vocab.write.mode("overwrite").parquet(out + "_vocab")
        walks.write.mode("overwrite").parquet(out)
        return spark.read.parquet(out).count()

    # reps=2: the overwrite-mode write is idempotent, and a single-rep
    # write is the one headline line an ambient-load burst can hit
    # unprotected (observed 14.3 s vs 40.3 s across two quiet-canary
    # runs on this shared VM)
    extras["n_encoded_walks"] = timed("q8_encoded_write", q8, reps=2)

    canary["post"] = _canary()
    extras["canary_sec"] = canary

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "extras": extras,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
            }
        )
    )


if __name__ == "__main__":
    main()
