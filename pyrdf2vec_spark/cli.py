"""spark-submit entry point (north rule: `spark-submit --py-files`).

Package the library and run any pipeline stage:

    cd /root/repo && zip -r /tmp/pyrdf2vec_spark.zip pyrdf2vec_spark
    spark-submit --py-files /tmp/pyrdf2vec_spark.zip \\
        pyrdf2vec_spark/cli.py run --transcripts <path> --out <dir>

Subcommands:
    synth    — write a deterministic synthetic transcript table
    extract  — transcripts parquet → triples parquet
    run      — full pipeline: transcripts → embeddings (+ manifests)
    bench    — tiny smoke of every stage
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="pyrdf2vec-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("synth")
    sp.add_argument("--convs", type=int, default=1000)
    sp.add_argument("--turns", type=int, default=10)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--out", required=True)

    ep = sub.add_parser("extract")
    ep.add_argument("--transcripts", required=True)
    ep.add_argument("--out", required=True)

    rp = sub.add_parser("run")
    rp.add_argument("--transcripts", required=True)
    rp.add_argument("--out", required=True)
    rp.add_argument("--max-depth", type=int, default=2)
    rp.add_argument("--max-walks", type=int, default=None)
    rp.add_argument("--walker", default="random", choices=["random", "wl"])
    rp.add_argument("--sampler", default="uniform")
    rp.add_argument("--vector-size", type=int, default=64)
    rp.add_argument("--checkpoint-dir", default=None)
    rp.add_argument("--seed", type=int, default=42)

    args = p.parse_args(argv)

    from pyrdf2vec_spark.session import get_spark

    spark = get_spark(f"pyrdf2vec-{args.cmd}")

    if args.cmd == "synth":
        from pyrdf2vec_spark.sources.transcripts import synth_transcripts

        synth_transcripts(
            spark, args.convs, args.turns, seed=args.seed
        ).write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.convs * args.turns} turns to {args.out}")
        return 0

    if args.cmd == "extract":
        from pyrdf2vec_spark.extract import extract_triples, triples_only

        tr = spark.read.parquet(args.transcripts)
        triples_only(extract_triples(tr)).write.mode("overwrite").parquet(
            args.out
        )
        print(f"wrote triples to {args.out}")
        return 0

    if args.cmd == "run":
        from pyrdf2vec_spark.pipeline import RDF2VecPipeline

        tr = spark.read.parquet(args.transcripts)
        pipe = RDF2VecPipeline(
            max_depth=args.max_depth,
            max_walks=args.max_walks,
            walker=args.walker,
            sampler=args.sampler,
            vector_size=args.vector_size,
            seed=args.seed,
            checkpoint_dir=args.checkpoint_dir,
        )
        emb = pipe.run(tr)
        emb.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(f"wrote {n} embeddings to {args.out}; timings {pipe.timings_}")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
