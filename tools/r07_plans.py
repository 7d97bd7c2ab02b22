"""Capture explain("formatted") for every query path touched in the
round-7 optimization pass, into a given directory.

Usage: python tools/r07_plans.py <out_dir> <suffix>
  suffix: "before" (run from a round-start worktree) or "after"

The pagerank per-round plan is reconstructed explicitly for both
versions (the returned DataFrame hides the loop behind checkpoint
leaves): the "after" build uses the library's own helpers; the
"before" build replicates the r6 loop body expressions verbatim.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F

from pyrdf2vec_spark.session import get_spark
from pyrdf2vec_spark.graph import SparkKG
from pyrdf2vec_spark.sources.tpch_graph import load_tables, tpch_triples


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r07-plans")
    kg = SparkKG(tpch_triples(load_tables(spark, sf_dir)))
    kg.edges.count()

    from pyrdf2vec_spark.walks import (
        bfs_canonical_walks,
        bfs_encoded_walks,
        bfs_walks,
        community_sampled_walks,
        dfs_canonical_walks,
        sampled_walks,
    )

    plans = {}

    seeds_o = kg.entity_names().where(F.col("name").startswith("o:")).limit(
        20000
    )
    seeds_c = kg.entity_names().where(F.col("name").startswith("c:"))

    plans["q3_dfs_sampled"] = sampled_walks(
        kg, seeds_o, 3, 4, sampler="objfreq", seed=42
    )
    plans["walks_dfs_sampled"] = sampled_walks(
        kg,
        kg.entity_names().where(F.col("name").startswith("o:")),
        2, 3, sampler="objfreq", seed=42, portable_hash=True,
    )
    plans["walks_dfs_canonical"] = dfs_canonical_walks(
        kg,
        kg.entity_names().where(F.col("name").startswith("o:")),
        2, 3, md5_bytes=8, sampler="objfreq", seed=42, portable_hash=True,
    )
    plans["community_sampled_walks"] = community_sampled_walks(
        kg, seeds_c, 2, 3, hop_prob=0.15, sampler="uniform", seed=42,
        lpa_iterations=5, algorithm="lpa", portable_hash=True,
    )
    plans["kg_bfs_depth2"] = bfs_walks(kg, seeds_c, 2)
    plans["q2_bfs_canonical"] = bfs_canonical_walks(
        kg, seeds_c, 2, md5_bytes=8, keep_root=True
    )
    w8, v8 = bfs_encoded_walks(kg, seeds_c, 2, md5_bytes=8)
    plans["q8_encoded_walks"] = w8
    plans["q8_encoded_vocab"] = v8

    # one pagerank ROUND, reconstructed (the checkpoint leaves hide it)
    try:
        # after-shape: the library's own cached static tables + one
        # fused round
        from pyrdf2vec_spark.samplers import _pagerank_static

        links_w, nodes, id_map, n, n_dangling, loop_p = _pagerank_static(kg)
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
        agg = (
            ranks.withColumnRenamed("id", "src")
            .hint("merge")
            .join(links_w, "src", "left")
            .groupBy("dst")
            .agg(
                F.sum(F.col("rank") / F.col("out_deg")).alias("in_sum"),
                F.sum(
                    F.when(F.col("dst").isNull(), F.col("rank"))
                ).alias("_dmp"),
            )
        )
        contrib = agg.where(F.col("dst").isNotNull()).select("dst", "in_sum")
        dangling = agg.agg(
            F.coalesce(F.sum("_dmp"), F.lit(0.0)).alias("_dm")
        )
        base = 0.15 / n
        rnd = (
            nodes.hint("merge")
            .join(contrib.withColumnRenamed("dst", "id"), "id", "left")
            .crossJoin(dangling.hint("shuffle_replicate_nl"))
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(0.85)
                    * (
                        F.coalesce(F.col("in_sum"), F.lit(0.0))
                        + F.col("_dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        plans["q5_pagerank_one_round"] = rnd
    except ImportError:
        # before-shape (r6): links joins out_deg every round, semi-join
        # dangling probe, broadcast cross join
        nid = lambda c: F.xxhash64(F.col(c))  # noqa: E731
        links = kg.edges.select(
            nid("src").alias("src"), nid("dst").alias("dst")
        ).distinct().persist()
        id_map = kg.entity_names().select(
            nid("name").alias("id"), "name"
        ).persist()
        nodes = id_map.select("id").persist()
        n = nodes.count()
        out_deg = links.groupBy("src").agg(
            F.count("*").alias("out_deg")
        ).persist()
        dangling_ids = nodes.join(
            out_deg.withColumnRenamed("src", "id"), "id", "left_anti"
        ).persist()
        ranks = nodes.withColumn("rank", F.lit(1.0 / n)).persist()
        contrib = (
            links.join(out_deg, "src")
            .join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("in_sum"))
        )
        dangling = ranks.join(dangling_ids, "id", "left_semi").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        base = 0.15 / n
        rnd = (
            nodes.join(contrib.withColumnRenamed("dst", "id"), "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(0.85)
                    * (
                        F.coalesce(F.col("in_sum"), F.lit(0.0))
                        + F.col("_dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        plans["q5_pagerank_one_round"] = rnd

    for name, df in plans.items():
        txt = explain_str(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_ex = txt.count("Exchange")
        n_py = txt.count("EvalPython")
        print(f"{name}_{suffix}: exchanges~{n_ex} python_nodes={n_py}",
              flush=True)


if __name__ == "__main__":
    main()
