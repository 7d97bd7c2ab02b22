"""Extra (non-frozen) benchmarks — round 7.

B1: the bucketed-storage walk path end-to-end (VERDICT r6 item 6).
`storage.write_bucketed_edge_ids` is written ONCE, then a depth-2
frontier walk runs against (a) the bucketed table read off disk and
(b) a plain (non-bucketed) parquet copy of the same rows. The bucketed
scan reports hashpartitioning(src_id, buckets), so the per-depth
frontier joins must show ZERO edge-side exchange — asserted on the
plan text, not just claimed.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... python bench_extra.py
Prints one JSON line.
"""

from __future__ import annotations

import io
import json
import os
import shutil
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from pyrdf2vec_spark.graph import SparkKG
from pyrdf2vec_spark.session import get_spark
from pyrdf2vec_spark.sources.tpch_graph import load_tables, tpch_triples
from pyrdf2vec_spark.storage import write_bucketed_edge_ids


def _walk_count(edges, seeds, depth=2):
    """The walkers' fused frontier-loop shape over an id edge table."""
    walks = seeds.select(
        F.xxhash64("name").alias("cur"),
        F.array(F.xxhash64("name")).alias("walk"),
    )
    e = edges.select("src_id", "dst_id").hint("merge")
    for _ in range(depth):
        j = walks.join(e, walks["cur"] == e["src_id"], "left")
        walks = j.select(
            F.coalesce(F.col("dst_id"), F.col("cur")).alias("cur"),
            F.when(F.col("dst_id").isNull(), F.col("walk"))
            .otherwise(F.concat(F.col("walk"), F.array(F.col("dst_id"))))
            .alias("walk"),
        )
    return walks


def _explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-extra")
    out: dict = {"metric": "bench_extra_r7", "sf_dir": sf_dir}

    kg = SparkKG(tpch_triples(load_tables(spark, sf_dir)))
    kg.edges.count()
    seeds = kg.entity_names().where(F.col("name").startswith("c:"))

    base = "/dev/shm/bench_extra_r7"
    shutil.rmtree(base, ignore_errors=True)
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    t0 = time.perf_counter()
    table = write_bucketed_edge_ids(
        kg, f"{base}/edge_ids", table="bench_extra_eids", buckets=32
    )
    out["write_bucketed_sec"] = round(time.perf_counter() - t0, 3)

    bucketed = spark.table(table)
    plain_path = f"{base}/edge_ids_plain"
    bucketed.write.mode("overwrite").parquet(plain_path)
    plain = spark.read.parquet(plain_path)

    # plan assertion: the bucketed read path must carry NO exchange (and
    # no sort) on the edge side of the frontier join; the plain path
    # must carry one (that is the difference being measured)
    plan_b = _explain(_walk_count(bucketed, seeds))
    plan_p = _explain(_walk_count(plain, seeds))

    def edge_side_exchanges(plan: str) -> int:
        # formatted plans print the operator ("(7) Exchange") and its
        # partitioning ("Arguments: hashpartitioning(src_id#9L, ...)")
        # on separate lines — count the src_id hash exchanges (the
        # frontier side exchanges on `cur`, the edge side on `src_id`)
        return sum(
            1
            for ln in plan.splitlines()
            if ln.strip().startswith("Arguments: hashpartitioning(src_id")
        )

    out["bucketed_edge_exchanges"] = edge_side_exchanges(plan_b)
    out["plain_edge_exchanges"] = edge_side_exchanges(plan_p)
    assert out["bucketed_edge_exchanges"] == 0, (
        "bucketed read path shows an edge-side exchange:\n" + plan_b
    )
    assert out["plain_edge_exchanges"] > 0, (
        "plain read path unexpectedly shows no edge-side exchange"
    )
    with open("plans/r07/bucketed_walk_read.txt", "w") as f:
        f.write("== bucketed ==\n" + plan_b + "\n== plain ==\n" + plan_p)

    for name, edges in (("bucketed", bucketed), ("plain", plain)):
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            _walk_count(edges, seeds).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.perf_counter() - t0, 3))
        out[f"walk_{name}_sec"] = min(walls)
        out[f"walk_{name}_reps"] = walls

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
