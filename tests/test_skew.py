"""Hub-entity skew (north rule: "AQE skew-join handling ... skewed hub
entities"). Two angles:

1. BFS CORRECTNESS under extreme skew — 40k walks parked at one hub
   vertex through the forced sort-merge path: exact counts and walks.
2. The SPLIT itself, demonstrated on the core adjacency join
   (`SparkKG.hops`, the primitive every walker iterates): with a
   hub-skewed frontier and AQE thresholds scaled to test size, the
   executed plan contains a skew-split sort-merge join (`skew=true`).

Measured Spark 4.1 constraint worth recording: OptimizeSkewedJoin
splits the plain Project(SMJ) stage shape (the hops/adjacency shape)
but NOT a join whose output fans into the BFS union-of-branches result
stage — so at depth-d the intermediate frontier joins are the ones the
optimizer protects, which is where the hub explosion actually happens.
"""

import pytest
from pyspark.sql import functions as F

import pyrdf2vec_spark.walks as walks_mod
from pyrdf2vec_spark.graph import SparkKG
from pyrdf2vec_spark.walks import bfs_walks

N_SPOKES = 40_000  # spokes walking INTO the hub → one fat frontier key
N_LONERS = 2_000  # spokes to distinct dead-end targets → spread keys
N_HUB_OUT = 3  # hub fan-out at depth 2 (small: outputs are collected)

_AQE_KEYS = (
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    "spark.sql.adaptive.forceOptimizeSkewedJoin",
    "spark.sql.autoBroadcastJoinThreshold",
)


@pytest.fixture()
def tiny_skew_conf(spark):
    conf = spark.conf
    saved = {k: conf.get(k, None) for k in _AQE_KEYS}
    conf.set(_AQE_KEYS[0], "4KB")
    conf.set(_AQE_KEYS[1], "2KB")
    conf.set(_AQE_KEYS[2], "1")
    conf.set(_AQE_KEYS[3], "true")
    # the fixture graph is tiny — keep the join on the shuffle path so
    # the skew rule (not a broadcast) is what handles the hub
    conf.set(_AQE_KEYS[4], "-1")
    yield
    for k, v in saved.items():
        if v is None:
            conf.unset(k)
        else:
            conf.set(k, v)


@pytest.fixture()
def hub_kg(spark):
    spokes = spark.range(N_SPOKES).select(
        F.concat(F.lit("s"), F.col("id")).alias("subj"),
        F.lit("p").alias("pred"),
        F.lit("hub").alias("obj"),
    )
    loners = spark.range(N_LONERS).select(
        F.concat(F.lit("l"), F.col("id")).alias("subj"),
        F.lit("p").alias("pred"),
        F.concat(F.lit("x"), F.col("id")).alias("obj"),
    )
    hub_out = spark.range(N_HUB_OUT).select(
        F.lit("hub").alias("subj"),
        F.lit("q").alias("pred"),
        F.concat(F.lit("t"), F.col("id")).alias("obj"),
    )
    return SparkKG(spokes.unionByName(loners).unionByName(hub_out))


class TestHubSkew:
    def test_skewed_bfs_exact(self, spark, hub_kg, monkeypatch,
                              tiny_skew_conf):
        monkeypatch.setattr(walks_mod, "BROADCAST_EDGE_LIMIT", 0)
        seeds = spark.range(N_SPOKES).select(
            F.concat(F.lit("s"), F.col("id")).alias("entity")
        ).unionByName(
            spark.range(N_LONERS).select(
                F.concat(F.lit("l"), F.col("id")).alias("entity")
            )
        )
        rows = bfs_walks(hub_kg, seeds, 2).collect()
        # spokes: 1 walk to hub each, × N_HUB_OUT at depth 2;
        # loners: depth-1 walk to x_i, frozen dead-end at depth 2
        assert len(rows) == N_SPOKES * N_HUB_OUT + N_LONERS
        walk_set = {tuple(r["walk"]) for r in rows}
        assert ("s0", "p", "hub", "q", "t0") in walk_set
        assert ("l0", "p", "x0") in walk_set

    def test_adjacency_join_skew_split(self, spark, hub_kg,
                                       tiny_skew_conf):
        # the primitive every walker iterates: frontier→edges join;
        # 40k frontier rows at one hub key must trigger the AQE split
        frontier = spark.range(N_SPOKES).select(
            F.lit("hub").alias("node"), F.col("id").alias("wid")
        ).unionByName(
            spark.range(N_LONERS).select(
                F.concat(F.lit("l"), F.col("id")).alias("node"),
                (F.col("id") + 10 * N_SPOKES).alias("wid"),
            )
        )
        hops = hub_kg.hops(frontier, "node")
        rows = hops.collect()
        assert len(rows) == N_SPOKES * N_HUB_OUT + N_LONERS
        plan = hops._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:3000]

    def test_spoke_walk_shape(self, spark, hub_kg, monkeypatch):
        monkeypatch.setattr(walks_mod, "BROADCAST_EDGE_LIMIT", 0)
        seeds = spark.createDataFrame([("s0",)], "entity string")
        sample = bfs_walks(hub_kg, seeds, 2).limit(5).collect()
        for r in sample:
            w = r["walk"]
            assert w[0] == "s0" and w[2] == "hub" and w[4].startswith("t")
