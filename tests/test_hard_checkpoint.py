"""hard_local_checkpoint regression: iterative loops that reference
their previous checkpoint more than once per round must not compound
the carried sizeInBytes estimate.

Pathology (measured round 4, pyspark 4.1.2): Dataset.localCheckpoint
snapshots the source plan's estimated sizeInBytes into the LogicalRDD
leaf, and join-size estimation multiplies child sizes — a loop whose
round-k plan joins the round-(k-1) checkpoint with something derived
from that same checkpoint doubles the stats BigInt's bit-length every
round (57 → 10,624 bits in 8 Louvain sweeps) until optimizer BigInt
arithmetic wedges the driver. hard_local_checkpoint re-wraps the
materialized RDD in a stats-free leaf; bit-length stays flat.
"""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pyrdf2vec_spark.session import hard_local_checkpoint


def _stats_bits(df) -> int:
    return int(
        df._jdf.queryExecution().analyzed().stats().sizeInBytes()
    ).bit_length()


def _two_reference_round(state, dim):
    """One loop round that references `state` twice on a join path —
    the shape that compounds a plain localCheckpoint's carried stats."""
    agg = state.join(dim, "id").groupBy("grp").agg(F.sum("v").alias("s"))
    return (
        state.withColumn("grp", F.col("id") % 3)
        .join(agg, "grp")
        .select("id", (F.col("v") + F.col("s")).alias("v"))
    )


class TestHardLocalCheckpoint:
    def test_plain_checkpoint_compounds_stats(self, spark):
        dim = spark.range(30).select(
            "id", (F.col("id") % 3).alias("grp")
        ).localCheckpoint(eager=True)
        state = spark.range(30).select(
            "id", F.lit(1).cast("long").alias("v")
        ).localCheckpoint(eager=True)
        bits = []
        for _ in range(4):
            state = _two_reference_round(state, dim).localCheckpoint(
                eager=True
            )
            bits.append(_stats_bits(state))
        # the documented hazard: strictly growing, roughly doubling
        assert bits[-1] > 2 * bits[0], bits

    def test_hard_checkpoint_stats_stay_flat(self, spark):
        dim = hard_local_checkpoint(
            spark.range(30).select("id", (F.col("id") % 3).alias("grp"))
        )
        state = hard_local_checkpoint(
            spark.range(30).select("id", F.lit(1).cast("long").alias("v"))
        )
        bits = []
        for _ in range(8):
            state = hard_local_checkpoint(
                _two_reference_round(state, dim)
            )
            bits.append(_stats_bits(state))
        assert max(bits) <= 64, bits
        # and the data survives the re-wrap intact
        assert state.count() == 30

    def test_values_identical_to_plain_checkpoint(self, spark):
        df = spark.range(50).select(
            "id", (F.col("id") * 7 % 13).alias("v")
        )
        plain = sorted(df.localCheckpoint(eager=True).collect())
        hard = sorted(hard_local_checkpoint(df).collect())
        assert plain == hard
