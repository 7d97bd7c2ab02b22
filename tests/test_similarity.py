"""ANN quality contracts: IVF recall floors vs the exact baseline,
exactness when probing every cell, and neardup blocking recall.

The synthetic embeddings are ~uniform on the sphere — the WORST case
for coarse quantization (no cluster structure to exploit), so these
floors are conservative; clustered real embeddings recall higher.
"""

import pytest
from pyspark.sql import functions as F

from pyrdf2vec_spark.functions.dedup import embedding_neardup_pairs
from pyrdf2vec_spark.functions.similarity import (
    brute_force_topk,
    ivf_centroids,
    ivf_probe_assign,
    ivf_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def exact(spark, emb):
    q = emb.where(F.col("vec_id") < 20)
    return {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, k=5).collect()
    }


class TestIVF:
    def _recall(self, emb, exact, probes):
        q = emb.where(F.col("vec_id") < 20)
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                emb, q, k=5, n_centroids=16, n_probes=probes
            ).collect()
        }
        return len(exact & got) / len(exact)

    def test_recall_floor_and_monotonicity(self, emb, exact):
        r4 = self._recall(emb, exact, 4)
        r8 = self._recall(emb, exact, 8)
        assert r4 >= 0.4  # measured 0.50 on this corpus
        assert r8 >= r4
        assert r8 >= 0.6  # measured ~0.7

    def test_full_probe_equals_exact(self, emb, exact):
        # probing every cell searches the whole corpus with identical
        # scoring and tie-breaks — must reproduce the baseline exactly
        assert self._recall(emb, exact, 16) == 1.0

    def test_probe_assign_shapes(self, emb):
        cents = ivf_centroids(emb, 16)
        asg = ivf_probe_assign(emb, cents, n_probes=2)
        n = emb.count()
        assert asg.count() == 2 * n
        per_cell = asg.groupBy("centroid_id").count()
        assert per_cell.count() == 16


class TestNeardupRecall:
    def test_blocking_recall_floor(self, spark, emb):
        # ground truth: all pairs >= 0.35 via an explicit cross join
        a = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
        b = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
        dot = F.expr(
            "aggregate(zip_with(va, vb, (x, y) -> CAST(x AS DOUBLE) * y), "
            "CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)"
        )
        na = F.sqrt(F.expr(
            "aggregate(va, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * x)"
        ))
        nb = F.sqrt(F.expr(
            "aggregate(vb, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * x)"
        ))
        truth = {
            (r["a"], r["b"])
            for r in a.crossJoin(b)
            .where(F.col("a") < F.col("b"))
            .withColumn("c", dot / (na * nb))
            .where(F.col("c") >= 0.35)
            .select("a", "b")
            .collect()
        }
        got2 = {
            (r["a"], r["b"])
            for r in embedding_neardup_pairs(
                emb, threshold=0.35, n_probes=2
            ).collect()
        }
        got4 = {
            (r["a"], r["b"])
            for r in embedding_neardup_pairs(
                emb, threshold=0.35, n_probes=4
            ).collect()
        }
        assert got2 <= truth and got4 <= truth  # zero false positives
        r2 = len(got2 & truth) / len(truth)
        r4 = len(got4 & truth) / len(truth)
        assert r2 >= 0.35  # measured 0.48 on this uniform corpus
        assert r4 >= r2


class TestQuantization:
    def test_int8_range_and_scale(self, spark, emb):
        from pyrdf2vec_spark.functions.similarity import (
            quantize_embeddings,
        )

        rows = quantize_embeddings(emb.limit(50)).collect()
        for r in rows:
            assert all(-127 <= q <= 127 for q in r["qvec"])
            assert max(abs(q) for q in r["qvec"]) == 127  # maxabs hits full scale
            assert r["scale"] > 0

    def test_zero_vector_quantizes_to_zeros(self, spark):
        from pyrdf2vec_spark.functions.similarity import (
            quantize_embeddings,
        )

        df = spark.createDataFrame(
            [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
            "vec_id long, embedding array<float>",
        )
        got = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
        assert got[1]["qvec"] == [0, 0, 0] and got[1]["scale"] == 0.0
        assert got[2]["qvec"] == [64, -127, 32]

    def test_quantized_topk_recall_vs_exact(self, spark, emb, exact):
        # int8 rounding barely moves cosine: ≥90% of exact top-5
        # neighbors survive quantization on this worst-case corpus
        from pyrdf2vec_spark.functions.similarity import quantized_topk

        q = emb.where(F.col("vec_id") < 20)
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in quantized_topk(emb, q, k=5).collect()
        }
        recall = len(got & exact) / len(exact)
        assert recall >= 0.9, recall
