"""One-off measurement: distributed louvain_labels vs LPA vs the
pure-Python Louvain oracle on noisy planted-partition graphs (the
regime where deterministic LPA floods). Prints one JSON line per
config; feeds the floors in tests/test_community_quality.py and
SURVEY.md §5.4.

Usage: python tools/measure_louvain.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyrdf2vec_spark.graph import SparkKG
from pyrdf2vec_spark.session import get_spark
from pyrdf2vec_spark.walks import community_labels, louvain_labels

sys.path.insert(0, "/root/repo/tests")
from test_community_quality import (
    _louvain,
    _modularity,
    _undirected,
    noisy_planted,
)
from conftest import uri


def spark_partition(spark, edges, fn, **kw):
    kg = SparkKG(
        spark.createDataFrame(
            [(uri(s), uri("knows"), uri(o)) for s, o in edges],
            "subj string, pred string, obj string",
        )
    )
    return {
        r["name"].split("#")[-1]: r["community"]
        for r in fn(kg, **kw).collect()
    }


def main():
    spark = get_spark("measure-louvain")
    for n_comms, size, p_in, p_out, seed in [
        (3, 10, 0.8, 0.0, 11),   # clean (the existing fixture regime)
        (3, 12, 0.6, 0.15, 7),   # noisy
        (4, 12, 0.6, 0.20, 19),  # noisier
        (4, 15, 0.5, 0.25, 3),   # LPA-flooding regime
    ]:
        edges = noisy_planted(n_comms, size, p_in, p_out, seed)
        adj = _undirected(edges)
        q_oracle = _modularity(adj, _louvain(adj))
        lpa = spark_partition(spark, edges, community_labels, iterations=5)
        q_lpa = _modularity(adj, {u: lpa[u] for u in adj})
        lv = spark_partition(spark, edges, louvain_labels)
        q_lv = _modularity(adj, {u: lv[u] for u in adj})
        print(json.dumps({
            "cfg": [n_comms, size, p_in, p_out, seed],
            "n_edges": len(edges),
            "q_oracle": round(q_oracle, 4),
            "q_lpa": round(q_lpa, 4),
            "q_louvain_spark": round(q_lv, 4),
            "lpa_ratio": round(q_lpa / q_oracle, 3) if q_oracle else None,
            "louvain_ratio": round(q_lv / q_oracle, 3) if q_oracle else None,
        }), flush=True)


if __name__ == "__main__":
    main()
