"""pyrdf2vec_spark — a from-scratch PySpark-native KG construction +
embedding engine with the capabilities of predict-idlab/pyRDF2Vec.

Not a port: the reference (read-only at /root/reference) defines WHAT is
computed — graph model (pyrdf2vec/graphs/kg.py), walk semantics
(pyrdf2vec/walkers/*), sampler weighting (pyrdf2vec/samplers/*), embedding
contract (pyrdf2vec/embedders/word2vec.py) — while everything here is
expressed as Spark DataFrame programs optimized by Catalyst/AQE.
"""

from pyrdf2vec_spark.session import get_spark
from pyrdf2vec_spark.graph import SparkKG, read_entities_tsv, triples_from_nt
from pyrdf2vec_spark.storage import (
    materialize_kg,
    upsert_triples,
    write_bucketed_edge_ids,
)
from pyrdf2vec_spark.pipeline import RDF2VecPipeline
from pyrdf2vec_spark.embed import SparkFastText, SparkWord2Vec
from pyrdf2vec_spark.walks import (
    bfs_canonical_walks,
    bfs_encoded_walks,
    bfs_walks,
    community_labels,
    community_sampled_walks,
    community_walks,
    dfs_canonical_walks,
    extract_walks,
    louvain_labels,
    sampled_walks,
)

__version__ = "0.2.0"

__all__ = [
    "get_spark",
    "SparkKG",
    "RDF2VecPipeline",
    "SparkWord2Vec",
    "SparkFastText",
    "bfs_walks",
    "sampled_walks",
    "extract_walks",
    "bfs_canonical_walks",
    "dfs_canonical_walks",
    "bfs_encoded_walks",
    "community_labels",
    "louvain_labels",
    "community_walks",
    "community_sampled_walks",
    "triples_from_nt",
    "read_entities_tsv",
    "materialize_kg",
    "write_bucketed_edge_ids",
    "upsert_triples",
    "__version__",
]
