"""pyrdf2vec_spark — a from-scratch PySpark-native KG construction +
embedding engine with the capabilities of predict-idlab/pyRDF2Vec.

Not a port: the reference (read-only at /root/reference) defines WHAT is
computed — graph model (pyrdf2vec/graphs/kg.py), walk semantics
(pyrdf2vec/walkers/*), sampler weighting (pyrdf2vec/samplers/*), embedding
contract (pyrdf2vec/embedders/word2vec.py) — while everything here is
expressed as Spark DataFrame programs optimized by Catalyst/AQE.
"""

from pyrdf2vec_spark.session import get_spark
from pyrdf2vec_spark.graph import SparkKG
from pyrdf2vec_spark.pipeline import RDF2VecPipeline

__version__ = "0.1.0"

__all__ = ["get_spark", "SparkKG", "RDF2VecPipeline", "__version__"]
