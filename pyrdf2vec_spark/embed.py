"""Word2Vec embedder over the walk corpus.

Reference: gensim skip-gram with min_count=0 over the flattened corpus
(pyrdf2vec/embedders/word2vec.py:29-77). Spark-native equivalent:
pyspark.ml.feature.Word2Vec (skip-gram, hierarchical softmax) fit directly
on the walks DataFrame — the corpus never leaves the executors.

Online ``is_update`` (word2vec.py:37,52) has no MLlib analogue: the walk
corpus is persisted as a table and re-fit over the union (documented
divergence, SURVEY.md E1). Vector parity with gensim is *neighborhood*
parity, not numeric equality (SURVEY.md §5.4.2).
"""

from __future__ import annotations

from pyspark.ml.feature import Word2Vec as MLWord2Vec, Word2VecModel
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame, functions as F


class SparkWord2Vec:
    """fit/transform contract of pyrdf2vec/embedders/embedder.py:11-51."""

    def __init__(
        self,
        vector_size: int = 100,
        window: int = 5,
        min_count: int = 0,
        max_iter: int = 1,
        seed: int = 42,
        step_size: float = 0.025,
    ):
        self._w2v = (
            MLWord2Vec()
            .setInputCol("walk")
            .setOutputCol("_vec")
            .setVectorSize(vector_size)
            .setWindowSize(window)
            .setMinCount(min_count)
            .setMaxIter(max_iter)
            .setSeed(seed)
            .setStepSize(step_size)
        )
        self.model: Word2VecModel | None = None

    def fit(self, walks: DataFrame, deterministic: bool = False) -> "SparkWord2Vec":
        """Fit skip-gram over walks(entity, walk array<string>).

        ``deterministic=True`` pins the corpus order (one extra sort) so
        two fits with the same seed give identical vectors — the
        reference guarantees this with gensim workers=1
        (tests/embedders/test_word2vec.py:86-98); MLlib needs a stable
        input order for the same guarantee. Leave False for large runs.
        """
        corpus = walks.select("walk")
        if deterministic:
            corpus = corpus.orderBy(F.col("walk"))
        self.model = self._w2v.fit(corpus)
        return self

    def vectors(self) -> DataFrame:
        """All learned vectors: (word, vector) — Word2VecModel.getVectors."""
        if self.model is None:
            raise ValueError(
                "You must call the `fit(walks)` method before vectors()."
            )
        return self.model.getVectors().select(
            "word", vector_to_array("vector", "float32").alias("vector")
        )

    def transform(self, entities: DataFrame) -> DataFrame:
        """Per-entity vectors; raises ValueError when any entity is OOV —
        the reference's word2vec.py:60-77 contract, via one anti-join
        instead of per-entity lookups."""
        vecs = self.vectors()
        ents = entities.select(F.col(entities.columns[0]).alias("word"))
        missing = ents.join(vecs, "word", "left_anti")
        if not missing.isEmpty():
            sample = [r[0] for r in missing.limit(5).collect()]
            raise ValueError(
                f"The entities {sample} must have been provided to fit() first"
            )
        return ents.join(vecs, "word", "inner")

    def save(self, path: str) -> None:
        if self.model is None:
            raise ValueError("fit before save")
        self.model.write().overwrite().save(path)

    def load(self, spark_path: str) -> "SparkWord2Vec":
        self.model = Word2VecModel.load(spark_path)
        return self
