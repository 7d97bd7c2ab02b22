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

import pandas as pd
from pyspark.ml.feature import Word2Vec as MLWord2Vec, Word2VecModel
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType, StringType
from pyspark.storagelevel import StorageLevel


class SparkWord2Vec:
    """fit/transform contract of pyrdf2vec/embedders/embedder.py:11-51."""

    # MLlib Word2Vec builds its vocabulary ON THE DRIVER and broadcasts
    # the full weight matrix to every executor per sync: driver memory
    # is O(vocab × dim × 8 bytes × 2 matrices). At 100 TB with an open
    # vocab this is the pipeline's one remaining driver-side bound —
    # e.g. 100M words × 100 dims ≈ 160 GB, an OOM long after the fit
    # started. The guard below fails FAST with the actual estimate and
    # the two pruning levers (min_count, max_vocab_size) instead.
    DRIVER_VOCAB_BUDGET_BYTES = 8 << 30  # 8 GiB of weights

    def __init__(
        self,
        vector_size: int = 100,
        window: int = 5,
        min_count: int = 0,
        max_iter: int = 1,
        seed: int = 42,
        step_size: float = 0.025,
        num_partitions: int = 1,
        max_vocab_size: int | None = None,
        vocab_size_hint: int | None = None,
    ):
        # num_partitions > 1 parallelizes skip-gram training across
        # executors (MLlib defaults to 1 — single-task training, the
        # fit-time bottleneck on big corpora) at the cost of exact
        # run-to-run reproducibility — the same trade gensim makes with
        # workers > 1 (reference pins workers=1 only in tests)
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
            .setNumPartitions(num_partitions)
        )
        self.model: Word2VecModel | None = None
        self._vector_size = vector_size
        self._min_count = min_count
        self.max_vocab_size = max_vocab_size
        # vocab_size_hint: a caller-known HARD UPPER BOUND on the
        # distinct-token count (e.g. the exact vocab table size from
        # bfs_encoded_walks) — lets the guard validate the driver
        # budget WITHOUT any scan of the corpus. Only consulted when no
        # pruning is configured. The hint is trusted pre-fit, then
        # cross-checked post-fit against the model's real vocabulary
        # (one cheap vocab-sized count): a stale/undersized hint raises
        # instead of silently defeating the driver-OOM guard.
        self.vocab_size_hint = vocab_size_hint

    def fit(self, walks: DataFrame, deterministic: bool = False) -> "SparkWord2Vec":
        """Fit skip-gram over walks(entity, walk array<string>).

        ``deterministic=True`` pins the corpus order (one extra sort) so
        two fits with the same seed give identical vectors — the
        reference guarantees this with gensim workers=1
        (tests/embedders/test_word2vec.py:86-98); MLlib needs a stable
        input order for the same guarantee. Leave False for large runs.
        """
        corpus = walks.select("walk")
        # Persist before the vocab guard: the corpus is read twice
        # (guard count + fit), MLlib's fit re-reads it per iteration,
        # and the cache boundary keeps any upstream Python UDF (e.g.
        # FastText subword augmentation) in its own Arrow-eval stage
        # instead of being duplicated into the guard's shuffle map side
        # (where Catalyst cannot evaluate it).
        cached = corpus.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            used_hint = (
                self.vocab_size_hint is not None
                and self.max_vocab_size is None
                and self._min_count <= 0
            )
            corpus = self._guard_vocab(cached)
            if deterministic:
                corpus = corpus.orderBy(F.col("walk"))
            self.model = self._w2v.fit(corpus)
            if used_hint:
                # the pre-fit budget check trusted the caller's bound;
                # verify it against the REAL vocab (O(vocab) count over
                # the fitted vectors — no corpus scan) so a stale hint
                # cannot silently defeat the driver-OOM guard
                actual = self.model.getVectors().count()
                if actual > self.vocab_size_hint:
                    raise ValueError(
                        f"vocab_size_hint={self.vocab_size_hint:,} was "
                        f"below the real vocabulary ({actual:,} tokens) "
                        "— the pre-fit driver-memory estimate was "
                        "invalid. Pass the true bound (e.g. the vocab "
                        "table count from bfs_encoded_walks) or drop "
                        "the hint to use the HLL guard."
                    )
        finally:
            # MLlib caches its internal sentence RDD during fit, so the
            # input cache is safe to drop as soon as fit returns
            cached.unpersist()
        return self

    def _guard_vocab(self, corpus: DataFrame) -> DataFrame:
        """Enforce the driver-memory vocab bound BEFORE the fit starts.

        One distributed agg counts the post-min_count vocabulary; if
        ``max_vocab_size`` is set and exceeded, the corpus is pruned to
        the top-N tokens by frequency (gensim's max_vocab_size lever —
        the reference exposes it implicitly via gensim kwargs). If the
        surviving vocab × dim weight matrices still exceed
        DRIVER_VOCAB_BUDGET_BYTES, raise with the estimate instead of
        letting the MLlib fit OOM the driver hours in.
        """
        if self.max_vocab_size is None and self._min_count <= 0:
            if self.vocab_size_hint is not None:
                # the caller already knows the vocab bound (e.g. the
                # dictionary-encoded corpus carries its exact vocab
                # count) — the guard costs ZERO extra scans
                return self._check_budget(corpus, self.vocab_size_hint)
            # no pruning requested → the guard only needs the SIZE of
            # the vocab: one map-side HLL pass (approx_count_distinct)
            # instead of a full groupBy shuffle. rsd=0.02 is a STANDARD
            # DEVIATION, not a bound — pad by 3σ (×1.06) so a vocab
            # modestly over budget cannot slip under via HLL noise.
            vocab_n = int(
                corpus.select(F.explode("walk").alias("_tok"))
                .agg(F.approx_count_distinct("_tok", 0.02).alias("n"))
                .first()["n"]
                * 1.06
            )
            return self._check_budget(corpus, vocab_n)
        counts = (
            corpus.select(F.explode("walk").alias("_tok"))
            .groupBy("_tok")
            .agg(F.count("*").alias("_cnt"))
        )
        if self._min_count > 0:
            counts = counts.where(F.col("_cnt") >= self._min_count)
        vocab_n = counts.count()
        if self.max_vocab_size and vocab_n > self.max_vocab_size:
            # TakeOrderedAndProject (orderBy+limit), never a global sort
            keep = counts.orderBy(
                F.col("_cnt").desc(), F.col("_tok")
            ).limit(self.max_vocab_size).select("_tok")
            kept = F.broadcast(keep) if self.max_vocab_size <= 1_000_000 else keep
            pruned = (
                corpus.withColumn("_wid", F.monotonically_increasing_id())
                .select(
                    "_wid", F.posexplode("walk").alias("_pos", "_tok")
                )
                .join(kept, "_tok")
                .groupBy("_wid")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "_tok"))
                    ).alias("_sorted")
                )
                .select(
                    F.expr("transform(_sorted, s -> s._tok)").alias("walk")
                )
            )
            corpus = pruned.where(F.size("walk") > 0)
            vocab_n = self.max_vocab_size
        return self._check_budget(corpus, vocab_n)

    # MLlib stores syn0/syn1 as Array[Float] → 4 bytes per weight, two
    # matrices; ×1.5 safety covers JVM object headers plus the per-sync
    # broadcast copy (an explicit factor, NOT part of the raw estimate)
    _BYTES_PER_WEIGHT = 4
    _WEIGHT_MATRICES = 2
    _JVM_SAFETY = 1.5

    def _check_budget(self, corpus: DataFrame, vocab_n: int) -> DataFrame:
        est = int(
            vocab_n
            * self._vector_size
            * self._BYTES_PER_WEIGHT
            * self._WEIGHT_MATRICES
            * self._JVM_SAFETY
        )
        if est > self.DRIVER_VOCAB_BUDGET_BYTES:
            raise ValueError(
                f"Word2Vec vocabulary of {vocab_n:,} tokens × "
                f"{self._vector_size} dims needs ~{est / 2**30:.1f} GiB "
                "of driver memory (4-byte syn0+syn1 weights ×1.5 JVM "
                "overhead; MLlib builds the vocab and weight "
                "matrices driver-side) — over the "
                f"{self.DRIVER_VOCAB_BUDGET_BYTES / 2**30:.0f} GiB "
                "budget. Prune with min_count and/or max_vocab_size, "
                "or raise SparkWord2Vec.DRIVER_VOCAB_BUDGET_BYTES to "
                "match the driver's actual memory."
            )
        return corpus

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


# ---------------------------------------------------------------------------
# E3 — FastText-equivalent subword pooling (pyrdf2vec/embedders/fasttext.py)
# ---------------------------------------------------------------------------
def ft_hash_bytes(bytez: bytes) -> int:
    """Exact replica of fasttext.py:201-215 ft_hash_bytes — FNV-1a with
    UNBOUNDED Python integers (the reference applies no 32-bit mask),
    reduced mod bucket by the caller."""
    h = 2166136261
    for b in bytez:
        h = h ^ b
        h = h * 16777619
    return h


def compute_ngrams_bytes(entity: str) -> list[bytes]:
    """fasttext.py:178-199: URIs split on '#' into segment 'ngrams';
    non-URIs contribute themselves."""
    if "http" in entity:
        return [s.encode() for s in " ".join(entity.split("#")).split()]
    return [entity.encode()]


def ft_ngram_buckets(entity: str, num_buckets: int = 2_000_000) -> list[int]:
    return [ft_hash_bytes(n) % num_buckets for n in compute_ngrams_bytes(entity)]


# bucket tokens share the word vocabulary during training; the \x00
# prefix cannot occur in real vertex names, so the two never collide
_BKT_PREFIX = "\x00bkt:"


class SparkFastText:
    """FastText-contract embedder: Word2Vec over a subword-AUGMENTED walk
    corpus (SURVEY.md E3 — MLlib has no FastText). gensim trains word
    and ngram vectors jointly (fasttext.py:52-156); here each walk token
    is interleaved with its FNV-1a ngram-bucket tokens before the
    skip-gram fit, so bucket vectors are TRAINED in the word's context
    window rather than derived post hoc — the closest joint-training
    analogue expressible over MLlib. Remaining divergence (documented):
    gensim composes in-vocab vectors as word+ngram sums during training;
    here in-vocab words keep their directly-trained vector.

    transform semantics mirror RDFFastTextKeyedVectors.get_vector
    (fasttext.py:129-156) INCLUDING gensim's composed in-vocab
    representation (FastTextKeyedVectors.adjust_vectors): in-vocab
    word → mean over its word vector AND its trained ngram-bucket
    vectors (denominator 1 + n_ngrams); OOV word → mean of its
    (trained) ngram-bucket vectors alone (denominator n_ngrams,
    untrained buckets contributing zeros — gensim divides by
    len(ngram_hashes) the same way); no bucket hit at all → zeros.
    """

    def __init__(self, vector_size: int = 64, bucket: int = 2_000_000,
                 seed: int = 42, **w2v_kwargs):
        self.bucket = bucket
        self._w2v = SparkWord2Vec(vector_size=vector_size, seed=seed, **w2v_kwargs)
        self._bucket_vecs: DataFrame | None = None
        self.vector_size = vector_size

    def fit(self, walks: DataFrame, deterministic: bool = False) -> "SparkFastText":
        nb = self.bucket

        @pandas_udf(ArrayType(StringType()))
        def _augment(col: pd.Series) -> pd.Series:
            return col.map(
                lambda walk: [
                    t
                    for w in walk
                    for t in (
                        [w]
                        + [
                            f"{_BKT_PREFIX}{b}"
                            for b in ft_ngram_buckets(w, nb)
                        ]
                    )
                ]
            )

        aug = walks.select(_augment(F.col("walk")).alias("walk"))
        self._w2v.fit(aug, deterministic=deterministic)
        plen = len(_BKT_PREFIX)
        self._bucket_vecs = (
            self._w2v.model.getVectors()
            .where(F.col("word").startswith(_BKT_PREFIX))
            .select(
                F.substring(F.col("word"), plen + 1, 30)
                .cast("long")
                .alias("bucket"),
                vector_to_array("vector", "float32").alias("bucket_vec"),
            )
            .persist()
        )
        self._bucket_vecs.count()
        return self

    def transform(self, entities: DataFrame) -> DataFrame:
        """(word, vector) for every entity; never raises for OOV (the
        FastText property). One uniform plan: every word's bucket
        vectors are pooled, the word's own vector (when in vocab) joins
        the pool with weight 1 — exactly gensim's
        ``(word_vec + Σ ngram_vecs) / (1 + n)`` in-vocab composition
        and ``Σ ngram_vecs / n`` OOV fallback."""
        if self._bucket_vecs is None:
            raise ValueError("You must call the `fit(walks)` method first.")
        nb = self.bucket

        @pandas_udf(ArrayType(LongType()))
        def _buckets(col: pd.Series) -> pd.Series:
            return col.map(lambda w: ft_ngram_buckets(w, nb))

        ents = entities.select(F.col(entities.columns[0]).alias("word"))
        vecs = self._w2v.vectors().where(
            ~F.col("word").startswith(_BKT_PREFIX)
        )
        dim = self.vector_size
        zero = F.array(*[F.lit(0.0).cast("float")] * dim)
        pooled = (
            ents.select(
                "word", F.explode(_buckets(F.col("word"))).alias("bucket")
            )
            .join(self._bucket_vecs, "bucket", "left")
            .withColumn("bv", F.coalesce("bucket_vec", zero))
            .groupBy("word")
            .agg(
                F.count("*").alias("n"),
                F.aggregate(
                    F.collect_list("bv"),
                    zero,
                    lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
                ).alias("sum_vec"),
            )
        )
        composed = (
            pooled.join(vecs, "word", "left")
            .withColumn(
                "_wv_n", F.when(F.col("vector").isNotNull(), 1).otherwise(0)
            )
            .withColumn(
                "_total",
                F.zip_with(
                    "sum_vec",
                    F.coalesce("vector", zero),
                    lambda a, b: a + b,
                ),
            )
            .select(
                "word",
                F.expr(
                    "transform(_total, x -> cast(x / (n + _wv_n) as float))"
                ).alias("vector"),
            )
        )
        return composed
