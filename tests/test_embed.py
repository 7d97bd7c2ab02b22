"""Word2Vec embedder contract (reference tests/embedders/test_word2vec.py):
determinism with a fixed seed, fit-before-transform ValueError, OOV
ValueError, vector shape; neighborhood coherence on the golden corpora."""

import math

import pytest

from pyrdf2vec_spark.embed import SparkWord2Vec
from pyrdf2vec_spark.graph import SparkKG
from pyrdf2vec_spark.walks import bfs_walks, canonicalize_walks
from tests.conftest import ROOTS, URL


@pytest.fixture(scope="module")
def corpus(spark, kg_loop, roots):
    return canonicalize_walks(bfs_walks(kg_loop, roots, 2), [], 8, keep_root=True)


class TestWord2Vec:
    def test_determinism(self, spark, corpus):
        # same seed, two fits → identical vectors (test_word2vec.py:86-98)
        ents = spark.createDataFrame([(r,) for r in ROOTS], "word string")
        v1 = {
            r["word"]: list(r["vector"])
            for r in SparkWord2Vec(vector_size=16, seed=42)
            .fit(corpus, deterministic=True)
            .transform(ents)
            .collect()
        }
        v2 = {
            r["word"]: list(r["vector"])
            for r in SparkWord2Vec(vector_size=16, seed=42)
            .fit(corpus, deterministic=True)
            .transform(ents)
            .collect()
        }
        assert v1 == v2

    def test_fit_produces_vectors_for_roots(self, spark, corpus):
        w2v = SparkWord2Vec(vector_size=8, seed=1).fit(corpus)
        words = {r["word"] for r in w2v.vectors().collect()}
        for root in ROOTS:
            assert root in words

    def test_transform_before_fit_raises(self, spark):
        ents = spark.createDataFrame([(ROOTS[0],)], "word string")
        with pytest.raises(ValueError):
            SparkWord2Vec().transform(ents)

    def test_oov_raises(self, spark, corpus):
        w2v = SparkWord2Vec(vector_size=8).fit(corpus)
        ents = spark.createDataFrame([(f"{URL}#Nobody",)], "word string")
        with pytest.raises(ValueError):
            w2v.transform(ents)

    def test_vector_size(self, spark, corpus):
        w2v = SparkWord2Vec(vector_size=24).fit(corpus)
        row = w2v.vectors().first()
        assert len(row["vector"]) == 24

    def test_fasttext_hash_replica(self):
        # exact FNV-1a replica of fasttext.py:201-215 (unbounded ints)
        from pyrdf2vec_spark.embed import compute_ngrams_bytes, ft_hash_bytes

        h = 2166136261
        for b in b"Alice":
            h = (h ^ b) * 16777619
        assert ft_hash_bytes(b"Alice") == h
        assert compute_ngrams_bytes("http://x#Alice") == [b"http://x", b"Alice"]
        assert compute_ngrams_bytes("plain") == [b"plain"]

    def test_fasttext_oov_pooling(self, spark, corpus):
        from pyrdf2vec_spark.embed import SparkFastText

        ft = SparkFastText(vector_size=8, seed=5).fit(corpus)
        # in-vocab word → word vector identical to the Word2Vec layer
        ents = spark.createDataFrame([(ROOTS[0],)], "word string")
        wv = {r["word"]: list(r["vector"]) for r in ft._w2v.transform(ents).collect()}
        got = {r["word"]: list(r["vector"]) for r in ft.transform(ents).collect()}
        assert got == wv
        # OOV URI sharing the http://pyRDF2Vec prefix pools a non-zero
        # vector through the shared '#'-segment bucket
        oov = spark.createDataFrame([(f"{URL}#Zelda",)], "word string")
        row = ft.transform(oov).first()
        assert row is not None
        assert any(abs(x) > 0 for x in row["vector"])

    def test_fasttext_oov_uses_trained_bucket_vectors(self, spark, corpus):
        # joint-ish training (E3 fidelity): the OOV vector must be the
        # mean of TRAINED bucket vectors, not a post-hoc pool of word
        # vectors. '#Zelda' hits exactly one trained bucket (the shared
        # 'http://pyRDF2Vec' segment; the 'Zelda' segment bucket never
        # appeared in the corpus → zero), so vec == bucket_vec / 2.
        from pyrdf2vec_spark.embed import SparkFastText, ft_ngram_buckets

        ft = SparkFastText(vector_size=8, seed=5).fit(corpus)
        prefix_bucket = ft_ngram_buckets(URL, ft.bucket)[0]
        bv = {
            r["bucket"]: list(r["bucket_vec"])
            for r in ft._bucket_vecs.collect()
        }
        assert prefix_bucket in bv  # the bucket token really was trained
        oov = spark.createDataFrame([(f"{URL}#Zelda",)], "word string")
        got = list(ft.transform(oov).first()["vector"])
        expect = [x / 2 for x in bv[prefix_bucket]]
        assert got == pytest.approx(expect, abs=1e-6)

    def test_save_load_roundtrip(self, spark, corpus, tmp_path):
        w2v = SparkWord2Vec(vector_size=8, seed=3).fit(corpus)
        p = str(tmp_path / "w2v_model")
        w2v.save(p)
        loaded = SparkWord2Vec().load(p)
        a = {r["word"]: list(r["vector"]) for r in w2v.vectors().collect()}
        b = {r["word"]: list(r["vector"]) for r in loaded.vectors().collect()}
        assert a == b
