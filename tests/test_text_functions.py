"""chunk_documents edge cases: window arithmetic, overlap, coverage.
The hash-exact DuckDB oracle (`text_chunks`) covers the bulk
semantics; these pin the boundary behavior."""

import pytest

from pyrdf2vec_spark.functions.text import chunk_documents


def _chunks(spark, text, chunk_words, overlap_words):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(df, chunk_words, overlap_words).collect()
    return sorted(
        (r["chunk_idx"], r["chunk_text"], r["n_chunk_words"]) for r in rows
    )


class TestChunkDocuments:
    def test_exact_multiple(self, spark):
        text = " ".join(f"w{i}" for i in range(8))
        got = _chunks(spark, text, chunk_words=4, overlap_words=1)
        # stride 3: starts 1,4,7 → windows [0:4],[3:7],[6:8]
        assert got == [
            (0, "w0 w1 w2 w3", 4),
            (1, "w3 w4 w5 w6", 4),
            (2, "w6 w7", 2),
        ]

    def test_overlap_invariant(self, spark):
        words = [f"t{i}" for i in range(50)]
        got = _chunks(spark, " ".join(words), 8, 3)
        for (i1, c1, _), (i2, c2, _) in zip(got, got[1:]):
            assert i2 == i1 + 1
            # consecutive chunks share exactly overlap_words words
            assert c1.split()[-3:] == c2.split()[:3]
        # every word appears in some chunk, in order
        stitched = got[0][1].split()
        for _, c, _ in got[1:]:
            stitched.extend(c.split()[3:])
        assert stitched == words

    def test_short_doc_single_chunk(self, spark):
        assert _chunks(spark, "only three words", 64, 16) == [
            (0, "only three words", 3)
        ]

    def test_zero_overlap(self, spark):
        got = _chunks(spark, "a b c d e", 2, 0)
        assert got == [(0, "a b", 2), (1, "c d", 2), (2, "e", 1)]

    def test_invalid_params_raise(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, 4, 4)
        with pytest.raises(ValueError):
            chunk_documents(df, 4, -1)


class TestRedactPii:
    def _one(self, spark, text, **kw):
        from pyrdf2vec_spark.functions.text import redact_pii

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = redact_pii(df, **kw).first()
        return r["text_redacted"], r["n_redactions"]

    def test_masks_each_kind(self, spark):
        txt = ("mail bob@example.com or call +1 (555) 123-4567, "
               "see https://ex.com/a?b=1 pay 4111-1111-1111-1111 now")
        out, n = self._one(spark, txt)
        assert "<EMAIL>" in out and "<PHONE>" in out
        assert "<URL>" in out and "<CARD>" in out
        assert "bob@example.com" not in out
        assert "4111" not in out
        assert n == 4

    def test_url_digits_not_double_counted(self, spark):
        # the URL's digit run must not also count as a phone: counts
        # run on the progressively masked text
        out, n = self._one(spark, "go to https://x.io/5551234567 now")
        assert out == "go to <URL> now"
        assert n == 1

    def test_kind_subset_and_unknown_raise(self, spark):
        import pytest as _pytest

        out, n = self._one(
            spark, "bob@example.com and https://x.io", kinds=["email"]
        )
        assert out == "<EMAIL> and https://x.io" and n == 1
        with _pytest.raises(ValueError, match="unknown redaction kinds"):
            self._one(spark, "x", kinds=["ssn"])

    def test_clean_text_untouched(self, spark):
        out, n = self._one(spark, "no sensitive content here")
        assert out == "no sensitive content here" and n == 0

    def test_matches_python_re_mirror(self, spark):
        # the property tests (test_properties.py) pin the masking-chain
        # invariants on a pure-Python re mirror; this differential pins
        # the Spark expressions to that same mirror
        import re

        from pyrdf2vec_spark.functions.text import (
            _REDACT_PATTERNS,
            redact_pii,
        )

        texts = [
            "bob@example.com https://ex.com/a?b=1 +1 (555) 123-4567",
            "pay 4111-1111-1111-1111 or 4111 1111 1111 1111",
            "clean text, nothing here",
            "edge a@b 5551234 http://localhost:8080/p <URL>",
        ]

        def mirror(t):
            for k, pat in _REDACT_PATTERNS.items():
                t = re.sub(pat, f"<{k.upper()}>", t)
            return t

        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r["text_redacted"]
            for r in redact_pii(df).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == mirror(t), (got[i], mirror(t))
