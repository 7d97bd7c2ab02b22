"""Dedup operator tests: SimHash banding soundness (the pigeonhole
guarantee the old two-half blocking lacked), brute-force recall
differential, and 64-bit signature support."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from pyrdf2vec_spark.functions.dedup import (
    exact_dedup,
    simhash,
    simhash_band_widths,
    simhash_pairs,
    simhash_pairs_from_signatures,
)


def _rand_docs(spark, n=160, seed=1234):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    rows = [
        (i, " ".join(rng.sample(vocab, rng.randint(4, 9))))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBandWidths:
    def test_partition_of_bits(self):
        for bits, mh in [(16, 1), (16, 2), (16, 3), (64, 2), (64, 7)]:
            bands = simhash_band_widths(bits, mh)
            assert len(bands) == mh + 1
            covered = []
            for start, width in bands:
                covered.extend(range(start, start + width))
            assert covered == list(range(bits))

    def test_pigeonhole_guarantee_exhaustive(self):
        # every ≤2-flip pattern on 16 bits leaves at least one of the
        # 3 bands untouched; the 2-half scheme fails this for 1+1 splits
        bands = simhash_band_widths(16, 2)
        for flips in itertools.chain(
            itertools.combinations(range(16), 1),
            itertools.combinations(range(16), 2),
        ):
            untouched = [
                (s, w)
                for s, w in bands
                if not any(s <= f < s + w for f in flips)
            ]
            assert untouched, f"no safe band for flips {flips}"

    def test_too_many_bands_raises(self):
        with pytest.raises(ValueError):
            simhash_band_widths(4, 4)


class TestSimhashPairs:
    def test_full_recall_vs_brute_force_h2(self, spark):
        # blocking must find EVERY pair within distance 2 — differential
        # against the unblocked all-pairs computation
        docs = _rand_docs(spark)
        sig = {
            r["doc_id"]: r["simhash"]
            for r in simhash(docs, bits=16).collect()
        }
        expect = {
            (a, b, bin(sig[a] ^ sig[b]).count("1"))
            for a, b in itertools.combinations(sorted(sig), 2)
            if bin(sig[a] ^ sig[b]).count("1") <= 2
        }
        got = {
            (r["a"], r["b"], r["hamming"])
            for r in simhash_pairs(docs, bits=16, max_hamming=2).collect()
        }
        assert got == expect
        # the regression this guards: at least one found pair has its two
        # flipped bits split across the 8/8 halves, so NEITHER half
        # matches — the old two-half blocking silently dropped it
        split_pairs = [
            (a, b)
            for a, b, h in expect
            if h == 2
            and (sig[a] & 0xFF) != (sig[b] & 0xFF)
            and (sig[a] >> 8) != (sig[b] >> 8)
        ]
        assert split_pairs, "corpus seed no longer produces a 1+1 split"

    def test_h1_subset_of_h2(self, spark):
        docs = _rand_docs(spark, n=80, seed=7)
        h1 = {
            (r["a"], r["b"])
            for r in simhash_pairs(docs, bits=16, max_hamming=1).collect()
        }
        h2 = {
            (r["a"], r["b"])
            for r in simhash_pairs(docs, bits=16, max_hamming=2).collect()
        }
        assert h1 <= h2

    def test_64bit_signatures(self, spark):
        docs = _rand_docs(spark, n=50, seed=99)
        rows = simhash(docs, bits=64).collect()
        assert len(rows) == 50
        # high bits actually vary (bit 63 may be set → negative bigint)
        highs = {r["simhash"] >> 48 & 0xFFFF for r in rows}
        assert len(highs) > 1
        pairs = simhash_pairs(docs, bits=64, max_hamming=3)
        assert pairs.columns == ["a", "b", "hamming"]
        assert all(r["hamming"] <= 3 for r in pairs.collect())

    def test_64bit_sign_bit_band0(self, spark):
        # Regression for the signed-% banding bug: with bits=64 a
        # signature with bit 63 set made band 0's block negative under
        # Spark's sign-preserving %, so a pair whose ONLY untouched band
        # is band 0 fell into different buckets and was dropped. Craft
        # exactly that: bit 63 set on both, the two flips both outside
        # band 0 (one in each of bands 1 and 2 of the 22/21/21 split).
        base = -(2**63) | 0x0000_0055_5555_5555  # bit 63 set
        bands = simhash_band_widths(64, 2)
        b1_start, b2_start = bands[1][0], bands[2][0]
        other = base ^ (1 << b1_start) ^ (1 << b2_start)
        sig = spark.createDataFrame(
            [(1, base), (2, other), (3, 7)],
            "doc_id long, simhash long",
        )
        got = {
            (r["a"], r["b"], r["hamming"])
            for r in simhash_pairs_from_signatures(sig, 64, 2).collect()
        }
        assert (1, 2, 2) in got
        # distance-0 self-band sanity: far doc 3 pairs with neither
        assert not any(3 in (a, b) for a, b, _ in got)

    def test_64bit_full_recall_vs_brute_force(self, spark):
        # brute-force differential entirely at bits=64 — covers every
        # band's sign-free extraction, not just band 0
        rng = random.Random(42)
        vals = []
        for i in range(60):
            v = rng.getrandbits(64)
            vals.append((i, v - 2**64 if v >= 2**63 else v))
        sig_map = dict(vals)
        sig = spark.createDataFrame(vals, "doc_id long, simhash long")
        expect = {
            (a, b, bin((sig_map[a] ^ sig_map[b]) & (2**64 - 1)).count("1"))
            for a, b in itertools.combinations(sorted(sig_map), 2)
            if bin((sig_map[a] ^ sig_map[b]) & (2**64 - 1)).count("1") <= 40
        }
        got = {
            (r["a"], r["b"], r["hamming"])
            for r in simhash_pairs_from_signatures(
                sig, 64, 40
            ).collect()
        }
        assert got == expect

    def test_16bit_signature_matches_legacy_sum_form(self, spark):
        # OR-assembly must equal the old arithmetic sum for bits < 63
        docs = _rand_docs(spark, n=30, seed=5)
        rows = simhash(docs, bits=16).collect()
        assert all(0 <= r["simhash"] < 2**16 for r in rows)


class TestDedupComponents:
    def test_exact_near_and_transitive(self, spark):
        from pyrdf2vec_spark.functions.dedup import dedup_components

        base = "the quick brown fox jumps over the lazy dog again and again"
        docs = spark.createDataFrame(
            [
                (0, base),
                (1, base),  # exact dup of 0
                (2, base + " extra"),  # near-dup of 0/1
                (3, base + " extra words here"),  # near-dup of 2 (chain)
                (4, "completely different content with nothing shared at all ok"),
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["component_id"]
            for r in dedup_components(
                docs, jaccard_threshold=0.5
            ).collect()
        }
        # 0-3 collapse transitively into one cluster rooted at 0
        assert got[0] == got[1] == got[2] == got[3] == 0
        assert got[4] == 4  # singleton keeps itself


class TestExactDedup:
    def test_groups(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "c")],
            "doc_id long, text string",
        )
        got = {
            (r["n_dups"], r["keep_id"]) for r in exact_dedup(docs).collect()
        }
        assert got == {(2, 1), (1, 3)}


class TestDecontaminate:
    def test_planted_leak_and_partial_overlap(self, spark):
        from pyrdf2vec_spark.functions.dedup import decontaminate

        # bench b1 fully contained in doc 1 (plus extra words — the
        # benchmark-relative ratio must still read 1.0); bench b2
        # half-overlaps doc 2; doc 3 is disjoint
        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta eta"),
                (2, "one two three four nine ten eleven twelve"),
                (3, "completely different words here entirely"),
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [
                (101, "alpha beta gamma delta epsilon"),
                (102, "one two three four five six seven eight"),
            ],
            "bench_id long, text string",
        )
        got = {
            (r["doc_id"], r["bench_id"]): r["overlap_ratio"]
            for r in decontaminate(docs, bench, k=3, threshold=0.3).collect()
        }
        # b1: 3 trigrams, all present in doc 1 → 1.0
        assert got[(1, 101)] == pytest.approx(1.0)
        # b2: 6 trigrams; doc 2 shares exactly "one two three",
        # "two three four" → 2/6
        assert got[(2, 102)] == pytest.approx(round(2 / 6, 6))
        # disjoint doc and sub-threshold pairs emit nothing
        assert set(got) == {(1, 101), (2, 102)}

    def test_threshold_filters(self, spark):
        from pyrdf2vec_spark.functions.dedup import decontaminate

        docs = spark.createDataFrame(
            [(1, "one two three four nine ten eleven twelve")],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(101, "one two three four five six seven eight")],
            "bench_id long, text string",
        )
        assert (
            decontaminate(docs, bench, k=3, threshold=0.5).count() == 0
        )

    def test_short_text_single_shingle(self, spark):
        # texts shorter than k collapse to one whole-text shingle
        # (the _word_shingles greatest(1, ...) rule) — exact equality
        # still reads as full contamination
        from pyrdf2vec_spark.functions.dedup import decontaminate

        docs = spark.createDataFrame(
            [(1, "tiny text")], "doc_id long, text string"
        )
        bench = spark.createDataFrame(
            [(201, "tiny text")], "bench_id long, text string"
        )
        rows = decontaminate(docs, bench, k=5, threshold=0.9).collect()
        assert [(r["doc_id"], r["bench_id"], r["overlap_ratio"]) for r in rows] == [
            (1, 201, 1.0)
        ]
