"""Deduplication operators for training-data pipelines: exact hash,
word-shingle Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale shapes: exact dedup is one hash-groupBy; shingle Jaccard is an
inverted-index self-join (join on shingle, never all-pairs); MinHash+LSH
is band-bucket blocking (linear) and SimHash is a 16-bit
explode/agg/bitwise pipeline — all shuffle-bounded, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact duplicate groups by md5(text): one hash aggregation.
    (text_hash, n_dups, keep_id) — keep_id = min doc_id of the group."""
    return (
        documents.select("doc_id", F.md5("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").alias("keep_id"),
        )
    )


def _word_shingles(k: int = 3):
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(1, "
        f"size(split(trim(lower(text)), ' +')) - {k - 1})), "
        f"i -> array_join(slice(split(trim(lower(text)), ' +'), i, {k}), ' ')))"
    )


def ngram_jaccard_pairs(
    documents: DataFrame, k: int = 3, threshold: float = 0.4
) -> DataFrame:
    """Near-dup pairs by word k-gram Jaccard via inverted-index
    self-join: explode shingles → join on shingle → count common →
    |A∩B| / (|A|+|B|−|A∩B|). Quadratic only within a shingle's posting
    list, not globally."""
    sh = documents.select(
        "doc_id", _word_shingles(k).alias("shingles")
    ).withColumn("n_sh", F.size("shingles"))
    posts = sh.select("doc_id", "n_sh", F.explode("shingles").alias("s"))
    a = posts.select(
        F.col("doc_id").alias("a"), F.col("n_sh").alias("na"), "s"
    )
    b = posts.select(
        F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"), "s"
    )
    common = (
        a.join(b, "s")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b", "na", "nb")
        .agg(F.count("*").alias("common"))
    )
    return common.select(
        "a",
        "b",
        F.round(
            F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6
        ).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)


def minhash_dedup_pairs(
    documents: DataFrame,
    num_hashes: int = 12,
    band_size: int = 2,
    jaccard_threshold: float = 0.5,
    shingle_words: int = 3,
) -> DataFrame:
    """MinHash+LSH near-dup blocking over document texts — the
    canonicalization LSH core (integer min-hash permutations,
    band-bucket join, exact-Jaccard verify) over WORD k-gram shingles
    (char n-grams are the right unit for short surface forms, word
    k-grams for documents — far more discriminative)."""
    from pyrdf2vec_spark.canon import lsh_pairs

    word_hashes = (
        documents.select(F.col("text").alias("name"))
        .distinct()
        .select(
            "name",
            F.explode(
                F.expr(
                    f"array_distinct(transform(sequence(1, greatest(1, "
                    f"size(split(trim(lower(name)), ' +')) - {shingle_words - 1})), "
                    f"i -> array_join(slice(split(trim(lower(name)), ' +'), i, {shingle_words}), ' ')))"
                )
            ).alias("s"),
        )
        .select(
            "name",
            F.conv(F.substring(F.md5("s"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("h"),
        )
        .distinct()
    )
    pairs = lsh_pairs(
        word_hashes,
        num_hashes=num_hashes,
        band_size=band_size,
        jaccard_threshold=jaccard_threshold,
    )
    ids = documents.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    return (
        pairs.join(ids.withColumnRenamed("text", "a"), "a")
        .withColumnRenamed("doc_id", "doc_a")
        .join(ids.withColumnRenamed("text", "b"), "b")
        .withColumnRenamed("doc_id", "doc_b")
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(documents: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash document signatures (bit-majority over token hashes).

    Token hash = 60-bit int from md5 hex (engine-independent); bit b of
    the signature is 1 when the majority of tokens set it. Explode
    tokens × extract bits with integer ops, then one groupBy — scales
    as n_tokens × bits rows, shuffle-bounded.
    """
    toks = documents.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.lower(F.col("text"))), " +"))
        ).alias("tok"),
    ).withColumn(
        "h", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
    )
    bit_votes = toks.select(
        "doc_id",
        *[
            (
                (F.shiftright(F.col("h"), b) % 2) * 2 - 1
            ).alias(f"b{b}")
            for b in range(bits)
        ],
    )
    agg = bit_votes.groupBy("doc_id").agg(
        *[F.sum(f"b{b}").alias(f"s{b}") for b in range(bits)]
    )
    sig = agg.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"s{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
                for b in range(bits)
            ],
            F.lit(0),
        ).cast("bigint").alias("simhash"),
    )
    return sig


def simhash_pairs(
    documents: DataFrame, bits: int = 16, max_hamming: int = 2
) -> DataFrame:
    """Near-dup candidates whose SimHash differs in ≤ max_hamming bits.
    Blocked by the signature's two halves (a pair within distance 2 of
    a 16-bit hash shares at least one half) — avoids the all-pairs join."""
    sig = simhash(documents, bits).persist()
    half = bits // 2
    lo = sig.select(
        "doc_id", "simhash", (F.col("simhash") % (2**half)).alias("block")
    ).withColumn("which", F.lit(0))
    hi = sig.select(
        "doc_id", "simhash",
        F.shiftright(F.col("simhash"), half).alias("block"),
    ).withColumn("which", F.lit(1))
    blocks = lo.unionByName(hi)
    a = blocks.select(
        F.col("doc_id").alias("a"), F.col("simhash").alias("ha"),
        "block", "which",
    )
    b = blocks.select(
        F.col("doc_id").alias("b"), F.col("simhash").alias("hb"),
        "block", "which",
    )
    cand = (
        a.join(b, ["block", "which"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
    )
    xor = F.expr("ha ^ hb")
    hamming = sum(
        [(F.shiftright(xor, i) % 2) for i in range(bits)], F.lit(0)
    )
    out = cand.withColumn("hamming", hamming.cast("int")).where(
        F.col("hamming") <= max_hamming
    ).select("a", "b", "hamming")
    return out


def embedding_neardup_pairs(
    embeddings: DataFrame, threshold: float = 0.98, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicates above a threshold. Exact
    variant: all-pairs restricted by a coarse LSH sign-bucket (first
    two components' signs) to bound the join; at 100 TB swap the
    blocking for the IVF path in similarity.py."""
    e = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.expr(
            f"concat(CAST({vec_col}[0] >= 0 AS STRING), "
            f"CAST({vec_col}[1] >= 0 AS STRING))"
        ).alias("block"),
    )
    a = e.select(F.col("id").alias("a"), F.col("v").alias("va"), "block")
    b = e.select(F.col("id").alias("b"), F.col("v").alias("vb"), "block")
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
    return (
        a.join(b, "block")
        .where(F.col("a") < F.col("b"))
        .withColumn("cosine", dot / (na * nb))
        .where(F.col("cosine") >= threshold)
        .select("a", "b", F.round("cosine", 6).alias("cosine"))
    )
