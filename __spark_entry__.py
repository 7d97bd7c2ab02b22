"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG→walks→Word2Vec pipeline on
sf0.001; every ``queries()`` entry is one implemented operator from
SURVEY.md §2 (or a training-data operator), and ``oracle_sql()`` gives
its DuckDB twin over the same parquet views. Column names and rounding
are aligned on both sides for the driver's order-insensitive value-hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyrdf2vec_spark.graph import SparkKG
from pyrdf2vec_spark.sources.tpch_graph import (
    TPCH_EDGES_SQL,
    TPCH_TRIPLES_SQL,
    load_tables,
    tpch_triples,
)

_KG_CACHE: dict[str, SparkKG] = {}


def _kg(spark: SparkSession, sf_dir: str) -> SparkKG:
    kg = _KG_CACHE.get(sf_dir)
    if kg is None:
        kg = SparkKG(tpch_triples(load_tables(spark, sf_dir)))
        _KG_CACHE[sf_dir] = kg
    return kg


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _customer_seeds(kg: SparkKG) -> DataFrame:
    return kg.entity_names().where(F.col("name").startswith("c:"))


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: TPC-H-derived KG → BFS depth-2 walks from
    customer entities → md5 canonicalization → MLlib Word2Vec →
    per-entity embeddings."""
    from pyrdf2vec_spark.embed import SparkWord2Vec
    from pyrdf2vec_spark.walks import bfs_canonical_walks

    kg = _kg(spark, "/root/testdata/sf0.001")
    seeds = _customer_seeds(kg)
    walks = bfs_canonical_walks(kg, seeds, 2, md5_bytes=8, keep_root=True)
    w2v = SparkWord2Vec(vector_size=32, seed=42).fit(walks)
    return w2v.transform(seeds)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------
def _q_kg_triples(spark, sf):
    return tpch_triples(load_tables(spark, sf))


def _q_kg_edges(spark, sf):
    return _kg(spark, sf).edges


def _q_kg_vertices(spark, sf):
    return _kg(spark, sf).vertices()


def _q_kg_hops_customers(spark, sf):
    return _kg(spark, sf).edges.where(F.col("src").startswith("c:"))


def _q_kg_hops_reverse_nations(spark, sf):
    # parents of nation vertices (kg.get_hops is_reverse semantics)
    return _kg(spark, sf).edges.where(F.col("dst").startswith("n:")).select(
        F.col("dst").alias("node"), "pred", F.col("src").alias("parent")
    )


def _q_kg_bfs_depth2(spark, sf):
    from pyrdf2vec_spark.walks import bfs_walks

    kg = _kg(spark, sf)
    walks = bfs_walks(kg, _customer_seeds(kg), 2)
    return walks.select(
        "entity", F.array_join("walk", "->").alias("walk_str")
    )


def _q_kg_existence(spark, sf):
    kg = _kg(spark, sf)
    probe = _customer_seeds(kg).union(
        spark.createDataFrame([("c:-1",), ("ghost:99",)], "name string")
    )
    return kg.missing_entities(probe).select("name")


def _q_kg_literal_chain(spark, sf):
    kg = _kg(spark, sf)
    return kg.pliterals(
        _customer_seeds(kg), ["in_nation", "has_name"]
    ).select(F.col("entity"), F.col("value"))


def _q_sampler_objfreq(spark, sf):
    return _kg(spark, sf).edges.groupBy("dst").agg(
        F.count("*").alias("weight")
    )


def _q_sampler_predfreq(spark, sf):
    return _kg(spark, sf).edges.groupBy("pred").agg(
        F.count("*").alias("weight")
    )


def _q_sampler_objpredfreq(spark, sf):
    return _kg(spark, sf).edges.groupBy("pred", "dst").agg(
        F.count("*").alias("weight")
    )


def _q_sampler_wide(spark, sf):
    from pyrdf2vec_spark.samplers import edge_weights

    return edge_weights(_kg(spark, sf), "wide").select(
        "src", "pred", "dst", F.round("weight", 4).alias("weight")
    )


def _q_sampler_norm_objfreq(spark, sf):
    from pyrdf2vec_spark.samplers import edge_weights, normalize_hop_weights

    w = edge_weights(_kg(spark, sf), "objfreq")
    return normalize_hop_weights(w, ["src"]).select(
        "src", "pred", "dst", F.round("norm_weight", 6).alias("norm_weight")
    )


def _q_split_degrees(spark, sf):
    from pyrdf2vec_spark.samplers import split_degrees

    return split_degrees(_kg(spark, sf))


def _q_pagerank(spark, sf):
    # fixed 20 iterations (tol=0) so the DuckDB unrolled-CTE oracle
    # replicates the exact same computation
    from pyrdf2vec_spark.samplers import pagerank

    return pagerank(_kg(spark, sf), alpha=0.85, max_iter=20, tol=0.0).select(
        "name", F.round("rank", 6).alias("rank")
    )


def _q_community_labels(spark, sf):
    # W13: deterministic 5-round label propagation over the undirected
    # entity graph — the community family's own oracle row (the
    # walkers' sampling layers stay covered by the hop_prob=0 ≡
    # sampled_walks differential and unit tests)
    from pyrdf2vec_spark.walks import community_labels

    return community_labels(_kg(spark, sf), iterations=5)


def _q_community_sampled_walks(spark, sf):
    # W13 teleport walker at hop_prob > 0 (community.py:187-250): the
    # race, coin, and member draws run portable-hash (md5) so the
    # DuckDB unrolled replica — over the SAME LPA label table oracled
    # by community_labels — reproduces the walk set bit-for-bit
    from pyrdf2vec_spark.walks import community_sampled_walks

    kg = _kg(spark, sf)
    w = community_sampled_walks(
        kg, _customer_seeds(kg), 2, 3, hop_prob=0.15, sampler="uniform",
        seed=42, lpa_iterations=5, algorithm="lpa", portable_hash=True,
    )
    return w.select("entity", F.array_join("walk", "->").alias("walk_str"))


def _q_walks_dfs(spark, sf):
    # order seeds (real branching: placed_by + one contains edge per
    # lineitem) with the engine-portable md5 hash so the weighted draw
    # is replicated exactly by the DuckDB oracle
    from pyrdf2vec_spark.walks import sampled_walks

    kg = _kg(spark, sf)
    seeds = kg.entity_names().where(F.col("name").startswith("o:"))
    return sampled_walks(
        kg, seeds, 2, 3, sampler="objfreq", seed=42, portable_hash=True
    ).select("entity", F.array_join("walk", "->").alias("walk_str"))


def _q_walks_dfs_canonical(spark, sf):
    # fused sampled-DFS + md5 tokenization (no driver-side seed
    # collect); same portable-hash draws as walks_dfs_sampled, so the
    # oracle is the same unrolled replica with md5-repr'd hop vertices
    from pyrdf2vec_spark.walks import dfs_canonical_walks

    kg = _kg(spark, sf)
    seeds = kg.entity_names().where(F.col("name").startswith("o:"))
    return dfs_canonical_walks(
        kg, seeds, 2, 3, md5_bytes=8, sampler="objfreq", seed=42,
        portable_hash=True,
    ).select("entity", F.array_join("walk", "->").alias("walk_str"))


def _q_wl_labels(spark, sf):
    from pyrdf2vec_spark.walks import wl_labels

    return wl_labels(_kg(spark, sf), 1)


def _q_walk_walklet(spark, sf):
    from pyrdf2vec_spark.walks import bfs_walks, walklet_walks

    kg = _kg(spark, sf)
    w = walklet_walks(bfs_walks(kg, _customer_seeds(kg), 2))
    return w.select("entity", F.array_join("walk", "->").alias("walk_str"))


def _q_walk_halk(spark, sf):
    from pyrdf2vec_spark.walks import bfs_walks, halk_walks

    kg = _kg(spark, sf)
    w = halk_walks(bfs_walks(kg, _customer_seeds(kg), 2), [0.2, 0.3])
    return w.select("entity", F.array_join("walk", "->").alias("walk_str"))


def _q_walk_halk_reverse(spark, sf):
    # HALK with_reverse over depth-1 combined walks from customers ∪
    # nations: placed_by's corpus support (~0.82) sits between the two
    # thresholds, so at 0.9 the first predicate of customer walks is
    # SKIPPED and the un-incremented j pairs in_nation with ITSELF —
    # the reference's index-shift quirk, oracle-checked
    from pyrdf2vec_spark.walks import (
        bfs_walks,
        combine_with_reverse,
        halk_walks,
    )

    kg = _kg(spark, sf)
    seeds = kg.entity_names().where(F.col("name").rlike("^(c|n):"))
    comb = combine_with_reverse(
        bfs_walks(kg, seeds, 1), bfs_walks(kg, seeds, 1, is_reverse=True)
    )
    w = halk_walks(comb, [0.5, 0.9], with_reverse=True)
    return w.select("entity", F.array_join("walk", "->").alias("walk_str"))


def _q_walk_ngram(spark, sf):
    from pyrdf2vec_spark.walks import bfs_walks, ngram_walks

    kg = _kg(spark, sf)
    w = ngram_walks(bfs_walks(kg, _customer_seeds(kg), 2), grams=3)
    return w.select("entity", F.array_join("walk", "->").alias("walk_str"))


def _q_walk_with_reverse(spark, sf):
    # W4: per-entity cartesian rev[:-1] + fwd, root centered — combined
    # depth-1 customer walks [order, placed_by, c, in_nation, n]
    from pyrdf2vec_spark.walks import bfs_walks, combine_with_reverse

    kg = _kg(spark, sf)
    seeds = _customer_seeds(kg)
    comb = combine_with_reverse(
        bfs_walks(kg, seeds, 1), bfs_walks(kg, seeds, 1, is_reverse=True)
    )
    return comb.select("entity", F.array_join("walk", "->").alias("walk_str"))


def _q_walk_anonymous(spark, sf):
    # W7: first-occurrence-of-name indexing. The TPC-H customer walk
    # vocabulary is repeat-free, so every walk maps to [root,1,2,3,4] —
    # degenerate by construction (this gate checks the plumbing and the
    # no-repeat assumption; the repeat semantics are pinned by the LOOP
    # exact-set unit tests, anonymous.py:50-60 rule)
    from pyrdf2vec_spark.walks import anonymous_walks, bfs_walks

    kg = _kg(spark, sf)
    w = anonymous_walks(bfs_walks(kg, _customer_seeds(kg), 2))
    return w.select("entity", F.array_join("walk", "->").alias("walk_str"))


def _q_walk_split(spark, sf):
    # SplitWalker over customer depth-2 walks: ':'-id vertices split
    # into (prefix, digits), predicates ride verbatim-lowered, nation
    # names split on spaces; nation id '0' vs region id '0' exercises
    # the order-preserving dict(zip) dedup
    from pyrdf2vec_spark.walks import bfs_walks, split_walks

    kg = _kg(spark, sf)
    w = split_walks(bfs_walks(kg, _customer_seeds(kg), 2))
    return w.select("entity", F.array_join("walk", "->").alias("walk_str"))


def _q_walk_wl_depth1(spark, sf):
    from pyrdf2vec_spark.walks import wl_walks

    kg = _kg(spark, sf)
    w = wl_walks(kg, _customer_seeds(kg), 1, wl_iterations=1)
    return w.select("entity", F.array_join("walk", "->").alias("walk_str"))


def _q_text_token_stats(spark, sf):
    from pyrdf2vec_spark.functions.text import token_stats

    return token_stats(_docs(spark, sf))


def _q_text_quality(spark, sf):
    from pyrdf2vec_spark.functions.text import quality_scores

    return quality_scores(_docs(spark, sf))


def _q_text_langid(spark, sf):
    from pyrdf2vec_spark.functions.text import language_id

    return language_id(_docs(spark, sf))


def _q_text_fingerprint(spark, sf):
    # rotated OUT of the 50-row driver budget in round 6 (scan-only op,
    # stable pytest goldens) to give redact_pii its first hard driver
    # signal — rotation policy in STATUS.md; returns in a later round
    from pyrdf2vec_spark.functions.text import fingerprints

    return fingerprints(_docs(spark, sf))


def _q_redact_pii(spark, sf):
    # PII-laden text is INJECTED deterministically around each doc (the
    # synthetic corpus carries no emails/urls, and an all-zero
    # n_redactions row would certify nothing about the masking): one
    # url + email + card + phone per row, then the real text body
    from pyrdf2vec_spark.functions.text import redact_pii

    docs = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.lit("see https://ex.com/"),
            F.col("doc_id").cast("string"),
            F.lit("?q=1 mail u"),
            F.col("doc_id").cast("string"),
            F.lit("@ex-mail.org call +1 415-555-"),
            F.lpad(F.pmod("doc_id", F.lit(10000)).cast("string"), 4, "0"),
            F.lit(" card 4242 4242 4242 4242 :: "),
            F.col("text"),
        ).alias("text"),
    )
    return redact_pii(docs)


def _q_decontaminate(spark, sf):
    # test-set-leakage scrub: every ~89th document doubles as a held-out
    # "benchmark" row, so the expected output is the planted self-leaks
    # (ratio 1.0) plus any real near-dups of those docs in the corpus
    from pyrdf2vec_spark.functions.dedup import decontaminate

    docs = _docs(spark, sf)
    bench = docs.where(F.pmod("doc_id", F.lit(89)) == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return decontaminate(docs, bench, k=3, threshold=0.5)


def _q_text_chunks(spark, sf):
    # sliding-window chunking (64-word windows, 16-word overlap) — the
    # training/embedding prep step; pure Catalyst, partition-local
    from pyrdf2vec_spark.functions.text import chunk_documents

    return chunk_documents(
        _docs(spark, sf).where(F.col("doc_id") < 300),
        chunk_words=64,
        overlap_words=16,
    )


def _q_embed_quantized(spark, sf):
    # int8 symmetric quantization; qvec serialized via array_join so
    # the value hash is engine-independent (list reprs differ)
    from pyrdf2vec_spark.functions.similarity import quantize_embeddings

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    return quantize_embeddings(emb.where(F.col("vec_id") < 200)).select(
        "vec_id",
        F.array_join("qvec", ",").alias("qvec_csv"),
        F.round("scale", 6).alias("scale_r"),
    )


def _q_embed_quantized_topk(spark, sf):
    from pyrdf2vec_spark.functions.similarity import quantized_topk

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    return quantized_topk(emb, emb.where(F.col("vec_id") < 10), k=5)


def _q_dedup_components(spark, sf):
    # exact links + MinHash-LSH pairs -> connected components; the
    # oracle closes the same edge set with a recursive CTE
    from pyrdf2vec_spark.functions.dedup import dedup_components

    return dedup_components(_docs(spark, sf).where(F.col("doc_id") < 400))


def _q_dedup_exact(spark, sf):
    from pyrdf2vec_spark.functions.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf))


def _q_dedup_ngram_pairs(spark, sf):
    from pyrdf2vec_spark.functions.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs(spark, sf).where(F.col("doc_id") < 400), k=3, threshold=0.2
    )


def _q_dedup_minhash_pairs(spark, sf):
    from pyrdf2vec_spark.functions.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(
        _docs(spark, sf).where(F.col("doc_id") < 400),
        jaccard_threshold=0.5,
    )


def _q_dedup_simhash64(spark, sf):
    # full-width signatures: 193/200 have bit 63 set (negative bigint),
    # so this certifies sign-free band extraction engine-independently
    from pyrdf2vec_spark.functions.dedup import simhash

    return simhash(_docs(spark, sf).where(F.col("doc_id") < 200), bits=64)


def _q_dedup_simhash_pairs64(spark, sf):
    # max_hamming=2 at bits=64: band 0 holds 22 bits including nothing
    # past bit 21, but bands at the top cover the sign bit — the oracle
    # is UNBLOCKED brute force, so any pair the banding drops (the
    # round-3 ADVICE bug: signed % made band-0 blocks negative) fails
    # the row-count match
    from pyrdf2vec_spark.functions.dedup import simhash_pairs

    return simhash_pairs(
        _docs(spark, sf).where(F.col("doc_id") < 200), bits=64, max_hamming=2
    )


def _q_embed_topk(spark, sf):
    from pyrdf2vec_spark.functions.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    return brute_force_topk(emb, queries, k=5)


def _q_embed_ivf_topk(spark, sf):
    from pyrdf2vec_spark.functions.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    return ivf_topk(emb, queries, k=5, n_centroids=16, n_probes=4)


def _q_embed_neardup(spark, sf):
    from pyrdf2vec_spark.functions.dedup import embedding_neardup_pairs

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    return embedding_neardup_pairs(emb, threshold=0.35)


def _q_events_hourly(spark, sf):
    ev = spark.read.parquet(f"{sf}/events.parquet")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def _q_events_sessionize(spark, sf):
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond precision: second-truncated casts flip the 1800 s
    # boundary on gaps in (1799, 1801] vs the fractional-epoch oracle
    epoch = F.unix_micros(F.to_utc_timestamp(F.col("ts"), "UTC"))
    gap = epoch - F.lag(epoch).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1_800_000_000), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    sess = flagged.withColumn(
        "session_id", F.sum("new_session").over(w)
    )
    return sess.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def _q_events_sliding(spark, sf):
    # sliding windows (1 h window, 30 min slide): every event lands in
    # two epoch-aligned windows — the Structured-Streaming window shape
    # run as a batch aggregate
    ev = spark.read.parquet(f"{sf}/events.parquet")
    return ev.groupBy(
        F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


def _q_multimodal_features(spark, sf):
    from pyrdf2vec_spark.functions.multimodal import (
        extract_features,
        synth_media,
    )

    media = synth_media(_docs(spark, sf).where(F.col("doc_id") < 200))
    return extract_features(media, dim=8).select(
        "media_id", "modality", "n_bytes", F.size("feature").alias("dim")
    )


def _q_multimodal_decoded(spark, sf):
    """REAL codec path: synthesize genuine WAV (RIFF/PCM16) and PPM
    (P6) containers, byte-level decode them back, emit 5 exact feature
    values per media row. The oracle computes the same features
    CLOSED-FORM from doc_id (every container parameter is a pure
    function of it), so a hash match certifies the decode round-trip
    without DuckDB needing a codec."""
    from pyrdf2vec_spark.functions.multimodal import (
        extract_features,
        synth_real_media,
    )

    media = synth_real_media(_docs(spark, sf).where(F.col("doc_id") < 300))
    feats = extract_features(media, dim=5, use_real_decoder=True)
    f = F.col("feature")
    return feats.select(
        "media_id",
        "modality",
        *[
            F.element_at(f, i + 1).cast("double").alias(c)
            for i, c in enumerate(["f1", "f2", "f3", "f4", "f5"])
        ],
    )


def _q_transcript_pipeline(spark, sf):
    """The north-rule centerpiece as a driver-gate query: synthesize
    1000 deterministic conversations, run mention detection + linking,
    return distinct triples. The DuckDB oracle computes the PLANTED
    ground truth directly from the generator arithmetic (no regex), so
    a hash match certifies extraction P/R = 1.0."""
    from pyrdf2vec_spark.extract import extract_triples, triples_only
    from pyrdf2vec_spark.sources.transcripts import synth_transcripts

    tr = synth_transcripts(spark, 1000, 10, seed=42)
    return triples_only(extract_triples(tr))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kg_triples": _q_kg_triples,
        "kg_edges": _q_kg_edges,
        "kg_vertices": _q_kg_vertices,
        "kg_hops_customers": _q_kg_hops_customers,
        "kg_hops_reverse_nations": _q_kg_hops_reverse_nations,
        "kg_bfs_depth2": _q_kg_bfs_depth2,
        "kg_existence": _q_kg_existence,
        "kg_literal_chain": _q_kg_literal_chain,
        "walk_walklet": _q_walk_walklet,
        "walk_halk": _q_walk_halk,
        "walk_halk_reverse": _q_walk_halk_reverse,
        "walk_ngram": _q_walk_ngram,
        "walk_split": _q_walk_split,
        "walk_with_reverse": _q_walk_with_reverse,
        "walk_anonymous": _q_walk_anonymous,
        "walk_wl_depth1": _q_walk_wl_depth1,
        "sampler_objfreq": _q_sampler_objfreq,
        "sampler_predfreq": _q_sampler_predfreq,
        "sampler_objpredfreq": _q_sampler_objpredfreq,
        "sampler_wide": _q_sampler_wide,
        "sampler_norm_objfreq": _q_sampler_norm_objfreq,
        "split_degrees": _q_split_degrees,
        "pagerank": _q_pagerank,
        "community_labels": _q_community_labels,
        "community_sampled_walks": _q_community_sampled_walks,
        "walks_dfs_sampled": _q_walks_dfs,
        "walks_dfs_canonical": _q_walks_dfs_canonical,
        "wl_labels_n1": _q_wl_labels,
        "text_token_stats": _q_text_token_stats,
        "text_quality": _q_text_quality,
        # text_langid + text_fingerprint rotated out for round 6
        # (scan-only ops with stable pytest goldens; the driver checks
        # exactly 50 rows) so redact_pii — the only operator family
        # without a hard driver signal — and the new decontaminate
        # operator get oracle rows. Rotation policy: STATUS.md.
        "redact_pii": _q_redact_pii,
        "decontaminate": _q_decontaminate,
        "text_chunks": _q_text_chunks,
        "embed_quantized": _q_embed_quantized,
        "embed_quantized_topk": _q_embed_quantized_topk,
        "dedup_exact": _q_dedup_exact,
        "dedup_ngram_pairs": _q_dedup_ngram_pairs,
        "dedup_minhash_pairs": _q_dedup_minhash_pairs,
        "dedup_components": _q_dedup_components,
        "dedup_simhash64": _q_dedup_simhash64,
        "dedup_simhash_pairs64": _q_dedup_simhash_pairs64,
        # (the 16-bit dedup_simhash / dedup_simhash_pairs / _h2 rows
        # were retired in round 5: strictly dominated by the
        # brute-force-oracled 64-bit rows, and the driver checks exactly
        # 50 rows — the freed slots give multimodal_decoded /
        # transcript_triples / community_sampled_walks their rows; the
        # 16-bit paths stay pytest-covered in tests/test_dedup.py)
        "embed_topk": _q_embed_topk,
        "embed_ivf_topk": _q_embed_ivf_topk,
        "embed_neardup": _q_embed_neardup,
        "events_hourly": _q_events_hourly,
        "events_sessionize": _q_events_sessionize,
        "events_sliding": _q_events_sliding,
        "multimodal_features": _q_multimodal_features,
        "multimodal_decoded": _q_multimodal_decoded,
        "transcript_triples": _q_transcript_pipeline,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------
_EDGES_CTE = f"WITH edges AS ({TPCH_EDGES_SQL})"

_TOKSTATS_SQL = """
SELECT doc_id,
       len(regexp_split_to_array(trim(lower(text)), ' +')) AS n_words,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_tokens,
       length(text) AS n_chars_obs
FROM documents
"""

_QUALITY_SQL = """
WITH base AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(lower(text)), ' +')) AS n_words,
         length(text) AS n_chars,
         len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS n_punct,
         len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is|a)\\b')) AS n_stop
  FROM documents
)
SELECT doc_id, n_words,
       (n_chars - (n_words - 1)) / n_words AS mean_word_len,
       n_punct / greatest(n_chars, 1) AS punct_ratio,
       n_stop / greatest(n_words, 1) AS stop_ratio,
       least(n_words / 64.0, 1.0) * 0.4
         + (1.0 - least(n_punct / greatest(n_chars, 1) * 4, 1.0)) * 0.3
         + least(n_stop / greatest(n_words, 1) * 5, 1.0) * 0.3
         AS quality_score
FROM base
"""

_LANG_SCORE = (
    "len(regexp_extract_all(lower(text), '\\b{pat}\\b'))"
)
_LANG_PATS = {
    "en": "(the|and|of|to|is)",
    "de": "(der|die|das|und|ist)",
    "fr": "(le|la|les|et|est)",
    "es": "(el|los|las|y|es)",
    "zh": "(de|shi|le|zai|he)",
}
_LANGID_SQL = (
    "WITH s AS (SELECT doc_id, "
    + ", ".join(
        _LANG_SCORE.format(pat=p) + f" AS score_{l}"
        for l, p in sorted(_LANG_PATS.items())
    )
    + " FROM documents), m AS (SELECT *, greatest(score_de, score_en,"
    " score_es, score_fr, score_zh) AS best FROM s) SELECT doc_id,"
    " score_de, score_en, score_es, score_fr, score_zh, CASE WHEN best = 0"
    " THEN 'und' WHEN score_de = best THEN 'de' WHEN score_en = best THEN"
    " 'en' WHEN score_es = best THEN 'es' WHEN score_fr = best THEN 'fr'"
    " ELSE 'zh' END AS lang_pred FROM m"
)

_CHUNKS_SQL = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), ' +') AS words
  FROM documents WHERE doc_id < 300
), c AS (
  SELECT doc_id, words,
         unnest(generate_series(1, greatest(1, len(words) - 16), 48)) AS s
  FROM w
)
SELECT doc_id,
       CAST((s - 1) / 48 AS INT) AS chunk_idx,
       array_to_string(words[s : least(s + 63, len(words))], ' ')
         AS chunk_text,
       CAST(least(s + 63, len(words)) - s + 1 AS INT) AS n_chunk_words
FROM c
"""

_FINGERPRINT_SQL = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), ' +') AS ws
  FROM documents
), idx AS (
  SELECT doc_id, ws,
         unnest(generate_series(1, greatest(1, len(ws) - 2))) AS i
  FROM w
), sh AS (
  SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS s FROM idx
)
SELECT doc_id, min(md5(s)) AS fingerprint, count(*) AS n_shingles
FROM sh GROUP BY doc_id
"""

_NGRAM_PAIRS_SQL = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), ' +') AS ws
  FROM documents WHERE doc_id < 400
), idx AS (
  SELECT doc_id, ws,
         unnest(generate_series(1, greatest(1, len(ws) - 2))) AS i
  FROM w
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS s FROM idx
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), common AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
  FROM sh x JOIN sh y USING (s) WHERE x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT a, b, round(c / (sa.n + sb.n - c), 6) AS jaccard
FROM common JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
WHERE c / (sa.n + sb.n - c) >= 0.2
"""

# full-width (64-bit) SimHash oracle: votes assemble into a HUGEINT
# then wrap into the signed BIGINT two's-complement Spark produces
# (bit 63 set → negative). The pairs oracle is UNBLOCKED brute force
# over all C(200,2) signature pairs — engine-independent proof that
# the banded blocking drops nothing at full width.
_SIMHASH64_SIG_SQL = """
toks AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), ' +')) AS tok
        FROM documents WHERE doc_id < 200)
), h AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv,
         ('0x' || substr(md5(tok), 16, 2))::BIGINT AS hv2
  FROM toks
), votes AS (
  SELECT doc_id, {sums} FROM h GROUP BY doc_id
), sig64 AS (
  SELECT doc_id,
         CAST(CASE WHEN ({sig}) >= 9223372036854775808::HUGEINT
              THEN ({sig}) - 18446744073709551616::HUGEINT
              ELSE ({sig}) END AS BIGINT) AS simhash
  FROM votes
)
""".format(
    sums=", ".join(
        (
            f"sum(((hv >> {b}) % 2) * 2 - 1) AS s{b}"
            if b < 60
            else f"sum(((hv2 >> {b - 60}) % 2) * 2 - 1) AS s{b}"
        )
        for b in range(64)
    ),
    sig=" + ".join(
        f"(CASE WHEN s{b} > 0 THEN {2**b}::HUGEINT ELSE 0::HUGEINT END)"
        for b in range(64)
    ),
)

_SIMHASH64_SQL = f"WITH {_SIMHASH64_SIG_SQL} SELECT doc_id, simhash FROM sig64"

_SIMHASH64_PAIRS_SQL = f"""
WITH {_SIMHASH64_SIG_SQL}
SELECT x.doc_id AS a, y.doc_id AS b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
FROM sig64 x JOIN sig64 y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 2
"""

# int8 symmetric quantization twin: shared floor(x/scale + 0.5) rule
_MAXABS = "list_max(list_transform({v}, x -> abs(CAST(x AS DOUBLE))))"


def _quant_cte(name: str, source: str) -> str:
    m = _MAXABS.format(v="embedding")
    return f"""{name} AS (
  SELECT vec_id,
         {m} / 127.0 AS scale,
         CASE WHEN {m} = 0.0 THEN list_transform(embedding, x -> 0)
              ELSE list_transform(embedding, x ->
                CAST(floor(CAST(x AS DOUBLE) / ({m} / 127.0) + 0.5) AS INT))
         END AS qvec
  FROM {source}
)"""


_EMB_QUANT_SQL = f"""
WITH {_quant_cte("quant", "(SELECT * FROM embeddings WHERE vec_id < 200)")}
SELECT vec_id, array_to_string(qvec, ',') AS qvec_csv,
       round(scale, 6) AS scale_r
FROM quant
"""

# cosine via explicit sequential folds — bit-identical to the Spark
# side's aggregate(zip_with(...)) (same op order, same double promotion)
_DOT_SQL = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "z -> CAST(z[1] AS DOUBLE) * z[2]), (x, y) -> x + y)"
)
_NORM_SQL = (
    "sqrt(list_reduce(list_transform({a}, v -> CAST(v AS DOUBLE) * v), "
    "(x, y) -> x + y))"
)
_EMB_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_DOT_SQL.format(a='q.qv', b='e.embedding')}
           / ({_NORM_SQL.format(a='q.qv')} * {_NORM_SQL.format(a='e.embedding')})
           AS cos
  FROM q, embeddings e WHERE e.vec_id != q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos, 6) AS cosine
FROM ranked WHERE rank <= 5
"""

_EMB_QUANT_TOPK_SQL = f"""
WITH {_quant_cte("quant", "embeddings")},
q AS (SELECT vec_id AS query_id, qvec AS qv FROM quant WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_DOT_SQL.format(a='q.qv', b='e.qvec')}
           / ({_NORM_SQL.format(a='q.qv')} * {_NORM_SQL.format(a='e.qvec')})
           AS cos
  FROM q, quant e WHERE e.vec_id != q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos, 6) AS cosine
FROM ranked WHERE rank <= 5
"""

_EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""

def _duck_md5_repr(expr: str) -> str:
    """DuckDB twin of walks._md5_repr_sql: Python's str(md5(x).digest()[:8])
    built from the md5 hex pairs (lowercase \\xhh comes free from the hex
    string). DuckDB string literals are escape-free, so backslashes are
    written literally."""
    pairs = [f"substr(md5({expr}), {2 * i - 1}, 2)" for i in range(1, 9)]
    vals = [f"(('0x' || {p})::INT)" for p in pairs]
    has39 = " OR ".join(f"{v} = 39" for v in vals)
    has34 = " OR ".join(f"{v} = 34" for v in vals)

    def byte_case(v: str, p: str, dq: bool) -> str:
        c = (
            f"CASE WHEN {v} = 9 THEN '\\t' "
            f"WHEN {v} = 10 THEN '\\n' "
            f"WHEN {v} = 13 THEN '\\r' "
            f"WHEN {v} = 92 THEN '\\\\' "
        )
        if not dq:
            c += f"WHEN {v} = 39 THEN '\\''' "
        c += (
            f"WHEN {v} BETWEEN 32 AND 126 THEN chr({v}) "
            f"ELSE '\\x' || {p} END"
        )
        return c

    sq = " || ".join(byte_case(v, p, False) for v, p in zip(vals, pairs))
    dq = " || ".join(byte_case(v, p, True) for v, p in zip(vals, pairs))
    return (
        f"CASE WHEN ({has39}) AND NOT ({has34}) "
        f"THEN 'b\"' || {dq} || '\"' "
        f"ELSE 'b''' || {sq} || '''' END"
    )


_WL_N1_SQL = f"""{_EDGES_CTE},
ents AS (SELECT DISTINCT src AS name FROM edges
         UNION SELECT DISTINCT dst FROM edges),
sfx AS (SELECT dst AS name, string_agg(DISTINCT pred, '-' ORDER BY pred) AS s
        FROM edges GROUP BY dst),
raw AS (SELECT e.name, e.name || '-' || coalesce(x.s, '') AS raw_label
        FROM ents e LEFT JOIN sfx x USING (name))
SELECT name, 0 AS n, name AS label FROM ents
UNION ALL
SELECT name, 1 AS n, {_duck_md5_repr('raw_label')} AS label FROM raw
"""

# MinHash permutation constants shared with canon._hash_params(12, 42)
def _minhash_consts():
    from pyrdf2vec_spark.canon import _P, _hash_params

    return _P, _hash_params(12, 42)


def _minhash_pairs_sql() -> str:
    P, params = _minhash_consts()
    mins = ", ".join(
        f"min(({a} * (h % {P}) + {b}) % {P}) AS h{k}"
        for k, (a, b) in enumerate(params)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT name, {b} AS band_idx, CAST(h{2 * b} AS STRING) || '|' || "
        f"CAST(h{2 * b + 1} AS STRING) AS band_sig FROM sigs"
        for b in range(6)
    )
    # pairs are keyed (and a<b ordered) by the representative doc_id,
    # mirroring the implementation's id-keyed shuffles
    return f"""
WITH docs AS (SELECT text, min(doc_id) AS name
              FROM documents WHERE doc_id < 400 GROUP BY text),
w AS (SELECT name, regexp_split_to_array(trim(lower(text)), ' +') AS ws
      FROM docs),
idx AS (SELECT name, ws,
               unnest(generate_series(1, greatest(1, len(ws) - 2))) AS i
        FROM w),
sh AS (SELECT DISTINCT name, array_to_string(ws[i:i+2], ' ') AS s FROM idx),
h AS (SELECT DISTINCT name, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
      FROM sh),
sizes AS (SELECT name, count(*) AS n_sh FROM h GROUP BY name),
sigs AS (SELECT name, {mins} FROM h GROUP BY name),
bands AS ({band_rows}),
sized AS (SELECT *, count(*) OVER (PARTITION BY band_idx, band_sig) AS bn
          FROM bands),
pairs AS (SELECT DISTINCT x.name AS a, y.name AS b
          FROM sized x JOIN sized y USING (band_idx, band_sig)
          WHERE x.bn <= 200 AND y.bn <= 200 AND x.name < y.name),
common AS (SELECT p.a, p.b, count(*) AS c
           FROM pairs p
           JOIN h ha ON ha.name = p.a
           JOIN h hb ON hb.name = p.b AND hb.h = ha.h
           GROUP BY p.a, p.b),
verified AS (SELECT a, b, c / (sa.n_sh + sb.n_sh - c) AS j
             FROM common JOIN sizes sa ON sa.name = a
             JOIN sizes sb ON sb.name = b
             WHERE c / (sa.n_sh + sb.n_sh - c) >= 0.5)
SELECT a AS doc_a, b AS doc_b, round(j, 6) AS jaccard FROM verified
"""



_DEDUP_COMPONENTS_SQL_TEMPLATE = """
WITH RECURSIVE near AS ({near_sql}),
docs400 AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
reps AS (SELECT text, min(doc_id) AS rep FROM docs400 GROUP BY text),
exact AS (SELECT d.doc_id AS a, r.rep AS b
          FROM docs400 d JOIN reps r USING (text)
          WHERE d.doc_id != r.rep),
edges AS (SELECT doc_a AS a, doc_b AS b FROM near
          UNION SELECT a, b FROM exact),
sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
reach(src, dst) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
)
SELECT d.doc_id,
       CAST(least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS BIGINT)
         AS component_id
FROM docs400 d LEFT JOIN reach r ON r.src = d.doc_id
GROUP BY d.doc_id
"""


_IVF_TOPK_SQL_TEMPLATE = (
    """
WITH cents AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS STRING))) - 1
           AS centroid_id,
         embedding AS centroid
  FROM embeddings
  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS STRING))) <= 16
),
assigned AS (
  SELECT vec_id AS id, embedding AS v, centroid_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY {COS_VC} DESC, centroid_id ASC) AS rn
  FROM embeddings, cents
),
best AS (SELECT id, v, centroid_id FROM assigned WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id < 10),
probes AS (
  SELECT query_id, qv, centroid_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {COS_QC} DESC, centroid_id ASC) AS prank
  FROM q, cents
),
p AS (SELECT query_id, qv, centroid_id FROM probes WHERE prank <= 4),
scored AS (
  SELECT p.query_id, a.id AS neighbor_id, {COS_QA} AS cos
  FROM p JOIN best a USING (centroid_id)
  WHERE p.query_id != a.id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos, 6) AS cosine
FROM ranked WHERE rank <= 5
"""
)


def _cos_sql(a: str, b: str) -> str:
    return (
        f"{_DOT_SQL.format(a=a, b=b)} / "
        f"({_NORM_SQL.format(a=a)} * {_NORM_SQL.format(a=b)})"
    )


_IVF_TOPK_SQL = _IVF_TOPK_SQL_TEMPLATE.format(
    COS_VC=_cos_sql("embedding", "centroid"),
    COS_QC=_cos_sql("qv", "centroid"),
    COS_QA=_cos_sql("p.qv", "a.v"),
)

# customer depth-2 walk corpus (every customer walk is exactly length 5:
# c -in_nation-> n -{in_region|has_name}-> x), shared by walker oracles
_CW_CTE = """
cw AS (
  SELECT e1.src AS w0, e1.pred AS w1, e1.dst AS w2,
         e2.pred AS w3, e2.dst AS w4
  FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
  WHERE e1.src LIKE 'c:%'
)"""

_WALKLET_SQL = f"""{_EDGES_CTE},{_CW_CTE}
SELECT DISTINCT w0 AS entity, w0 || '->' || v AS walk_str
FROM (SELECT w0, unnest([w1, w2, w3, w4]) AS v FROM cw)
"""

_HALK_SQL = f"""{_EDGES_CTE},{_CW_CTE},
walks AS (SELECT DISTINCT w0, w1, w2, w3, w4 FROM cw),
tot AS (SELECT count(*) AS n FROM walks),
sup AS (SELECT p, count(*) AS c FROM
        (SELECT DISTINCT w0, w1, w2, w3, w4, unnest([w1, w3]) AS p
         FROM walks) GROUP BY p),
recon AS (
  SELECT w.w0,
         CASE WHEN s1.c / t.n >= th.t AND s3.c / t.n >= th.t
              THEN w.w0 || '->' || w.w1 || '->' || w.w2 || '->' || w.w3 || '->' || w.w4
              WHEN s1.c / t.n >= th.t
              THEN w.w0 || '->' || w.w1 || '->' || w.w2
              WHEN s3.c / t.n >= th.t
              THEN w.w0 || '->' || w.w3 || '->' || w.w4
              ELSE NULL END AS walk_str,
         th.t AS thr
  FROM walks w
  JOIN sup s1 ON s1.p = w.w1
  JOIN sup s3 ON s3.p = w.w3
  CROSS JOIN tot t
  CROSS JOIN (SELECT unnest([0.2, 0.3]) AS t) th
),
kept AS (SELECT DISTINCT w0 AS entity, walk_str FROM recon
         WHERE walk_str IS NOT NULL),
fallback AS (
  SELECT DISTINCT r.w0 AS entity, r.w0 AS walk_str
  FROM recon r
  GROUP BY r.w0, r.thr
  HAVING count(walk_str) = 0
)
SELECT entity, walk_str FROM kept
UNION
SELECT entity, walk_str FROM fallback
"""

# HALK with_reverse on depth-1 combined walks [parent, rp, root, fp, x]
# (roots: customers ∪ nations). Reference reconstruction (halk.py:147-169):
# pred k=0 (w1): obj = w[2+j]; pred k=1 (w3): obj = w[3+j]; j counts KEPT
# preds — so when w1 is rare and w3 kept, obj = w[3] = w3 itself (quirk).
_HALK_REV_SQL = f"""{_EDGES_CTE},
cw AS (
  SELECT DISTINCT r.src AS w0, r.pred AS w1, f.src AS w2,
         f.pred AS w3, f.dst AS w4
  FROM edges r JOIN edges f ON r.dst = f.src
  WHERE f.src LIKE 'c:%' OR f.src LIKE 'n:%'
),
tot AS (SELECT count(*) AS n FROM cw),
sup AS (SELECT p, count(*) AS c FROM
        (SELECT DISTINCT w0, w1, w2, w3, w4, unnest([w1, w3]) AS p
         FROM cw) GROUP BY p),
recon AS (
  SELECT w.w2 AS entity,
         CASE WHEN s1.c / t.n >= th.t AND s3.c / t.n >= th.t
              THEN w.w0 || '->' || w.w1 || '->' || w.w2 || '->' ||
                   w.w3 || '->' || w.w4
              WHEN s1.c / t.n >= th.t
              THEN w.w0 || '->' || w.w1 || '->' || w.w2
              WHEN s3.c / t.n >= th.t
              THEN w.w0 || '->' || w.w3 || '->' || w.w3
              ELSE NULL END AS walk_str
  FROM cw w
  JOIN sup s1 ON s1.p = w.w1
  JOIN sup s3 ON s3.p = w.w3
  CROSS JOIN tot t
  CROSS JOIN (SELECT unnest([0.5, 0.9]) AS t) th
)
SELECT DISTINCT entity, walk_str FROM recon WHERE walk_str IS NOT NULL
"""

# n-gram key separator chr(1) matches Spark's char(1) in ngram_walks
# (an explicit separator prevents ('ab','c') vs ('a','bc') collisions)
_NGRAM_SQL = f"""{_EDGES_CTE},{_CW_CTE},
walks AS (SELECT DISTINCT w0, w1, w2, w3, w4 FROM cw),
keys AS (SELECT DISTINCT w2 || chr(1) || w3 || chr(1) || w4 AS k FROM walks),
ids AS (SELECT k, CAST(dense_rank() OVER (ORDER BY k) - 1 AS STRING) AS gid
        FROM keys)
SELECT DISTINCT w0 AS entity,
       w0 || '->' || w1 || '->' || w2 || '->' || w3 || '->' || i.gid
         AS walk_str
FROM walks JOIN ids i ON i.k = w2 || chr(1) || w3 || chr(1) || w4
"""


# SplitWalker replica for customer depth-2 walks. Token derivation per
# split.py basic_split on THIS vocabulary: predicates have no uppercase/
# '#' → ride through lowered; 'x:123' ids fail float() → non-alnum split
# → (prefix, digits); nation names fail float() → space split, lowered.
# dict(zip) order-preserving dedup = list_filter on first-occurrence.
_SPLIT_SQL = f"""{_EDGES_CTE},{_CW_CTE},
toks AS (
  SELECT w0 AS entity,
         [w1] || regexp_split_to_array(lower(w2), '[^a-z0-9]+') || [w3] ||
         regexp_split_to_array(lower(w4), '[^a-z0-9]+') AS l
  FROM cw
),
dedup AS (
  SELECT entity,
         list_filter(l, (x, i) -> list_position(l, x) = i) AS l
  FROM toks
)
SELECT DISTINCT entity, array_to_string(l, '->') AS walk_str FROM dedup
"""


def _wl_depth1_sql() -> str:
    return f"""{_EDGES_CTE},
d1 AS (SELECT src AS w0, pred AS w1, dst AS w2 FROM edges
       WHERE src LIKE 'c:%'),
sfx AS (SELECT dst AS name, string_agg(DISTINCT pred, '-' ORDER BY pred)
          AS s FROM edges GROUP BY dst),
raw AS (SELECT name, name || '-' || coalesce(s, '') AS raw_label FROM sfx),
lab AS (SELECT name, {_duck_md5_repr('raw_label')} AS label FROM raw)
SELECT DISTINCT w0 AS entity, w0 || '->' || w1 || '->' || w2 AS walk_str
FROM d1
UNION
SELECT DISTINCT w0, w0 || '->' || w1 || '->' || l.label
FROM d1 JOIN lab l ON l.name = w2
"""


# planted ground truth of the synthetic generator, computed straight
# from the md5 arithmetic (sources/transcripts._turn_fields) — matching
# the Spark side's regex-extracted output certifies P/R = 1.0
_TRANSCRIPT_TRIPLES_SQL = """
WITH ids AS (SELECT unnest(generate_series(0, 9999)) AS gid),
d AS (
  SELECT gid // 10 AS conv, gid % 10 AS turn,
         md5('conv' || lpad(CAST(gid // 10 AS STRING), 8, '0') || '|' ||
             CAST(gid % 10 AS STRING) || '|42') AS h
  FROM ids
),
f AS (
  SELECT conv, turn,
         ('0x' || substr(h, 3, 2))::INT % 5 AS tmpl_i,
         ('0x' || substr(h, 7, 6))::BIGINT AS si_raw,
         ('0x' || substr(h, 13, 6))::BIGINT AS oi_raw
  FROM d
),
trip AS (
  SELECT
    CASE tmpl_i
      WHEN 0 THEN 'person_' || CAST(si_raw % 200 AS STRING)
      WHEN 1 THEN 'person_' || CAST(si_raw % 200 AS STRING)
      WHEN 2 THEN 'person_' || CAST(si_raw % 200 AS STRING)
      WHEN 3 THEN 'org_' || CAST(si_raw % 50 AS STRING)
    END AS subj,
    CASE tmpl_i WHEN 0 THEN 'works_at' WHEN 1 THEN 'lives_in'
                WHEN 2 THEN 'knows' WHEN 3 THEN 'based_in' END AS pred,
    CASE tmpl_i
      WHEN 0 THEN 'org_' || CAST(oi_raw % 50 AS STRING)
      WHEN 1 THEN 'city_' || CAST(oi_raw % 30 AS STRING)
      WHEN 2 THEN 'person_' || CAST(
        CASE WHEN oi_raw % 200 = si_raw % 200
             THEN (oi_raw % 200 + 1) % 200 ELSE oi_raw % 200 END AS STRING)
      WHEN 3 THEN 'city_' || CAST(oi_raw % 30 AS STRING)
    END AS obj
  FROM f WHERE tmpl_i < 4
)
SELECT DISTINCT subj, pred, obj FROM trip
"""

def _dfs_sql(max_walks: int = 3, seed: int = 42, canonical: bool = False) -> str:
    """Unrolled 2-depth replica of sampled_walks(portable_hash=True) for
    order seeds: per (slot, depth) pick argmin of -ln(u)/w over the
    candidate hops, u = md5-derived uniform, w = objfreq raw weight,
    ties broken by (pred, dst). ``canonical=True`` md5-tokenizes
    non-seed hop vertices (the dfs_canonical_walks fusion) and dedups."""

    def step(k: int, cur: str, prev_cte: str) -> str:
        u = (
            f"((('0x' || substr(md5(s.entity || '|' || CAST(s.wid AS STRING) "
            f"|| '|' || '{k}' || '|' || e.pred || '|' || e.dst || '|' || "
            f"'{seed}'), 1, 8))::BIGINT)::DOUBLE + 0.5) / 4294967296.0"
        )
        return f"""
cand{k} AS (SELECT s.*, e.pred AS p{k}, e.dst AS o{k},
                  -ln({u}) / w.wt AS key{k}
            FROM {prev_cte} s
            JOIN edges e ON e.src = {cur}
            JOIN wts w ON w.dst = e.dst AND w.pred = e.pred
                      AND w.src = e.src),
pick{k} AS (SELECT * FROM (
              SELECT *, row_number() OVER (
                PARTITION BY entity, wid
                ORDER BY key{k}, p{k}, o{k}) AS rn{k}
              FROM cand{k}) WHERE rn{k} = 1)"""

    wids = ", ".join(str(i) for i in range(max_walks))
    if canonical:
        tok0 = (
            f"CASE WHEN o0 LIKE 'o:%' THEN o0 ELSE {_duck_md5_repr('o0')} END"
        )
        tok1 = (
            f"CASE WHEN o1 LIKE 'o:%' THEN o1 ELSE {_duck_md5_repr('o1')} END"
        )
        final = (
            f"SELECT DISTINCT entity, entity || '->' || p0 || '->' || {tok0}"
            f" || '->' || p1 || '->' || {tok1} AS walk_str\nFROM pick1"
        )
    else:
        final = (
            "SELECT entity, entity || '->' || p0 || '->' || o0 || '->' ||"
            " p1 || '->' || o1 AS walk_str\nFROM pick1"
        )
    return f"""WITH edges AS MATERIALIZED ({TPCH_EDGES_SQL}),
wts AS MATERIALIZED (
  SELECT e.src, e.pred, e.dst, CAST(c.weight AS DOUBLE) AS wt
  FROM edges e JOIN (SELECT dst, count(*) AS weight FROM edges
                     GROUP BY dst) c ON c.dst = e.dst),
slots AS (SELECT o.entity, t.wid
          FROM (SELECT DISTINCT src AS entity FROM edges
                WHERE src LIKE 'o:%') o,
               (SELECT unnest([{wids}]) AS wid) t),
{step(0, "s.entity", "slots").lstrip()},
{step(1, "s.o0", "pick0").lstrip()}
{final}
"""


def _lpa_ctes(iters: int = 5) -> str:
    """The WITH-body (edges … l{iters}) of the unrolled label
    propagation replicating walks.community_labels: undirected distinct
    edge set, self-vote each round, most-frequent label with
    lexicographic tie-break. Shared by _lpa_sql and
    _community_dfs_sql."""
    head = f"""edges AS MATERIALIZED ({TPCH_EDGES_SQL}),
und AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM edges
    UNION ALL SELECT dst AS a, src AS b FROM edges) t
  WHERE a <> b),
l0 AS MATERIALIZED (
  SELECT DISTINCT src AS id, src AS community FROM edges
  UNION SELECT DISTINCT dst, dst FROM edges)"""
    parts = [head]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(f""",
c{k} AS MATERIALIZED (
  SELECT id, community, count(*) AS cnt FROM (
    SELECT u.a AS id, l.community FROM und u JOIN l{p} l ON l.id = u.b
    UNION ALL SELECT id, community FROM l{p}) t
  GROUP BY id, community),
l{k} AS MATERIALIZED (
  SELECT id, community FROM (
    SELECT id, community,
           row_number() OVER (PARTITION BY id
                              ORDER BY cnt DESC, community) AS rn
    FROM c{k}) t WHERE rn = 1)""")
    return "".join(parts)


def _lpa_sql(iters: int = 5) -> str:
    """Unrolled LPA — one CTE pair per iteration, same shape as the
    pagerank oracle."""
    return (
        f"WITH {_lpa_ctes(iters)}\nSELECT id AS name, community FROM l{iters}"
    )


def _md5_u32_sql(concat_expr: str) -> str:
    """DuckDB replica of walks._md5_uniform: first 8 hex chars of
    md5(concat) as u32, +0.5, / 2**32."""
    return (
        f"((('0x' || substr(md5({concat_expr}), 1, 8))::BIGINT)::DOUBLE"
        " + 0.5) / 4294967296.0"
    )


def _community_dfs_sql(
    max_walks: int = 3,
    hop_prob: float = 0.15,
    seed: int = 42,
    iters: int = 5,
) -> str:
    """Unrolled 2-depth replica of
    community_sampled_walks(portable_hash=True) over customer seeds:
    per (slot, depth) pick argmin of -ln(u) over candidate hops
    (uniform sampler → weight 1), flip the teleport coin, and — when it
    lands under hop_prob — REPLACE the hop object by the member of its
    LPA community with the smallest md5 member-draw key. Labels are the
    exact l{iters} table already oracled by community_labels."""

    def step(k: int) -> str:
        race_u = _md5_u32_sql(
            f"s.entity || '|' || CAST(s.wid AS VARCHAR) || '|' || '{k}'"
            f" || '|' || e.pred || '|' || e.dst || '|' || '{seed}'"
        )
        coin_u = _md5_u32_sql(
            f"entity || '|' || CAST(wid AS VARCHAR) || '|' || '{k}'"
            f" || '|' || '{seed + 7}'"
        )
        member_h = (
            f"md5(t.walk || '|' || CAST(t.wid AS VARCHAR) || '|' ||"
            f" m.member || '|' || '{seed + k}')"
        )
        return f"""
cand{k} AS (
  SELECT s.entity, s.wid, s.walk, e.pred AS p, e.dst AS o,
         -ln({race_u}) AS key
  FROM s{k} s JOIN edges e ON e.src = s.cur),
pick{k} AS (
  SELECT entity, wid, walk, p, o FROM (
    SELECT *, row_number() OVER (PARTITION BY entity, wid
                                 ORDER BY key, p, o) AS rn
    FROM cand{k}) WHERE rn = 1),
t{k} AS (
  SELECT *, ({coin_u}) < {hop_prob} AS tele FROM pick{k}),
m{k} AS (
  SELECT entity, wid, member FROM (
    SELECT t.entity, t.wid, m.member,
           row_number() OVER (PARTITION BY t.entity, t.wid
                              ORDER BY {member_h}, m.member) AS rn
    FROM t{k} t
    JOIN labels l ON l.id = t.o
    JOIN members m ON m.community = l.community
    WHERE t.tele) WHERE rn = 1),
s{k + 1} AS (
  SELECT t.entity, t.wid,
         COALESCE(m.member, t.o) AS cur,
         t.walk || '->' || t.p || '->' || COALESCE(m.member, t.o) AS walk
  FROM t{k} t LEFT JOIN m{k} m ON m.entity = t.entity AND m.wid = t.wid),
dead{k + 1} AS (
  SELECT s.entity, s.walk FROM s{k + 1} s
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = s.cur))"""

    wids = ", ".join(str(i) for i in range(max_walks))
    return f"""WITH {_lpa_ctes(iters)},
labels AS MATERIALIZED (SELECT id, community FROM l{iters}),
members AS MATERIALIZED (SELECT community, id AS member FROM l{iters}),
slots AS (
  SELECT c.entity, t.wid
  FROM (SELECT DISTINCT src AS entity FROM edges WHERE src LIKE 'c:%'
        UNION SELECT DISTINCT dst FROM edges WHERE dst LIKE 'c:%') c,
       (SELECT unnest([{wids}]) AS wid) t),
s0 AS (SELECT entity, wid, entity AS cur, entity AS walk FROM slots),
dead0 AS (
  SELECT s.entity, s.walk FROM s0 s
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = s.cur)),
{step(0).lstrip()},
{step(1).lstrip()}
SELECT DISTINCT entity, walk AS walk_str FROM (
  SELECT entity, walk FROM dead0
  UNION ALL SELECT entity, walk FROM dead1
  UNION ALL SELECT entity, walk FROM s2)
"""


def _pagerank_sql(alpha: float = 0.85, iters: int = 20) -> str:
    """Unrolled power-iteration PageRank (networkx semantics: uniform
    teleport, dangling mass redistributed uniformly) — one CTE pair per
    iteration, matching samplers.pagerank in fixed-iteration mode."""
    # MATERIALIZED: DuckDB otherwise inlines each CTE reference, opening
    # the parquet scans once per unrolled iteration (fd exhaustion)
    head = f"""WITH edges AS MATERIALIZED ({TPCH_EDGES_SQL}),
links AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
nodes AS MATERIALIZED (SELECT DISTINCT src AS name FROM links
          UNION SELECT DISTINCT dst FROM links),
deg AS MATERIALIZED (SELECT src, count(*) AS d FROM links GROUP BY src),
cnt AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT name, 1.0 / (SELECT n FROM cnt) AS rank FROM nodes)"""
    parts = [head]
    for k in range(1, iters + 1):
        p = k - 1
        # every iteration CTE is MATERIALIZED: r{{k}} is referenced twice
        # (dangling + contribution) — inlining would blow up 2^iters
        parts.append(f""",
d{k} AS MATERIALIZED (SELECT coalesce(sum(r.rank), 0.0) AS dm
         FROM r{p} r LEFT JOIN deg ON deg.src = r.name
         WHERE deg.src IS NULL),
c{k} AS MATERIALIZED (SELECT l.dst AS name, sum(r.rank / deg.d) AS insum
         FROM links l JOIN deg ON deg.src = l.src
         JOIN r{p} r ON r.name = l.src GROUP BY l.dst),
r{k} AS MATERIALIZED (SELECT nd.name,
                (1.0 - {alpha}) / (SELECT n FROM cnt)
                + {alpha} * (coalesce(c.insum, 0.0)
                             + (SELECT dm FROM d{k}) / (SELECT n FROM cnt))
                  AS rank
         FROM nodes nd LEFT JOIN c{k} c USING (name))""")
    parts.append(f"\nSELECT name, round(rank, 6) AS rank FROM r{iters}")
    return "".join(parts)


# IVF-cell blocking replica: same centroid choice as the IVF oracle,
# top-2 probe cells per vector, pairs compared within shared cells
_NEARDUP_SQL = (
    """
WITH cents AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS STRING))) - 1
           AS centroid_id,
         embedding AS centroid
  FROM embeddings
  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS STRING))) <= 16
),
probed AS (
  SELECT vec_id AS id, embedding AS v, centroid_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY {COS_VC} DESC, centroid_id ASC)
           AS prank
  FROM embeddings, cents
),
asg AS (SELECT id, v, centroid_id FROM probed WHERE prank <= 2)
SELECT DISTINCT x.id AS a, y.id AS b, round({COS}, 6) AS cosine
FROM asg x JOIN asg y USING (centroid_id)
WHERE x.id < y.id AND {COS} >= 0.35
"""
)

# closed-form replica of synth_real_media's container parameters: odd
# doc_id = WAV ([channels, rate, n_samples, amplitude, zero-crossings]),
# even = PPM ([width, height, mean_r, mean_g, mean_b]); every value an
# exact integer, so the hash certifies the byte-level decode round-trip
_MULTIMODAL_DECODED_SQL = """
SELECT doc_id AS media_id,
  CASE WHEN doc_id % 2 = 1 THEN 'audio' ELSE 'image' END AS modality,
  CAST(CASE WHEN doc_id % 2 = 1 THEN 1
       ELSE 4 + doc_id % 5 END AS DOUBLE) AS f1,
  CAST(CASE WHEN doc_id % 2 = 1 THEN 8000
       ELSE 3 + doc_id % 4 END AS DOUBLE) AS f2,
  CAST(CASE WHEN doc_id % 2 = 1 THEN 128 + (doc_id % 5) * 16
       ELSE doc_id % 256 END AS DOUBLE) AS f3,
  CAST(CASE WHEN doc_id % 2 = 1 THEN 1000 + (doc_id % 100) * 10
       ELSE (doc_id * 7) % 256 END AS DOUBLE) AS f4,
  CAST(CASE WHEN doc_id % 2 = 1
       THEN (128 + (doc_id % 5) * 16 - 1) // ((8 + (doc_id % 8) * 2) // 2)
       ELSE (doc_id * 13) % 256 END AS DOUBLE) AS f5
FROM documents WHERE doc_id < 300
"""

_MULTIMODAL_SQL = """
SELECT doc_id AS media_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
            WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
       32 AS n_bytes, 8 AS dim
FROM documents WHERE doc_id < 200
"""

# sliding windows: each event belongs to the two epoch-aligned 30-min
# slide starts covering it (window start ∈ {grid(ts), grid(ts)-30min},
# keep when ts < start + 1h) — Spark's window(ts, '1 hour', '30 minutes')
_EVENTS_SLIDING_SQL = """
WITH cand AS (
  SELECT CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800 - s.ofs)
              AS TIMESTAMP) AS window_start,
         event_type, value, ts
  FROM events
  CROSS JOIN (SELECT unnest([0, 1800]) AS ofs) s
)
SELECT window_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS total_value
FROM cand
WHERE epoch(ts) < epoch(window_start) + 3600
GROUP BY 1, 2
"""

_EVENTS_SESSION_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts,
         epoch_us(ts) - lag(epoch_us(ts)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
), f AS (
  SELECT user_id,
         CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END
           AS new_session
  FROM g
)
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM f GROUP BY user_id
"""


def _redact_sql() -> str:
    """DuckDB twin of redact_pii over the SAME injected-PII text as
    _q_redact_pii: the chain is generated from _REDACT_PATTERNS itself
    so the oracle can never drift from the shipped patterns (they are
    RE2/Java-portable by design — pinned by the hypothesis pure-``re``
    mirror in tests/test_text_functions.py). Counts run on the
    progressively masked text, exactly like the Spark side."""
    from pyrdf2vec_spark.functions.text import _REDACT_PATTERNS

    inject = (
        "'see https://ex.com/' || doc_id || '?q=1 mail u' || doc_id || "
        "'@ex-mail.org call +1 415-555-' || "
        "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
        "' card 4242 4242 4242 4242 :: ' || text"
    )
    sql = f"WITH t0 AS (SELECT doc_id, {inject} AS t, 0 AS n FROM documents)"
    prev = "t0"
    for i, (kind, pat) in enumerate(_REDACT_PATTERNS.items(), 1):
        lit = pat.replace("'", "''")
        sql += (
            f", t{i} AS (SELECT doc_id, "
            f"regexp_replace(t, '{lit}', '<{kind.upper()}>', 'g') AS t, "
            f"n + len(regexp_extract_all(t, '{lit}')) AS n FROM {prev})"
        )
        prev = f"t{i}"
    return (
        sql + f" SELECT doc_id, t AS text_redacted, "
        f"CAST(n AS INTEGER) AS n_redactions FROM {prev}"
    )


# decontamination oracle: same derived benchmark (every 89th doc), same
# benchmark-relative ratio, same round-then-filter rule as the Spark side
_DECON_SQL = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), ' +') AS ws
  FROM documents
), idx AS (
  SELECT doc_id, ws,
         unnest(generate_series(1, greatest(1, len(ws) - 2))) AS i
  FROM w
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS s FROM idx
), bench AS (
  SELECT doc_id AS bench_id, s FROM sh WHERE doc_id % 89 = 0
), bsz AS (
  SELECT bench_id, count(*) AS n FROM bench GROUP BY bench_id
), hits AS (
  SELECT d.doc_id, b.bench_id, count(*) AS c
  FROM sh d JOIN bench b USING (s)
  GROUP BY d.doc_id, b.bench_id
)
SELECT h.doc_id, h.bench_id, round(c / z.n, 6) AS overlap_ratio
FROM hits h JOIN bsz z USING (bench_id)
WHERE round(c / z.n, 6) >= 0.5
"""


def oracle_sql() -> dict[str, str]:
    return {
        "kg_triples": TPCH_TRIPLES_SQL,
        "kg_edges": TPCH_EDGES_SQL,
        "kg_vertices": f"""{_EDGES_CTE}
            SELECT name, FALSE AS is_predicate FROM (
              SELECT DISTINCT src AS name FROM edges
              UNION SELECT DISTINCT dst FROM edges)
            UNION ALL
            SELECT DISTINCT pred AS name, TRUE AS is_predicate FROM edges
        """,
        "kg_hops_customers": f"""{_EDGES_CTE}
            SELECT * FROM edges WHERE src LIKE 'c:%'
        """,
        "kg_hops_reverse_nations": f"""{_EDGES_CTE}
            SELECT dst AS node, pred, src AS parent FROM edges
            WHERE dst LIKE 'n:%'
        """,
        "kg_bfs_depth2": f"""{_EDGES_CTE}
            SELECT e1.src AS entity,
                   e1.src || '->' || e1.pred || '->' || e1.dst || '->' ||
                   e2.pred || '->' || e2.dst AS walk_str
            FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
            WHERE e1.src LIKE 'c:%'
        """,
        "kg_existence": f"""{_EDGES_CTE},
            names AS (SELECT DISTINCT src AS name FROM edges
                      UNION SELECT DISTINCT dst FROM edges),
            probe AS (SELECT DISTINCT src AS name FROM edges WHERE src LIKE 'c:%'
                      UNION ALL SELECT 'c:-1' UNION ALL SELECT 'ghost:99')
            SELECT p.name FROM probe p LEFT JOIN names n USING (name)
            WHERE n.name IS NULL
        """,
        "kg_literal_chain": f"""{_EDGES_CTE}
            SELECT DISTINCT e1.src AS entity, e2.dst AS value
            FROM edges e1 JOIN edges e2
              ON e1.dst = e2.src AND e2.pred = 'has_name'
            WHERE e1.src LIKE 'c:%' AND e1.pred = 'in_nation'
        """,
        "sampler_objfreq": f"""{_EDGES_CTE}
            SELECT dst, count(*) AS weight FROM edges GROUP BY dst
        """,
        "sampler_predfreq": f"""{_EDGES_CTE}
            SELECT pred, count(*) AS weight FROM edges GROUP BY pred
        """,
        "sampler_objpredfreq": f"""{_EDGES_CTE}
            SELECT pred, dst, count(*) AS weight FROM edges GROUP BY pred, dst
        """,
        "sampler_wide": f"""{_EDGES_CTE},
            outdeg AS (SELECT src, count(*) AS nc FROM edges GROUP BY src),
            predcnt AS (SELECT pred, count(*) AS pd FROM edges GROUP BY pred)
            SELECT e.src, e.pred, e.dst,
                   round((1.0 + coalesce(o.nc, 0)) * ((p.pd + 1.0) / 2.0), 4)
                     AS weight
            FROM edges e
            LEFT JOIN outdeg o ON o.src = e.dst
            JOIN predcnt p ON p.pred = e.pred
        """,
        "sampler_norm_objfreq": f"""{_EDGES_CTE},
            w AS (SELECT dst, count(*) AS wt FROM edges GROUP BY dst)
            SELECT e.src, e.pred, e.dst,
                   round(w.wt / sum(w.wt) OVER (PARTITION BY e.src), 6)
                     AS norm_weight
            FROM edges e JOIN w ON w.dst = e.dst
        """,
        "pagerank": _pagerank_sql(0.85, 20),
        "community_labels": _lpa_sql(5),
        "community_sampled_walks": _community_dfs_sql(3, 0.15, 42, 5),
        "walks_dfs_sampled": _dfs_sql(3, 42),
        "walks_dfs_canonical": _dfs_sql(3, 42, canonical=True),
        "split_degrees": f"""{_EDGES_CTE},
            names AS (SELECT DISTINCT src AS name FROM edges
                      UNION SELECT DISTINCT dst FROM edges),
            indeg AS (SELECT dst AS name, count(*) AS deg
                      FROM edges GROUP BY dst)
            SELECT n.name, coalesce(i.deg, 0) AS deg
            FROM names n LEFT JOIN indeg i USING (name)
        """,
        "walk_walklet": _WALKLET_SQL,
        "walk_halk": _HALK_SQL,
        "walk_halk_reverse": _HALK_REV_SQL,
        "walk_ngram": _NGRAM_SQL,
        "walk_split": _SPLIT_SQL,
        "walk_with_reverse": f"""{_EDGES_CTE}
            SELECT r.src || '->' || r.pred || '->' || f.src || '->' ||
                   f.pred || '->' || f.dst AS walk_str,
                   f.src AS entity
            FROM edges r JOIN edges f ON r.dst = f.src
            WHERE f.src LIKE 'c:%'
        """,
        "walk_anonymous": f"""{_EDGES_CTE}
            SELECT DISTINCT e1.src AS entity,
                   e1.src || '->1->2->3->4' AS walk_str
            FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
            WHERE e1.src LIKE 'c:%'
        """,
        "walk_wl_depth1": _wl_depth1_sql(),
        "text_token_stats": _TOKSTATS_SQL,
        "text_quality": _QUALITY_SQL,
        # text_langid/_LANGID_SQL and text_fingerprint/_FINGERPRINT_SQL
        # rotated out this round (see queries()); their SQL stays for
        # the next rotation
        "redact_pii": _redact_sql(),
        "decontaminate": _DECON_SQL,
        "text_chunks": _CHUNKS_SQL,
        "embed_quantized": _EMB_QUANT_SQL,
        "embed_quantized_topk": _EMB_QUANT_TOPK_SQL,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, count(*) AS n_dups,
                   min(doc_id) AS keep_id
            FROM documents GROUP BY md5(text)
        """,
        "dedup_ngram_pairs": _NGRAM_PAIRS_SQL,
        "dedup_minhash_pairs": _minhash_pairs_sql(),
        "dedup_components": _DEDUP_COMPONENTS_SQL_TEMPLATE.format(
            near_sql=_minhash_pairs_sql()
        ),
        "dedup_simhash64": _SIMHASH64_SQL,
        "dedup_simhash_pairs64": _SIMHASH64_PAIRS_SQL,
        "embed_topk": _EMB_TOPK_SQL,
        "embed_ivf_topk": _IVF_TOPK_SQL,
        "wl_labels_n1": _WL_N1_SQL,
        "embed_neardup": _NEARDUP_SQL.format(
            COS=_cos_sql("x.v", "y.v"),
            COS_VC=_cos_sql("embedding", "centroid"),
        ),
        "multimodal_features": _MULTIMODAL_SQL,
        "multimodal_decoded": _MULTIMODAL_DECODED_SQL,
        "transcript_triples": _TRANSCRIPT_TRIPLES_SQL,
        "events_hourly": _EVENTS_HOURLY_SQL,
        "events_sessionize": _EVENTS_SESSION_SQL,
        "events_sliding": _EVENTS_SLIDING_SQL,
        # pagerank / walks_dfs_sampled / embed_neardup: iterative or
        # RNG-distribution operators — rows-only checks by design.
    }
