"""Text-analysis operators for training-data pipelines over a documents
table (doc_id, text, lang, source, n_chars). All Catalyst expressions —
whole-stage-codegen friendly, no UDFs — and each has an exact ANSI-SQL
twin for the DuckDB oracle (see __spark_entry__.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# token pattern shared by token counting and quality scoring: letter
# runs, digit runs, or single non-space symbols (BPE-ish pre-tokenizer)
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

# tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic
LANG_MARKERS = {
    "en": "(the|and|of|to|is)",
    "de": "(der|die|das|und|ist)",
    "fr": "(le|la|les|et|est)",
    "es": "(el|los|las|y|es)",
    "zh": "(de|shi|le|zai|he)",
}


def token_stats(documents: DataFrame) -> DataFrame:
    """Token counting: whitespace words + BPE-ish regex tokens."""
    lower = F.lower(F.col("text"))
    return documents.select(
        "doc_id",
        F.size(F.split(F.trim(lower), " +")).alias("n_words"),
        F.size(F.regexp_extract_all(lower, F.lit(TOKEN_RE), F.lit(0))).alias(
            "n_tokens"
        ),
        F.length("text").alias("n_chars_obs"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Quality scoring: length, mean word length, punctuation ratio,
    stopword ratio, and a composite score in [0, 1]."""
    lower = F.lower(F.col("text"))
    n_words = F.size(F.split(F.trim(lower), " +"))
    n_chars = F.length("text")
    n_punct = F.size(
        F.regexp_extract_all(lower, F.lit("[^a-z0-9 ]"), F.lit(0))
    )
    n_stop = F.size(
        F.regexp_extract_all(
            lower, F.lit(r"\b(the|and|of|to|is|a)\b"), F.lit(0)
        )
    )
    mean_wlen = (n_chars - (n_words - 1)) / n_words
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_words, F.lit(1))
    score = (
        F.least(n_words / F.lit(64.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3
    )
    # no rounding: the expression is evaluated in the same IEEE op order
    # in any engine, so raw doubles are bit-identical — while round()
    # half-way semantics differ between engines at boundaries like 0.86875
    return documents.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality_score"),
    )


def language_id(documents: DataFrame) -> DataFrame:
    """Stopword-profile language ID: score per language = marker-word
    hits; prediction = argmax with lexicographic tiebreak."""
    lower = F.lower(F.col("text"))
    scores = {
        lang: F.size(
            F.regexp_extract_all(lower, F.lit(rf"\b{pat}\b"), F.lit(0))
        )
        for lang, pat in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    # reverse lexicographic fold so ties resolve to the earliest language
    for lang in sorted(scores, reverse=True):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    out = documents.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang in sorted(scores)],
        pred.alias("lang_pred"),
    )
    return out


def chunk_documents(
    documents: DataFrame, chunk_words: int = 64, overlap_words: int = 16
) -> DataFrame:
    """Sliding-window document chunking — the standard prep step for
    training/embedding pipelines: each document becomes ⌈n/stride⌉
    word-window chunks of ``chunk_words`` words with ``overlap_words``
    of overlap (stride = chunk - overlap). Pure Catalyst: one
    sequence+transform per row, then posexplode — partition-local,
    zero shuffle, scales with executors.

    Output: (doc_id, chunk_idx, chunk_text, n_chunk_words). The final
    window is kept when shorter than chunk_words (never empty for
    non-empty text); windows that would start past the end are not
    emitted, so consecutive chunks overlap by exactly overlap_words
    except possibly the last.
    """
    if not 0 <= overlap_words < chunk_words:
        raise ValueError("need 0 <= overlap_words < chunk_words")
    stride = chunk_words - overlap_words
    words = "split(trim(lower(text)), ' +')"
    starts = (
        f"sequence(1, greatest(1, size({words}) - {overlap_words}), {stride})"
    )
    chunks = F.expr(
        f"transform({starts}, i -> slice({words}, i, {chunk_words}))"
    )
    return documents.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "_w")
    ).select(
        "doc_id",
        "chunk_idx",
        F.array_join("_w", " ").alias("chunk_text"),
        F.size("_w").alias("n_chunk_words"),
    )


def fingerprints(documents: DataFrame, shingle_words: int = 3) -> DataFrame:
    """Document fingerprinting: minimum md5 over word n-gram shingles
    (winnowing-style stable content fingerprint, robust to reordering
    of surrounding docs, deterministic across engines)."""
    words = F.split(F.trim(F.lower(F.col("text"))), " +")
    k = shingle_words
    shingles = F.expr(
        f"transform(sequence(1, greatest(1, size(split(trim(lower(text)), ' +')) - {k - 1})), "
        f"i -> array_join(slice(split(trim(lower(text)), ' +'), i, {k}), ' '))"
    )
    return documents.select(
        "doc_id",
        F.array_min(F.expr(
            f"transform(transform(sequence(1, greatest(1, size(split(trim(lower(text)), ' +')) - {k - 1})), "
            f"i -> array_join(slice(split(trim(lower(text)), ' +'), i, {k}), ' ')), s -> md5(s))"
        )).alias("fingerprint"),
        F.size(shingles).alias("n_shingles"),
    )
