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


# patterns are deliberately simple and auditable: training-data
# redaction wants predictable recall over clever heuristics, and every
# expression stays a JVM-side regexp (whole-stage codegen, no UDF)
_REDACT_PATTERNS = {
    # dict order IS application order: most-specific first — url before
    # anything digit-shaped, card (13-19 digit shapes) before the
    # looser phone pattern
    # http(s) URLs up to whitespace
    "url": r"https?://[^\s]+",
    # local-part chars, @, dotted domain
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    # 13-19 digit runs with optional spaces/dashes (card-number shaped)
    "card": r"\b\d{4}[-\s]?\d{4}[-\s]?\d{4}[-\s]?\d{1,7}\b",
    # 7+ digit runs with optional separators/parens and intl prefix
    "phone": (
        r"(?:\+\d{1,3}[-.\s]?)?\(?\d{2,4}\)?[-.\s]?"
        r"\d{3,4}[-.\s]?\d{3,4}(?:[-.\s]?\d{1,4})?"
    ),
}


def redact_pii(documents: DataFrame, kinds: list | None = None) -> DataFrame:
    """PII-shaped span masking over ``text`` — the standard
    training-data scrub pass (emails, phone numbers, URLs, card-shaped
    digit runs → ``<KIND>`` placeholders), implemented as chained
    ``regexp_replace`` Catalyst expressions: partition-local, zero
    shuffle, no Python in the hot path.

    Returns (doc_id, text_redacted, n_redactions:int — total masked
    spans across the selected kinds). Application order is the fixed
    dict order — url → email → card → phone — so URLs' digit runs and
    card-shaped numbers are consumed before the looser phone pattern
    sees them.
    """
    kinds = list(_REDACT_PATTERNS) if kinds is None else kinds
    unknown = [k for k in kinds if k not in _REDACT_PATTERNS]
    if unknown:
        raise ValueError(
            f"unknown redaction kinds {unknown}; "
            f"valid: {sorted(_REDACT_PATTERNS)}"
        )
    ordered = [k for k in _REDACT_PATTERNS if k in kinds]
    masked = F.col("text")
    n_total = F.lit(0)
    for k in ordered:
        pat = _REDACT_PATTERNS[k]
        # column-API regexp_extract_all, NOT F.expr: embedding the
        # pattern in SQL text would re-parse its backslash escapes.
        # Counts run on the PROGRESSIVELY masked text, so a span
        # consumed by an earlier kind (a URL's digit run) is not
        # double-counted by a later one.
        n_total = n_total + F.size(
            F.regexp_extract_all(masked, F.lit(pat), F.lit(0))
        )
        masked = F.regexp_replace(masked, pat, f"<{k.upper()}>")
    return documents.select(
        "doc_id",
        masked.alias("text_redacted"),
        n_total.cast("int").alias("n_redactions"),
    )
