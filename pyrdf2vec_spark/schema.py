"""Explicit StructType schemas for every table the engine produces/consumes.

The reference's data model is dynamically-typed attrs objects
(pyrdf2vec/graphs/vertex.py, pyrdf2vec/typings.py); here every abstraction
is a fixed columnar schema (SURVEY.md §1.1).
"""

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Input per BASELINE.json input_hint: multi-turn conversation transcripts.
TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), False),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

# One row per (subj, pred, obj) — the reference's add_walk unit
# (pyrdf2vec/graphs/kg.py:196-216); we keep a direct edge table rather
# than its subj→pred→obj two-edge encoding.
TRIPLE_SCHEMA = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
    ]
)

VERTEX_SCHEMA = StructType(
    [
        StructField("name", StringType(), False),
        StructField("is_predicate", BooleanType(), False),
    ]
)

# edges == deduplicated triples with graph-oriented column names.
EDGE_SCHEMA = StructType(
    [
        StructField("src", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("dst", StringType(), False),
    ]
)

# A walk: root entity + alternating (pred, entity) strings
# (pyrdf2vec/typings.py:8-9 SWalk).
WALK_SCHEMA = StructType(
    [
        StructField("entity", StringType(), False),
        StructField("walk", ArrayType(StringType(), False), False),
    ]
)

EMBEDDING_SCHEMA = StructType(
    [
        StructField("word", StringType(), False),
        StructField("vector", ArrayType(FloatType(), False), False),
    ]
)

# Extraction output before graph build: provenance-carrying triples.
MENTION_TRIPLE_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("score", DoubleType(), False),
    ]
)

# Stage manifest row (north rule: per-partition lineage + metrics,
# checkpoint-resumable stage manifests).
MANIFEST_SCHEMA = StructType(
    [
        StructField("stage", StringType(), False),
        StructField("run_id", StringType(), False),
        StructField("input_fingerprint", StringType(), True),
        StructField("output_path", StringType(), True),
        StructField("row_count", LongType(), True),
        StructField("num_partitions", IntegerType(), True),
        StructField("metrics_json", StringType(), True),
        StructField("status", StringType(), False),
    ]
)
