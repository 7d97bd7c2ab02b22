"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
decode/feature-extract as Arrow-batched mapInPandas.

The image/audio libraries are not in this container, so the DECODE step
is stubbed (NotImplementedError for real codecs, a deterministic fake
for tests) — but the Spark-side plumbing is real: binary column schema,
partition-preserving batch iteration, fixed-dim feature output, and the
UDF signature a real decoder would drop into.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),   # image|audio|video
        StructField("payload", BinaryType(), False),    # opaque bytes
        StructField("mime", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("feature", ArrayType(FloatType(), False), False),
        StructField("n_bytes", IntegerType(), False),
    ]
)


def synth_media(documents: DataFrame) -> DataFrame:
    """Deterministic opaque media table derived from document text
    (payload = repeated md5 bytes) — stands in for real blobs so the
    binary-column plumbing is exercised end-to-end."""
    mod = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.unhex(F.concat(F.md5("text"), F.md5(F.concat(F.lit("x"), "text"))))
    return documents.select(
        F.col("doc_id").alias("media_id"),
        mod.alias("modality"),
        payload.alias("payload"),
        F.concat(F.lit("application/x-fake-"), mod).alias("mime"),
        F.length(payload).cast("int").alias("n_bytes"),
    )


def decode_real(payload: bytes, mime: str) -> np.ndarray:
    """Real decoder hook — wire PIL/librosa/av here on a cluster with
    the codecs installed."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use fake_features (deterministic) or install decoders"
    )


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature: byte-histogram moments folded to
    `dim` — same shape/contract a real embedding model would return."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    reps = int(np.ceil(dim / max(1, len(arr)))) + 1
    tiled = np.tile(arr, reps)[:dim]
    return (tiled - arr.mean()) / (arr.std() + 1.0)


def extract_features(
    media: DataFrame, dim: int = 8, use_real_decoder: bool = False
) -> DataFrame:
    """Batch feature extraction over the media table. Arrow batches in,
    fixed-dim float vectors out; partitioning untouched (no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, mime in zip(pdf["payload"], pdf["mime"]):
                if use_real_decoder:
                    vec = decode_real(bytes(payload), mime)[:dim]
                else:
                    vec = _fake_feature(bytes(payload), dim)
                feats.append([float(x) for x in vec])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "feature": feats,
                    "n_bytes": pdf["n_bytes"],
                }
            )

    return media.select(
        "media_id", "modality", "payload", "mime", "n_bytes"
    ).mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: which frame indices a decoder would
    materialize (metadata-only — the real frame decode plugs into
    extract_features). Demonstrates the explode-shaped output a frame
    sampler produces."""
    n_frames = (F.col("n_bytes") / 4).cast("int")  # fake: 4 bytes/frame
    return (
        media.where(F.col("modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
