"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
decode/feature-extract as Arrow-batched mapInPandas.

Two decode tiers:
- REAL codecs for container formats parseable with stdlib+numpy — WAV
  (RIFF/PCM16) and PPM (P6) — so at least one audio and one image
  modality run end-to-end through genuine byte-level decoding
  (:func:`decode_real`). Heavier codecs (JPEG/MP4/...) would plug into
  the same hook via PIL/av on a cluster that ships them.
- a deterministic fake (:func:`_fake_feature`) for opaque payloads, so
  the Spark-side plumbing (binary schema, partition-preserving Arrow
  batches, fixed-dim feature output) is exercised for any modality.
"""

from __future__ import annotations

import struct
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


def synth_real_media(documents: DataFrame) -> DataFrame:
    """Deterministic REAL-codec media table: WAV (RIFF/PCM16 square
    wave) for odd doc_ids, PPM (P6 solid color) for even — every
    container parameter is closed-form in doc_id, so a SQL oracle can
    certify the decode round-trip without a codec of its own. Generated
    partition-locally with mapInPandas (zero shuffle)."""
    schema = MEDIA_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "modality", "payload", "mime", "n_bytes")}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 2 == 1:
                    payload, modality, mime = _wav_bytes(d), "audio", "audio/wav"
                else:
                    payload, modality, mime = (
                        _ppm_bytes(d), "image", "image/x-portable-pixmap"
                    )
                rows["media_id"].append(d)
                rows["modality"].append(modality)
                rows["payload"].append(payload)
                rows["mime"].append(mime)
                rows["n_bytes"].append(len(payload))
            yield pd.DataFrame(rows)

    return documents.select("doc_id").mapInPandas(run, schema=schema)


def _wav_bytes(doc_id: int) -> bytes:
    """Mono PCM16 square wave in a standard 44-byte RIFF/WAVE container:
    amplitude 1000+(id%100)·10, period 8+(id%8)·2, 128+(id%5)·16
    samples at 8 kHz."""
    a = 1000 + (doc_id % 100) * 10
    p = 8 + (doc_id % 8) * 2
    n = 128 + (doc_id % 5) * 16
    samples = np.where((np.arange(n) % p) < p // 2, a, -a).astype("<i2")
    data = samples.tobytes()
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _ppm_bytes(doc_id: int) -> bytes:
    """P6 PPM, (4+id%5)×(3+id%4), every pixel (id, 7·id, 13·id) % 256."""
    w, h = 4 + doc_id % 5, 3 + doc_id % 4
    px = np.empty((h, w, 3), dtype=np.uint8)
    px[..., 0] = doc_id % 256
    px[..., 1] = (doc_id * 7) % 256
    px[..., 2] = (doc_id * 13) % 256
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a RIFF/WAVE container (PCM16 only): walk the chunk list,
    read fmt + data. Returns (n_channels, sample_rate, samples)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n_channels, rate, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, n_channels, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if fmt_tag != 1 or bits != 16:
                raise ValueError("only PCM16 supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if n_channels is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return n_channels, rate, np.frombuffer(data, dtype="<i2")


def decode_ppm(payload: bytes) -> np.ndarray:
    """Parse a binary P6 PPM (maxval ≤ 255) into an (H, W, 3) array."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("only 8-bit PPM supported")
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3)


def decode_real(payload: bytes, mime: str) -> np.ndarray:
    """REAL byte-level decode + canonical 5-dim feature vector:

    - WAV  → [n_channels, sample_rate, n_samples, max_abs, n_zero_cross]
    - PPM  → [width, height, mean_r, mean_g, mean_b]

    All five are exactly representable floats, so the decode round-trip
    is oracle-checkable to the last bit. Heavier codecs (JPEG/MP4)
    plug in here via PIL/av on a cluster that ships them."""
    if mime == "audio/wav" or payload[:4] == b"RIFF":
        ch, rate, s = decode_wav(payload)
        s64 = s.astype(np.int64)
        crossings = int(np.sum(s64[:-1] * s64[1:] < 0))
        return np.array(
            [ch, rate, len(s), int(np.max(np.abs(s64))) if len(s) else 0,
             crossings],
            dtype=np.float64,
        )
    if mime == "image/x-portable-pixmap" or payload[:2] == b"P6":
        px = decode_ppm(payload)
        h, w = px.shape[:2]
        means = px.reshape(-1, 3).mean(axis=0)
        return np.array([w, h, *means], dtype=np.float64)
    raise NotImplementedError(
        f"no codec for mime {mime!r} in this environment; "
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
