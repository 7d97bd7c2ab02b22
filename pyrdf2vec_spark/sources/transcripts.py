"""Deterministic synthetic conversation-transcript source.

BASELINE.json input_hint mandates the input shape
(conv_id, turn_idx:int32, role, text, tool, ts:timestamp). This module
synthesizes it at any scale with NO external data and NO RNG state:
every field is a pure function of (conv_id, turn_idx, seed) through md5,
so generation is partitioning-independent, reproducible across engines
(the pandas reference implementation shares the exact same code path),
and supports the per-turn text-equality invariant by construction.

Entity mentions are planted from a closed vocabulary with known
surface-form variants (casing/punctuation/spacing noise), so
triple-extraction P/R and canonicalization cluster membership have exact
expected values (FIXTURES.md §1).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from pyrdf2vec_spark.schema import TRANSCRIPT_SCHEMA

ROLES = ("user", "assistant", "tool")
TOOLS = ("search", "calculator", "browser")

# canonical entity id spaces (sized relative to conversations at runtime)
N_PERSONS = 200
N_ORGS = 50
N_CITIES = 30

EPOCH = pd.Timestamp("2024-01-01 00:00:00")


def _h(*parts: object) -> int:
    """Engine-independent deterministic hash → non-negative int."""
    key = "|".join(str(p) for p in parts)
    return int(hashlib.md5(key.encode()).hexdigest()[:12], 16)


def _surface(kind: str, idx: int, variant: int) -> str:
    """Three deterministic surface-form variants per canonical entity.

    canonical id `person_17` renders as 'Person_17', 'person 17', or
    'PERSON-17' — same normalized key, different bytes, exercising the
    linking + canonicalization stages.
    """
    k = kind.capitalize()
    if variant == 0:
        return f"{k}_{idx}"
    if variant == 1:
        return f"{kind} {idx}"
    return f"{kind.upper()}-{idx}"


def canonical_id(kind: str, idx: int) -> str:
    return f"{kind}_{idx}"


# (template, subj kind, pred, obj kind); None → filler turn, no triple
TEMPLATES = (
    ("{A} works at {B} these days.", "person", "works_at", "org"),
    ("{A} lives in {B} now.", "person", "lives_in", "city"),
    ("I heard that {A} knows {B}.", "person", "knows", "person"),
    ("{A} is based in {B}.", "org", "based_in", "city"),
    ("nothing noteworthy happened in this turn.", None, None, None),
)


def _turn_fields(conv: int, turn: int, seed: int) -> tuple:
    """All derived fields for one (conv, turn). Shared by the Spark and
    pandas paths — the single source of truth for text equality."""
    conv_id = f"conv{conv:08d}"
    role = ROLES[2] if _h(conv_id, turn, "tool?", seed) % 5 == 4 else ROLES[turn % 2]
    tmpl_i = _h(conv_id, turn, "tmpl", seed) % len(TEMPLATES)
    tmpl, skind, pred, okind = TEMPLATES[tmpl_i]
    if role == "tool":
        tool = TOOLS[_h(conv_id, turn, "tool", seed) % len(TOOLS)]
    else:
        tool = ""
    if skind is None:
        text = tmpl
        triple = None
    else:
        sizes = {"person": N_PERSONS, "org": N_ORGS, "city": N_CITIES}
        si = _h(conv_id, turn, "s", seed) % sizes[skind]
        oi = _h(conv_id, turn, "o", seed) % sizes[okind]
        if skind == okind and oi == si:
            oi = (oi + 1) % sizes[okind]
        sv = _h(conv_id, turn, "sv", seed) % 3
        ov = _h(conv_id, turn, "ov", seed) % 3
        text = tmpl.format(
            A=_surface(skind, si, sv), B=_surface(okind, oi, ov)
        )
        triple = (canonical_id(skind, si), pred, canonical_id(okind, oi))
    if role == "tool":
        text = f"[{tool}] {text}"
    ts = EPOCH + pd.Timedelta(seconds=conv * 97 + turn * 13)
    return conv_id, turn, role, text, tool, ts, triple


def _gen_batch(ids: pd.Series, turns_per_conv: int, seed: int) -> pd.DataFrame:
    rows = []
    for gid in ids:
        conv, turn = divmod(int(gid), turns_per_conv)
        conv_id, turn_idx, role, text, tool, ts, _ = _turn_fields(conv, turn, seed)
        rows.append((conv_id, turn_idx, role, text, tool, ts))
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def synth_transcripts(
    spark: SparkSession,
    n_conversations: int,
    turns_per_conv: int = 10,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed transcript synthesis: spark.range fans the id space
    across executors; an Arrow-batched mapInPandas materializes rows.
    Output is identical regardless of partitioning."""
    total = n_conversations * turns_per_conv
    rng = spark.range(0, total, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _gen_batch(pdf["id"], turns_per_conv, seed)
            out["turn_idx"] = out["turn_idx"].astype("int32")
            yield out

    return rng.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


def reference_transcripts(
    n_conversations: int, turns_per_conv: int = 10, seed: int = 42
) -> pd.DataFrame:
    """Single-process pandas rendering of the same id space — the oracle
    for the per-turn text-equality invariant (BASELINE.json input_hint)."""
    ids = pd.Series(range(n_conversations * turns_per_conv))
    return _gen_batch(ids, turns_per_conv, seed)


def ground_truth_triples(
    n_conversations: int, turns_per_conv: int = 10, seed: int = 42
) -> pd.DataFrame:
    """Planted (conv_id, turn_idx, subj, pred, obj) triples — the exact
    expected extraction output, for P/R computation."""
    rows = []
    for gid in range(n_conversations * turns_per_conv):
        conv, turn = divmod(gid, turns_per_conv)
        conv_id, turn_idx, _, _, _, _, triple = _turn_fields(conv, turn, seed)
        if triple is not None:
            rows.append((conv_id, turn_idx, *triple))
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "subj", "pred", "obj"]
    )
