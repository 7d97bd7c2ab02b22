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


def _digest(conv_id: str, turn: int, seed: int) -> bytes:
    """ONE md5 digest per turn; every derived field reads disjoint byte
    slices of it. Engine-independent and cheap (1 hash vs 7)."""
    return hashlib.md5(f"{conv_id}|{turn}|{seed}".encode()).digest()


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


def _turn_fields(conv: int, turn: int, seed: int, vocab: tuple | None = None) -> tuple:
    """All derived fields for one (conv, turn) — the row-wise SPEC that
    the vectorized batch path must match byte-for-byte (tested).
    ``vocab`` = (n_persons, n_orgs, n_cities); None → module defaults."""
    n_p, n_o, n_c = vocab or (N_PERSONS, N_ORGS, N_CITIES)
    conv_id = f"conv{conv:08d}"
    d = _digest(conv_id, turn, seed)
    role = ROLES[2] if d[0] % 5 == 4 else ROLES[turn % 2]
    tmpl_i = d[1] % len(TEMPLATES)
    tmpl, skind, pred, okind = TEMPLATES[tmpl_i]
    tool = TOOLS[d[2] % len(TOOLS)] if role == "tool" else ""
    if skind is None:
        text = tmpl
        triple = None
    else:
        sizes = {"person": n_p, "org": n_o, "city": n_c}
        si = int.from_bytes(d[3:6], "big") % sizes[skind]
        oi = int.from_bytes(d[6:9], "big") % sizes[okind]
        if skind == okind and oi == si:
            oi = (oi + 1) % sizes[okind]
        sv = d[9] % 3
        ov = d[10] % 3
        text = tmpl.format(
            A=_surface(skind, si, sv), B=_surface(okind, oi, ov)
        )
        triple = (canonical_id(skind, si), pred, canonical_id(okind, oi))
    if role == "tool":
        text = f"[{tool}] {text}"
    ts = EPOCH + pd.Timedelta(seconds=conv * 97 + turn * 13)
    return conv_id, turn, role, text, tool, ts, triple


def _gen_batch(
    ids: pd.Series, turns_per_conv: int, seed: int, vocab: tuple | None = None
) -> pd.DataFrame:
    """Vectorized batch renderer of the _turn_fields spec: one md5 per
    turn, then numpy byte-slice arithmetic + numpy.select string
    assembly. ~10x the row-wise path; identical output (tested)."""
    import numpy as np

    n_p, n_o, n_c = vocab or (N_PERSONS, N_ORGS, N_CITIES)
    gids = np.asarray(ids, dtype=np.int64)
    conv = gids // turns_per_conv
    turn = gids % turns_per_conv
    conv_id = np.array([f"conv{c:08d}" for c in conv])
    digs = b"".join(
        hashlib.md5(f"{cid}|{t}|{seed}".encode()).digest()
        for cid, t in zip(conv_id, turn)
    )
    d = np.frombuffer(digs, dtype=np.uint8).reshape(-1, 16).astype(np.int64)
    is_tool = (d[:, 0] % 5) == 4
    role = np.where(is_tool, "tool", np.where(turn % 2 == 0, "user", "assistant"))
    tmpl_i = d[:, 1] % len(TEMPLATES)
    tool = np.where(is_tool, np.array(TOOLS)[d[:, 2] % len(TOOLS)], "")
    si_raw = (d[:, 3] << 16) | (d[:, 4] << 8) | d[:, 5]
    oi_raw = (d[:, 6] << 16) | (d[:, 7] << 8) | d[:, 8]
    sv = d[:, 9] % 3
    ov = d[:, 10] % 3

    sizes = {"person": n_p, "org": n_o, "city": n_c}

    def surf(kind_arr, idx_arr, var_arr):
        out = np.empty(len(idx_arr), dtype=object)
        for kind in ("person", "org", "city"):
            m = kind_arr == kind
            if not m.any():
                continue
            k = kind.capitalize()
            idx = idx_arr[m].astype(str)
            v0 = np.char.add(f"{k}_", idx)
            v1 = np.char.add(f"{kind} ", idx)
            v2 = np.char.add(f"{kind.upper()}-", idx)
            out[m] = np.select(
                [var_arr[m] == 0, var_arr[m] == 1], [v0, v1], v2
            )
        return out

    skind = np.array([TEMPLATES[i][1] or "" for i in range(len(TEMPLATES))])[tmpl_i]
    okind = np.array([TEMPLATES[i][3] or "" for i in range(len(TEMPLATES))])[tmpl_i]
    size_s = np.array([sizes.get(TEMPLATES[i][1], 1) for i in range(len(TEMPLATES))])[tmpl_i]
    size_o = np.array([sizes.get(TEMPLATES[i][3], 1) for i in range(len(TEMPLATES))])[tmpl_i]
    si = si_raw % size_s
    oi = oi_raw % size_o
    same = (skind == okind) & (skind != "") & (si == oi)
    oi = np.where(same, (oi + 1) % size_o, oi)

    has_ent = skind != ""
    a_surf = np.where(has_ent, surf(skind, si, sv), "")
    b_surf = np.where(has_ent, surf(okind, oi, ov), "")
    # template text assembly: split each template at {A}/{B}
    t_parts = []
    for tmpl, sk, _, _ in TEMPLATES:
        if sk is None:
            t_parts.append((tmpl, "", ""))
        else:
            pre, rest = tmpl.split("{A}")
            mid, post = rest.split("{B}")
            t_parts.append((pre, mid, post))
    pre = np.array([p[0] for p in t_parts], dtype=object)[tmpl_i]
    mid = np.array([p[1] for p in t_parts], dtype=object)[tmpl_i]
    post = np.array([p[2] for p in t_parts], dtype=object)[tmpl_i]
    text = pre + a_surf + mid + b_surf + post
    text = np.where(
        is_tool, "[" + tool.astype(object) + "] " + text, text
    )
    ts = EPOCH + pd.to_timedelta(conv * 97 + turn * 13, unit="s")
    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn.astype("int64"),
            "role": role,
            "text": text.astype(str),
            "tool": tool.astype(str),
            "ts": ts,
        }
    )


def _gen_batch_rowwise(
    ids: pd.Series, turns_per_conv: int, seed: int, vocab: tuple | None = None
) -> pd.DataFrame:
    """Row-wise rendering of the spec — kept as the differential oracle
    for the vectorized _gen_batch (tests assert frame equality)."""
    rows = []
    for gid in ids:
        conv, turn = divmod(int(gid), turns_per_conv)
        conv_id, turn_idx, role, text, tool, ts, _ = _turn_fields(
            conv, turn, seed, vocab
        )
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
    vocab: tuple | None = None,
) -> DataFrame:
    """Distributed transcript synthesis: spark.range fans the id space
    across executors; an Arrow-batched mapInPandas materializes rows.
    Output is identical regardless of partitioning."""
    total = n_conversations * turns_per_conv
    # one generation partition per core, but cap per-task row counts so
    # low-parallelism runs don't build multi-GB tasks downstream
    default_parts = max(
        spark.sparkContext.defaultParallelism, total // 1_000_000 + 1
    )
    rng = spark.range(0, total, 1, partitions or default_parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _gen_batch(pdf["id"], turns_per_conv, seed, vocab)
            out["turn_idx"] = out["turn_idx"].astype("int32")
            yield out

    return rng.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


def reference_transcripts(
    n_conversations: int,
    turns_per_conv: int = 10,
    seed: int = 42,
    vocab: tuple | None = None,
) -> pd.DataFrame:
    """Single-process pandas rendering of the same id space — the oracle
    for the per-turn text-equality invariant (BASELINE.json input_hint)."""
    ids = pd.Series(range(n_conversations * turns_per_conv))
    return _gen_batch(ids, turns_per_conv, seed, vocab)


def ground_truth_triples(
    n_conversations: int,
    turns_per_conv: int = 10,
    seed: int = 42,
    vocab: tuple | None = None,
) -> pd.DataFrame:
    """Planted (conv_id, turn_idx, subj, pred, obj) triples — the exact
    expected extraction output, for P/R computation."""
    rows = []
    for gid in range(n_conversations * turns_per_conv):
        conv, turn = divmod(gid, turns_per_conv)
        conv_id, turn_idx, _, _, _, _, triple = _turn_fields(
            conv, turn, seed, vocab
        )
        if triple is not None:
            rows.append((conv_id, turn_idx, *triple))
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "subj", "pred", "obj"]
    )


def scaled_vocab(n_conversations: int) -> tuple:
    """Entity-vocabulary sizes that grow with the corpus (≈1 person per
    4 conversations) so the synthetic KG stays sparse at every scale —
    matching how real entity populations grow with transcript volume."""
    n_p = max(200, n_conversations // 4)
    return (n_p, max(50, n_p // 4), max(30, n_p // 8))
