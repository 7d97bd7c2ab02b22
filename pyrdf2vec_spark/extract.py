"""Triple extraction from transcripts: batched mention detection +
entity-link scoring as vectorized pandas/Arrow UDFs over conv_id-partitioned
batches (north star; no per-row Python outside Arrow batches).

The reference consumes ready-made triples (KG.add_walk,
pyrdf2vec/graphs/kg.py:196-216); this stage PRODUCES them from raw
conversation text, emitting the same (subj, pred, obj) unit plus
provenance (conv_id, turn_idx) and a link score.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from pyrdf2vec_spark.schema import MENTION_TRIPLE_SCHEMA

# mention patterns: relation phrase → predicate. Surface forms are
# word-ish tokens possibly containing spaces/underscores/hyphens.
_ENT = r"([A-Za-z]+[ _-]\d+)"
PATTERNS = (
    (re.compile(_ENT + r" works at " + _ENT), "works_at"),
    (re.compile(_ENT + r" lives in " + _ENT), "lives_in"),
    (re.compile(r"that " + _ENT + r" knows " + _ENT), "knows"),
    (re.compile(_ENT + r" is based in " + _ENT), "based_in"),
)

_NORM = re.compile(r"[^a-z0-9]+")
_KEY = re.compile(r"^([a-z]+)[ _-]?(\d+)$")


def link_surface(surface: str) -> tuple[str, float]:
    """Entity linking: normalize a mention surface form to its canonical
    id. Synthetic vocabulary is closed, so normalization IS the linker;
    score models link confidence (1.0 exact-after-normalization, else a
    length-ratio fallback < 1)."""
    s = surface.strip().lower()
    m = _KEY.match(s)
    if m:
        return f"{m.group(1)}_{int(m.group(2))}", 1.0
    norm = _NORM.sub("_", s).strip("_")
    # idempotence: normalization may reveal the canonical key shape
    m = _KEY.match(norm)
    if m:
        return (
            f"{m.group(1)}_{int(m.group(2))}",
            min(1.0, len(norm) / max(1, len(s))),
        )
    return norm, min(1.0, len(norm) / max(1, len(s)))


def _link_series(surfaces: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Vectorized link_surface over a Series (C-level regex ops)."""
    s = surfaces.str.strip().str.lower()
    m = s.str.extract(_KEY)
    matched = m[0].notna()
    canon = pd.Series(index=s.index, dtype=object)
    canon[matched] = m.loc[matched, 0] + "_" + m.loc[matched, 1].astype(int).astype(str)
    fallback = s[~matched].str.replace(_NORM, "_", regex=True).str.strip("_")
    # idempotence: normalization may reveal the canonical key shape
    fm = fallback.str.extract(_KEY)
    fhit = fm[0].notna()
    if fhit.any():
        fallback = fallback.copy()
        fallback[fhit] = (
            fm.loc[fhit, 0] + "_" + fm.loc[fhit, 1].astype(int).astype(str)
        )
    canon[~matched] = fallback
    score = pd.Series(1.0, index=s.index)
    if (~matched).any():
        ratio = (
            fallback.str.len() / s[~matched].str.len().clip(lower=1)
        ).clip(upper=1.0)
        score[~matched] = ratio
    return canon, score


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized mention detection: one C-regex extract per pattern
    over the whole batch (each template plants ≤1 mention per turn),
    then vectorized linking. Semantics match the row-wise
    link_surface/PATTERNS spec (tested differentially)."""
    outs = []
    text = pdf["text"]
    for pat, pred in PATTERNS:
        m = text.str.extract(pat)
        hit = m[0].notna()
        if not hit.any():
            continue
        subj, s_score = _link_series(m.loc[hit, 0])
        obj, o_score = _link_series(m.loc[hit, 1])
        outs.append(
            pd.DataFrame(
                {
                    "conv_id": pdf.loc[hit, "conv_id"].to_numpy(),
                    "turn_idx": pdf.loc[hit, "turn_idx"].to_numpy(),
                    "subj": subj.to_numpy(),
                    "pred": pred,
                    "obj": obj.to_numpy(),
                    "score": pd.concat([s_score, o_score], axis=1)
                    .min(axis=1)
                    .to_numpy(),
                }
            )
        )
    if not outs:
        return pd.DataFrame(
            columns=["conv_id", "turn_idx", "subj", "pred", "obj", "score"]
        )
    return pd.concat(outs, ignore_index=True)


def extract_triples(
    transcripts: DataFrame, min_score: float = 0.5
) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) →
    (conv_id, turn_idx, subj, pred, obj, score).

    mapInPandas over the scan partitions — extraction is embarrassingly
    parallel per turn; no shuffle. The scan is column-pruned to the three
    needed columns (Catalyst pushes the projection into the source)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _extract_batch(pdf)
            out["turn_idx"] = out["turn_idx"].astype("int32")
            yield out

    cols = transcripts.select("conv_id", "turn_idx", "text")
    res = cols.mapInPandas(run, schema=MENTION_TRIPLE_SCHEMA)
    return res.where(F.col("score") >= min_score)


def triples_only(extracted: DataFrame) -> DataFrame:
    """Strip provenance → distinct graph triples ready for SparkKG."""
    return extracted.select("subj", "pred", "obj").dropDuplicates()


def precision_recall(
    extracted: DataFrame, truth: DataFrame
) -> tuple[float, float]:
    """Triple-extraction P/R vs planted ground truth, keyed on the full
    (conv_id, turn_idx, subj, pred, obj) row (BASELINE.md metric)."""
    keys = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    e = extracted.select(keys).dropDuplicates()
    t = truth.select(keys).dropDuplicates()
    n_e = e.count()
    n_t = t.count()
    hit = e.join(t, keys, "inner").count()
    precision = hit / n_e if n_e else 1.0
    recall = hit / n_t if n_t else 1.0
    return precision, recall
