"""Text analysis operators: token counting, quality scoring, language-ID,
document fingerprinting.

These are the training-data-pipeline extensions a web-scale corpus needs on
top of the reference's per-document recognize loop (the per-token filters of
the reference — min-length drop ``provider.h:26``, trim ``util.h:13-26`` —
generalize to per-document statistics here).

All stages are stateless vectorized ``map_batches`` fns or actor-pool
classes with compiled-regex state in ``__init__`` (the warm-Tesseract
pattern, ``tesseract.cpp:59-76``). Ratios/scores are emitted fixed-point
int64 so DuckDB oracles hash-match (see pipelines/queries.py).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

# language marker profiles: deterministic stopword sets over the synthetic
# vocabulary. Tie-break: first profile in this (fixed) order wins.
LANG_PROFILES: list[tuple[str, frozenset]] = [
    ("en", frozenset({"the", "a", "fast", "slow", "small", "big"})),
    ("query", frozenset({"query", "table", "join", "scan", "filter", "agg"})),
    ("stream", frozenset({"stream", "window", "batch", "spark", "vector"})),
]

STOPWORDS = frozenset({"the", "a", "and", "of", "to"})

# BPE-ish subword split: runs of letters, runs of digits, single punct
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


class TokenStats:
    """Per-doc token statistics. Actor-pool class: regex compiled once.

    Outputs: n_tokens (whitespace tokens), n_subwords (BPE-ish regex
    tokens), stop_ratio_e4 (fixed-point stopword share of whitespace
    tokens)."""

    def __init__(self) -> None:
        self._bpe = BPE_RE
        self._stop = STOPWORDS

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"]
        toks = texts.str.split(" ")
        n_tokens = toks.map(len).astype("int64")
        n_sub = texts.map(lambda t: len(self._bpe.findall(t))).astype("int64")
        n_stop = toks.map(lambda ws: sum(w in self._stop for w in ws)).astype("int64")
        out = batch[["doc_id"]].copy()
        out["n_tokens"] = n_tokens
        out["n_subwords"] = n_sub
        # floor(x+0.5) == round-half-away for non-negatives (DuckDB ROUND);
        # np.round is half-to-even and would diverge at exact halves
        out["stop_ratio_e4"] = (
            np.floor(n_stop * 10000.0 / n_tokens.clip(lower=1) + 0.5).astype("int64")
        )
        return out


def quality_score(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic integer quality score in [0, 100]:
    +40 if 50 <= n_tokens <= 1000, +30 if stop_ratio in [2%, 40%],
    +30 if mean whitespace-token length in [3, 12]. All integer compares on
    fixed-point values — exactly reproducible in SQL."""
    toks = batch["text"].str.split(" ")
    n_tokens = toks.map(len).astype("int64").clip(lower=1)
    n_stop = toks.map(lambda ws: sum(w in STOPWORDS for w in ws)).astype("int64")
    stop_e4 = np.floor(n_stop * 10000.0 / n_tokens + 0.5).astype("int64")
    # mean token length *100, integer: round(sum(len)*100 / n)
    sum_len = toks.map(lambda ws: sum(len(w) for w in ws)).astype("int64")
    mean_len_e2 = np.floor(sum_len * 100.0 / n_tokens + 0.5).astype("int64")
    score = (
        ((n_tokens >= 50) & (n_tokens <= 1000)).astype("int64") * 40
        + ((stop_e4 >= 200) & (stop_e4 <= 4000)).astype("int64") * 30
        + ((mean_len_e2 >= 300) & (mean_len_e2 <= 1200)).astype("int64") * 30
    )
    out = batch[["doc_id"]].copy()
    out["n_tokens"] = n_tokens
    out["stop_ratio_e4"] = stop_e4
    out["mean_token_len_e2"] = mean_len_e2
    out["quality"] = score
    return out


class LangId:
    """Marker-profile language ID: argmax of per-profile marker-word counts,
    deterministic tie-break by profile order; 'und' when all counts zero.
    Reference analogue: the language-pack knob (``tesseract.cpp:41-44``)
    turned into a data-derived classifier."""

    def __init__(self) -> None:
        self._profiles = LANG_PROFILES

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ")
        out = batch[["doc_id"]].copy()
        counts = []
        for name, words in self._profiles:
            c = toks.map(lambda ws, w=words: sum(t in w for t in ws)).astype("int64")
            out[f"c_{name}"] = c
            counts.append((name, c))
        best_name = pd.Series(["und"] * len(batch), index=batch.index)
        best_count = pd.Series([0] * len(batch), index=batch.index, dtype="int64")
        for name, c in counts:  # fixed order => deterministic argmax
            take = c > best_count
            best_name = best_name.mask(take, name)
            best_count = best_count.mask(take, c)
        out["lang_pred"] = best_name
        return out


def fingerprint(batch: pd.DataFrame) -> pd.DataFrame:
    """Content fingerprints: md5 hex (oracle-checkable — DuckDB md5()) and a
    64-bit polynomial rolling hash over whitespace tokens (the cheap
    streaming fingerprint; no SQL twin)."""
    out = batch[["doc_id"]].copy()
    out["md5"] = [hashlib.md5(t.encode()).hexdigest() for t in batch["text"]]

    def _roll(t: str) -> int:
        h = 1469598103934665603
        for w in t.split(" "):
            for ch in w.encode():
                h = ((h ^ ch) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
            h = (h * 31 + 7) & 0xFFFFFFFFFFFFFFFF
        return h >> 1  # fit in int64

    out["rolling_hash"] = [_roll(t) for t in batch["text"]]
    return out
