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


# PII / pattern scrubbing: RE2-compatible patterns (pyarrow's
# replace_substring_regex and DuckDB's regexp_replace both run RE2, so the
# oracle matches byte-for-byte). The standard pre-training redaction pass.
PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "PHONE": r"\+?[0-9][0-9() .-]{6,}[0-9]",
    "NUM": r"[0-9]+",
}


def scrub_patterns(ds, text_col: str, patterns: dict, out_col: str | None = None):
    """Redact every match of each pattern with ``<LABEL>`` and count the
    redactions — fully vectorized Arrow regex kernels (one C pass per
    pattern per batch, no per-row Python). Emits ``{out_col}`` (the scrubbed
    text) and ``n_<label>`` match counts per row.

    Reference analogue: the per-token drop filters of the recognize loop
    (``provider.h:26``) generalized to content-rewriting filters; the
    pattern set is the caller's policy (PII_PATTERNS covers the usual
    email/phone/number classes)."""
    import pyarrow as pa_mod
    import pyarrow.compute as pc

    out_col = out_col or f"{text_col}_scrubbed"

    def _scrub(t: pa_mod.Table) -> pa_mod.Table:
        # counts measured on the ORIGINAL text (order-independent, so the
        # SQL oracle is a flat projection); replacements applied in pattern
        # order on the running string
        cur = t[text_col]
        for label, pat in patterns.items():
            n = pc.count_substring_regex(t[text_col], pat)
            t = t.append_column(f"n_{label.lower()}", pc.cast(n, pa_mod.int64()))
            cur = pc.replace_substring_regex(cur, pat, f"<{label}>")
        return t.append_column(out_col, cur)

    return ds.map_batches(_scrub, batch_format="pyarrow")


def assign_split(
    ds,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    mod: int = 100,
):
    """Deterministic train/val/test assignment by md5(id) — reproducible at
    any parallelism and re-run (unlike random_sample), disjoint by
    construction, and expressible in SQL for the oracle. The md5 is the only
    per-row Python here (kept for DuckDB hash parity — cf. q_hash_sample);
    everything downstream is vectorized."""
    import pyarrow as pa_mod

    def _split(batch: pd.DataFrame) -> pd.DataFrame:
        h = np.array(
            [
                int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % mod
                for d in batch[id_col]
            ],
            dtype=np.int64,
        )
        out = batch.copy()
        out["split"] = np.where(
            h < train_pct, "train", np.where(h < train_pct + val_pct, "val", "test")
        )
        return out

    return ds.map_batches(_split, batch_format="pandas")


def repetition_stats(ds, id_col: str, text_col: str):
    """Gopher-style repetition features: distinct-token fraction and
    most-common-token share, fixed-point e4. High repetition (low distinct
    fraction / high top-token share) marks low-quality boilerplate docs —
    a standard pre-training quality gate."""

    def _rep(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.split(" ")
        n = toks.map(len).astype("int64").clip(lower=1)
        n_distinct = toks.map(lambda ws: len(set(ws))).astype("int64")
        top = toks.map(
            lambda ws: max(pd.Series(ws).value_counts().iloc[0], 1) if ws else 0
        ).astype("int64")
        out = batch[[id_col]].copy()
        out["n_tokens"] = n
        out["distinct_frac_e4"] = np.floor(n_distinct * 10000.0 / n + 0.5).astype("int64")
        out["top_token_frac_e4"] = np.floor(top * 10000.0 / n + 0.5).astype("int64")
        return out

    return ds.map_batches(_rep, batch_format="pandas")


def token_frequencies(ds, text_col: str, top_k: int = 100):
    """Corpus-wide token frequency table, top-k by count (vocabulary
    building — the first step of tokenizer training). Combine-before-
    shuffle: each block collapses to its own (token, n) partials (a block
    contributes at most its distinct-token count), the global groupby sums
    partials, and the final sort+limit runs over the vocabulary-sized
    aggregate, never the corpus. Deterministic tie-break: (n desc, token
    asc)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in batch[text_col]:
            c.update(t.split(" "))
        return pd.DataFrame({"tok": list(c.keys()), "n": list(c.values())}).astype(
            {"n": "int64"}
        )

    agg = (
        ds.map_batches(_partial, batch_format="pandas")
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
    )

    def _order(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(["n", "tok"], ascending=[False, True])

    # the aggregate is vocabulary-sized (small vs corpus); one final sort
    return agg.map_batches(_order, batch_format="pandas").limit(top_k)


# URL canonicalization: the crawl-side key hygiene pass (dup detection is
# only as good as its url key). RE2-only constructs, so the DuckDB oracle
# is byte-exact. Order matters and is part of the contract:
#   1. drop the fragment;
#   2. drop utm_* tracking params (delimiter-preserving two-step);
#   3. lowercase scheme://host (path/query stay case-sensitive).
_URL_SPLIT = r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*://)(?P<host>[^/?#]*)(?P<rest>.*)$"


def normalize_urls(ds, url_col: str, out_col: str | None = None):
    """Vectorized URL canonicalization (see module comment for the rule
    order). Unparseable values (no scheme://host) pass through with only
    fragment/param stripping applied."""
    import pyarrow as pa_mod
    import pyarrow.compute as pc

    out_col = out_col or f"{url_col}_norm"

    def _norm(t: pa_mod.Table) -> pa_mod.Table:
        u = t[url_col]
        u = pc.replace_substring_regex(u, r"#.*$", "")
        # anchored to the ?/& delimiter (kept via backref) so a non-utm
        # param whose name merely contains "utm_" (e.g. ?xutm_a=1) is
        # never consumed; the (…&)+ repetition still clears consecutive
        # utm params in one pass
        u = pc.replace_substring_regex(
            u, r"([?&])(utm_[A-Za-z0-9_]*=[^&]*&)+", r"\1"
        )
        u = pc.replace_substring_regex(u, r"[?&]utm_[A-Za-z0-9_]*=[^&]*$", "")
        u = pc.replace_substring_regex(u, r"\?$", "")
        m = pc.extract_regex(u, _URL_SPLIT)  # struct<1,2,3> or null
        ok = pc.is_valid(m)
        lowered = pc.binary_join_element_wise(
            pc.utf8_lower(pc.struct_field(m, "scheme")),
            pc.utf8_lower(pc.struct_field(m, "host")),
            pc.struct_field(m, "rest"),
            "",
        )
        return t.append_column(out_col, pc.if_else(ok, lowered, u))

    return ds.map_batches(_norm, batch_format="pyarrow")
