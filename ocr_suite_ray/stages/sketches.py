"""Mergeable sketches: HyperLogLog distinct-count, histogram quantiles.

The reference has no approximate aggregates (SURVEY §2.6), but a
trillion-row pipeline needs them: exact distinct/quantile over 10^12 rows
is an all-to-all shuffle; a sketch is one small partial per block plus a
tree merge. Pattern (per the public Ray guidance on aggregation at scale):
``map_batches`` emits ONE serialized sketch row per block, a tiny second
stage merges — sketches are designed to be mergeable.

Both sketches here are deterministic (fixed hash, fixed bins): same input
set → same estimate at any parallelism.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa

HLL_P = 12  # 2^12 registers → ~1.6% standard error
_M = 1 << HLL_P


def _hash64(values) -> np.ndarray:
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = struct.unpack(
            "<Q", hashlib.blake2b(str(v).encode(), digest_size=8).digest()
        )[0]
    return out


def hll_partial(values) -> bytes:
    """One HLL register array from a batch of values (serialized).

    register index = top P hash bits; rank = position of the first set bit
    in the remaining 64-P bits (1-based, capped at 64-P+1)."""
    regs = np.zeros(_M, dtype=np.uint8)
    if len(values):
        h = _hash64(values)
        idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
        rest = h & np.uint64((1 << (64 - HLL_P)) - 1)
        w = 64 - HLL_P
        rank = np.array(
            [w + 1 if r == 0 else w - int(r).bit_length() + 1 for r in rest.tolist()],
            dtype=np.uint8,
        )
        np.maximum.at(regs, idx, rank)
    return regs.tobytes()


def hll_merge(partials: list[bytes]) -> bytes:
    regs = np.zeros(_M, dtype=np.uint8)
    for p in partials:
        regs = np.maximum(regs, np.frombuffer(p, dtype=np.uint8))
    return regs.tobytes()


def hll_estimate(partial: bytes) -> float:
    regs = np.frombuffer(partial, dtype=np.uint8).astype(np.float64)
    alpha = 0.7213 / (1 + 1.079 / _M)
    est = alpha * _M * _M / np.sum(2.0 ** (-regs))
    zeros = np.sum(regs == 0)
    if est <= 2.5 * _M and zeros > 0:  # small-range correction
        est = _M * np.log(_M / zeros)
    return float(est)


def approx_distinct(ds, col: str) -> int:
    """Distinct-count estimate: one HLL partial per block, merged once."""
    def _p(t: pa.Table) -> pa.Table:
        return pa.table({"sk": pa.array([hll_partial(t[col].to_pylist())], pa.binary())})

    parts = ds.map_batches(_p, batch_format="pyarrow").take_all()
    merged = hll_merge([r["sk"] for r in parts])
    return int(round(hll_estimate(merged)))


# ---------------------------------------------------------------------------


class HistogramSketch:
    """Fixed-range histogram quantile sketch — deterministic, mergeable.
    Error bound: (hi-lo)/bins per quantile."""

    def __init__(self, lo: float, hi: float, bins: int = 4096):
        self.lo, self.hi, self.bins = lo, hi, bins

    def partial(self, values: np.ndarray) -> np.ndarray:
        idx = np.clip(
            ((np.asarray(values, dtype=np.float64) - self.lo)
             / (self.hi - self.lo) * self.bins).astype(np.int64),
            0, self.bins - 1,
        )
        return np.bincount(idx, minlength=self.bins).astype(np.int64)

    def quantile(self, counts: np.ndarray, q: float) -> float:
        cum = np.cumsum(counts)
        total = cum[-1]
        pos = np.searchsorted(cum, q * total)
        return self.lo + (pos + 0.5) * (self.hi - self.lo) / self.bins


def approx_quantiles(ds, col: str, lo: float, hi: float, qs=(0.5, 0.95),
                     bins: int = 4096) -> dict:
    sk = HistogramSketch(lo, hi, bins)

    def _p(t: pa.Table) -> pa.Table:
        c = sk.partial(t[col].to_numpy(zero_copy_only=False))
        return pa.table({"counts": pa.array([c.tobytes()], pa.binary())})

    parts = ds.map_batches(_p, batch_format="pyarrow").take_all()
    merged = np.zeros(bins, dtype=np.int64)
    for r in parts:
        merged += np.frombuffer(r["counts"], dtype=np.int64)
    return {f"q{int(q * 100)}": sk.quantile(merged, q) for q in qs}
