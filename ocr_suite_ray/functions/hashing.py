"""Shared deterministic md5-prefix hash kernels.

The engine's reproducible-sampling contract: a row's "randomness" is the
top 32 bits of ``md5(str(key))`` (equal to ``int(hexdigest()[:8], 16)``),
optionally reduced mod ``m``. Every sampling primitive — ``hash_sample``,
``assign_split``, ``stratified_sample``, ``weighted_sample``, curation's
``sample_e4`` — routes through here so the rule lives in exactly one
place, stays run-to-run / parallelism independent, and remains
DuckDB-expressible for the oracles
(``CAST(('0x' || substr(md5(x), 1, 8)) AS UBIGINT)``).
"""

from __future__ import annotations

import hashlib

import numpy as np


def md5_u32(values, *, suffix: str = "") -> np.ndarray:
    """Top-32-bit md5 of ``str(v) + suffix`` per value → int64 ndarray.

    The md5 loop is the engine's one sanctioned per-row Python (kept for
    DuckDB hash parity — the SQL twins compute the same substr(md5) cast);
    ``digest()[:4]`` big-endian equals ``int(hexdigest()[:8], 16)`` without
    materializing the hex string.
    """
    sfx = suffix.encode()
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(v).encode() + sfx).digest()[:4], "big")
            for v in values
        ),
        dtype=np.int64,
        count=len(values),
    )


def md5_mod(values, mod: int, *, suffix: str = "") -> np.ndarray:
    """``md5_u32(values) % mod`` — the keep-threshold form used by all
    deterministic samplers (keep iff ``md5_mod(id, m) < threshold``)."""
    return md5_u32(values, suffix=suffix) % mod


def split_labels(hmod: np.ndarray, train_pct: int, val_pct: int) -> np.ndarray:
    """train/val/test labels from ``md5_mod(key, 100)`` values — THE split
    rule, kept in one place so the oracle-pinned assign_split and the
    pretrain funnel's leakage-safe host split can never diverge."""
    return np.where(
        hmod < train_pct, "train",
        np.where(hmod < train_pct + val_pct, "val", "test"),
    )

# int64 max is 19 digits — a 20-wide pad can never truncate, so the
# engine's zfill and DuckDB's lpad (which TRUNCATES longer inputs, unlike
# zfill/Arrow lpad) stay byte-identical for every representable id
ORDER_KEY_ID_WIDTH = 20


def salted_order_keys(ids, salt: str) -> list:
    """Deterministic unique order keys: md5-hex prefix (salted) + the
    zero-padded id — the shared recipe of ``shuffle_shards`` and
    ``token_budget_mixture`` (SQL twin:
    ``substr(md5(id || salt), 1, 8) || '-' || lpad(id, 20, '0')``).
    The md5 loop is the engine's one sanctioned per-row Python (DuckDB
    hash parity, cf. ``md5_u32``)."""
    import hashlib

    return [
        hashlib.md5((str(d) + salt).encode()).hexdigest()[:8]
        + "-"
        + str(d).zfill(ORDER_KEY_ID_WIDTH)
        for d in ids
    ]
