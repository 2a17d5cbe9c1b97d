"""Incremental keyed state in actors — the stream-shaped operator the
Dataset API cannot express (shared mutable per-key state across batches).

Reference analogue: the speed meter's windowed counters mutated by every
consumer under a mutex (``src/recognition/speed_meter.cpp:35-58``) and the
watermark's running max (``src/common/database.cpp:135-150``). Here the
state is sharded instead of locked: one ``@ray.remote`` actor per key-hash
bucket, each owning its keys' state, fed batches in event-time order.

Per the public Ray guidance for stream-shaped workloads: input is treated
as an ordered, partitioned log — the driver iterates the ts-sorted dataset
and routes each batch's rows to the bucket actors; actors apply updates
incrementally and can snapshot at any point. Ordering assumption: batches
arrive in global ts order (the caller sorts); within a batch, rows are
applied in position order.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd


class _BucketState:
    """Per-key incremental aggregates: count, sum, running max, EMA."""

    def __init__(self, alpha: float = 0.2) -> None:
        self._alpha = alpha
        self._state: dict = {}

    def update(self, keys, values) -> int:
        a = self._alpha
        st = self._state
        for k, v in zip(keys, values):
            s = st.get(k)
            if s is None:
                st[k] = [1, v, v, v]  # n, sum, max, ema
            else:
                s[0] += 1
                s[1] += v
                if v > s[2]:
                    s[2] = v
                s[3] = a * v + (1 - a) * s[3]
        return len(keys)

    def snapshot(self) -> pd.DataFrame:
        st = self._state
        return pd.DataFrame(
            {
                "key": list(st.keys()),
                "n": [s[0] for s in st.values()],
                "sum": [s[1] for s in st.values()],
                "max": [s[2] for s in st.values()],
                "ema": [s[3] for s in st.values()],
            }
        )


def streaming_keyed_aggregate(
    ds,
    key_col: str,
    ts_col: str,
    value_col: str,
    num_buckets: int = 8,
    alpha: float = 0.2,
    batch_size: int = 4096,
) -> pd.DataFrame:
    """Feed the ts-sorted stream through bucket actors; return the final
    per-key state (key, n, sum, max, ema). EMA depends on arrival order —
    exactly the semantics that force actor state instead of a groupby."""
    import ray

    BucketActor = ray.remote(_BucketState)
    actors = [BucketActor.remote(alpha) for _ in range(num_buckets)]

    sorted_ds = ds.sort([ts_col, key_col])
    pending = []
    for batch in sorted_ds.iter_batches(batch_size=batch_size, batch_format="pandas"):
        keys = batch[key_col].to_numpy()
        vals = batch[value_col].to_numpy()
        buckets = np.fromiter(
            (zlib.crc32(str(k).encode()) % num_buckets for k in keys),
            dtype=np.int64,
            count=len(keys),
        )
        # routing preserves within-batch order per bucket; batches are
        # applied in stream order per actor (awaited before next dispatch
        # to the same actor would reorder -> we simply wait per round)
        refs = []
        for b in range(num_buckets):
            m = buckets == b
            if m.any():
                refs.append(actors[b].update.remote(keys[m].tolist(), vals[m].tolist()))
        ray.get(refs)  # barrier per batch round: keeps per-actor order = ts order
        pending.clear()
    parts = ray.get([a.snapshot.remote() for a in actors])
    out = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame()
    return out.sort_values("key").reset_index(drop=True)
