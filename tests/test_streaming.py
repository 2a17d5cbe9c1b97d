"""Keyed-state actor stage vs a pandas oracle (order-dependent EMA)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ocr_suite_ray.stages.streaming import streaming_keyed_aggregate


def _oracle(df: pd.DataFrame, alpha: float) -> pd.DataFrame:
    df = df.sort_values(["ts", "user_id"], kind="mergesort")
    rows = {}
    for _, r in df.iterrows():
        k, v = r["user_id"], r["value"]
        s = rows.get(k)
        if s is None:
            rows[k] = [1, v, v, v]
        else:
            s[0] += 1
            s[1] += v
            s[2] = max(s[2], v)
            s[3] = alpha * v + (1 - alpha) * s[3]
    return (
        pd.DataFrame(
            {
                "key": list(rows),
                "n": [s[0] for s in rows.values()],
                "sum": [s[1] for s in rows.values()],
                "max": [s[2] for s in rows.values()],
                "ema": [s[3] for s in rows.values()],
            }
        )
        .sort_values("key")
        .reset_index(drop=True)
    )


def test_streaming_keyed_aggregate_matches_sequential_oracle(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {
            "user_id": rng.randint(0, 20, size=3000),
            "ts": pd.to_datetime(rng.permutation(3000), unit="s"),
            "value": rng.uniform(0, 100, size=3000).round(3),
        }
    )
    got = streaming_keyed_aggregate(
        rd.from_pandas(df).repartition(6), "user_id", "ts", "value",
        num_buckets=4, alpha=0.2, batch_size=256,
    )
    want = _oracle(df, 0.2)
    pd.testing.assert_frame_equal(
        got.astype({"key": "int64"}), want.astype({"key": "int64"}),
        check_exact=False, rtol=1e-12,
    )
