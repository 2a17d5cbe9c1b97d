"""Sketch accuracy + mergeability + partitioning invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ocr_suite_ray.stages.sketches import (
    approx_distinct,
    approx_quantiles,
    hll_estimate,
    hll_merge,
    hll_partial,
)


def test_hll_accuracy_local():
    vals = [f"user-{i}" for i in range(50_000)]
    est = hll_estimate(hll_partial(vals))
    assert abs(est - 50_000) / 50_000 < 0.05


def test_hll_merge_equals_union():
    a = [f"x{i}" for i in range(10_000)]
    b = [f"x{i}" for i in range(5_000, 15_000)]  # overlap
    merged = hll_merge([hll_partial(a), hll_partial(b)])
    est = hll_estimate(merged)
    assert abs(est - 15_000) / 15_000 < 0.05
    # merging is idempotent/deterministic
    assert hll_merge([hll_partial(a), hll_partial(b)]) == merged


def test_approx_distinct_dataset(ray_session):
    import ray.data as rd

    t = pa.table({"u": [f"id{i % 3000}" for i in range(30_000)]})
    est1 = approx_distinct(rd.from_arrow(t), "u")
    est7 = approx_distinct(rd.from_arrow(t).repartition(7), "u")
    assert est1 == est7  # partitioning-invariant (deterministic sketch)
    assert abs(est1 - 3000) / 3000 < 0.05


def test_approx_quantiles_dataset(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(0)
    vals = rng.uniform(0, 200, size=40_000)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(9)
    qs = approx_quantiles(ds, "v", lo=0.0, hi=200.0, qs=(0.5, 0.95))
    assert abs(qs["q50"] - np.quantile(vals, 0.5)) < 1.0  # bin width 200/4096
    assert abs(qs["q95"] - np.quantile(vals, 0.95)) < 1.0
