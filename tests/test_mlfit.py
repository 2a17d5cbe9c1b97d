"""Distributed linear fit: exactness vs numpy lstsq, invariance, ridge."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ocr_suite_ray.stages.mlfit import fit_linear_ref, linear_residuals


def _rows(n=200, seed=5):
    rng = np.random.default_rng(seed)
    x1 = rng.uniform(0, 10, n)
    x2 = rng.uniform(-3, 3, n)
    y = 2.5 + 1.7 * x1 - 0.6 * x2 + rng.normal(0, 0.1, n)
    return [
        {"doc_id": i, "x1": float(x1[i]), "x2": float(x2[i]), "y": float(y[i])}
        for i in range(n)
    ]


def test_fit_matches_numpy_lstsq(ray_session):
    import ray
    import ray.data as rd

    rows = _rows()
    ds = rd.from_items(rows).repartition(5)
    w = ray.get(fit_linear_ref(ds, ["x1", "x2"], "y"))["w"].to_numpy()
    x = np.column_stack(
        [np.ones(len(rows)), [r["x1"] for r in rows], [r["x2"] for r in rows]]
    )
    y = np.array([r["y"] for r in rows])
    want, *_ = np.linalg.lstsq(x, y, rcond=None)
    np.testing.assert_allclose(w, want, rtol=1e-8)
    # recovers the planted coefficients
    np.testing.assert_allclose(w, [2.5, 1.7, -0.6], atol=0.1)


def test_fit_partition_invariance(ray_session):
    import ray
    import ray.data as rd

    rows = _rows(seed=9)

    def run(nparts):
        ds = rd.from_items(rows).repartition(nparts)
        ref = fit_linear_ref(ds, ["x1", "x2"], "y")
        got = linear_residuals(ds, ref, ["x1", "x2"], "y").take_all()
        return sorted((r["doc_id"], r["resid_e4"]) for r in got)

    assert run(1) == run(7)


def test_ridge_shrinks_weights(ray_session):
    import ray
    import ray.data as rd

    ds = rd.from_items(_rows())
    w0 = ray.get(fit_linear_ref(ds, ["x1", "x2"], "y", l2=0.0))["w"].to_numpy()
    w9 = ray.get(fit_linear_ref(ds, ["x1", "x2"], "y", l2=1e4))["w"].to_numpy()
    assert abs(w9[1]) < abs(w0[1]) and abs(w9[2]) < abs(w0[2])
