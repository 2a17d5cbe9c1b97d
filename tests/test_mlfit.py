"""Distributed linear fit: exactness vs numpy lstsq, invariance, ridge."""

from __future__ import annotations

import numpy as np
import pandas as pd
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


# ---------------------------------------------------------------------------
# logistic IRLS fit
# ---------------------------------------------------------------------------

def _irls_oracle(x, y, n_iters=2):
    """Sequential IRLS twin (same division-free rhs as the engine)."""
    X = np.column_stack([np.ones(len(x)), x])
    w = np.zeros(X.shape[1])
    for _ in range(n_iters):
        m = X @ w
        p = 1.0 / (1.0 + np.exp(-m))
        s = p * (1.0 - p)
        A = (X * s[:, None]).T @ X
        b = X.T @ (s * m + (y - p))
        w = np.linalg.solve(A, b)
    return w


@pytest.mark.parametrize("nparts", [1, 5])
def test_logistic_fit_matches_sequential_irls(ray_session, nparts):
    import ray
    import ray.data as rd

    from ocr_suite_ray.stages.mlfit import fit_logistic_ref, logistic_scores

    rng = np.random.RandomState(11)
    n = 2000
    x = rng.uniform(-2, 2, n)
    # a noisy separable-ish relationship
    y = (x + rng.normal(0, 0.8, n) > 0).astype(np.float64)
    df = pd.DataFrame({"doc_id": np.arange(n, dtype="int64"), "x": x, "y": y})
    ds = rd.from_pandas(df).repartition(nparts)
    ref = fit_logistic_ref(ds, ["x"], "y", n_iters=2)
    w = ray.get(ref)["w"].to_numpy(zero_copy_only=False)
    want = _irls_oracle(x, y, 2)
    assert np.allclose(w, want, rtol=1e-9, atol=1e-12)
    # positive slope: larger x -> higher probability
    assert w[1] > 0
    got = (
        logistic_scores(ds, ref, ["x"])
        .to_pandas().set_index("doc_id")["prob_e4"]
    )
    p = 1.0 / (1.0 + np.exp(-(want[0] + want[1] * x)))
    want_e4 = np.floor(p * 10000 + 0.5).astype("int64")
    assert (got.loc[np.arange(n)].to_numpy() == want_e4).all()


def test_logistic_fit_more_iters_converges(ray_session):
    """More Newton rounds move the fit toward the optimum: the round-5
    log-likelihood is no worse than round-2's."""
    import ray
    import ray.data as rd

    from ocr_suite_ray.stages.mlfit import fit_logistic_ref

    rng = np.random.RandomState(5)
    n = 1500
    x = rng.uniform(-3, 3, n)
    y = (rng.uniform(0, 1, n) < 1.0 / (1.0 + np.exp(-(0.5 + 1.5 * x)))).astype(
        np.float64
    )
    df = pd.DataFrame({"x": x, "y": y})
    ds = rd.from_pandas(df)

    def _ll(w):
        m = w[0] + w[1] * x
        p = 1.0 / (1.0 + np.exp(-m))
        eps = 1e-12
        return float(np.sum(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)))

    w2 = ray.get(fit_logistic_ref(ds, ["x"], "y", n_iters=2))["w"].to_numpy(
        zero_copy_only=False
    )
    w5 = ray.get(fit_logistic_ref(ds, ["x"], "y", n_iters=5))["w"].to_numpy(
        zero_copy_only=False
    )
    assert _ll(w5) >= _ll(w2) - 1e-9
    assert np.allclose(w5, _irls_oracle(x, y, 5), rtol=1e-8)
