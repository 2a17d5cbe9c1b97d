"""Distributed linear-model fitting — the quality-scorer training primitive.

Every curation recipe ends with a learned scorer (fastText-style quality
classifier, CCNet's LM filter, importance-weight regressors). The
distributive core is always the same: sufficient statistics (``X^T X``,
``X^T y``, ``n``) are SUMS, so each block contributes a d×d partial, a
remote tree reduces them, and ONE worker solves the d×d normal equations
(ridge-regularized). d is the feature count — single digits — so the
reduced artifact is tiny and the solve is microseconds; the corpus itself
never shuffles and is streamed exactly once per pass (one fit pass, one
score pass).

Reference analogue: the reference has no learned stage; this is part of the
training-data extension surface (SURVEY §2.11). Public method: ordinary
least squares / ridge via normal equations (any textbook).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _xy(t: pa.Table, x_cols: list, y_col: str):
    x = np.column_stack(
        [t[c].to_numpy(zero_copy_only=False).astype(np.float64) for c in x_cols]
    )
    x = np.column_stack([np.ones(len(x)), x])  # intercept first
    y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
    return x, y


def fit_linear_ref(ds, x_cols: list, y_col: str, l2: float = 0.0):
    """ObjectRef[pa.Table] of the fitted weight vector (column ``w``,
    intercept first) for ``y ~ X`` ridge least squares. The driver never
    sees row data — per-block sufficient statistics tree-reduce to one
    worker that solves the (d+1)x(d+1) system."""
    from ocr_suite_ray.state.dupset import coalesce_reduce

    d1 = len(x_cols) + 1

    def _partial(t: pa.Table) -> pa.Table:
        x, y = _xy(t, x_cols, y_col)
        xtx = x.T @ x  # (d1, d1)
        xty = x.T @ y  # (d1,)
        flat = np.concatenate([xtx.ravel(), xty])
        keys = [f"xtx_{i}_{j}" for i in range(d1) for j in range(d1)] + [
            f"xty_{i}" for i in range(d1)
        ]
        return pa.table(
            {"k": pa.array(keys, pa.string()), "v": pa.array(flat, pa.float64())}
        )

    def _combine(t: pa.Table) -> pa.Table:
        g = t.group_by("k").aggregate([("v", "sum")])
        # rebuild by NAME: group_by's key/aggregate column ORDER has
        # changed across pyarrow releases, and a positional rename would
        # silently swap k/v and blow up deep in the reduce tree
        return pa.table({"k": g["k"], "v": g["v_sum"]})

    def _solve(t: pa.Table) -> pa.Table:
        kv = dict(zip(t["k"].to_pylist(), t["v"].to_pylist()))
        xtx = np.array(
            [[kv[f"xtx_{i}_{j}"] for j in range(d1)] for i in range(d1)]
        )
        xty = np.array([kv[f"xty_{i}"] for i in range(d1)])
        reg = l2 * np.eye(d1)
        reg[0, 0] = 0.0  # never regularize the intercept
        w = np.linalg.solve(xtx + reg, xty)
        return pa.table({"w": pa.array(w, pa.float64())})

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    return coalesce_reduce(partials, _combine, _solve, materialize=False)


def linear_residuals(
    ds,
    weights_ref,
    x_cols: list,
    y_col: str,
    id_col: str = "doc_id",
):
    """Streaming score pass: ``(id_col, resid_e4)`` where resid = y - X·w
    under the broadcast weights (fixed-point e4). A residual far from 0 is
    the model-disagreement outlier signal curation uses for triage."""
    from ocr_suite_ray.stages._bcast import cached_get

    def _score(t: pa.Table) -> pa.Table:
        wt = cached_get(weights_ref)
        if wt is None:  # coalesce_reduce root: every fit block was empty
            raise ValueError(
                "linear_residuals: weights_ref resolves to None — "
                "fit_linear_ref saw an empty corpus, no model to score with"
            )
        w = wt["w"].to_numpy(zero_copy_only=False)
        x, y = _xy(t, x_cols, y_col)
        resid = y - x @ w
        return pa.table(
            {
                id_col: t[id_col],
                "resid_e4": pa.array(
                    np.floor(resid * 10000 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    return ds.map_batches(_score, batch_format="pyarrow")
