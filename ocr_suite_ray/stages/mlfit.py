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


def fit_logistic_ref(
    ds, x_cols: list, y_col: str, n_iters: int = 2, l2: float = 0.0
):
    """ObjectRef[pa.Table] of logistic-regression weights (column ``w``,
    intercept first) fitted by ``n_iters`` IRLS (Newton) rounds from
    ``w = 0`` — the distributed ITERATIVE counterpart of
    :func:`fit_linear_ref`, i.e. the fastText-style quality-classifier
    training shape (CC-Net trains its page filter exactly like this:
    a linear model over cheap features).

    Per round: the corpus streams ONCE through a sufficient-statistic
    pass under the current broadcast weights — per block
    ``A += s·x xᵀ`` and ``b += x·(s·m + y − p)`` with ``m = x·w``,
    ``p = σ(m)``, ``s = p(1−p)`` (the division-free IRLS right-hand side,
    so saturated rows contribute 0 instead of NaN) — a remote tree
    reduces the (d+1)² floats and one worker solves the Newton system.
    Iteration count is FIXED (deterministic at any parallelism), weights
    never touch the driver, and the per-round exchange is O(d²)
    regardless of corpus size.
    """
    import ray

    from ocr_suite_ray.state.dupset import coalesce_reduce

    d1 = len(x_cols) + 1

    def _keys():
        return [f"a_{i}_{j}" for i in range(d1) for j in range(d1)] + [
            f"b_{i}" for i in range(d1)
        ]

    def _combine(t: pa.Table) -> pa.Table:
        g = t.group_by("k").aggregate([("v", "sum")])
        return pa.table({"k": g["k"], "v": g["v_sum"]})

    def _solve(t: pa.Table) -> pa.Table:
        kv = dict(zip(t["k"].to_pylist(), t["v"].to_pylist()))
        a = np.array([[kv[f"a_{i}_{j}"] for j in range(d1)] for i in range(d1)])
        b = np.array([kv[f"b_{i}"] for i in range(d1)])
        reg = l2 * np.eye(d1)
        reg[0, 0] = 0.0
        w = np.linalg.solve(a + reg, b)
        return pa.table({"w": pa.array(w, pa.float64())})

    w_ref = None  # round 0: w = 0 (p = 1/2, s = 1/4 — closed form)

    for _ in range(n_iters):
        cur_ref = w_ref

        def _partial(t: pa.Table, _wr=cur_ref) -> pa.Table:
            from ocr_suite_ray.stages._bcast import cached_get

            x, y = _xy(t, x_cols, y_col)
            if _wr is None:
                m = np.zeros(len(y))
            else:
                m = x @ cached_get(_wr)["w"].to_numpy(zero_copy_only=False)
            p = 1.0 / (1.0 + np.exp(-m))
            s = p * (1.0 - p)
            rhs = s * m + (y - p)
            a = (x * s[:, None]).T @ x
            b = x.T @ rhs
            return pa.table(
                {
                    "k": pa.array(_keys(), pa.string()),
                    "v": pa.array(np.concatenate([a.ravel(), b]), pa.float64()),
                }
            )

        partials = ds.map_batches(_partial, batch_format="pyarrow")
        w_ref = coalesce_reduce(partials, _combine, _solve, materialize=False)
        # the ref itself is never None (tree_reduce_refs always returns a
        # root ref); its VALUE is None on an empty corpus — check the tiny
        # O(d) weight table once per round so the failure is a clear
        # ValueError here, not a NoneType subscript inside a later task
        import ray as _ray

        if _ray.get(w_ref) is None:
            raise ValueError("fit_logistic_ref: empty corpus, nothing to fit")
    return w_ref


def logistic_scores(
    ds, weights_ref, x_cols: list, id_col: str = "doc_id"
):
    """Streaming score pass: ``(id_col, prob_e4)`` — σ(x·w) under the
    broadcast weights, fixed-point e4 (floor(p·10⁴ + 0.5))."""
    from ocr_suite_ray.stages._bcast import cached_get

    def _score(t: pa.Table) -> pa.Table:
        wt = cached_get(weights_ref)
        if wt is None:  # same guard as linear_residuals: empty-corpus fit
            raise ValueError(
                "logistic_scores: weights_ref resolves to None — the fit "
                "saw an empty corpus, no model to score with"
            )
        w = wt["w"].to_numpy(zero_copy_only=False)
        x = np.column_stack(
            [t[c].to_numpy(zero_copy_only=False).astype(np.float64) for c in x_cols]
        )
        x = np.column_stack([np.ones(len(x)), x])
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        return pa.table(
            {
                id_col: t[id_col],
                "prob_e4": pa.array(
                    np.floor(p * 10000 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    return ds.map_batches(_score, batch_format="pyarrow")
