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


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

def _hh_corpus():
    """120 docs over a 60-token vocab with one planted heavy token (~25% of
    all occurrences) — heavy enough to survive any capacity >= 4."""
    docs = []
    for i in range(120):
        toks = [f"t{(i * 7 + j) % 60}" for j in range(9)] + ["HEAVY"] * 3
        docs.append(" ".join(toks))
    return docs


def test_heavy_hitters_exact_regime(ray_session):
    """capacity >= distinct items -> no compression -> exact counts."""
    from collections import Counter

    import ray.data as rd

    from ocr_suite_ray.stages.sketches import heavy_hitters

    docs = _hh_corpus()
    truth = Counter(tok for d in docs for tok in d.split(" "))
    ds = rd.from_items([{"text": d} for d in docs]).repartition(5)
    got = heavy_hitters(ds, "text", k=10, capacity=1000).to_pandas()
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["item"], got["n"])) == want


def test_heavy_hitters_sketch_guarantee(ray_session):
    """Sketch regime (capacity << distinct): every item with true frequency
    > n/(capacity+1) survives, and estimates never overcount / undercount
    by more than n/(capacity+1). Partitioning changes the estimates only
    within the bound."""
    from collections import Counter

    import ray.data as rd

    from ocr_suite_ray.stages.sketches import heavy_hitters

    docs = _hh_corpus()
    truth = Counter(tok for d in docs for tok in d.split(" "))
    n_total = sum(truth.values())
    cap = 8
    bound = n_total / (cap + 1)
    for parts in (1, 7):
        ds = rd.from_items([{"text": d} for d in docs]).repartition(parts)
        got = heavy_hitters(ds, "text", k=60, capacity=cap).to_pandas()
        est = dict(zip(got["item"], got["n"]))
        # the planted heavy item (360 occurrences > bound) must survive
        assert truth["HEAVY"] > bound
        assert "HEAVY" in est
        for item, e in est.items():
            t = truth[item]
            assert e <= t, f"{item}: overcount {e} > {t}"
            assert t - e <= bound, f"{item}: undercount {t - e} > {bound}"


def test_heavy_hitters_empty(ray_session):
    import ray.data as rd

    from ocr_suite_ray.stages.sketches import heavy_hitters

    ds = rd.from_items([]).repartition(2)
    got = heavy_hitters(ds, "text", k=5)
    assert got.count() == 0
    # NOTE: Dataset.to_pandas() drops columns on a 0-row dataset; the
    # schema is the stable contract
    assert got.schema().names == ["item", "n"]


def test_approx_distinct_sparse_exact_regime(ray_session):
    """exact_threshold above the corpus cardinality -> EXACT count
    (the regime the catalog query runs under its COUNT(DISTINCT) twin),
    at any parallelism."""
    import ray.data as rd

    vals = [int(x) for x in np.arange(500) % 37] + [None] * 10
    for parallelism in (1, 8):
        ds = rd.from_arrow(
            pa.table({"v": pa.array(vals, pa.int64())})
        ).repartition(parallelism)
        assert approx_distinct(ds, "v", exact_threshold=1000) == 37


def test_approx_distinct_sparse_promotes_to_dense(ray_session):
    """Union overflowing the threshold promotes to HLL registers — the
    estimate degrades to the dense sketch's accuracy, not garbage."""
    import ray.data as rd

    n = 5000
    ds = rd.from_arrow(
        pa.table({"v": pa.array(np.arange(n), pa.int64())})
    ).repartition(8)
    est = approx_distinct(ds, "v", exact_threshold=100)
    assert abs(est - n) / n < 0.05
    # threshold=0 (dense-only) stays on the old path, same ballpark
    est0 = approx_distinct(ds, "v", exact_threshold=0)
    assert abs(est0 - n) / n < 0.05


def test_histogram_bins_inf_into_top_bin():
    """float->int64 of +inf is INT64_MIN; an int-space clip pinned it to
    bin 0 (counting a value ABOVE hi as the smallest). Clip must happen
    in float space."""
    import numpy as np

    from ocr_suite_ray.stages.sketches import HistogramSketch

    hs = HistogramSketch(0.0, 10.0, bins=8)
    counts = hs.partial(np.array([np.inf, 11.0, -np.inf, -1.0, 5.0]))
    assert counts[7] == 2      # +inf and 11.0 both clip HIGH
    assert counts[0] == 2      # -inf and -1.0 clip low
    assert counts[4] == 1
    assert counts.sum() == 5
