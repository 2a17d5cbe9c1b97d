"""Distributed prefix scan vs a sequential oracle, at several partitionings."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ocr_suite_ray.stages.scan import pack_sequences, prefix_sum


@pytest.mark.parametrize("nparts", [1, 3, 13])
def test_prefix_sum_matches_sequential(ray_session, nparts):
    import ray.data as rd

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "doc_id": rng.permutation(2000),
            "n": rng.randint(1, 500, size=2000).astype("int64"),
        }
    )
    got = (
        prefix_sum(rd.from_pandas(df).repartition(nparts), "doc_id", "n")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = df.sort_values("doc_id").reset_index(drop=True)
    want["cum_before"] = want["n"].cumsum().shift(fill_value=0)
    assert list(got["cum_before"].astype("int64")) == list(want["cum_before"])


def test_pack_sequences_boundaries(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": range(100), "n_tokens": [100] * 100})
    out = (
        pack_sequences(rd.from_pandas(df).repartition(7), "doc_id", "n_tokens", 256)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc k starts at 100k: seq = 100k // 256
    assert list(out["seq_id"]) == [100 * k // 256 for k in range(100)]
    assert list(out["seq_offset"]) == [100 * k % 256 for k in range(100)]


def test_shuffle_shards_balanced_and_deterministic(ray_session):
    import ray.data as rd

    from ocr_suite_ray.stages.scan import shuffle_shards

    rows = [{"doc_id": i} for i in range(100)]

    def run(nparts):
        ds = rd.from_items(rows).repartition(nparts)
        got = shuffle_shards(ds, n_shards=8).take_all()
        return sorted((r["doc_id"], r["shard"], r["pos"]) for r in got)

    a = run(1)
    assert a == run(7)  # parallelism-invariant
    import collections

    by_shard = collections.Counter(s for _d, s, _p in a)
    assert max(by_shard.values()) - min(by_shard.values()) <= 1  # balanced
    # (shard, pos) is a bijection onto 0..99
    assert len({(s, p) for _d, s, p in a}) == 100
    # salt changes the permutation
    ds = rd.from_items(rows)
    b = sorted(
        (r["doc_id"], r["shard"], r["pos"])
        for r in shuffle_shards(ds, n_shards=8, salt="other").take_all()
    )
    assert a != b


@pytest.mark.parametrize("nparts", [1, 3, 13])
def test_grouped_prefix_sum_matches_sequential(ray_session, nparts):
    import ray.data as rd

    from ocr_suite_ray.stages.scan import grouped_prefix_sum

    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c", "hot"], size=3000, p=[0.1, 0.1, 0.1, 0.7]),
            "k": rng.permutation(3000),
            "n": rng.randint(1, 100, size=3000).astype("int64"),
        }
    )
    got = (
        grouped_prefix_sum(rd.from_pandas(df).repartition(nparts), "g", "k", "n")
        .to_pandas()
        .sort_values(["g", "k"])
        .reset_index(drop=True)
    )
    want = df.sort_values(["g", "k"]).reset_index(drop=True)
    want["cum_before"] = want.groupby("g")["n"].cumsum() - want["n"]
    assert list(got["cum_before"].astype("int64")) == list(want["cum_before"])


def test_token_budget_mixture_exact_fill(ray_session):
    import hashlib

    import ray.data as rd

    from ocr_suite_ray.stages.contamination import token_budget_mixture

    rng = np.random.RandomState(11)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(500, dtype="int64"),
            "lang": rng.choice(["en", "de"], size=500),
            "n_tokens": rng.randint(1, 50, size=500).astype("int64"),
        }
    )
    got = (
        token_budget_mixture(
            rd.from_pandas(df).repartition(5),
            "lang", "doc_id", "n_tokens",
            budgets={"en": 300}, default_budget=120,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # sequential oracle: same md5 order, same exclusive-sum gate
    df = df.copy()
    df["okey"] = [
        hashlib.md5((str(d) + "mix").encode()).hexdigest()[:8] + "-" + str(d).zfill(12)
        for d in df["doc_id"]
    ]
    df = df.sort_values(["lang", "okey"])
    df["before"] = df.groupby("lang")["n_tokens"].cumsum() - df["n_tokens"]
    cap = df["lang"].map({"en": 300}).fillna(120)
    want = df[df["before"] < cap].sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["tokens_before"].astype("int64")) == list(want["before"])
    # each group's kept mass covers its budget (overshoot <= one doc)
    kept = got.groupby("lang")["n_tokens"].sum()
    assert kept["en"] >= 300 and kept["de"] >= 120


def test_token_budget_mixture_null_weight_dropped(ray_session):
    """SQL twin semantics: SUM(w) OVER ... - w is NULL for a null-weight
    row -> the row is dropped and contributes 0 to later prefixes (an
    unguarded NaN->int64 cast kept it with tokens_before = INT64_MIN)."""
    import pandas as pd
    import ray.data as rd

    from ocr_suite_ray.stages.contamination import token_budget_mixture

    df = pd.DataFrame({
        "g": ["en"] * 4,
        "doc_id": [1, 2, 3, 4],
        "w": [5.0, None, 5.0, 5.0],
    })
    out = token_budget_mixture(
        rd.from_pandas(df), "g", "doc_id", "w", budgets={"en": 100}
    ).to_pandas()
    assert 2 not in set(out["doc_id"])          # null-weight row dropped
    assert set(out["doc_id"]) == {1, 3, 4}       # budget admits the rest
    assert (out["tokens_before"] >= 0).all()     # no INT64_MIN garbage
    assert out["tokens_before"].max() == 10      # nulls contributed 0
