"""range_join semantics: boundary inclusivity, bin-straddling windows,
int64 id preservation above 2^53, partition invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ocr_suite_ray.stages.relational import range_join


def _mk(ids, ts_us, id_name):
    return pd.DataFrame(
        {
            id_name: pd.Series(ids, dtype="int64"),
            "ts": pd.Series(np.asarray(ts_us, dtype="datetime64[us]")),
        }
    )


def _run(left_df, right_df, lower, upper, repart=0):
    import ray.data as rd

    l = rd.from_pandas(left_df)
    r = rd.from_pandas(right_df)
    if repart:
        l, r = l.repartition(repart), r.repartition(repart)
    out = range_join(l, r, "ts", lower, upper, ["id_l"], ["id_r"]).to_pandas()
    return out.sort_values(["id_l", "id_r"]).reset_index(drop=True)


def _oracle(left_df, right_df, lower, upper):
    rows = []
    lts = left_df.ts.astype("int64").to_numpy()  # datetime64[us] -> us
    rts = right_df.ts.astype("int64").to_numpy()
    for li, l in enumerate(left_df.itertuples()):
        for ri, r in enumerate(right_df.itertuples()):
            d = int(rts[ri] - lts[li])
            if lower <= d <= upper:
                rows.append((l.id_l, r.id_r, d))
    return (
        pd.DataFrame(rows, columns=["id_l", "id_r", "delta_us"])
        .astype("int64")
        .sort_values(["id_l", "id_r"])
        .reset_index(drop=True)
    )


def test_range_join_boundaries_inclusive(ray_session):
    # window [10, 20] us: deltas 9 (out), 10 (in), 20 (in), 21 (out)
    left = _mk([0], [1000], "id_l")
    right = _mk([0, 1, 2, 3], [1009, 1010, 1020, 1021], "id_r")
    out = _run(left, right, 10, 20)
    assert out.id_r.tolist() == [1, 2]
    assert out.delta_us.tolist() == [10, 20]


def test_range_join_matches_bruteforce_across_bins(ray_session):
    rng = np.random.RandomState(5)
    left = _mk(range(40), rng.randint(0, 10_000, 40).cumsum(), "id_l")
    right = _mk(range(60), rng.randint(0, 8_000, 60).cumsum(), "id_r")
    lower, upper = -5_000, 7_000  # negative lower: window straddles the row
    got = _run(left, right, lower, upper)
    want = _oracle(left, right, lower, upper)
    assert got.equals(want) and len(want) > 10


def test_range_join_partition_invariant_and_big_ids(ray_session):
    big = 2**60  # above float64's 2^53 integer precision
    left = _mk([big + 1, big + 2], [0, 50], "id_l")
    right = _mk([big + 7, big + 8], [30, 120], "id_r")
    a = _run(left, right, 0, 100)
    b = _run(left, right, 0, 100, repart=3)
    assert a.equals(b)
    want = _oracle(left, right, 0, 100)
    assert a.equals(want)
    assert a.id_l.min() > 2**53  # ids survived exactly (no float64 transit)
