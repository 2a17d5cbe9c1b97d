"""group_zscore vs a pandas oracle: partition invariance + the null/degenerate
semantics (singleton group, zero variance, null values)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ocr_suite_ray.stages.windows import group_zscore


def _oracle(df: pd.DataFrame) -> pd.Series:
    g = df.groupby("g")["x"]
    return (df["x"] - g.transform("mean")) / g.transform("std")  # ddof=1


@pytest.mark.parametrize("nparts", [1, 4, 11])
def test_zscore_matches_pandas(ray_session, nparts):
    import ray.data as rd

    rng = np.random.RandomState(9)
    df = pd.DataFrame(
        {
            "i": np.arange(3000, dtype="int64"),
            "g": rng.choice(["a", "b", "c"], 3000),
            "x": rng.uniform(0, 100, 3000),
        }
    )
    got = (
        group_zscore(rd.from_pandas(df).repartition(nparts), "g", "x")
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(got["z"].to_numpy(), _oracle(df).to_numpy(), atol=1e-9)


def test_zscore_degenerate_groups(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {
            "i": [0, 1, 2, 3, 4, 5],
            "g": ["solo", "flat", "flat", "ok", "ok", "ok"],
            "x": [7.0, 5.0, 5.0, 1.0, 2.0, 3.0],
        }
    )
    got = (
        group_zscore(rd.from_pandas(df).repartition(2), "g", "x")
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    assert np.isnan(got.loc[0, "z"])          # singleton group: std undefined
    assert got.loc[1:2, "z"].isna().all()     # zero variance: division by zero -> null
    np.testing.assert_allclose(got.loc[3:5, "z"].to_numpy(), [-1.0, 0.0, 1.0])


def test_zscore_null_values_pass_through(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"i": [0, 1, 2], "g": ["a"] * 3, "x": [1.0, None, 3.0]})
    got = (
        group_zscore(rd.from_pandas(df), "g", "x")
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    assert np.isnan(got.loc[1, "z"])
    # stats computed over the 2 non-null values
    np.testing.assert_allclose(
        got.loc[[0, 2], "z"].to_numpy(), [-0.7071067811865475, 0.7071067811865475]
    )


@pytest.mark.parametrize("nparts", [1, 5])
def test_percentile_gate_matches_duckdb_rule(ray_session, nparts):
    import duckdb
    import ray.data as rd

    from ocr_suite_ray.stages.windows import percentile_gate

    rng = np.random.RandomState(21)
    df = pd.DataFrame(
        {"i": np.arange(4000, dtype="int64"), "x": rng.randint(0, 300, 4000).astype("int64")}
    )
    got = (
        percentile_gate(rd.from_pandas(df).repartition(nparts), "x", 0.05, 0.95)
        .to_pandas().sort_values("i").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "WITH q AS (SELECT quantile_disc(x,0.05) lo, quantile_disc(x,0.95) hi FROM t) "
        "SELECT i, x FROM t, q WHERE x BETWEEN q.lo AND q.hi ORDER BY i"
    ).fetchdf().astype({"i": "int64", "x": "int64"})
    pd.testing.assert_frame_equal(got, want)


def test_percentile_gate_nulls_dropped(ray_session):
    import ray.data as rd

    from ocr_suite_ray.stages.windows import percentile_gate

    df = pd.DataFrame({"i": range(6), "x": pd.array([1, 2, None, 3, 4, 100], dtype="Int64")})
    got = percentile_gate(rd.from_pandas(df), "x", 0.2, 0.8).to_pandas()
    assert not got["x"].isna().any()
    assert 100 not in got["x"].tolist()


def test_zscore_degenerate_is_arrow_null(ray_session):
    """Degenerate z must be an Arrow NULL, not a valid NaN value — the SQL
    oracle's strict null comparison and downstream is_null checks both
    see the difference (to_pandas masks it)."""
    import pyarrow.compute as pc
    import ray.data as rd

    df = pd.DataFrame(
        {"i": [0, 1, 2], "g": ["solo", "flat", "flat"], "x": [7.0, 5.0, 5.0]}
    )
    tbl = (
        group_zscore(rd.from_pandas(df), "g", "x")
        .to_arrow_refs()
    )
    import ray

    import pyarrow as pa

    t = pa.concat_tables([ray.get(r) for r in tbl])
    assert pc.sum(pc.cast(pc.is_null(t["z"]), pa.int64())).as_py() == 3


def test_windows_hot_key_million_rows(ray_session):
    """Skew-contract unit: one key holding 10^6 rows flows through
    rolling_mean, sessionize, and group_quantiles (each documents
    O(max_key_rows) per-worker memory — this pins the tested bound)."""
    import numpy as np
    import ray.data as rd

    from ocr_suite_ray.stages.windows import (
        group_quantiles,
        rolling_mean,
        sessionize,
    )

    n = 1_000_000
    df = pd.DataFrame(
        {
            "user_id": np.zeros(n, dtype="int64"),  # ONE hot key
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.to_datetime(
                np.arange(n, dtype="int64") * 10, unit="s", origin="2024-01-01"
            ),
            "v": np.arange(n, dtype="float64") % 97,
        }
    )
    ds = rd.from_pandas(df).repartition(8)

    rm = rolling_mean(ds, "user_id", "ts", "v", "event_id", window=3)
    assert rm.count() == n

    # 10s spacing, gap 1800s -> one single session holding all 10^6 events
    se = sessionize(ds, "user_id", "ts", gap_s=1800.0).take_all()
    assert len(se) == 1 and se[0]["n_events"] == n

    gq = group_quantiles(ds, "user_id", "v").take_all()
    assert len(gq) == 1 and gq[0]["q50_fp"] == 480000


# ---------------------------------------------------------------------------
# event_deltas (LAG window primitive)
# ---------------------------------------------------------------------------

def _deltas_oracle(df):
    import numpy as np

    g = df.sort_values(["u", "ts", "eid"], kind="mergesort")
    grp = g.groupby("u", sort=False)
    gap = (g["ts"] - grp["ts"].shift()).dt.total_seconds() * 100
    dv = (g["v"] - grp["v"].shift()) * 100

    def _r(m):
        a = m.to_numpy(dtype="float64")
        return np.where(a >= 0, np.floor(a + 0.5), np.ceil(a - 0.5))

    out = g[["u", "eid"]].copy()
    out["gap_fp"] = _r(gap)
    out["value_delta_fp"] = _r(dv)
    return out.sort_values("eid").reset_index(drop=True)


@pytest.mark.parametrize("nparts", [1, 7])
def test_event_deltas_partition_invariant(ray_session, nparts):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ocr_suite_ray.stages.windows import event_deltas

    rng = np.random.RandomState(3)
    n = 400
    df = pd.DataFrame({
        "eid": np.arange(n, dtype="int64"),
        "u": rng.randint(0, 40, n).astype("int64"),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 10_000, n), unit="s"),
        "v": rng.uniform(-50, 50, n),
    })
    got = (
        event_deltas(rd.from_pandas(df).repartition(nparts),
                     "u", "ts", "v", "eid", scale=100)
        .to_pandas().sort_values("eid").reset_index(drop=True)
    )
    want = _deltas_oracle(df).rename(columns={})
    pd.testing.assert_frame_equal(
        got[["u", "eid", "gap_fp", "value_delta_fp"]],
        want[["u", "eid", "gap_fp", "value_delta_fp"]],
    )
    # each user's first event has null deltas, all others real ones
    firsts = df.sort_values(["ts", "eid"]).groupby("u")["eid"].first()
    nan_rows = got[got["gap_fp"].isna()]
    assert set(nan_rows["eid"]) == set(firsts)


# ---------------------------------------------------------------------------
# group_ranks (RANK / DENSE_RANK / ROW_NUMBER / NTILE window family)
# ---------------------------------------------------------------------------

def _ranks_frame(rng, n, nkeys):
    import numpy as np
    import pandas as pd

    return pd.DataFrame({
        "k": rng.randint(0, nkeys, n).astype("int64"),
        # small integer-valued doubles -> plenty of ties inside a group
        "v": rng.randint(1, 8, n).astype("float64"),
        "t1": np.arange(n, dtype="int64"),
    })


def _ranks_duckdb_oracle(df, n_tiles):
    import duckdb

    return duckdb.connect().execute(f"""
        SELECT k, v, t1,
               CAST(RANK() OVER w1 AS BIGINT) AS rnk,
               CAST(DENSE_RANK() OVER w1 AS BIGINT) AS drnk,
               CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS rn,
               CAST(NTILE({n_tiles}) OVER w2 AS BIGINT) AS nt
        FROM df
        WINDOW w1 AS (PARTITION BY k ORDER BY v DESC),
               w2 AS (PARTITION BY k ORDER BY v DESC, t1)
        ORDER BY t1
    """).fetchdf()


@pytest.mark.parametrize("nparts,n_tiles", [(1, 4), (7, 4), (7, 3)])
def test_group_ranks_matches_duckdb_windows(ray_session, nparts, n_tiles):
    """Differential vs DuckDB's window functions, partition-invariant.
    nkeys=13 over n=300 gives group sizes straddling n_tiles (some groups
    smaller than the tile count, some with remainder, some exact)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ocr_suite_ray.stages.windows import group_ranks

    rng = np.random.RandomState(11)
    df = _ranks_frame(rng, 300, 13)
    got = (
        group_ranks(rd.from_pandas(df).repartition(nparts),
                    "k", "v", ["t1"], n_tiles=n_tiles)
        .to_pandas().sort_values("t1").reset_index(drop=True)
    )
    want = _ranks_duckdb_oracle(df, n_tiles)
    cols = ["k", "v", "t1", "rnk", "drnk", "rn", "nt"]
    pd.testing.assert_frame_equal(got[cols], want[cols])


def test_group_ranks_ntile_small_groups(ray_session):
    """SQL NTILE edge: a group SMALLER than n_tiles puts each row in its
    own tile (tiles 1..count); big-buckets-first rule for the remainder."""
    import pandas as pd
    import ray.data as rd

    from ocr_suite_ray.stages.windows import group_ranks

    df = pd.DataFrame({
        "k": [1, 1, 2] + [3] * 10,
        "v": [5.0, 3.0, 9.0] + [float(10 - i) for i in range(10)],
        "t1": list(range(13)),
    })
    got = (
        group_ranks(rd.from_pandas(df), "k", "v", ["t1"], n_tiles=4)
        .to_pandas().sort_values("t1").reset_index(drop=True)
    )
    assert got.loc[got.k == 1, "nt"].tolist() == [1, 2]
    assert got.loc[got.k == 2, "nt"].tolist() == [1]
    # count=10, n=4 -> sizes 3,3,2,2 in rank order
    assert got.loc[got.k == 3, "nt"].tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]


def test_group_ranks_null_values_match_duckdb(ray_session):
    """NULLS LAST + SQL ties-among-nulls ranking (pandas rank leaves NaN;
    an unguarded int64 cast would emit INT64_MIN garbage)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ocr_suite_ray.stages.windows import group_ranks

    rng = np.random.RandomState(7)
    df = _ranks_frame(rng, 200, 9)
    df.loc[rng.choice(200, 40, replace=False), "v"] = np.nan
    got = (
        group_ranks(rd.from_pandas(df).repartition(5), "k", "v", ["t1"])
        .to_pandas().sort_values("t1").reset_index(drop=True)
    )
    want = _ranks_duckdb_oracle(df, 4)
    cols = ["k", "t1", "rnk", "drnk", "rn", "nt"]
    pd.testing.assert_frame_equal(got[cols], want[cols])
    # every null row ranks strictly after every non-null row of its group
    nulls = got[got.v.isna()]
    assert (nulls.groupby("k")["rnk"].nunique() <= 1).all()
