"""host_rollup: one-pass GROUPING SETS ((host),(tld),()) accounting."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ocr_suite_ray.stages.text_ops import host_rollup

URLS = [
    "https://a.example.com/x",
    "https://a.example.com/y",
    "https://b.example.org/z",
    "https://WWW.B.example.ORG:8080/w",  # www/case/port noise -> b.example.org
    "nota url",                           # unparseable -> host ""
]
W = [10, 20, 5, 7, 3]


def _run(parallelism):
    t = pa.table({"url": URLS, "w": pa.array(W, pa.int64())})
    ds = rd.from_arrow(t).repartition(parallelism)
    out = host_rollup(ds, "url", weight_col="w").to_pandas()
    return out.sort_values(["level", "key"]).reset_index(drop=True)


def test_levels_reconcile_and_values():
    out = _run(1)
    total = out[out["level"] == "all"]
    assert total["n_docs"].tolist() == [len(URLS)]
    assert total["sum_weight"].tolist() == [sum(W)]
    hosts = out[out["level"] == "host"].set_index("key")
    assert hosts.loc["a.example.com", "n_docs"] == 2
    assert hosts.loc["a.example.com", "sum_weight"] == 30
    assert hosts.loc["b.example.org", "n_docs"] == 2
    assert hosts.loc["b.example.org", "sum_weight"] == 12
    # each level sums to the corpus total
    for lv in ("host", "tld"):
        part = out[out["level"] == lv]
        assert part["n_docs"].sum() == len(URLS)
        assert part["sum_weight"].sum() == sum(W)


def test_partition_invariance():
    a, b = _run(1), _run(4)
    pd.testing.assert_frame_equal(a, b)


def test_weightless_mode():
    ds = rd.from_arrow(pa.table({"url": URLS}))
    out = host_rollup(ds, "url").to_pandas()
    assert "sum_weight" not in out.columns
    assert out[out["level"] == "all"]["n_docs"].tolist() == [len(URLS)]


def test_host_split_is_group_consistent():
    # leakage-safety: every doc of a host lands in the same split
    from ocr_suite_ray.pipelines.queries_ml import q_host_split

    out = q_host_split("/root/testdata/sf0.001").to_pandas()
    per_host = out.groupby("host")["split"].nunique()
    assert (per_host == 1).all()
    assert set(out["split"].unique()) <= {"train", "val", "test"}


def test_null_weight_sql_sum_semantics():
    """SQL SUM: an all-NULL-weight group yields NULL, not 0; partial
    NULLs are skipped. Output stays integer-typed either way."""
    t = pa.table({
        "url": ["https://a.com/x", "https://a.com/y", "https://b.com/z"],
        "w": pa.array([None, None, 5], pa.int64()),
    })
    out = host_rollup(
        rd.from_arrow(t).repartition(2), "url", weight_col="w"
    ).to_pandas()
    hosts = out[out["level"] == "host"].set_index("key")
    assert pd.isna(hosts.loc["a.com", "sum_weight"])
    assert hosts.loc["b.com", "sum_weight"] == 5
    assert out[out["level"] == "all"]["sum_weight"].tolist() == [5]
