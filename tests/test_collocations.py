"""collocations_pmi: top-k bigram collocations by PMI."""

import math

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ocr_suite_ray.stages.text_ops import collocations_pmi

# "san francisco" always co-occurs (exclusive pair); filler reuses "is"/"big"
# so the within-phrase grams ("francisco is", "is big") have diluted
# marginals and only the exclusive pair keeps the maximal PMI
DOCS = (
    ["san francisco is big"] * 6
    + ["the cat is big", "the dog is big", "cat and dog is big",
       "the cat and dog sat"] * 3
)


def _run(parallelism, min_count=2, k=10):
    ds = rd.from_arrow(pa.table({"text": DOCS})).repartition(parallelism)
    out = collocations_pmi(ds, "text", min_count=min_count, k=k).to_pandas()
    return out.reset_index(drop=True)


def test_exclusive_pair_ranks_first_and_pmi_exact():
    out = _run(1)
    assert out.iloc[0]["gram"] == "san francisco"
    # exact PMI: c(ab)=6, cl(san)=6, cr(francisco)=6, N = total bigrams
    n_big = sum(len(d.split()) - 1 for d in DOCS)
    expect = math.floor(math.log(((float(n_big) * 6) / 6) / 6) * 10000 + 0.5)
    assert int(out.iloc[0]["pmi_e4"]) == expect


def test_min_count_gates_rare_grams():
    out = _run(1, min_count=100)
    assert len(out) == 0


def test_partition_invariance_and_k_cap():
    a, b = _run(1, k=5), _run(4, k=5)
    assert len(a) == 5
    pd.testing.assert_frame_equal(a, b)


def test_no_bigrams_returns_empty():
    ds = rd.from_arrow(pa.table({"text": ["hello", "world"]}))
    res = collocations_pmi(ds, "text", min_count=1, k=5)
    assert sorted(res.schema().names) == ["gram", "n", "pmi_e4"]
    assert len(res.to_pandas()) == 0
