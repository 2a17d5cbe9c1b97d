"""corpus_overlap: distinct n-gram overlap between two corpora."""

import math

import pyarrow as pa
import ray.data as rd

from ocr_suite_ray.stages.contamination import corpus_overlap

A = ["a b c d", "x y z w"]          # trigrams: {a b c, b c d, x y z, y z w}
B = ["b c d e", "x y z"]            # trigrams: {b c d, c d e, x y z}


def _run(a_docs, b_docs, parallelism=1):
    da = rd.from_arrow(pa.table({"text": a_docs})).repartition(parallelism)
    db = rd.from_arrow(pa.table({"text": b_docs})).repartition(parallelism)
    return corpus_overlap(da, db, n=3).to_pandas().iloc[0]


def test_planted_counts_exact():
    r = _run(A, B)
    assert r["n_a"] == 4 and r["n_b"] == 3
    assert r["n_common"] == 2  # {b c d, x y z}
    assert r["jaccard_e4"] == math.floor(2 * 10000.0 / 5 + 0.5)


def test_partition_invariance():
    assert _run(A, B, 1).tolist() == _run(A, B, 3).tolist()


def test_disjoint_and_short_docs():
    r = _run(["a b"], ["c d e f"])  # A has no trigram at all
    assert r["n_a"] == 0 and r["n_b"] == 2
    assert r["n_common"] == 0 and r["jaccard_e4"] == 0
