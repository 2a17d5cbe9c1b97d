"""DSIR importance weights: direction, invariance, degenerate domains."""

from __future__ import annotations

import numpy as np

from ocr_suite_ray.stages.text_ops import dsir_weights


def _rows():
    # target-flavored vocabulary {t*}, source-flavored {s*}
    rows = []
    for i in range(12):
        rows.append({"doc_id": i, "lang": "en", "text": "t1 t2 t3 t1 t2"})
    for i in range(12, 24):
        rows.append({"doc_id": i, "lang": "de", "text": "s1 s2 s3 s1 s2"})
    # probe docs in the SOURCE pool: one looks like target, one like source
    rows.append({"doc_id": 100, "lang": "de", "text": "t1 t2 t3"})
    rows.append({"doc_id": 101, "lang": "de", "text": "s1 s2 s3"})
    return rows


def test_dsir_ranks_target_like_docs_higher(ray_session):
    import ray.data as rd

    got = {
        r["doc_id"]: r["dsir_e4"]
        for r in dsir_weights(rd.from_items(_rows())).take_all()
    }
    assert got[100] > got[101]
    # target-trained docs themselves score positive, source docs negative
    assert got[0] > 0 > got[12]


def test_dsir_partition_invariance(ray_session):
    import ray.data as rd

    def run(nparts):
        ds = rd.from_items(_rows()).repartition(nparts)
        return sorted(
            (r["doc_id"], r["dsir_e4"]) for r in dsir_weights(ds).take_all()
        )

    assert run(1) == run(5)


def test_dsir_empty_target_model(ray_session):
    import ray.data as rd

    rows = [{"doc_id": i, "lang": "de", "text": "a b c"} for i in range(6)]
    got = dsir_weights(rd.from_items(rows), target_value="en").take_all()
    # no target docs: every token backs off to the target smoothing floor;
    # scores are finite and uniform across identical docs
    vals = {r["dsir_e4"] for r in got}
    assert len(got) == 6 and len(vals) == 1
    assert np.isfinite(next(iter(vals)))
