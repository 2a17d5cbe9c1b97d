"""Viewer-parity search pipeline + CLI surface tests."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from ocr_suite_ray.pipelines.extract import ExtractConfig, run_pipeline
from ocr_suite_ray.pipelines.search import (
    matches_per_url,
    search_extracted,
    search_hierarchy,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def final_store(ray_session, small_corpus, tmp_path_factory):
    pages_dir, _ = small_corpus
    out = str(tmp_path_factory.mktemp("search_out"))
    run_pipeline(pages_dir, out, ExtractConfig(wave_size=4, pool_size=2))
    return os.path.join(out, "final"), out


def test_search_extracted_sorted(ray_session, final_store):
    final, _ = final_store
    rows = search_extracted(final, "capture").take_all()
    assert rows, "pattern should match synthetic content"
    ts = [r["warc_ts"] for r in rows]
    assert ts == sorted(ts)
    # deterministic vs a driver-side oracle
    import pyarrow.dataset as pads

    t = pads.dataset(final).to_table()
    want = sum("capture" in x for x in t.column("text").to_pylist())
    assert len(rows) == want


def test_search_min_length_guard(ray_session, final_store):
    final, _ = final_store
    with pytest.raises(ValueError):
        search_extracted(final, "ab")


def test_search_hierarchy_counts(ray_session, final_store):
    final, _ = final_store
    rows = search_hierarchy(final, "capture").take_all()
    total = sum(r["n"] for r in rows)
    flat = search_extracted(final, "capture").count()
    assert total == flat


def test_matches_per_url(ray_session, final_store):
    final, _ = final_store
    rows = matches_per_url(final, "capture").take_all()
    assert all(r["n_matches"] >= 1 for r in rows)


def test_cli_status_and_search(ray_session, final_store):
    _, out = final_store
    env = dict(os.environ, PYTHONPATH=REPO)
    st = subprocess.run(
        [sys.executable, "-m", "ocr_suite_ray.cli", "status", "--out", out],
        capture_output=True, text=True, env=env, check=True,
    )
    status = json.loads(st.stdout)
    assert status["partitions_done"] == 4
    assert status["rows_done"] > 0
