"""Golden e2e: the distributed pipeline must reproduce the single-process
reference path byte-for-byte per url, at any parallelism / wave size /
dedup strategy (FIXTURES.md §2, BASELINE.json per-url invariant)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from ocr_suite_ray.pipelines.extract import ExtractConfig, run_pipeline
from ocr_suite_ray.pipelines.golden import golden_extract


def _load_final(out_dir: str) -> pa.Table:
    t = pads.dataset(f"{out_dir}/final").to_table()
    idx = pa.compute.sort_indices(t, sort_keys=[("url", "ascending")])
    return t.take(idx)


def _load_pages(files) -> pa.Table:
    return pa.concat_tables([pq.read_table(f) for f in files])


@pytest.fixture(scope="module")
def golden(small_corpus):
    _, files = small_corpus
    return golden_extract(_load_pages(files))


def _assert_matches_golden(final: pa.Table, golden: pa.Table):
    assert final.num_rows == golden.num_rows
    assert final.column("url").to_pylist() == golden.column("url").to_pylist()
    # byte-identical extracted text per url — THE invariant
    assert final.column("text").to_pylist() == golden.column("text").to_pylist()
    for col in ["warc_ts", "payload_kind", "spans", "n_blocks_kept",
                "n_blocks_dropped", "status"]:
        assert final.column(col).to_pylist() == golden.column(col).to_pylist(), col


def test_pipeline_matches_golden(ray_session, small_corpus, golden, tmp_path):
    pages_dir, _ = small_corpus
    out = str(tmp_path / "out")
    s = run_pipeline(pages_dir, out, ExtractConfig(wave_size=4, pool_size=2))
    assert s["partitions_processed"] == 4
    _assert_matches_golden(_load_final(out), golden)


def test_pipeline_parallelism_invariant(ray_session, small_corpus, golden, tmp_path):
    """Different wave size, batch size, and dedup strategy -> same bytes."""
    pages_dir, _ = small_corpus
    out = str(tmp_path / "out2")
    cfg = ExtractConfig(
        wave_size=2, pool_size=3, batch_size=17, dedup_strategy="map_groups"
    )
    run_pipeline(pages_dir, out, cfg)
    _assert_matches_golden(_load_final(out), golden)


def test_final_has_no_duplicate_urls(ray_session, small_corpus, tmp_path):
    pages_dir, _ = small_corpus
    out = str(tmp_path / "out3")
    run_pipeline(pages_dir, out, ExtractConfig(wave_size=4, pool_size=2))
    urls = _load_final(out).column("url").to_pylist()
    assert len(urls) == len(set(urls))


def test_pipeline_auto_wave_size(ray_session, small_corpus, golden, tmp_path):
    """wave_size='auto' (bounded wave count) -> same bytes, one wave here."""
    pages_dir, _ = small_corpus
    out = str(tmp_path / "out4")
    s = run_pipeline(pages_dir, out, ExtractConfig(wave_size="auto", pool_size=2))
    assert s["waves"] == 1  # 4 files, floor 32 -> single wave
    _assert_matches_golden(_load_final(out), golden)


def test_resolve_wave_size():
    from ocr_suite_ray.pipelines.extract import _resolve_wave_size

    assert _resolve_wave_size(8, 256) == 8           # explicit int passes through
    assert _resolve_wave_size("auto", 16) == 32      # small corpus: one wave
    assert _resolve_wave_size("auto", 256) == 64     # 4 waves
    assert _resolve_wave_size("auto", 100_000) == 25_000
    with pytest.raises(ValueError):
        _resolve_wave_size("huge", 10)
    with pytest.raises(ValueError):
        _resolve_wave_size(0, 10)
