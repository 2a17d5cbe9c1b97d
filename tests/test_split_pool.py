"""The dedicated-PDF-pool routing (VisionKit-isolation analogue) must
produce byte-identical results to the single-pool dispatch path."""

from __future__ import annotations

import pyarrow.dataset as pads

from ocr_suite_ray.pipelines.extract import ExtractConfig, run_pipeline


def test_split_pdf_pool_identical_output(ray_session, small_corpus, tmp_path):
    pages_dir, _ = small_corpus
    a_out, b_out = str(tmp_path / "a"), str(tmp_path / "b")
    run_pipeline(pages_dir, a_out, ExtractConfig(wave_size=4, pool_size=2))
    run_pipeline(
        pages_dir,
        b_out,
        ExtractConfig(wave_size=4, pool_size=2, split_pdf_pool=True, pdf_pool_size=1),
    )
    a = pads.dataset(f"{a_out}/final").to_table().sort_by("url")
    b = pads.dataset(f"{b_out}/final").to_table().sort_by("url")
    assert a.equals(b)
    kinds = set(a.column("payload_kind").to_pylist())
    assert "pdf" in kinds  # the slow lane actually carried traffic
