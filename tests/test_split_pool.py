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


def test_skew_corpus_split_pool_identical(ray_session, tmp_path):
    """The PDF-heavy + giant-DOM skewed mix (synthetic_skew, the 10x
    skew-drive corpus at smoke scale): single pool vs dedicated PDF pool
    byte-identical, with the slow lane carrying ~20% of traffic."""
    from ocr_suite_ray.sources.synthetic_skew import generate_skew_corpus

    pages = str(tmp_path / "pages")
    files = generate_skew_corpus(pages, 400, seed=11, n_files=4)
    assert len(files) == 4
    a_out, b_out = str(tmp_path / "a"), str(tmp_path / "b")
    run_pipeline(pages, a_out, ExtractConfig(wave_size=4, pool_size=2))
    # pool sizing must leave CPUs for the upstream read/union tasks: on
    # the 4-cpu test session, 2+2 actors would claim every CPU and the
    # streaming executor deadlocks waiting for input it can never read
    # (the drive sizes 22+6 on 32 cpus for the same reason)
    run_pipeline(
        pages, b_out,
        ExtractConfig(wave_size=4, pool_size=2, split_pdf_pool=True,
                      pdf_pool_size=1),
    )
    a = pads.dataset(f"{a_out}/final").to_table().sort_by("url")
    b = pads.dataset(f"{b_out}/final").to_table().sort_by("url")
    assert a.equals(b)
    kinds = a.column("payload_kind").to_pylist()
    pdf_share = kinds.count("pdf") / len(kinds)
    assert 0.12 < pdf_share < 0.3  # the mix is actually PDF-heavy
