"""Code-version lineage: a change to the extraction code must invalidate
previously-committed partitions (monkeypatched fingerprint)."""

from __future__ import annotations

from ocr_suite_ray.pipelines.extract import ExtractConfig, run_extract_phase


def test_code_change_invalidates_partitions(ray_session, small_corpus, tmp_path, monkeypatch):
    pages_dir, files = small_corpus
    out = str(tmp_path / "out")
    cfg = ExtractConfig(wave_size=4, pool_size=2)
    s1 = run_extract_phase(pages_dir, out, cfg)
    assert s1["partitions_processed"] == len(files)
    # same code -> everything skipped
    s2 = run_extract_phase(pages_dir, out, cfg)
    assert s2["partitions_processed"] == 0
    # simulate an extractor code change
    import ocr_suite_ray.version as ver

    monkeypatch.setattr(ver, "extract_code_fingerprint", lambda: "deadbeef0000")
    s3 = run_extract_phase(pages_dir, out, cfg)
    assert s3["partitions_processed"] == len(files)  # all redone


def test_version_fingerprints_stable():
    from ocr_suite_ray.version import corpus_code_fingerprint, extract_code_fingerprint

    assert extract_code_fingerprint() == extract_code_fingerprint()
    assert corpus_code_fingerprint() == corpus_code_fingerprint()
    assert len(extract_code_fingerprint()) == 12
