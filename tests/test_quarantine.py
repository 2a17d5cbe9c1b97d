"""Corrupt-input quarantine: a truncated/garbage shard must not kill the run
(on_bad_input="quarantine"), must fail fast by default, and a FIXED shard is
picked up automatically on the next run (it never entered lineage)."""

from __future__ import annotations

import json
import os
import shutil

import pyarrow.dataset as pads
import pytest

from ocr_suite_ray.pipelines.extract import ExtractConfig, run_pipeline
from ocr_suite_ray.sources.synthetic import generate_corpus


@pytest.fixture()
def corpus_with_corrupt_shard(ray_session, tmp_path):
    pages = str(tmp_path / "pages")
    files = generate_corpus(pages, 300, seed=42, n_files=4)
    good_bytes = open(files[1], "rb").read()
    with open(files[1], "wb") as fh:
        fh.write(b"\x00not parquet at all" * 100)
    return pages, files, good_bytes


def _final_urls(out: str) -> set:
    return set(pads.dataset(f"{out}/final").to_table().column("url").to_pylist())


def test_default_raises_on_corrupt_shard(corpus_with_corrupt_shard, tmp_path):
    pages, _, _ = corpus_with_corrupt_shard
    with pytest.raises(Exception):
        run_pipeline(pages, str(tmp_path / "out"), ExtractConfig(pool_size=2))


def test_quarantine_skips_and_records(corpus_with_corrupt_shard, tmp_path):
    pages, files, good_bytes = corpus_with_corrupt_shard
    out = str(tmp_path / "out")
    cfg = ExtractConfig(pool_size=2, on_bad_input="quarantine")
    s = run_pipeline(pages, out, cfg)
    assert s["partitions_total"] == 3
    assert [q["path"] for q in s["quarantined"]] == [files[1]]
    recs = [json.loads(l) for l in open(os.path.join(out, "quarantine.jsonl"))]
    assert recs[0]["path"] == files[1] and recs[0]["error"]

    # the 3 readable shards' urls are all present
    expected = set()
    import pyarrow.parquet as pq

    for f in (files[0], files[2], files[3]):
        expected |= set(pq.read_table(f, columns=["url"]).column("url").to_pylist())
    assert _final_urls(out) == expected

    # fix the shard -> next run picks it up, quarantine record cleared
    with open(files[1], "wb") as fh:
        fh.write(good_bytes)
    s2 = run_pipeline(pages, out, cfg)
    assert "quarantined" not in s2
    assert not os.path.exists(os.path.join(out, "quarantine.jsonl"))
    expected |= set(pq.read_table(files[1], columns=["url"]).column("url").to_pylist())
    assert _final_urls(out) == expected


def test_quarantine_schema_mismatch(ray_session, tmp_path):
    """A readable parquet missing required columns is quarantined too."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pages = str(tmp_path / "pages")
    generate_corpus(pages, 100, seed=1, n_files=2)
    bad = os.path.join(pages, "pages_zz_extra.parquet")
    pq.write_table(pa.table({"not_url": [1, 2]}), bad)
    out = str(tmp_path / "out")
    s = run_pipeline(pages, out, ExtractConfig(pool_size=2, on_bad_input="quarantine"))
    assert [q["path"] for q in s["quarantined"]] == [bad]
    assert "missing columns" in s["quarantined"][0]["error"]


def test_all_quarantined_raises(ray_session, tmp_path):
    pages = str(tmp_path / "pages")
    os.makedirs(pages)
    with open(os.path.join(pages, "a.parquet"), "wb") as fh:
        fh.write(b"junk")
    with pytest.raises(FileNotFoundError, match="quarantined"):
        run_pipeline(pages, str(tmp_path / "out"), ExtractConfig(on_bad_input="quarantine"))


def test_bad_mode_rejected(ray_session, tmp_path):
    pages = str(tmp_path / "pages")
    generate_corpus(pages, 50, seed=1, n_files=1)
    with pytest.raises(ValueError, match="on_bad_input"):
        run_pipeline(pages, str(tmp_path / "out"), ExtractConfig(on_bad_input="skip"))
