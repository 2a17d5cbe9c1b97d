"""JSONL crawl-dump ingestion → pages layout → flagship pipeline parity."""

from __future__ import annotations

import base64
import json
import os

import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ocr_suite_ray.pipelines.extract import ExtractConfig, run_pipeline
from ocr_suite_ray.sources.ingest import ingest_jsonl


def test_ingest_jsonl_roundtrip_and_pipeline_parity(
    ray_session, small_corpus, tmp_path
):
    """Dump the synthetic corpus as JSONL (base64 html + ISO ts), ingest it
    back, and run the flagship pipeline on BOTH layouts: byte-identical
    final stores."""
    pages_dir, files = small_corpus
    jl_dir = str(tmp_path / "jsonl")
    os.makedirs(jl_dir)
    for k, f in enumerate(files):
        t = pq.read_table(f)
        with open(os.path.join(jl_dir, f"dump_{k:03d}.jsonl"), "w") as fh:
            for r in t.to_pylist():
                fh.write(json.dumps({
                    "url": r["url"],
                    "warc_ts": r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%S"),
                    "html_b64": base64.b64encode(r["html"]).decode(),
                }) + "\n")

    ingested = str(tmp_path / "pages2")
    out_files = ingest_jsonl(jl_dir, ingested)
    assert len(out_files) == len(files)

    # ts was truncated to whole seconds in the dump; compare via pipelines
    # on equal inputs: re-dump the ingested parquet's rows vs source rows
    src = pads.dataset(pages_dir).to_table().sort_by("url")
    got = pads.dataset(ingested).to_table().sort_by("url")
    assert got["url"].to_pylist() == src["url"].to_pylist()
    assert got["html"].to_pylist() == src["html"].to_pylist()

    out_a = str(tmp_path / "out_a")
    out_b = str(tmp_path / "out_b")
    cfg = ExtractConfig(wave_size=4, pool_size=2)
    run_pipeline(pages_dir, out_a, cfg)
    run_pipeline(ingested, out_b, cfg)
    a = pads.dataset(os.path.join(out_a, "final")).to_table().sort_by("url")
    b = pads.dataset(os.path.join(out_b, "final")).to_table().sort_by("url")
    # warc_ts differs by sub-second truncation; text/urls/spans must match
    for col in ("url", "text", "spans", "n_blocks_kept", "status"):
        assert a[col].to_pylist() == b[col].to_pylist(), col
