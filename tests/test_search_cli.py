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


def test_fetch_payload_point_lookup(ray_session, small_corpus, final_store):
    """frame_view parity: pushdown point lookup returns every capture of a
    url (newest first) and view_document pairs the extracted record with
    the winning payload."""
    import pyarrow.dataset as pads

    from ocr_suite_ray.pipelines.search import fetch_payload, view_document

    pages_dir, _ = small_corpus
    final, _out = final_store
    pages = pads.dataset(pages_dir).to_table()
    urls = pages["url"].to_pylist()
    # a dup url (multiple captures) if one exists, else any url
    from collections import Counter

    counts = Counter(urls)
    dup_url = next((u for u, c in counts.items() if c > 1), urls[0])

    t = fetch_payload(pages_dir, dup_url)
    assert t.num_rows == counts[dup_url]
    ts = t["warc_ts"].to_pylist()
    assert ts == sorted(ts, reverse=True), "captures must come newest first"

    rec = view_document(pages_dir, final, dup_url)
    assert rec["url"] == dup_url
    assert rec["n_captures"] == counts[dup_url]
    # the paired payload is a NEWEST capture whose extraction reproduces
    # the stored winner text (on exact-ts ties file order is arbitrary;
    # the winner is chosen by the extracted-content tuple)
    newest_ts = t["warc_ts"][0].as_py()
    tied = [h.as_py() for h, ts in zip(t["html"], t["warc_ts"])
            if ts.as_py() == newest_ts]
    assert rec["payload"] in tied
    from ocr_suite_ray.functions.extract import extract_payload

    assert extract_payload(rec["payload"])["text"] == rec["text"]
    with pytest.raises(KeyError):
        view_document(pages_dir, final, "https://not.a.real/url")


def test_cli_view(ray_session, small_corpus, final_store):
    import pyarrow.dataset as pads

    pages_dir, _ = small_corpus
    _final, out = final_store
    url = pads.dataset(pages_dir).to_table()["url"][0].as_py()
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, "-m", "ocr_suite_ray.cli", "view",
         "--pages", pages_dir, "--out", out, "--url", url],
        capture_output=True, text=True, env=env, check=True,
    )
    rec = json.loads(r.stdout)
    assert rec["url"] == url
    assert int(rec["n_captures"]) >= 1


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


def test_cli_watch_incremental(ray_session, tmp_path):
    """watch polls the pages dir and re-extracts incrementally: round 1
    processes the initial files, a file added between polls is picked up
    with only the NEW partition processed (lineage skips the rest)."""
    from ocr_suite_ray.sources.synthetic import generate_corpus

    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    generate_corpus(pages, 200, seed=7, n_files=2)

    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.Popen(
        [sys.executable, "-m", "ocr_suite_ray.cli", "--num-cpus", "4", "watch",
         "--pages", pages, "--out", out, "--pool", "2",
         "--interval", "1.5", "--max-rounds", "30"],
        stdout=subprocess.PIPE, text=True, env=env,
    )
    try:
        line1 = json.loads(proc.stdout.readline())
        assert line1["partitions_processed"] == 2
        # drop a new file with DISJOINT page ids (disjoint urls keep the
        # dup-url set unchanged, so old partitions stay valid — adding
        # overlapping urls would legitimately invalidate everything)
        import pyarrow.parquet as pq

        from ocr_suite_ray.sources.synthetic import generate_pages_table

        extra_t = generate_pages_table(100, seed=7, start=10_000)
        tmp_extra = os.path.join(pages, ".pages_zz_extra.tmp")
        pq.write_table(extra_t, tmp_extra)
        os.rename(tmp_extra, os.path.join(pages, "pages_zz_extra.parquet"))
        line2 = json.loads(proc.stdout.readline())
        assert line2["partitions_total"] == 3
        assert line2["partitions_skipped"] == 2, "old partitions must be skipped"
        assert line2["partitions_processed"] == 1
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_bm25_rank_over_final_store(ray_session, final_store):
    """BM25 over the extracted store: ranked hits, oracle-checked against
    a driver-side exact BM25 on the same rows."""
    import math

    import pyarrow.dataset as pads
    import ray.data as rd

    from ocr_suite_ray.stages.text_ops import bm25_rank

    final, _ = final_store
    terms = ["capture", "render"]
    got = bm25_rank(
        rd.read_parquet(final, columns=["url", "text"]),
        terms, id_col="url", text_col="text", top_k=5,
    )
    t = pads.dataset(final).to_table()
    urls = t["url"].to_pylist()
    texts = t["text"].to_pylist()
    toks = [x.split(" ") for x in texts]
    n = float(len(toks))
    avgdl = sum(len(w) for w in toks) / n
    df = {q: float(sum(q in w for w in toks)) for q in terms}
    scores = {}
    for u, w in zip(urls, toks):
        s = 0.0
        for q in terms:
            tf = float(w.count(q))
            if not tf or not df[q]:
                continue
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len(w) / avgdl))
        if s > 0:
            scores[u] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    want_e4 = [(u, math.floor(s * 10000 + 0.5)) for u, s in want]
    got_pairs = list(zip(got["url"].to_pylist(), got["bm25_e4"].to_pylist()))
    assert got_pairs == want_e4


def test_matches_per_url_counts_match_re_oracle(ray_session, final_store):
    """pc.count_substring (non-overlapping, left-to-right) must agree with
    re.findall on the escaped literal — the semantics the per-row loop it
    replaced had."""
    import re

    import pyarrow.dataset as pads

    final, _ = final_store
    got = {
        (r["url"], r["warc_ts"]): r["n_matches"]
        for r in matches_per_url(final, "capture").take_all()
    }
    t = pads.dataset(final).to_table(columns=["url", "warc_ts", "text"])
    pat = re.compile(re.escape("capture"))
    want = {}
    for u, ts, x in zip(
        t["url"].to_pylist(), t["warc_ts"].to_pylist(), t["text"].to_pylist()
    ):
        n = len(pat.findall(x))
        if n > 0:
            want[(u, ts)] = n
    assert got == want and want
