"""Full CLI e2e: gen → extract → kill-free resume → search, all through
subprocess (the ray-job-submit surface exactly as a user drives it)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "ocr_suite_ray.cli", *args],
        capture_output=True, text=True, env=env, check=True, cwd=REPO,
    )


def test_cli_gen_extract_resume_search(tmp_path):
    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    g = json.loads(_run("--num-cpus", "4", "gen", "--pages", pages,
                        "--n-pages", "200", "--n-files", "2").stdout.strip().splitlines()[-1])
    assert g["files"] == 2
    e1 = json.loads(_run("--num-cpus", "4", "extract", "--pages", pages,
                         "--out", out, "--pool", "2").stdout.strip().splitlines()[-1])
    assert e1["partitions_processed"] == 2
    # re-run resumes: nothing reprocessed
    e2 = json.loads(_run("--num-cpus", "4", "extract", "--pages", pages,
                         "--out", out, "--pool", "2").stdout.strip().splitlines()[-1])
    assert e2["partitions_processed"] == 0
    assert e2["partitions_skipped"] == 2
    st = json.loads(_run("status", "--out", out).stdout.strip().splitlines()[-1])
    assert st["partitions_done"] == 2
    s = _run("--num-cpus", "4", "search", "--out", out,
             "--pattern", "capture", "--limit", "5").stdout.strip().splitlines()
    assert 1 <= len(s) <= 5
    assert "url" in json.loads(s[0])


def test_cli_curate_writes_training_shards(tmp_path):
    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    cur = str(tmp_path / "curated")
    _run("--num-cpus", "4", "gen", "--pages", pages, "--n-pages", "200",
         "--n-files", "2")
    _run("--num-cpus", "4", "extract", "--pages", pages, "--out", out,
         "--pool", "2")
    c = json.loads(_run("--num-cpus", "4", "curate", "--out", out,
                        "--curated", cur).stdout.strip().splitlines()[-1])
    assert 0 < c["rows_out"] <= 200
    import pyarrow.dataset as pads

    t = pads.dataset(cur, partitioning="hive").to_table()
    assert t.num_rows == c["rows_out"]
    assert set(t.schema.names) >= {"url", "text", "quality", "lm_score_e4", "bucket"}
    assert (t.to_pandas().quality >= 70).all()
    # one row per distinct text (exact dedup held)
    texts = t.to_pandas().text
    assert texts.nunique() == len(texts)
    # atomic re-run replaces the output and stays deterministic
    c2 = json.loads(_run("--num-cpus", "4", "curate", "--out", out,
                         "--curated", cur).stdout.strip().splitlines()[-1])
    assert c2["rows_out"] == c["rows_out"]


def test_curate_recovers_from_stale_staging(tmp_path):
    """A crash between write and rename leaves only the staging dir; the
    next run must replace it and land a complete output."""
    import pyarrow.dataset as pads

    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    cur = str(tmp_path / "curated")
    _run("--num-cpus", "4", "gen", "--pages", pages, "--n-pages", "120",
         "--n-files", "2")
    _run("--num-cpus", "4", "extract", "--pages", pages, "--out", out,
         "--pool", "2")
    # simulate the crash artifact
    stale = cur + ".staging"
    os.makedirs(os.path.join(stale, "bucket=99"), exist_ok=True)
    with open(os.path.join(stale, "bucket=99", "junk.parquet"), "w") as f:
        f.write("not parquet")
    c = json.loads(_run("--num-cpus", "4", "curate", "--out", out,
                        "--curated", cur).stdout.strip().splitlines()[-1])
    assert c["rows_out"] > 0
    assert not os.path.exists(stale)  # staging consumed by the atomic rename
    t = pads.dataset(cur, partitioning="hive").to_table()
    assert t.num_rows == c["rows_out"]
    assert 99 not in set(t["bucket"].to_pylist())  # junk partition gone
