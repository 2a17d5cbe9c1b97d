"""Crawl-dump ingestion: newline-delimited JSON → the partitioned pages
layout the flagship pipeline consumes.

Reference analogue: the watcher's landing step — raw recordings appear in a
directory and are registered as work units (``tools/ocs-watcher/src/ocsw/
file_filter.py:4-13``). Web crawls land as JSONL (one record per page, html
base64-encoded or plain text); this converts them to the engine's parquet
pages schema with ONE remote task per input file (natural 1:1 partition
mapping, deterministic output names, tmp+rename idempotency — a re-run
overwrites its own outputs, so a killed ingest is safe to repeat).

Input record fields: ``url`` (string, required), ``warc_ts`` (ISO-8601
string or epoch micros), and ``html_b64`` (base64) or ``html`` (text).
The JSON parse is pyarrow's vectorized C++ reader; only the base64 decode
is per-row Python (ingest is a one-time I/O-bound landing pass).
"""

from __future__ import annotations

import base64
import os


def ingest_jsonl(src_dir: str, pages_dir: str, row_group_size: int = 4096) -> list[str]:
    """Convert every ``*.jsonl`` under ``src_dir`` into
    ``pages_dir/pages_{k:05d}.parquet`` (sorted input order → deterministic
    partition ids). Returns the written file paths."""
    import ray

    src_files = sorted(
        os.path.join(src_dir, f)
        for f in os.listdir(src_dir)
        if f.endswith(".jsonl")
    )
    if not src_files:
        raise FileNotFoundError(f"no .jsonl files under {src_dir}")
    os.makedirs(pages_dir, exist_ok=True)

    @ray.remote
    def _one(src: str, dst: str, rg: int) -> str:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.json as pj
        import pyarrow.parquet as pq

        t = pj.read_json(src)
        cols = set(t.column_names)
        if "url" not in cols:
            raise ValueError(f"{src}: missing required 'url' field")
        # html: base64 field wins, else plain-text field encoded utf-8
        if "html_b64" in cols:
            html = pa.array(
                [base64.b64decode(v) if v is not None else b""
                 for v in t["html_b64"].to_pylist()],
                pa.binary(),
            )
        elif "html" in cols:
            html = pc.cast(t["html"], pa.binary())
        else:
            raise ValueError(f"{src}: need 'html_b64' or 'html'")
        if "warc_ts" not in cols:
            raise ValueError(f"{src}: missing 'warc_ts'")
        ts_col = t["warc_ts"]
        if pa.types.is_integer(ts_col.type):
            ts = pc.cast(ts_col, pa.timestamp("us"))
        elif pa.types.is_timestamp(ts_col.type):
            ts = pc.cast(ts_col, pa.timestamp("us"))
        else:
            ts = pc.cast(
                pc.strptime(ts_col, format="%Y-%m-%dT%H:%M:%S", unit="us"),
                pa.timestamp("us"),
            )
        out = pa.table({"url": pc.cast(t["url"], pa.string()),
                        "warc_ts": ts, "html": html})
        tmp = dst + f".tmp{os.getpid()}"
        pq.write_table(out, tmp, row_group_size=rg)
        os.replace(tmp, dst)
        return dst

    outs = [
        os.path.join(pages_dir, f"pages_{k:05d}.parquet")
        for k in range(len(src_files))
    ]
    return list(
        ray.get([
            _one.remote(s, d, row_group_size) for s, d in zip(src_files, outs)
        ])
    )
