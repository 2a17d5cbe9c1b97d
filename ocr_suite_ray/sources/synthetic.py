"""Deterministic synthetic Common-Crawl-style page corpus (FIXTURES.md §1).

The reference has no golden corpus (its tests stub inputs with ``/bin/echo``,
``tools/ocs-watcher/tests/dummy-config.toml:1-7``); this repo adds one. Every
row is generated from ``random.Random(seed * 1_000_003 + i)`` so row *i* is
reproducible independent of generation order, partitioning, or process — the
precondition for byte-identical goldens at any parallelism.

Edge-case classes (deterministic fractions of the corpus):
- ~2% of urls repeated 2-5x with increasing ``warc_ts`` (dedup exercise),
  a fraction of those with exact-tie timestamps (tiebreak exercise);
- ~1% giant DOMs (~100x median payload — skew exercise);
- ~2% PDF payloads (``%PDF-`` magic, minimal synthetic PDF — slow path);
- ~0.5% structurally-broken PDFs (poison pill -> deterministic error row);
- ~1% malformed/truncated bytes (poison pill).

Corpus generation itself runs distributed: ``ray.data.range(n).map_batches``
so bench-scale inputs don't bottleneck on the driver.
"""

from __future__ import annotations

import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ocr_suite_ray.schemas import PAGES_SCHEMA

_WORDS = (
    "stream merge window batch table scan filter join order group sort key "
    "value data column row vector hash spark query part line customer small "
    "big fast slow agg the a dup extraction content boiler plate page crawl "
    "archive capture snapshot render parse token corpus shard block span"
).split()

_BASE_TS_US = 1735689600_000_000  # 2025-01-01T00:00:00Z in microseconds
_LANGS = ("en", "ru", "de", "und")

# per-mille thresholds over a 0..999 roll (mutually exclusive classes)
_P_DUP = 20        # roll <  20  -> duplicated-url group anchor
_P_GIANT = 30      # roll <  30  -> giant DOM
_P_PDF = 50        # roll <  50  -> well-formed PDF payload
_P_BAD_PDF = 55    # roll <  55  -> structurally broken PDF (poison pill)
_P_MALFORMED = 65  # roll <  65  -> malformed/truncated bytes (poison pill)


def _rng(seed: int, i: int) -> random.Random:
    return random.Random(seed * 1_000_003 + i)


def _sentence(r: random.Random, n_words: int) -> str:
    return " ".join(r.choice(_WORDS) for _ in range(n_words))


def _nav_html(r: random.Random) -> str:
    links = "".join(
        f'<a href="/{r.choice(_WORDS)}/{j}">{r.choice(_WORDS)} {r.choice(_WORDS)}</a> '
        for j in range(r.randint(4, 9))
    )
    return f"<nav><div>{links}</div></nav>"


def _footer_html(r: random.Random) -> str:
    links = " | ".join(
        f'<a href="/about/{j}">{r.choice(_WORDS)}</a>' for j in range(r.randint(3, 6))
    )
    return f"<footer><div>{links} &copy; 2025 site</div></footer>"


def _content_html(r: random.Random, n_paras: int) -> str:
    parts = []
    for _ in range(n_paras):
        kind = r.randint(0, 9)
        if kind == 0:
            parts.append(f"<h2>{_sentence(r, r.randint(3, 6))}</h2>")
        elif kind == 1:
            items = "".join(f"<li>{_sentence(r, r.randint(4, 9))}</li>" for _ in range(r.randint(2, 5)))
            parts.append(f"<ul>{items}</ul>")
        else:
            body = _sentence(r, r.randint(15, 45))
            if r.random() < 0.3:  # inline link inside real content (low link density)
                body += f' see <a href="/ref">{r.choice(_WORDS)} {r.choice(_WORDS)}</a> {_sentence(r, 6)}'
            if r.random() < 0.2:
                body += " &amp; more &lt;data&gt;"
            parts.append(f"<p>{body}</p>")
    return "".join(parts)


def _page_html(r: random.Random, giant: bool = False) -> bytes:
    title = _sentence(r, r.randint(3, 7))
    n_paras = r.randint(3, 10) * (100 if giant else 1)
    doc = (
        "<!DOCTYPE html><html><head>"
        f"<title>{title}</title>"
        '<script>var x = "<p>not content</p>";</script>'
        "<style>p { color: red }</style>"
        "</head><body>"
        f"{_nav_html(r)}"
        f"<div id=main>{_content_html(r, n_paras)}</div>"
        f"{_footer_html(r)}"
        "</body></html>"
    )
    return doc.encode("utf-8")


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _page_pdf(r: random.Random) -> bytes:
    """Minimal uncompressed PDF: 1-3 content streams of `(txt) Tj` ops."""
    streams = []
    for _ in range(r.randint(1, 3)):
        lines = "\n".join(
            f"BT /F1 12 Tf 72 {700 - 14 * j} Td ({_pdf_escape(_sentence(r, r.randint(5, 10)))}) Tj ET"
            for j in range(r.randint(2, 6))
        )
        streams.append(lines.encode("latin-1"))
    body = [b"%PDF-1.4"]
    for k, s in enumerate(streams):
        body.append(
            b"%d 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj" % (k + 1, len(s), s)
        )
    body.append(b"trailer\n<< /Root 1 0 R >>\n%%EOF")
    return b"\n".join(body)


def _broken_pdf(r: random.Random) -> bytes:
    # %PDF magic but a stream that never terminates -> extractor must emit a
    # deterministic error row, not crash (poison-pill exercise).
    return b"%PDF-1.4\n1 0 obj\n<< /Length 99 >>\nstream\n" + _sentence(r, 8).encode()


def _malformed(r: random.Random) -> bytes:
    base = _page_html(r)[: r.randint(10, 200)]
    return base + bytes([r.randint(128, 255) for _ in range(r.randint(1, 30))])


def make_row(i: int, seed: int = 42) -> dict:
    """Generate page-row i. Pure function of (i, seed)."""
    r = _rng(seed, i)
    roll = r.randint(0, 999)
    site = i % 997
    url = f"https://site{site}.example/p/{i}"
    ts = _BASE_TS_US + (i * 61_000_000) + r.randint(0, 59_000_000)
    lang = _LANGS[i % len(_LANGS)]
    if roll < _P_DUP:
        html = _page_html(r)
    elif roll < _P_GIANT:
        html = _page_html(r, giant=True)
    elif roll < _P_PDF:
        html = _page_pdf(r)
    elif roll < _P_BAD_PDF:
        html = _broken_pdf(r)
    elif roll < _P_MALFORMED:
        html = _malformed(r)
    else:
        html = _page_html(r)
    server_text = _sentence(r, 10) if r.random() < 0.5 else ""
    return {"url": url, "warc_ts": ts, "html": html, "text": server_text, "lang": lang}


def make_capture_rows(i: int, seed: int = 42) -> list[dict]:
    """Rows for logical page i: usually one capture; dup-class pages get 2-5
    captures of the same url with increasing warc_ts (and, for a third of the
    dup groups, one exact-tie pair with differing payloads)."""
    base = make_row(i, seed)
    r = _rng(seed, i)
    roll = r.randint(0, 999)
    if roll >= _P_DUP:
        return [base]
    rows = [base]
    n_extra = r.randint(1, 4)
    for k in range(n_extra):
        r2 = _rng(seed, i * 1_000_000 + k + 1)
        cap = dict(base)
        cap["warc_ts"] = base["warc_ts"] + (k + 1) * 3_600_000_000  # +1h per capture
        cap["html"] = _page_html(r2)
        cap["text"] = _sentence(r2, 10)
        rows.append(cap)
    if r.random() < 0.34:  # exact-tie pair: same url, same ts, different html
        r3 = _rng(seed, i * 1_000_000 + 777)
        tie = dict(rows[-1])
        tie["html"] = _page_html(r3)
        tie["text"] = _sentence(r3, 10)
        rows.append(tie)
    return rows


def rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pydict(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        },
        schema=PAGES_SCHEMA,
    )


def generate_pages_table(n_pages: int, seed: int = 42, start: int = 0) -> pa.Table:
    """Driver-side generation for tests / small fixtures."""
    rows: list[dict] = []
    for i in range(start, start + n_pages):
        rows.extend(make_capture_rows(i, seed))
    return rows_to_table(rows)


def generate_corpus(
    out_dir: str,
    n_pages: int,
    seed: int = 42,
    n_files: int = 16,
    force: bool = False,
) -> list[str]:
    """Write a partitioned pages corpus: ``out_dir/pages_{k:05d}.parquet``,
    one file per contiguous page-id range (the input-partition unit for
    lineage/resume). Distributed via ray.data so bench-scale corpora don't
    serialize on the driver. Idempotent: skips generation when the marker for
    the same (n_pages, seed, n_files) already exists."""
    from ocr_suite_ray.version import corpus_code_fingerprint

    marker = os.path.join(
        out_dir, f".complete-{n_pages}-{seed}-{n_files}-{corpus_code_fingerprint()}"
    )
    if os.path.exists(marker) and not force:
        return sorted(
            os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".parquet")
        )
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        if f.endswith(".parquet") or f.startswith(".complete-"):
            os.remove(os.path.join(out_dir, f))

    bounds = np.linspace(0, n_pages, n_files + 1, dtype=np.int64)

    import ray.data as rd

    def _write_shard(batch: dict) -> dict:
        paths = []
        for k in map(int, batch["shard"]):
            lo, hi = int(bounds[k]), int(bounds[k + 1])
            tbl = generate_pages_table(hi - lo, seed=seed, start=lo)
            path = os.path.join(out_dir, f"pages_{k:05d}.parquet")
            tmp = path + ".tmp"
            pq.write_table(tbl, tmp, row_group_size=4096)
            os.replace(tmp, path)
            paths.append(path)
        return {"path": np.array(paths)}

    # One BLOCK per shard, not one batch: a single-block shard list makes
    # Ray run every shard inside one task (batch_size only re-batches within
    # a task), serializing corpus generation on one core.
    shards = rd.range(n_files, override_num_blocks=n_files).map_batches(
        lambda b: {"shard": b["id"]}, batch_format="numpy"
    )
    paths = [r["path"] for r in shards.map_batches(_write_shard, batch_size=1).take_all()]
    with open(marker, "w") as fh:
        fh.write("ok")
    return sorted(paths)
