"""Deterministic text extraction for the synthetic minimal-PDF payloads.

The PDF path is the engine's "slow lane" — the analogue of the reference's
VisionKit provider, a second recognizer for a different payload class routed
to its own pool (``src/recognition/provider/vision_kit.cpp:71-87``,
``README.md:80-81``). A real deployment would hold a warm pdfium instance
per actor; pdfium is not available in this container, so this module
implements a layout parser for the *synthetic* uncompressed PDF subset the
corpus generator emits (``sources/synthetic.py:_page_pdf``): object streams
with ``BT .. (text) Tj .. ET`` operators. Anything outside that subset —
compressed streams, xref-driven layout — raises ``NotImplementedError``
(clearly-marked stub per the build brief); structurally broken PDFs raise
``ValueError`` and become deterministic ``error:`` rows upstream.
"""

from __future__ import annotations

import re

from ocr_suite_ray.functions.textnorm import collapse_ws
from ocr_suite_ray.schemas import KIND_PDF_BLOCK

PDF_MAGIC = b"%PDF-"

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
# A PDF literal string with escapes, followed by the Tj (show text) operator.
_TJ_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*Tj")
_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(lit: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(lit):
        c = lit[i : i + 1]
        if c == b"\\" and i + 1 < len(lit):
            nxt = lit[i + 1 : i + 2]
            out += _ESCAPES.get(nxt, nxt)
            i += 2
        else:
            out += c
            i += 1
    return bytes(out)


def extract_pdf(payload: bytes) -> dict:
    """bytes → {text, spans, n_blocks_kept, n_blocks_dropped}.

    One span of kind ``pdf_block`` per content stream (the page analogue).
    Raises ValueError for structurally broken files (unterminated stream),
    NotImplementedError for compressed/encrypted streams.
    """
    if not payload.startswith(PDF_MAGIC):
        raise ValueError("not a PDF payload")
    if b"/Filter" in payload:
        raise NotImplementedError("compressed PDF streams need pdfium (stubbed)")
    if b"stream" in payload and b"endstream" not in payload:
        raise ValueError("unterminated PDF stream")

    pieces: list[str] = []
    spans: list[tuple[int, int, str]] = []
    pos = 0
    dropped = 0
    for m in _STREAM_RE.finditer(payload):
        body = m.group(1)
        texts = [_unescape(lit) for lit in _TJ_RE.findall(body)]
        block = collapse_ws(" ".join(t.decode("latin-1") for t in texts))
        if not block:
            dropped += 1
            continue
        if pieces:
            pos += 2
        pieces.append(block)
        spans.append((pos, pos + len(block), KIND_PDF_BLOCK))
        pos += len(block)
    if not pieces and b"stream" not in payload:
        raise ValueError("PDF with no content streams")
    return {
        "text": "\n\n".join(pieces),
        "spans": spans,
        "n_blocks_kept": len(pieces),
        "n_blocks_dropped": dropped,
    }
