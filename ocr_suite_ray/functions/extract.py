"""Payload sniffing + per-row extraction dispatch + poison-pill containment.

Sniffing is the analogue of the reference's I/P/B frame-type filter
(``src/ffmpeg/decoder.cpp:45-57,279-284``): a cheap per-record classifier
that decides which recognizer a payload goes to. Error containment is the
per-row try/except the reference lacks (a consumer exception there aborts
the whole run, ``src/recognition/main.cpp:155-163``): a malformed payload
yields a deterministic ``error:<ExceptionClass>`` row instead.
"""

from __future__ import annotations

from ocr_suite_ray.functions.html_extract import extract_html
from ocr_suite_ray.functions.pdf_extract import PDF_MAGIC, extract_pdf

KIND_HTML = "html"
KIND_PDF = "pdf"

_EMPTY = {"text": "", "spans": [], "n_blocks_kept": 0, "n_blocks_dropped": 0}


def sniff_kind(payload: bytes | None) -> str:
    if payload and payload[:5] == PDF_MAGIC:
        return KIND_PDF
    return KIND_HTML


def extract_payload(
    payload: bytes | None, kind: str | None = None, ocr=None
) -> dict:
    """One page payload → extraction dict with ``payload_kind`` + ``status``.

    ``ocr`` is an optional ``image bytes → text`` callable handed to the
    PDF lane for image-only (scanned) payloads; with none supplied those
    payloads stay deterministic ``error:NotImplementedError`` rows.

    Total function: never raises. Deterministic error classes:
    EmptyPayload, ValueError, NotImplementedError, ...
    """
    if not payload:
        return {**_EMPTY, "payload_kind": KIND_HTML, "status": "error:EmptyPayload"}
    kind = kind or sniff_kind(payload)
    try:
        if kind == KIND_PDF:
            out = extract_pdf(payload, ocr=ocr)
        else:
            out = extract_html(payload)
        out["payload_kind"] = kind
        out["status"] = "ok"
        return out
    except Exception as exc:  # poison pill -> deterministic error row
        return {**_EMPTY, "payload_kind": kind, "status": f"error:{type(exc).__name__}"}
