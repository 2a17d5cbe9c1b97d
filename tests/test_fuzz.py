"""Property-based robustness: the extraction kernel must be total (never
raise) and deterministic for ARBITRARY byte payloads — the per-row poison
containment the reference lacks (a consumer exception there aborts the
whole run, ``src/recognition/main.cpp:155-163``)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_suite_ray.functions.extract import extract_payload
from ocr_suite_ray.functions.html_extract import extract_html
from ocr_suite_ray.functions.textnorm import collapse_ws, decode_bytes


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_extract_payload_total_and_deterministic(payload):
    a = extract_payload(payload)
    b = extract_payload(payload)
    assert a == b
    assert a["status"] == "ok" or a["status"].startswith("error:")
    assert isinstance(a["text"], str)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_pdf_magic_payloads_never_crash(prefixless):
    out = extract_payload(b"%PDF-" + prefixless)
    assert out["payload_kind"] == "pdf"
    assert out["status"] == "ok" or out["status"].startswith("error:")


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=2048))
def test_html_spans_always_consistent(doc):
    out = extract_html(doc.encode("utf-8", "surrogatepass")[:2048])
    text = out["text"]
    for start, stop, kind in out["spans"]:
        assert 0 <= start <= stop <= len(text)
        assert kind
    assert out["n_blocks_kept"] == len(out["spans"])


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=1024))
def test_decode_bytes_total(b):
    s, charset = decode_bytes(b)
    assert charset in ("utf-8", "latin-1")
    assert decode_bytes(b) == (s, charset)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=512))
def test_collapse_ws_idempotent(s):
    once = collapse_ws(s)
    assert collapse_ws(once) == once
    assert "  " not in once
