"""Deterministic text extraction for Tj-operator PDF content streams.

The PDF path is the engine's "slow lane" — the analogue of the reference's
VisionKit provider, a second recognizer for a different payload class routed
to its own pool (``src/recognition/provider/vision_kit.cpp:71-87``,
``README.md:80-81``). A real deployment would hold a warm pdfium instance
per actor; pdfium is not available in this container, so this module
implements a layout parser for object streams with ``BT .. (text) Tj .. ET``
operators (the synthetic subset of ``sources/synthetic.py:_page_pdf``, PLUS
the real-world stream encodings stdlib can decode: ``/FlateDecode`` (zlib —
the filter virtually every real PDF uses), ``/ASCIIHexDecode`` and
``/LZWDecode`` (pure-Python, public ISO 32000-1 spec), applied in
filter-array order).

Image XObject streams (``/Subtype /Image`` — the DCTDecode/JPXDecode
carriers) are classified, not decoded: a text PDF with JPEG figures
extracts its text streams and skips the images (pre-round-4 these PDFs
errored whole-document on the image filter), while an image-ONLY payload —
a scanned PDF, the reference's core OCR case
(``src/recognition/provider/tesseract.cpp:59-120``) — routes to the OCR
engine (``functions/ocr.py``: guarded-import pytesseract, byte-
deterministic stub in this container) when one is supplied, else raises
``NotImplementedError``. Codec filters on NON-image streams (crypt,
DCT-compressed text — degenerate producers) still raise
``NotImplementedError``; structurally broken PDFs raise ``ValueError``.
Both become deterministic ``error:`` rows upstream.
"""

from __future__ import annotations

import binascii
import re
import zlib

from ocr_suite_ray.functions.textnorm import collapse_ws
from ocr_suite_ray.schemas import KIND_PDF_BLOCK

PDF_MAGIC = b"%PDF-"

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
# A PDF literal string with escapes, followed by the Tj (show text)
# operator. ISO 32000-1 §7.3.4.2 allows BALANCED unescaped parens inside
# a literal; the alternation admits one nesting level (the overwhelmingly
# common case — deeper nesting would need a real parser and is dropped).
_TJ_RE = re.compile(
    rb"\(((?:[^()\\]|\\.|\((?:[^()\\]|\\.)*\))*)\)\s*Tj",
    re.DOTALL,  # an escaped EOL (line continuation) sits INSIDE a literal
)
# filter name list from the stream's dict: /Filter /Flate… or /Filter [ … ]
_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")
_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")
_EARLY_RE = re.compile(rb"/EarlyChange\s+(\d+)")
_IMAGE_RE = re.compile(rb"/Subtype\s*/Image\b")
_STREAM_OPEN_RE = re.compile(rb">>\s*stream\r?\n")


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """PDF LZWDecode (ISO 32000-1 §7.4.4, public spec): variable 9→12-bit
    codes, 256=clear-table, 257=EOD, with the TIFF ``EarlyChange`` code-width
    bump (default 1: the width grows one code early). Pure stdlib."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    bitbuf = 0
    nbits = 0
    width = 9
    prev: bytes | None = None
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # clear table
                del table[258:]
                width = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("bad LZW stream: first code out of range")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("bad LZW stream: code out of range")
            out += entry
            prev = entry
            # the decoder's table lags the encoder's by one entry, so it
            # bumps the code width one entry earlier (the EarlyChange rule)
            if len(table) + early_change >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _decode_stream(
    dict_bytes: bytes, body: bytes, stop_at_codec: bool = False
) -> bytes:
    """Apply the stream dict's filter chain with stdlib decoders.

    ``stop_at_codec=True`` (the image lane): stdlib-decodable PREFIX
    filters are applied and the body is returned as soon as a codec
    filter (DCTDecode/JPXDecode/...) is reached — e.g. a
    ``[/FlateDecode /DCTDecode]`` image unwraps the zlib layer so the
    OCR engine receives an actual JPEG file, not zlib bytes."""
    m = _FILTER_RE.search(dict_bytes)
    if not m:
        return body
    for name in _NAME_RE.findall(m.group(1)):
        if name == b"FlateDecode":
            try:
                body = zlib.decompress(body)
            except zlib.error as exc:
                raise ValueError(f"bad FlateDecode stream: {exc}") from exc
        elif name == b"ASCIIHexDecode":
            hexpart = body.split(b">", 1)[0]
            hexpart = re.sub(rb"\s+", b"", hexpart)
            if len(hexpart) % 2:
                hexpart += b"0"  # PDF spec: odd length implies trailing 0
            try:
                body = binascii.unhexlify(hexpart)
            except binascii.Error as exc:
                raise ValueError(f"bad ASCIIHexDecode stream: {exc}") from exc
        elif name == b"LZWDecode":
            em = _EARLY_RE.search(dict_bytes)
            body = _lzw_decode(body, int(em.group(1)) if em else 1)
        else:
            if stop_at_codec:
                return body  # codec layer (DCT/JPX/...) is the payload
            raise NotImplementedError(
                f"PDF filter {name.decode()} needs pdfium (stubbed)"
            )
    return body
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
            if nxt in b"01234567":
                # octal escape \d, \dd or \ddd (ISO 32000-1 Table 3)
                j = i + 1
                while j < min(i + 4, len(lit)) and lit[j : j + 1] in b"01234567":
                    j += 1
                out.append(int(lit[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            if nxt in (b"\n", b"\r"):
                # backslash-EOL line continuation: both bytes vanish
                # (\r\n counts as one EOL)
                i += 2
                if nxt == b"\r" and lit[i : i + 1] == b"\n":
                    i += 1
                continue
            out += _ESCAPES.get(nxt, nxt)
            i += 2
        else:
            out += c
            i += 1
    return bytes(out)


def _stream_dict(payload: bytes, stream_kw_start: int) -> bytes:
    """The stream object's FULL dict: the dict closes with ``>>`` just
    before the ``stream`` keyword — walk backward balancing ``<<``/``>>``
    pairs so a nested dict (e.g. ``/DecodeParms <<…>>``) cannot hide the
    outer ``/Filter`` (a bare ``rfind(b"<<")`` finds only the innermost
    opener and silently treats a filtered stream as raw)."""
    end = payload.rfind(b">>", 0, stream_kw_start)
    if end < 0:
        return b""
    depth = 0
    i = end
    while i >= 0:
        two = payload[i : i + 2]
        if two == b">>":
            depth += 1
            i -= 2
        elif two == b"<<":
            depth -= 1
            if depth == 0:
                return payload[i:stream_kw_start]
            i -= 2
        else:
            i -= 1
    # unbalanced (malformed producer): fall back to the innermost opener
    start = payload.rfind(b"<<", 0, stream_kw_start)
    return payload[start:stream_kw_start] if start >= 0 else b""


def extract_pdf(payload: bytes, ocr=None) -> dict:
    """bytes → {text, spans, n_blocks_kept, n_blocks_dropped}.

    One span of kind ``pdf_block`` per content stream (the page analogue).
    Image XObject streams contribute no text; when the document is
    image-ONLY (a scanned PDF) and ``ocr`` (an ``image bytes → text``
    callable, see ``functions/ocr.py``) is supplied, each image yields one
    ``ocr_block`` span instead — stdlib-decodable prefix filters are
    stripped first, so a ``[/FlateDecode /DCTDecode]`` image hands the
    engine an actual JPEG file (which real OCR stacks open directly;
    pdfium-style raster decode of Flate-packed PIXEL buffers is out of
    scope here).
    Raises ValueError for structurally broken files (unterminated stream),
    NotImplementedError for codec/encrypted TEXT streams or for a scanned
    PDF with no OCR engine supplied.
    """
    from ocr_suite_ray.schemas import KIND_OCR_BLOCK

    if not payload.startswith(PDF_MAGIC):
        raise ValueError("not a PDF payload")
    # unterminated-stream guard, STRUCTURAL: a stream keyword always
    # follows its object dict's ">>". The last such opener must have an
    # "endstream" after it — a bare substring-presence check passes when
    # any EARLIER stream terminated (silently dropping the truncated
    # one), and raw byte counting false-positives on content text that
    # merely contains the word "stream".
    opens = list(_STREAM_OPEN_RE.finditer(payload))
    for j, _m in enumerate(opens):
        # EVERY opener needs an endstream before the next opener (or EOF)
        # — checking only the last one let a truncated earlier stream
        # silently merge with its successor's content (one wrong block +
        # span instead of the contracted ValueError)
        limit = opens[j + 1].start() if j + 1 < len(opens) else len(payload)
        if payload.find(b"endstream", _m.end(), limit) < 0:
            raise ValueError("unterminated PDF stream")
    if not opens and b"stream" in payload and b"endstream" not in payload:
        raise ValueError("unterminated PDF stream")

    pieces: list[str] = []
    spans: list[tuple[int, int, str]] = []
    pos = 0
    dropped = 0
    images: list[bytes] = []
    saw_text_ops = False
    for m in _STREAM_RE.finditer(payload):
        dict_bytes = _stream_dict(payload, m.start())
        if _IMAGE_RE.search(dict_bytes):
            images.append(_decode_stream(dict_bytes, m.group(1),
                                         stop_at_codec=True))
            continue
        body = _decode_stream(dict_bytes, m.group(1))
        texts = [_unescape(lit) for lit in _TJ_RE.findall(body)]
        if texts:
            # Tj operators exist even if their literals collapse to
            # nothing: this is a TEXT pdf, not a scanned one
            saw_text_ops = True
        block = collapse_ws(" ".join(t.decode("latin-1") for t in texts))
        if not block:
            dropped += 1
            continue
        if pieces:
            pos += 2
        pieces.append(block)
        spans.append((pos, pos + len(block), KIND_PDF_BLOCK))
        pos += len(block)
    if not pieces and images and saw_text_ops:
        # a TEXT pdf whose literals all collapsed to nothing, plus
        # figures: an empty-text document, NOT a scanned one — the
        # figures count as dropped, never routed to OCR
        dropped += len(images)
        images = []
    if not pieces and images:
        # image-only payload = scanned PDF -> the OCR lane
        if ocr is None:
            raise NotImplementedError("scanned (image-only) PDF needs an OCR engine")
        for img in images:
            block = collapse_ws(ocr(img))
            if not block:
                dropped += 1
                continue
            if pieces:
                pos += 2
            pieces.append(block)
            spans.append((pos, pos + len(block), KIND_OCR_BLOCK))
            pos += len(block)
    else:
        dropped += len(images)  # figures in a text PDF: classified, skipped
    if not pieces and b"stream" not in payload:
        raise ValueError("PDF with no content streams")
    return {
        "text": "\n\n".join(pieces),
        "spans": spans,
        "n_blocks_kept": len(pieces),
        "n_blocks_dropped": dropped,
    }
