"""Byte→text normalization: charset sniff + NFC + whitespace collapse.

Reference analogue: the pixel-format normalizer that converts any input
pix_fmt to a canonical RGB24 buffer before OCR (``src/ffmpeg/decoder.cpp:
213-244``) and the whitespace trim helpers (``include/ocs/common/util.h:
13-26``). Determinism rule: the same bytes always decode to the same string
regardless of process / platform — utf-8 strict first, latin-1 fallback
(latin-1 never fails), then unicode NFC.
"""

from __future__ import annotations

import unicodedata

def decode_bytes(payload: bytes) -> tuple[str, str]:
    """Return (decoded_text, charset_used). Deterministic for any byte input."""
    try:
        return payload.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        return payload.decode("latin-1"), "latin-1"


def nfc(s: str) -> str:
    # NFC is the identity on pure-ASCII text; str.isascii() is a C-speed
    # flag check (no scan, no allocation) and most crawl blocks are ASCII
    if s.isascii():
        return s
    return unicodedata.normalize("NFC", s)


def collapse_ws(s: str) -> str:
    """Collapse all whitespace runs to single spaces and strip ends
    (util.h:13-26 trim analogue, extended to inner runs so extracted text is
    independent of source indentation). ``str.split()`` and regex ``\\s+``
    agree on the Unicode whitespace set (verified over the full BMP); the
    split/join form is ~4x faster than ``re.sub`` on this kernel's block
    sizes."""
    return " ".join(s.split())
