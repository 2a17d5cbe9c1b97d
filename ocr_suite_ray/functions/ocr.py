"""OCR engine for image-only ("scanned") payloads — guarded-import real
engine, deterministic stub otherwise.

Reference analogue: the Tesseract provider itself
(``src/recognition/provider/tesseract.cpp:59-120`` — one warm
``TessBaseAPI`` per consumer, fed raw frames). This container ships no
tesseract/pillow, so the module follows the repo's FakeDecoder pattern
(``stages/multimodal.py``): the Ray-side plumbing (dispatch, actor pool,
schema, spans) is real and tested; the pixel→text inference is

- ``engine="real"``: ``pytesseract`` + ``PIL`` behind a guarded import —
  raises ``NotImplementedError`` with the missing package named when the
  libs are absent, works unchanged when they are installed;
- ``engine="stub"``: a byte-deterministic fake (digest + length of the
  image bytes), so tests can assert exact output and the stub/real twin
  keeps the dispatch path covered in this sandbox;
- ``engine="auto"``: real when available, stub otherwise.
"""

from __future__ import annotations

import hashlib

try:  # guarded import: neither package ships in this container
    import pytesseract  # type: ignore
    from PIL import Image  # type: ignore

    OCR_AVAILABLE = True
except ImportError:  # pragma: no cover - exercised only where libs exist
    pytesseract = None
    Image = None
    OCR_AVAILABLE = False


def resolve_engine(engine: str = "auto") -> str:
    """'auto' → 'real' when pytesseract+PIL import, else 'stub'."""
    if engine == "auto":
        return "real" if OCR_AVAILABLE else "stub"
    if engine not in ("real", "stub"):
        raise ValueError(f"unknown OCR engine {engine!r}")
    return engine


def ocr_image_text(image_bytes: bytes, engine: str = "auto") -> str:
    """One image payload → recognized text.

    The stub is byte-deterministic (same bytes → same text, different
    bytes → different text with overwhelming probability), so golden /
    resume / dedup invariants hold under it exactly as they would under a
    real engine with pinned weights."""
    engine = resolve_engine(engine)
    if engine == "real":
        if not OCR_AVAILABLE:  # pragma: no cover
            raise NotImplementedError(
                "OCR engine 'real' needs pytesseract + pillow; "
                "use engine='stub' or engine='auto'"
            )
        import io

        img = Image.open(io.BytesIO(image_bytes))
        return pytesseract.image_to_string(img).strip()
    digest = hashlib.blake2b(image_bytes, digest_size=8).hexdigest()
    return f"[ocr-stub {digest} {len(image_bytes)}b]"
