"""Deterministic HTML main-content extraction (Boilerpipe/Readability-style).

This is the engine's per-document "recognizer" — the analogue of the
reference's Tesseract provider ``do_ocr`` (``src/recognition/provider/
tesseract.cpp:80-120``): payload in, list of recognized spans out. Instead of
pixel boxes + confidence, each span is a char-offset interval into the
extracted text with a block kind.

Algorithm (public Boilerpipe/Readability heuristics, no external parser —
stdlib ``html.parser`` only, pinned by the Python version):

1. Flat block segmentation: walk the token stream; block-level tags
   (p/h*/li/td/div/...) open a new block, text nodes accumulate into the
   current block, ``<a>`` text additionally accumulates into the block's
   link-char counter. ``<script>``/``<style>`` content is skipped.
2. Per-block features: word count (words = tokens with >= MIN_WORD_CHARS
   alphanumeric chars, the analogue of ``min_letters_threshold_ = 3``,
   ``include/ocs/recognition/provider/provider.h:26``) and link density
   (link chars / total chars).
3. Classification: keep a block iff it is the <title>, OR
   (link_density <= MAX_LINK_DENSITY and word_count >= MIN_WORDS).
   Nav bars and footers have link density near 1.0 and are dropped;
   real paragraphs keep their occasional inline link.
4. Assembly: kept blocks joined by "\n\n"; spans recorded as
   (start, stop, kind) over the final string.

Determinism: pure function of the input bytes — no dict-order dependence
(blocks kept in document order), no float formatting, charset fallback fixed
(textnorm.decode_bytes), whitespace collapsed canonically.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from html.parser import HTMLParser

from ocr_suite_ray.functions.textnorm import collapse_ws, decode_bytes, nfc  # noqa: F401
from ocr_suite_ray.schemas import (
    KIND_HEADING,
    KIND_LIST,
    KIND_PARAGRAPH,
    KIND_TITLE,
)

MIN_WORDS = 3          # blocks with fewer content words are boilerplate
MIN_WORD_CHARS = 3     # min_letters_threshold_ analogue (provider.h:26)
MAX_LINK_DENSITY = 0.35

# Tags that delimit text blocks (flat segmentation).
_BLOCK_TAGS = frozenset(
    "p h1 h2 h3 h4 h5 h6 li td th pre blockquote div article section title "
    "header footer nav ul ol table tr body caption figcaption dt dd".split()
)
_SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})

_KIND_BY_TAG = {
    "title": KIND_TITLE,
    "h1": KIND_HEADING,
    "h2": KIND_HEADING,
    "h3": KIND_HEADING,
    "h4": KIND_HEADING,
    "h5": KIND_HEADING,
    "h6": KIND_HEADING,
    "li": KIND_LIST,
    "dt": KIND_LIST,
    "dd": KIND_LIST,
}


@dataclass
class Block:
    kind: str
    chunks: list
    link_chars: int = 0
    total_chars: int = 0

    def text(self) -> str:
        # NFC applied per block (not to the whole raw document): segmentation
        # is normalization-invariant and the blocks are a small fraction of
        # the input bytes
        return nfc(collapse_ws("".join(self.chunks)))


class _BlockParser(HTMLParser):
    """Tokenizes HTML into flat text blocks with link-char accounting."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._cur: Block | None = None
        self._skip_depth = 0
        self._link_depth = 0

    # -- block lifecycle ---------------------------------------------------
    def _flush(self) -> None:
        if self._cur is not None and self._cur.total_chars > 0:
            self.blocks.append(self._cur)
        self._cur = None

    def _open(self, tag: str) -> None:
        self._flush()
        self._cur = Block(kind=_KIND_BY_TAG.get(tag, KIND_PARAGRAPH), chunks=[])

    # -- HTMLParser hooks --------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._link_depth += 1
        elif tag in _BLOCK_TAGS:
            self._open(tag)
        elif tag == "br":
            if self._cur is not None:
                self._cur.chunks.append(" ")

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag == "br" and self._cur is not None and not self._skip_depth:
            self._cur.chunks.append(" ")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth or not data:
            return
        if self._cur is None:
            if not data.strip():
                return
            self._cur = Block(kind=KIND_PARAGRAPH, chunks=[])
        stripped_len = len(data.strip())
        self._cur.chunks.append(data)
        self._cur.total_chars += stripped_len
        if self._link_depth:
            self._cur.link_chars += stripped_len

    def close(self) -> None:
        super().close()
        self._flush()


# token qualifies as a content word iff it contains >= MIN_WORD_CHARS
# alphanumeric characters ([^\W_] == unicode letters+digits); compiled
# regex instead of a per-character Python loop (40% of kernel time)
_WORD_OK = re.compile(r"(?:[\W_]*[^\W_]){%d}" % MIN_WORD_CHARS)


def _word_count(text: str) -> int:
    m = _WORD_OK.match
    n = 0
    for tok in text.split(" "):
        if m(tok):
            n += 1
    return n


def classify(block: Block, text: str) -> bool:
    """Content-vs-boilerplate decision for one block."""
    if not text:
        return False
    if block.kind == KIND_TITLE:
        return True
    link_density = (block.link_chars / block.total_chars) if block.total_chars else 1.0
    return link_density <= MAX_LINK_DENSITY and _word_count(text) >= MIN_WORDS


def extract_html(payload: bytes) -> dict:
    """bytes → {text, spans, n_blocks_kept, n_blocks_dropped}.

    Raises on undecodable garbage only via explicit checks upstream; the
    parser itself is total (html.parser never raises on malformed markup).
    """
    raw, _charset = decode_bytes(payload)
    parser = _BlockParser()
    parser.feed(raw)
    parser.close()

    pieces: list[str] = []
    spans: list[tuple[int, int, str]] = []
    kept = dropped = 0
    pos = 0
    for block in parser.blocks:
        text = block.text()
        if classify(block, text):
            if pieces:
                pos += 2  # "\n\n" separator
            pieces.append(text)
            spans.append((pos, pos + len(text), block.kind))
            pos += len(text)
            kept += 1
        elif text:
            dropped += 1
    return {
        "text": "\n\n".join(pieces),
        "spans": spans,
        "n_blocks_kept": kept,
        "n_blocks_dropped": dropped,
    }
