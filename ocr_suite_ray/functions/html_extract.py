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


# --- fast scanner tokenizer --------------------------------------------------
#
# stdlib html.parser is correct but allocation-heavy (incremental buffer
# management, attribute parsing, per-construct regex dispatch) — at 28
# concurrent parsers its string churn saturates a single box's memory bus
# (BASELINE.md control experiment). This scanner walks the document once with
# str.find + a handful of compiled regexes, allocating only the text slices
# the sink actually keeps, and mimics html.parser's OBSERVABLE behavior for
# this sink: tag open/close events, charref-converted text, script/style as
# CDATA until the first matching close tag, comments/declarations/PIs
# skipped, and an unterminated construct at EOF emitted as raw data
# (html.parser goahead(end=1) fallback). Byte-identical output vs
# _BlockParser is enforced by tests/test_extract_functions.py on handcrafted
# edge cases and a large synthetic corpus.
#
# Known divergence (documented, absent from crawls our heuristics target):
# a '>' INSIDE a quoted attribute value ends the tag early here;
# html.parser's quote-aware scan does not.

_TAGNAME = re.compile(r"[a-zA-Z][^\t\n\r\f />\x00]*")
_ENDTAG = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")

# noscript/template: parsed as normal markup but every event inside is
# suppressed (the oracle's _SKIP_TAGS minus the CDATA pair, which the
# scanner handles by jumping to the close tag)
_SKIP_NOCDATA = frozenset({"noscript", "template"})

# The stdlib parser's own tolerant regexes, so the scanner's rare paths
# (self-closing confirmation, junk-bearing end tags, comment close) are
# html.parser-exact by construction. Pinned by the Python version like the
# rest of the oracle; copied fallbacks keep hot-path behavior if a future
# stdlib stops exposing them.
try:
    from html.parser import attrfind_tolerant as _ATTRFIND_TOL
    from html.parser import tagfind_tolerant as _TAGFIND_TOL
    from html.parser import commentclose as _COMMENTCLOSE
except ImportError:  # pragma: no cover - stdlib layout change
    _ATTRFIND_TOL = re.compile(
        r"""((?<=[\'"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*"""
        r"""(\'[^\']*\'|"[^"]*"|(?![\'"])[^>\s]*))?(?:\s|/(?!>))*"""
    )
    _TAGFIND_TOL = re.compile(r"([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*")
    _COMMENTCLOSE = re.compile(r"--\s*>")
_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script", re.IGNORECASE),
    "style": re.compile(r"</\s*style", re.IGNORECASE),
}

# Master event pattern: ONE C-level search per construct replaces the
# find('<') + next-char classify + per-kind regex sequence (each tag
# previously cost ~4-6 C calls plus slice allocations; at ~125 events per
# document the dispatch overhead was the biggest single kernel line item).
# Alternatives mirror html.parser's classification exactly; a '<' that
# starts no construct matches with all groups None (literal-data event).
# Group 1: comment open; 2: full end tag name; 3: bogus end-tag slash;
# 4: start tag name; 5: declaration/PI marker.
_EVENT = re.compile(
    r"<(?:(!--)"
    r"|/\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>"
    r"|(/)"
    r"|([a-zA-Z][^\t\n\r\f />\x00]*)"
    r"|([!?])"
    r")?"
)


def _incomplete(raw: str, i: int) -> tuple[str, int]:
    """html.parser's end-of-input fallback for an unterminated construct:
    emit raw data up to the next '>' (inclusive) / next '<' / one char."""
    k = raw.find(">", i + 1)
    if k < 0:
        k = raw.find("<", i + 1)
        if k < 0:
            k = i + 1
    else:
        k += 1
    return raw[i:k], k


def _scan_blocks(raw: str) -> list[Block]:
    """One-pass scan with the block-accumulation state INLINED as locals —
    the ~125 tag/text events per document would otherwise each pay a Python
    method call into an accumulator object (measured ~30% of kernel time).
    Accumulation semantics: block-level tags open a block, text nodes
    accumulate, <a> text feeds the link-char counter (the link-density
    feature), noscript/template content is skip-depth-suppressed — identical
    to ``_BlockParser``'s handlers; the differential oracle test (vs stdlib
    html.parser) pins both tokenization and accumulation."""
    from html import unescape

    n = len(raw)
    find = raw.find
    search = _EVENT.search
    blocks: list[Block] = []
    link_depth = 0
    skip_depth = 0  # inside noscript/template (oracle _skip_depth)
    cur_chunks: list | None = None  # None <=> no open block
    cur_kind = KIND_PARAGRAPH
    cur_link = 0
    cur_total = 0
    i = 0

    def _fallback_data(text: str) -> None:
        # html.parser goahead(end=1): an unterminated construct at EOF is
        # emitted as raw DATA (no unescape). One helper instead of four
        # copy-pasted stanzas; suppressed inside noscript/template like
        # every other data event.
        nonlocal cur_chunks, cur_kind, cur_link, cur_total
        if skip_depth or not text:
            return
        if "&" in text:
            # html.parser's goahead(end=1) fallback DOES unescape when
            # convert_charrefs is on (and the cdata path never reaches EOF
            # fallback), so raw emission here would diverge
            text = unescape(text)
        if cur_chunks is not None:
            sl = len(text.strip())
            cur_chunks.append(text)
            cur_total += sl
            if link_depth:
                cur_link += sl
        elif text.strip():
            cur_kind = KIND_PARAGRAPH
            cur_chunks = [text]
            cur_total = len(text.strip())
            cur_link = cur_total if link_depth else 0

    def _selfclosing(name_start: int, gt: int) -> bool:
        # html.parser parse_starttag: a tag is self-closing iff the
        # remainder AFTER consuming attributes strips to '/>'. A bare
        # raw[gt-1] == '/' check misreads an unquoted attribute value
        # ending in '/' (<a href=http://x.y/>) as self-closing, which
        # never increments link_depth and breaks link-density dropping.
        tm = _TAGFIND_TOL.match(raw, name_start)
        k = tm.end() if tm is not None else name_start
        while k < gt:
            am = _ATTRFIND_TOL.match(raw, k)
            if am is None:
                break
            k = am.end()
        return raw[k : gt + 1].strip() == "/>"

    def _end_tag_event(name: str) -> None:
        nonlocal skip_depth, link_depth, cur_chunks
        if name in _SKIP_TAGS:
            # FULL skip set: a matched </script> never reaches here (the
            # CDATA jump consumes it), but an UNMATCHED one does, and the
            # oracle decrements the depth a <noscript> opened
            skip_depth = max(0, skip_depth - 1)
            return
        if skip_depth:
            return
        if name == "a":
            if link_depth:
                link_depth -= 1
        elif name in _BLOCK_TAGS:
            if cur_chunks is not None and cur_total > 0:
                blocks.append(Block(cur_kind, cur_chunks, cur_link, cur_total))
            cur_chunks = None

    while i < n:
        m = search(raw, i)
        lt = m.start() if m is not None else -1
        if lt < 0 or lt > i:
            text = raw[i:] if lt < 0 else raw[i:lt]
            if not skip_depth:
                if "&" in text:
                    text = unescape(text)
                # inline data event
                st = text.strip()
                if cur_chunks is not None:
                    sl = len(st)
                    cur_chunks.append(text)
                    cur_total += sl
                    if link_depth:
                        cur_link += sl
                elif st:
                    sl = len(st)
                    cur_kind = KIND_PARAGRAPH
                    cur_chunks = [text]
                    cur_total = sl
                    cur_link = sl if link_depth else 0
            if lt < 0:
                break
        name = m.group(4)
        if name is not None:  # start tag (ASCII letter only —
            # html.parser's starttagopen; unicode letters are data)
            name = name.lower()
            gt = find(">", lt + 1)
            if gt < 0:
                text, i = _incomplete(raw, lt)
                _fallback_data(text)
                continue
            selfclosing = (
                raw[gt - 1] == "/"
                and gt - 1 > lt
                and _selfclosing(lt + 1, gt)
            )
            i = gt + 1
            if not selfclosing and name in _CDATA_CLOSE:
                # CDATA content model: skip to the FIRST matching close tag
                # (html.parser never reports constructs inside script/style)
                mc = _CDATA_CLOSE[name].search(raw, i)
                if mc is None:
                    break  # unterminated script/style: rest is dead content
                me = _ENDTAG.match(raw, mc.start())
                i = me.end() if me else find(">", mc.start()) + 1 or n
                continue
            if name in _SKIP_NOCDATA:
                # noscript/template: content parsed as markup but every
                # event inside is suppressed (oracle _skip_depth)
                if not selfclosing:
                    skip_depth += 1
                continue
            if skip_depth:
                continue
            # inline start event (self-closed tags: only <br/> acts)
            if name == "a":
                if not selfclosing:
                    link_depth += 1
            elif name == "br":
                if cur_chunks is not None:
                    cur_chunks.append(" ")
            elif not selfclosing and name in _BLOCK_TAGS:
                if cur_chunks is not None and cur_total > 0:
                    blocks.append(Block(cur_kind, cur_chunks, cur_link, cur_total))
                cur_kind = _KIND_BY_TAG.get(name, KIND_PARAGRAPH)
                cur_chunks = []
                cur_link = 0
                cur_total = 0
        elif m.group(2) is not None:  # end tag (full </name> form)
            i = m.end()
            _end_tag_event(m.group(2).lower())
        elif m.group(3) is not None:  # '</' not matching the strict form
            # html.parser parse_endtag tolerant path: a letter after '</'
            # is an end tag whose junk (attributes, garbage) runs to the
            # next '>' (</div foo=bar> CLOSES div); otherwise the whole
            # construct is a bogus comment, skipped to '>'
            nm = _TAGFIND_TOL.match(raw, lt + 2)
            if nm is not None:
                gt = find(">", nm.end())
                if gt < 0:
                    text, i = _incomplete(raw, lt)
                    _fallback_data(text)
                else:
                    i = gt + 1
                    _end_tag_event(nm.group(1).lower())
            else:
                gt = find(">", lt + 1)
                if gt < 0:
                    text, i = _incomplete(raw, lt)
                    _fallback_data(text)
                else:
                    i = gt + 1  # bogus end tag: ignored
            continue
        elif m.group(1) is not None:  # comment
            e = _COMMENTCLOSE.search(raw, lt + 4)
            if e is None:
                text, i = _incomplete(raw, lt)
                _fallback_data(text)
                continue
            i = e.end()  # html.parser commentclose: '--' + \s* + '>'
        elif m.group(5) is not None:  # declaration / processing instruction
            gt = find(">", lt + 1)
            if gt < 0:
                text, i = _incomplete(raw, lt)
                _fallback_data(text)
                continue
            i = gt + 1
        else:  # bare '<': literal data
            if skip_depth:
                pass
            elif cur_chunks is not None:
                cur_chunks.append("<")
                cur_total += 1
                if link_depth:
                    cur_link += 1
            else:
                cur_kind = KIND_PARAGRAPH
                cur_chunks = ["<"]
                cur_total = 1
                cur_link = 1 if link_depth else 0
            i = lt + 1
    if cur_chunks is not None and cur_total > 0:  # close
        blocks.append(Block(cur_kind, cur_chunks, cur_link, cur_total))
    return blocks


class _BlockParser(HTMLParser):
    """Tokenizes HTML into flat text blocks with link-char accounting.

    Retained as the differential ORACLE for the fast scanner above
    (tests assert byte-identical extraction); not on the hot path."""

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
# alphanumeric characters ([^\W_] == unicode letters+digits). ONE C-speed
# scan per block instead of a Python loop with a regex match per token (was
# ~25% of kernel time): a match starts at a token boundary ((?<![^ ]) — the
# text is already whitespace-collapsed, so tokens are single-space
# separated) and consumes non-alnum filler ([^\w ]|_ == [\W_] minus the
# separator) between the required alphanumerics, never crossing a space.
_WORD_OK = re.compile(r"(?<![^ ])(?:(?:[^\w ]|_)*[^\W_ ]){%d}" % MIN_WORD_CHARS)


def _word_count(text: str) -> int:
    n = 0
    for _ in _WORD_OK.finditer(text):
        n += 1
    return n


def _has_min_words(text: str) -> bool:
    """True iff the block has >= MIN_WORDS content words — early-exits after
    the MIN_WORDS-th match, so long kept paragraphs cost 3 matches, not a
    full scan."""
    need = MIN_WORDS
    for _ in _WORD_OK.finditer(text):
        need -= 1
        if need == 0:
            return True
    return False


def classify(block: Block, text: str) -> bool:
    """Content-vs-boilerplate decision for one block."""
    if not text:
        return False
    if block.kind == KIND_TITLE:
        return True
    link_density = (block.link_chars / block.total_chars) if block.total_chars else 1.0
    return link_density <= MAX_LINK_DENSITY and _has_min_words(text)


def extract_html(payload: bytes) -> dict:
    """bytes → {text, spans, n_blocks_kept, n_blocks_dropped}.

    Raises on undecodable garbage only via explicit checks upstream; the
    scanner itself is total (never raises on malformed markup)."""
    raw, _charset = decode_bytes(payload)
    return _assemble(_scan_blocks(raw))


def extract_html_oracle(payload: bytes) -> dict:
    """Reference implementation over stdlib html.parser — the differential
    oracle for the fast scanner (tests byte-diff the two)."""
    raw, _charset = decode_bytes(payload)
    parser = _BlockParser()
    parser.feed(raw)
    parser.close()
    return _assemble(parser.blocks)


def _assemble(blocks: list) -> dict:
    pieces: list[str] = []
    spans: list[tuple[int, int, str]] = []
    kept = dropped = 0
    pos = 0
    for block in blocks:
        # drop-by-link-density BEFORE normalizing: nav/footer blocks never
        # pay collapse_ws+nfc. Sound because every flushed block has
        # total_chars > 0, which guarantees non-empty normalized text (the
        # old `elif text: dropped += 1` was always true for them).
        if block.kind != KIND_TITLE:
            ld = (
                (block.link_chars / block.total_chars) if block.total_chars else 1.0
            )
            if ld > MAX_LINK_DENSITY:
                dropped += 1
                continue
            text = block.text()
            if not _has_min_words(text):
                if text:
                    dropped += 1
                continue
        else:
            text = block.text()
            if not text:
                continue
        if pieces:
            pos += 2  # "\n\n" separator
        pieces.append(text)
        spans.append((pos, pos + len(text), block.kind))
        pos += len(text)
        kept += 1
    return {
        "text": "\n\n".join(pieces),
        "spans": spans,
        "n_blocks_kept": kept,
        "n_blocks_dropped": dropped,
    }
