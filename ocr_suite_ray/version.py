"""Code fingerprints for cache/lineage invalidation.

The reference's migration ladder guards against *schema* drift
(``CURRENT_DB_VERSION``, ``update.inl:9-34``); a deterministic-output
engine must also guard against *code* drift: an extracted store cached on
disk is only valid for the code that produced it. The extraction code
fingerprint is mixed into every partition's lineage salt, so upgrading the
extractor invalidates prior outputs exactly like changing the input would.
Likewise the corpus generator's fingerprint keys generated-corpus caches.
"""

from __future__ import annotations

import hashlib
import os

_PKG = os.path.dirname(os.path.abspath(__file__))

# modules whose bytes determine the extraction output per input row
_EXTRACT_SOURCES = [
    "schemas.py",
    "functions/textnorm.py",
    "functions/html_extract.py",
    "functions/pdf_extract.py",
    "functions/extract.py",
    "stages/extract.py",
    "stages/dedup.py",
    "functions/ocr.py",
]

# modules whose bytes determine the synthetic corpus
_CORPUS_SOURCES = ["sources/synthetic.py", "schemas.py"]


def _digest(paths: list[str]) -> str:
    h = hashlib.sha256()
    for rel in paths:
        with open(os.path.join(_PKG, rel), "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:12]


def extract_code_fingerprint() -> str:
    return _digest(_EXTRACT_SOURCES)


def corpus_code_fingerprint() -> str:
    return _digest(_CORPUS_SOURCES)
