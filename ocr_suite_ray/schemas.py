"""Fixed, versioned Arrow schemas — the engine's data model.

Reference analogue: the versioned SQLite schema ladder
(``src/common/db/updates/update.inl:9-34``, ``CURRENT_DB_VERSION = 4``) and
the core structs ``frame`` (``include/ocs/ffmpeg/decoder.h:48-54``),
``text_entry``/``ocr_result`` (``include/ocs/common/ocr_result.h:14-23``).
Here the schema is pinned as pyarrow constants; ``SCHEMA_VERSION`` is stamped
into every lineage record so a resume against an incompatible layout is
rejected (the migration-ladder analogue).
"""

from __future__ import annotations

import pyarrow as pa

SCHEMA_VERSION = 1

# Input: one row per captured page (BASELINE.json "input_hint").
# Reference analogue: one video frame keyed by frame_number; here the key is
# (url, warc_ts) — url identifies the document, warc_ts its capture instant.
PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# One extracted span: char-offset interval into the extracted text plus the
# block kind. Analogue of text_entry{left,top,right,bottom,confidence,text}
# (ocr_result.h:14-18) with pixel boxes replaced by char offsets.
SPAN_TYPE = pa.struct(
    [
        pa.field("start", pa.int64()),
        pa.field("stop", pa.int64()),
        pa.field("kind", pa.string()),
    ]
)

# Output: one row per page capture after extraction (pre-dedup), one row per
# distinct url after the newest-capture-wins dedup. Analogue of ocr_result —
# the document plus its list of entries, kept nested (list<struct>) instead of
# exploded into instance rows; columnar Parquet replaces SQLite normalization.
EXTRACTED_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("payload_kind", pa.string()),  # html | pdf | unknown
        pa.field("text", pa.large_string()),
        pa.field("spans", pa.large_list(SPAN_TYPE)),
        pa.field("n_blocks_kept", pa.int32()),
        pa.field("n_blocks_dropped", pa.int32()),
        pa.field("status", pa.string()),  # ok | error:<class>
    ]
)

# Block kinds emitted by the extractors.
KIND_TITLE = "title"
KIND_HEADING = "heading"
KIND_PARAGRAPH = "paragraph"
KIND_LIST = "list"
KIND_PDF_BLOCK = "pdf_block"
KIND_OCR_BLOCK = "ocr_block"  # text recovered from an image-only (scanned) PDF
