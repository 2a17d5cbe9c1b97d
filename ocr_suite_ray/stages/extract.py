"""Extraction stages: actor-pool ``map_batches`` classes over Arrow batches.

Reference analogue: one warm ``TessBaseAPI`` per consumer thread, initialized
once then fed frames (``src/recognition/provider/tesseract.cpp:59-76``,
``src/recognition/main.cpp:153,174-177``). Here each actor holds the warm
extractor state in ``__init__`` and processes Arrow record batches in
``__call__``. Two pool classes mirror the two providers: ``HtmlExtractor``
(fast lane) and ``PdfExtractor`` (slow/high-memory lane, VisionKit analogue
``src/recognition/provider/vision_kit.cpp:71-87``); ``PageExtractor`` is the
single-pool variant that dispatches per row (used when the input is not
pre-split by payload kind).

The per-row Python work inside ``__call__`` is the recognition payload itself
(DOM parse ≈ OCR inference) — the batch boundary stays zero-copy Arrow, and
all column assembly is Arrow-native (``pa.array`` with explicit types).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ocr_suite_ray.functions.extract import KIND_PDF, extract_payload
from ocr_suite_ray.functions.html_extract import extract_html  # noqa: F401 (warm import)
from ocr_suite_ray.functions.pdf_extract import PDF_MAGIC
from ocr_suite_ray.schemas import EXTRACTED_SCHEMA



def _result_table(batch: pa.Table, results: list[dict]) -> pa.Table:
    """Assemble the EXTRACTED_SCHEMA table, passing through key columns and
    any bookkeeping columns (partition_id) present on the input."""
    # spans assembled from flat arrays (ListArray.from_arrays) — ~5x faster
    # than a python list-of-dicts per row
    offsets = np.empty(len(results) + 1, dtype=np.int64)
    offsets[0] = 0
    starts: list[int] = []
    stops: list[int] = []
    kinds: list[str] = []
    for i, r in enumerate(results):
        sp = r["spans"]
        if sp:
            s1, s2, s3 = zip(*sp)  # C-speed transpose, no per-span Python
            starts.extend(s1)
            stops.extend(s2)
            kinds.extend(s3)
        offsets[i + 1] = len(starts)
    span_struct = pa.StructArray.from_arrays(
        [
            pa.array(starts, pa.int64()),
            pa.array(stops, pa.int64()),
            pa.array(kinds, pa.string()),
        ],
        names=["start", "stop", "kind"],
    )
    spans = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), span_struct)
    cols: dict[str, pa.Array | pa.ChunkedArray] = {
        "url": batch["url"],
        "warc_ts": batch["warc_ts"],
        "payload_kind": pa.array([r["payload_kind"] for r in results], pa.string()),
        "text": pa.array([r["text"] for r in results], pa.large_string()),
        "spans": spans,
        "n_blocks_kept": pa.array([r["n_blocks_kept"] for r in results], pa.int32()),
        "n_blocks_dropped": pa.array([r["n_blocks_dropped"] for r in results], pa.int32()),
        "status": pa.array([r["status"] for r in results], pa.string()),
    }
    names = list(EXTRACTED_SCHEMA.names)
    if "partition_id" in batch.column_names:
        cols["partition_id"] = batch["partition_id"]
        names.append("partition_id")
    return pa.table({n: cols[n] for n in names})


def _make_ocr(ocr_engine):
    """Resolve an ExtractConfig.ocr_engine value to a warm per-actor OCR
    callable (None stays None — scanned PDFs become error rows)."""
    if ocr_engine is None:
        return None
    from ocr_suite_ray.functions.ocr import ocr_image_text, resolve_engine

    engine = resolve_engine(ocr_engine)  # pin auto-> real/stub ONCE per actor
    return lambda img: ocr_image_text(img, engine)


class PageExtractor:
    """Single-pool extractor: sniffs per row, dispatches html/pdf."""

    def __init__(self, ocr_engine: str | None = None) -> None:
        # Warm state: module-level compiled regexes are imported above; the
        # interned dispatch closure lives here (one per actor, reused across
        # batches — the one-TessBaseAPI-per-thread analogue). The OCR engine
        # (guarded-import pytesseract or the deterministic stub) is resolved
        # once per actor, the tesseract.cpp:59-76 warm-engine shape.
        self._extract = extract_payload
        self._ocr = _make_ocr(ocr_engine)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # slice-as-you-go over the Arrow column: one payload is materialized
        # as Python bytes at a time and freed before the next, instead of a
        # full-batch to_pylist() copy held alongside the Arrow buffers —
        # halves peak per-task memory traffic on payload-heavy blocks
        ext = self._extract
        results = [ext(v.as_py(), ocr=self._ocr) for v in batch["html"]]
        return _result_table(batch, results)



class PdfExtractor:
    """Slow-lane pool (high-memory analogue of the VisionKit provider).
    With an ``ocr_engine`` this pool IS the OCR lane: scanned (image-only)
    PDFs routed here recognize via the warm per-actor engine."""

    def __init__(self, ocr_engine: str | None = None) -> None:
        self._extract = extract_payload
        self._ocr = _make_ocr(ocr_engine)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ext = self._extract
        results = [ext(v.as_py(), KIND_PDF, ocr=self._ocr) for v in batch["html"]]
        return _result_table(batch, results)


def sniff_batch(batch: pa.Table) -> pa.Table:
    """Stateless sniff stage: adds ``payload_kind`` + ``payload_bytes``
    columns (frame-type filter analogue, decoder.cpp:279-284). Fully
    vectorized Arrow kernels — no per-row Python, no payload copies."""
    import pyarrow.compute as pc

    html_col = batch["html"]
    sizes = pc.binary_length(html_col)
    prefix = pc.binary_slice(pc.cast(html_col, pa.large_binary()), 0, 5)
    is_pdf = pc.equal(prefix, pa.scalar(PDF_MAGIC, pa.large_binary()))
    kinds = pc.if_else(is_pdf, pa.scalar("pdf"), pa.scalar("html"))
    # null payloads sniff as "html" (sniff_kind(None) parity): a null kind
    # would be dropped by BOTH split-pool lane filters — silent row loss —
    # instead of surfacing as the error:EmptyPayload record
    kinds = pc.fill_null(kinds, "html")
    out = batch.append_column("payload_kind", kinds)
    return out.append_column("payload_bytes", pc.cast(sizes, pa.int64()))


