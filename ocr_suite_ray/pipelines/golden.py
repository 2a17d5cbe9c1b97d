"""Single-process reference path: the byte-diff oracle for the pipeline.

FIXTURES.md §2: "Goldens are produced once by the engine's reference
(single-process, parallelism-independent) extractor path"; every distributed
run at any parallelism / wave size / resume point must reproduce them
byte-for-byte (the per-url invariant from ``BASELINE.json input_hint``).

This module deliberately shares the *leaf* functions (extract_payload, the
rank tiebreak) with the distributed stages but none of the Ray plumbing, so
a plumbing bug (ordering, partial batches, shuffle) cannot cancel out in the
comparison.
"""

from __future__ import annotations

import pyarrow as pa

from ocr_suite_ray.functions.extract import extract_payload
from ocr_suite_ray.schemas import EXTRACTED_SCHEMA, SPAN_TYPE


def _rank(row: dict) -> tuple:
    # same total order as stages.dedup.ORDER_KEYS: newest warc_ts, ties
    # broken by the content tuple (Python str compare == Arrow's UTF-8
    # bytewise order, so the distributed sort agrees exactly)
    return (
        row["warc_ts"],
        row["text"],
        row["status"],
        row["payload_kind"],
        row["n_blocks_kept"],
        row["n_blocks_dropped"],
    )


def golden_extract(pages: pa.Table) -> pa.Table:
    """pages table → deduped extracted table, sorted by url. Pure Python."""
    best: dict[str, dict] = {}
    # cast timestamps to raw int64 us up front (datetime.timestamp() would
    # apply the local timezone — a determinism hazard)
    pages = pages.set_column(
        pages.schema.get_field_index("warc_ts"),
        "warc_ts",
        pages["warc_ts"].cast(pa.int64()),
    )
    for row in pages.to_pylist():
        out = extract_payload(row["html"])
        rec = {
            "url": row["url"],
            "warc_ts": row["warc_ts"],
            "payload_kind": out["payload_kind"],
            "text": out["text"],
            "spans": [
                {"start": s[0], "stop": s[1], "kind": s[2]} for s in out["spans"]
            ],
            "n_blocks_kept": out["n_blocks_kept"],
            "n_blocks_dropped": out["n_blocks_dropped"],
            "status": out["status"],
        }
        cur = best.get(rec["url"])
        if cur is None or _rank(rec) > _rank(cur):
            best[rec["url"]] = rec
    rows = [best[u] for u in sorted(best)]
    return pa.Table.from_pydict(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "payload_kind": [r["payload_kind"] for r in rows],
            "text": pa.array([r["text"] for r in rows], pa.large_string()),
            "spans": pa.array([r["spans"] for r in rows], pa.large_list(SPAN_TYPE)),
            "n_blocks_kept": pa.array([r["n_blocks_kept"] for r in rows], pa.int32()),
            "n_blocks_dropped": pa.array([r["n_blocks_dropped"] for r in rows], pa.int32()),
            "status": [r["status"] for r in rows],
        },
        schema=EXTRACTED_SCHEMA,
    )
