"""ocr_suite_ray — a Ray-Data-native web-text extraction engine.

From-scratch reimplementation of the *capabilities* of ``yowidin/ocr-suite``
(per-document recognize-and-store loop with resume, exact dedup, parallel
search/merge/sort/group — see ``SURVEY.md``) re-targeted at Common-Crawl-style
web pages: HTML/PDF main-content extraction over Parquet via
``ray.data.Dataset`` + ``map_batches`` over zero-copy Arrow batches, actor
pools for warm parser state, per-partition lineage for checkpoint/resume,
and newest-capture-wins dedup by url.

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — sessions
are owned by the caller (driver, bench.py, or the pytest fixture).
"""

from ocr_suite_ray.schemas import PAGES_SCHEMA, EXTRACTED_SCHEMA, SCHEMA_VERSION

__all__ = ["PAGES_SCHEMA", "EXTRACTED_SCHEMA", "SCHEMA_VERSION"]
__version__ = "0.1.0"
