"""Viewer-parity query pipeline over the extracted store (SURVEY §3.2).

The reference's viewer fans a LIKE query over per-video SQLite shards,
merges, sorts by timestamp and builds a day→hour→minute→frame tree
(``src/viewer/search.cpp:96-196``, ``src/viewer/results.cpp:123-126``,
``src/viewer/views/search_results_view.cpp:26-158``). Here:

    read_parquet(final store)  → filter(match_substring)   [vectorized]
      → sort(warc_ts)          [range-partitioned shuffle]
      → day/hour/minute counts [grouped aggregate]
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ocr_suite_ray.stages.search import MIN_QUERY_LEN, add_time_buckets, find_text


def search_extracted(final_dir: str, pattern: str):
    """All matching extracted docs, globally ordered by capture time with a
    deterministic url tiebreak (the merged+sorted viewer result set)."""
    import ray.data as rd

    # project at the read: the store also carries `spans`
    # (large_list<struct>) and full `text` blobs — dead I/O for a result
    # set that only surfaces url/ts/status after the filter.
    ds = rd.read_parquet(
        final_dir, columns=["url", "warc_ts", "text", "n_blocks_kept", "status"]
    )
    hits = find_text(ds, pattern, text_col="text").select_columns(
        ["url", "warc_ts", "n_blocks_kept", "status"]
    )
    return hits.sort(["warc_ts", "url"])


def search_hierarchy(final_dir: str, pattern: str):
    """day→hour→minute counts of matches (the search-results tree,
    flattened to group counts — the UI label '{frame} - {n}' analogue)."""
    from ray.data.aggregate import Count

    import ray.data as rd

    ds = rd.read_parquet(final_dir, columns=["url", "warc_ts", "text"])
    hits = find_text(ds, pattern, text_col="text").select_columns(["url", "warc_ts"])
    return (
        add_time_buckets(hits, "warc_ts")
        .groupby(["day", "hour", "minute"])
        .aggregate(Count(alias_name="n"))
    )


def fetch_payload(pages_dir: str, url: str, columns: list | None = None) -> pa.Table:
    """Point lookup of the ORIGINAL crawl payload(s) for one url — the
    viewer's frame re-decode (``src/viewer/views/frame_view.cpp:22-37``
    re-reads the exact source frame for a selected match on demand).

    A single-record fetch is not a distributed job: this reads the pages
    store directly through ``pyarrow.dataset`` with a pushed-down predicate,
    so parquet row-group statistics prune every row group whose url range
    excludes the key — I/O is O(matching row groups), not O(store). Returns
    every capture of the url (dup urls have several), newest first."""
    import pyarrow.dataset as pads

    dset = pads.dataset(pages_dir, format="parquet")
    t = dset.to_table(filter=pc.field("url") == url, columns=columns)
    if t.num_rows > 1 and "warc_ts" in t.column_names:
        t = t.take(pc.sort_indices(t, sort_keys=[("warc_ts", "descending")]))
    return t


def view_document(pages_dir: str, final_dir: str, url: str) -> dict:
    """frame_view parity: the extracted record for ``url`` joined with its
    winning source payload (the raw bytes the viewer re-renders). Both sides
    are pushdown point lookups."""
    src = fetch_payload(pages_dir, url)
    ext = fetch_payload(final_dir, url)
    if ext.num_rows == 0:
        raise KeyError(f"url not in extracted store: {url}")
    rec = ext.slice(0, 1).to_pylist()[0]
    # the dedup winner is the newest capture. On exact warc_ts TIES the
    # winner is chosen by the extracted-content tuple (dedup ORDER_KEYS),
    # which file-order payload sorting cannot see — re-extract the tied
    # captures (a handful, point-lookup context) and pair the one whose
    # extraction matches the stored record, so the viewer never renders a
    # source that doesn't correspond to the shown text.
    payload = src["html"][0].as_py() if src.num_rows else None
    if src.num_rows > 1 and "warc_ts" in src.column_names:
        newest = src["warc_ts"][0]
        tied = src.filter(pc.equal(src["warc_ts"], newest))
        if tied.num_rows > 1:
            from ocr_suite_ray.functions.extract import extract_payload

            for cand in tied["html"].to_pylist():
                try:
                    if extract_payload(cand)["text"] == rec.get("text"):
                        payload = cand
                        break
                except Exception:
                    continue
    rec["payload"] = payload
    rec["n_captures"] = src.num_rows
    return rec


def matches_per_url(final_dir: str, pattern: str):
    """Per-document match counts for a pattern (texts-per-frame analogue).

    The pattern is a literal (the viewer escapes it too), so the count is
    one vectorized ``pc.count_substring`` C kernel per batch — a stateless
    task ``map_batches`` with no actor pool (there is no state worth
    warming) and no per-row Python. Non-overlapping match semantics match
    ``re.findall`` on a literal. Read is projected to the three live
    columns so `spans` never loads."""
    import ray.data as rd

    if len(pattern) < MIN_QUERY_LEN:
        raise ValueError(f"query must be >= {MIN_QUERY_LEN} chars")

    def _count(t: pa.Table) -> pa.Table:
        counts = pc.count_substring(t["text"], pattern)
        out = t.select(["url", "warc_ts"])
        out = out.append_column("n_matches", pc.cast(counts, pa.int64()))
        return out.filter(pc.greater(out["n_matches"], 0))

    ds = rd.read_parquet(final_dir, columns=["url", "warc_ts", "text"])
    return ds.map_batches(_count, batch_format="pyarrow")
