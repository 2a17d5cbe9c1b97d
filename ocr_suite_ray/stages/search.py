"""Search/query path: substring search, time bucketing, hierarchy counts.

Viewer parity (``SURVEY.md`` §3.2): the reference fans out a LIKE join over
per-video SQLite shards (``src/common/database.cpp:190-194``), merges under a
mutex, sorts globally by timestamp (``src/viewer/results.cpp:123-126``) and
builds a day→hour→minute tree in one pass over the sorted stream
(``src/viewer/views/search_results_view.cpp:26-158``). Here each piece is a
Dataset op: vectorized substring filter inside map_batches (no per-row
Python), derived time-bucket columns via pyarrow.compute projections, and
the hierarchy = a grouped count (the shuffle Ray sizes for us).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

MIN_QUERY_LEN = 3  # reference: queries under 3 chars rejected (search.cpp:168-172)


def find_text(ds, pattern: str, text_col: str = "text"):
    """Substring search (LIKE '%pattern%' parity). Vectorized per batch."""
    if len(pattern) < MIN_QUERY_LEN:
        raise ValueError(f"query must be >= {MIN_QUERY_LEN} chars (reference guard)")
    return ds.map_batches(
        lambda t: t.filter(pc.match_substring(t[text_col], pattern)),
        batch_format="pyarrow",
    )


def add_time_buckets(ds, ts_col: str = "ts"):
    """Derive day/hour/minute columns (results.cpp:52-58 analogue)."""
    def _buckets(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        t = t.append_column("day", pc.cast(pc.floor_temporal(ts, unit="day"), pa.timestamp("us")))
        t = t.append_column("hour", pc.cast(pc.hour(ts), pa.int32()))
        t = t.append_column("minute", pc.cast(pc.minute(ts), pa.int32()))
        return t

    return ds.map_batches(_buckets, batch_format="pyarrow")


def hierarchy_counts(ds, ts_col: str = "ts"):
    """day→hour→minute group counts (the search-results tree, flattened).

    Per-block Arrow hash-count partials, then the narrow tree merge — the
    group space is calendar-bounded (days x 1440 minutes), so no row-level
    exchange and no sort-based shuffle."""
    from ocr_suite_ray.stages.relational import narrow_grouped_sum

    def _partial(t: pa.Table) -> pa.Table:
        # count_all, not ("day","count"): counting the group key itself
        # reports 0 for a null-ts group (pyarrow counts valid values only)
        g = t.group_by(["day", "hour", "minute"]).aggregate([([], "count_all")])
        # select by NAME first (the narrow_grouped_sum rule): group_by
        # output order is release-fragile
        return g.select(["day", "hour", "minute", "count_all"]).rename_columns(
            ["day", "hour", "minute", "n"]
        )

    partials = add_time_buckets(ds, ts_col).map_batches(
        _partial, batch_format="pyarrow"
    )
    return narrow_grouped_sum(
        partials, ["day", "hour", "minute"], ["n"],
        empty_schema=pa.schema([
            ("day", pa.timestamp("us")), ("hour", pa.int32()),
            ("minute", pa.int32()), ("n", pa.int64()),
        ]),
    )
