"""Stream-shaped operators over the events log: tumbling windows, sessions.

The reference's only windowing is the 5 s metrics window
(``src/recognition/speed_meter.cpp:35-58``); a web-scale training pipeline
needs real event-time operators. Ray Data has no native watermarks, so (per
the public Ray guidance) windows are expressed as grouped aggregates:

- tumbling window = vectorized truncation of ts to the window start +
  ONE hash aggregate over (key, window) — no per-group Python;
- sessionization = ``groupby(key).map_groups`` over ts-sorted groups
  (ordering restored inside each group, mirroring how the reference's
  dedup/sort stage restores per-url capture order).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window_agg(ds, key_col: str, ts_col: str, value_col: str, every: str = "hour"):
    """Per (key, window) count + sum + mean. ``every`` is a pyarrow
    floor_temporal unit ("hour", "day", "minute")."""
    from ray.data.aggregate import Count, Mean, Sum

    def _win(t: pa.Table) -> pa.Table:
        w = pc.cast(pc.floor_temporal(t[ts_col], unit=every), pa.timestamp("us"))
        return t.append_column("window_start", w)

    return (
        ds.map_batches(_win, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum(value_col, alias_name="sum_value"),
            Mean(value_col, alias_name="avg_value"),
        )
    )


def sessionize(ds, key_col: str, ts_col: str, gap_s: float = 1800.0):
    """Split each key's ts-sorted event stream into sessions separated by
    gaps > gap_s; emit one row per session with start/end/count.

    Ordering assumption: none on input — each group is sorted inside the
    UDF, so the result is independent of block layout."""
    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, "event_id"] if "event_id" in g else [ts_col])
        ts = g[ts_col]
        gap = ts.diff().dt.total_seconds().fillna(0.0)
        sid = (gap > gap_s).cumsum()
        out = g.groupby(sid).agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "size"),
        )
        out[key_col] = g[key_col].iloc[0]
        out["session_id"] = range(len(out))
        return out.reset_index(drop=True)[
            [key_col, "session_id", "session_start", "session_end", "n_events"]
        ]

    return ds.groupby(key_col).map_groups(_sessions, batch_format="pandas")
