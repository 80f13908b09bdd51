"""Stream-shaped windowing over an ordered, partitioned log.

The reference has NO windowed streaming aggregation (negative space,
SURVEY.md §2.5: `summarize` emits only at end-of-input). Ray Data has
no watermarks either; the idiomatic re-expression for stream-shaped
workloads is: partition by key, sort by time WITHIN the partition, and
window inside ``groupby(key).map_groups`` (ordering assumption: events
of one key fit one group and are sorted there — the same per-key-order
contract the CDC merge relies on).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from ray.data import Dataset


def sessionize(
    ds: Dataset,
    key: str,
    ts_col: str,
    gap: str = "30min",
    out_col: str = "session_id",
) -> Dataset:
    """Gap-based sessions per key: a new session starts when the time
    since the previous event of the SAME key exceeds ``gap``.
    ``session_id`` numbers sessions per key from 0 in time order.

    SQL-oracle equivalent (DuckDB)::

        SUM(CASE WHEN ts - lag(ts) OVER w > INTERVAL ... THEN 1 ELSE 0 END)
            OVER w  -- w = (PARTITION BY key ORDER BY ts, tiebreak)
    """
    gap_td = pd.Timedelta(gap)

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col] + [c for c in ("event_id",) if c in g.columns], kind="stable")
        deltas = g[ts_col].diff()
        new_session = (deltas > gap_td).fillna(False)
        g[out_col] = np.cumsum(new_session.to_numpy()).astype(np.int64)
        return g

    return ds.groupby(key).map_groups(window, batch_format="pandas")


def tumbling_count(
    ds: Dataset,
    key: str,
    ts_col: str,
    width: str = "1h",
    out_col: str = "n",
) -> Dataset:
    """Tumbling-window event counts per key: floor ts to the window
    width, count per (key, window). Pure groupby re-expression —
    windows without watermarks, exactly what a batch replay needs."""
    from ray.data.aggregate import Count

    from tenzir_ray.ops.summarize import floor_time

    ds = floor_time(ds, ts_col, width)
    return ds.groupby([key, ts_col]).aggregate(Count(alias_name=out_col))
