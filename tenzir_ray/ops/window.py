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
import pyarrow as pa
from ray.data import Dataset

_UNIT_NS = {"s": 1_000_000_000, "ms": 1_000_000, "us": 1_000, "ns": 1}


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


def hopping_count(
    ds: Dataset,
    key: str,
    ts_col: str,
    width: str = "1h",
    hop: str = "15min",
    out_col: str = "n",
) -> Dataset:
    """Hopping (sliding) window counts per key: windows of ``width``
    start every ``hop``; each event lands in ``width/hop`` overlapping
    windows. Re-expressed Ray-Data-first as explode + groupby: a
    vectorized ``map_batches`` emits one (key, window_start) row per
    covering window — integer arithmetic on the timestamp's native
    unit, no per-row Python — and a hash groupby counts. The explode
    multiplies rows by width/hop BEFORE the shuffle, but each row is
    just (key, int64), so the exchange stays key+timestamp-sized."""
    from ray.data.aggregate import Count

    width_td, hop_td = pd.Timedelta(width), pd.Timedelta(hop)
    if width_td.value <= 0 or hop_td.value <= 0 or width_td.value % hop_td.value:
        raise ValueError("width must be a positive multiple of hop")
    k = width_td.value // hop_td.value

    def explode(t: pa.Table) -> pa.Table:
        typ = t.schema.field(ts_col).type
        if not pa.types.is_timestamp(typ):
            raise TypeError(
                f"hopping_count: column {ts_col!r} must be a timestamp, got {typ}"
            )
        unit_ns = _UNIT_NS[typ.unit]
        if hop_td.value % unit_ns or hop_td.value < unit_ns:
            # e.g. hop='500ms' over a second-resolution column would
            # integer-divide to 0 and collapse every event to epoch 0
            raise ValueError(
                f"hopping_count: hop {hop!r} is not a positive multiple of the "
                f"{ts_col!r} column's resolution ({typ.unit})"
            )
        hop_u = hop_td.value // unit_ns
        vv = np.asarray(t[ts_col].cast(pa.int64()).combine_chunks())
        base = (vv // hop_u) * hop_u
        starts = np.concatenate([base - i * hop_u for i in range(k)])
        keys = t[key].combine_chunks()
        return pa.table(
            {
                key: pa.concat_arrays([keys] * k),
                ts_col: pa.array(starts).cast(typ),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True,
                              batch_size=None)
    return exploded.groupby([key, ts_col]).aggregate(Count(alias_name=out_col))


def sessionize_sorted(
    ds: Dataset,
    key: str,
    ts_col: str,
    gap: str = "30min",
    out_col: str = "session_id",
    tiebreak: Optional[str] = None,
) -> Dataset:
    """Hot-key scale path for :func:`sessionize`: instead of one pandas
    group per key (a hot key = one giant group in one task), sort the
    WHOLE dataset by (key, ts) with Ray's distributed range-partition
    sort, compute session flags per sorted block in parallel, and fix
    the block boundaries with a driver-side pass over per-block
    metadata (first/last key+ts and the boundary key's local session
    count — a handful of scalars per block, never rows).

    Output rows/columns match :func:`sessionize` exactly; only the
    execution shape differs."""
    import ray

    gap_td = pd.Timedelta(gap)
    sort_keys = [key, ts_col] + ([tiebreak] if tiebreak else [])

    # Every Dataset snapshots its own DataContext (``ds.context`` is the
    # per-plan copy, not the process-global singleton), so flipping
    # preserve_order here affects ONLY this pipeline — concurrent
    # datasets on the same driver keep their own setting.
    sorted_ds = ds.sort(sort_keys)
    lineage_ctx = sorted_ds.context  # shared with the caller's ``ds`` lineage only
    prev_order = lineage_ctx.execution_options.preserve_order
    lineage_ctx.execution_options.preserve_order = True
    try:
        mat = sorted_ds.materialize()
        refs = mat.to_arrow_refs()
    finally:
        lineage_ctx.execution_options.preserve_order = prev_order

    def _flags(df: pd.DataFrame):
        """new-session flag per row of a sorted frame (block-local:
        row 0 always starts a session)."""
        new_key = df[key].ne(df[key].shift())
        big_gap = (df[ts_col].diff() > gap_td).fillna(False)
        flags = (new_key | big_gap).to_numpy()
        flags[0] = True
        return flags

    @ray.remote(num_cpus=0.25)
    def _meta(t: pa.Table):
        if t.num_rows == 0:
            return None
        df = t.select([key, ts_col]).to_pandas()
        flags = _flags(df)
        first_key, last_key = df[key].iloc[0], df[key].iloc[-1]
        first_mask = (df[key] == first_key).to_numpy()
        return {
            "first_key": first_key,
            "first_ts": df[ts_col].iloc[0],
            "last_key": last_key,
            "last_ts": df[ts_col].iloc[-1],
            "sessions_first": int(flags[first_mask].sum()),
            "sessions_last": int(flags[(df[key] == last_key).to_numpy()].sum()),
        }

    metas = ray.get([_meta.remote(r) for r in refs])

    # driver walk: per block, the session-id offset for its FIRST key
    # (every other key starts inside the block and needs none)
    offsets = []
    prev_key = prev_ts = None
    prev_cum = 0
    for m in metas:
        if m is None:
            offsets.append(0)
            continue
        if prev_key is not None and m["first_key"] == prev_key:
            merged = (m["first_ts"] - prev_ts) <= gap_td
            off = prev_cum - 1 if merged else prev_cum
        else:
            off = 0
        offsets.append(off)
        if m["last_key"] == m["first_key"]:
            prev_cum = off + m["sessions_first"]
        else:
            prev_cum = m["sessions_last"]
        prev_key, prev_ts = m["last_key"], m["last_ts"]

    @ray.remote
    def _assign(t: pa.Table, off: int) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], type=pa.int64()))
        df = t.to_pandas()
        flags = _flags(df)
        # per-key session numbering from 0: cumulative starts minus the
        # key's first cumulative value
        starts = np.cumsum(flags)
        key_vals = df[key].to_numpy()
        new_key = np.ones(len(df), dtype=bool)
        new_key[1:] = key_vals[1:] != key_vals[:-1]
        key_base = np.maximum.accumulate(np.where(new_key, starts - 1, 0))
        sid = starts - 1 - key_base
        sid[key_vals == key_vals[0]] += off
        df[out_col] = sid.astype(np.int64)
        # strip the pandas schema-metadata blob: schemas WITH metadata are
        # unhashable in pyarrow, defeating Ray Data's schema dedup
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    out_refs = [_assign.remote(r, off) for r, off in zip(refs, offsets)]
    from tenzir_ray.arrowutil import from_arrow_refs_retried

    return from_arrow_refs_retried(out_refs)


def lag_col(
    ds: Dataset,
    col: str,
    key: str,
    order_cols,
    out_col: Optional[str] = None,
    _desc: bool = False,
) -> Dataset:
    """Per-key LAG window function: for each row, the previous row's
    ``col`` within its ``key`` partition ordered by ``order_cols``
    (null for the partition's first row) — SQL
    ``LAG(col) OVER (PARTITION BY key ORDER BY ...)``.

    Distributed as the sorted-scan + boundary-carry shape shared with
    :func:`sessionize_sorted` and ``curation.pack_sequences``: one
    range-partition sort by (key, order), a vectorized in-block shift,
    and ONE carry row (the last (key, value) pair) per block boundary —
    driver state is O(blocks) scalars, never rows."""
    import ray
    import ray.data

    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    out_col = out_col or f"{col}_lag"

    sorted_ds = ds.sort([key] + order_cols, descending=[False] + [_desc] * len(order_cols))
    lineage_ctx = sorted_ds.context
    prev_order = lineage_ctx.execution_options.preserve_order
    lineage_ctx.execution_options.preserve_order = True
    try:
        mat = sorted_ds.materialize()
        refs = mat.to_arrow_refs()
    finally:
        lineage_ctx.execution_options.preserve_order = prev_order

    @ray.remote(num_cpus=0.25)
    def _last_row(t: pa.Table):
        if t.num_rows == 0:
            return None
        i = t.num_rows - 1
        return (t[key][i].as_py(), t[col][i].as_py())

    lasts = ray.get([_last_row.remote(r) for r in refs])
    # carry for block i = the nearest non-empty predecessor's last row
    carries, prev = [], None
    for last in lasts:
        carries.append(prev)
        if last is not None:
            prev = last

    @ray.remote
    def _assign(t: pa.Table, carry) -> pa.Table:
        val = t[col]
        if isinstance(val, pa.ChunkedArray):
            val = val.combine_chunks()
        if t.num_rows == 0:
            return t.append_column(out_col, pa.nulls(0, type=val.type))
        import pyarrow.compute as pc

        shifted = pa.concat_arrays([pa.nulls(1, type=val.type), val.slice(0, len(val) - 1)])
        kv = t[key]
        if isinstance(kv, pa.ChunkedArray):
            kv = kv.combine_chunks()
        same_key = np.zeros(t.num_rows, dtype=bool)
        k_np = kv.to_numpy(zero_copy_only=False)
        same_key[1:] = k_np[1:] == k_np[:-1]
        if carry is not None and carry[0] == k_np[0]:
            shifted = pa.concat_arrays(
                [pa.array([carry[1]], type=val.type), shifted.slice(1)]
            )
            same_key[0] = True
        lag = pc.if_else(pa.array(same_key), shifted, pa.nulls(t.num_rows, type=val.type))
        return t.append_column(out_col, lag).replace_schema_metadata(None)

    out_refs = [_assign.remote(r, c) for r, c in zip(refs, carries)]
    from tenzir_ray.arrowutil import from_arrow_refs_retried

    out = from_arrow_refs_retried(out_refs)
    del mat
    return out


def lead_col(
    ds: Dataset,
    col: str,
    key: str,
    order_cols,
    out_col: Optional[str] = None,
) -> Dataset:
    """Per-key LEAD window function — SQL ``LEAD(col) OVER (PARTITION
    BY key ORDER BY ...)``. Same distributed machinery as
    :func:`lag_col` with the order columns sorted DESCENDING (the
    previous row in reversed order IS the next row), so the carry/shift
    logic is shared verbatim."""
    return lag_col(
        ds, col, key, order_cols, out_col=out_col or f"{col}_lead", _desc=True
    )


def cumsum_col(
    ds: Dataset,
    col: str,
    key: str,
    order_cols,
    out_col: Optional[str] = None,
) -> Dataset:
    """Per-key running sum — SQL ``SUM(col) OVER (PARTITION BY key
    ORDER BY ... ROWS UNBOUNDED PRECEDING)``. Same sorted-scan shape as
    :func:`lag_col`; the boundary carry is the continuing key's
    accumulated sum (one scalar per block, chained across consecutive
    blocks that share a key)."""
    import ray
    import ray.data

    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    out_col = out_col or f"{col}_cumsum"

    sorted_ds = ds.sort([key] + order_cols)
    lineage_ctx = sorted_ds.context
    prev_order = lineage_ctx.execution_options.preserve_order
    lineage_ctx.execution_options.preserve_order = True
    try:
        mat = sorted_ds.materialize()
        refs = mat.to_arrow_refs()
    finally:
        lineage_ctx.execution_options.preserve_order = prev_order

    @ray.remote(num_cpus=0.25)
    def _meta(t: pa.Table):
        """(first_key, sum over the FIRST key's rows, last_key,
        sum over the LAST key's rows) — all scalars."""
        if t.num_rows == 0:
            return None
        k = t[key].to_pandas()
        v = t[col].to_pandas()
        first_key, last_key = k.iloc[0], k.iloc[-1]
        return (
            first_key,
            float(v[(k == first_key).to_numpy()].sum()),
            last_key,
            float(v[(k == last_key).to_numpy()].sum()),
        )

    metas = ray.get([_meta.remote(r) for r in refs])
    # driver walk: offset for each block's FIRST key (only a key that
    # continues from the previous non-empty block needs one)
    offsets, prev_key, prev_cum = [], None, 0.0
    for m in metas:
        if m is None:
            offsets.append(0.0)
            continue
        first_key, first_sum, last_key, last_sum = m
        off = prev_cum if (prev_key is not None and first_key == prev_key) else 0.0
        offsets.append(off)
        prev_cum = (off + first_sum) if last_key == first_key else last_sum
        prev_key = last_key

    @ray.remote
    def _assign(t: pa.Table, off: float) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return t.append_column(out_col, pa.nulls(0, type=pa.float64()))
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        k = t[key].to_numpy(zero_copy_only=False)
        run = np.cumsum(v)
        new_key = np.zeros(len(k), dtype=bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        # subtract the running total as of each key's start (forward-
        # fill of the key-start index — NOT maximum.accumulate of the
        # base values, which breaks when negative values make `run`
        # non-monotone)
        start_idx = np.maximum.accumulate(np.where(new_key, np.arange(len(k)), 0))
        out = run - (run - v)[start_idx]
        out[k == k[0]] += off
        return t.append_column(
            out_col, pa.array(out, type=pa.float64())
        ).replace_schema_metadata(None)

    out_refs = [_assign.remote(r, o) for r, o in zip(refs, offsets)]
    from tenzir_ray.arrowutil import from_arrow_refs_retried

    out = from_arrow_refs_retried(out_refs)
    del mat
    return out


def row_number_col(
    ds: Dataset,
    key: str,
    order_cols,
    out_col: str = "row_number",
) -> Dataset:
    """Per-key 1-based row number — SQL ``ROW_NUMBER() OVER (PARTITION
    BY key ORDER BY ...)``: the running sum of ones, cast back to
    int64 (ones are exactly representable, so the float accumulator is
    lossless below 2^53 rows per key)."""
    import pyarrow.compute as pc

    ones = "__rn_ones"

    def add_ones(t: pa.Table) -> pa.Table:
        return t.append_column(ones, pa.array(np.ones(t.num_rows)))

    withones = ds.map_batches(add_ones, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
    summed = cumsum_col(withones, ones, key, order_cols, out_col="__rn_f")

    def finish(t: pa.Table) -> pa.Table:
        rn = pc.cast(pc.round(t["__rn_f"]), pa.int64())
        return t.drop_columns([ones, "__rn_f"]).append_column(out_col, rn)

    return summed.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
