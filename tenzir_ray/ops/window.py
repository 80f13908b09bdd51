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

# Sentinel for "no previous block seen yet" in the driver-side carry
# walks. Distinct from a null partition key, which SQL treats as one
# ordinary partition (all nulls group together).
_NO_PREV = object()


def _is_na(x) -> bool:
    try:
        return x is None or bool(pd.isna(x))
    except (TypeError, ValueError):
        return False


def _null_eq(a, b) -> bool:
    """SQL PARTITION BY equality: two nulls are the SAME partition."""
    a_na, b_na = _is_na(a), _is_na(b)
    if a_na or b_na:
        return a_na and b_na
    return bool(a == b)


def _tuple_eq(a, b) -> bool:
    return len(a) == len(b) and all(_null_eq(x, y) for x, y in zip(a, b))


_ISN, _FILLED = "__wk_isnull", "__wk_filled"


def _fill_scalar(typ: pa.DataType) -> pa.Scalar:
    """An arbitrary valid scalar of ``typ`` (value is irrelevant — it
    only stands in for nulls in the range partitioner, which never
    compares it against a non-null row thanks to the isnull column)."""
    try:
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            return pa.scalar("", type=typ)
        if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
            return pa.scalar(b"", type=typ)
        if pa.types.is_boolean(typ):
            return pa.scalar(False, type=typ)
        return pa.scalar(0, type=pa.int64()).cast(typ)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        raise TypeError(f"null-safe sort: unsupported partition key type {typ}")


def _null_safe_pair(t: pa.Table, col: str, isn_name: str, filled_name: str) -> pa.Table:
    import pyarrow.compute as pc

    c = t[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    try:
        mask = pc.is_null(c, nan_is_null=True)
    except (TypeError, pa.ArrowNotImplementedError):
        mask = pc.is_null(c)
    t = t.append_column(isn_name, pc.cast(mask, pa.int8()))
    return t.append_column(filled_name, pc.if_else(mask, _fill_scalar(c.type), c))


def _drop_helpers(t: pa.Table) -> pa.Table:
    return t.drop_columns([c for c in t.column_names if c.startswith("__wk_")])


def _sorted_refs(ds: Dataset, key: str, order_cols, desc_order: bool = False):
    """Distributed range-partition sort by (key, order_cols) whose
    blocks are safe to scan with boundary carries, EVEN when the key
    OR an order column contains nulls: Ray's range partitioner cannot
    compare a null boundary, so a null run would be split across
    partitions with the secondary order broken. Every sort column is
    replaced by an (is-null, null-filled) pair — nulls form one
    contiguous, correctly ordered run at the end (DuckDB/SQL NULLS
    LAST, for descending order too). Returns ``(refs, materialized)``;
    blocks still carry the ``__wk_*`` helper columns — consumers drop
    them via :func:`_drop_helpers`."""
    order_cols = list(order_cols)

    def add_helpers(t: pa.Table) -> pa.Table:
        t = _null_safe_pair(t, key, _ISN, _FILLED)
        for i, c in enumerate(order_cols):
            t = _null_safe_pair(t, c, f"__wk_oisn{i}", f"__wk_ofill{i}")
        return t

    withh = ds.map_batches(
        add_helpers, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    sort_cols, desc_flags = [_ISN, _FILLED], [False, False]
    for i in range(len(order_cols)):
        # NULLS LAST regardless of direction (DuckDB's default for both)
        sort_cols += [f"__wk_oisn{i}", f"__wk_ofill{i}"]
        desc_flags += [False, desc_order]
    sorted_ds = withh.sort(sort_cols, descending=desc_flags)
    # Every Dataset snapshots its own DataContext (``ds.context`` is the
    # per-plan copy, not the process-global singleton), so flipping
    # preserve_order here affects ONLY this pipeline.
    lineage_ctx = sorted_ds.context
    prev_order = lineage_ctx.execution_options.preserve_order
    lineage_ctx.execution_options.preserve_order = True
    try:
        mat = sorted_ds.materialize()
        refs = mat.to_arrow_refs()
    finally:
        lineage_ctx.execution_options.preserve_order = prev_order
    return refs, mat


def _new_key_mask(k: np.ndarray) -> np.ndarray:
    """True where row i starts a new key run in a key-sorted array;
    consecutive nulls (None/NaN/NaT) count as the SAME key."""
    n = len(k)
    mask = np.ones(n, dtype=bool)
    if n > 1:
        isna = pd.isna(k)
        both_na = isna[1:] & isna[:-1]
        with np.errstate(invalid="ignore"):
            neq = k[1:] != k[:-1]
        mask[1:] = (np.asarray(neq, dtype=bool) & ~both_na) | (isna[1:] ^ isna[:-1])
    return mask


def sessionize(
    ds: Dataset,
    key: str,
    ts_col: str,
    gap: str = "30min",
    out_col: str = "session_id",
    small: bool = False,
) -> Dataset:
    """Gap-based sessions per key: a new session starts when the time
    since the previous event of the SAME key exceeds ``gap``.
    ``session_id`` numbers sessions per key from 0 in time order.

    DEFAULT execution is the distributed sorted-scan path
    (:func:`sessionize_sorted`): a hot key never becomes one giant
    single-task pandas group. Pass ``small=True`` for the
    ``groupby().map_groups`` path (fine when every key's events fit
    one task comfortably).

    SQL-oracle equivalent (DuckDB)::

        SUM(CASE WHEN ts - lag(ts) OVER w > INTERVAL ... THEN 1 ELSE 0 END)
            OVER w  -- w = (PARTITION BY key ORDER BY ts, tiebreak)
    """
    if not small:
        names = ds.schema().names
        tiebreak = "event_id" if "event_id" in names else None
        return sessionize_sorted(
            ds, key, ts_col, gap=gap, out_col=out_col, tiebreak=tiebreak
        )
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
    refs, mat = _sorted_refs(ds, key, [ts_col] + ([tiebreak] if tiebreak else []))

    def _flags(df: pd.DataFrame):
        """new-session flag per row of a sorted frame (block-local:
        row 0 always starts a session)."""
        new_key = _new_key_mask(df[key].to_numpy())
        big_gap = (df[ts_col].diff() > gap_td).fillna(False).to_numpy()
        flags = new_key | big_gap
        flags[0] = True
        return flags

    @ray.remote(num_cpus=0.25)
    def _meta(t: pa.Table):
        if t.num_rows == 0:
            return None
        df = t.select([key, ts_col]).to_pandas()
        flags = _flags(df)
        nk_idx = np.flatnonzero(_new_key_mask(df[key].to_numpy()))
        n_first = nk_idx[1] if len(nk_idx) > 1 else len(df)
        return {
            "first_key": df[key].iloc[0],
            "first_ts": df[ts_col].iloc[0],
            "last_key": df[key].iloc[-1],
            "last_ts": df[ts_col].iloc[-1],
            "sessions_first": int(flags[:n_first].sum()),
            "sessions_last": int(flags[nk_idx[-1]:].sum()),
        }

    metas = ray.get([_meta.remote(r) for r in refs])

    # driver walk: per block, the session-id offset for its FIRST key
    # (every other key starts inside the block and needs none)
    offsets = []
    prev_key, prev_ts = _NO_PREV, None
    prev_cum = 0
    for m in metas:
        if m is None:
            offsets.append(0)
            continue
        if prev_key is not _NO_PREV and _null_eq(m["first_key"], prev_key):
            merged = (m["first_ts"] - prev_ts) <= gap_td
            off = prev_cum - 1 if merged else prev_cum
        else:
            off = 0
        offsets.append(off)
        if _null_eq(m["last_key"], m["first_key"]):
            prev_cum = off + m["sessions_first"]
        else:
            prev_cum = m["sessions_last"]
        prev_key, prev_ts = m["last_key"], m["last_ts"]

    @ray.remote
    def _assign(t: pa.Table, off: int) -> pa.Table:
        t = _drop_helpers(t)
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], type=pa.int64()))
        df = t.to_pandas()
        flags = _flags(df)
        # per-key session numbering from 0: cumulative starts minus the
        # key's first cumulative value
        starts = np.cumsum(flags)
        key_vals = df[key].to_numpy()
        new_key = _new_key_mask(key_vals)
        key_base = np.maximum.accumulate(np.where(new_key, starts - 1, 0))
        sid = starts - 1 - key_base
        nk_idx = np.flatnonzero(new_key)
        n_first = nk_idx[1] if len(nk_idx) > 1 else len(df)
        sid[:n_first] += off
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

    refs, mat = _sorted_refs(ds, key, order_cols, desc_order=_desc)

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
        t = _drop_helpers(t)
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
        k_np = kv.to_numpy(zero_copy_only=False)
        same_key = ~_new_key_mask(k_np)
        if carry is not None and _null_eq(carry[0], k_np[0]):
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
    accumulated (sum, non-null count) pair (two scalars per block,
    chained across consecutive blocks that share a key).

    Null semantics match SQL SUM OVER: null values are skipped (they
    do not poison later rows), and a row's running sum is NULL until
    its partition has seen at least one non-null value."""
    import ray
    import ray.data

    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    out_col = out_col or f"{col}_cumsum"

    refs, mat = _sorted_refs(ds, key, order_cols)

    @ray.remote(num_cpus=0.25)
    def _meta(t: pa.Table):
        """(first_key, first-key (sum, non-null count), last_key,
        last-key (sum, non-null count)) — all scalars. Sums skip nulls
        (pandas .sum), counts count non-nulls, matching _assign's
        masked cumsum so block offsets and in-block values agree."""
        if t.num_rows == 0:
            return None
        k = t[key].to_pandas().to_numpy()
        v = t[col].to_pandas()
        nk_idx = np.flatnonzero(_new_key_mask(k))
        n_first = nk_idx[1] if len(nk_idx) > 1 else len(k)
        first, last = v.iloc[:n_first], v.iloc[nk_idx[-1]:]
        return (
            k[0],
            (float(first.sum()), int(first.notna().sum())),
            k[-1],
            (float(last.sum()), int(last.notna().sum())),
        )

    metas = ray.get([_meta.remote(r) for r in refs])
    # driver walk: (sum, count) offset for each block's FIRST key (only
    # a key continuing from the previous non-empty block needs one)
    offsets, prev_key, prev_cum = [], _NO_PREV, (0.0, 0)
    for m in metas:
        if m is None:
            offsets.append((0.0, 0))
            continue
        first_key, first_sc, last_key, last_sc = m
        if prev_key is not _NO_PREV and _null_eq(first_key, prev_key):
            off = prev_cum
        else:
            off = (0.0, 0)
        offsets.append(off)
        if _null_eq(last_key, first_key):
            prev_cum = (off[0] + first_sc[0], off[1] + first_sc[1])
        else:
            prev_cum = last_sc
        prev_key = last_key

    @ray.remote
    def _assign(t: pa.Table, off) -> pa.Table:
        t = _drop_helpers(t)
        if t.num_rows == 0:
            return t.append_column(out_col, pa.nulls(0, type=pa.float64()))
        off_sum, off_cnt = off
        v_raw = t[col].to_pandas()
        valid = v_raw.notna().to_numpy()
        v = np.where(valid, v_raw.to_numpy(dtype=np.float64, na_value=0.0), 0.0)
        k = t[key].to_numpy(zero_copy_only=False)
        run = np.cumsum(v)
        cnt = np.cumsum(valid)
        new_key = _new_key_mask(k)
        # subtract the running total as of each key's start (forward-
        # fill of the key-start index — NOT maximum.accumulate of the
        # base values, which breaks when negative values make `run`
        # non-monotone)
        start_idx = np.maximum.accumulate(np.where(new_key, np.arange(len(k)), 0))
        out = run - (run - v)[start_idx]
        cnt_key = cnt - (cnt - valid)[start_idx]
        nk_idx = np.flatnonzero(new_key)
        n_first = nk_idx[1] if len(nk_idx) > 1 else len(k)
        out[:n_first] += off_sum
        cnt_key[:n_first] += off_cnt
        # SQL SUM OVER is NULL until the partition's first non-null
        return t.append_column(
            out_col, pa.array(out, type=pa.float64(), mask=(cnt_key == 0))
        ).replace_schema_metadata(None)

    out_refs = [_assign.remote(r, o) for r, o in zip(refs, offsets)]
    from tenzir_ray.arrowutil import from_arrow_refs_retried

    out = from_arrow_refs_retried(out_refs)
    del mat
    return out


def _order_change_mask(arrays) -> np.ndarray:
    """True where ANY order column differs from the previous row in a
    sorted block (nulls compare equal to nulls, SQL ORDER BY style).
    Row 0 is always True (it starts the block's first tie group)."""
    n = len(arrays[0])
    change = np.ones(n, dtype=bool)
    if n > 1:
        change[1:] = False
        for arr in arrays:
            isna = pd.isna(arr)
            both_na = isna[1:] & isna[:-1]
            with np.errstate(invalid="ignore"):
                neq = arr[1:] != arr[:-1]
            change[1:] |= (np.asarray(neq, dtype=bool) & ~both_na) | (
                isna[1:] ^ isna[:-1]
            )
    return change


def window_ranks(
    ds: Dataset,
    key: str,
    order_cols,
    row_number: Optional[str] = None,
    rank: Optional[str] = None,
    dense_rank: Optional[str] = None,
) -> Dataset:
    """ROW_NUMBER / RANK / DENSE_RANK ``OVER (PARTITION BY key ORDER BY
    order_cols)`` in ONE distributed sorted scan (native int64 — no
    float accumulator). Pass an output column name for each ranking
    you want; all three share the same sort so asking for several is
    free.

    Shape: range-partition sort by (key, order), vectorized in-block
    tie-group detection, and a driver walk over O(blocks) scalar metas
    — the carry for a key continuing across a block boundary is
    (rows-so-far, last rank, last dense rank, last order tuple)."""
    import ray

    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    outs = {"rn": row_number, "rk": rank, "dr": dense_rank}
    if not any(outs.values()):
        raise ValueError("window_ranks: request at least one output column")

    refs, mat = _sorted_refs(ds, key, order_cols)

    def _local(k: np.ndarray, order_arrs):
        """Block-local (row_number, rank, dense_rank), all 1-based
        within each key run, plus the masks needed for carries."""
        n = len(k)
        idx = np.arange(n, dtype=np.int64)
        nk = _new_key_mask(k)
        gs = nk | _order_change_mask(order_arrs)
        key_start = np.maximum.accumulate(np.where(nk, idx, 0))
        grp_start = np.maximum.accumulate(np.where(gs, idx, 0))
        rn = idx - key_start + 1
        rk = grp_start - key_start + 1
        gs_cum = np.cumsum(gs)
        dr = gs_cum - gs_cum[key_start] + 1
        return nk, gs, rn, rk, dr

    @ray.remote(num_cpus=0.25)
    def _meta(t: pa.Table):
        if t.num_rows == 0:
            return None
        k = t[key].to_numpy(zero_copy_only=False)
        order_arrs = [t[c].to_numpy(zero_copy_only=False) for c in order_cols]
        nk, gs, rn, rk, dr = _local(k, order_arrs)
        nk_idx = np.flatnonzero(nk)
        n_first = int(nk_idx[1]) if len(nk_idx) > 1 else len(k)
        first_tuple = tuple(a[0] for a in order_arrs)
        last_tuple = tuple(a[-1] for a in order_arrs)
        return {
            "first_key": k[0],
            "first_tuple": first_tuple,
            "last_key": k[-1],
            "last_tuple": last_tuple,
            "n_first": n_first,
            "n_last": len(k) - int(nk_idx[-1]),
            "one_key": len(nk_idx) == 1,
            "last_rn": int(rn[-1]),
            "last_rk": int(rk[-1]),
            "last_dr": int(dr[-1]),
        }

    metas = ray.get([_meta.remote(r) for r in refs])

    # driver walk: per block, the offsets for its FIRST key run.
    # Carry = (key, order tuple, rows so far, rank of last row, dense
    # rank of last row) for the key that may continue into block i.
    plans = []  # (row_off, rank_off, dense_off, override rank/dense or None)
    carry = _NO_PREV
    for m in metas:
        if m is None:
            plans.append((0, 0, 0, None))
            continue
        if carry is not _NO_PREV and _null_eq(m["first_key"], carry[0]):
            c_key, c_tuple, c_n, c_rk, c_dr = carry
            ties = _tuple_eq(m["first_tuple"], c_tuple)
            plan = (
                c_n,                      # row_number offset
                c_n,                      # rank offset for later tie groups
                c_dr - 1 if ties else c_dr,  # dense offset
                (c_rk, c_dr) if ties else None,  # first tie group override
            )
        else:
            plan = (0, 0, 0, None)
        plans.append(plan)
        row_off, rank_off, dense_off, override = plan
        if m["one_key"]:
            n_total = row_off + m["n_first"]
            if override is not None and m["last_dr"] == 1:
                # whole block is one tie group continuing the carry
                new_rk, new_dr = override
            else:
                new_rk = m["last_rk"] + rank_off
                new_dr = m["last_dr"] + dense_off
            carry = (m["last_key"], m["last_tuple"], n_total, new_rk, new_dr)
        else:
            carry = (
                m["last_key"], m["last_tuple"], m["n_last"],
                m["last_rk"], m["last_dr"],
            )

    @ray.remote
    def _assign(t: pa.Table, plan) -> pa.Table:
        t = _drop_helpers(t)
        if t.num_rows == 0:
            for name in outs.values():
                if name:
                    t = t.append_column(name, pa.array([], type=pa.int64()))
            return t
        row_off, rank_off, dense_off, override = plan
        k = t[key].to_numpy(zero_copy_only=False)
        order_arrs = [t[c].to_numpy(zero_copy_only=False) for c in order_cols]
        nk, gs, rn, rk, dr = _local(k, order_arrs)
        nk_idx = np.flatnonzero(nk)
        n_first = int(nk_idx[1]) if len(nk_idx) > 1 else len(k)
        rn[:n_first] += row_off
        rk_adj = rk.copy()
        dr_adj = dr.copy()
        rk_adj[:n_first] += rank_off
        dr_adj[:n_first] += dense_off
        if override is not None:
            # rows of the first tie group continue the carried group
            gs_idx = np.flatnonzero(gs)
            g1 = int(gs_idx[1]) if len(gs_idx) > 1 else len(k)
            g1 = min(g1, n_first)
            rk_adj[:g1] = override[0]
            dr_adj[:g1] = override[1]
        vals = {"rn": rn, "rk": rk_adj, "dr": dr_adj}
        for which, name in outs.items():
            if name:
                t = t.append_column(name, pa.array(vals[which], type=pa.int64()))
        return t.replace_schema_metadata(None)

    out_refs = [_assign.remote(r, p) for r, p in zip(refs, plans)]
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
    BY key ORDER BY ...)`` via :func:`window_ranks` (int64 throughout)."""
    return window_ranks(ds, key, order_cols, row_number=out_col)


def rank_col(ds: Dataset, key: str, order_cols, out_col: str = "rank") -> Dataset:
    """SQL ``RANK() OVER (PARTITION BY key ORDER BY ...)``."""
    return window_ranks(ds, key, order_cols, rank=out_col)


def dense_rank_col(
    ds: Dataset, key: str, order_cols, out_col: str = "dense_rank"
) -> Dataset:
    """SQL ``DENSE_RANK() OVER (PARTITION BY key ORDER BY ...)``."""
    return window_ranks(ds, key, order_cols, dense_rank=out_col)
