"""Join operators — broadcast lookup join and as-of join.

The reference has NO two-input join (SURVEY §2.5 negative space:
pipelines are linear, ``pipeline.hpp:401-414``); its only lookup-style
enrichment is sigma matching and taxonomy resolution. These operators
are the training-data-pipeline extension the brief calls for, built
the Ray-Data-idiomatic way:

- **Broadcast pattern, stated assumption**: the RIGHT side is a
  dimension table small enough to ``ray.put`` once and read from the
  object store by every task (one copy per node). At 100 TB the left
  side streams; the right side must stay ~worker-heap-sized.
- **Big-big escape hatch**: :func:`shuffle_join` hash-partitions BOTH
  sides (Ray's native join aggregators) when the right side outgrows
  a broadcast — the co-partitioned reduce-side join.
- Per-batch kernels are C-backed: ``pyarrow.Table.join`` (hash join)
  and ``pandas.merge_asof`` (sorted as-of merge).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

_PYARROW = dict(batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def lookup_join(
    ds: Dataset,
    right: pa.Table,
    keys: Union[str, Sequence[str]],
    right_keys: Union[str, Sequence[str], None] = None,
    how: str = "left outer",
) -> Dataset:
    """Hash-join every batch of ``ds`` against a broadcast ``right``
    table (``pyarrow.Table.join`` per batch; join types as pyarrow
    names: 'left outer', 'inner', ...)."""
    # only LEFT-preserving join types are correct per batch: a
    # right-preserving type ('right outer', 'full outer', 'right
    # semi/anti') would emit unmatched/matched RIGHT rows once per left
    # batch, duplicating or fabricating rows. The escape hatch for those
    # is a co-partitioned shuffle join (the dedup reduce-side pattern).
    _LEFT_PRESERVING = {"left outer", "inner", "left semi", "left anti"}
    if how not in _LEFT_PRESERVING:
        raise ValueError(
            f"lookup_join supports only left-preserving join types "
            f"{sorted(_LEFT_PRESERVING)}, got {how!r}; right-preserving "
            f"joins need a co-partitioned shuffle join, not a broadcast"
        )
    keys = [keys] if isinstance(keys, str) else list(keys)
    right_keys = (
        keys if right_keys is None
        else [right_keys] if isinstance(right_keys, str) else list(right_keys)
    )
    r_ref = ray.put(right)

    def apply(t: pa.Table) -> pa.Table:
        r = ray.get(r_ref)
        return t.join(r, keys=keys, right_keys=right_keys, join_type=how)

    return ds.map_batches(apply, **_PYARROW)


def shuffle_join(
    left: Dataset,
    right: Dataset,
    keys: Union[str, Sequence[str]],
    right_keys: Union[str, Sequence[str], None] = None,
    how: str = "inner",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Big-big distributed hash join: BOTH sides are hash-partitioned
    on the key and each partition pair is joined independently
    (``ray.data.Dataset.join`` — Ray's native hash-shuffle join
    aggregators). This is the escape hatch :func:`lookup_join`'s
    broadcast contract points to: use it when the right side outgrows
    a worker's heap.

    ``how`` accepts the pyarrow-style names lookup_join uses ('inner',
    'left outer', 'right outer', 'full outer', 'left semi', ...).
    ``num_partitions`` defaults to ~2x cluster CPUs. At 100 TB, size it
    so ONE partition pair fits a worker's heap, and reuse one
    partitioning key across pipeline stages where possible."""
    mapping = {
        "inner": "inner",
        "left outer": "left_outer",
        "right outer": "right_outer",
        "full outer": "full_outer",
        "left semi": "left_semi",
        "right semi": "right_semi",
        "left anti": "left_anti",
        "right anti": "right_anti",
    }
    if how not in mapping:
        raise ValueError(f"unknown join type {how!r}; one of {sorted(mapping)}")
    keys = (keys,) if isinstance(keys, str) else tuple(keys)
    right_keys = (
        keys if right_keys is None
        else (right_keys,) if isinstance(right_keys, str) else tuple(right_keys)
    )
    if num_partitions is None:
        num_partitions = max(8, 2 * int(ray.cluster_resources().get("CPU", 4)))
    return left.join(
        right,
        join_type=mapping[how],
        num_partitions=num_partitions,
        on=keys,
        right_on=right_keys if right_keys != keys else None,
    )


def asof_join(
    ds: Dataset,
    right: pa.Table,
    on: str,
    by: Union[str, Sequence[str], None] = None,
    direction: str = "backward",
    tolerance=None,
) -> Dataset:
    """As-of join: for each left row, attach the right row with the
    greatest ``on`` value <= the left's (direction='backward'; also
    'forward'/'nearest'), optionally matching ``by`` keys first —
    DuckDB's ``ASOF JOIN`` semantics, pandas' C merge kernel per
    batch.

    The right table must have UNIQUE (by, on) combinations — ties make
    the matched row ambiguous; callers pre-aggregate (the same
    discipline DuckDB's ASOF requires for determinism)."""
    by_cols: Optional[List[str]] = (
        None if by is None else [by] if isinstance(by, str) else list(by)
    )
    # broadcast the right side UNSORTED (one ray.put of Arrow bytes);
    # the sort happens once per ACTOR in __init__, not on the driver
    # and not per batch
    r_ref = ray.put(right)
    cpus = int(ray.cluster_resources().get("CPU", 4))

    class AsofJoiner:
        def __init__(self):
            r = ray.get(r_ref)
            self.rdf = r.to_pandas().sort_values(on, kind="mergesort").reset_index(drop=True)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            left = df.sort_values(on, kind="mergesort").reset_index(drop=True)
            return pd.merge_asof(
                left, self.rdf, on=on, by=by_cols, direction=direction,
                tolerance=tolerance,
            )

    return ds.map_batches(
        AsofJoiner, concurrency=(1, max(2, cpus // 4)), num_cpus=0.5,
        batch_format="pandas", batch_size=None,
    )


def range_join(
    ds: Dataset,
    right: pa.Table,
    on: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
    suffix: str = "_r",
) -> Dataset:
    """Interval-containment join: each left row joins every right row
    whose ``[lo_col, hi_col]`` interval (inclusive) contains
    ``left[on]`` — ``ts BETWEEN lo AND hi`` in SQL. One-to-many:
    output has one row per (left row, containing interval).

    Broadcast pattern (same contract as :func:`lookup_join`): the
    right side is interval metadata small enough to ``ray.put`` once.
    Each actor builds an ELEMENTARY-SEGMENT index once in ``__init__``:
    the sorted unique interval endpoints split the domain into
    segments, and a CSR (segment -> covering interval ids) table is
    built fully vectorized; a batch query is then one
    ``searchsorted`` + two ``repeat`` gathers — no per-row Python, no
    per-batch index rebuild. Build cost is O(total segment coverage):
    heavily-overlapping interval sets square it, which is the stated
    broadcast-small trade (a big-big interval join would need a
    range-partitioned shuffle instead).

    ``how``: 'inner' or 'left outer' (unmatched left rows keep null
    right columns). Right columns clashing with left names get
    ``suffix``."""
    import numpy as np

    from tenzir_ray.arrowutil import ranges as _ranges

    if how not in ("inner", "left outer"):
        raise ValueError(f"range_join supports 'inner' / 'left outer', got {how!r}")

    # ONE comparison domain for probe and bounds: temporal keys cast to
    # the RIGHT side's exact type (unit alignment — a ms probe against
    # us bounds must not compare raw ticks), numeric keys to float64 if
    # EITHER side is floating (so x=10.5 vs int bounds [5, 10] does not
    # get inclusive-bumped into range), else int64.
    left_on_type = ds.schema().base_schema.field(on).type
    lo_type = right.schema.field(lo_col).type
    if pa.types.is_temporal(lo_type):
        if not pa.types.is_temporal(left_on_type):
            raise TypeError(f"range_join: left {on} is {left_on_type}, right bounds are {lo_type}")
        domain = lo_type
        is_float = False
    elif pa.types.is_floating(lo_type) or pa.types.is_floating(left_on_type):
        domain = pa.float64()
        is_float = True
    else:
        domain = pa.int64()
        is_float = False

    def _ordinal(arr: pa.ChunkedArray | pa.Array) -> "np.ndarray":
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        t = arr.type
        if not (pa.types.is_temporal(t) or pa.types.is_integer(t) or pa.types.is_floating(t)):
            raise TypeError(f"range_join key must be temporal/numeric, got {t}")
        arr = arr.cast(domain)  # unit-aligning cast for temporal types
        if pa.types.is_temporal(domain):
            return np.asarray(arr.cast(pa.int64()))
        return np.asarray(arr)
    r_ref = ray.put(right)
    cpus = int(ray.cluster_resources().get("CPU", 4))

    class RangeJoiner:
        def __init__(self):
            import numpy as np

            r = ray.get(r_ref)
            lo = _ordinal(r[lo_col])
            hi = _ordinal(r[hi_col])
            # inclusive hi: integer ordinals bump by 1; float ordinals
            # by one ulp — the segment [lo, hi_excl) then covers hi
            hi_excl = np.nextafter(hi, np.inf) if is_float else hi + 1
            pts = np.unique(np.concatenate([lo, hi_excl]))
            s0 = np.searchsorted(pts, lo)
            s1 = np.searchsorted(pts, hi_excl)
            spans = np.maximum(s1 - s0, 0)
            seg_idx = np.repeat(s0, spans) + _ranges(spans)
            iv_idx = np.repeat(np.arange(len(lo), dtype=np.int64), spans)
            order = np.argsort(seg_idx, kind="stable")
            self.flat = iv_idx[order]
            self.counts = np.bincount(seg_idx, minlength=max(len(pts) - 1, 1))
            self.offsets = np.concatenate([[0], np.cumsum(self.counts)])
            self.pts = pts
            self.nseg = len(pts) - 1
            # right columns, clash-suffixed
            self.right = pa.table(
                {
                    (c + suffix if c in set_left_cols else c): r[c]
                    for c in r.column_names
                }
            )

        def __call__(self, t: pa.Table) -> pa.Table:
            import numpy as np

            ts = _ordinal(t[on])
            seg = np.searchsorted(self.pts, ts, side="right") - 1
            valid = (seg >= 0) & (seg < self.nseg)
            segc = np.where(valid, seg, 0)
            cnt = np.where(valid, self.counts[segc], 0)
            left_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), cnt)
            base = np.repeat(self.offsets[segc], cnt)
            right_take = self.flat[base + _ranges(cnt)]
            out_left = t.take(pa.array(left_idx))
            out_right = self.right.take(pa.array(right_take))
            matched = pa.table(
                {
                    **{c: out_left[c] for c in out_left.column_names},
                    **{c: out_right[c] for c in out_right.column_names},
                }
            )
            if how == "inner":
                return matched
            miss = np.flatnonzero(cnt == 0)
            if not miss.size:
                return matched
            lt = t.take(pa.array(miss))
            nulls = pa.table(
                {
                    **{c: lt[c] for c in lt.column_names},
                    **{
                        c: pa.nulls(lt.num_rows, type=self.right.schema.field(c).type)
                        for c in self.right.column_names
                    },
                }
            )
            return pa.concat_tables([matched, nulls])

    set_left_cols = set(ds.schema().base_schema.names)
    return ds.map_batches(
        RangeJoiner, concurrency=(1, max(2, cpus // 4)), num_cpus=0.5, **_PYARROW
    )
