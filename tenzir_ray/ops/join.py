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


def _arrow_schema(ds: Dataset) -> pa.Schema:
    """Dataset schema as a pyarrow.Schema. Pandas-backed datasets
    expose a PandasBlockSchema (names + numpy dtypes); map those
    through pyarrow's dtype bridge (object dtype -> string, the Arrow
    convention for pandas text columns)."""
    import numpy as np

    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, dtype in zip(base.names, base.types):
        if isinstance(dtype, pa.DataType):
            fields.append(pa.field(name, dtype))
        elif getattr(dtype, "kind", None) == "O":
            fields.append(pa.field(name, pa.string()))
        else:
            fields.append(pa.field(name, pa.from_numpy_dtype(np.dtype(dtype))))
    return pa.schema(fields)


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


def asof_shuffle_join(
    left: Dataset,
    right: Dataset,
    on: str,
    by: Union[str, Sequence[str], None] = None,
    direction: str = "backward",
    suffix: str = "_r",
) -> Dataset:
    """Big-big as-of join — the escape hatch :func:`asof_join`'s
    broadcast contract points to, for a right side too large to
    ``ray.put``.

    Shape (the ``sessionize_sorted`` boundary-fix pattern): tag each
    side, align schemas (right payload columns are null on left rows
    and vice versa), UNION the two datasets, and run ONE distributed
    range-partition sort by ``(by..., on, side)`` with right rows
    ordered before left rows on ``on``-ties (so exact matches are
    visible, DuckDB ``ASOF`` / ``merge_asof(allow_exact_matches=True)``
    semantics). Each sorted block then resolves matches with a
    vectorized last-right-row-scan, and the ONLY cross-block state is
    one carry row per block boundary (the latest right row of the
    block's last key), fixed up with a driver walk over per-block
    scalar metadata — never rows. Left rows with a null ``on`` value
    never match (SQL semantics); right rows with a null ``on`` are
    dropped up front.

    Always LEFT OUTER (every left row survives; unmatched ones carry
    null right payloads). ``direction='backward'`` matches the latest
    right row at-or-before; ``'forward'`` the earliest at-or-after
    (implemented as backward over the negated on-axis).
    Output columns: all left columns, then right payload columns
    (``suffix``-renamed on clashes). Uniqueness contract matches
    :func:`asof_join`: right (by, on) combinations should be unique,
    otherwise the last row in sort order wins deterministically."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data

    if direction == "forward":
        # forward = backward on the negated on-axis:
        # e.on <= r.on  <=>  -e.on >= -r.on (exact matches preserved).
        # Temporal columns ride as negated int64 and cast back after.
        typ = _arrow_schema(left).field(on).type
        r_typ = _arrow_schema(right).field(on).type
        if r_typ != typ:
            # a unit mismatch (ns vs us) would negate both sides to raw
            # int64 and compare in mixed units SILENTLY — fail loudly,
            # matching the backward path's schema check at the union
            raise TypeError(
                f"asof_shuffle_join forward: on-column type mismatch: "
                f"left {on!r} is {typ}, right is {r_typ} — cast one side first"
            )

        def neg(t: pa.Table) -> pa.Table:
            col = t[on]
            if pa.types.is_temporal(typ):
                col = pc.cast(col, pa.int64())
            col = pc.negate_checked(col)
            return t.set_column(t.column_names.index(on), on, col)

        def restore(t: pa.Table) -> pa.Table:
            col = pc.negate_checked(t[on])
            if pa.types.is_temporal(typ):
                col = pc.cast(col, typ)
            return t.set_column(t.column_names.index(on), on, col)

        out = asof_shuffle_join(
            left.map_batches(neg, **_PYARROW),
            right.map_batches(neg, **_PYARROW),
            on=on,
            by=by,
            direction="backward",
            suffix=suffix,
        )
        return out.map_batches(restore, **_PYARROW)
    if direction != "backward":
        raise ValueError(
            "asof_shuffle_join supports direction='backward' or 'forward'"
        )
    by_cols: List[str] = [] if by is None else [by] if isinstance(by, str) else list(by)

    l_schema = _arrow_schema(left)
    r_schema = _arrow_schema(right)
    key_cols = by_cols + [on]
    for c in key_cols:
        if c not in r_schema.names:
            raise ValueError(f"right side missing join column {c!r}")
    l_names = set(l_schema.names)
    payload_src = [c for c in r_schema.names if c not in key_cols]
    payload_map = {c: (c + suffix if c in l_names else c) for c in payload_src}
    payload_types = {payload_map[c]: r_schema.field(c).type for c in payload_src}
    l_only = [c for c in l_schema.names if c not in key_cols]
    l_types = {c: l_schema.field(c).type for c in l_only}

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in t.column_names}
        for name, typ in payload_types.items():
            cols[name] = pa.nulls(t.num_rows, type=typ)
        cols["__side"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[on]))  # null on-values never match
        cols = {c: t[c] for c in key_cols}
        for src, dst in payload_map.items():
            cols[dst] = t[src]
        for c, typ in l_types.items():
            cols[c] = pa.nulls(t.num_rows, type=typ)
        cols["__side"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    out_cols = list(l_schema.names) + list(payload_map.values())
    ordered = out_cols + ["__side"]
    u = left.map_batches(tag_left, **_PYARROW).select_columns(ordered).union(
        right.map_batches(tag_right, **_PYARROW).select_columns(ordered)
    )
    sorted_ds = u.sort(key_cols + ["__side"])
    lineage_ctx = sorted_ds.context
    prev_order = lineage_ctx.execution_options.preserve_order
    lineage_ctx.execution_options.preserve_order = True
    try:
        # bind the MaterializedDataset so its block refs cannot be
        # GC-reclaimed between to_arrow_refs and the downstream
        # from_arrow_refs metadata fetch (rare suite-load flake:
        # KeyError inside ray::get_table_block_metadata_schema)
        mat = sorted_ds.materialize()
        refs = mat.to_arrow_refs()
    finally:
        lineage_ctx.execution_options.preserve_order = prev_order

    payload_names = list(payload_map.values())

    def _key_tuple(t: pa.Table, i: int):
        return tuple(t[c][i].as_py() for c in by_cols) if by_cols else ()

    @ray.remote(num_cpus=0.25)
    def _meta(t: pa.Table):
        """Scalars only: first/last key and the last right row of the
        LAST key (its on-value + payload), for the driver carry walk."""
        if t.num_rows == 0:
            return None
        n = t.num_rows
        lk = _key_tuple(t, n - 1)
        side = np.asarray(t["__side"].combine_chunks())
        # last right row whose key == lk: keys are sorted, so scan the
        # tail segment where the key equals lk
        lo = 0
        if by_cols:
            import bisect

            keys = list(zip(*[t[c].to_pylist() for c in by_cols]))
            lo = bisect.bisect_left(keys, lk)
        r_idx = np.flatnonzero(side[lo:] == 0)
        carry = None
        if r_idx.size:
            i = lo + int(r_idx[-1])
            carry = {c: t[c][i].as_py() for c in payload_names}
            carry["__on"] = t[on][i].as_py()
        return {"first_key": _key_tuple(t, 0), "last_key": lk, "carry": carry}

    metas = ray.get([_meta.remote(r) for r in refs])

    # driver walk: carry INTO each block = latest right row of the
    # previous blocks IF its key equals this block's first key
    carries: List[Optional[dict]] = []
    state_key, state_carry = None, None
    for m in metas:
        if m is None:
            carries.append(None)
            continue
        carries.append(state_carry if state_key == m["first_key"] else None)
        if state_key == m["last_key"]:
            state_carry = m["carry"] if m["carry"] is not None else (
                state_carry if m["last_key"] == m["first_key"] else None
            )
        else:
            state_key, state_carry = m["last_key"], m["carry"]

    @ray.remote
    def _assign(t: pa.Table, carry: Optional[dict]) -> pa.Table:
        if t.num_rows == 0:
            return t.select(out_cols)
        n = t.num_rows
        side = np.asarray(t["__side"].combine_chunks())
        pos = np.arange(n, dtype=np.int64)
        last_r = np.maximum.accumulate(np.where(side == 0, pos, -1))
        if by_cols:
            new_key = np.zeros(n, dtype=bool)
            new_key[0] = True
            for c in by_cols:
                col = t[c].combine_chunks()
                v = col.to_numpy(zero_copy_only=False)
                neq = v[1:] != v[:-1]
                nulls = np.asarray(pc.is_null(col))
                if nulls.any():  # null keys: group like values
                    neq |= nulls[1:] != nulls[:-1]
                new_key[1:] |= neq
            key_start = np.maximum.accumulate(np.where(new_key, pos, 0))
        else:
            key_start = np.zeros(n, dtype=np.int64)
        valid = last_r >= key_start
        on_null = np.asarray(pc.is_null(t[on].combine_chunks()))
        is_left = side == 1
        take_idx = np.where(valid, last_r, 0)
        lsel = np.flatnonzero(is_left)
        cols = {c: t[c].combine_chunks().take(pa.array(lsel)) for c in l_schema.names}
        for pname in payload_names:
            src = t[pname].combine_chunks()
            filled = src.take(pa.array(take_idx[lsel]))
            lvalid = (valid & ~on_null)[lsel]
            if not lvalid.all():
                filled = pc.if_else(pa.array(lvalid), filled, pa.nulls(len(lsel), type=src.type))
            # carry applies to this block's FIRST key's left rows (the
            # key_start==0 segment) that precede any in-block right row
            if carry is not None:
                need = ~lvalid & (key_start[lsel] == 0) & ~on_null[lsel]
                if need.any():
                    cv = pa.array([carry[pname]] * len(lsel), type=src.type)
                    filled = pc.if_else(pa.array(need), cv, filled)
            cols[pname] = filled
        return pa.table({c: cols[c] for c in out_cols})

    out_refs = [_assign.remote(r, c) for r, c in zip(refs, carries)]
    from tenzir_ray.arrowutil import from_arrow_refs_retried

    out = from_arrow_refs_retried(out_refs)
    del mat  # keep sorted blocks alive through the metadata fetch above
    return out


class _SegmentIndex:
    """Elementary-segment CSR index over inclusive ``[lo, hi]``
    intervals (ordinal int64/float64 arrays): sorted unique endpoints
    split the domain into segments; ``flat``/``offsets`` map each
    segment to its covering interval ids. Build is fully vectorized,
    O(total segment coverage); a batch probe is one ``searchsorted`` +
    two ``repeat`` gathers. Shared by the broadcast
    :func:`range_join` (one index per actor) and the partitioned
    :func:`range_shuffle_join` (one index per partition's intervals)."""

    def __init__(self, lo, hi, is_float: bool):
        import numpy as np

        from tenzir_ray.arrowutil import ranges as _ranges

        # inclusive hi: integer ordinals bump by 1; float ordinals by
        # one ulp — the segment [lo, hi_excl) then covers hi
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

    def probe(self, ts):
        """(left_idx, right_take, per-row match count) for probe
        ordinals ``ts`` — vectorized, one output row per containment."""
        import numpy as np

        from tenzir_ray.arrowutil import ranges as _ranges

        seg = np.searchsorted(self.pts, ts, side="right") - 1
        valid = (seg >= 0) & (seg < self.nseg)
        segc = np.where(valid, seg, 0)
        cnt = np.where(valid, self.counts[segc], 0)
        left_idx = np.repeat(np.arange(len(ts), dtype=np.int64), cnt)
        base = np.repeat(self.offsets[segc], cnt)
        right_take = self.flat[base + _ranges(cnt)]
        return left_idx, right_take, cnt


def _range_domain(left_on_type: pa.DataType, lo_type: pa.DataType):
    """ONE comparison domain for probe and bounds (unit-aligning
    temporal cast; float64 if either side floats, else int64) —
    returns (domain type, is_float, ordinal fn)."""
    import numpy as np

    if pa.types.is_temporal(lo_type):
        if not pa.types.is_temporal(left_on_type):
            raise TypeError(
                f"range join: left key is {left_on_type}, right bounds are {lo_type}"
            )
        domain, is_float = lo_type, False
    elif pa.types.is_floating(lo_type) or pa.types.is_floating(left_on_type):
        domain, is_float = pa.float64(), True
    else:
        domain, is_float = pa.int64(), False

    def ordinal(arr):
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        t = arr.type
        if not (pa.types.is_temporal(t) or pa.types.is_integer(t) or pa.types.is_floating(t)):
            raise TypeError(f"range join key must be temporal/numeric, got {t}")
        arr = arr.cast(domain)
        if pa.types.is_temporal(domain):
            return np.asarray(arr.cast(pa.int64()))
        return np.asarray(arr)

    return domain, is_float, ordinal


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

    if how not in ("inner", "left outer"):
        raise ValueError(f"range_join supports 'inner' / 'left outer', got {how!r}")

    _, is_float, _ordinal = _range_domain(
        ds.schema().base_schema.field(on).type, right.schema.field(lo_col).type
    )
    r_ref = ray.put(right)
    cpus = int(ray.cluster_resources().get("CPU", 4))

    class RangeJoiner:
        def __init__(self):
            r = ray.get(r_ref)
            self.index = _SegmentIndex(_ordinal(r[lo_col]), _ordinal(r[hi_col]), is_float)
            # right columns, clash-suffixed
            self.right = pa.table(
                {
                    (c + suffix if c in set_left_cols else c): r[c]
                    for c in r.column_names
                }
            )

        def __call__(self, t: pa.Table) -> pa.Table:
            import numpy as np

            left_idx, right_take, cnt = self.index.probe(_ordinal(t[on]))
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


def range_shuffle_join(
    left: Dataset,
    right: Dataset,
    on: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
    suffix: str = "_r",
    num_partitions: Optional[int] = None,
    sample_per_block: int = 64,
) -> Dataset:
    """Big-big interval-containment join — the escape hatch
    :func:`range_join`'s broadcast contract points to, for an interval
    side too large to ``ray.put`` (VERDICT r4 item 8), mirroring
    :func:`asof_shuffle_join`'s shape.

    Shape: **range-partition the probe domain, replicate
    boundary-spanning intervals.**

    1. Sample the left ``on`` column per block (``sample_per_block``
       scalars per block, never rows) and cut ``num_partitions``
       equal-left-count boundaries — probe skew is bounded by
       construction.
    2. Every left row lands in exactly ONE partition
       (``searchsorted``); every right interval REPLICATES into each
       partition its ``[lo, hi]`` overlaps. An interval spanning the
       whole domain costs P copies (P ≈ 2× cluster CPUs) — the stated
       replication trade; probe rows are never replicated, so output
       cardinality is exact.
    3. Both tagged sides union (schemas aligned, payload columns
       null-filled) and co-locate in ONE hash shuffle
       (``groupby('__part').map_groups``); each partition builds the
       same :class:`_SegmentIndex` over ITS intervals only — the
       O(coverage) CSR build cost is paid per partition, not squared
       globally — and probes its left rows vectorized.

    ``how``: 'inner' or 'left outer' (each left row lives in exactly
    one partition, so unmatched-left emission is local and exact).
    Right columns clashing with left names get ``suffix``; ``lo_col``/
    ``hi_col`` are dropped from the output like :func:`range_join`
    keeps them — they are kept, suffixed on clash, for parity."""
    import numpy as np
    import pyarrow.compute as pc

    if how not in ("inner", "left outer"):
        raise ValueError(
            f"range_shuffle_join supports 'inner' / 'left outer', got {how!r}"
        )
    l_schema = _arrow_schema(left)
    r_schema = _arrow_schema(right)
    for c in (lo_col, hi_col):
        if c not in r_schema.names:
            raise ValueError(f"right side missing bound column {c!r}")
    _, is_float, _ordinal = _range_domain(
        l_schema.field(on).type, r_schema.field(lo_col).type
    )
    if num_partitions is None:
        num_partitions = max(8, 2 * int(ray.cluster_resources().get("CPU", 4)))

    # -- 1. boundary sample: scalars only, one tiny collect ----------------
    def _sample(t: pa.Table) -> pa.Table:
        col = t[on].combine_chunks() if isinstance(t[on], pa.ChunkedArray) else t[on]
        col = col.drop_null()
        if len(col) == 0:
            return pa.table({"v": pa.array([], type=pa.float64())})
        idx = np.linspace(0, len(col) - 1, min(sample_per_block, len(col))).astype(np.int64)
        return pa.table({"v": pa.array(_ordinal(col)[idx].astype(np.float64))})

    samples = [
        r["v"]
        for r in left.map_batches(_sample, **_PYARROW).take_all()
    ]
    if samples:
        qs = np.quantile(np.asarray(samples, dtype=np.float64),
                         np.linspace(0, 1, num_partitions + 1)[1:-1])
        bounds = np.unique(qs)
    else:
        bounds = np.array([], dtype=np.float64)

    # -- 2. partition tagging ----------------------------------------------
    l_names = set(l_schema.names)
    r_out_map = {c: (c + suffix if c in l_names else c) for c in r_schema.names}
    r_out_types = {r_out_map[c]: r_schema.field(c).type for c in r_schema.names}
    l_types = {c: l_schema.field(c).type for c in l_schema.names}
    out_cols = list(l_schema.names) + [r_out_map[c] for c in r_schema.names]

    def tag_left(t: pa.Table) -> pa.Table:
        ts = _ordinal(t[on]).astype(np.float64)
        nulls = np.asarray(pc.is_null(t[on].combine_chunks()))
        part = np.searchsorted(bounds, ts, side="right").astype(np.int64)
        part[nulls] = 0  # null probes never match; park them anywhere
        cols = {c: t[c] for c in t.column_names}
        for name, typ in r_out_types.items():
            cols[name] = pa.nulls(t.num_rows, type=typ)
        cols["__part"] = pa.array(part)
        cols["__side"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        # drop null/inverted bounds up front, then replicate each
        # interval into every partition range it overlaps
        t = t.filter(pc.and_(pc.is_valid(t[lo_col]), pc.is_valid(t[hi_col])))
        lo = _ordinal(t[lo_col]).astype(np.float64)
        hi = _ordinal(t[hi_col]).astype(np.float64)
        p0 = np.searchsorted(bounds, lo, side="right").astype(np.int64)
        p1 = np.searchsorted(bounds, hi, side="right").astype(np.int64)
        reps = np.maximum(p1 - p0 + 1, 0)
        reps[hi < lo] = 0
        from tenzir_ray.arrowutil import ranges as _ranges

        row_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), reps)
        part = np.repeat(p0, reps) + _ranges(reps)
        rt = t.take(pa.array(row_idx))
        cols = {r_out_map[c]: rt[c] for c in rt.column_names}
        for c, typ in l_types.items():
            cols[c] = pa.nulls(rt.num_rows, type=typ)
        cols["__part"] = pa.array(part)
        cols["__side"] = pa.array(np.zeros(rt.num_rows, dtype=np.int8))
        return pa.table(cols)

    ordered = out_cols + ["__part", "__side"]
    u = left.map_batches(tag_left, **_PYARROW).select_columns(ordered).union(
        right.map_batches(tag_right, **_PYARROW).select_columns(ordered)
    )

    # -- 3. per-partition segment join --------------------------------------
    lo_out, hi_out = r_out_map[lo_col], r_out_map[hi_col]

    def join_group(t: pa.Table) -> pa.Table:
        side = np.asarray(t["__side"].combine_chunks())
        lt = t.filter(pa.array(side == 1)).select(out_cols)
        rt = t.filter(pa.array(side == 0))
        l_part = lt.select(list(l_schema.names))
        r_part = rt.select([r_out_map[c] for c in r_schema.names])
        if l_part.num_rows == 0:
            return pa.schema(
                [(c, l_types.get(c) or r_out_types[c]) for c in out_cols]
            ).empty_table()
        if r_part.num_rows == 0:
            if how == "inner":
                return pa.schema(
                    [(c, l_types.get(c) or r_out_types[c]) for c in out_cols]
                ).empty_table()
            return lt  # all-null right payloads already in place
        index = _SegmentIndex(
            _ordinal(r_part[lo_out]), _ordinal(r_part[hi_out]), is_float
        )
        left_idx, right_take, cnt = index.probe(_ordinal(l_part[on]))
        out_left = l_part.take(pa.array(left_idx))
        out_right = r_part.take(pa.array(right_take))
        matched = pa.table(
            {
                **{c: out_left[c] for c in out_left.column_names},
                **{c: out_right[c] for c in out_right.column_names},
            }
        ).select(out_cols)
        if how == "inner":
            return matched
        miss = np.flatnonzero(cnt == 0)
        if not miss.size:
            return matched
        return pa.concat_tables([matched, lt.take(pa.array(miss))])

    return u.groupby("__part").map_groups(join_group, batch_format="pyarrow")
