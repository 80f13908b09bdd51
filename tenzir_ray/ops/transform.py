"""Row/column transform operators (events -> events).

Every operator here is a pure function ``Dataset -> Dataset`` built on
``map_batches(fn, batch_format="pyarrow")`` with vectorized
pyarrow.compute kernels — the Ray Data re-expression of the reference's
per-batch generator operators (``crtp_operator``,
``libtenzir/include/tenzir/pipeline.hpp:563-666``).
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional, Sequence, Union

import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from tenzir_ray.expr import Node, compile_predicate, compile_scalar

# batch_size=None = one whole block per batch: every kernel here is
# vectorized, so Ray's 1024-row default would only add per-batch overhead
_PYARROW = dict(batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


# ---------------------------------------------------------------------------
# where / select / drop / rename
# ---------------------------------------------------------------------------


def where(ds: Dataset, expr: Union[str, Node], concepts: Optional[Dict] = None) -> Dataset:
    """Keep rows matching the predicate (reference: `where <expr>`,
    ``builtins/operators/where.cpp:53-125``; mask-then-filter per
    ``table_slice.hpp:358-373``). Null mask entries drop the row.
    ``concepts`` maps taxonomy names to concrete field lists
    (``taxonomies.hpp``; resolved before evaluation like the
    reference's per-schema tailoring at ``where.cpp:68-89``)."""
    mask_fn = compile_predicate(expr, concepts=concepts)

    def apply(t: pa.Table) -> pa.Table:
        return t.filter(pc.fill_null(mask_fn(t), False))

    return ds.map_batches(apply, **_PYARROW)


def select(ds: Dataset, columns: Sequence[str]) -> Dataset:
    """Keep only the listed fields (reference: `select`,
    ``builtins/operators/select.cpp:48-96``)."""
    return ds.select_columns(list(columns))


def drop(ds: Dataset, columns: Sequence[str]) -> Dataset:
    """Drop the listed fields (reference: `drop`,
    ``builtins/operators/drop.cpp:51-120``)."""
    cols = list(columns)

    def apply(t: pa.Table) -> pa.Table:
        return t.drop_columns([c for c in cols if c in t.column_names])

    return ds.map_batches(apply, **_PYARROW)


def rename(ds: Dataset, mapping: Dict[str, str]) -> Dataset:
    """Rename fields, ``{new_name: old_name}`` (reference: `rename`,
    ``builtins/operators/rename.cpp:75-140``)."""
    old_to_new = {v: k for k, v in mapping.items()}

    def apply(t: pa.Table) -> pa.Table:
        return t.rename_columns([old_to_new.get(c, c) for c in t.column_names])

    return ds.map_batches(apply, **_PYARROW)


# ---------------------------------------------------------------------------
# put / extend / replace (projection family)
# ---------------------------------------------------------------------------


def put(ds: Dataset, fields: Dict[str, Union[str, Node]]) -> Dataset:
    """Project to exactly the given ``name=expr`` fields, dropping all
    others (reference: `put`,
    ``builtins/operators/put_extend_replace.cpp:143-151``)."""
    compiled = {name: compile_scalar(e) for name, e in fields.items()}

    def apply(t: pa.Table) -> pa.Table:
        arrays = {name: fn(t) for name, fn in compiled.items()}
        return pa.table(arrays)

    return ds.map_batches(apply, **_PYARROW)


def extend(ds: Dataset, fields: Dict[str, Union[str, Node]]) -> Dataset:
    """Add new fields; existing names are left untouched (reference:
    `extend` warns + skips on conflict,
    ``builtins/operators/put_extend_replace.cpp:152-166``)."""
    compiled = {name: compile_scalar(e) for name, e in fields.items()}

    def apply(t: pa.Table) -> pa.Table:
        for name, fn in compiled.items():
            if name not in t.column_names:
                t = t.append_column(name, fn(t))
        return t

    return ds.map_batches(apply, **_PYARROW)


def replace(ds: Dataset, fields: Dict[str, Union[str, Node]]) -> Dataset:
    """Overwrite existing fields (reference: `replace`,
    ``builtins/operators/put_extend_replace.cpp:167-200``)."""
    compiled = {name: compile_scalar(e) for name, e in fields.items()}

    def apply(t: pa.Table) -> pa.Table:
        for name, fn in compiled.items():
            if name in t.column_names:
                idx = t.column_names.index(name)
                arr = fn(t)
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                t = t.set_column(idx, name, arr)
        return t

    return ds.map_batches(apply, **_PYARROW)


# ---------------------------------------------------------------------------
# hash
# ---------------------------------------------------------------------------


def _hash_column(values: pa.ChunkedArray, salt: str, algo: str) -> pa.Array:
    """Digest every value of a column. hashlib's C core does the work;
    the per-row loop only feeds it bytes. String/binary columns are
    digested straight off the Arrow buffers (``arrowutil.str_slices`` —
    no Python strings materialize); other types fall back to ``str``."""
    from tenzir_ray.arrowutil import str_slices

    digest = getattr(hashlib, algo)
    salt_b = salt.encode()
    vtype = values.type
    if (
        pa.types.is_string(vtype)
        or pa.types.is_large_string(vtype)
        or pa.types.is_binary(vtype)
        or pa.types.is_large_binary(vtype)
    ):
        out = [
            None if mv is None else digest(salt_b + bytes(mv)).hexdigest()
            for mv in str_slices(values)
        ] if salt_b else [
            None if mv is None else digest(mv).hexdigest() for mv in str_slices(values)
        ]
        return pa.array(out, type=pa.string())
    out = []
    for chunk in values.chunks if isinstance(values, pa.ChunkedArray) else [values]:
        for v in chunk.to_pylist():
            if v is None:
                out.append(None)
            else:
                out.append(digest(salt_b + str(v).encode()).hexdigest())
    return pa.array(out, type=pa.string())


def hash_op(ds: Dataset, field: str, salt: str = "", algo: str = "sha256") -> Dataset:
    """Append ``{field}_hash`` = digest of the value (+salt) (reference:
    `hash`, ``builtins/operators/hash.cpp:54-130``; the reference uses
    xxh64 — we default to sha256, the digest the CDC parity invariant
    needs, and accept any hashlib algorithm)."""

    def apply(t: pa.Table) -> pa.Table:
        return t.append_column(f"{field}_hash", _hash_column(t[field], salt, algo))

    return ds.map_batches(apply, **_PYARROW)


# ---------------------------------------------------------------------------
# flatten / unflatten
# ---------------------------------------------------------------------------


def _flatten_table(t: pa.Table, sep: str) -> pa.Table:
    """Recursively flatten struct columns into ``parent<sep>child``
    columns (reference semantics: ``table_slice.hpp:410-427``)."""
    names: List[str] = []
    arrays: List[pa.ChunkedArray] = []

    def visit(name: str, col):
        if pa.types.is_struct(col.type):
            combined = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            for f in col.type:
                visit(f"{name}{sep}{f.name}", pc.struct_field(combined, f.name))
        else:
            names.append(name)
            arrays.append(col)

    for cname in t.column_names:
        visit(cname, t[cname])
    # collision rename `_<idx>` like the reference
    seen: Dict[str, int] = {}
    final = []
    for n in names:
        if n in seen:
            seen[n] += 1
            final.append(f"{n}_{seen[n]}")
        else:
            seen[n] = 0
            final.append(n)
    return pa.table(dict(zip(final, arrays)))


def flatten(ds: Dataset, sep: str = ".") -> Dataset:
    """Flatten nested records into dotted columns (reference: `flatten`,
    ``builtins/operators/flatten.cpp:26-90``)."""
    return ds.map_batches(lambda t: _flatten_table(t, sep), **_PYARROW)


def _unflatten_table(t: pa.Table, sep: str) -> pa.Table:
    """Regroup dotted column names into nested structs (reference:
    `unflatten`, ``table_slice.hpp:399-408``)."""
    tree: Dict = {}
    for name in t.column_names:
        parts = name.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = t[name]

    def build(node):
        if not isinstance(node, dict):
            return node.combine_chunks() if isinstance(node, pa.ChunkedArray) else node
        children = {k: build(v) for k, v in node.items()}
        return pa.StructArray.from_arrays(list(children.values()), names=list(children.keys()))

    return pa.table({k: build(v) for k, v in tree.items()})


def unflatten(ds: Dataset, sep: str = ".") -> Dataset:
    """Inverse of :func:`flatten` (reference: `unflatten`,
    ``builtins/operators/unflatten.cpp:27-80``)."""
    return ds.map_batches(lambda t: _unflatten_table(t, sep), **_PYARROW)


def explode(ds: Dataset, col: str, pos_col: str = None) -> Dataset:
    """Unnest a list column: one output row per list element, scalar
    columns repeated (SQL ``unnest``; no reference analog — the
    reference has no list-to-rows operator, SURVEY §2.5 negative
    space). Rows with NULL or empty lists are dropped, matching SQL
    unnest. Optional ``pos_col`` adds the 0-based element index.

    Fully vectorized and shuffle-free: ``pc.list_parent_indices`` +
    ``take`` per batch — a pure width-to-length reshape that streams."""

    def apply(t: pa.Table) -> pa.Table:
        import numpy as np

        from tenzir_ray.arrowutil import as_array, ranges

        arr = as_array(t[col])
        # counts via list_value_length (null slot -> 0) stay consistent
        # with list_flatten, which skips values under null slots even
        # when the slot's offset range is non-empty; list_parent_indices
        # does NOT skip them, so it must not be used here
        counts = (
            pc.fill_null(pc.list_value_length(arr), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        parents = np.repeat(np.arange(len(counts)), counts)
        flat = pc.list_flatten(arr)
        cols = {
            name: as_array(t[name]).take(pa.array(parents, type=pa.int64()))
            for name in t.column_names
            if name != col
        }
        cols[col] = flat
        if pos_col is not None:
            cols[pos_col] = pa.array(ranges(counts), type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(apply, **_PYARROW)


# ---------------------------------------------------------------------------
# head / tail / taste / limit family
# ---------------------------------------------------------------------------


def head(ds: Dataset, n: int = 10) -> Dataset:
    """First n events; the streaming executor stops upstream work
    (reference: `head`, ``builtins/operators/head.cpp:24-67``)."""
    return ds.limit(n)


def _block_refs_and_counts(ds: Dataset):
    """Materialize and return (arrow block refs in dataset order, per-block
    row counts). Counting happens in small remote tasks against
    object-store-local blocks — nothing is pulled to the driver."""
    mat = ds.materialize()
    refs = mat.to_arrow_refs()

    @ray.remote(num_cpus=0.25)
    def _count(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_count.remote(r) for r in refs])
    return refs, counts


def tail(ds: Dataset, n: int = 10) -> Dataset:
    """Last n events in dataset order (reference: `tail` ring-buffers
    slices, ``builtins/operators/tail.cpp:24-71``). Here: per-block row
    counts → keep only trailing blocks, slice the boundary block —
    blocks before the cutoff are never touched."""
    refs, counts = _block_refs_and_counts(ds)
    total = sum(counts)
    start = max(0, total - n)

    @ray.remote
    def _slice(t: pa.Table, lo: int) -> pa.Table:
        return t.slice(lo)

    keep = []
    offset = 0
    for ref, cnt in zip(refs, counts):
        end = offset + cnt
        if end > start:
            keep.append(_slice.remote(ref, max(0, start - offset)))
        offset = end
    if not keep:
        return ray.data.from_arrow(pa.table({}))
    return ray.data.from_arrow_refs(keep)


def taste(
    ds: Dataset,
    by: Union[str, Sequence[str]],
    n: int = 10,
    order_by: Optional[str] = None,
) -> Dataset:
    """First n events per group — the reference takes n per *schema*
    (`taste`, ``builtins/operators/taste.cpp:24-66``); with a single
    unified schema we generalize to any group key. ``order_by`` makes
    "first" deterministic (sort within group before taking n)."""
    keys = [by] if isinstance(by, str) else list(by)

    def first_n(g: pa.Table) -> pa.Table:
        if order_by is not None:
            g = g.take(pc.sort_indices(g, sort_keys=[(order_by, "ascending")]))
        return g.slice(0, n)

    return ds.groupby(keys).map_groups(first_n, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# unique (consecutive dedup) / enumerate
# ---------------------------------------------------------------------------


def _dedup_consecutive(t: pa.Table) -> pa.Table:
    """Vectorized neighbor compare: row i survives iff it differs from
    row i-1 in any column (null == null counts as equal, matching the
    reference's row compare at ``builtins/operators/unique.cpp:78-88``)."""
    n = t.num_rows
    if n <= 1:
        return t
    all_eq = None
    for name in t.column_names:
        col = t[name].combine_chunks() if isinstance(t[name], pa.ChunkedArray) else t[name]
        a, b = col.slice(1), col.slice(0, n - 1)
        eq = pc.fill_null(pc.equal(a, b), False)
        both_null = pc.and_(pc.is_null(a), pc.is_null(b))
        col_eq = pc.or_(eq, both_null)
        all_eq = col_eq if all_eq is None else pc.and_(all_eq, col_eq)
    keep = pa.chunked_array([pa.array([True]), pc.invert(all_eq)])
    return t.filter(keep)


def unique(ds: Dataset, strict: bool = True) -> Dataset:
    """Remove *consecutive* duplicate events — NOT global dedup
    (reference: `unique`, ``builtins/operators/unique.cpp:18-108``).

    ``strict=True`` also catches duplicates straddling block
    boundaries, WITHOUT serializing: each block dedups in parallel
    against its own rows plus a 1-row slice of the nearest preceding
    non-empty block (row i survives iff it differs from ORIGINAL row
    i-1, so only single-row boundary slices cross tasks — the same
    block-ref machinery as :func:`tail`). ``strict=False`` dedups
    within blocks only. Global exact dedup lives in
    :mod:`tenzir_ray.dedup`."""
    if not strict:
        return ds.map_batches(_dedup_consecutive, **_PYARROW)

    refs, counts = _block_refs_and_counts(ds)

    @ray.remote(num_cpus=0.25)
    def _last_row(t: pa.Table) -> pa.Table:
        return t.slice(max(0, t.num_rows - 1))

    @ray.remote
    def _dedup_with_prev(t: pa.Table, prev_last) -> pa.Table:
        if t.num_rows == 0 or prev_last is None or prev_last.num_rows == 0:
            return _dedup_consecutive(t)
        # prepend the predecessor's ORIGINAL last row as a sentinel;
        # it always survives the neighbor-compare (row 0 is always
        # kept), so slicing it off leaves exactly the surviving rows
        combo = pa.concat_tables([prev_last, t])
        return _dedup_consecutive(combo).slice(1)

    out, prev = [], None
    for ref, cnt in zip(refs, counts):
        out.append(_dedup_with_prev.remote(ref, prev))
        if cnt > 0:
            prev = _last_row.remote(ref)
    if not out:
        return ds
    return ray.data.from_arrow_refs(out)


def enumerate_op(ds: Dataset, field: str = "#") -> Dataset:
    """Prepend a monotone row-ID column in dataset order (reference:
    `enumerate`, ``builtins/operators/enumerate.cpp:31-120``).
    zipWithIndex-style: per-block counts → prefix sums → per-block
    offset add; blocks stay in the object store."""
    refs, counts = _block_refs_and_counts(ds)

    @ray.remote
    def _add_ids(t: pa.Table, start: int) -> pa.Table:
        ids = pa.array(range(start, start + t.num_rows), type=pa.int64())
        return t.add_column(0, field, ids)

    out, offset = [], 0
    for ref, cnt in zip(refs, counts):
        out.append(_add_ids.remote(ref, offset))
        offset += cnt
    if not out:
        return ds
    return ray.data.from_arrow_refs(out)


# ---------------------------------------------------------------------------
# batch / repeat / measure / pass / discard
# ---------------------------------------------------------------------------


def batch_op(ds: Dataset, n: int = 65536) -> Dataset:
    """Rebatch to a desired block size (reference: `batch`,
    ``builtins/operators/batch.cpp:24-88``; default 64 Ki =
    ``defaults.hpp:34``). In Ray Data block shaping is
    ``repartition`` + the next stage's ``batch_size=``. Materializes
    ONCE and sizes the repartition from that execution's row count —
    a bare ``ds.count()`` would run the whole upstream pipeline an
    extra time just to size the blocks."""
    mat = ds.materialize()
    total = mat.count()  # metadata-only on a materialized dataset
    return mat.repartition(max(1, total // n))


def repeat(ds: Dataset, n: int) -> Dataset:
    """Repeat the entire input n times (reference: `repeat` caches its
    input, ``builtins/operators/repeat.cpp:31-85``). Materializes once,
    unions n views — blocks are shared, not copied."""
    mat = ds.materialize()
    if n <= 1:
        return mat
    return mat.union(*[mat for _ in range(n - 1)])


def measure(ds: Dataset) -> Dataset:
    """Replace the stream with its own metrics events (reference:
    `measure`, ``builtins/operators/measure.cpp:24-160``). One row per
    batch: {events}; for full per-stage detail use ``ds.stats()``."""

    def apply(t: pa.Table) -> pa.Table:
        return pa.table({"events": pa.array([t.num_rows], type=pa.int64())})

    return ds.map_batches(apply, **_PYARROW)


def pass_op(ds: Dataset) -> Dataset:
    """Identity (reference: `pass`, ``builtins/operators/pass.cpp``)."""
    return ds


def discard(ds: Dataset) -> None:
    """Consume and drop everything (reference: `discard`,
    ``builtins/operators/discard.cpp``). The blocks are dropped INSIDE
    the cluster tasks (map to empty + materialize the empty result) —
    ``iter_batches`` would pull every block to the driver just to
    throw it away."""
    ds.map_batches(lambda t: t.slice(0, 0), **_PYARROW).materialize()


def unpivot(
    ds: Dataset,
    value_cols: Sequence[str],
    var_col: str = "name",
    value_col: str = "value",
) -> Dataset:
    """Wide→long melt (SQL ``UNPIVOT``; no reference analog): each input
    row emits one row per entry of ``value_cols``, keeping every other
    column as an identifier. Value columns are cast to a common type by
    Arrow's ``concat_tables`` promotion. Shuffle-free and vectorized:
    one slice+concat per batch."""
    value_cols = list(value_cols)

    def apply(t: pa.Table) -> pa.Table:
        id_cols = [c for c in t.column_names if c not in value_cols]
        parts = []
        for vc in value_cols:
            cols = {c: t[c] for c in id_cols}
            cols[var_col] = pa.array([vc] * t.num_rows, type=pa.string())
            cols[value_col] = t[vc]
            parts.append(pa.table(cols))
        return pa.concat_tables(parts, promote_options="permissive")

    return ds.map_batches(apply, **_PYARROW)


def pivot(
    ds: Dataset,
    ids: Sequence[str],
    names: Sequence[str],
    var_col: str = "name",
    value_col: str = "value",
) -> Dataset:
    """Long→wide pivot (inverse of :func:`unpivot`; SQL ``PIVOT``):
    one output row per distinct ``ids`` combination, one column per
    entry of ``names`` holding that name's value (max over duplicates,
    null where absent).

    Distributed shape: each name becomes a masked column
    (``value if name == X else null``) in one vectorized pass, then ONE
    hash-shuffle groupby with N max-aggregations resolves the pivot —
    no per-group Python tasks, so a billion distinct ids costs one
    aggregation shuffle. ``names`` must be the (small, known) column
    universe; pass the distinct values explicitly."""
    from ray.data.aggregate import Max

    ids = list(ids)
    names = list(names)

    def mask_cols(t: pa.Table) -> pa.Table:
        name_arr = t[var_col]
        val = t[value_col]
        if isinstance(val, pa.ChunkedArray):
            val = val.combine_chunks()
        cols = {c: t[c] for c in ids}
        for nm in names:
            m = pc.equal(name_arr, nm)
            if isinstance(m, pa.ChunkedArray):
                m = m.combine_chunks()
            cols[nm] = pc.if_else(m, val, pa.nulls(t.num_rows, type=val.type))
        tbl = pa.table(cols)
        # map-side combine (max of maxes = max): one ids-combination's
        # melted rows usually sit in the SAME block (unpivot emits them
        # adjacent), so a block-local Arrow group_by collapses them
        # before the shuffle — len(names)x fewer bytes through the
        # exchange at zero correctness cost
        agged = tbl.group_by(ids).aggregate([(nm, "max") for nm in names])
        return pa.table(
            {**{c: agged[c] for c in ids},
             **{nm: agged[f"{nm}_max"] for nm in names}}
        )

    masked = ds.map_batches(mask_cols, **_PYARROW)
    return masked.groupby(ids).aggregate(
        *[Max(nm, alias_name=nm) for nm in names]
    )
