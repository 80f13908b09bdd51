"""Shared zero-copy Arrow buffer helpers.

``str_slices`` is the repo's canonical way to feed string/binary column
bytes into hashlib's C digest cores without materializing Python
strings — the CDC hot path is memory-bandwidth bound and
``to_pylist()`` would copy + decode every byte a second time.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def str_slices(col):
    """Yield one memoryview (or None for null) per row of a
    string/large_string/binary column, straight off the Arrow buffers —
    NO Python str objects are materialized."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    for chunk in chunks:
        bufs = chunk.buffers()
        if pa.types.is_large_string(chunk.type) or pa.types.is_large_binary(chunk.type):
            offs = np.frombuffer(bufs[1], dtype=np.int64, offset=8 * chunk.offset,
                                 count=len(chunk) + 1)
        else:
            offs = np.frombuffer(bufs[1], dtype=np.int32, offset=4 * chunk.offset,
                                 count=len(chunk) + 1)
        data = memoryview(bufs[2])
        if chunk.null_count:
            nulls = np.asarray(chunk.is_null())
            for i in range(len(chunk)):
                yield None if nulls[i] else data[offs[i] : offs[i + 1]]
        else:
            for i in range(len(chunk)):
                yield data[offs[i] : offs[i + 1]]


def list_matrix(col, dtype=np.float64) -> np.ndarray:
    """(n, d) numpy matrix from a FixedSizeList / list / large_list
    column of numbers with uniform row length — reshaped straight off
    the Arrow child buffer (no pandas hop, no per-row Python objects).
    Non-uniform row lengths raise rather than silently mis-reshaping."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_fixed_size_list(arr.type):
        d = arr.type.list_size
    else:
        offsets = np.asarray(arr.offsets)
        lens = np.diff(offsets)
        d = int(lens[0]) if len(lens) else 0
        if not np.all(lens == d):
            raise ValueError("list column rows have non-uniform lengths")
    flat = np.asarray(arr.flatten())
    return flat.reshape(len(arr), d).astype(dtype, copy=False)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mixing constants,
    Steele et al. 2014): full-avalanche uint64 -> uint64. Wrapping
    multiplication is intentional. Canonical copy — dedup and the
    sketch aggregations share it."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def ranges(counts: np.ndarray) -> np.ndarray:
    """Concatenated ``[0..c)`` ranges for each c in ``counts`` — the
    vectorized equivalent of ``np.concatenate([np.arange(c) for c in
    counts])``."""
    total = int(counts.sum())
    out_starts = np.cumsum(counts) - counts  # output offset of each segment
    return np.arange(total, dtype=np.int64) - np.repeat(out_starts, counts)


def as_array(arr) -> "pa.Array":
    """Normalize a Table column (ChunkedArray across pyarrow versions)
    to ONE contiguous Array — shared by explode and the sampling ops."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks() if arr.num_chunks != 1 else arr.chunk(0)
    if isinstance(arr, pa.ChunkedArray):  # older pyarrow: combine returns chunked
        arr = arr.chunk(0) if arr.num_chunks else pa.array([], type=arr.type)
    return arr


def from_arrow_refs_retried(out_refs, attempts: int = 5):
    """``ray.data.from_arrow_refs`` with a short retry.

    Its internal per-ref metadata fetch (``ray::get_table_block_
    metadata_schema``) can fail transiently under heavy host load
    (observed as a rare KeyError deep in Ray when the shared sandbox
    spikes); the refs themselves stay valid, so re-submitting the tiny
    metadata tasks is safe and idempotent."""
    import time

    import ray
    import ray.data

    last = None
    for i in range(attempts):
        try:
            return ray.data.from_arrow_refs(out_refs)
        except (ray.exceptions.RayTaskError, KeyError) as e:  # pragma: no cover - load-dependent
            last = e
            time.sleep(0.5 * (i + 1))
    raise last
