"""Direct hash exchange for the CDC merge — a push-based,
pre-partitioned shuffle over raw Ray tasks.

Why not ``Dataset.groupby("_bucket").map_groups``: Ray Data's groupby
is a SORT-based all-to-all (sample → boundary broadcast → partition →
merge-sort reduce). The CDC merge key is ``_bucket = key_hash %
num_buckets`` — a KNOWN dense integer the typed stage already stamps —
so sampling and sorting buy nothing, and their extra passes + barrier
are the measured ~7 s latency floor of a 3M-event replay at 32 cpus
(BENCH/BASELINE.md round-2 decomposition: 8.7 s wall vs ~54 s task
CPU). This module is the documented "drop to raw Ray tasks where the
Dataset API can't express it" case (brief: custom operators, option c):

- **map phase**: one task per binlog row-group range — read → fused
  typed parse/enrich/combine (:class:`tenzir_ray.cdc.engine.
  CdcTypedStage`, identical kernels to the Dataset path) → split the
  batch into per-part Arrow slices (``num_returns=len(parts)``). Rows
  cross the object store exactly once.
- **reduce phase**: one task per part (a set of buckets). Reduce tasks
  are SUBMITTED before any map task finishes; Ray streams each map
  output slice to its consumer as it materializes, so per-part merges
  start the moment their last input lands — no sort barrier, no
  sample pass, no driver hop for data.
- **hot buckets** (running histogram > salt_threshold) become
  singleton parts whose map slices first pass through ``num_salts``
  parallel partial LWW reductions (LWW per key is associative +
  commutative, so partials over ANY row partition compose exactly —
  same argument as the salted ``groupby([_bucket, _salt])`` path in
  :mod:`tenzir_ray.cdc.merge`).

Scale notes (100 TB shape): driver-side state is O(parts × units)
ObjectRefs — parts is capped at ~2×cluster CPUs (NOT num_buckets: a
part covers a bucket RANGE, so 10^5 buckets still produce a bounded
ref matrix), units at chunk row-group count. Reduce tasks write
per-bucket files with deterministic versioned names (tmp +
``os.replace``) so Ray task retries are idempotent, and only tiny
metadata rows return to the driver. Reference semantics:
``libtenzir`` partition-transformer rebuild/merge behavior
(``src/partition_transformer.cpp``) re-expressed as a two-stage
map/reduce.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import ray

from tenzir_ray.schema import conform, unify_schemas

# -- unit planning -----------------------------------------------------------


def plan_map_units(paths: Sequence[str], target_units: int) -> List[Tuple[str, Optional[List[int]]]]:
    """Split shard files into ``(path, row_group_indices)`` map units,
    aiming for ~``target_units`` units. Footer metadata only — no data
    read on the driver."""
    import pyarrow.parquet as pq

    paths = list(paths)
    if len(paths) >= target_units:
        return [(p, None) for p in paths]
    per_file = max(1, -(-target_units // len(paths)))  # ceil
    units: List[Tuple[str, Optional[List[int]]]] = []
    for p in paths:
        n_rg = pq.ParquetFile(p).metadata.num_row_groups
        if n_rg <= 1 or per_file <= 1:
            units.append((p, None))
            continue
        step = max(1, n_rg // per_file)
        for lo in range(0, n_rg, step):
            units.append((p, list(range(lo, min(lo + step, n_rg)))))
    return units


def plan_parts(num_buckets: int, hot: Sequence[int], target_parts: int) -> List[List[int]]:
    """Partition bucket ids into parts: each hot bucket is a singleton
    part (it gets its own salted pre-reduce + reduce task); cold
    buckets are split into ~``target_parts`` contiguous ranges."""
    hot_set = {b for b in hot if 0 <= b < num_buckets}
    cold = [b for b in range(num_buckets) if b not in hot_set]
    parts: List[List[int]] = [[b] for b in sorted(hot_set)]
    if cold:
        n = max(1, min(len(cold), target_parts))
        parts.extend([list(chunk) for chunk in np.array_split(cold, n) if len(chunk)])
    return parts


# -- remote kernels ----------------------------------------------------------

_ALLOC_TUNED = False


def _tune_allocator() -> None:
    """Once per worker process: stretch jemalloc's dirty-page decay so
    Arrow's alloc/free cycles reuse already-mapped pages instead of
    returning them to the kernel between tasks. Context
    (BENCH/host_ceiling_probes_r03.json): at 32-way concurrency the
    map tasks spend nearly as much time in the KERNEL as in user code
    (page-fault churn from ~130 MB of transient allocations per task)
    — that, not CPU, is the >8-cpu scaling ceiling. The clean quiet
    A/B shows the latch buys a small (~4%) but consistent wall win;
    it does NOT reduce the kernel time itself. Cost: dirty pages stay
    resident up to the decay window (bounded by per-worker peak).
    ``TENZIR_RAY_ALLOC_DECAY_MS=0`` restores the pyarrow default."""
    global _ALLOC_TUNED
    if _ALLOC_TUNED:
        return
    _ALLOC_TUNED = True
    import os

    ms = int(os.environ.get("TENZIR_RAY_ALLOC_DECAY_MS", "600000"))
    if ms > 0:
        try:
            pa.jemalloc_set_decay_ms(ms)
        except (NotImplementedError, OSError):  # non-jemalloc builds
            pass


@ray.remote
def _map_unit(unit, stage, parts_flat: np.ndarray, parts_off: np.ndarray, num_buckets: int):
    """Read one row-group range, run the fused typed stage, return one
    Arrow slice per part (rows grouped by bucket; zero-copy slice
    concat — data is written to the object store once)."""
    import pyarrow.parquet as pq

    _tune_allocator()

    path, rgs = unit
    pf = pq.ParquetFile(path)
    # use_threads=False: this is a num_cpus=1 Ray task — pyarrow's
    # internal pool would silently use every core on the node, busting
    # Ray's CPU accounting (and any honest scaling measurement)
    t = (
        pf.read_row_groups(rgs, use_threads=False)
        if rgs is not None
        else pf.read(use_threads=False)
    )
    out = stage(t)
    b = out["_bucket"].to_numpy(zero_copy_only=False)
    order = np.argsort(b, kind="stable")
    srt = out.take(pa.array(order))
    counts = np.bincount(b, minlength=num_buckets)
    offs = np.concatenate([[0], np.cumsum(counts)])
    n_parts = len(parts_off) - 1
    slices = []
    for p in range(n_parts):
        ids = parts_flat[parts_off[p] : parts_off[p + 1]]
        runs = [srt.slice(int(offs[i]), int(counts[i])) for i in ids if counts[i]]
        if not runs:
            slices.append(srt.slice(0, 0))
        elif len(runs) == 1:
            slices.append(runs[0])
        else:
            slices.append(pa.concat_tables(runs))
    return slices[0] if n_parts == 1 else tuple(slices)


@ray.remote
def _partial_reduce(*slices: pa.Table) -> pa.Table:
    """Salted partial LWW over a subset of one hot part's map slices."""
    from tenzir_ray.cdc.merge import lww_reduce

    parts = [s for s in slices if s.num_rows]
    if not parts:
        return slices[0]
    ms = unify_schemas([p.schema for p in parts])
    t = pa.concat_tables([conform(p, ms) for p in parts]) if len(parts) > 1 else parts[0]
    return lww_reduce(t)


@ray.remote
def _merge_part(merger, *slices: pa.Table) -> pa.Table:
    """Final merge for every bucket present in this part's slices;
    returns the concatenated per-bucket metadata rows (never data)."""
    _tune_allocator()
    tables = [s for s in slices if s.num_rows]
    if not tables:
        return _empty_meta()
    ms = unify_schemas([p.schema for p in tables])
    t = pa.concat_tables([conform(p, ms) for p in tables]) if len(tables) > 1 else tables[0]
    b = t["_bucket"].to_numpy(zero_copy_only=False)
    order = np.argsort(b, kind="stable")
    srt = t.take(pa.array(order))
    sb = b[order]
    bounds = np.concatenate([[0], np.flatnonzero(np.diff(sb)) + 1, [len(sb)]])
    metas = [merger(srt.slice(int(lo), int(hi - lo))) for lo, hi in zip(bounds[:-1], bounds[1:])]
    return pa.concat_tables(metas)


def _empty_meta() -> pa.Table:
    return pa.table(
        {
            "bucket": pa.array([], type=pa.int64()),
            "path": pa.array([], type=pa.string()),
            "rows": pa.array([], type=pa.int64()),
            "bytes": pa.array([], type=pa.int64()),
            "max_offset": pa.array([], type=pa.int64()),
            "delta_rows": pa.array([], type=pa.int64()),
            "repo_bloom": pa.array([], type=pa.string()),
            "synopses": pa.array([], type=pa.string()),
        }
    )


# -- orchestration -----------------------------------------------------------


def _cluster_cpus() -> int:
    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", 8))
    import os

    try:
        return len(os.sched_getaffinity(0))
    except (AttributeError, OSError):
        return os.cpu_count() or 8


class MapPhase:
    """Submitted map tasks for one chunk: ``refs[part][unit]``. Holding
    a MapPhase keeps the slice objects pinned, so chunk N+1's maps can
    run while chunk N merges (the WAL-contract prefetch)."""

    def __init__(self, parts: List[List[int]], refs: List[List[ray.ObjectRef]]):
        self.parts = parts
        self.refs = refs


def submit_map_phase(units, stage, parts: List[List[int]], num_buckets: int) -> MapPhase:
    """Launch one ``_map_unit`` task per unit (async — returns
    immediately with the ref matrix)."""
    parts_flat = np.array([b for ids in parts for b in ids], dtype=np.int64)
    parts_off = np.concatenate([[0], np.cumsum([len(ids) for ids in parts])]).astype(np.int64)
    n_parts = len(parts)
    out = [[] for _ in range(n_parts)]
    for u in units:
        r = _map_unit.options(num_returns=n_parts).remote(
            u, stage, parts_flat, parts_off, num_buckets
        )
        if n_parts == 1:
            out[0].append(r)
        else:
            for p in range(n_parts):
                out[p].append(r[p])
    return MapPhase(parts, out)


def apply_chunk_direct(
    lake,
    phase: MapPhase,
    chunk_id: str,
    chunk_max_offset: int,
    *,
    events_schema: pa.Schema,
    hot: Optional[Dict[int, int]] = None,
    num_salts: int = 16,
    salt_threshold: int = 200_000,
    lineage_extra: Optional[Dict] = None,
    commit: bool = True,
) -> Dict:
    """Reduce + commit for one chunk whose map phase is in flight.
    Mirrors :func:`tenzir_ray.cdc.merge.apply_chunk` exactly-once
    semantics: idempotent on ``chunk_id``, per-bucket staged writes,
    single manifest commit on the driver (skipped when ``commit`` is
    False — the crash-window test hook)."""
    import time as _time

    from tenzir_ray.cdc.lake import bucket_paths
    from tenzir_ray.cdc.merge import _FinalMerge, build_manifest, lake_schema_after
    from tenzir_ray.schema import schema_from_json, schema_to_json

    man = lake.latest_manifest()
    if chunk_id in man["applied_chunks"]:
        return man
    version = man["version"] + 1
    target = lake_schema_after(schema_from_json(man["schema"]), events_schema)
    target_json = schema_to_json(target)

    t0 = _time.perf_counter()
    # salting decision = the running histogram (one-chunk lag). It is
    # applied at PART granularity at APPLY time — partial LWW is
    # per-key, so pre-reducing a mixed-bucket part is exactly as
    # correct as the per-bucket salt, and the decision stays valid for
    # prefetched map phases whose part plan predates this histogram.
    hot_set = {int(b) for b, c in (hot or {}).items() if int(c) > salt_threshold}
    merger_ref = ray.put(
        _FinalMerge(lake.root, {k: bucket_paths(v) for k, v in man["files"].items()}, version, target_json)
    )
    meta_refs = []
    # lineage records only the hot buckets whose containing part ACTUALLY
    # received the salted partial-reduce this chunk (a hot bucket sitting
    # in a single-unit part, or in a part planned before the histogram
    # update, is not salted and must not be claimed as such)
    hot_salted: set = set()
    for part_ids, unit_refs in zip(phase.parts, phase.refs):
        hot_here = hot_set.intersection(part_ids)
        if hot_here and len(unit_refs) > 1:
            groups = [g for g in np.array_split(np.array(unit_refs, dtype=object), num_salts) if len(g)]
            unit_refs = [_partial_reduce.remote(*list(g)) for g in groups]
            hot_salted.update(int(b) for b in hot_here)
        meta_refs.append(_merge_part.remote(merger_ref, *unit_refs))
    hot_salted = sorted(hot_salted)
    meta = pa.concat_tables(ray.get(meta_refs)).to_pandas()
    t_merge = _time.perf_counter() - t0
    if not commit:
        return man

    lineage = {
        "chunk": chunk_id,
        "buckets_touched": int(len(meta)),
        "hot_buckets_salted": hot_salted,
        # hot buckets that were isolated into their own reduce part at
        # plan time (skew handling mechanism #1; salting is #2 and only
        # fires when a part has >1 map-unit slice to pre-reduce)
        "hot_buckets_isolated": sorted(
            int(p[0]) for p in phase.parts if len(p) == 1 and int(p[0]) in hot_set
        ),
        "combine_sec": 0.0,  # fused into the map tasks (overlaps merge)
        "salt_setup_sec": 0.0,
        "merge_sec": round(t_merge, 3),
        **(lineage_extra or {}),
    }
    new_man = build_manifest(
        man, meta, chunk_id, chunk_max_offset, target_json,
        salt_threshold=salt_threshold, lineage=lineage,
    )
    lake.commit(new_man)
    return new_man
