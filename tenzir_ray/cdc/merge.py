"""Hash-partitioned last-writer-wins merge with tombstones + salting.

The wide step of the CDC engine. Shape (SURVEY.md §7.2 step 4):

1. **Map-side combiner** (no shuffle): inside each Arrow batch, keep
   only the max-``commit_seq`` event per ``(repo, path)`` key and drop
   events at or below the high-water mark (duplicate delivery /
   resume re-reads). This collapses hot-key volume before any data
   moves — the partial/final decomposition the reference's
   aggregation functions are built around
   (``include/tenzir/aggregation_function.hpp:23-58``).
2. **Salted pre-reduce** (only for detected hot buckets): rows of
   buckets whose combined size exceeds ``salt_threshold`` get
   ``_salt = commit_seq % num_salts``; a ``groupby([_bucket, _salt])``
   partial LWW spreads the hot bucket over ``num_salts`` tasks, then
   re-coalesces in step 3. LWW-per-key is associative+commutative
   (argmax by commit_seq; tombstones ride along as rows), so the
   salted partials compose exactly.
3. **Per-bucket final merge** (the shuffle): ``groupby("_bucket")``;
   each group task reads its CURRENT lake bucket file, unifies schemas
   (additive evolution: missing -> null), concatenates base + deltas,
   resolves LWW per key, drops delete tombstones, and writes the new
   bucket file to its deterministic versioned name (tmp +
   ``os.replace``). Task retries overwrite identical bytes → safe
   under Ray's retry semantics. Only tiny metadata rows return to the
   driver; the manifest commit (phase 2) happens there.

All group/batch kernels are Arrow-native (``table.take`` on
numpy-computed winner indices) — no full pandas conversion, so
evolved nullable int columns keep their types.

Scale assumption (documented knob): ``num_buckets`` must be sized so
one bucket's lake state fits a worker's heap — at 100 TB that means
O(10^4-10^5) buckets, not 64; bucket count is fixed at lake creation
and changed only by the rebucket compaction job
(:func:`tenzir_ray.cdc.engine.rebucket`).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from ray.data import Dataset

from tenzir_ray.cdc.lake import Lake, bucket_paths
from tenzir_ray.schema import conform, schema_from_json, schema_to_json, unify_schemas

# event-stream bookkeeping columns that do NOT become lake columns
_EVENT_ONLY = ("offset", "op", "_bucket", "_salt", "_key", "_content_raw_len")


def lake_schema_after(prev: pa.Schema, events: pa.Schema) -> pa.Schema:
    """Additive evolution: previous lake schema + any new event columns
    (e.g. F4's ``branch``/``size_bytes``), minus stream bookkeeping.
    A shuffle-compressed in-flight schema (binary ``content`` +
    ``_content_raw_len``) maps back to the logical string type."""
    compressed = any(f.name == "_content_raw_len" for f in events)
    fields = []
    for f in events:
        if f.name in _EVENT_ONLY:
            continue
        if compressed and f.name == "content":
            f = pa.field("content", pa.string())
        fields.append(f)
    return unify_schemas([prev, pa.schema(fields)])


def _lww_winner_positions(t: pa.Table) -> np.ndarray:
    """Positions (ascending) of the max-``commit_seq`` row per
    (repo, path). Only the three key columns leave Arrow; the mask is
    computed with a stable argsort + last-occurrence dedup."""
    cs = t["commit_seq"].to_numpy(zero_copy_only=False)
    order = np.argsort(cs, kind="stable")
    df = pd.DataFrame(
        {
            "repo": t["repo"].to_pandas().to_numpy()[order],
            "path": t["path"].to_pandas().to_numpy()[order],
        }
    )
    winners = order[~df.duplicated(keep="last").to_numpy()]
    winners.sort()
    return winners


def lww_reduce(t: pa.Table) -> pa.Table:
    """Partial LWW: keep the latest event per key; tombstones survive as
    rows (they must: a later delete has to beat an earlier update in a
    later reduction round).

    Fast path: when every row carries the 64-bit ``_key`` hash, the
    winners are found with pure numpy (no string materialization).
    Rows without ``_key`` (lake base rows in the final merge) fall back
    to exact string keys."""
    if t.num_rows <= 1:
        return t
    if "_key" in t.column_names and t["_key"].null_count == 0:
        keys = t["_key"].to_numpy(zero_copy_only=False)
        cs = t["commit_seq"].to_numpy(zero_copy_only=False)
        order = np.lexsort((cs, keys))
        sk = keys[order]
        is_last = np.ones(len(sk), dtype=bool)
        is_last[:-1] = sk[1:] != sk[:-1]
        winners = np.sort(order[is_last])
        return t.take(pa.array(winners))
    return t.take(pa.array(_lww_winner_positions(t)))


def combiner_batch(batch: pa.Table, hwm: Dict[int, int], applied_through: int) -> pa.Table:
    """Stage 1: HWM filter + within-batch LWW combine (stateless
    map_batches task; numpy-only — see :func:`lww_reduce`)."""
    if batch.num_rows == 0:
        return batch
    offsets = batch["offset"].to_numpy(zero_copy_only=False)
    keep = offsets > applied_through
    if hwm:
        buckets = batch["_bucket"].to_numpy(zero_copy_only=False)
        size = (int(buckets.max()) + 1) if len(buckets) else 1
        hwm_arr = np.full(size, -1, dtype=np.int64)
        for b, o in hwm.items():
            if int(b) < size:
                hwm_arr[int(b)] = o
        keep &= offsets > hwm_arr[buckets]
    if not keep.all():
        batch = batch.filter(pa.array(keep))
    return lww_reduce(batch)


class _FinalMerge:
    """Per-bucket final merge + staged write (runs inside
    ``groupby(_bucket).map_groups`` tasks; Arrow in / Arrow out)."""

    def __init__(self, lake_root: str, bucket_files: Dict[str, list], version: int, schema_json: list):
        self.lake_root = lake_root
        self.bucket_files = bucket_files  # str(bucket) -> [relpath, ...]
        self.version = version
        self.schema_json = schema_json

    def __call__(self, delta: pa.Table) -> pa.Table:
        bucket = delta["_bucket"][0].as_py()
        target = schema_from_json(self.schema_json)
        max_offset = int(pc.max(delta["offset"]).as_py())
        delta_rows = delta.num_rows  # feeds the running skew histogram

        # delta-only LWW first, so shuffle-compressed content is only
        # decompressed for the bucket's winners
        delta = lww_reduce(delta)
        from tenzir_ray.cdc.engine import decompress_content

        delta = decompress_content(delta)

        base_rels = self.bucket_files.get(str(bucket))
        if base_rels is not None:
            # single-threaded: runs inside a 1-CPU merge task (pyarrow's
            # default pool would use every core on the node). A bucket
            # may span multiple files after a rebucket/compaction split
            # (lake.bucket_paths) -- the merge re-unifies it into one.
            parts = [
                pq.read_table(os.path.join(self.lake_root, rel), use_threads=False)
                for rel in base_rels
            ]
            base = parts[0] if len(parts) == 1 else pa.concat_tables(parts)
            # base rows join the LWW race with their stored commit_seq;
            # 'base' op marks them live (missing fields -> null = the
            # record-cast rule of cast.hpp)
            base = base.append_column("op", pa.array(["base"] * base.num_rows))
            ms = unify_schemas([delta.schema, base.schema])
            merged = pa.concat_tables([conform(base, ms), conform(delta, ms)])
        else:
            merged = delta

        merged = lww_reduce(merged)
        merged = merged.filter(pc.not_equal(merged["op"], "delete"))
        out = conform(merged, target)
        # the parity invariant is stamped HERE, on merge winners only —
        # ~50x fewer rows than raw events (base rows keep their digest)
        from tenzir_ray.cdc.engine import sha256_column

        out = sha256_column(out)

        rel = f"data/b{bucket:05d}-v{self.version:06d}.parquet"
        final_path = os.path.join(self.lake_root, rel)
        tmp = final_path + f".tmp-{os.getpid()}"
        pq.write_table(out, tmp, compression="zstd", row_group_size=65_536)
        os.replace(tmp, final_path)

        # per-bucket repo Bloom synopsis (catalog-sketch analog) so
        # point reads prune buckets without opening files, plus
        # per-column min/max(+Bloom) synopses so arbitrary-predicate
        # exports prune too (``src/catalog.cpp:88-115`` /
        # ``value_index.hpp`` analog)
        from tenzir_ray.cdc.lake import BloomFilter, column_synopses

        import json as _json

        bloom = BloomFilter.build(set(out["repo"].to_pylist()))
        return pa.table(
            {
                "bucket": pa.array([bucket], type=pa.int64()),
                "path": pa.array([rel]),
                "rows": pa.array([out.num_rows], type=pa.int64()),
                "bytes": pa.array([os.path.getsize(final_path)], type=pa.int64()),
                "max_offset": pa.array([max_offset], type=pa.int64()),
                "delta_rows": pa.array([int(delta_rows)], type=pa.int64()),
                "repo_bloom": pa.array([_json.dumps(bloom.to_json())]),
                "synopses": pa.array([_json.dumps(column_synopses(out))]),
            }
        )


def apply_chunk(
    lake: Lake,
    events: Dataset,
    chunk_id: str,
    chunk_max_offset: int,
    *,
    salt_threshold: int = 200_000,
    num_salts: int = 16,
    hot_buckets: Optional[Dict[int, int]] = None,
    lineage_extra: Optional[Dict] = None,
    events_schema: Optional[pa.Schema] = None,
    pre_combined: bool = False,
) -> Dict:
    """Apply one binlog chunk to the lake; returns the NEW manifest
    (already committed). Idempotent: if ``chunk_id`` is in the applied
    log, this is a no-op returning the current manifest.

    Skew handling is HISTOGRAM-DRIVEN, not probed: ``hot_buckets`` is
    the running per-bucket delta histogram (the engine threads the
    previous chunk's ``bucket_delta_rows`` lineage through — one-chunk
    lag, zero extra passes). Buckets above ``salt_threshold`` take the
    salted pre-reduce path; otherwise the combiner output STREAMS
    straight into the merge shuffle with no materialize barrier.

    Pass ``events_schema`` when known (e.g. derived from parquet
    footers): ``Dataset.schema()`` on a lazy pipeline executes part of
    it just to infer the schema — measurable per-chunk overhead."""
    man = lake.latest_manifest()
    if chunk_id in man["applied_chunks"]:
        return man
    version = man["version"] + 1
    prev_schema = schema_from_json(man["schema"])
    if events_schema is None:
        events_schema = events.schema().base_schema
    target = lake_schema_after(prev_schema, events_schema)
    target_json = schema_to_json(target)

    hwm = {int(k): v for k, v in man["hwm"].items()}
    applied_through = man["applied_through"]

    import time as _time

    t0 = _time.perf_counter()
    # stage 1: combiner — skipped when the engine's fused typed stage
    # (CdcTypedStage) already combined per batch
    if pre_combined:
        combined = events
    else:
        combined = events.map_batches(
            lambda b: combiner_batch(b, hwm, applied_through),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    t_combine = _time.perf_counter() - t0

    # stage 2: salted pre-reduce ONLY for histogram-flagged hot buckets
    t0 = _time.perf_counter()
    hot = {
        int(b): int(c)
        for b, c in (hot_buckets or {}).items()
        if int(c) > salt_threshold
    }
    if hot:
        hot_list = sorted(hot)
        # the salting path references `combined` twice (hot + cold split),
        # so pin it once instead of recomputing the upstream per branch
        combined = combined.materialize()

        def split(batch: pa.Table, want_hot: bool) -> pa.Table:
            mask = np.isin(batch["_bucket"].to_numpy(zero_copy_only=False), hot_list)
            return batch.filter(pa.array(mask if want_hot else ~mask))

        def add_salt(batch: pa.Table) -> pa.Table:
            salt = batch["commit_seq"].to_numpy(zero_copy_only=False) % num_salts
            return batch.append_column("_salt", pa.array(salt, type=pa.int64()))

        hot_reduced = (
            combined.map_batches(lambda t: split(t, True), batch_format="pyarrow")
            .map_batches(add_salt, batch_format="pyarrow")
            .groupby(["_bucket", "_salt"])
            .map_groups(lww_reduce, batch_format="pyarrow")
            .drop_columns(["_salt"])
        )
        cold_ds = combined.map_batches(lambda t: split(t, False), batch_format="pyarrow")
        combined = cold_ds.union(hot_reduced)
    t_salt = _time.perf_counter() - t0

    # stage 3: per-bucket final merge + staged writes (the shuffle)
    t0 = _time.perf_counter()
    merger = _FinalMerge(
        lake.root, {k: bucket_paths(v) for k, v in man["files"].items()}, version, target_json
    )

    def final_merge(t: pa.Table) -> pa.Table:
        return merger(t)

    meta = combined.groupby("_bucket").map_groups(final_merge, batch_format="pyarrow").to_pandas()
    t_merge = _time.perf_counter() - t0

    # phase 2: single manifest commit on the driver
    lineage = {
        "chunk": chunk_id,
        "buckets_touched": int(len(meta)),
        "hot_buckets_salted": sorted(hot) if hot else [],
        "combine_sec": round(t_combine, 3),
        "salt_setup_sec": round(t_salt, 3),
        "merge_sec": round(t_merge, 3),
        **(lineage_extra or {}),
    }
    new_man = build_manifest(
        man, meta, chunk_id, chunk_max_offset, target_json,
        salt_threshold=salt_threshold, lineage=lineage,
    )
    lake.commit(new_man)
    return new_man


def build_manifest(
    man: Dict,
    meta,
    chunk_id: str,
    chunk_max_offset: int,
    target_json: list,
    *,
    salt_threshold: int,
    lineage: Dict,
) -> Dict:
    """Phase-2 manifest assembly shared by the Dataset merge path and
    the direct exchange (:mod:`tenzir_ray.cdc.exchange`): fold the
    per-bucket metadata rows into files/HWMs/histogram and append the
    lineage entry. Pure — the caller commits."""
    files = dict(man["files"])
    new_hwm = dict(man["hwm"])
    # only potentially-hot buckets enter the lineage histogram — at
    # 10^5 buckets a full histogram would bloat every manifest
    hist_floor = max(1, salt_threshold // 4)
    histogram = {}
    import json as _json

    for _, r in meta.iterrows():
        b = str(int(r["bucket"]))
        files[b] = {
            "path": r["path"],
            "rows": int(r["rows"]),
            "bytes": int(r["bytes"]),
            "repo_bloom": _json.loads(r["repo_bloom"]),
            "synopses": _json.loads(r["synopses"]) if "synopses" in r else {},
        }
        new_hwm[b] = max(int(new_hwm.get(b, -1)), int(r["max_offset"]))
        if int(r["delta_rows"]) >= hist_floor:
            histogram[b] = int(r["delta_rows"])
    return {
        "version": man["version"] + 1,
        "num_buckets": man["num_buckets"],
        "files": files,
        "hwm": new_hwm,
        "applied_through": max(man["applied_through"], chunk_max_offset),
        "applied_chunks": man["applied_chunks"] + [chunk_id],
        "schema": target_json,
        "lineage": man["lineage"] + [{**lineage, "bucket_delta_rows": histogram}],
    }
