"""Pipeline assembly: binlog tail → parse/filter/enrich → merge → sink.

The end-to-end CDC engine (BASELINE.json north star). ``replay`` is
resumable: it reads the latest lake manifest, skips binlog shards at or
below the global applied-through offset, re-filters any re-read events
against per-bucket high-water marks inside the merge combiner, and
commits one manifest per chunk — so a killed job rerun via
``ray job submit`` (or plain ``python -m tenzir_ray.cli replay``)
resumes with zero duplicate or lost applies.

Stage inventory (all Ray Data):

- **tail**: ``read_parquet`` over pending shards in offset order
  (the `file --follow`/kafka-offset analog, see
  :mod:`tenzir_ray.cdc.binlog`);
- **typed parse** (stateless ``map_batches``): cast to the declared
  change-event schema, validate ``op``, stamp ``content_sha256`` (the
  per-row parity invariant) and the ``_bucket`` hash partition;
- **enrich** (stateful ACTOR POOL ``map_batches(Cls, concurrency=N)``):
  fills missing ``lang`` from the path extension with state compiled
  once per actor in ``__init__`` — the `sigma`-style
  loaded-rules-per-worker pattern
  (``plugins/sigma/src/plugin.cpp:36-195``);
- **merge + sink**: :func:`tenzir_ray.cdc.merge.apply_chunk`.
"""

from __future__ import annotations

import hashlib
import re
import time
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data import Dataset

from tenzir_ray.cdc.lake import Lake
from tenzir_ray.cdc.merge import apply_chunk

_VALID_OPS = ("insert", "update", "delete")

# path extension -> language (the enricher's "rule set")
EXT_TO_LANG = {"py": "py", "rs": "rs", "cc": "cpp", "go": "go", "js": "js", "md": "md", "yml": "yaml"}


# canonical home is tenzir_ray.arrowutil; re-exported here because the
# CDC kernels (and tests) historically import it from this module
from tenzir_ray.arrowutil import str_slices as _str_slices  # noqa: E402


def parse_events(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Typed parse: validate op, stamp ``_bucket`` and the 64-bit key
    hash ``_key`` (hashlib C cores digesting straight off the
    Arrow buffers — no Python strings materialize).

    The key hash is the canonical :func:`tenzir_ray.cdc.lake.key_hash64`
    (blake2b-8 over repo||0||path — full 64-bit entropy; collision odds
    ~2^-64 per pair, and the per-bucket FINAL merge compares real
    strings, so a collision could only affect intra-chunk combining,
    never the lake key space).

    ``content_sha256`` (the parity invariant) is NOT computed here:
    only merge WINNERS need it, and winners per chunk are ~50x fewer
    than events — the final merge stamps it (``_FinalMerge``)."""
    op_ok = pc.is_in(batch["op"], value_set=pa.array(_VALID_OPS))
    if not pc.all(op_ok).as_py():
        batch = batch.filter(op_ok)

    n = batch.num_rows
    _b2 = hashlib.blake2b
    _from_bytes = int.from_bytes
    keys = np.empty(n, dtype=np.uint64)
    i = 0
    for r_mv, p_mv in zip(_str_slices(batch["repo"]), _str_slices(batch["path"])):
        h = _b2(digest_size=8)
        h.update(r_mv)
        h.update(b"\x00")
        h.update(p_mv)
        keys[i] = _from_bytes(h.digest(), "little")
        i += 1
    buckets = (keys % np.uint64(num_buckets)).astype(np.int64)
    batch = batch.append_column("_bucket", pa.array(buckets, type=pa.int64()))
    return batch.append_column("_key", pa.array(keys, type=pa.uint64()))


# lz4 for in-flight (shuffle) compression: measured on the bench
# content corpus, lz4 compresses 22x faster than zstd at ~77% of its
# ratio — shuffle bytes are transient, so trade a little size for a
# lot of map/merge CPU (at-rest lake files stay zstd in the sink)
_SHUFFLE_CODEC = "lz4"


def compress_content(batch: pa.Table, col: str = "content") -> pa.Table:
    """Shrink the wide ``content`` column before the merge shuffle:
    per-value compression into a binary column + a raw-length column (the
    frames don't self-describe size for ``pa.Codec``). The final merge
    decompresses WINNERS only (~50x fewer rows than events), so this
    trades a little map-side CPU for most of the shuffle bytes."""
    codec = pa.Codec(_SHUFFLE_CODEC)
    lens, comp = [], []
    for mv in _str_slices(batch[col]):
        if mv is None:
            lens.append(None)
            comp.append(None)
        else:
            lens.append(len(mv))
            comp.append(codec.compress(mv, asbytes=True))
    i = batch.column_names.index(col)
    batch = batch.set_column(i, col, pa.array(comp, type=pa.binary()))
    return batch.append_column("_content_raw_len", pa.array(lens, type=pa.int64()))


def decompress_content(table: pa.Table, col: str = "content") -> pa.Table:
    """Inverse of :func:`compress_content` (no-op if not compressed)."""
    if "_content_raw_len" not in table.column_names or not pa.types.is_binary(
        table[col].type if not isinstance(table[col], pa.ChunkedArray) else table[col].type
    ):
        return table
    codec = pa.Codec(_SHUFFLE_CODEC)
    lens = table["_content_raw_len"].to_pylist()
    out = [
        None if v is None else codec.decompress(v, decompressed_size=n, asbytes=True).decode()
        for v, n in zip(table[col].to_pylist(), lens)
    ]
    i = table.column_names.index(col)
    table = table.set_column(i, col, pa.array(out, type=pa.string()))
    return table.drop_columns(["_content_raw_len"])


def sha256_column(table: pa.Table, content_col: str = "content", out_col: str = "content_sha256") -> pa.Table:
    """Stamp/refresh ``out_col`` = hex sha256 of ``content_col`` (null
    content -> null), digesting from Arrow buffers. Existing non-null
    digests are preserved (lake base rows already carry theirs)."""
    _sha256 = hashlib.sha256
    have = (
        table[out_col].to_pylist() if out_col in table.column_names else [None] * table.num_rows
    )
    out = [
        h if h is not None else (None if mv is None else _sha256(mv).hexdigest())
        for h, mv in zip(have, _str_slices(table[content_col]))
    ]
    arr = pa.array(out, type=pa.string())
    if out_col in table.column_names:
        return table.set_column(table.column_names.index(out_col), out_col, arr)
    return table.append_column(out_col, arr)


class LangEnrich:
    """Stateful enricher: fill null ``lang`` from the path extension.

    The rule table + compiled regex live in ``__init__`` — once per
    actor, not per batch (mirrors the reference's sigma operator
    keeping its compiled rule set in actor state,
    ``plugins/sigma/src/plugin.cpp:44-100``)."""

    def __init__(self, rules: Optional[Dict[str, str]] = None):
        self.rules = dict(EXT_TO_LANG if rules is None else rules)
        self.ext_re = re.compile(r"\.(\w+)$")

    def __call__(self, batch: pa.Table) -> pa.Table:
        lang = batch["lang"]
        null_mask = pc.and_(pc.is_null(lang), pc.not_equal(batch["op"], "delete"))
        need = np.asarray(pc.fill_null(null_mask, False))
        hits = np.flatnonzero(need)
        if not len(hits):
            return batch
        # touch ONLY the rows that need filling
        langs = lang.to_pylist()
        path_col = batch["path"]
        for i in hits:
            p = path_col[int(i)].as_py() or ""
            m = self.ext_re.search(p)
            langs[int(i)] = self.rules.get(m.group(1)) if m else None
        idx = batch.column_names.index("lang")
        return batch.set_column(idx, "lang", pa.array(langs, type=pa.string()))


class CdcTypedStage:
    """The fused typed stage: parse → enrich → combine in ONE actor-pool
    ``map_batches`` pass.

    One stage instead of three means the chunk's bytes cross the object
    store twice total (read → stage, stage → shuffle) instead of four
    times — on a memory-bandwidth-bound pipeline that is the difference
    between the actor stage being the bottleneck and being free.
    Stateful pieces (the enrichment rule table, the HWM vector) load
    once per actor in ``__init__``; per-batch work is the vectorized
    parse/enrich/combine kernels."""

    def __init__(
        self,
        num_buckets: int,
        hwm: Optional[Dict[int, int]] = None,
        applied_through: int = -1,
        rules: Optional[Dict[str, str]] = None,
        enrich: bool = True,
        compress_shuffle: bool = True,
    ):
        from tenzir_ray.cdc.merge import combiner_batch

        self.num_buckets = num_buckets
        self.hwm = {int(k): v for k, v in (hwm or {}).items()}
        self.applied_through = applied_through
        self.enricher = LangEnrich(rules) if enrich else None
        self.compress_shuffle = compress_shuffle
        self._combine = combiner_batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = parse_events(batch, self.num_buckets)
        if self.enricher is not None:
            batch = self.enricher(batch)
        batch = self._combine(batch, self.hwm, self.applied_through)
        if self.compress_shuffle:
            batch = compress_content(batch)
        return batch


def build_chunk_pipeline(
    shard_paths,
    num_buckets: int,
    *,
    enrich: bool = True,
    enrich_concurrency: Optional[int] = None,
    batch_size: int = 131072,
    hwm: Optional[Dict[int, int]] = None,
    applied_through: int = -1,
) -> Dataset:
    """tail(read) → fused typed stage (parse/enrich/combine) for one
    chunk of binlog shards. ``shard_paths`` is a list of parquet paths
    or a pre-built raw-record Dataset (any
    :class:`tenzir_ray.sources.stream.StreamSource`). Output is
    pre-combined: per batch, only the max-``commit_seq`` event per key
    survives, ready for the merge shuffle.

    Pool sizing: ``num_cpus=1`` per actor, pool ≈ half the cluster —
    the reads and the shuffle need the other half; a pool that reserves
    every CPU starves them and the pipeline serializes."""
    ds = shard_paths if isinstance(shard_paths, Dataset) else ray.data.read_parquet(shard_paths)
    # TASK pool, not an actor pool: the stage's state (lang rules, HWM
    # dict) is trivially cheap, so a pickled callable instance rebuilt
    # per task amortizes fine over a 128Ki-row batch — and tasks skip
    # the actor-pool spawn (~2 s at 16 actors) and schedule elastically
    # instead of pinning a fixed pool width. Measured on the 3M-event
    # bench: 32 cpus 14.2 s → 9.7 s, 8 cpus 36.9 s → 31.5 s (A/B,
    # same input, same session conditions). `enrich_concurrency`
    # survives as an optional cap for constrained test environments.
    stage = CdcTypedStage(
        num_buckets=num_buckets, hwm=hwm,
        applied_through=applied_through, enrich=enrich,
    )
    kwargs = {}
    if enrich_concurrency is not None:
        kwargs["concurrency"] = enrich_concurrency
    return ds.map_batches(
        stage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        num_cpus=1,
        **kwargs,
    )


def _chunk_schema(shard_paths: List[str]) -> pa.Schema:
    """Post-parse event schema from parquet FOOTERS only (no data read,
    no pipeline execution): unified shard schema + the columns the
    parse stage appends."""
    import pyarrow.parquet as pq

    from tenzir_ray.schema import unify_schemas

    return unify_schemas([pq.read_schema(p) for p in shard_paths])


def replay(
    binlog_dir,
    lake_root: str,
    *,
    num_buckets: int = 64,
    chunk_shards: int = 8,
    salt_threshold: int = 200_000,
    num_salts: int = 16,
    enrich: bool = True,
    enrich_concurrency: Optional[int] = None,
    stop_after_chunks: Optional[int] = None,
    crash_before_commit_of_chunk: Optional[int] = None,
    prefetch: bool = True,
) -> Dict:
    """Tail the source and apply every pending chunk; resumable.

    ``binlog_dir`` is a binlog directory path or any
    :class:`tenzir_ray.sources.stream.StreamSource` (the pluggable
    kafka-consumer seam) — the exactly-once machinery (offset HWM
    duplicate drop, 2PC manifest) is source-agnostic.

    ``prefetch``: while chunk N merges+commits, chunk N+1's
    read→typed→combine stage runs in a driver thread and pins its
    output. This is SAFE under the WAL contract: chunk N+1's events all
    sit above chunk N's end offset (known a priori from shard
    metadata), so its duplicate-delivery filter can use
    ``applied_through = end(N)`` without waiting for N's commit; if N's
    apply fails, the prefetched result is simply discarded.

    ``stop_after_chunks`` / ``crash_before_commit_of_chunk`` exist for
    the kill/resume tests (FIXTURES.md F5): the former stops cleanly
    after N manifest commits; the latter raises AFTER the chunk's data
    files are staged but BEFORE its manifest commit — the worst-case
    crash window the 2PC design must survive."""
    from concurrent.futures import ThreadPoolExecutor

    from tenzir_ray.sources.stream import BinlogSource, StreamSource

    source: StreamSource = (
        BinlogSource(binlog_dir) if isinstance(binlog_dir, str) else binlog_dir
    )
    lake = Lake.create(lake_root, num_buckets=num_buckets)
    man = lake.latest_manifest()
    if man["num_buckets"] != num_buckets:
        num_buckets = man["num_buckets"]  # bucket count is a lake property

    # sources that expose splittable storage units take the direct
    # push-based exchange (no sort-based groupby; see cdc/exchange.py);
    # in-memory/broker sources keep the Dataset merge path
    use_direct = hasattr(source, "map_units")
    pending = source.pending(man["applied_through"])
    stats = {"chunks": 0, "events": 0, "wall_sec": 0.0}
    chunk_no = 0
    pool = ThreadPoolExecutor(1) if prefetch and not use_direct else None
    next_future = None  # (chunk_index, Future[MaterializedDataset])
    next_phase = None  # (chunk_index, MapPhase) — direct-path prefetch
    # running skew histogram: element-wise max of the last chunks'
    # per-bucket delta counts (sticky, so a salted bucket whose count
    # shrinks BECAUSE of salting stays flagged)
    histogram: Dict[int, int] = {}
    for entry in man["lineage"]:
        for b, c in entry.get("bucket_delta_rows", {}).items():
            histogram[int(b)] = max(histogram.get(int(b), 0), int(c))
    try:
        for i in range(0, len(pending), chunk_shards):
            group = pending[i : i + chunk_shards]
            chunk_no += 1
            if stop_after_chunks is not None and chunk_no > stop_after_chunks:
                break
            chunk_id = f"chunk-{group[0]['min_offset']}-{group[-1]['max_offset']}"
            # UNIQUE binlog offsets, not delivered rows — shard "rows"
            # include duplicate-delivery repeats, which would inflate
            # the events/sec headline
            n_events = group[-1]["max_offset"] - group[0]["min_offset"] + 1
            events_schema = source.schema(group)

            cur = lake.latest_manifest()
            if chunk_id in cur["applied_chunks"]:
                # idempotent skip: apply_chunk would no-op, so do NOT
                # amend the (different, pre-existing) last lineage entry
                # with this chunk's wall time, and do NOT count its
                # events as processed
                if next_future is not None and next_future[0] == i:
                    next_future = None  # discard the stale prefetch
                if next_phase is not None and next_phase[0] == i:
                    next_phase = None
                continue
            if use_direct:
                from tenzir_ray.cdc import exchange as ex

                t0 = time.perf_counter()
                cpus = ex._cluster_cpus()
                hot_now = {b: c for b, c in histogram.items() if c > salt_threshold}
                # ~1 part per CPU: measured 32-cpu A/B (96 units, 3M events):
                # parts=32 -> 1.97 s vs parts=64 -> 2.77 s — fewer shuffle
                # objects and a single reduce wave beat finer parts
                target_parts = max(1, min(num_buckets, cpus))
                if next_phase is not None and next_phase[0] == i:
                    phase = next_phase[1]  # maps already ran during chunk N-1's merge
                    next_phase = None
                else:
                    phase = ex.submit_map_phase(
                        source.map_units(group, 2 * cpus),
                        CdcTypedStage(
                            num_buckets=num_buckets,
                            hwm={int(k): v for k, v in cur["hwm"].items()},
                            applied_through=cur["applied_through"],
                            enrich=enrich,
                        ),
                        ex.plan_parts(num_buckets, list(hot_now), target_parts),
                        num_buckets,
                    )
                # prefetch: submit chunk N+1's map tasks now; they run
                # while chunk N's reduce holds the cluster's attention.
                # Safe under the WAL contract (see docstring): its
                # duplicate filter uses applied_through = end(N).
                if prefetch and i + chunk_shards < len(pending):
                    nxt = pending[i + chunk_shards : i + 2 * chunk_shards]
                    next_phase = (
                        i + chunk_shards,
                        ex.submit_map_phase(
                            source.map_units(nxt, 2 * cpus),
                            CdcTypedStage(
                                num_buckets=num_buckets,
                                hwm=None,
                                applied_through=group[-1]["max_offset"],
                                enrich=enrich,
                            ),
                            ex.plan_parts(num_buckets, list(hot_now), target_parts),
                            num_buckets,
                        ),
                    )
                if crash_before_commit_of_chunk == chunk_no:
                    ex.apply_chunk_direct(
                        lake, phase, chunk_id, group[-1]["max_offset"],
                        events_schema=events_schema, hot=hot_now,
                        num_salts=num_salts, salt_threshold=salt_threshold,
                        commit=False,
                    )
                    raise RuntimeError(f"injected crash before manifest commit of {chunk_id}")
                man = ex.apply_chunk_direct(
                    lake, phase, chunk_id, group[-1]["max_offset"],
                    events_schema=events_schema, hot=hot_now,
                    num_salts=num_salts, salt_threshold=salt_threshold,
                    lineage_extra={"events": n_events},
                )
                for b, c in man["lineage"][-1].get("bucket_delta_rows", {}).items():
                    histogram[int(b)] = max(histogram.get(int(b), 0), int(c))
                wall = time.perf_counter() - t0
                man["lineage"][-1].update(
                    {"wall_sec": round(wall, 3), "events_per_sec": round(n_events / max(wall, 1e-9), 1)}
                )
                lake.commit(man)
                stats["chunks"] += 1
                stats["events"] += n_events
                stats["wall_sec"] += wall
                continue
            t0 = time.perf_counter()
            if next_future is not None and next_future[0] == i:
                events = next_future[1].result()  # prefetched + pinned
                next_future = None
            else:
                events = build_chunk_pipeline(
                    source.dataset(group),
                    num_buckets,
                    enrich=enrich,
                    enrich_concurrency=enrich_concurrency,
                    hwm={int(k): v for k, v in cur["hwm"].items()},
                    applied_through=cur["applied_through"],
                )
            # kick off chunk N+1's read/typed/combine while N merges
            if pool is not None and i + chunk_shards < len(pending):
                nxt = pending[i + chunk_shards : i + 2 * chunk_shards]
                nxt_ds = source.dataset(nxt)  # lazy: built, not executed
                end_of_current = group[-1]["max_offset"]

                def _prefetch(raw=nxt_ds, at=end_of_current):
                    ds = build_chunk_pipeline(
                        raw,
                        num_buckets,
                        enrich=enrich,
                        enrich_concurrency=enrich_concurrency,
                        hwm=None,
                        applied_through=at,
                    )
                    return ds.materialize()

                next_future = (i + chunk_shards, pool.submit(_prefetch))
            if crash_before_commit_of_chunk == chunk_no:
                # stage everything, then die before the commit point
                _stage_without_commit(lake, events, chunk_id, salt_threshold, num_salts)
                raise RuntimeError(f"injected crash before manifest commit of {chunk_id}")
            man = apply_chunk(
                lake,
                events,
                chunk_id,
                chunk_max_offset=group[-1]["max_offset"],
                salt_threshold=salt_threshold,
                num_salts=num_salts,
                hot_buckets=histogram,
                lineage_extra={"events": n_events},
                events_schema=events_schema,
                pre_combined=True,
            )
            for b, c in man["lineage"][-1].get("bucket_delta_rows", {}).items():
                histogram[int(b)] = max(histogram.get(int(b), 0), int(c))
            wall = time.perf_counter() - t0
            man["lineage"][-1].update(
                {"wall_sec": round(wall, 3), "events_per_sec": round(n_events / max(wall, 1e-9), 1)}
            )
            lake.commit(man)  # amend lineage in-place (same version, atomic replace)
            stats["chunks"] += 1
            stats["events"] += n_events
            stats["wall_sec"] += wall
    finally:
        # also on crash-injection / apply failure: don't leak a live
        # prefetch thread driving a Dataset against the cluster
        if pool is not None:
            pool.shutdown(wait=False, cancel_futures=True)
    stats["events_per_sec"] = round(stats["events"] / max(stats["wall_sec"], 1e-9), 1)
    stats["manifest_version"] = lake.latest_manifest()["version"]
    return stats


def _stage_without_commit(lake: Lake, events: Dataset, chunk_id: str, salt_threshold, num_salts):
    """Test hook: run the full apply but skip the manifest commit —
    simulates a crash inside the commit window."""
    from unittest.mock import patch

    with patch.object(Lake, "commit", lambda self, m: None):
        apply_chunk(
            lake,
            events,
            chunk_id,
            chunk_max_offset=-1,
            salt_threshold=salt_threshold,
            num_salts=num_salts,
            pre_combined=True,
        )


def erase(lake_root: str, predicate: str) -> Dict:
    """Retention/eviction by query (the `eraser` analog,
    ``src/eraser.cpp:33-60``): rewrite every bucket dropping rows that
    MATCH the predicate, commit a new manifest version. Buckets whose
    file contains no matches keep their current file untouched."""
    import os

    import pyarrow.parquet as pq

    from tenzir_ray.expr import compile_predicate

    lake = Lake(lake_root)
    man = lake.latest_manifest()
    version = man["version"] + 1
    mask_fn = compile_predicate(predicate)
    files = dict(man["files"])

    from tenzir_ray.cdc.lake import bucket_paths

    @ray.remote
    def rewrite(bucket: str, rels: list):
        from tenzir_ray.cdc.lake import BloomFilter, column_synopses

        # a rebucketed/compacted bucket may span MULTIPLE files
        # (manifest "paths"); the rewrite re-unifies it into one, same
        # as the merge path does
        parts = [pq.read_table(os.path.join(lake_root, rel)) for rel in rels]
        t = parts[0] if len(parts) == 1 else pa.concat_tables(parts)
        drop = pc.fill_null(mask_fn(t), False)
        if not pc.any(drop).as_py():
            return bucket, None, t.num_rows, None, None  # untouched
        kept = t.filter(pc.invert(drop))
        new_rel = f"data/b{int(bucket):05d}-v{version:06d}.parquet"
        new_path = os.path.join(lake_root, new_rel)
        tmp = new_path + f".tmp-{os.getpid()}"
        pq.write_table(kept, tmp, compression="zstd", row_group_size=65_536)
        os.replace(tmp, new_path)
        # synopses refresh: the rewritten file's row set shrank, so the
        # old entry's bloom/min-max would be stale-but-safe; recompute
        # both while the table is in hand
        bloom = BloomFilter.build(set(kept["repo"].to_pylist())).to_json()
        return bucket, new_rel, kept.num_rows, bloom, column_synopses(kept)

    results = ray.get(
        [rewrite.remote(b, bucket_paths(f)) for b, f in files.items()]
    )
    erased = 0
    for bucket, new_rel, rows, bloom, synopses in results:
        if new_rel is not None:
            erased += files[bucket]["rows"] - rows
            files[bucket] = {
                "path": new_rel,
                "rows": rows,
                "bytes": os.path.getsize(os.path.join(lake_root, new_rel)),
                "repo_bloom": bloom,
                "synopses": synopses,
            }
    man = dict(man)
    man.update(
        {
            "version": version,
            "files": files,
            "lineage": man["lineage"] + [{"erase": predicate, "rows_erased": int(erased)}],
        }
    )
    lake.commit(man)
    return man


class _RebucketStage:
    """Map-side kernel for compaction: stamp ``_bucket = key_hash64 %
    new_num_buckets`` and conform to the manifest schema (buckets
    untouched since a schema evolution still hold old-schema files)."""

    def __init__(self, new_num_buckets: int, schema_json: list):
        self.n = new_num_buckets
        self.schema_json = schema_json

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tenzir_ray.cdc.lake import key_hash64
        from tenzir_ray.schema import conform, schema_from_json

        batch = conform(batch, schema_from_json(self.schema_json))
        buckets = np.fromiter(
            (
                key_hash64(r, p) % self.n
                for r, p in zip(_str_slices(batch["repo"]), _str_slices(batch["path"]))
            ),
            dtype=np.int64,
            count=batch.num_rows,
        )
        return batch.append_column("_bucket", pa.array(buckets, type=pa.int64()))


# reference max-partition-size: 4 Mi events per storage partition
# (libtenzir/include/tenzir/defaults.hpp:219) — rebucket rolls a
# bucket to a new file at this row count so no single file (and no
# single later read task) has to swallow a hot bucket whole
_MAX_ROWS_PER_FILE = 4_194_304


@ray.remote
def _rebucket_reduce(new_root: str, version: int, max_rows_per_file: int, *slices: pa.Table) -> pa.Table:
    """Per-part compaction reduce: STREAM the part's map slices into
    per-bucket rolling Parquet writers — one slice in heap at a time,
    so a hot bucket never has to fit one task's memory (VERDICT r3
    item 1; the old shape concatenated the whole bucket). File names
    are deterministic in (bucket, file-seq), so Ray task retries
    rewrite the same bytes — idempotent like the merge sink."""
    import os

    import pyarrow.parquet as pq

    from tenzir_ray.cdc.exchange import _tune_allocator
    from tenzir_ray.cdc.lake import BloomFilter, SynopsisAccumulator

    _tune_allocator()

    writers: Dict[int, dict] = {}  # bucket -> state

    def _open(b: int, schema: pa.Schema, st: dict):
        seq = st["seq"]
        rel = f"data/b{b:05d}-v{version:06d}-p{seq:03d}.parquet"
        final = os.path.join(new_root, rel)
        tmp = final + f".tmp-{os.getpid()}"
        st["writer"] = pq.ParquetWriter(tmp, schema, compression="zstd")
        st["tmp"], st["final"], st["rel"] = tmp, final, rel
        st["file_rows"] = 0

    def _roll(st: dict):
        st["writer"].close()
        os.replace(st["tmp"], st["final"])
        st["files"].append((st["rel"], st["file_rows"], os.path.getsize(st["final"])))
        st["writer"] = None
        st["seq"] += 1

    for sl in slices:
        if sl.num_rows == 0:
            continue
        b_arr = sl["_bucket"].to_numpy(zero_copy_only=False)
        data = sl.drop_columns(["_bucket"])
        # slices arrive bucket-sorted from _map_unit: iterate runs
        bounds = np.concatenate([[0], np.flatnonzero(np.diff(b_arr)) + 1, [len(b_arr)]])
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            b = int(b_arr[lo])
            seg = data.slice(int(lo), int(hi - lo))
            st = writers.setdefault(
                b,
                {
                    "writer": None,
                    "seq": 0,
                    "files": [],
                    "rows": 0,
                    "repos": set(),
                    "syn": SynopsisAccumulator(),
                },
            )
            st["rows"] += seg.num_rows
            st["repos"].update(seg["repo"].to_pylist())
            st["syn"].update(seg)
            while seg.num_rows:
                if st["writer"] is None:
                    _open(b, data.schema, st)
                room = max_rows_per_file - st["file_rows"]
                part = seg.slice(0, min(room, seg.num_rows))
                st["writer"].write_table(part, row_group_size=65_536)
                st["file_rows"] += part.num_rows
                seg = seg.slice(part.num_rows)
                if st["file_rows"] >= max_rows_per_file:
                    _roll(st)
    rows_b, paths_b, nrows_b, bytes_b, bloom_b, syn_b = [], [], [], [], [], []
    for b, st in writers.items():
        if st["writer"] is not None:
            _roll(st)
        import json as _json

        bloom = _json.dumps(BloomFilter.build(st["repos"]).to_json())
        syn = _json.dumps(st["syn"].finish())
        for rel, nr, nb in st["files"]:
            rows_b.append(b)
            paths_b.append(rel)
            nrows_b.append(nr)
            bytes_b.append(nb)
            bloom_b.append(bloom)
            syn_b.append(syn)
    return pa.table(
        {
            "bucket": pa.array(rows_b, type=pa.int64()),
            "path": pa.array(paths_b, type=pa.string()),
            "rows": pa.array(nrows_b, type=pa.int64()),
            "bytes": pa.array(bytes_b, type=pa.int64()),
            "repo_bloom": pa.array(bloom_b, type=pa.string()),
            "synopses": pa.array(syn_b, type=pa.string()),
        }
    )


def rebucket(
    lake_root: str,
    new_root: str,
    new_num_buckets: int,
    max_rows_per_file: int = _MAX_ROWS_PER_FILE,
) -> Dict:
    """Compaction / repartition job (the `tenzir rebuild` analog,
    ``builtins/commands/rebuild.cpp:45-47, 275-283``): rewrite the lake
    under a different bucket count via the SAME push-based exchange the
    replay merge uses (``cdc/exchange.py`` — no sort-based groupby, no
    sample pass, reduce tasks pre-submitted): plan map units over the
    old lake's row groups, stamp new buckets map-side, stream each
    part's slices into rolling per-bucket Parquet writers (≤
    ``max_rows_per_file`` rows per file, the reference's 4Mi
    max-partition-size), commit a fresh manifest carrying over
    applied-chunk state. A hot bucket costs wall time on its part's
    reduce, never memory: one slice is in heap at a time."""
    from tenzir_ray.cdc import exchange as ex

    old = Lake(lake_root)
    man = old.latest_manifest()
    new = Lake.create(new_root, num_buckets=new_num_buckets)
    nman = new.latest_manifest()

    cpus = ex._cluster_cpus()
    units = ex.plan_map_units(old.data_files(), 2 * cpus)
    parts = ex.plan_parts(new_num_buckets, [], max(1, min(new_num_buckets, cpus)))
    phase = ex.submit_map_phase(
        units, _RebucketStage(new_num_buckets, man["schema"]), parts, new_num_buckets
    )
    meta = pa.concat_tables(
        ray.get(
            [
                _rebucket_reduce.remote(new_root, 1, max_rows_per_file, *unit_refs)
                for unit_refs in phase.refs
            ]
        )
    ).to_pandas()
    files: Dict = {}
    for _, r in meta.iterrows():
        entry = files.setdefault(
            str(int(r["bucket"])),
            {"paths": [], "rows": 0, "bytes": 0, "repo_bloom": None},
        )
        entry["paths"].append(r["path"])
        entry["rows"] += int(r["rows"])
        entry["bytes"] += int(r["bytes"])
        import json as _json

        entry["repo_bloom"] = _json.loads(r["repo_bloom"])
        entry["synopses"] = _json.loads(r["synopses"])
    for entry in files.values():
        entry["paths"].sort()
        if len(entry["paths"]) == 1:  # single-file buckets keep the
            entry["path"] = entry["paths"].pop()  # classic "path" form
            del entry["paths"]
    nman.update(
        {
            "version": 1,
            "files": files,
            "hwm": {},  # key-layout changed; global applied_through still guards resume
            "applied_through": man["applied_through"],
            "applied_chunks": man["applied_chunks"],
            "schema": man["schema"],
            "lineage": man["lineage"] + [{"rebucket_from": lake_root, "num_buckets": new_num_buckets}],
        }
    )
    new.commit(nman)
    return nman
