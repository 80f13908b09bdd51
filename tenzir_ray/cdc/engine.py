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
import zlib
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data import Dataset

from tenzir_ray.cdc import binlog as bl
from tenzir_ray.cdc.lake import Lake
from tenzir_ray.cdc.merge import apply_chunk

_VALID_OPS = ("insert", "update", "delete")

# path extension -> language (the enricher's "rule set")
EXT_TO_LANG = {"py": "py", "rs": "rs", "cc": "cpp", "go": "go", "js": "js", "md": "md", "yml": "yaml"}


def parse_events(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Typed parse: validate op, stamp content_sha256 + _bucket.

    sha256 has no vectorized Arrow kernel; hashlib's C core does the
    digesting and dominates useful compute here (it IS the parity
    invariant, BASELINE.json). crc32 (also C) computes the bucket."""
    op_ok = pc.is_in(batch["op"], value_set=pa.array(_VALID_OPS))
    if not pc.all(op_ok).as_py():
        batch = batch.filter(op_ok)

    repos = batch["repo"].to_pylist()
    paths = batch["path"].to_pylist()
    sha = [
        None if c is None else hashlib.sha256(c.encode()).hexdigest()
        for c in batch["content"].to_pylist()
    ]
    buckets = np.fromiter(
        (zlib.crc32(f"{r}\x00{p}".encode()) % num_buckets for r, p in zip(repos, paths)),
        dtype=np.int64,
        count=len(repos),
    )
    batch = batch.append_column("content_sha256", pa.array(sha, type=pa.string()))
    return batch.append_column("_bucket", pa.array(buckets, type=pa.int64()))


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
        if not pc.any(null_mask).as_py():
            return batch
        langs = lang.to_pylist()
        need = null_mask.to_pylist() if not isinstance(null_mask, pa.ChunkedArray) else null_mask.combine_chunks().to_pylist()
        paths = batch["path"].to_pylist()
        for i, (n, p) in enumerate(zip(need, paths)):
            if n:
                m = self.ext_re.search(p or "")
                langs[i] = self.rules.get(m.group(1)) if m else None
        idx = batch.column_names.index("lang")
        return batch.set_column(idx, "lang", pa.array(langs, type=pa.string()))


def build_chunk_pipeline(
    shard_paths: List[str],
    num_buckets: int,
    *,
    enrich: bool = True,
    enrich_concurrency: Optional[int] = None,
    batch_size: int = 8192,
) -> Dataset:
    """tail(read) → parse → enrich for one chunk of binlog shards.

    The enrich actor pool is sized to a FRACTION of the cluster
    (``num_cpus=0.5`` per actor, pool ≈ CPU/4) so it never starves the
    read/parse/merge stages — an actor pool that reserves every CPU
    deadlocks the streaming executor."""
    import ray as _ray

    ds = ray.data.read_parquet(shard_paths)
    ds = ds.map_batches(
        lambda b: parse_events(b, num_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    if enrich:
        if enrich_concurrency is None:
            total_cpus = int(_ray.cluster_resources().get("CPU", 4))
            enrich_concurrency = max(1, total_cpus // 4)
        ds = ds.map_batches(
            LangEnrich,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=enrich_concurrency,
            num_cpus=0.5,
        )
    return ds


def replay(
    binlog_dir: str,
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
) -> Dict:
    """Tail the binlog and apply every pending chunk; resumable.

    ``stop_after_chunks`` / ``crash_before_commit_of_chunk`` exist for
    the kill/resume tests (FIXTURES.md F5): the former stops cleanly
    after N manifest commits; the latter raises AFTER the chunk's data
    files are staged but BEFORE its manifest commit — the worst-case
    crash window the 2PC design must survive."""
    lake = Lake.create(lake_root, num_buckets=num_buckets)
    man = lake.latest_manifest()
    if man["num_buckets"] != num_buckets:
        num_buckets = man["num_buckets"]  # bucket count is a lake property

    pending = bl.pending_shards(binlog_dir, man["applied_through"])
    stats = {"chunks": 0, "events": 0, "wall_sec": 0.0}
    chunk_no = 0
    for i in range(0, len(pending), chunk_shards):
        group = pending[i : i + chunk_shards]
        chunk_no += 1
        if stop_after_chunks is not None and chunk_no > stop_after_chunks:
            break
        chunk_id = f"chunk-{group[0]['min_offset']}-{group[-1]['max_offset']}"
        shard_paths = [f"{binlog_dir}/{s['file']}" for s in group]
        n_events = sum(s["rows"] for s in group)

        t0 = time.perf_counter()
        events = build_chunk_pipeline(
            shard_paths, num_buckets, enrich=enrich, enrich_concurrency=enrich_concurrency
        )
        if crash_before_commit_of_chunk == chunk_no:
            # stage everything, then die before the commit point
            _stage_without_commit(lake, events, chunk_id, salt_threshold, num_salts)
            raise RuntimeError(f"injected crash before manifest commit of {chunk_id}")
        wall0 = time.perf_counter() - t0
        man = apply_chunk(
            lake,
            events,
            chunk_id,
            chunk_max_offset=group[-1]["max_offset"],
            salt_threshold=salt_threshold,
            num_salts=num_salts,
            lineage_extra={"events": n_events},
        )
        wall = time.perf_counter() - t0
        man["lineage"][-1].update(
            {"wall_sec": round(wall, 3), "events_per_sec": round(n_events / max(wall, 1e-9), 1)}
        )
        lake.commit(man)  # amend lineage in-place (same version, atomic replace)
        stats["chunks"] += 1
        stats["events"] += n_events
        stats["wall_sec"] += wall
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
        )


def rebucket(lake_root: str, new_root: str, new_num_buckets: int) -> Dict:
    """Compaction / repartition job (the `tenzir rebuild` analog,
    ``builtins/commands/rebuild.cpp:45-47, 275-283``): rewrite the lake
    under a different bucket count — read current lake, re-hash keys,
    write per-bucket files, commit a fresh manifest carrying over HWMs."""
    import os

    import pyarrow.parquet as pq

    old = Lake(lake_root)
    man = old.latest_manifest()
    new = Lake.create(new_root, num_buckets=new_num_buckets)
    nman = new.latest_manifest()

    ds = old.read()

    def assign(batch: pa.Table) -> pa.Table:
        buckets = np.fromiter(
            (
                zlib.crc32(f"{r}\x00{p}".encode()) % new_num_buckets
                for r, p in zip(batch["repo"].to_pylist(), batch["path"].to_pylist())
            ),
            dtype=np.int64,
            count=batch.num_rows,
        )
        return batch.append_column("_bucket", pa.array(buckets, type=pa.int64()))

    def write_bucket(t: pa.Table) -> pa.Table:
        b = t["_bucket"][0].as_py()
        rel = f"data/b{b:05d}-v000001.parquet"
        final = os.path.join(new_root, rel)
        out = t.drop_columns(["_bucket"])
        tmp = final + f".tmp-{os.getpid()}"
        pq.write_table(out, tmp, compression="zstd", row_group_size=65_536)
        os.replace(tmp, final)
        return pa.table(
            {
                "bucket": pa.array([b], type=pa.int64()),
                "path": pa.array([rel]),
                "rows": pa.array([out.num_rows], type=pa.int64()),
                "bytes": pa.array([os.path.getsize(final)], type=pa.int64()),
            }
        )

    meta = (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(write_bucket, batch_format="pyarrow")
        .to_pandas()
    )
    files = {
        str(int(r["bucket"])): {"path": r["path"], "rows": int(r["rows"]), "bytes": int(r["bytes"])}
        for _, r in meta.iterrows()
    }
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
