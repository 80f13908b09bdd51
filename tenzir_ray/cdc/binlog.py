"""Deterministic synthetic binlog/WAL generator + tail metadata.

Implements FIXTURES.md F1/F2: offset-ordered Parquet shards of change
events (insert/update/delete keyed on ``repo+path``) over the
source-code repo table ``(repo, path, commit, lang, content)``.
Everything derives from one integer seed — ``sha256(content)`` is
reproducible everywhere, which is the per-row parity invariant
(BASELINE.json input_hint).

Generator invariants:
- first event for a key is an ``insert``; later events are ~86%
  ``update`` / ~14% ``delete`` (net op mix ≈ 60/30/10 upd/ins/del);
- per-key event order is consistent with ``commit_seq`` (== offset
  order, a WAL property);
- ``repo`` is Zipf-skewed → deliberate hot repos (skew/salting test);
- a configurable fraction of each shard's head repeats the previous
  shard's tail events VERBATIM (same offsets) — duplicate delivery at
  shard boundaries, exercising idempotent apply;
- shards at/after ``evolution_offset`` carry two extra columns
  (``branch:string``, ``size_bytes:int64``) — additive schema
  evolution (F4).

The *tail* is simply: read ``_binlog_meta.json``, pick the shards whose
``max_offset`` exceeds the consumer's high-water mark, stream them in
offset order — the `file --follow` / kafka-offset pattern
(``builtins/connectors/file.cpp:168-177``,
``plugins/kafka/src/configuration.cpp:73-110``).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["py", "rs", "cpp", "go", "js", "md", "yaml"]
_EXT = {"py": "py", "rs": "rs", "cpp": "cc", "go": "go", "js": "js", "md": "md", "yaml": "yml"}

META_NAME = "_binlog_meta.json"


def _make_content(repo: str, path: str, commit: str, length: int) -> str:
    """Deterministic pseudo-code text seeded by (repo, path, commit)."""
    h = hashlib.sha256(f"{repo}:{path}:{commit}".encode()).hexdigest()
    header = f"// {repo}/{path} @ {commit[:12]}\ndef fn_{h[:8]}(x):\n"
    body = (h + "\n    ") * (length // 68 + 1)
    return (header + "    return '" + body)[:length]


def generate_binlog(
    out_dir: str,
    n_events: int,
    n_repos: int = 100,
    paths_per_repo: int = 50,
    seed: int = 42,
    shard_events: int = 100_000,
    dup_fraction: float = 0.01,
    content_median: int = 512,
    zipf_alpha: float = 1.2,
    evolution_offset: Optional[int] = None,
    missing_lang_fraction: float = 0.05,
    codec: str = "zstd",
    row_group_size: int = 32_768,
) -> Dict:
    """Generate the binlog; returns (and writes) the shard metadata.

    Vectorized with numpy except the hashlib digests (C core). Shards
    are written incrementally so memory stays O(shard)."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    # --- key universe + per-event key choice (Zipf skew on repo)
    repo_idx = (rng.zipf(zipf_alpha, n_events).astype(np.int64) - 1) % n_repos
    path_idx = rng.integers(0, paths_per_repo, n_events)
    key_id = repo_idx * paths_per_repo + path_idx

    # first occurrence per key -> insert; later -> update (86%) / delete (14%)
    # (vectorized "first occurrence": np.unique returns first indices)
    first_seen = np.zeros(n_events, dtype=bool)
    _, first_idx = np.unique(key_id, return_index=True)
    first_seen[first_idx] = True
    op_draw = rng.random(n_events)
    op = np.where(first_seen, 0, np.where(op_draw < 0.14, 2, 1))  # 0=ins,1=upd,2=del

    lengths = np.clip(
        rng.lognormal(np.log(content_median), 1.0, n_events), 64, 64 * 1024
    ).astype(np.int64)
    # a fraction of non-delete events arrives with lang missing — the
    # enrichment stage must fill it from the path extension
    lang_missing = rng.random(n_events) < missing_lang_fraction

    shards: List[Dict] = []
    prev_tail: Optional[pa.Table] = None
    n_dup = max(0, int(shard_events * dup_fraction))
    op_names = np.array(["insert", "update", "delete"])

    for p, start in enumerate(range(0, n_events, shard_events)):
        end = min(start + shard_events, n_events)
        idx = np.arange(start, end)
        repos = [f"repo-{i:04d}" for i in repo_idx[idx]]
        d1 = path_idx[idx] % 7
        langs = [LANGS[int(k) % len(LANGS)] for k in key_id[idx]]
        paths = [
            f"src/{a}/file_{b}.{_EXT[lg]}"
            for a, b, lg in zip(d1, path_idx[idx], langs)
        ]
        commits = [hashlib.sha1(f"{seed}:{i}".encode()).hexdigest() for i in idx]
        is_del = op[idx] == 2
        contents = [
            None if dele else _make_content(r, pth, c, int(ln))
            for dele, r, pth, c, ln in zip(is_del, repos, paths, commits, lengths[idx])
        ]
        cols = {
            "offset": pa.array(idx, type=pa.int64()),
            "commit_seq": pa.array(idx, type=pa.int64()),
            "commit": pa.array(commits, type=pa.string()),
            "op": pa.array(op_names[op[idx]], type=pa.string()),
            "repo": pa.array(repos, type=pa.string()),
            "path": pa.array(paths, type=pa.string()),
            "lang": pa.array(
                [None if (d or m) else lg for d, m, lg in zip(is_del, lang_missing[idx], langs)],
                type=pa.string(),
            ),
            "content": pa.array(contents, type=pa.string()),
        }
        evolved = evolution_offset is not None and end > evolution_offset
        if evolved:
            past = idx >= evolution_offset
            cols["branch"] = pa.array(
                [f"branch-{int(k) % 5}" if q else None for k, q in zip(key_id[idx], past)],
                type=pa.string(),
            )
            cols["size_bytes"] = pa.array(
                [int(ln) if (q and not d) else None
                 for ln, q, d in zip(lengths[idx], past, is_del)],
                type=pa.int64(),
            )
        table = pa.table(cols)

        # duplicate delivery: prepend previous shard's tail events verbatim
        write_table = table
        if prev_tail is not None and n_dup > 0:
            dup = prev_tail
            if evolved and dup.schema != table.schema:
                from tenzir_ray.schema import conform

                dup = conform(dup, table.schema)
            write_table = pa.concat_tables([dup, table])
        prev_tail = table.slice(max(0, table.num_rows - n_dup)) if n_dup else None

        fname = f"part-{p:05d}.parquet"
        pq.write_table(
            pq_sanitize(write_table),
            os.path.join(out_dir, fname),
            compression=codec,  # kafka-analog logs commonly use snappy/lz4
            # 32Ki-row groups: the row group is the direct exchange's
            # map-unit granularity (cdc/exchange.py) — finer groups cut
            # wave quantization when units ~ cluster CPUs
            row_group_size=row_group_size,
        )
        shards.append(
            {
                "file": fname,
                "min_offset": int(start),
                "max_offset": int(end - 1),
                "rows": int(write_table.num_rows),
            }
        )

    meta = {
        "n_events": n_events,
        "n_repos": n_repos,
        "paths_per_repo": paths_per_repo,
        "seed": seed,
        "shard_events": shard_events,
        "dup_fraction": dup_fraction,
        "content_median": content_median,
        "zipf_alpha": zipf_alpha,
        "evolution_offset": evolution_offset,
        "missing_lang_fraction": missing_lang_fraction,
        "codec": codec,
        "shards": shards,
    }
    tmp = os.path.join(out_dir, META_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, META_NAME))
    return meta


def pq_sanitize(t: pa.Table) -> pa.Table:
    """Strip pandas-style metadata so downstream schema handling is clean."""
    return t.replace_schema_metadata(None)


def read_binlog_meta(binlog_dir: str) -> Dict:
    with open(os.path.join(binlog_dir, META_NAME)) as f:
        return json.load(f)


def pending_shards(binlog_dir: str, applied_through: int) -> List[Dict]:
    """The tail: shards that may contain events past the consumer's
    high-water mark, in offset order."""
    meta = read_binlog_meta(binlog_dir)
    out = [s for s in meta["shards"] if s["max_offset"] > applied_through]
    return sorted(out, key=lambda s: s["min_offset"])
