"""CDC edge cases: empty/boundary inputs (FIXTURES.md F6 boundary
batches: empty batch, single row, all-deletes)."""

import shutil

import pyarrow as pa
import pytest

from tenzir_ray.cdc import generate_binlog, oracle, replay
from tenzir_ray.cdc.engine import parse_events, sha256_column
from tenzir_ray.cdc.lake import Lake
from tenzir_ray.cdc.merge import combiner_batch, lww_reduce


def test_tiny_binlog_single_row_shards():
    bl, rt = "/tmp/tzr_edge_bl", "/tmp/tzr_edge_lake"
    shutil.rmtree(bl, ignore_errors=True)
    shutil.rmtree(rt, ignore_errors=True)
    generate_binlog(bl, n_events=3, n_repos=1, paths_per_repo=2, shard_events=1, content_median=64)
    replay(bl, rt, num_buckets=2, chunk_shards=1)
    res = oracle.compare_states(Lake(rt).to_arrow(), oracle.materialize(bl))
    assert res["ok"], res["mismatches"]


def test_replay_empty_pending_is_noop(tmp_path):
    bl, rt = str(tmp_path / "bl"), str(tmp_path / "lake")
    generate_binlog(bl, n_events=100, n_repos=2, paths_per_repo=2, shard_events=50, content_median=64)
    replay(bl, rt, num_buckets=2, chunk_shards=2)
    stats = replay(bl, rt, num_buckets=2, chunk_shards=2)
    assert stats["chunks"] == 0 and stats["events"] == 0


def test_kernels_on_empty_and_single():
    empty = pa.table(
        {
            "offset": pa.array([], type=pa.int64()),
            "commit_seq": pa.array([], type=pa.int64()),
            "op": pa.array([], type=pa.string()),
            "repo": pa.array([], type=pa.string()),
            "path": pa.array([], type=pa.string()),
            "content": pa.array([], type=pa.string()),
        }
    )
    out = parse_events(empty, 4)
    assert out.num_rows == 0 and "_key" in out.column_names
    assert combiner_batch(out, {}, -1).num_rows == 0
    assert lww_reduce(out).num_rows == 0

    one = pa.table(
        {
            "offset": [0],
            "commit_seq": [0],
            "op": ["insert"],
            "repo": ["r"],
            "path": ["p"],
            "content": ["hello"],
        }
    )
    out = combiner_batch(parse_events(one, 4), {}, -1)
    assert out.num_rows == 1


def test_all_deletes_leaves_empty_lake(tmp_path):
    """A key inserted then deleted must vanish; sha of null content is null."""
    import pyarrow.parquet as pq

    bl = str(tmp_path / "bl")
    import os

    os.makedirs(bl)
    t = pa.table(
        {
            "offset": [0, 1],
            "commit_seq": [0, 1],
            "commit": ["c0", "c1"],
            "op": ["insert", "delete"],
            "repo": ["r", "r"],
            "path": ["p", "p"],
            "lang": ["py", None],
            "content": ["x", None],
        }
    )
    pq.write_table(t, f"{bl}/part-00000.parquet")
    import json

    with open(f"{bl}/_binlog_meta.json", "w") as f:
        json.dump(
            {"n_events": 2, "shards": [{"file": "part-00000.parquet", "min_offset": 0, "max_offset": 1, "rows": 2}]},
            f,
        )
    rt = str(tmp_path / "lake")
    replay(bl, rt, num_buckets=2, chunk_shards=1)
    assert Lake(rt).to_arrow().num_rows == 0


def test_sha256_column_preserves_existing():
    t = pa.table({"content": ["a", "b", None], "content_sha256": ["KEEP", None, None]})
    out = sha256_column(t)
    vals = out["content_sha256"].to_pylist()
    import hashlib

    assert vals[0] == "KEEP"
    assert vals[1] == hashlib.sha256(b"b").hexdigest()
    assert vals[2] is None


def test_lake_read_carries_manifest_schema_after_evolution(tmp_path):
    """Buckets untouched after additive evolution keep old-schema files;
    read() must still expose the evolved columns (as nulls) instead of
    inferring the first fragment's narrower schema."""
    import os

    import pyarrow.parquet as pq

    from tenzir_ray.schema import schema_to_json

    root = str(tmp_path / "lake")
    lake = Lake.create(root, num_buckets=2)
    man = lake.latest_manifest()
    old = pa.table({"repo": ["r0"], "path": ["a"], "commit": ["c"], "lang": ["py"],
                    "content": ["x"], "commit_seq": [0],
                    "content_sha256": ["h0"]})
    new = old.append_column("branch", pa.array(["main"]))
    pq.write_table(old, os.path.join(root, "data/b00000-v000001.parquet"))
    pq.write_table(new, os.path.join(root, "data/b00001-v000001.parquet"))
    man.update({
        "version": 1,
        "files": {"0": {"path": "data/b00000-v000001.parquet", "rows": 1, "bytes": 1},
                  "1": {"path": "data/b00001-v000001.parquet", "rows": 1, "bytes": 1}},
        "schema": schema_to_json(new.schema),
    })
    lake.commit(man)

    ds = lake.read()
    assert "branch" in ds.schema().names
    rows = ds.select_columns(["repo", "branch"]).sort("repo").take_all()
    assert [r["branch"] for r in rows] == [None, "main"]


def test_vacuum_reaps_orphan_tmp_files(tmp_path):
    import os

    root = str(tmp_path / "lake")
    lake = Lake.create(root, num_buckets=2)
    man = lake.latest_manifest()
    man["version"] = 2
    lake.commit(man)
    stale = os.path.join(root, "data/b00001-v000001.parquet.tmp-999")
    staged = os.path.join(root, "data/b00001-v000003.parquet.tmp-999")
    open(stale, "w").close()
    open(staged, "w").close()
    removed = lake.vacuum()
    assert "b00001-v000001.parquet.tmp-999" in removed
    assert not os.path.exists(stale)
    assert os.path.exists(staged)  # in-flight staging above current version


def test_replay_skips_already_applied_chunk_without_lineage_damage(tmp_path):
    import json

    bl, rt = str(tmp_path / "bl"), str(tmp_path / "lake")
    generate_binlog(bl, n_events=200, n_repos=2, paths_per_repo=3, shard_events=50,
                    content_median=64)
    replay(bl, rt, num_buckets=2, chunk_shards=2)
    lake = Lake(rt)
    man = lake.latest_manifest()
    before = json.dumps(man["lineage"])
    # force every chunk back into pending while applied_chunks still
    # lists them: the straddle case the idempotence gate must absorb
    man["applied_through"] = -1
    lake.commit(man)
    stats = replay(bl, rt, num_buckets=2, chunk_shards=2)
    assert stats["chunks"] == 0 and stats["events"] == 0
    assert json.dumps(lake.latest_manifest()["lineage"]) == before


def test_compress_out_col_keeps_source_column():
    import ray.data as rd

    from tenzir_ray.ops.bytes import compress_op, decompress_op

    import ray

    ds = rd.from_arrow(pa.table({"text": ["hello", None, "world"]}))
    comp = compress_op(ds, "text", codec="zstd", out_col="z")
    t = pa.concat_tables([ray.get(r) for r in comp.to_arrow_refs()])
    assert set(t.column_names) >= {"text", "z", "z_raw_len"}
    assert t["text"].to_pylist() == ["hello", None, "world"]
    back = decompress_op(rd.from_arrow(t), "z", codec="zstd", out_col="t2")
    t2 = pa.concat_tables([ray.get(r) for r in back.to_arrow_refs()])
    assert [None if v is None else v.decode() for v in t2["t2"].to_pylist()] == [
        "hello", None, "world"]
