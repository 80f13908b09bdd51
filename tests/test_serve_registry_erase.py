"""Tests: serve pager, registry/show, lake erase retention."""

import pyarrow as pa
import pytest
import ray.data

from tenzir_ray import registry, serve, tql


def test_serve_paging():
    ds = ray.data.from_arrow(pa.table({"i": list(range(150))}))
    pager = serve.serve(ds, page_size=64)
    pages = [p for p in pager]
    assert [len(p) for p in pages] == [64, 64, 22]
    assert pages[0][0]["i"] == 0 and pages[2][-1]["i"] == 149
    # token resume
    out = pager.page("128")
    assert len(out["events"]) == 22 and out["next_token"] is None
    assert pager.page("999")["events"] == []


def test_show_aspects():
    ops = registry.show("operators").to_pandas()["name"].tolist()
    assert "summarize" in ops and "where" in ops and "sigma" in ops
    ver = registry.show("version").to_pandas()["name"].tolist()
    assert len(ver) == 1
    with pytest.raises(ValueError, match="unknown aspect"):
        registry.show("nope")


def test_registry_custom_operator_in_tql():
    @registry.register_operator("double_x")
    def double_x(ds, rest):
        from tenzir_ray import ops

        return ops.replace(ds, {"x": "x * 2"})

    ds = ray.data.from_arrow(pa.table({"x": [1, 2, 3]}))
    out = tql.run("double_x | where x >= 4", ds)
    assert sorted(r["x"] for r in out.to_pandas().to_dict("records")) == [4, 6]
    registry.OPERATORS.pop("double_x")


def test_erase_retention(tmp_path):
    import shutil

    from tenzir_ray.cdc import generate_binlog, replay
    from tenzir_ray.cdc.engine import erase
    from tenzir_ray.cdc.lake import Lake

    bl, rt = str(tmp_path / "bl"), str(tmp_path / "lake")
    generate_binlog(bl, n_events=2000, n_repos=10, paths_per_repo=10, shard_events=1000, content_median=96)
    replay(bl, rt, num_buckets=4, chunk_shards=2)
    lake = Lake(rt)
    before = lake.to_arrow()
    victim = before["repo"][0].as_py()
    n_victim = len([r for r in before["repo"].to_pylist() if r == victim])
    man = erase(rt, f'repo == "{victim}"')
    assert man["lineage"][-1]["rows_erased"] == n_victim
    after = lake.to_arrow()
    assert after.num_rows == before.num_rows - n_victim
    assert victim not in set(after["repo"].to_pylist())
