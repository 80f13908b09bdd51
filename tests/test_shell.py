"""`shell` operator tests (reference: builtins/operators/shell.cpp)."""

import pyarrow as pa
import ray.data

from tenzir_ray.ops.shell import shell_bytes, shell_op, shell_source


def test_shell_op_transform(ray_session):
    ds = ray.data.from_arrow(pa.table({"text": [f"line {i}" for i in range(20)]}))
    out = shell_op(ds, "tr a-z A-Z", concurrency=1).to_pandas()
    assert sorted(out["text"]) == sorted(f"LINE {i}" for i in range(20))


def test_shell_op_grep_filter(ray_session):
    ds = ray.data.from_arrow(pa.table({"text": [f"row {i}" for i in range(10)]}))
    out = shell_op(ds, "grep '7'", concurrency=1).to_pandas()
    assert list(out["text"]) == ["row 7"]
    # no matches: grep exits 1, which is NOT an error
    none = shell_op(ds, "grep 'zzz'", concurrency=1).to_pandas()
    assert len(none) == 0


def test_shell_op_failure_raises(ray_session):
    import pytest

    ds = ray.data.from_arrow(pa.table({"text": ["x"]}))
    with pytest.raises(Exception, match="shell command failed|RayTaskError"):
        shell_op(ds, "exit 3", concurrency=1).materialize()


def test_shell_source(ray_session):
    out = shell_source("printf 'a\\nb\\nc\\n'").to_pandas()
    assert list(out["text"]) == ["a", "b", "c"]


def test_shell_bytes_per_row(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"content": pa.array([b"abc", b"def", None], type=pa.binary())})
    )
    out = shell_bytes(ds, "tr a-z A-Z", concurrency=1).to_pandas()
    got = [None if v is None else bytes(v) for v in out["content"]]
    assert sorted(x for x in got if x) == [b"ABC", b"DEF"] and None in got


def test_shell_bytes_failure_raises(ray_session):
    import pytest

    ds = ray.data.from_arrow(pa.table({"content": pa.array([b"x"], type=pa.binary())}))
    with pytest.raises(Exception, match="shell command failed|RayTaskError"):
        shell_bytes(ds, "no_such_binary_xyz", concurrency=1).materialize()


def test_shell_bytes_allow_failure_nulls(ray_session):
    ds = ray.data.from_arrow(pa.table({"content": pa.array([b"x"], type=pa.binary())}))
    out = shell_bytes(ds, "no_such_binary_xyz", concurrency=1, allow_failure=True).to_pandas()
    assert list(out["content"]) == [None]
