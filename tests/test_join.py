"""Broadcast lookup join + as-of join vs DuckDB ground truth."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data

from tenzir_ray.ops.join import asof_join, lookup_join


def test_lookup_join_matches_duckdb(ray_session):
    ltab = pa.table({"k": [1, 2, 3, 4, 2, 9], "v": list("abcdef")})
    dim = pa.table({"k": [1, 2, 3, 5], "name": ["one", "two", "three", "five"]})
    got = (
        lookup_join(ray.data.from_arrow(ltab).repartition(3), dim, keys="k")
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    exp = duckdb.sql(
        "SELECT l.k, l.v, d.name FROM ltab l LEFT JOIN dim d USING (k) ORDER BY k, v"
    ).df()
    assert got[["k", "v", "name"]].equals(exp)


def test_lookup_join_inner_and_renamed_keys(ray_session):
    ltab = pa.table({"custkey": [1, 2, 3], "x": [10, 20, 30]})
    dim = pa.table({"c_custkey": [2, 3], "seg": ["A", "B"]})
    got = (
        lookup_join(ray.data.from_arrow(ltab), dim, keys="custkey",
                    right_keys="c_custkey", how="inner")
        .to_pandas().sort_values("custkey").reset_index(drop=True)
    )
    assert got["custkey"].tolist() == [2, 3] and got["seg"].tolist() == ["A", "B"]


def test_asof_join_matches_duckdb(ray_session):
    ltab = pa.table(
        {
            "id": list(range(8)),
            "g": [1, 1, 1, 2, 2, 2, 3, 1],
            "t": [5, 15, 25, 10, 20, 3, 7, 100],
        }
    )
    rtab = pa.table(
        {"g": [1, 1, 2, 2], "t": [10, 20, 5, 15], "price": [1.0, 2.0, 3.0, 4.0]}
    )
    got = (
        asof_join(ray.data.from_arrow(ltab).repartition(2), rtab, on="t", by="g")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    exp = duckdb.sql(
        """
        SELECT l.id, l.g, l.t, r.price
        FROM ltab l ASOF LEFT JOIN rtab r ON l.g = r.g AND l.t >= r.t
        ORDER BY id
        """
    ).df()
    pd.testing.assert_series_equal(got["price"], exp["price"], check_names=False)


def test_asof_join_directions(ray_session):
    ltab = pa.table({"t": [5, 12, 30]})
    rtab = pa.table({"t": [10, 20], "v": ["a", "b"]})
    back = asof_join(ray.data.from_arrow(ltab), rtab, on="t").to_pandas().sort_values("t")
    assert [None if pd.isna(v) else v for v in back["v"]] == [None, "a", "b"]
    fwd = asof_join(
        ray.data.from_arrow(ltab), rtab, on="t", direction="forward"
    ).to_pandas().sort_values("t")
    assert [None if pd.isna(v) else v for v in fwd["v"]] == ["a", "b", None]


def test_lookup_join_rejects_right_preserving(ray_session):
    # ADVICE r2: right-preserving join types are wrong per batch
    import pytest

    ltab = pa.table({"k": [1, 2]})
    dim = pa.table({"k": [1], "v": ["a"]})
    for how in ("right outer", "full outer", "right semi", "right anti"):
        with pytest.raises(ValueError, match="left-preserving"):
            lookup_join(ray.data.from_arrow(ltab), dim, keys="k", how=how)
