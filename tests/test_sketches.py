"""Approximate-sketch aggregations (HLL, Misra-Gries) — beyond the
reference (it has no sketches); these are the 100-TB paths where the
exact set/shuffle becomes the bottleneck."""

import numpy as np
import pyarrow as pa
import ray.data

from tenzir_ray import ops


def _make_ds(values, key=None, blocks=8):
    cols = {"v": values}
    if key is not None:
        cols["k"] = key
    t = pa.table(cols)
    n = len(values)
    step = max(1, n // blocks)
    return ray.data.from_arrow([t.slice(i, step) for i in range(0, n, step)])


def test_hll_int_cardinality():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 20_000, size=60_000)  # ~19k distinct expected
    true = len(np.unique(vals))
    ds = _make_ds(vals.tolist())
    out = ops.summarize(ds, aggs={"acd": ("approx_count_distinct", "v")}).take_all()
    est = out[0]["acd"]
    assert abs(est - true) / true < 0.05, (est, true)


def test_hll_strings_and_exact_small_range():
    # small-range linear counting: low cardinality must be near-exact
    vals = [f"user-{i % 37}" for i in range(5000)]
    ds = _make_ds(vals)
    out = ops.summarize(ds, aggs={"acd": ("approx_count_distinct", "v")}).take_all()
    assert abs(out[0]["acd"] - 37) <= 1


def test_hll_grouped_and_null_safe():
    vals, keys = [], []
    for i in range(4000):
        keys.append("a" if i % 2 else "b")
        vals.append(None if i % 97 == 0 else i % (500 if i % 2 else 50))
    ds = _make_ds(vals, key=keys)
    rows = {
        r["k"]: r["acd"]
        for r in ops.summarize(
            ds, aggs={"acd": ("approx_count_distinct", "v")}, by="k"
        ).take_all()
    }
    # odd i mod 500 -> 250 odd residues; even i mod 50 -> 25 even residues
    assert abs(rows["a"] - 250) / 250 < 0.05
    assert abs(rows["b"] - 25) <= 2


def test_topk_heavy_hitters():
    # skewed corpus: heavy values must surface in order with counts
    # within the Misra-Gries bound n/(k+1)
    vals = ["hot"] * 5000 + ["warm"] * 2000 + ["mild"] * 800
    vals += [f"cold-{i}" for i in range(600)]
    rng = np.random.default_rng(7)
    order = rng.permutation(len(vals))
    vals = [vals[i] for i in order]
    ds = _make_ds(vals, blocks=10)
    out = ops.summarize(ds, aggs={"top": ("approx_top_k", "v")}).take_all()
    top = out[0]["top"]
    n = len(vals)
    bound = n / 33  # k = 32
    got = {v: c for v, c in top}
    assert [v for v, _ in top[:3]] == ["hot", "warm", "mild"]
    for name, true in (("hot", 5000), ("warm", 2000), ("mild", 800)):
        assert true - bound <= got[name] <= true, (name, got[name])


def test_topk_grouped():
    vals = (["x"] * 30 + ["y"] * 10) + (["z"] * 25 + ["w"] * 5)
    keys = ["g1"] * 40 + ["g2"] * 30
    ds = _make_ds(vals, key=keys, blocks=4)
    rows = {
        r["k"]: r["top"]
        for r in ops.summarize(ds, aggs={"top": ("approx_top_k", "v")}, by="k").take_all()
    }
    assert rows["g1"][0] == ["x", 30] and rows["g1"][1] == ["y", 10]
    assert rows["g2"][0] == ["z", 25] and rows["g2"][1] == ["w", 5]


def test_sketches_via_tql():
    from tenzir_ray import tql

    ds = _make_ds([i % 100 for i in range(3000)])
    out = tql.run("summarize acd=approx_count_distinct(v)", ds).take_all()
    assert abs(out[0]["acd"] - 100) <= 2


def test_median_exact_odd_even():
    out = ops.summarize(_make_ds([5.0, 1.0, 3.0]), aggs={"m": ("median", "v")}).take_all()
    assert out[0]["m"] == 3.0
    out = ops.summarize(_make_ds([4.0, 1.0, 3.0, 2.0]), aggs={"m": ("median", "v")}).take_all()
    assert out[0]["m"] == 2.5  # mean of the two middles (DuckDB semantics)


def test_quantile_cont_interpolates():
    import duckdb

    vals = [float(x) for x in (1, 3, 3, 5, 9, 11, 20, 20, 31)]
    for q in (0.25, 0.5, 0.95):
        out = ops.summarize(
            _make_ds(vals, blocks=3), aggs={"p": (f"quantile_cont_{q}", "v")}
        ).take_all()
        want = float(
            duckdb.sql(
                f"SELECT quantile_cont(v::DOUBLE, {q}) FROM (SELECT unnest({vals}) v)"
            ).fetchone()[0]
        )
        assert abs(out[0]["p"] - want) < 1e-9, (q, out[0]["p"], want)


def test_median_grouped_with_nulls():
    vals = [1.0, None, 3.0, 10.0, 20.0, None, 30.0, 40.0]
    keys = ["a", "a", "a", "b", "b", "b", "b", "b"]
    rows = {
        r["k"]: r["m"]
        for r in ops.summarize(
            _make_ds(vals, key=keys, blocks=3), aggs={"m": ("median", "v")}, by="k"
        ).take_all()
    }
    assert rows["a"] == 2.0 and rows["b"] == 25.0


def test_quantile_cardinality_guard(monkeypatch):
    import importlib

    import pytest

    s = importlib.import_module("tenzir_ray.ops.summarize")
    monkeypatch.setattr(s, "_MAX_QUANTILE_DISTINCT", 10)
    with pytest.raises(Exception, match="distinct"):
        ops.summarize(
            _make_ds([float(i) for i in range(100)]), aggs={"m": ("median", "v")}
        ).take_all()


def test_topk_preserves_native_types():
    out = ops.summarize(
        _make_ds([7, 7, 7, 3, 3, 9]), aggs={"top": ("approx_top_k", "v")}
    ).take_all()
    top = out[0]["top"]
    assert top[0] == [7, 3] and top[1] == [3, 2]
    assert isinstance(top[0][0], int)  # int column -> int values, not str


def test_exact_distinct_cardinality_guard(monkeypatch):
    """count_distinct/distinct must raise loudly past the cardinality
    bound (pointing at approx_count_distinct) instead of silently
    growing a worker heap."""
    import importlib

    import pytest

    s = importlib.import_module("tenzir_ray.ops.summarize")
    monkeypatch.setattr(s, "_MAX_EXACT_DISTINCT", 10)
    with pytest.raises(Exception, match="approx_count_distinct"):
        ops.summarize(
            _make_ds(list(range(100))), aggs={"n": ("count_distinct", "v")}
        ).take_all()
    # under the bound: still exact
    out = ops.summarize(
        _make_ds([1, 2, 2, 3]), aggs={"n": ("count_distinct", "v")}
    ).take_all()
    assert out[0]["n"] == 3


def test_topk_rejects_non_json_native_types():
    """approx_top_k's JSON accumulator cannot carry binary values — the
    error must be a clear up-front ValueError, not a TypeError deep in a
    Ray task."""
    import pytest

    ds = ray.data.from_arrow(
        pa.table({"v": pa.array([b"a", b"b", b"a"], type=pa.binary())})
    )
    with pytest.raises(Exception, match="approx_top_k"):
        ops.summarize(ds, aggs={"top": ("approx_top_k", "v")}).take_all()


def test_arg_max_arg_min_basic_and_grouped():
    """arg_max/arg_min: DuckDB arg_max(payload, (order...)) semantics as
    one mergeable accumulator (no per-group map_groups task)."""
    vals = [10.0, 30.0, 20.0, 5.0, 50.0, 40.0]
    order = [1, 3, 2, 9, 8, 7]
    keys = ["a", "a", "a", "b", "b", "b"]
    ds = ray.data.from_arrow(
        [pa.table({"k": keys[i:i+2], "v": vals[i:i+2], "o": order[i:i+2]})
         for i in range(0, 6, 2)]
    )
    from tenzir_ray import ops as _ops
    rows = {
        r["k"]: (r["amax"], r["amin"])
        for r in _ops.summarize(
            ds,
            aggs={"amax": ("arg_max", ["v", "o"]), "amin": ("arg_min", ["v", "o"])},
            by="k",
        ).take_all()
    }
    assert rows["a"] == (30.0, 10.0)   # o=3 -> v=30; o=1 -> v=10
    assert rows["b"] == (5.0, 40.0)    # o=9 -> v=5;  o=7 -> v=40


def test_arg_max_composite_order_and_timestamp_payload():
    import pandas as pd

    ts = pa.array([pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-02"),
                   pd.Timestamp("2024-01-02")]).cast(pa.timestamp("us"))
    t = pa.table({"k": [1, 1, 1], "ts": ts, "tie": [5, 1, 2], "name": ["x", "y", "z"]})
    from tenzir_ray import ops as _ops
    out = _ops.summarize(
        ray.data.from_arrow([t.slice(0, 2), t.slice(2)]),
        aggs={"w": ("arg_max", ["name", "ts", "tie"]),
              "wts": ("arg_max", ["ts", "ts", "tie"])},
        by="k",
    ).take_all()[0]
    # 2024-01-02 ties; tie=2 > tie=1 -> row "z"
    assert out["w"] == "z"
    assert pd.Timestamp(out["wts"]) == pd.Timestamp("2024-01-02")


def test_arg_max_null_order_rows_skipped():
    t = pa.table({"v": [1, 2, 3], "o": pa.array([10, None, 5], type=pa.int64())})
    from tenzir_ray import ops as _ops
    out = _ops.summarize(ray.data.from_arrow(t), aggs={"w": ("arg_max", ["v", "o"])}).take_all()
    assert out[0]["w"] == 1


def test_lww_latest_winners_ties_and_nulls(ray_session):
    """ops.lww_latest: full-row LWW per key across many blocks — greatest
    (order...) tuple wins, later order columns break ties, null order
    values lose to non-null, null keys group together."""
    import numpy as np
    import pandas as pd

    from tenzir_ray.ops import lww_latest

    n = 4000
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 37, n).astype("float64"),
            "ts": rng.integers(0, 500, n),
            "seq": np.arange(n),
            "payload": rng.integers(0, 10**6, n),
        }
    )
    df.loc[df.index % 113 == 0, "k"] = np.nan       # null keys
    df["ts"] = df["ts"].astype("Int64")
    df.loc[df.index % 97 == 0, "ts"] = pd.NA        # null order values
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(17)
    got = (
        lww_latest(ds, key="k", order=["ts", "seq"])
        .to_pandas()
        .sort_values("k", na_position="first")
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values(["ts", "seq"], na_position="first")
        .groupby("k", dropna=False)
        .tail(1)
        .sort_values("k", na_position="first")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) == df["k"].nunique(dropna=False)
    pd.testing.assert_frame_equal(
        got[["k", "seq", "payload"]].astype({"seq": "int64"}),
        exp[["k", "seq", "payload"]].astype({"seq": "int64"}),
    )
