"""Operator library unit tests on tiny deterministic tables
(reference analog: libtenzir/test/table_slice.cpp + golden dirs under
tenzir/integration/reference/)."""

import hashlib

import pyarrow as pa
import ray.data

from tenzir_ray import ops


def make_ds():
    t = pa.table(
        {
            "x": [5, 1, 3, 2, 4],
            "s": ["e", "a", "c", "b", "d"],
            "f": [0.5, 0.1, 0.3, 0.2, 0.4],
        }
    )
    return ray.data.from_arrow(t)


def rows(ds):
    return ds.to_pandas().to_dict("records")


def test_where():
    out = ops.where(make_ds(), "x >= 3")
    assert sorted(r["x"] for r in rows(out)) == [3, 4, 5]


def test_select_drop_rename():
    assert set(ops.select(make_ds(), ["x"]).schema().names) == {"x"}
    assert set(ops.drop(make_ds(), ["s"]).schema().names) == {"x", "f"}
    out = ops.rename(make_ds(), {"renamed": "x"})
    assert "renamed" in out.schema().names and "x" not in out.schema().names


def test_put_extend_replace():
    out = ops.put(make_ds(), {"double_x": "x * 2", "tag": '"k"'})
    r = rows(out)
    assert set(r[0]) == {"double_x", "tag"}
    assert sorted(x["double_x"] for x in r) == [2, 4, 6, 8, 10]

    out = ops.extend(make_ds(), {"y": "x + 1", "x": "x * 100"})  # x conflict -> skipped
    r = sorted(rows(out), key=lambda r: r["x"])
    assert [x["y"] for x in r] == [2, 3, 4, 5, 6]

    out = ops.replace(make_ds(), {"x": "x * 10"})
    assert sorted(x["x"] for x in rows(out)) == [10, 20, 30, 40, 50]


def test_hash_op():
    out = ops.hash_op(make_ds(), "s")
    r = {x["s"]: x["s_hash"] for x in rows(out)}
    assert r["a"] == hashlib.sha256(b"a").hexdigest()


def test_flatten_unflatten():
    t = pa.table(
        {
            "a": pa.array([{"b": 1, "c": {"d": "x"}}, {"b": 2, "c": {"d": "y"}}]),
            "top": [10, 20],
        }
    )
    ds = ray.data.from_arrow(t)
    flat = ops.flatten(ds)
    assert set(flat.schema().names) == {"a.b", "a.c.d", "top"}
    back = ops.unflatten(flat)
    assert set(back.schema().names) == {"a", "top"}
    r = sorted(rows(back), key=lambda r: r["top"])
    assert r[0]["a"] == {"b": 1, "c": {"d": "x"}}


def test_head_tail():
    ds = ray.data.from_arrow(pa.table({"i": list(range(100))})).repartition(7)
    assert ops.head(ds, 5).count() == 5
    tl = sorted(r["i"] for r in rows(ops.tail(ds, 5)))
    assert tl == [95, 96, 97, 98, 99]


def test_taste():
    t = pa.table({"g": ["a"] * 5 + ["b"] * 3, "v": list(range(8))})
    out = ops.taste(ray.data.from_arrow(t), "g", n=2)
    counts = {}
    for r in rows(out):
        counts[r["g"]] = counts.get(r["g"], 0) + 1
    assert counts == {"a": 2, "b": 2}


def test_unique_consecutive():
    import ray

    t = pa.table({"v": [1, 1, 2, 2, 2, 1, None, None, 3]})
    out = ops.unique(ray.data.from_arrow(t).repartition(3), strict=True)
    tbl = pa.concat_tables(ray.get(out.to_arrow_refs()))
    assert tbl["v"].to_pylist() == [1, 2, 1, None, 3]


def test_enumerate():
    ds = ray.data.from_arrow(pa.table({"v": list("abcde")})).repartition(2)
    out = ops.enumerate_op(ds, field="id")
    ids = sorted(r["id"] for r in rows(out))
    assert ids == [0, 1, 2, 3, 4]


def test_repeat_measure_pass_discard():
    ds = make_ds()
    assert ops.repeat(ds, 3).count() == 15
    assert sum(r["events"] for r in rows(ops.measure(ds))) == 5
    assert ops.pass_op(ds) is ds
    ops.discard(ds)  # just consumes


def test_sort_top_rare():
    out = ops.sort(make_ds(), "x", descending=True)
    assert [r["x"] for r in rows(out)] == [5, 4, 3, 2, 1]
    t = pa.table({"k": ["a", "b", "a", "c", "a", "b"]})
    ds = ray.data.from_arrow(t)
    top = rows(ops.top(ds, "k", k=2))
    assert [(r["k"], r["count"]) for r in top] == [("a", 3), ("b", 2)]
    rare = rows(ops.rare(ds, "k", k=1))
    assert [(r["k"], r["count"]) for r in rare] == [("c", 1)]


def test_summarize():
    t = pa.table(
        {
            "g": ["a", "a", "b", "b", "b"],
            "v": [1, 2, 3, None, 5],
            "flag": [True, False, None, False, False],
        }
    )
    ds = ray.data.from_arrow(t)
    out = ops.summarize(
        ds,
        aggs={
            "n": ("count", None),
            "n_v": ("count", "v"),
            "sum_v": ("sum", "v"),
            "min_v": ("min", "v"),
            "max_v": ("max", "v"),
            "any_f": ("any", "flag"),
            "all_f": ("all", "flag"),
            "dv": ("distinct", "v"),
            "cd": ("count_distinct", "v"),
            "first_v": ("sample", "v"),
        },
        by="g",
    )
    r = {x["g"]: x for x in rows(out)}
    assert r["a"]["n"] == 2 and r["b"]["n"] == 3
    assert r["a"]["n_v"] == 2 and r["b"]["n_v"] == 2
    assert r["a"]["sum_v"] == 3 and r["b"]["sum_v"] == 8
    assert r["b"]["min_v"] == 3 and r["b"]["max_v"] == 5
    assert r["a"]["any_f"] == True and r["a"]["all_f"] == False  # noqa: E712
    assert r["b"]["any_f"] == False and r["b"]["all_f"] == False  # noqa: E712
    assert list(r["b"]["dv"]) == [3, 5] and r["b"]["cd"] == 2
    assert r["a"]["first_v"] in (1, 2)


def test_summarize_resolution():
    import datetime as dt

    ts = [dt.datetime(2024, 1, 1, h, m) for h, m in [(1, 5), (1, 55), (2, 10)]]
    t = pa.table({"ts": pa.array(ts, type=pa.timestamp("us")), "v": [1, 2, 3]})
    out = ops.summarize(
        ray.data.from_arrow(t),
        aggs={"sum_v": ("sum", "v")},
        by="ts",
        resolution={"ts": "1h"},
    )
    r = sorted(rows(out), key=lambda x: x["ts"])
    assert len(r) == 2 and r[0]["sum_v"] == 3 and r[1]["sum_v"] == 3


def test_feather_roundtrip(tmp_path):
    from tenzir_ray.sources import read_feather, write_feather

    ds = make_ds()
    out_dir = str(tmp_path / "feather_out")
    write_feather(ds, out_dir)
    back = read_feather(out_dir)
    assert sorted(r["x"] for r in rows(back)) == [1, 2, 3, 4, 5]


def test_where_concepts_and_missing_field():
    t = pa.table({"src_ip": ["10.0.0.1", "8.8.8.8"], "v": [1, 2]})
    ds = ray.data.from_arrow(t)
    # concept "source" resolves to [src_ip, orig_h]; orig_h missing -> null contribution
    out = ops.where(ds, 'source == "8.8.8.8"', concepts={"source": ["src_ip", "orig_h"]})
    assert [r["v"] for r in rows(out)] == [2]


def test_sessionize_and_tumbling():
    import datetime as dt

    from tenzir_ray.ops.window import sessionize, tumbling_count

    base = dt.datetime(2024, 1, 1)
    t = pa.table(
        {
            "user_id": [1, 1, 1, 2, 2],
            "event_id": [0, 1, 2, 3, 4],
            "ts": pa.array(
                [base, base + dt.timedelta(minutes=10), base + dt.timedelta(hours=3),
                 base, base + dt.timedelta(hours=2)],
                type=pa.timestamp("us"),
            ),
        }
    )
    out = sessionize(ray.data.from_arrow(t), "user_id", "ts", gap="1h").to_pandas()
    out = out.sort_values("event_id")
    assert out["session_id"].tolist() == [0, 0, 1, 0, 1]

    tc = tumbling_count(ray.data.from_arrow(t), "user_id", "ts", width="1h").to_pandas()
    assert tc["n"].sum() == 5 and len(tc) == 4


def test_read_parquet_generator_paths(ray_session, tmp_path):
    # ADVICE r2: a generator `paths` must not lose its first file to the
    # footer-schema peek
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tenzir_ray.sources import read_parquet as src_read_parquet

    f1, f2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"x": [1, 2]}), f1)
    pq.write_table(pa.table({"x": [3, 4]}), f2)
    ds = src_read_parquet((p for p in [f1, f2]), predicate="x > 0")
    assert ds.count() == 4


def test_hopping_count_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from tenzir_ray.ops.window import hopping_count

    rng = np.random.default_rng(3)
    n = 4000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 25, n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 72 * 3600, n), unit="s"),
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False)
    got = (
        hopping_count(ray.data.from_arrow(t), "user_id", "ts", width="1h", hop="15min")
        .to_pandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    duckdb.register("ev", df)
    exp = duckdb.sql(
        """
        SELECT user_id,
               TIMESTAMP '1970-01-01'
                 + to_seconds(CAST(floor(epoch(ts)/900)*900 - 900*g.i AS BIGINT)) AS ts,
               count(*) AS n
        FROM ev, (SELECT unnest(range(0, 4)) AS i) g
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    pd.testing.assert_frame_equal(
        got[["user_id", "ts", "n"]].astype({"n": "int64"}),
        exp.astype({"n": "int64"}),
        check_dtype=False,
    )


def test_hopping_count_rejects_bad_width(ray_session):
    import pandas as pd
    import pytest
    import pyarrow as pa
    import ray

    from tenzir_ray.ops.window import hopping_count

    ds = ray.data.from_arrow(pa.table({"k": [1], "ts": [pd.Timestamp("2024-01-01")]}))
    with pytest.raises(ValueError, match="multiple of hop"):
        hopping_count(ds, "k", "ts", width="1h", hop="7min")


def test_hopping_count_rejects_subresolution_hop_and_non_timestamp(ray_session):
    """ADVICE r3: hop finer than the column's unit would integer-divide
    to 0 and collapse everything into epoch-0 windows; a non-timestamp
    ts column would AttributeError deep in a task. Both must raise
    clearly."""
    import pandas as pd
    import pytest
    import pyarrow as pa
    import ray

    from tenzir_ray.ops.window import hopping_count

    ts_s = pa.array([pd.Timestamp("2024-01-01")]).cast(pa.timestamp("s"))
    ds = ray.data.from_arrow(pa.table({"k": [1], "ts": ts_s}))
    with pytest.raises(Exception, match="resolution"):
        hopping_count(ds, "k", "ts", width="1s", hop="500ms").materialize()
    ds2 = ray.data.from_arrow(pa.table({"k": [1], "ts": [42]}))
    with pytest.raises(Exception, match="timestamp"):
        hopping_count(ds2, "k", "ts", width="1h", hop="15min").materialize()


def test_sessionize_sorted_matches_groupby_on_skew(ray_session):
    # VERDICT r2: per-key ordered-merge path for hot keys — one key
    # holds 80% of rows across many blocks; output must equal the
    # groupby(map_groups) path exactly
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from tenzir_ray.ops.window import sessionize, sessionize_sorted

    rng = np.random.default_rng(11)
    n = 6000
    hot = rng.random(n) < 0.8
    users = np.where(hot, 7, rng.integers(0, 40, n))
    # distinct second offsets -> no ts ties, so no tiebreak ambiguity
    offs = rng.choice(14 * 24 * 3600, n, replace=False)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": users,
            "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(offs, unit="s"),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(13)
    a = (
        sessionize(ds, "user_id", "ts", gap="1h", small=True)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    b = (
        sessionize_sorted(ds, "user_id", "ts", gap="1h")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert a["session_id"].tolist() == b["session_id"].tolist()
    assert a["session_id"].max() > 3  # the hot key really has many sessions


def test_explode_list_column():
    import pyarrow as pa
    import ray.data

    from tenzir_ray import ops

    t = pa.table(
        {
            "id": [1, 2, 3, 4],
            "xs": [[10, 20], [], None, [30]],
        }
    )
    out = (
        ops.explode(ray.data.from_arrow(t), "xs", pos_col="pos")
        .to_pandas()
        .sort_values(["id", "pos"])
    )
    assert out["id"].tolist() == [1, 1, 4]
    assert out["xs"].tolist() == [10, 20, 30]
    assert out["pos"].tolist() == [0, 1, 0]

    from tenzir_ray import tql

    out2 = tql.run("explode xs", ray.data.from_arrow(t)).to_pandas()
    assert sorted(out2["xs"].tolist()) == [10, 20, 30]


def test_unpivot_wide_to_long():
    import pyarrow as pa
    import ray.data

    from tenzir_ray import ops

    t = pa.table({"id": [1, 2], "a": [10.0, 20.0], "b": [0.5, None]})
    out = (
        ops.unpivot(ray.data.from_arrow(t), ["a", "b"])
        .to_pandas()
        .sort_values(["id", "name"])
        .reset_index(drop=True)
    )
    assert out["name"].tolist() == ["a", "b", "a", "b"]
    assert out["value"].tolist()[0] == 10.0
    assert len(out) == 4


def test_pivot_inverse_of_unpivot():
    import pyarrow as pa
    import ray.data

    from tenzir_ray import ops

    t = pa.table({"id": [1, 2, 3], "a": [10.0, 20.0, 30.0], "b": [0.5, None, 1.5]})
    long = ops.unpivot(ray.data.from_arrow(t), ["a", "b"])
    wide = (
        ops.pivot(long, ["id"], ["a", "b"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert wide["a"].tolist() == [10.0, 20.0, 30.0]
    assert wide["b"].tolist()[0] == 0.5
    import numpy as np

    assert np.isnan(wide["b"].tolist()[1])
