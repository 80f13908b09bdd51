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


def test_shuffle_join_big_big_matches_duckdb(ray_session):
    # big-big co-partitioned hash join: neither side broadcast
    import numpy as np

    from tenzir_ray.ops.join import shuffle_join

    rng = np.random.default_rng(5)
    lt = pa.table({"k": rng.integers(0, 300, 5000), "v": rng.integers(0, 10**6, 5000)})
    rt = pa.table({"rk": rng.integers(0, 400, 4000), "w": rng.integers(0, 10**6, 4000)})
    got = (
        shuffle_join(
            ray.data.from_arrow(lt).repartition(7),
            ray.data.from_arrow(rt).repartition(5),
            keys="k", right_keys="rk", how="inner", num_partitions=8,
        )
        .to_pandas().sort_values(["k", "v", "w"]).reset_index(drop=True)
    )
    exp = duckdb.sql(
        "SELECT k, v, w FROM lt JOIN rt ON lt.k = rt.rk ORDER BY k, v, w"
    ).df()
    assert got[["k", "v", "w"]].astype("int64").equals(exp.astype("int64"))


def test_shuffle_join_right_outer(ray_session):
    # right-preserving types are exactly what the broadcast lookup_join
    # rejects — the shuffle join must handle them
    from tenzir_ray.ops.join import shuffle_join

    lt = pa.table({"k": [1, 2], "v": ["a", "b"]})
    rt = pa.table({"k": [2, 3], "w": ["x", "y"]})
    got = (
        shuffle_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                     keys="k", how="right outer", num_partitions=4)
        .to_pandas().sort_values("w").reset_index(drop=True)
    )
    assert got["w"].tolist() == ["x", "y"]
    assert got.loc[1].isna().any()  # unmatched right row carries null left cols


def test_shuffle_join_rejects_unknown_type(ray_session):
    import pytest

    from tenzir_ray.ops.join import shuffle_join

    t = ray.data.from_arrow(pa.table({"k": [1]}))
    with pytest.raises(ValueError, match="unknown join type"):
        shuffle_join(t, t, keys="k", how="sideways")


def test_range_join_inner_and_outer():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from tenzir_ray.ops.join import range_join

    left = ray.data.from_arrow(
        pa.table({"id": [0, 1, 2, 3, 4], "x": [1.0, 5.0, 10.0, 15.0, 99.0]})
    )
    right = pa.table(
        {
            "iv": ["a", "b", "c"],
            "lo": [0.0, 4.0, 9.0],
            "hi": [6.0, 12.0, 11.0],  # a and b overlap; b and c overlap
        }
    )
    out = range_join(left, right, on="x", lo_col="lo", hi_col="hi").to_pandas()
    got = sorted(zip(out["id"], out["iv"]))
    # x=1 -> a; x=5 -> a,b; x=10 -> b,c; x=15 -> none; x=99 -> none
    assert got == [(0, "a"), (1, "a"), (1, "b"), (2, "b"), (2, "c")]

    outer = range_join(
        left, right, on="x", lo_col="lo", hi_col="hi", how="left outer"
    ).to_pandas()
    missed = outer[outer["iv"].isna()]["id"].tolist()
    assert sorted(missed) == [3, 4]
    assert len(outer) == 7


def test_range_join_inclusive_bounds_and_clash():
    import pyarrow as pa
    import ray.data

    from tenzir_ray.ops.join import range_join

    left = ray.data.from_arrow(pa.table({"id": [0, 1, 2], "lo": [5, 10, 20]}))
    right = pa.table({"rid": [7], "lo": [5], "hi": [10]})  # "lo" clashes with left
    out = range_join(left, right, on="lo", lo_col="lo", hi_col="hi").to_pandas()
    # integer bounds are inclusive on BOTH ends: 5 and 10 match, 20 not
    assert sorted(out["id"]) == [0, 1]
    assert "lo_r" in out.columns  # clash suffixed


def test_range_join_timestamps():
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from tenzir_ray.ops.join import range_join

    base = pd.Timestamp("2024-01-01")
    ts = [base + pd.Timedelta(minutes=m) for m in (0, 30, 61, 200)]
    left = ray.data.from_arrow(
        pa.table({"id": [0, 1, 2, 3], "ts": pa.array(ts, type=pa.timestamp("us"))})
    )
    right = pa.table(
        {
            "w": ["w0"],
            "lo": pa.array([base], type=pa.timestamp("us")),
            "hi": pa.array([base + pd.Timedelta(hours=1)], type=pa.timestamp("us")),
        }
    )
    out = range_join(left, right, on="ts", lo_col="lo", hi_col="hi").to_pandas()
    assert sorted(out["id"]) == [0, 1]  # 61min and 200min fall outside


def test_range_join_mixed_type_domains():
    """Float probes vs integer bounds must follow BETWEEN semantics
    (10.5 not in [5, 10]); ms-unit probes vs us-unit bounds must
    compare as instants, not raw ticks."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from tenzir_ray.ops.join import range_join

    left = ray.data.from_arrow(pa.table({"id": [0, 1], "x": [10.5, 9.5]}))
    right = pa.table({"iv": ["a"], "lo": [5], "hi": [10]})
    out = range_join(left, right, on="x", lo_col="lo", hi_col="hi").to_pandas()
    assert sorted(out["id"]) == [1]  # 10.5 is OUT of [5, 10]

    base = pd.Timestamp("2024-01-01")
    left = ray.data.from_arrow(
        pa.table({"id": [0, 1], "ts": pa.array(
            [base + pd.Timedelta(minutes=30), base + pd.Timedelta(minutes=90)],
            type=pa.timestamp("ms"))})
    )
    right = pa.table({
        "iv": ["w"],
        "lo": pa.array([base], type=pa.timestamp("us")),
        "hi": pa.array([base + pd.Timedelta(hours=1)], type=pa.timestamp("us")),
    })
    out = range_join(left, right, on="ts", lo_col="lo", hi_col="hi").to_pandas()
    assert sorted(out["id"]) == [0]


def test_asof_shuffle_join_matches_duckdb_asof(ray_session):
    """Big-right escape hatch (VERDICT r3 item 6): range-partitioned
    shuffle as-of join vs DuckDB ASOF, right side bigger than the left,
    hot keys spanning sort blocks, null on-keys never matching."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data

    from tenzir_ray.ops.join import asof_shuffle_join

    rng = np.random.default_rng(11)
    nl, nr = 4000, 6000
    left = pd.DataFrame(
        {
            "event_id": np.arange(nl),
            "k": rng.integers(0, 12, nl),  # hot keys -> span blocks
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**5, nl), unit="s"),
        }
    )
    left.loc[rng.choice(nl, 20, replace=False), "ts"] = pd.NaT
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 16, nr),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**5, nr), unit="s"),
        }
    ).drop_duplicates(["k", "ts"])
    right["price"] = rng.random(len(right)).round(3)

    out = asof_shuffle_join(
        ray.data.from_pandas(left).repartition(12),
        ray.data.from_pandas(right).repartition(12),
        on="ts",
        by="k",
    ).to_pandas()

    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.execute(
        """
        SELECT l.event_id, l.k, l.ts, r.price
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts
        """
    ).df()
    g = out.sort_values("event_id").reset_index(drop=True)[["event_id", "k", "ts", "price"]]
    e = exp.sort_values("event_id").reset_index(drop=True)
    nn = g["ts"].notna()
    pd.testing.assert_frame_equal(
        g[nn].reset_index(drop=True), e[nn.values].reset_index(drop=True), check_dtype=False
    )
    # declared semantics: null on-keys never match (DuckDB quirk: ASOF
    # matches NULL as greater-than-everything)
    assert g.loc[~nn, "price"].isna().all()
    assert g["price"].notna().sum() > 0.9 * nl


def test_asof_shuffle_join_forward(ray_session):
    """direction='forward': earliest right row at-or-after, exact
    matches included, nulls never match."""
    import numpy as np
    import pandas as pd
    import ray.data

    from tenzir_ray.ops.join import asof_shuffle_join

    left = pd.DataFrame(
        {
            "id": [1, 2, 3, 4],
            "k": [1, 1, 2, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 05:00", "2024-01-01 01:00", None]
            ),
        }
    )
    right = pd.DataFrame(
        {
            "k": [1, 1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 02:00", "2024-01-01 05:00", "2024-01-01 00:30"]
            ),
            "v": [10.0, 20.0, 30.0],
        }
    )
    out = (
        asof_shuffle_join(
            ray.data.from_pandas(left).repartition(2),
            ray.data.from_pandas(right).repartition(2),
            on="ts",
            by="k",
            direction="forward",
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # id1 -> next at 02:00 (v=10); id2 exact match at 05:00 (v=20);
    # id3 at 01:00 has no later right row for k=2 -> null; id4 null ts -> null
    assert out["v"].tolist()[:2] == [10.0, 20.0]
    assert np.isnan(out["v"].tolist()[2]) and np.isnan(out["v"].tolist()[3])
    # on-axis restored to real timestamps
    assert out["ts"].iloc[0] == pd.Timestamp("2024-01-01 00:00")


def test_asof_forward_type_mismatch_fails_loudly(ray_session):
    # ADVICE r4: ns-vs-us on-columns must not silently compare in mixed
    # units on the negated forward path
    import pyarrow as pa
    import pytest
    import ray.data

    from tenzir_ray.ops.join import asof_shuffle_join

    left = ray.data.from_arrow(pa.table(
        {"k": [1], "ts": pa.array([1000], type=pa.timestamp("us"))}))
    right = ray.data.from_arrow(pa.table(
        {"k": [1], "ts": pa.array([2000], type=pa.timestamp("ns")), "v": [5]}))
    with pytest.raises(TypeError, match="type mismatch"):
        asof_shuffle_join(left, right, on="ts", by="k", direction="forward")


def test_range_shuffle_join_matches_broadcast_and_duckdb(ray_session):
    """VERDICT r4 item 8: big-big interval join — range-partitioned
    probe domain with boundary-spanning interval replication must
    return exactly the broadcast kernel's (and DuckDB's) rows, inner
    and left outer, across partition boundaries."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from tenzir_ray.ops.join import range_join, range_shuffle_join

    rng = np.random.default_rng(7)
    n_left, n_iv = 4000, 300
    x = rng.integers(0, 10_000, n_left)
    lo = rng.integers(0, 10_000, n_iv)
    width = rng.integers(0, 500, n_iv)
    # a handful of domain-spanning intervals exercise full replication
    lo[:3] = 0
    width[:3] = 10_000
    ldf = pa.table({"id": np.arange(n_left), "x": x})
    rdf = pa.table({"iv": np.arange(n_iv), "lo": lo, "hi": lo + width})
    left = ray.data.from_arrow(ldf).repartition(8)
    right = ray.data.from_arrow(rdf).repartition(4)

    got = (
        range_shuffle_join(left, right, on="x", lo_col="lo", hi_col="hi",
                           num_partitions=8)
        .to_pandas().sort_values(["id", "iv"]).reset_index(drop=True)
    )
    bc = (
        range_join(left, rdf, on="x", lo_col="lo", hi_col="hi")
        .to_pandas().sort_values(["id", "iv"]).reset_index(drop=True)
    )
    assert got[["id", "iv"]].values.tolist() == bc[["id", "iv"]].values.tolist()
    exp = duckdb.sql(
        "SELECT l.id, r.iv FROM ldf l JOIN rdf r ON l.x BETWEEN r.lo AND r.hi "
        "ORDER BY l.id, r.iv"
    ).df()
    assert got[["id", "iv"]].values.tolist() == exp.values.tolist()

    outer = range_shuffle_join(
        left, right, on="x", lo_col="lo", hi_col="hi", how="left outer",
        num_partitions=8,
    ).to_pandas()
    matched_ids = set(exp["id"])
    missed = outer[outer["iv"].isna()]["id"]
    assert set(missed) == set(np.arange(n_left)) - matched_ids
    assert len(outer) == len(exp) + len(missed)


def test_range_shuffle_join_timestamps_clash_and_nulls(ray_session):
    """Temporal domain + column-name clash + null probes / null and
    inverted bounds through the partitioned path."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from tenzir_ray.ops.join import range_shuffle_join

    base = pd.Timestamp("2024-01-01")
    ts = [base + pd.Timedelta(minutes=m) for m in (0, 30, 61, 200)] + [None]
    left = ray.data.from_arrow(
        pa.table({"id": [0, 1, 2, 3, 4], "lo": pa.array(ts, type=pa.timestamp("us"))})
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "w": ["w0", "w_null", "w_inverted"],
                "lo": pa.array(
                    [base, None, base + pd.Timedelta(hours=2)], type=pa.timestamp("us")
                ),
                "hi": pa.array(
                    [base + pd.Timedelta(hours=1), base, base], type=pa.timestamp("us")
                ),
            }
        )
    )
    out = range_shuffle_join(
        left, right, on="lo", lo_col="lo", hi_col="hi", num_partitions=4
    ).to_pandas()
    assert sorted(out["id"]) == [0, 1]  # 61m/200m outside; null never matches
    assert "lo_r" in out.columns  # clash suffixed
    outer = range_shuffle_join(
        left, right, on="lo", lo_col="lo", hi_col="hi", how="left outer",
        num_partitions=4,
    ).to_pandas()
    assert len(outer) == 5 and sorted(outer[outer["w"].isna()]["id"]) == [2, 3, 4]


def test_tql_range_join_shuffle_flag(ray_session, tmp_path):
    """TQL `range-join ... --shuffle [how]` routes to the partitioned
    path with exact-token flag parsing (no substring stripping)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from tenzir_ray import tql

    iv = str(tmp_path / "iv.parquet")
    pq.write_table(pa.table({"iv": ["a", "b"], "lo": [0, 4], "hi": [6, 12]}), iv)
    ds = ray.data.from_arrow(pa.table({"id": [0, 1, 2], "x": [1, 5, 20]}))
    bc = tql.run(f"range-join {iv} on x in lo..hi | sort id", ds).to_pandas()
    sh = tql.run(f"range-join {iv} on x in lo..hi --shuffle | sort id", ds).to_pandas()
    assert sorted(zip(bc["id"], bc["iv"])) == sorted(zip(sh["id"], sh["iv"]))
    outer = tql.run(
        f"range-join {iv} on x in lo..hi --shuffle left outer", ds
    ).to_pandas()
    assert len(outer) == 4 and outer["iv"].isna().sum() == 1
