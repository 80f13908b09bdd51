"""window_ranks (ROW_NUMBER/RANK/DENSE_RANK), cumsum null semantics,
and null-partition-key carries — VERDICT r4 item 7 + ADVICE r4 items
1–2. Reference semantics: SQL window functions (duckdb oracle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def _ranks_oracle(df, key, order_cols):
    import duckdb

    order = ", ".join(order_cols)
    return duckdb.sql(
        f"""SELECT *, ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk,
                   DENSE_RANK() OVER w AS dr
            FROM df WINDOW w AS (PARTITION BY {key} ORDER BY {order})"""
    ).df()


def test_window_ranks_with_ties_matches_sql(ray_session):
    from tenzir_ray.ops.window import window_ranks

    rng = np.random.default_rng(5)
    n = 4000
    df = pd.DataFrame(
        {
            "rid": np.arange(n),
            "k": rng.integers(0, 7, n),          # few keys → runs span blocks
            "v": rng.integers(0, 12, n),         # heavy ties within key
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(11)
    out = (
        window_ranks(ds, "k", ["v"], row_number=None, rank="rk", dense_rank="dr")
        .to_pandas()
    )
    # rank/dense_rank are tie-invariant → comparable row-by-row after
    # aligning on (k, v, per-group position is NOT unique) — compare the
    # multiset of (k, v, rk, dr) tuples instead
    ora = _ranks_oracle(df, "k", ["v"])
    got = sorted(map(tuple, out[["k", "v", "rk", "dr"]].to_numpy().tolist()))
    want = sorted(map(tuple, ora[["k", "v", "rk", "dr"]].to_numpy().tolist()))
    assert got == want


def test_window_ranks_row_number_unique_order(ray_session):
    from tenzir_ray.ops.window import window_ranks

    rng = np.random.default_rng(6)
    n = 3000
    df = pd.DataFrame(
        {"rid": rng.permutation(n), "k": rng.integers(0, 5, n)}
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(9)
    out = window_ranks(ds, "k", ["rid"], row_number="rn", rank="rk",
                       dense_rank="dr").to_pandas()
    assert out["rn"].dtype == np.int64
    ora = _ranks_oracle(df, "k", ["rid"])
    merged = out.merge(ora[["rid", "rn", "rk", "dr"]], on="rid",
                       suffixes=("", "_o"))
    assert (merged["rn"] == merged["rn_o"]).all()
    # unique order → rank == dense_rank == row_number
    assert (merged["rk"] == merged["rk_o"]).all()
    assert (merged["dr"] == merged["dr_o"]).all()


def test_cumsum_null_values_skip_not_poison(ray_session):
    # ADVICE r4 (medium): nulls must not poison later rows, and the
    # running sum is NULL until the partition's first non-null
    from tenzir_ray.ops.window import cumsum_col

    df = pd.DataFrame(
        {
            "rid": range(8),
            "k": [1, 1, 1, 1, 2, 2, 2, 2],
            "v": [None, 2.0, None, 3.0, None, None, 1.5, None],
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(4)
    out = (
        cumsum_col(ds, "v", "k", ["rid"], out_col="cs")
        .to_pandas()
        .sort_values("rid")
    )
    want = [None, 2.0, 2.0, 5.0, None, None, 1.5, 1.5]
    got = out["cs"].tolist()
    for g, w in zip(got, want):
        if w is None:
            assert pd.isna(g)
        else:
            assert g == pytest.approx(w)


def test_null_partition_key_spans_blocks(ray_session):
    # ADVICE r4 (low): a null key is ONE partition even across block
    # boundaries (SQL PARTITION BY groups all nulls together)
    from tenzir_ray.ops.window import cumsum_col, lag_col, window_ranks

    n = 400
    rng = np.random.default_rng(7)
    keys = rng.choice([1.0, 2.0, np.nan], n, p=[0.3, 0.3, 0.4])
    df = pd.DataFrame({"rid": np.arange(n), "k": keys, "v": np.ones(n)})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(8)

    cs = cumsum_col(ds, "v", "k", ["rid"], out_col="cs").to_pandas()
    null_rows = cs[cs["k"].isna()].sort_values("rid")
    n_null = len(null_rows)
    # a single null partition → running sum of ones is 1..n_null
    assert null_rows["cs"].tolist() == pytest.approx(list(np.arange(1, n_null + 1.0)))

    rn = window_ranks(ds, "k", ["rid"], row_number="rn").to_pandas()
    null_rn = rn[rn["k"].isna()].sort_values("rid")["rn"].tolist()
    assert null_rn == list(range(1, n_null + 1))

    lg = lag_col(ds, "rid", "k", ["rid"], out_col="prev").to_pandas()
    null_lag = lg[lg["k"].isna()].sort_values("rid")
    # exactly ONE partition-first null lag in the null partition
    assert null_lag["prev"].isna().sum() == 1
    assert null_lag["prev"].iloc[0] is None or pd.isna(null_lag["prev"].iloc[0])


def test_null_order_column_matches_duckdb(ray_session):
    """Code-review r5: nulls in the ORDER column must survive the
    range-partition sort (null-safe pairs for every sort column) and
    land NULLS LAST, matching DuckDB's window default."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from tenzir_ray.ops.window import window_ranks

    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n),
            "rid": np.arange(n),
            "v": rng.integers(0, 50, n).astype("float64"),
        }
    )
    df.loc[df.index % 7 == 0, "v"] = np.nan  # nulls sprinkled everywhere
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(9)
    out = (
        window_ranks(ds, "k", ["v"], row_number=None, rank="rk", dense_rank="dr")
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        """
        SELECT rid,
               rank() OVER (PARTITION BY k ORDER BY v) AS rk,
               dense_rank() OVER (PARTITION BY k ORDER BY v) AS dr
        FROM df ORDER BY rid
        """
    ).df()
    assert out["rk"].tolist() == exp["rk"].astype(int).tolist()
    assert out["dr"].tolist() == exp["dr"].astype(int).tolist()
