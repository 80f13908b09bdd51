"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC pipeline (binlog replay → LWW merge →
exactly-once lake) at smoke scale. ``queries()`` exposes one callable
per implemented operator/pipeline from SURVEY.md §2 over the driver's
parquet tables; ``oracle_sql()`` gives the DuckDB-equivalent SQL for
every SQL-expressible one (same output column names — the driver
hash-compares values after sorting columns by name).

Ray is initialised by the DRIVER before importing this module: nothing
here (or in tenzir_ray) calls ray.init()/ray.shutdown().

Float-valued aggregates are rounded identically on both sides (Ray and
SQL) so value-hashes are insensitive to summation order.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from tenzir_ray import ann, curation, dedup, ops, text
from tenzir_ray.sources import read_parquet

_PYARROW = dict(batch_format="pyarrow", zero_copy_batch=True)


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _round_cols(ds, cols, ndigits=2):
    """Deterministic rounding shared with the oracle SQL: BOTH sides
    compute floor(x * 10^n + 0.5) / 10^n, so value-hashes are immune to
    round-half-mode differences between Arrow and DuckDB."""
    m = float(10**ndigits)

    def apply(t: pa.Table) -> pa.Table:
        for c in cols:
            if c in t.column_names:
                i = t.column_names.index(c)
                col = t[c].cast(pa.float64())
                r = pc.divide(pc.floor(pc.add(pc.multiply(col, m), 0.5)), m)
                t = t.set_column(i, c, r)
        return t

    return ds.map_batches(apply, **_PYARROW)


def _sqlr(expr: str, ndigits: int = 2) -> str:
    """The SQL twin of _round_cols."""
    m = 10**ndigits
    return f"floor(({expr}) * {m} + 0.5) / {m}"


# ---------------------------------------------------------------------------
# CDC flagship
# ---------------------------------------------------------------------------

_ENTRY_BINLOG = "/tmp/tzr_entry_binlog"
_ENTRY_LAKE = "/tmp/tzr_entry_lake"


def _ensure_binlog(path: str, n_events: int, **kwargs) -> str:
    from tenzir_ray.cdc.binlog import META_NAME, generate_binlog

    if not os.path.exists(os.path.join(path, META_NAME)):
        generate_binlog(path, n_events=n_events, **kwargs)
    return path


def entry() -> Any:
    """Flagship: deterministic binlog → resumable exactly-once CDC
    replay → lake Dataset (schema: repo, path, commit, lang, content,
    commit_seq, content_sha256)."""
    import shutil

    from tenzir_ray.cdc.engine import replay
    from tenzir_ray.cdc.lake import Lake

    _ensure_binlog(
        _ENTRY_BINLOG, n_events=8_000, n_repos=20, paths_per_repo=25,
        shard_events=2_000, content_median=128,
    )
    shutil.rmtree(_ENTRY_LAKE, ignore_errors=True)
    replay(_ENTRY_BINLOG, _ENTRY_LAKE, num_buckets=16, chunk_shards=2)
    return Lake(_ENTRY_LAKE).read()


_QUERY_BINLOG = "/tmp/tzr_q_binlog"
_QUERY_BINLOG_KW = dict(
    n_events=12_000, n_repos=30, paths_per_repo=30,
    shard_events=3_000, content_median=128, evolution_offset=9_000,
)


def _cdc_replay_query(sf_dir: str) -> Any:
    """CDC golden replay as a queries() entry; oracle_sql() carries the
    single-pass DuckDB LWW materialization of the SAME deterministic
    binlog, so the driver hash-compares full row content (per-row
    sha256 parity is additionally asserted in tests/test_cdc.py)."""
    import shutil

    from tenzir_ray.cdc.engine import replay
    from tenzir_ray.cdc.lake import Lake

    lake = "/tmp/tzr_q_lake"
    _ensure_binlog(_QUERY_BINLOG, **_QUERY_BINLOG_KW)
    shutil.rmtree(lake, ignore_errors=True)
    replay(_QUERY_BINLOG, lake, num_buckets=16, chunk_shards=2)
    t = Lake(lake).to_arrow()
    return t.sort_by([("repo", "ascending"), ("path", "ascending")])


# ---------------------------------------------------------------------------
# operator-library queries (each with an oracle below)
# ---------------------------------------------------------------------------


def _q_where(sf_dir):
    ds = read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_discount"],
        predicate="l_quantity > 30 && l_discount < 0.05",
    )
    return ds


def _q_project(sf_dir):
    ds = read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
    )
    ds = ops.put(
        ds,
        {
            "l_orderkey": "l_orderkey",
            "l_linenumber": "l_linenumber",
            "revenue": "l_extendedprice * (1 - l_discount)",
        },
    )
    return _round_cols(ds, ["revenue"], 2)


def _q_summarize_q1(sf_dir):
    # pruned read: 6 of 16 columns + the shipdate predicate pushed to
    # the parquet scan (row-group pruning), not applied post-read
    ds = read_parquet(
        _t(sf_dir, "lineitem"),
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        ],
        predicate='l_shipdate <= "1998-09-02"',
    )
    ds = ops.extend(ds, {"disc_price": "l_extendedprice * (1 - l_discount)"})
    out = ops.summarize(
        ds,
        aggs={
            "sum_qty": ("sum", "l_quantity"),
            "sum_base_price": ("sum", "l_extendedprice"),
            "sum_disc_price": ("sum", "disc_price"),
            "avg_qty": ("mean", "l_quantity"),
            "avg_price": ("mean", "l_extendedprice"),
            "count_order": ("count", None),
        },
        by=["l_returnflag", "l_linestatus"],
    )
    return _round_cols(out, ["sum_qty", "sum_base_price", "sum_disc_price", "avg_qty", "avg_price"], 2)


def _q_range_join(sf_dir):
    # interval-containment join (ops/join.py:range_join): every 101st
    # event spawns a 1-hour window; all events landing inside any
    # window join it. The interval side is built CLUSTER-side (pruned
    # 2-column read + vectorized filter) and only the small filtered
    # result is collected for the broadcast — no driver scan of the
    # fact table.
    from tenzir_ray.ops.join import range_join

    ds = read_parquet(_t(sf_dir, "events"), columns=["event_id", "ts"])

    def pick_intervals(t):
        import pyarrow.compute as _pc

        keys = t["event_id"].to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(keys % 101 == 0))
        hi = _pc.add(sub["ts"], pa.scalar(3_600_000_000, type=pa.duration("us")))
        return pa.table({"iv_id": sub["event_id"], "lo": sub["ts"], "hi": hi})

    iv_ds = ds.map_batches(pick_intervals, batch_format="pyarrow", zero_copy_batch=True)
    import ray as _ray

    parts = [t for t in _ray.get(iv_ds.materialize().to_arrow_refs()) if t.num_rows]
    iv = pa.concat_tables(parts) if parts else pa.table(
        {"iv_id": pa.array([], pa.int64()),
         "lo": pa.array([], pa.timestamp("us")),
         "hi": pa.array([], pa.timestamp("us"))}
    )
    out = range_join(ds, iv, on="ts", lo_col="lo", hi_col="hi", how="inner")
    return ops.sort(ops.select(out, ["event_id", "iv_id"]), ["event_id", "iv_id"])


def _q_range_shuffle_join(sf_dir):
    # big-big interval-containment join (ops/join.py:range_shuffle_join,
    # VERDICT r4 item 8): the interval side stays a DATASET end-to-end —
    # nothing is collected or broadcast. Probe domain range-partitioned
    # from a left-side scalar sample; boundary-spanning intervals
    # replicate into each overlapped partition; per-partition
    # elementary-segment CSR join. Denser windows than range_join_events
    # (every 29th event, 2h) so intervals overlap partitions heavily.
    from tenzir_ray.ops.join import range_shuffle_join

    ds = read_parquet(_t(sf_dir, "events"), columns=["event_id", "ts"])

    def pick_intervals(t):
        import pyarrow.compute as _pc

        keys = t["event_id"].to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(keys % 29 == 0))
        hi = _pc.add(sub["ts"], pa.scalar(7_200_000_000, type=pa.duration("us")))
        return pa.table({"iv_id": sub["event_id"], "lo": sub["ts"], "hi": hi})

    iv_ds = ds.map_batches(pick_intervals, batch_format="pyarrow", zero_copy_batch=True)
    out = range_shuffle_join(ds, iv_ds, on="ts", lo_col="lo", hi_col="hi", how="inner")
    agg = ops.summarize(
        ops.select(out, ["event_id", "iv_id"]),
        aggs={"n_windows": ("count", "iv_id")},
        by="event_id",
    )
    return ops.sort(agg, ["event_id"])


def _q_median_quantile(sf_dir):
    # exact distributed median / interpolated quantile over
    # bounded-cardinality measures (value-count decomposition,
    # ops/summarize.py:_quantile_fn)
    ds = read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_returnflag", "l_quantity", "l_discount"]
    )
    out = ops.summarize(
        ds,
        aggs={
            "med_qty": ("median", "l_quantity"),
            "p95_disc": ("quantile_cont_0.95", "l_discount"),
        },
        by="l_returnflag",
    )
    return _round_cols(ops.sort(out, "l_returnflag"), ["med_qty", "p95_disc"], 4)


def _q_summarize_by_hour(sf_dir):
    ds = read_parquet(_t(sf_dir, "events"), columns=["ts", "value"])
    out = ops.summarize(
        ds,
        aggs={"n": ("count", None), "sum_value": ("sum", "value")},
        by="ts",
        resolution={"ts": "1h"},
    )
    return _round_cols(out, ["sum_value"], 2)


def _q_top(sf_dir):
    return ops.top(read_parquet(_t(sf_dir, "events"), columns=["event_type"]), "event_type", k=3)


def _q_rare(sf_dir):
    return ops.rare(read_parquet(_t(sf_dir, "events"), columns=["event_type"]), "event_type", k=3)


def _q_sort_head(sf_dir):
    ds = read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])
    return ops.head(ops.sort(ds, ["o_totalprice", "o_orderkey"], descending=[True, False]), 10)


def _q_tail(sf_dir):
    ds = read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"])
    return ops.tail(ops.sort(ds, "o_orderkey"), 5)


def _q_taste(sf_dir):
    ds = read_parquet(_t(sf_dir, "orders"), columns=["o_orderpriority", "o_orderkey"])
    return ops.taste(ds, "o_orderpriority", n=2, order_by="o_orderkey")


def _preserve_order():
    # consecutive-dedup / enumerate are order-dependent; pin the
    # streaming executor's block order for the session
    ray.data.DataContext.get_current().execution_options.preserve_order = True


def _q_unique_consecutive(sf_dir):
    _preserve_order()
    ds = read_parquet(_t(sf_dir, "events"), columns=["event_id", "event_type"])
    ds = ops.sort(ds, "event_id")
    ds = ops.select(ds, ["event_type"])
    return ops.unique(ds, strict=True)


def _q_enumerate(sf_dir):
    _preserve_order()
    ds = ops.sort(read_parquet(_t(sf_dir, "nation")), "n_nationkey")
    return ops.enumerate_op(ds, field="row_id")


def _q_count_distinct(sf_dir):
    ds = read_parquet(_t(sf_dir, "customer"), columns=["c_nationkey", "c_mktsegment"])
    return ops.summarize(
        ds,
        aggs={"n_segments": ("count_distinct", "c_mktsegment"), "n_customers": ("count", None)},
        by="c_nationkey",
    )


def _q_minmax_dates(sf_dir):
    ds = read_parquet(_t(sf_dir, "orders"), columns=["o_orderpriority", "o_orderdate", "o_totalprice"])
    out = ops.summarize(
        ds,
        aggs={
            "min_date": ("min", "o_orderdate"),
            "max_date": ("max", "o_orderdate"),
            "max_price": ("max", "o_totalprice"),
        },
        by="o_orderpriority",
    )
    return _round_cols(out, ["max_price"], 2)


def _q_any_all(sf_dir):
    ds = read_parquet(_t(sf_dir, "events"), columns=["event_type", "value"])
    ds = ops.extend(ds, {"big": "value > 100"})
    return ops.summarize(
        ds, aggs={"any_big": ("any", "big"), "all_big": ("all", "big")}, by="event_type"
    )


def _q_hash_docs(sf_dir):
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return ops.drop(ops.hash_op(ds, "text", algo="sha256"), ["text"])


def _q_rename_extend_replace(sf_dir):
    ds = read_parquet(_t(sf_dir, "region"))
    ds = ops.rename(ds, {"region_name": "r_name"})
    ds = ops.extend(ds, {"key_plus_100": "r_regionkey + 100"})
    return ops.replace(ds, {"r_regionkey": "r_regionkey * 10"})


def _q_flatten(sf_dir):
    ds = read_parquet(_t(sf_dir, "events"), columns=["event_id", "event_type", "value"])

    def nest(t: pa.Table) -> pa.Table:
        meta = pa.StructArray.from_arrays(
            [t["event_type"].combine_chunks(), t["value"].combine_chunks()],
            names=["event_type", "value"],
        )
        return pa.table({"event_id": t["event_id"], "meta": meta})

    return ops.flatten(ds.map_batches(nest, **_PYARROW))


def _q_parse_props(sf_dir):
    ds = read_parquet(_t(sf_dir, "events"), columns=["event_id", "props"])

    def extract(t: pa.Table) -> pa.Table:
        k = pc.struct_field(pc.extract_regex(t["props"], r"(?P<k>\d+)"), "k").cast(pa.int64())
        return pa.table({"event_id": t["event_id"], "k": k})

    return ds.map_batches(extract, **_PYARROW)


def _q_lww_latest_event(sf_dir):
    """LWW-by-key semantics (the CDC merge) over a registered view: the
    latest event per user (ties broken by event_id). Shape:
    ``ops.lww_latest`` — a vectorized per-block winner pass (map-side
    combine) before ONE bucketed shuffle of winners; no per-key Ray
    group, no per-key accumulator (the 4-AggregateFn arg_max shape
    measured 3.4x slower at sf0.1)."""
    ds = read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type", "value"])
    out = ops.lww_latest(ds, key="user_id", order=["ts", "event_id"])
    out = ops.select(out, ["user_id", "ts", "event_id", "event_type", "value"])
    return _round_cols(out, ["value"], 2)


def _q_argmax_order_price(sf_dir):
    """``arg_max`` aggregate surface (summarize): highest-price order
    key per priority class, ties broken by order key."""
    ds = read_parquet(_t(sf_dir, "orders"), columns=["o_orderpriority", "o_orderkey", "o_totalprice"])
    return ops.summarize(
        ds,
        aggs={"top_order": ("arg_max", ["o_orderkey", "o_totalprice", "o_orderkey"])},
        by="o_orderpriority",
    )


# ---------------------------------------------------------------------------
# training-data pipeline queries
# ---------------------------------------------------------------------------


def _q_dedup_exact(sf_dir):
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text", "n_chars"])
    return dedup.dedup_exact(ds, on="text", id_col="doc_id")


def _q_token_count(sf_dir):
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return ops.drop(text.token_count(ds), ["text"])


def _q_bpe_token_count(sf_dir):
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return ops.drop(text.bpe_token_count(ds), ["text"])


def _q_fingerprint(sf_dir):
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return ops.drop(text.fingerprint(ds), ["text"])


def _q_quality(sf_dir):
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = ops.drop(text.quality_score(ds), ["text"])
    return _round_cols(out, ["punct_ratio", "stop_ratio", "mean_word_len", "quality"], 6)


def _q_lang_id(sf_dir):
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return ops.drop(text.lang_id(ds, concurrency=1), ["text"])


def _docs_bench_split(sf_dir):
    """Deterministic benchmark/corpus split of `documents` (doc_id % 23
    picks the 'benchmark' side) shared by the decontamination query and
    its oracle."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def mk(is_bench):
        def f(t: pa.Table) -> pa.Table:
            m = t["doc_id"].to_numpy(zero_copy_only=False) % 23 == 0
            return t.filter(pa.array(m if is_bench else ~m))

        return f

    return (
        ds.map_batches(mk(False), batch_format="pyarrow"),
        ds.map_batches(mk(True), batch_format="pyarrow"),
    )


def _q_decontaminate(sf_dir):
    corpus, bench = _docs_bench_split(sf_dir)
    out = curation.decontaminate(corpus, bench, n=3, concurrency=2)
    return out.select_columns(["doc_id", "contaminated", "n_hits"])


def _q_repetition(sf_dir):
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = ops.drop(curation.repetition_stats(ds), ["text"])
    return _round_cols(
        out, ["dup_word_frac", "top_word_frac", "dup_2gram_frac"], 6
    )


def _q_stratified_sample(sf_dir):
    ds = read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "event_type"]
    )
    return curation.stratified_sample(ds, "event_type", "event_id", k=50)


def _q_sample_fraction(sf_dir):
    ds = read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "event_type"]
    )
    return curation.sample_fraction(ds, "event_id", 0.1)


def _q_dedup_minhash(sf_dir):
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = dedup.dedup_minhash_lsh(ds, "text", "doc_id", threshold=0.8)
    return ops.drop(out, ["text"])


def _q_dedup_minhash_exchange(sf_dir):
    # same result as dedup_minhash_docs, FORCED through the
    # beyond-broadcast verification exchange (bucketed in-task joins) —
    # the 100-TB path, oracle-checked on the same SQL
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = dedup.dedup_minhash_lsh(
        ds, "text", "doc_id", threshold=0.8, verify_path="exchange"
    )
    return ops.drop(out, ["text"])


def _q_dedup_ngram(sf_dir):
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = dedup.dedup_ngram_jaccard(ds, "text", "doc_id", n=3, threshold=0.6)
    return ops.drop(out, ["text"])


def _q_dedup_simhash(sf_dir):
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return ops.drop(dedup.dedup_simhash(ds, "text", "doc_id", max_hamming=2), ["text"])


def _q_dedup_embedding(sf_dir):
    ds = read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return ops.drop(dedup.dedup_embedding(ds, "embedding", "vec_id", threshold=0.999), ["embedding"])


def _query_vec(sf_dir) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    i = t["vec_id"].to_pylist().index(0)
    return np.array(t["embedding"][i].as_py(), dtype=np.float64)


def _q_ann_brute(sf_dir):
    ds = read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    out = ann.knn_brute(ds, _query_vec(sf_dir), k=10)
    out = out[["rank", "vec_id", "score"]].copy()
    out["score"] = np.floor(out["score"] * 1e4 + 0.5) / 1e4
    return out


def _q_ann_ivf(sf_dir):
    ds = read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    out = ann.knn_ivf(ds, _query_vec(sf_dir), k=10, n_lists=8, nprobe=8)
    out = out[["rank", "vec_id", "score"]].copy()
    out["score"] = np.floor(out["score"] * 1e4 + 0.5) / 1e4
    return out


def _q_ann_ivf_saved(sf_dir):
    """Persisted-index path: fit+save once (hive-partitioned by IVF
    list), then query via load + partition-pruned read — no k-means
    and no re-assignment on the query side."""
    idx_path = f"/tmp/tzr_q_ivf_{os.path.basename(os.path.normpath(sf_dir))}"
    if not os.path.exists(os.path.join(idx_path, "centroids.parquet")):
        ds = read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
        ann.IVFIndex.fit(ds, "embedding", n_lists=8).save(idx_path, ds)
    out = ann.knn_ivf_saved(idx_path, _query_vec(sf_dir), k=10, nprobe=8)
    out = out[["rank", "vec_id", "score"]].copy()
    out["score"] = np.floor(out["score"] * 1e4 + 0.5) / 1e4
    return out


def _q_lookup_join(sf_dir):
    """Broadcast hash join: orders against the (small) customer
    dimension — ray.put once, pyarrow hash join per batch."""
    import pyarrow.parquet as pq

    from tenzir_ray.ops.join import lookup_join

    ds = read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey", "c_name", "c_mktsegment"])
    out = lookup_join(ds, cust, keys="o_custkey", right_keys="c_custkey", how="left outer")
    return _round_cols(out, ["o_totalprice"], 2)


def _q_asof_join(sf_dir):
    """As-of join: each event attaches the customer's most recent
    order at-or-before the event time (right side pre-aggregated to
    unique (user, date) so the match is deterministic).

    The right side is built CLUSTER-SIDE (round-2 verdict item: the
    former ``pq.read_table`` + pandas groupby ran on the driver over a
    fact table): a Ray groupby-max reduces orders to the small unique
    (custkey, date) dimension in the cluster, and only that aggregate
    is collected for the broadcast."""
    import ray as _ray
    from ray.data.aggregate import Max

    from tenzir_ray.ops.join import asof_join

    ev = read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    r_ds = (
        read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_totalprice"])
        .groupby(["o_custkey", "o_orderdate"])
        .aggregate(Max("o_totalprice", alias_name="last_order_price"))
    )
    r_tbl = pa.concat_tables(
        [t for t in _ray.get(r_ds.materialize().to_arrow_refs()) if t.num_rows]
    )
    r = r_tbl.to_pandas().rename(columns={"o_custkey": "user_id"})
    # date32 round-trips as datetime64[s]; merge_asof needs the exact
    # unit of the left's timestamp[us] key
    r["ts"] = pd.to_datetime(r.pop("o_orderdate")).astype("datetime64[us]")
    r["last_order_ts"] = r["ts"]
    out = asof_join(ev, pa.Table.from_pandas(r, preserve_index=False), on="ts", by="user_id")
    return _round_cols(out, ["last_order_price"], 2)


def _q_asof_shuffle_join(sf_dir):
    """Big-right as-of join via the range-partitioned SHUFFLE path
    (VERDICT r3 item 6): same semantics as ``asof_join_events_orders``
    but the right side stays a DATASET end to end — nothing is
    collected or broadcast; both sides go through one distributed sort
    of the tagged union with per-block-boundary carry rows. Right side
    (unique (custkey, orderdate), ~1.5x the left's row count) is
    deliberately bigger than the left."""
    from ray.data.aggregate import Max

    from tenzir_ray.ops.join import asof_shuffle_join

    ev = read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    r_ds = (
        read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_totalprice"])
        .groupby(["o_custkey", "o_orderdate"])
        .aggregate(Max("o_totalprice", alias_name="last_order_price"))
    )

    def prep(t: pa.Table) -> pa.Table:
        ts = t["o_orderdate"].cast(pa.timestamp("us"))
        return pa.table(
            {
                "user_id": t["o_custkey"],
                "ts": ts,
                "last_order_price": t["last_order_price"],
                "last_order_ts": ts,
            }
        )

    out = asof_shuffle_join(ev, r_ds.map_batches(prep, **_PYARROW), on="ts", by="user_id")
    return _round_cols(out, ["last_order_price"], 2)


_DECAP_PCAP = "/tmp/tzr_q_packets.pcap"
_DECAP_EXPECTED = "/tmp/tzr_decap_expected.parquet"
_DECAP_N, _DECAP_SEED = 1200, 23


def _q_decapsulate(sf_dir):
    """pcap → decapsulate: deterministic synthetic frames (mixed
    TCP/UDP/ICMP, v4/v6, VLAN/QinQ tags, truncated garbage) written as
    a real pcap file, re-read with the pcap parser, and decapsulated
    with Community ID stamping."""
    from tenzir_ray import pcap

    pcap.write_spec_pcap(_DECAP_PCAP, n=_DECAP_N, seed=_DECAP_SEED)
    return pcap.decapsulate(pcap.read_pcap(_DECAP_PCAP), keep_pcap=False)


def _decapsulate_oracle() -> str:
    """Spec-level expected rows (tenzir_ray.naive.decapsulate_expected
    — derived from the flow specs alone, independent of frame bytes,
    the pcap format, and the packet parser) materialized as parquet
    for the driver's DuckDB side."""
    if "decap" not in _synth_cache:
        import pyarrow.parquet as pq

        from tenzir_ray import naive

        pq.write_table(naive.decapsulate_expected(_DECAP_N, _DECAP_SEED), _DECAP_EXPECTED)
        _synth_cache["decap"] = f"SELECT * FROM read_parquet('{_DECAP_EXPECTED}')"
    return _synth_cache["decap"]


def _q_asof_forward_join(sf_dir):
    """Forward as-of: for each event, the user's EARLIEST order at or
    after the event (the negated-axis reduction to the backward path)."""
    from tenzir_ray.ops.join import asof_shuffle_join

    from ray.data.aggregate import Max

    orders = read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def prep_left(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "user_id": t["o_custkey"],
                "ts": t["o_orderdate"].cast(pa.timestamp("us")),
            }
        )

    r_ds = (
        read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "value"])
        .groupby(["user_id", "ts"])
        .aggregate(Max("value", alias_name="next_event_value"))
    )

    def prep_right(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "next_event_value": t["next_event_value"],
                "next_event_ts": t["ts"],
            }
        )

    out = asof_shuffle_join(
        orders.map_batches(prep_left, **_PYARROW),
        r_ds.map_batches(prep_right, **_PYARROW),
        on="ts",
        by="user_id",
        direction="forward",
    )
    # matched rows only (NaT never equals NaT in naive comparators;
    # LEFT-OUTER null semantics are pytest-covered)
    out = ops.where(out, "next_event_ts != null")
    return _round_cols(out, ["next_event_value"], 6)


def _q_lag(sf_dir):
    """Per-user LAG window function over events (distributed sorted
    scan with one carry row per block boundary)."""
    from tenzir_ray.ops.window import lag_col, lead_col

    ds = read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )
    out = lag_col(ds, "value", "user_id", ["ts", "event_id"], out_col="prev_value")
    out = lead_col(out, "value", "user_id", ["ts", "event_id"], out_col="next_value")
    from tenzir_ray.ops.window import cumsum_col

    out = cumsum_col(out, "value", "user_id", ["ts", "event_id"], out_col="running_value")
    from tenzir_ray.ops.window import window_ranks

    out = window_ranks(out, "user_id", ["ts", "event_id"], row_number="rn")
    # rank/dense_rank ordered by ts ONLY so ties are actually exercised
    out = window_ranks(out, "user_id", ["ts"], rank="rk", dense_rank="dr")
    out = _round_cols(out, ["value", "prev_value", "next_value"], 6)
    return _round_cols(out, ["running_value"], 4)


def _q_sessionize(sf_dir):
    from tenzir_ray.ops.window import sessionize

    ds = read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_id", "ts"])
    out = sessionize(ds, key="user_id", ts_col="ts", gap="1h")
    return ops.select(out, ["user_id", "event_id", "session_id"])


def _q_tumbling_counts(sf_dir):
    from tenzir_ray.ops.window import tumbling_count

    ds = read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    return tumbling_count(ds, key="user_id", ts_col="ts", width="1h", out_col="n")


def _q_semi_join(sf_dir):
    """Distributed left-semi join: customers with at least one order
    (both sides hash-shuffled; semi emits each left row once no matter
    how many matches)."""
    from tenzir_ray.ops.join import shuffle_join

    left = read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_name", "c_mktsegment"])
    right = read_parquet(_t(sf_dir, "orders"), columns=["o_custkey"])
    return shuffle_join(left, right, keys="c_custkey", right_keys="o_custkey", how="left semi")


def _q_anti_join(sf_dir):
    """Distributed left-anti join: customers with NO urgent orders —
    the blocklist/decontaminate-by-id shape at big-big scale."""
    from tenzir_ray.ops.join import shuffle_join

    left = read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_name", "c_mktsegment"])
    right = read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderpriority"])
    right = ops.where(right, "o_orderpriority == '1-URGENT'")
    return shuffle_join(left, right, keys="c_custkey", right_keys="o_custkey", how="left anti")


def _q_shuffle_join(sf_dir):
    """Big-big co-partitioned hash join (both sides hash-shuffled;
    no broadcast): lineitem x orders on the order key."""
    from tenzir_ray.ops.join import shuffle_join

    left = read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
    )
    right = read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"])
    out = shuffle_join(left, right, keys="l_orderkey", right_keys="o_orderkey", how="inner")
    out = ops.extend(out, {"rev": "l_extendedprice * (1 - l_discount)"})
    out = ops.select(out, ["l_orderkey", "l_linenumber", "o_orderpriority", "rev"])
    return _round_cols(out, ["rev"], 2)


def _q_hopping_counts(sf_dir):
    from tenzir_ray.ops.window import hopping_count

    ds = read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    return hopping_count(
        ds, key="user_id", ts_col="ts", width="1h", hop="15min", out_col="n"
    )


def _q_tql_lww(sf_dir):
    """TQL-driven full-row LWW (the `lww` verb -> ops.lww_latest)."""
    from tenzir_ray import tql

    ds = read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"])
    out = tql.run("lww user_id order ts,event_id | select user_id, ts, event_id, value", ds)
    return _round_cols(out, ["value"], 2)


def _q_tql_sessionize_hot(sf_dir):
    """TQL-driven sessionize over the hot-key ordered-merge path
    (sessionize_sorted): distributed (key, ts) sort + per-block flags +
    scalar boundary fix — no single giant pandas group per key."""
    from tenzir_ray import tql

    ds = read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_id", "ts"])
    return tql.run(
        "sessionize user_id ts 1h --sorted | select user_id, event_id, session_id",
        ds,
    )


def _q_tql_dedup_exact(sf_dir):
    from tenzir_ray import tql

    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text", "n_chars"])
    return tql.run("dedup-exact text doc_id", ds)


def _q_where_matches(sf_dir):
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return ops.select(ops.where(ds, 'text matches "spark"'), ["doc_id"])


def _q_tql_functions(sf_dir):
    """Scalar-function surface (expr.Call → pyarrow kernels) through
    TQL extend: string, temporal and numeric functions in one pass."""
    from tenzir_ray import tql

    ds = read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "event_type", "ts", "value"]
    )
    out = tql.run(
        "extend et_up = upper(event_type) "
        "| extend h = hour(ts) "
        "| extend vr = round(value, 2) "
        "| extend pfx = substr(event_type, 1, 2) "
        "| extend va = abs(value) "
        "| select event_id, et_up, h, vr, pfx, va",
        ds,
    )
    return _round_cols(out, ["va"], 6)


def _q_tql_revenue(sf_dir):
    from tenzir_ray import tql

    ds = read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_extendedprice", "l_discount"],
    )
    out = tql.run(
        "extend rev = l_extendedprice * (1 - l_discount) "
        "| summarize n=count(.), revenue=sum(rev) by l_returnflag "
        "| sort l_returnflag",
        ds,
    )
    return _round_cols(out, ["revenue"], 2)


def _q_tql_median_quantile(sf_dir):
    """TQL surface for the round-3 exact median/quantile and arg_max
    aggregates (VERDICT r3 item 8): the whole query is a TQL string."""
    from tenzir_ray import tql

    ds = read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_returnflag", "l_quantity", "l_orderkey"]
    )
    out = tql.run(
        "summarize med=median(l_quantity), q95=quantile_cont_0.95(l_quantity), "
        "top_order=arg_max(l_orderkey, l_quantity, l_orderkey) by l_returnflag "
        "| sort l_returnflag",
        ds,
    )
    return _round_cols(out, ["med", "q95"], 4)


_SIGMA_RULE = """
title: big purchase
detection:
  selection:
    event_type: purchase
    value|gt: 100
  condition: selection
"""


def _q_sigma_matches(sf_dir):
    from tenzir_ray import sigma

    rule_path = "/tmp/tzr_q_sigma_rule.yml"
    with open(rule_path, "w") as f:
        f.write(_SIGMA_RULE)
    ds = read_parquet(_t(sf_dir, "events"), columns=["event_id", "event_type", "value"])
    out = sigma.sigma(ds, rule_path, concurrency=1)
    return _round_cols(ops.select(out, ["event_id", "rule_title", "value"]), ["value"], 2)


def _q_compress_roundtrip(sf_dir):
    from tenzir_ray.ops.bytes import compress_op, decompress_op

    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    back = decompress_op(compress_op(ds, "text", codec="zstd"), "text", codec="zstd")

    def decode(t: pa.Table) -> pa.Table:
        i = t.column_names.index("text")
        return t.set_column(i, "text", t["text"].cast(pa.string()))

    return back.map_batches(decode, **_PYARROW)


def _q_cef_roundtrip(sf_dir):
    from tenzir_ray import formats

    ds = read_parquet(_t(sf_dir, "events"), columns=["event_id", "event_type", "user_id"])

    def to_cef(t: pa.Table) -> pa.Table:
        lines = [
            f"CEF:0|tzr|engine|1.0|{e}|{et}|5|uid={u}"
            for e, et, u in zip(
                t["event_id"].to_pylist(), t["event_type"].to_pylist(), t["user_id"].to_pylist()
            )
        ]
        return pa.table({"text": pa.array(lines)})

    parsed = formats.parse_cef(ds.map_batches(to_cef, **_PYARROW))
    return ops.select(parsed, ["signature_id", "name", "severity"])


def _q_explode(sf_dir):
    """Unnest the embedding list column to (vec_id, value) rows —
    SQL unnest parity."""
    ds = read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    out = ops.explode(ds, "embedding")
    out = ops.rename(out, {"value": "embedding"})
    return _round_cols(out, ["value"], 6)


def _q_curate(sf_dir):
    """End-to-end training-data curation flagship: quality gate →
    decontaminate → exact dedup → language mixture → sequence packing,
    all in one streaming composition (oracle = the same chain in SQL)."""
    _, bench = _docs_bench_split(sf_dir)
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text", "lang"])

    def corpus_only(t: pa.Table) -> pa.Table:
        m = t["doc_id"].to_numpy(zero_copy_only=False) % 23 != 0
        return t.filter(pa.array(m))

    corpus = ds.map_batches(corpus_only, batch_format="pyarrow")
    return curation.curate(
        corpus,
        bench,
        max_dup_word_frac=0.6,
        min_words=5,
        lang_fracs={"en": 0.9},
        default_frac=0.5,
        pack_budget=512,
    )


def _q_weighted_sample(sf_dir):
    """Training-mixture composition: deterministic per-language
    sampling rates over documents."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang", "source"])
    return curation.weighted_sample(
        ds, "lang", "doc_id", {"en": 0.8, "de": 0.4}, default_frac=0.1
    )


def _q_pack_sequences(sf_dir):
    """LLM-pretraining sequence packing: whitespace-token counts →
    contiguous 512-token bins in doc_id order (distributed sort +
    per-block-scalar prefix scan)."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    counted = ops.drop(text.token_count(ds), ["text"])
    return curation.pack_sequences(counted, "n_tokens", budget=512, order_col="doc_id")


def _q_unpivot(sf_dir):
    """Wide→long melt of three lineitem measures (SQL UNPIVOT parity)."""
    ds = read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"],
    )
    out = ops.unpivot(ds, ["l_quantity", "l_discount", "l_tax"])
    return _round_cols(out, ["value"], 6)


def _q_pivot(sf_dir):
    """Round-trip partner of unpivot_lineitem: melt three measures,
    pivot them back wide (masked-column aggregation, one shuffle)."""
    ds = read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"],
    )
    long = ops.unpivot(ds, ["l_quantity", "l_discount", "l_tax"])
    wide = ops.pivot(
        long, ["l_orderkey", "l_linenumber"], ["l_quantity", "l_discount", "l_tax"]
    )
    return _round_cols(wide, ["l_quantity", "l_discount", "l_tax"], 6)


def _q_redact(sf_dir):
    """PII scrub: synthesize a deterministic PII-bearing note per event
    (email + IPv4 + phone derived from user_id — the oracle builds the
    identical string in SQL), redact it vectorized."""
    ds = read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id"])

    def add_note(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        notes = [
            f"reach u{x}@example.com at 10.0.{x // 256}.{x % 256}"
            f" or 555-{x % 900 + 100}-{x % 9000 + 1000}"
            for x in u
        ]
        return t.append_column("note", pa.array(notes, type=pa.string()))

    return text.redact(ds.map_batches(add_note, **_PYARROW), "note")


def _q_pseudonymize(sf_dir):
    from tenzir_ray.ops.anonymize import pseudonymize

    ds = read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id"])

    def add_ip(t: pa.Table) -> pa.Table:
        ips = [f"10.0.{u // 256}.{u % 256}" for u in t["user_id"].to_pylist()]
        return t.append_column("ip", pa.array(ips))

    return pseudonymize(ds.map_batches(add_ip, **_PYARROW), ["ip"], seed="bench", concurrency=1)


def _q_subnet_filter(sf_dir):
    """ip/subnet domain types + the :ip type extractor through TQL
    (reference expression.hpp:86 type extractors, type.hpp:703,795
    ip/subnet domains): deterministic IPv4 strings synthesized from
    event_id (vectorized numpy octets + arrow string join), then
    ``where :ip in 10.64.0.0/10 || src_ip == 9.0.0.0`` — a non-/8
    prefix so real mask arithmetic is exercised."""
    import numpy as np

    from tenzir_ray import tql

    ds = read_parquet(_t(sf_dir, "events"), columns=["event_id", "event_type"])

    def add_ip(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy()
        o1, o2 = 9 + eid % 3, (eid // 3) % 256
        o3, o4 = (eid // 768) % 256, (eid * 7) % 256
        parts = [pc.cast(pa.array(o), pa.string()) for o in (o1, o2, o3, o4)]
        ip = pc.binary_join_element_wise(*parts, ".")
        return t.append_column("src_ip", ip)

    ds = ds.map_batches(add_ip, **_PYARROW)
    return tql.run(
        "where :ip in 10.64.0.0/10 || src_ip == 9.0.0.0 "
        "| summarize n=count(.), min_id=min(event_id), max_id=max(event_id) "
        "by event_type | sort event_type",
        ds,
    )


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "where_filter": _q_where,
        "project_revenue": _q_project,
        "summarize_q1": _q_summarize_q1,
        "summarize_by_hour": _q_summarize_by_hour,
        "median_quantile_lineitem": _q_median_quantile,
        "range_join_events": _q_range_join,
        "range_shuffle_join_events": _q_range_shuffle_join,
        "top_event_types": _q_top,
        "rare_event_types": _q_rare,
        "sort_head_orders": _q_sort_head,
        "tail_orders": _q_tail,
        "taste_per_priority": _q_taste,
        "unique_consecutive": _q_unique_consecutive,
        "enumerate_nations": _q_enumerate,
        "count_distinct_segments": _q_count_distinct,
        "minmax_dates": _q_minmax_dates,
        "any_all_big": _q_any_all,
        "hash_documents": _q_hash_docs,
        "rename_extend_replace": _q_rename_extend_replace,
        "flatten_struct": _q_flatten,
        "parse_props": _q_parse_props,
        "lww_latest_event_per_user": _q_lww_latest_event,
        "argmax_order_price": _q_argmax_order_price,
        "dedup_exact_docs": _q_dedup_exact,
        "token_count_docs": _q_token_count,
        "bpe_token_count_docs": _q_bpe_token_count,
        "fingerprint_docs": _q_fingerprint,
        "quality_docs": _q_quality,
        "lang_id_docs": _q_lang_id,
        "decontaminate_docs": _q_decontaminate,
        "repetition_docs": _q_repetition,
        "stratified_sample_events": _q_stratified_sample,
        "sample_fraction_events": _q_sample_fraction,
        "dedup_minhash_docs": _q_dedup_minhash,
        "dedup_minhash_docs_exchange": _q_dedup_minhash_exchange,
        "dedup_ngram_jaccard_docs": _q_dedup_ngram,
        "dedup_simhash_docs": _q_dedup_simhash,
        "dedup_embedding_vecs": _q_dedup_embedding,
        "ann_brute_top10": _q_ann_brute,
        "ann_ivf_top10": _q_ann_ivf,
        "ann_ivf_saved_top10": _q_ann_ivf_saved,
        "cdc_replay": _cdc_replay_query,
        "where_matches": _q_where_matches,
        "tql_revenue_by_flag": _q_tql_revenue,
        "sigma_matches": _q_sigma_matches,
        "compress_roundtrip_docs": _q_compress_roundtrip,
        "cef_roundtrip": _q_cef_roundtrip,
        "pseudonymize_ips": _q_pseudonymize,
        "decapsulate_packets": _q_decapsulate,
        "lookup_join_orders": _q_lookup_join,
        "asof_join_events_orders": _q_asof_join,
        "asof_shuffle_join_events": _q_asof_shuffle_join,
        "asof_forward_join_events": _q_asof_forward_join,
        "sessionize_events": _q_sessionize,
        "lag_events": _q_lag,
        "tumbling_counts": _q_tumbling_counts,
        "shuffle_join_lineitem_orders": _q_shuffle_join,
        "semi_join_customers_orders": _q_semi_join,
        "redact_events": _q_redact,
        "explode_embeddings": _q_explode,
        "unpivot_lineitem": _q_unpivot,
        "pivot_lineitem": _q_pivot,
        "pack_sequences_docs": _q_pack_sequences,
        "weighted_sample_docs": _q_weighted_sample,
        "curate_docs": _q_curate,
        "anti_join_customers_orders": _q_anti_join,
        "hopping_counts": _q_hopping_counts,
        "tql_sessionize_hot": _q_tql_sessionize_hot,
        "tql_lww_latest": _q_tql_lww,
        "tql_dedup_exact": _q_tql_dedup_exact,
        "tql_subnet_filter": _q_subnet_filter,
        "tql_median_quantile": _q_tql_median_quantile,
        "tql_scalar_functions": _q_tql_functions,
    }


# SQL fragments shared by quality_docs (must mirror text.quality_score)
_W = r"len(regexp_extract_all(text, '\S+'))"
_P = r"len(regexp_extract_all(text, '[^\w\s]'))"
_S = r"len(regexp_extract_all(text, '(?i)\b(?:the|and|of|to|a|in|is|that|it|for)\b'))"

# ---------------------------------------------------------------------------
# synthesized oracles (tenzir_ray.naive reference implementations → SQL)
#
# The keyed-PRF / hyperplane / bit-sketch pipelines have no native SQL
# expression, so their oracles are INDEPENDENT single-process NumPy
# implementations of the same published algorithms (tenzir_ray/naive.py
# — all-pairs, no Ray, no shared code with the operators) whose results
# are embedded into runnable SQL. Loser lists are keyed by an
# order-independent content probe (sum of per-row hashes) so the SQL
# binds to the EXACT table the driver registered: on an unrecognized
# corpus the guard yields zero rows — a loud rows_match failure, never
# a silent pass.
# ---------------------------------------------------------------------------

def _oracle_sfs(table_file: str) -> tuple:
    """SF dirs to embed loser-list branches for: every /root/testdata
    SF that carries the table, plus $GRAFT_SF_DIR if it points
    elsewhere — so the probe guard covers whichever corpus the driver
    (or a bench run) registers instead of a fixed sf0.001/sf0.01 pair."""
    import glob as _glob

    dirs = sorted(
        d for d in _glob.glob("/root/testdata/sf*")
        if os.path.isfile(os.path.join(d, table_file))
    )
    extra = os.environ.get("GRAFT_SF_DIR")
    if extra and extra not in dirs and os.path.isfile(os.path.join(extra, table_file)):
        dirs.append(extra)
    return tuple(dirs)


_synth_cache: dict[str, str] = {}


def _probe_expr(table: str, col: str) -> str:
    """Order-independent corpus fingerprint: sum of per-row value
    hashes (DuckDB sum→hugeint, exact; hash() stable per version)."""
    return f"(SELECT sum(hash(CAST({col} AS VARCHAR))) FROM {table})"


def _probe_value(parquet: str, table: str, col: str) -> int:
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{parquet}')")
    return int(con.execute(_probe_expr(table, col).strip("()")).fetchone()[0])


def _inlist_oracle(table: str, id_col: str, probe_col: str,
                   branches: dict[int, set]) -> str:
    """Survivor query: all ids minus the per-probe loser list; rows
    only when the live probe matches a known corpus."""
    probe = _probe_expr(table, probe_col)
    rows = [f"({p}, -1)" for p in branches]  # sentinel: ids are >= 0
    rows += [f"({p}, {i})" for p, losers in branches.items() for i in sorted(losers)]
    probes = ", ".join(str(p) for p in branches)
    return f"""
        SELECT {id_col} FROM {table}
        WHERE {probe} IN ({probes})
          AND {id_col} NOT IN (
            SELECT l FROM (VALUES {', '.join(rows)}) t(p, l) WHERE p = {probe})
    """


def _simhash_oracle() -> str:
    if "simhash" not in _synth_cache:
        from tenzir_ray import naive

        branches = {
            _probe_value(f"{sf}/documents.parquet", "documents", "text"):
                naive.simhash_losers(f"{sf}/documents.parquet", max_hamming=2)
            for sf in _oracle_sfs("documents.parquet")
        }
        _synth_cache["simhash"] = _inlist_oracle("documents", "doc_id", "text", branches)
    return _synth_cache["simhash"]


def _embedding_oracle() -> str:
    if "embedding" not in _synth_cache:
        from tenzir_ray import naive

        branches = {
            _probe_value(f"{sf}/embeddings.parquet", "embeddings", "embedding"):
                naive.embedding_losers(f"{sf}/embeddings.parquet", threshold=0.999)
            for sf in _oracle_sfs("embeddings.parquet")
        }
        _synth_cache["embedding"] = _inlist_oracle("embeddings", "vec_id", "embedding", branches)
    return _synth_cache["embedding"]


def _pseudonymize_oracle() -> str:
    """Keyed-PRF Crypto-PAn has no SQL form; the naive reference
    computes the full user_id→pseudonym map (ids 0..1499 cover every
    SF's domain) embedded as a VALUES join — SF-independent because
    the pseudonym depends only on user_id."""
    if "pan" not in _synth_cache:
        from tenzir_ray import naive

        rows = ", ".join(
            f"({u}, '{naive.pan_pseudonym(f'10.0.{u // 256}.{u % 256}', seed='bench')}')"
            for u in range(1500)
        )
        _synth_cache["pan"] = f"""
            SELECT e.event_id, e.user_id, m.ip
            FROM events e JOIN (VALUES {rows}) m(uid, ip) ON e.user_id = m.uid
        """
    return _synth_cache["pan"]


def _cdc_oracle() -> str:
    """Single-pass DuckDB LWW materialization of the deterministic
    query binlog (mirrors tenzir_ray/cdc/oracle.py::materialize,
    evolved schema): per (repo, path) the max-(commit_seq, offset)
    event, tombstones dropped, lang enriched, sha256 stamped."""
    from tenzir_ray.cdc.oracle import _LANG_CASE

    _ensure_binlog(_QUERY_BINLOG, **_QUERY_BINLOG_KW)
    return f"""
        SELECT repo, path, commit, coalesce(lang, {_LANG_CASE}) AS lang,
               content, commit_seq, sha256(content) AS content_sha256,
               branch, size_bytes
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY repo, path ORDER BY commit_seq DESC, "offset" DESC
            ) AS rn
            FROM read_parquet('{_QUERY_BINLOG}/part-*.parquet', union_by_name=true)
        )
        WHERE rn = 1 AND op <> 'delete'
        ORDER BY repo, path
    """


# exact shingle-level Jaccard (k=5 over whitespace-normalized lowered
# text) + recursive-CTE connected components, min-id winner per
# component — the LSH pipeline's exact counterpart (validated equal at
# sf0.001/0.01/0.1)
_MINHASH_ORACLE = r"""
    WITH RECURSIVE norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             substr(t, CAST(unnest(range(1, greatest(len(t) - 4, 1) + 1)) AS INT), 5) AS s
      FROM norm
    ),
    cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT u, v FROM inter
      JOIN cnt ca ON ca.doc_id = u JOIN cnt cb ON cb.doc_id = v
      WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= 0.8
    ),
    bi AS (SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT b.v, reach.r FROM reach JOIN bi b ON b.u = reach.id
    ),
    roots AS (SELECT id, min(r) AS root FROM reach GROUP BY id)
    SELECT doc_id FROM documents JOIN roots ON doc_id = roots.id
    WHERE doc_id = roots.root
"""

# exact word-3-gram Jaccard (words = [a-z0-9]+ runs of lowered text;
# docs with 1-2 words contribute their whole word list as one shingle,
# matching dedup._word_ngram_sets) + recursive-CTE connected
# components, min-id winner — the exact counterpart of the
# prefix-filtered engine pipeline (hash collisions aside, which the
# driver gate would surface)
_NGRAM_ORACLE = r"""
    WITH RECURSIVE wd AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS s
      FROM (
        SELECT doc_id, w,
               CAST(unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS INT) AS i
        FROM wd WHERE len(w) >= 1
      )
    ),
    cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT u, v FROM inter
      JOIN cnt ca ON ca.doc_id = u JOIN cnt cb ON cb.doc_id = v
      WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= 0.6
    ),
    bi AS (SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT b.v, reach.r FROM reach JOIN bi b ON b.u = reach.id
    ),
    roots AS (SELECT id, min(r) AS root FROM reach GROUP BY id)
    SELECT doc_id FROM documents JOIN roots ON doc_id = roots.id
    WHERE doc_id = roots.root
"""


# stopword-profile language ID — the same heuristic as text.LangId in
# pure SQL: first 400 lowered word tokens, per-language stopword hit
# counts, first-max-wins argmax (en > de > fr > es on ties)
_LANG_ID_ORACLE = r"""
    WITH w AS (
      SELECT doc_id, text,
             list_slice(regexp_extract_all(lower(text), '[a-zàâéèêëïîôùûüöäßñ]+'), 1, 400) AS words
      FROM documents
    ), s AS (
      SELECT doc_id, text, len(words) AS nw,
        len(list_filter(words, x -> x IN ('the','and','of','to','a','in','is','that','it','for'))) AS s_en,
        len(list_filter(words, x -> x IN ('der','die','das','und','ist','nicht','ein','mit','den','zu'))) AS s_de,
        len(list_filter(words, x -> x IN ('le','la','les','et','est','un','une','des','que','pour'))) AS s_fr,
        len(list_filter(words, x -> x IN ('el','la','los','y','es','un','una','de','que','por'))) AS s_es
      FROM w
    )
    SELECT doc_id, CASE
        WHEN text IS NULL OR len(text) = 0 THEN NULL
        WHEN nw = 0 THEN NULL
        WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'unknown'
        WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
        WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
        WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS lang_pred
    FROM s
"""


# exact cosine top-10 for vec_id 0 — oracle for brute ANN and for both
# benchmark decontamination: same word-3-gram semantics as
# _NGRAM_ORACLE's sh CTE (lowered [a-z0-9]+ words, <3-word docs
# contribute one whole-doc shingle); benchmark side = doc_id % 23 == 0
_DECONTAMINATE_ORACLE = r"""
    WITH wd AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS s
      FROM (
        SELECT doc_id, w,
               CAST(unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS INT) AS i
        FROM wd WHERE len(w) >= 1
      )
    ),
    b AS (SELECT DISTINCT s FROM sh WHERE doc_id % 23 = 0),
    hits AS (
      SELECT sh.doc_id, count(*) AS n_hits
      FROM sh JOIN b ON sh.s = b.s WHERE sh.doc_id % 23 != 0 GROUP BY 1
    )
    SELECT d.doc_id, coalesce(h.n_hits, 0) > 0 AS contaminated,
           coalesce(h.n_hits, 0) AS n_hits
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % 23 != 0
"""

# within-document repetition signals over the same word definition
_REPETITION_ORACLE = f"""
    WITH w AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS words
      FROM documents
    ),
    tok AS (SELECT doc_id, unnest(words) AS t FROM w),
    ts AS (SELECT doc_id, count(*) AS nw, count(DISTINCT t) AS ndw
           FROM tok GROUP BY 1),
    topw AS (SELECT doc_id, max(c) AS topc
             FROM (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2)
             GROUP BY 1),
    bi AS (
      SELECT doc_id, array_to_string(list_slice(words, i, i + 1), ' ') AS b
      FROM (SELECT doc_id, words, CAST(unnest(range(1, len(words))) AS INT) AS i
            FROM w WHERE len(words) >= 2)
    ),
    bs AS (SELECT doc_id, count(*) AS nb, count(DISTINCT b) AS ndb
           FROM bi GROUP BY 1)
    SELECT d.doc_id,
           coalesce(ts.nw, 0) AS n_words,
           {_sqlr('CAST(ts.nw - ts.ndw AS DOUBLE) / ts.nw', 6)} AS dup_word_frac,
           {_sqlr('CAST(topw.topc AS DOUBLE) / ts.nw', 6)} AS top_word_frac,
           {_sqlr('CAST(bs.nb - bs.ndb AS DOUBLE) / bs.nb', 6)} AS dup_2gram_frac
    FROM documents d LEFT JOIN ts ON d.doc_id = ts.doc_id
    LEFT JOIN topw ON d.doc_id = topw.doc_id
    LEFT JOIN bs ON d.doc_id = bs.doc_id
"""

# deterministic sampling rank shared with curation._sample_rank —
# exact BIGINT arithmetic, reproducible on both sides
_STRATIFIED_ORACLE = """
    SELECT event_id, user_id, event_type FROM events
    QUALIFY row_number() OVER (
      PARTITION BY event_type
      ORDER BY (event_id * 2654435761) % 1000000007, event_id) <= 50
"""

_SAMPLE_FRACTION_ORACLE = """
    SELECT event_id, user_id, event_type FROM events
    WHERE (event_id * 2654435761) % 1000000007
          < CAST(floor(0.1 * 1000000007) AS BIGINT)
"""


# IVF variants (which are exact when nprobe == n_lists)
_ANN_EXACT_SQL = f"""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
    SELECT row_number() OVER (
               ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
                        e.vec_id ASC) - 1 AS rank,
           e.vec_id,
           {_sqlr("list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[])", 4)} AS score
    FROM embeddings e, q
    ORDER BY rank LIMIT 10
"""


def oracle_sql() -> dict[str, str]:
    bpe_re = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
    return {
        "where_filter": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_discount
            FROM lineitem WHERE l_quantity > 30 AND l_discount < 0.05
        """,
        "project_revenue": f"""
            SELECT l_orderkey, l_linenumber,
                   {_sqlr('l_extendedprice * (1 - l_discount)')} AS revenue
            FROM lineitem
        """,
        "summarize_q1": f"""
            SELECT l_returnflag, l_linestatus,
                   {_sqlr('sum(l_quantity)')} AS sum_qty,
                   {_sqlr('sum(l_extendedprice)')} AS sum_base_price,
                   {_sqlr('sum(l_extendedprice * (1 - l_discount))')} AS sum_disc_price,
                   {_sqlr('avg(l_quantity)')} AS avg_qty,
                   {_sqlr('avg(l_extendedprice)')} AS avg_price,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "range_join_events": """
            WITH iv AS (
              SELECT event_id AS iv_id, ts AS lo, ts + INTERVAL 1 HOUR AS hi
              FROM events WHERE event_id % 101 = 0
            )
            SELECT e.event_id, iv.iv_id
            FROM events e JOIN iv ON e.ts >= iv.lo AND e.ts <= iv.hi
            ORDER BY e.event_id, iv.iv_id
        """,
        "range_shuffle_join_events": """
            WITH iv AS (
              SELECT event_id AS iv_id, ts AS lo, ts + INTERVAL 2 HOUR AS hi
              FROM events WHERE event_id % 29 = 0
            )
            SELECT e.event_id, count(iv.iv_id) AS n_windows
            FROM events e JOIN iv ON e.ts >= iv.lo AND e.ts <= iv.hi
            GROUP BY e.event_id
            ORDER BY e.event_id
        """,
        "median_quantile_lineitem": """
            SELECT l_returnflag,
                   round(median(l_quantity), 4) AS med_qty,
                   round(quantile_cont(l_discount, 0.95), 4) AS p95_disc
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "tql_scalar_functions": f"""
            SELECT event_id, upper(event_type) AS et_up,
                   hour(ts) AS h,
                   floor(value * 100 + 0.5) / 100 AS vr,
                   substr(event_type, 1, 2) AS pfx,
                   {_sqlr('abs(value)', 6)} AS va
            FROM events
        """,
        "tql_median_quantile": """
            SELECT l_returnflag,
                   round(median(l_quantity), 4) AS med,
                   round(quantile_cont(l_quantity, 0.95), 4) AS q95,
                   first(l_orderkey ORDER BY l_quantity DESC, l_orderkey DESC) AS top_order
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "summarize_by_hour": f"""
            SELECT date_trunc('hour', ts) AS ts, count(*) AS n,
                   {_sqlr('sum(value)')} AS sum_value
            FROM events GROUP BY 1
        """,
        "top_event_types": """
            SELECT event_type, count(*) AS count FROM events
            GROUP BY event_type ORDER BY count DESC, event_type ASC LIMIT 3
        """,
        "rare_event_types": """
            SELECT event_type, count(*) AS count FROM events
            GROUP BY event_type ORDER BY count ASC, event_type ASC LIMIT 3
        """,
        "sort_head_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "tail_orders": """
            SELECT o_orderkey, o_orderdate FROM orders
            ORDER BY o_orderkey DESC LIMIT 5
        """,
        "taste_per_priority": """
            SELECT o_orderpriority, o_orderkey FROM orders
            QUALIFY row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) <= 2
        """,
        "unique_consecutive": """
            SELECT event_type FROM (
                SELECT event_type, lag(event_type) OVER (ORDER BY event_id) AS prev
                FROM events)
            WHERE prev IS NULL OR event_type <> prev
        """,
        "enumerate_nations": """
            SELECT row_number() OVER (ORDER BY n_nationkey) - 1 AS row_id,
                   n_nationkey, n_name, n_regionkey
            FROM nation
        """,
        "count_distinct_segments": """
            SELECT c_nationkey, count(DISTINCT c_mktsegment) AS n_segments,
                   count(*) AS n_customers
            FROM customer GROUP BY c_nationkey
        """,
        "minmax_dates": f"""
            SELECT o_orderpriority, min(o_orderdate) AS min_date,
                   max(o_orderdate) AS max_date,
                   {_sqlr('max(o_totalprice)')} AS max_price
            FROM orders GROUP BY o_orderpriority
        """,
        "any_all_big": """
            SELECT event_type, bool_or(value > 100) AS any_big,
                   bool_and(value > 100) AS all_big
            FROM events GROUP BY event_type
        """,
        "hash_documents": """
            SELECT doc_id, sha256(text) AS text_hash FROM documents
        """,
        "rename_extend_replace": """
            SELECT r_regionkey * 10 AS r_regionkey, r_name AS region_name,
                   r_regionkey + 100 AS key_plus_100
            FROM region
        """,
        "flatten_struct": """
            SELECT event_id, event_type AS "meta.event_type", value AS "meta.value"
            FROM events
        """,
        "parse_props": """
            SELECT event_id, CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k
            FROM events
        """,
        "lww_latest_event_per_user": f"""
            SELECT user_id, ts, event_id, event_type, {_sqlr('value')} AS value
            FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "argmax_order_price": """
            SELECT o_orderpriority, o_orderkey AS top_order FROM orders
            QUALIFY row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey DESC) = 1
        """,
        "dedup_exact_docs": """
            SELECT doc_id, text, n_chars FROM documents
            QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
        """,
        "token_count_docs": r"""
            SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens
            FROM documents
        """,
        "bpe_token_count_docs": f"""
            SELECT doc_id, len(regexp_extract_all(text, '{bpe_re}')) AS n_bpe_tokens
            FROM documents
        """,
        "fingerprint_docs": r"""
            SELECT doc_id,
                   sha256(array_to_string(list_sort(list_distinct(
                       regexp_extract_all(lower(text), '\w+'))), ' ')) AS fingerprint
            FROM documents
        """,
        "quality_docs": f"""
            SELECT doc_id,
                   {_sqlr(_P + " / greatest(len(text), 1)", 6)} AS punct_ratio,
                   {_sqlr(_S + " / greatest(" + _W + ", 1)", 6)} AS stop_ratio,
                   {_sqlr("len(text) / greatest(" + _W + ", 1)", 6)} AS mean_word_len,
                   {_sqlr(
                       "(least(" + _W + " / 100.0, 1.0)"
                       " + least(3.0 * " + _S + " / greatest(" + _W + ", 1), 1.0)"
                       " + (1.0 - least(4.0 * " + _P + " / greatest(len(text), 1), 1.0))) / 3.0",
                       6,
                   )} AS quality
            FROM documents
        """,
        "ann_brute_top10": _ANN_EXACT_SQL,
        "where_matches": """
            SELECT doc_id FROM documents WHERE regexp_matches(text, 'spark')
        """,
        "tql_revenue_by_flag": f"""
            SELECT l_returnflag, count(*) AS n,
                   {_sqlr('sum(l_extendedprice * (1 - l_discount))')} AS revenue
            FROM lineitem GROUP BY l_returnflag
        """,
        "sigma_matches": f"""
            SELECT event_id, 'big purchase' AS rule_title, {_sqlr('value')} AS value
            FROM events WHERE event_type = 'purchase' AND value > 100
        """,
        "compress_roundtrip_docs": """
            SELECT doc_id, text FROM documents
        """,
        "cef_roundtrip": """
            SELECT CAST(event_id AS VARCHAR) AS signature_id,
                   event_type AS name, '5' AS severity
            FROM events
        """,
        "lag_events": f"""
            SELECT event_id, user_id, ts, {_sqlr('value', 6)} AS value,
                   {_sqlr('LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)', 6)}
                       AS prev_value,
                   {_sqlr('LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)', 6)}
                       AS next_value,
                   {_sqlr('SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)', 4)}
                       AS running_value,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS rn,
                   RANK() OVER (PARTITION BY user_id ORDER BY ts) AS rk,
                   DENSE_RANK() OVER (PARTITION BY user_id ORDER BY ts) AS dr
            FROM events
        """,
        "sessionize_events": """
            SELECT user_id, event_id,
                   CAST(SUM(new_s) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM (
                SELECT user_id, event_id, ts,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                 > INTERVAL 1 HOUR THEN 1 ELSE 0 END AS new_s
                FROM events)
        """,
        "tumbling_counts": """
            SELECT user_id, date_trunc('hour', ts) AS ts, count(*) AS n
            FROM events GROUP BY 1, 2
        """,
        "curate_docs": r"""
            WITH w AS (
              SELECT doc_id, text, lang,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS words
              FROM documents WHERE doc_id % 23 != 0
            ),
            tok AS (SELECT doc_id, unnest(words) AS t FROM w),
            ts AS (SELECT doc_id, count(*) AS nw, count(DISTINCT t) AS ndw
                   FROM tok GROUP BY 1),
            gated AS (
              SELECT w.doc_id, w.text, w.lang, ts.nw AS n_words
              FROM w JOIN ts ON w.doc_id = ts.doc_id
              WHERE ts.nw >= 5
                AND CAST(ts.nw - ts.ndw AS DOUBLE) / ts.nw <= 0.6
            ),
            allw AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS words
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_slice(words, i, i + 2), ' ') AS s
              FROM (
                SELECT doc_id, words,
                       CAST(unnest(range(1, greatest(len(words) - 2, 1) + 1)) AS INT) AS i
                FROM allw WHERE len(words) >= 1
              )
            ),
            b AS (SELECT DISTINCT s FROM sh WHERE doc_id % 23 = 0),
            clean AS (
              SELECT g.* FROM gated g
              WHERE NOT EXISTS (
                SELECT 1 FROM sh JOIN b ON sh.s = b.s WHERE sh.doc_id = g.doc_id
              )
            ),
            dd AS (
              SELECT * FROM clean
              QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
            ),
            sampled AS (
              SELECT * FROM dd
              WHERE (doc_id * 2654435761) % 1000000007 <
                    CAST(floor(CASE lang WHEN 'en' THEN 0.9
                                         ELSE 0.5 END * 1000000007) AS BIGINT)
            ),
            counted AS (
              SELECT doc_id, lang, n_words,
                     len(regexp_extract_all(text, '\S+')) AS n_tokens
              FROM sampled
            )
            SELECT doc_id, lang, CAST(n_words AS BIGINT) AS n_words,
                   CAST(n_tokens AS BIGINT) AS n_tokens,
                   coalesce(sum(n_tokens) OVER (
                     ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   // 512 AS bin_id
            FROM counted
        """,
        "weighted_sample_docs": """
            SELECT doc_id, lang, source FROM documents
            WHERE (doc_id * 2654435761) % 1000000007 <
                  CAST(floor(CASE lang WHEN 'en' THEN 0.8
                                       WHEN 'de' THEN 0.4
                                       ELSE 0.1 END * 1000000007) AS BIGINT)
        """,
        "pack_sequences_docs": r"""
            WITH t AS (
              SELECT doc_id,
                     len(regexp_extract_all(text, '\S+')) AS n_tokens
              FROM documents
            )
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   coalesce(sum(n_tokens) OVER (
                     ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   // 512 AS bin_id
            FROM t
        """,
        "pivot_lineitem": f"""
            SELECT l_orderkey, l_linenumber,
                   {_sqlr('max(l_quantity)', 6)} AS l_quantity,
                   {_sqlr('max(l_discount)', 6)} AS l_discount,
                   {_sqlr('max(l_tax)', 6)} AS l_tax
            FROM lineitem GROUP BY 1, 2
        """,
        "unpivot_lineitem": f"""
            SELECT l_orderkey, l_linenumber, name,
                   {_sqlr('value', 6)} AS value
            FROM (
              SELECT l_orderkey, l_linenumber,
                     'l_quantity' AS name, l_quantity AS value FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_linenumber,
                     'l_discount', l_discount FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_linenumber,
                     'l_tax', l_tax FROM lineitem
            )
        """,
        "explode_embeddings": f"""
            SELECT vec_id,
                   {_sqlr('unnest(embedding)::DOUBLE', 6)} AS value
            FROM embeddings
        """,
        "redact_events": r"""
            WITH n AS (
              SELECT event_id, user_id,
                     'reach u' || user_id || '@example.com at 10.0.' ||
                     (user_id // 256) || '.' || (user_id % 256) ||
                     ' or 555-' || (user_id % 900 + 100) || '-' ||
                     (user_id % 9000 + 1000) AS note
              FROM events
            )
            SELECT event_id, user_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(note,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                         '<EMAIL>', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                     '\+?\d{1,2}[- ]?\d{3}[- ]\d{3}[- ]\d{4}|\b\d{3}[- ]\d{3}[- ]\d{4}\b',
                     '<PHONE>', 'g') AS note
            FROM n
        """,
        "semi_join_customers_orders": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "anti_join_customers_orders": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT')
        """,
        "shuffle_join_lineitem_orders": f"""
            SELECT l_orderkey, l_linenumber, o_orderpriority,
                   {_sqlr('l_extendedprice * (1 - l_discount)')} AS rev
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        """,
        "hopping_counts": """
            SELECT user_id,
                   TIMESTAMP '1970-01-01' + to_seconds(CAST(
                       floor(epoch(ts)/900)*900 - 900*g.i AS BIGINT)) AS ts,
                   count(*) AS n
            FROM events, (SELECT unnest(range(0, 4)) AS i) g
            GROUP BY 1, 2
        """,
        "tql_lww_latest": f"""
            SELECT user_id, ts, event_id, {_sqlr('value')} AS value
            FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "tql_sessionize_hot": """
            SELECT user_id, event_id,
                   CAST(SUM(new_s) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM (
                SELECT user_id, event_id, ts,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                 > INTERVAL 1 HOUR THEN 1 ELSE 0 END AS new_s
                FROM events)
        """,
        "tql_subnet_filter": """
            WITH w AS (
                SELECT event_id, event_type,
                       CAST(9 + event_id % 3 AS VARCHAR) || '.' ||
                       CAST((event_id // 3) % 256 AS VARCHAR) || '.' ||
                       CAST((event_id // 768) % 256 AS VARCHAR) || '.' ||
                       CAST((event_id * 7) % 256 AS VARCHAR) AS src_ip
                FROM events)
            SELECT event_type, count(*) AS n,
                   min(event_id) AS min_id, max(event_id) AS max_id
            FROM w
            WHERE (CAST(split_part(src_ip, '.', 1) AS BIGINT) * 16777216
                 + CAST(split_part(src_ip, '.', 2) AS BIGINT) * 65536
                 + CAST(split_part(src_ip, '.', 3) AS BIGINT) * 256
                 + CAST(split_part(src_ip, '.', 4) AS BIGINT))
                  BETWEEN 171966464 AND 176160767  -- 10.64.0.0/10
               OR src_ip = '9.0.0.0'
            GROUP BY event_type ORDER BY event_type
        """,
        "tql_dedup_exact": """
            SELECT doc_id, text, n_chars FROM documents
            QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
        """,
        "lang_id_docs": _LANG_ID_ORACLE,
        "decontaminate_docs": _DECONTAMINATE_ORACLE,
        "repetition_docs": _REPETITION_ORACLE,
        "stratified_sample_events": _STRATIFIED_ORACLE,
        "sample_fraction_events": _SAMPLE_FRACTION_ORACLE,
        "dedup_minhash_docs": _MINHASH_ORACLE,
        "dedup_minhash_docs_exchange": _MINHASH_ORACLE,
        "dedup_ngram_jaccard_docs": _NGRAM_ORACLE,
        "dedup_simhash_docs": _simhash_oracle(),
        "dedup_embedding_vecs": _embedding_oracle(),
        "pseudonymize_ips": _pseudonymize_oracle(),
        "decapsulate_packets": _decapsulate_oracle(),
        "lookup_join_orders": f"""
            SELECT o_orderkey, o_custkey, {_sqlr('o_totalprice')} AS o_totalprice,
                   c_name, c_mktsegment
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        """,
        "asof_join_events_orders": f"""
            WITH r AS (
                SELECT o_custkey AS user_id, CAST(o_orderdate AS TIMESTAMP) AS ts,
                       max(o_totalprice) AS last_order_price
                FROM orders GROUP BY 1, 2
            )
            SELECT e.event_id, e.user_id, e.ts,
                   {_sqlr('r.last_order_price')} AS last_order_price,
                   r.ts AS last_order_ts
            FROM events e ASOF LEFT JOIN r
                ON e.user_id = r.user_id AND e.ts >= r.ts
        """,
        "asof_forward_join_events": f"""
            WITH r AS (
                SELECT user_id, ts, max(value) AS next_event_value
                FROM events GROUP BY 1, 2
            )
            SELECT o.o_orderkey, o.o_custkey AS user_id,
                   CAST(o.o_orderdate AS TIMESTAMP) AS ts,
                   {_sqlr('r.next_event_value', 6)} AS next_event_value,
                   r.ts AS next_event_ts
            FROM orders o ASOF JOIN r
                ON o.o_custkey = r.user_id
               AND CAST(o.o_orderdate AS TIMESTAMP) <= r.ts
        """,
        "asof_shuffle_join_events": f"""
            WITH r AS (
                SELECT o_custkey AS user_id, CAST(o_orderdate AS TIMESTAMP) AS ts,
                       max(o_totalprice) AS last_order_price
                FROM orders GROUP BY 1, 2
            )
            SELECT e.event_id, e.user_id, e.ts,
                   {_sqlr('r.last_order_price')} AS last_order_price,
                   r.ts AS last_order_ts
            FROM events e ASOF LEFT JOIN r
                ON e.user_id = r.user_id AND e.ts >= r.ts
        """,
        "cdc_replay": _cdc_oracle(),
        # ann_ivf with nprobe == n_lists probes every list → exact
        # top-k; both IVF variants share the brute-force SQL oracle
        # (equality verified at sf0.001/0.01)
        "ann_ivf_top10": _ANN_EXACT_SQL,
        "ann_ivf_saved_top10": _ANN_EXACT_SQL,
    }
