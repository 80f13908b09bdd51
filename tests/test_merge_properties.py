"""Property-based tests for the LWW merge kernels (hypothesis).

The merge's correctness rests on LWW-per-key being associative and
commutative over arbitrary batchings/saltings — these properties are
what make map-side combining, salted pre-reduce, and retry-duplicated
fragments all safe. The reference has no property tests (SURVEY.md §5);
this goes beyond its golden-only strategy.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from tenzir_ray.cdc.merge import combiner_batch, lww_reduce

KEYS = [("r0", "a"), ("r0", "b"), ("r1", "a"), ("r1", "b"), ("r2", "x")]


def make_events(choices):
    """choices: list of (key_idx, op_idx). commit_seq = position."""
    rows = {
        "offset": list(range(len(choices))),
        "commit_seq": list(range(len(choices))),
        "repo": [KEYS[k][0] for k, _ in choices],
        "path": [KEYS[k][1] for k, _ in choices],
        "op": [["insert", "update", "delete"][o] for _, o in choices],
        "content": [f"c{i}" for i in range(len(choices))],
    }
    t = pa.table(rows)
    # the _key/_bucket columns the combiner expects (same formula as parse)
    from tenzir_ray.cdc.lake import key_hash64

    keys = np.array(
        [key_hash64(r.encode(), p.encode()) for r, p in zip(rows["repo"], rows["path"])],
        dtype=np.uint64,
    )
    t = t.append_column("_bucket", pa.array((keys % np.uint64(4)).astype(np.int64)))
    return t.append_column("_key", pa.array(keys))


def oracle(t: pa.Table) -> set:
    """Live keys + their winning commit_seq per plain argmax."""
    df = t.to_pandas()
    win = df.loc[df.groupby(["repo", "path"])["commit_seq"].idxmax()]
    win = win[win["op"] != "delete"]
    return set(zip(win["repo"], win["path"], win["commit_seq"]))


def result_set(t: pa.Table) -> set:
    t = t.filter(pa.compute.not_equal(t["op"], "delete"))
    return set(zip(t["repo"].to_pylist(), t["path"].to_pylist(), t["commit_seq"].to_pylist()))


events_strategy = st.lists(
    st.tuples(st.integers(0, len(KEYS) - 1), st.integers(0, 2)), min_size=1, max_size=60
)


@settings(max_examples=200, deadline=None)
@given(events_strategy, st.integers(1, 10))
def test_batched_combine_equals_direct(choices, n_batches):
    """Combining per arbitrary batch then reducing == one-shot reduce."""
    t = make_events(choices)
    cuts = np.linspace(0, t.num_rows, n_batches + 1).astype(int)
    pieces = [
        combiner_batch(t.slice(lo, hi - lo), {}, -1)
        for lo, hi in zip(cuts[:-1], cuts[1:])
        if hi > lo
    ]
    recombined = lww_reduce(pa.concat_tables(pieces))
    assert result_set(recombined) == oracle(t)


@settings(max_examples=100, deadline=None)
@given(events_strategy, st.integers(2, 5))
def test_salted_partials_compose(choices, num_salts):
    """Salted pre-reduce (groupby key%salt) then coalesce == direct."""
    t = make_events(choices)
    salt = np.array(t["commit_seq"].to_pylist()) % num_salts
    partials = [
        lww_reduce(t.filter(pa.array(salt == s))) for s in range(num_salts) if (salt == s).any()
    ]
    final = lww_reduce(pa.concat_tables(partials))
    assert result_set(final) == oracle(t)


@settings(max_examples=100, deadline=None)
@given(events_strategy, st.integers(0, 59))
def test_duplicate_delivery_is_idempotent(choices, dup_at):
    """Replaying a suffix of events verbatim changes nothing."""
    t = make_events(choices)
    dup_at = min(dup_at, t.num_rows - 1)
    with_dups = pa.concat_tables([t, t.slice(dup_at)])
    assert result_set(lww_reduce(with_dups)) == oracle(t)


@settings(max_examples=100, deadline=None)
@given(events_strategy)
def test_hwm_filter_drops_applied(choices):
    """Events at or below the applied_through offset never re-apply."""
    t = make_events(choices)
    mid = t.num_rows // 2
    out = combiner_batch(t, {}, applied_through=mid - 1)
    offsets = out["offset"].to_pylist()
    assert all(o >= mid for o in offsets)
