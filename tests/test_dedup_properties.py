"""Property-based tests (hypothesis) for the round-3 dedup/quantile
kernels — pure-function level, no Ray session needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tenzir_ray import dedup


@st.composite
def word_docs(draw):
    vocab = [f"w{c}" for c in range(12)]
    n = draw(st.integers(0, 25))
    return " ".join(draw(st.sampled_from(vocab)) for _ in range(n))


@given(st.lists(word_docs(), min_size=2, max_size=8), st.sampled_from([0.4, 0.6, 0.8]))
@settings(max_examples=60, deadline=None)
def test_prefix_filter_is_complete(texts, t):
    """The PPJoin prefix-filter invariant behind dedup_ngram_jaccard:
    any pair with Jaccard >= t MUST share a shingle inside both hash-
    ordered prefixes of length |S| - ceil(t*|S|) + 1 (recall is exact,
    not probabilistic)."""
    sets = dedup._word_ngram_sets(texts, 3)

    def prefix(s):
        p = len(s) - int(np.ceil(t * len(s))) + 1
        return set(s[:p].tolist())  # sorted-unique -> smallest hashes

    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            if a.size == 0 or b.size == 0:
                continue
            if dedup._jaccard_sorted(a, b) >= t:
                assert prefix(a) & prefix(b), (texts[i], texts[j], t)


@given(st.lists(st.integers(0, 6), min_size=0, max_size=20))
@settings(max_examples=100, deadline=None)
def test_ranges_matches_naive(counts):
    c = np.array(counts, dtype=np.int64)
    want = np.concatenate([np.arange(x) for x in c]) if len(c) else np.empty(0)
    got = dedup._ranges(c)
    assert np.array_equal(got, want)


@given(
    st.lists(st.sampled_from([0.0, 0.5, 1.0, 2.5, 7.0, -3.0]), min_size=1, max_size=40),
    st.sampled_from([0.0, 0.25, 0.5, 0.9, 1.0]),
)
@settings(max_examples=80, deadline=None)
def test_quantile_finalize_matches_numpy(vals, q):
    """_quantile_fn's value-count finalize == numpy linear interpolation
    over the expanded multiset."""
    import importlib

    s = importlib.import_module("tenzir_ray.ops.summarize")
    fn = s._quantile_fn("v", "p", q)
    import json

    acc = json.dumps({})
    # accumulate in two uneven pyarrow blocks to exercise merge
    import pyarrow as pa

    half = len(vals) // 2
    for chunk in (vals[:half], vals[half:]):
        if chunk:
            acc = fn.accumulate_block(acc, pa.table({"v": chunk}))
    got = fn.finalize(acc)
    want = float(np.percentile(np.array(vals), q * 100, method="linear"))
    assert abs(got - want) < 1e-9, (vals, q, got, want)


@given(st.lists(st.sampled_from([1.0, 2.0, 3.5, -1.0]), min_size=1, max_size=21))
@settings(max_examples=60, deadline=None)
def test_median_finalize_matches_numpy(vals):
    import importlib
    import json

    import pyarrow as pa

    s = importlib.import_module("tenzir_ray.ops.summarize")
    fn = s._quantile_fn("v", "m", None)
    acc = fn.accumulate_block(json.dumps({}), pa.table({"v": vals}))
    assert abs(fn.finalize(acc) - float(np.median(vals))) < 1e-9
