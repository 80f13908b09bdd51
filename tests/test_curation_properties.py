"""Property-based tests (hypothesis) for the round-4 curation kernels
— pure-function level, no Ray session needed."""

import collections
import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tenzir_ray import curation

_W = re.compile(r"[a-z0-9]+")


@st.composite
def word_docs(draw):
    vocab = [f"w{c}" for c in range(8)]
    n = draw(st.integers(0, 30))
    return " ".join(draw(st.sampled_from(vocab)) for _ in range(n))


@given(st.lists(st.one_of(word_docs(), st.none()), min_size=1, max_size=10))
@settings(max_examples=80, deadline=None)
def test_repetition_table_matches_bruteforce(texts):
    cols = curation._repetition_table(texts)
    for i, txt in enumerate(texts):
        ws = _W.findall(txt.lower()) if txt else []
        nw = len(ws)
        assert cols["n_words"][i].as_py() == nw
        if nw:
            c = collections.Counter(ws)
            assert abs(
                cols["dup_word_frac"][i].as_py() - (nw - len(c)) / nw
            ) < 1e-12
            assert abs(
                cols["top_word_frac"][i].as_py() - max(c.values()) / nw
            ) < 1e-12
        else:
            assert not cols["dup_word_frac"][i].is_valid
        bi = [tuple(ws[j : j + 2]) for j in range(nw - 1)]
        if bi:
            c2 = collections.Counter(bi)
            assert abs(
                cols["dup_2gram_frac"][i].as_py() - (len(bi) - len(c2)) / len(bi)
            ) < 1e-12
        else:
            assert not cols["dup_2gram_frac"][i].is_valid


@given(
    st.lists(st.integers(0, 2**20), min_size=0, max_size=50, unique=True),
    st.floats(0.0, 1.0),
)
@settings(max_examples=100, deadline=None)
def test_sample_rank_matches_sql_arithmetic(ids, frac):
    """The engine's rank and membership must equal plain BIGINT
    arithmetic (what the SQL oracle computes)."""
    arr = np.array(ids, dtype=np.int64)
    rank = curation._sample_rank(arr)
    for i, v in zip(ids, rank):
        assert int(v) == (i * 2654435761) % 1_000_000_007
    cut = int(frac * curation._SAMPLE_MOD)
    member = rank < cut
    for i, m in zip(ids, member):
        assert bool(m) == ((i * 2654435761) % 1_000_000_007 < cut)


@given(
    st.lists(st.integers(0, 10**6), min_size=1, max_size=60),
    st.integers(1, 500),
)
@settings(max_examples=100, deadline=None)
def test_pack_bins_match_exclusive_cumsum(tokens, budget):
    """Per-block assignment with driver offsets must equal the global
    exclusive cumsum // budget regardless of how rows split into
    blocks (simulated here by an arbitrary prefix split)."""
    toks = np.array(tokens, dtype=np.int64)
    excl = np.concatenate([[0], np.cumsum(toks)[:-1]])
    want = excl // budget
    # simulate the two-pass scan over an arbitrary 2-block split
    for cut in (0, len(toks) // 2, len(toks)):
        a, b = toks[:cut], toks[cut:]
        off_b = int(a.sum())
        got = np.concatenate(
            [
                (np.cumsum(a) - a) // budget if len(a) else a,
                (off_b + np.cumsum(b) - b) // budget if len(b) else b,
            ]
        )
        assert got.tolist() == want.tolist()


@given(st.lists(word_docs(), min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_segment_distinct_top_invariants(texts):
    docs = [_W.findall(t.lower()) for t in texts]
    from tenzir_ray.dedup import _word_hashes_flat

    wh, nw = _word_hashes_flat(docs)
    distinct, top = curation._segment_distinct_top(wh, nw)
    for i, d in enumerate(docs):
        assert distinct[i] == len(set(d))
        assert top[i] == (max(collections.Counter(d).values()) if d else 0)
