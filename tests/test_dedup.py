"""Dedup operator tests on small constructed corpora."""

import numpy as np
import pyarrow as pa
import ray.data

from tenzir_ray import dedup


def docs_ds():
    base = (
        "the quick brown fox jumps over the lazy dog and keeps running through the field "
        "while the sun sets slowly behind distant mountains in the golden evening light"
    )
    texts = [
        base,
        base,                                  # exact dup of 0
        base.replace("golden", "amber"),       # near-dup of 0
        "completely different content about database systems and query optimization techniques "
        "for distributed analytical engines running on commodity clusters at scale",
        "yet another unrelated document discussing neural network training dynamics and "
        "gradient descent convergence properties under various learning rate schedules",
    ]
    return ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )


def test_dedup_exact():
    out = dedup.dedup_exact(docs_ds(), on="text", id_col="doc_id")
    ids = sorted(r["doc_id"] for r in out.to_pandas().to_dict("records"))
    assert ids == [0, 2, 3, 4]  # doc 1 (exact dup, higher id) dropped


def test_dedup_minhash_lsh():
    out = dedup.dedup_minhash_lsh(
        docs_ds(), "text", "doc_id", num_perm=64, bands=16, threshold=0.5
    )
    ids = sorted(r["doc_id"] for r in out.to_pandas().to_dict("records"))
    assert 0 in ids and 3 in ids and 4 in ids
    assert 1 not in ids  # exact dup must go
    assert 2 not in ids  # near dup should be caught at threshold 0.5


def test_jaccard_kernel():
    assert dedup.jaccard("abcdefgh", "abcdefgh") == 1.0
    assert dedup.jaccard("abcdefgh", "zzzzzzzz") == 0.0


def test_dedup_simhash():
    out = dedup.dedup_simhash(docs_ds(), "text", "doc_id", max_hamming=6)
    ids = sorted(r["doc_id"] for r in out.to_pandas().to_dict("records"))
    assert 1 not in ids  # exact dup collapses (hamming 0)
    assert 3 in ids and 4 in ids


def test_dedup_embedding():
    rng = np.random.default_rng(5)
    a = rng.normal(size=8)
    vecs = [a, a + rng.normal(scale=0.01, size=8), rng.normal(size=8), rng.normal(size=8)]
    t = pa.table(
        {
            "vec_id": [0, 1, 2, 3],
            "embedding": pa.array([v.tolist() for v in vecs], type=pa.list_(pa.float32())),
        }
    )
    out = dedup.dedup_embedding(ray.data.from_arrow(t), "embedding", "vec_id", threshold=0.99)
    ids = sorted(r["vec_id"] for r in out.to_pandas().to_dict("records"))
    assert ids == [0, 2, 3]  # 1 is a near-dup of 0


def test_dedup_with_string_ids():
    """Non-integer id columns must work end-to-end (pair emitters used
    to hardcode int64 and raised ArrowInvalid on string ids)."""
    base = (
        "the quick brown fox jumps over the lazy dog and keeps running through the field "
        "while the sun sets slowly behind distant mountains in the golden evening light"
    )
    texts = [base, base, base.replace("golden", "amber"),
             "completely different content about database systems and query planning"]
    ids = [f"doc-{i}" for i in range(len(texts))]
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))

    out = dedup.dedup_minhash_lsh(ds, "text", "doc_id", threshold=0.7)
    kept = sorted(r["doc_id"] for r in out.take_all())
    assert "doc-0" in kept and "doc-1" not in kept and "doc-3" in kept

    out = dedup.dedup_simhash(ds, "text", "doc_id", max_hamming=3)
    kept = sorted(r["doc_id"] for r in out.take_all())
    assert "doc-0" in kept and "doc-1" not in kept

    out = dedup.dedup_exact(ds, on="text", id_col="doc_id")
    kept = sorted(r["doc_id"] for r in out.take_all())
    assert kept == ["doc-0", "doc-2", "doc-3"]


def test_dedup_minhash_join_fallback(monkeypatch):
    """Forcing the candidate count over the broadcast ceiling must
    route through the reduce-side join path and give identical
    results."""
    fast = dedup.dedup_minhash_lsh(
        docs_ds(), "text", "doc_id", num_perm=64, bands=16, threshold=0.5
    ).to_pandas()
    monkeypatch.setattr(dedup, "_BROADCAST_CAND_LIMIT", 0)
    joined = dedup.dedup_minhash_lsh(
        docs_ds(), "text", "doc_id", num_perm=64, bands=16, threshold=0.5
    ).to_pandas()
    assert sorted(fast["doc_id"]) == sorted(joined["doc_id"])


def test_dedup_minhash_byte_gate_and_verify_path(monkeypatch):
    """The broadcast gate is BYTE-bound too (one object-store replica
    per node): forcing the byte ceiling to zero must route through the
    exchange, and verify_path='exchange' must force it regardless of
    size — all three giving identical results."""
    fast = dedup.dedup_minhash_lsh(
        docs_ds(), "text", "doc_id", num_perm=64, bands=16, threshold=0.5
    ).to_pandas()
    monkeypatch.setattr(dedup, "_BROADCAST_SHINGLE_BYTES", 0)
    bytegated = dedup.dedup_minhash_lsh(
        docs_ds(), "text", "doc_id", num_perm=64, bands=16, threshold=0.5
    ).to_pandas()
    monkeypatch.undo()
    forced = dedup.dedup_minhash_lsh(
        docs_ds(), "text", "doc_id", num_perm=64, bands=16, threshold=0.5,
        verify_path="exchange",
    ).to_pandas()
    assert sorted(fast["doc_id"]) == sorted(bytegated["doc_id"]) == sorted(forced["doc_id"])
    import pytest

    with pytest.raises(ValueError, match="verify_path"):
        dedup.dedup_minhash_lsh(
            docs_ds(), "text", "doc_id", threshold=0.5, verify_path="bogus"
        ).to_pandas()


def test_hamming_index_pairs_matches_naive():
    # VERDICT r2: scale-adaptive simhash bucketing must stay EXACT.
    # Force the multi-index recursion with a tiny cap and compare to
    # the naive all-pairs relation.
    import numpy as np

    from tenzir_ray.dedup import _hamming_index_pairs

    rng = np.random.default_rng(5)
    base = rng.integers(0, 1 << 48, 40, dtype=np.uint64)  # low 48 bits free
    hv = []
    for b in base:
        hv.append(b)
        for _ in range(3):  # near neighbors within the free region
            flip = np.uint64(0)
            for p in rng.choice(48, rng.integers(1, 4), replace=False):
                flip |= np.uint64(1 << int(p))
            hv.append(b ^ flip)
    hv = np.unique(np.array(hv, dtype=np.uint64))
    free_mask = (1 << 48) - 1

    def naive(hs, mh):
        out = set()
        for i in range(len(hs)):
            for j in range(i + 1, len(hs)):
                if bin(int(hs[i]) ^ int(hs[j])).count("1") <= mh:
                    out.add((i, j))
        return out

    for mh in (1, 2, 3):
        got = _hamming_index_pairs(hv, mh, free_mask, cap=8)  # force recursion
        assert got == naive(hv, mh), f"mismatch at max_hamming={mh}"


def test_hamming_index_pairs_degenerate_bucket_bounded():
    # VERDICT r2 done-criterion: a degenerate single-prefix corpus must
    # complete without a single quadratic task. 120k distinct hashes
    # sharing one 16-bit prefix: all-pairs would be 1.4e10 ops; the
    # recursion completes in seconds with every leaf under the cap.
    import time

    import numpy as np

    from tenzir_ray.dedup import _MAX_SIMHASH_DISTINCT, _hamming_index_pairs

    rng = np.random.default_rng(7)
    hv = np.unique(rng.integers(0, 1 << 48, 120_000, dtype=np.uint64))
    t0 = time.monotonic()
    pairs = _hamming_index_pairs(hv, 3, (1 << 48) - 1, cap=_MAX_SIMHASH_DISTINCT)
    elapsed = time.monotonic() - t0
    assert elapsed < 120, f"degenerate bucket took {elapsed:.0f}s"
    # sanity: random 48-bit hashes have essentially no radius-3 pairs
    assert len(pairs) < 50


def test_dedup_simhash_degenerate_prefix_pipeline(ray_session):
    # end-to-end: every doc shares simhash top bits (one hot bucket per
    # rotation); a small per-task cap exercises the recursion inside
    # the Ray tasks and the result must still match the default path
    import pyarrow as pa
    import ray

    from tenzir_ray.dedup import dedup_simhash

    texts = [f"common shared prefix words alpha beta {i}" for i in range(60)]
    texts += [texts[0], texts[1]]  # exact dupes -> hamming 0
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    base = dedup_simhash(
        ray.data.from_arrow(t), "text", "doc_id", max_hamming=3
    ).to_pandas()
    small_cap = dedup_simhash(
        ray.data.from_arrow(t), "text", "doc_id", max_hamming=3, max_distinct_per_task=4
    ).to_pandas()
    assert sorted(base["doc_id"]) == sorted(small_cap["doc_id"])
    assert len(base) <= len(texts) - 2


def test_batch_signatures_match_scalar():
    """MinHasher.signatures (batched sliding-window + reduceat) must be
    bit-identical to the per-document scalar path, including boundary
    windows between concatenated documents and short/empty docs."""
    h = dedup.MinHasher("text", num_perm=32, shingle_k=5)
    texts = [
        None, "", " ", "ab", "abcd", "abcde", "abcdef",
        "hello world hello world", "the quick brown fox jumps",
        "aaaaaaaaaaaaaaa", "x" * 4 + "y",  # len == k exactly
        "päällekkäisyys ja märkä lumi",  # non-ASCII codepoints
        "repeat " * 40,
    ]
    got = h.signatures(texts)
    want = np.stack([h.signature(t) for t in texts])
    assert np.array_equal(got, want)


def test_batch_shingle_sets_match_scalar():
    texts = [
        None, "", "ab", "abcde", "hello world hello world",
        "päällekkäisyys ja märkä lumi", "z" * 7,
    ]
    for k in (3, 5):
        got = dedup._shingle_sets(texts, k)
        want = [
            dedup._shingle_hashes(t or "", k) if t else np.array([], dtype=np.uint64)
            for t in texts
        ]
        assert all(np.array_equal(a, b) for a, b in zip(want, got))


# ---------------------------------------------------------------------------
# word n-gram Jaccard (prefix-filtered)
# ---------------------------------------------------------------------------


def _naive_ngram_winners(ids, texts, n, t):
    """Quadratic exact reference: all-pairs word-n-gram Jaccard +
    union-find, min-id winner per component."""
    sets = dedup._word_ngram_sets(texts, n)
    edges = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sets[i].size == 0 and sets[j].size == 0:
                continue  # pipeline never pairs shingle-less docs
            if dedup._jaccard_sorted(sets[i], sets[j]) >= t:
                edges.append((ids[i], ids[j]))
    roots = dedup._union_find(edges)
    losers = {x for x, r in roots.items() if r != x}
    return sorted(x for x in ids if x not in losers)


def test_dedup_ngram_jaccard_basic():
    out = dedup.dedup_ngram_jaccard(docs_ds(), "text", "doc_id", n=3, threshold=0.5)
    ids = sorted(r["doc_id"] for r in out.to_pandas().to_dict("records"))
    assert ids == _naive_ngram_winners(list(range(5)), [
        r["text"] for r in docs_ds().take_all()
    ], 3, 0.5)
    assert 1 not in ids and 2 not in ids  # exact + near dup collapse
    assert 0 in ids and 3 in ids and 4 in ids


def test_dedup_ngram_matches_naive_random():
    """Prefix filtering is exact (not probabilistic): on a random
    corpus with planted near-duplicates the pipeline must equal the
    quadratic all-pairs reference exactly."""
    rng = np.random.default_rng(11)
    vocab = [f"w{c}" for c in range(40)]
    texts, ids = [], []
    for i in range(30):
        words = rng.choice(vocab, size=18)
        texts.append(" ".join(words))
        ids.append(i)
    # planted near-dups: copy with 1-2 word substitutions
    for j, src in enumerate((0, 7, 13)):
        w = texts[src].split()
        w[5] = "mutated"
        texts.append(" ".join(w))
        ids.append(30 + j)
    # short/empty edge docs
    texts += ["", "one", "two words"]
    ids += [40, 41, 42]
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    for t in (0.5, 0.8):
        out = dedup.dedup_ngram_jaccard(ds, "text", "doc_id", n=3, threshold=t)
        got = sorted(r["doc_id"] for r in out.take_all())
        assert got == _naive_ngram_winners(ids, texts, 3, t), f"threshold {t}"


def test_dedup_ngram_join_fallback(monkeypatch):
    fast = dedup.dedup_ngram_jaccard(docs_ds(), "text", "doc_id", threshold=0.5).to_pandas()
    monkeypatch.setattr(dedup, "_BROADCAST_CAND_LIMIT", 0)
    joined = dedup.dedup_ngram_jaccard(docs_ds(), "text", "doc_id", threshold=0.5).to_pandas()
    assert sorted(fast["doc_id"]) == sorted(joined["doc_id"])


def test_dedup_ngram_hot_group_star(monkeypatch):
    """A prefix-shingle group bigger than the cap takes the star
    fallback: LINEAR candidates, and an identical-doc cluster still
    fully collapses to its min id."""
    monkeypatch.setattr(dedup, "_MAX_PREFIX_GROUP", 8)
    texts = ["alpha beta gamma delta epsilon zeta"] * 30 + [
        "totally different words entirely here now",
    ]
    ids = list(range(len(texts)))
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    out = dedup.dedup_ngram_jaccard(ds, "text", "doc_id", threshold=0.6)
    got = sorted(r["doc_id"] for r in out.take_all())
    assert got == [0, 30]


def test_word_ngram_sets_edges():
    sets = dedup._word_ngram_sets([None, "", "one", "two words", "a b c", "a b c d"], 3)
    assert sets[0].size == 0 and sets[1].size == 0
    assert sets[2].size == 1 and sets[3].size == 1  # <n words -> one shingle
    assert sets[4].size == 1
    assert sets[5].size == 2
    # determinism across calls
    again = dedup._word_ngram_sets(["a b c d"], 3)[0]
    assert np.array_equal(sets[5], again)


def test_tql_dedup_ngram_stage():
    from tenzir_ray import tql

    out = tql.run("dedup-ngram text doc_id", docs_ds())
    ids = sorted(r["doc_id"] for r in out.take_all())
    assert 0 in ids and 1 not in ids


def test_edge_resolution_exchange_matches_driver(ray_session, monkeypatch):
    # VERDICT r4 #1: distributed hash-to-min connected components must
    # produce exactly the driver union-find's survivor set — including
    # CHAIN clusters (a~b, b~c, no a~c edge) that need >1 propagation
    # round, and string ids (numpy-object min fallback)
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from tenzir_ray.dedup import _finish_drop

    rng = np.random.default_rng(3)
    n = 3000
    ids = np.arange(n)
    # build chains of length 1..6: consecutive ids within a chain
    edges_a, edges_b = [], []
    i = 0
    while i < n - 6:
        clen = int(rng.integers(1, 7))
        for j in range(clen - 1):
            edges_a.append(i + j)
            edges_b.append(i + j + 1)
        i += clen + int(rng.integers(1, 4))
    edge_ds = ray.data.from_arrow(
        pa.table({"a": pa.array(edges_a, pa.int64()), "b": pa.array(edges_b, pa.int64())})
    ).repartition(7)
    corpus = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))

    monkeypatch.setenv("TZR_EDGE_RESOLVE", "driver")
    kept_driver = sorted(_finish_drop(corpus, "doc_id", edge_ds, []).to_pandas()["doc_id"])
    monkeypatch.setenv("TZR_EDGE_RESOLVE", "exchange")
    kept_exchange = sorted(_finish_drop(corpus, "doc_id", edge_ds, []).to_pandas()["doc_id"])
    assert kept_driver == kept_exchange
    assert len(kept_driver) < n  # something was actually dropped

    # string ids through the same machinery
    sa = [f"d{x:05d}" for x in edges_a]
    sb = [f"d{x:05d}" for x in edges_b]
    edge_s = ray.data.from_arrow(pa.table({"a": sa, "b": sb})).repartition(5)
    corpus_s = ray.data.from_arrow(pa.table({"doc_id": [f"d{x:05d}" for x in ids]}))
    monkeypatch.setenv("TZR_EDGE_RESOLVE", "driver")
    kd = sorted(_finish_drop(corpus_s, "doc_id", edge_s, []).to_pandas()["doc_id"])
    monkeypatch.setenv("TZR_EDGE_RESOLVE", "exchange")
    ke = sorted(_finish_drop(corpus_s, "doc_id", edge_s, []).to_pandas()["doc_id"])
    assert kd == ke


def test_minhash_dedup_exchange_resolution(ray_session, monkeypatch):
    # end-to-end: the full MinHash+LSH dedup with edge resolution
    # forced OFF-driver must equal the driver path byte-for-byte
    import numpy as np
    import pyarrow as pa
    import ray.data

    from tenzir_ray.dedup import dedup_minhash_lsh

    rng = np.random.default_rng(9)
    base = [
        " ".join(rng.choice(["alpha", "beta", "gamma", "delta", "omega",
                             "kappa", "sigma", "theta"], 30))
        for _ in range(120)
    ]
    texts, did = [], []
    for i, b in enumerate(base):
        texts.append(b)
        did.append(2 * i)
        if i % 3 == 0:  # near-duplicate: tiny suffix change
            texts.append(b + " zz")
            did.append(2 * i + 1)
    t = pa.table({"doc_id": pa.array(did, pa.int64()), "text": texts})
    ds = ray.data.from_arrow(t).repartition(6)

    monkeypatch.setenv("TZR_EDGE_RESOLVE", "driver")
    kept_d = sorted(dedup_minhash_lsh(ds, "text", "doc_id").to_pandas()["doc_id"])
    monkeypatch.setenv("TZR_EDGE_RESOLVE", "exchange")
    kept_e = sorted(dedup_minhash_lsh(ds, "text", "doc_id").to_pandas()["doc_id"])
    assert kept_d == kept_e
    assert len(kept_d) < len(did)


def test_cc_long_chain_exceeds_round_cap(ray_session, monkeypatch):
    """A duplicate CHAIN longer than _CC_MAX_ITERS (diameter > cap)
    must still resolve EXACTLY via the contracted-pair driver fallback,
    not RuntimeError (code-review r5 finding)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from tenzir_ray import dedup as dd
    from tenzir_ray.dedup import _finish_drop

    n = dd._CC_MAX_ITERS * 3 + 10  # one chain, diameter ~3x the cap
    edge_ds = ray.data.from_arrow(
        pa.table({"a": pa.array(np.arange(n - 1)), "b": pa.array(np.arange(1, n))})
    ).repartition(4)
    corpus = ray.data.from_arrow(pa.table({"doc_id": pa.array(np.arange(n + 20))}))
    monkeypatch.setenv("TZR_EDGE_RESOLVE", "exchange")
    kept = sorted(_finish_drop(corpus, "doc_id", edge_ds, []).to_pandas()["doc_id"])
    # the whole chain collapses to its min id; untouched ids survive
    assert kept == [0] + list(range(n, n + 20))
