"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's `unique` (consecutive-only,
``builtins/operators/unique.cpp``), these are the global dedup
strategies a 100 TB corpus pipeline needs. All follow the same scale
shape:

- per-batch signature computation is vectorized ``map_batches``
  (numpy/hashlib-C kernels);
- candidate generation is a ``groupby`` on a SMALL signature key
  (hash / band bucket / hyperplane bucket) — the only shuffle, and it
  moves signatures + ids, never the payload;
- exact verification + canonical assignment runs per candidate group;
- the final pass drops losers with a broadcast id-set filter
  (``ray.put`` once, read per task — no second shuffle of the data).

Union-find over candidate PAIRS runs on the driver — valid because
LSH candidate sets are orders of magnitude smaller than the corpus
(documented assumption; if candidates blow up, tighten bands).
"""

from __future__ import annotations

import hashlib
import re
import zlib
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

# batch_size=None = one whole block per batch: every kernel here is
# vectorized, so Ray's 1024-row default would only add per-batch overhead
_PYARROW = dict(batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

_MERSENNE = (1 << 61) - 1
_MAX_FULL_PAIR_BUCKET = 64


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(ds: Dataset, on: str, id_col: str) -> Dataset:
    """Global exact dedup: keep the min-``id_col`` row per distinct
    ``on`` value. hash-partition + per-group first (SURVEY.md §2.5);
    the shuffle key is the sha256 of the value, so arbitrarily large
    payloads shuffle as 32-byte keys + rows."""

    def add_hash(t: pa.Table) -> pa.Table:
        h = [
            None if v is None else hashlib.sha256(str(v).encode()).hexdigest()
            for v in t[on].to_pylist()
        ]
        return t.append_column("__h", pa.array(h, type=pa.string()))

    def first(g: pa.Table) -> pa.Table:
        i = pc.index(g[id_col], pc.min(g[id_col]))
        return g.take(pa.array([i.as_py()])).drop_columns(["__h"])

    return ds.map_batches(add_hash, **_PYARROW).groupby("__h").map_groups(
        first, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH
# ---------------------------------------------------------------------------


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Character k-shingle crc32 hashes (C-speed) of normalized text."""
    t = re.sub(r"\s+", " ", text.lower()).strip()
    if len(t) < k:
        return np.array([zlib.crc32(t.encode())], dtype=np.uint64)
    return np.unique(
        np.fromiter(
            (zlib.crc32(t[i : i + k].encode()) for i in range(len(t) - k + 1)),
            dtype=np.uint64,
            count=len(t) - k + 1,
        )
    )


class MinHasher:
    """Stateful minhash kernel: the permutation coefficients are drawn
    ONCE per actor in ``__init__`` (seeded → identical across actors),
    then every batch is vectorized numpy."""

    def __init__(self, text_col: str, num_perm: int = 64, shingle_k: int = 5, seed: int = 7):
        rng = np.random.default_rng(seed)
        # a,b < 2^31 and shingle hashes < 2^32 keep a*x+b < 2^63+2^31,
        # so the uint64 product never wraps BEFORE the Mersenne modulo
        # (an earlier draw from [1, 2^61) silently overflowed, replacing
        # the universal-hash family with an uncontrolled composite)
        self.a = rng.integers(1, 1 << 31, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, 1 << 31, num_perm, dtype=np.uint64)
        self.text_col = text_col
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, text: Optional[str]) -> np.ndarray:
        if not text:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        sh = _shingle_hashes(text, self.shingle_k)
        # (num_perm, n_shingles) -> min over shingles
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = np.stack([self.signature(t) for t in batch[self.text_col].to_pylist()])
        return batch.append_column(
            "__minhash", pa.FixedSizeListArray.from_arrays(pa.array(sigs.ravel()), self.num_perm)
        )


def minhash_bands(batch: pa.Table, id_col: str, bands: int, num_perm: int) -> pa.Table:
    """Explode signatures to (band_id, band_hash, id) rows — the LSH
    bucket key. Output is tiny (ids + hashes), so the groupby that
    follows never shuffles document payloads."""
    sigs = np.asarray(batch["__minhash"].combine_chunks().flatten()).reshape(-1, num_perm)
    rows_per = num_perm // bands
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    out_band, out_hash, out_id = [], [], []
    for b in range(bands):
        chunk = np.ascontiguousarray(sigs[:, b * rows_per : (b + 1) * rows_per])
        hashes = [zlib.crc32(chunk[i].tobytes()) for i in range(len(ids))]
        out_band.extend([b] * len(ids))
        out_hash.extend(hashes)
        out_id.extend(ids.tolist())
    return pa.table(
        {
            "band": pa.array(out_band, type=pa.int32()),
            "bhash": pa.array(out_hash, type=pa.int64()),
            id_col: pa.array(out_id),
        }
    )


def _union_find(pairs: List[Tuple]) -> Dict:
    parent: Dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact n-gram (character k-shingle) Jaccard similarity — the
    verification kernel behind the LSH candidates."""
    sa, sb = set(_shingle_hashes(a or "", k)), set(_shingle_hashes(b or "", k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def dedup_minhash_lsh(
    ds: Dataset,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    verify: bool = True,
) -> Dataset:
    """MinHash+LSH near-dedup: shingle → minhash (actor pool) → band →
    bucket groupby → candidate pairs → exact n-gram Jaccard verify →
    drop non-canonical members. Returns the deduplicated dataset.

    Scale notes: only (band, hash, id) triples shuffle; texts for
    verification are fetched per candidate pair from a broadcast
    id→text map built from candidate ids ONLY."""
    num_cpus_total = int(ray.cluster_resources().get("CPU", 4))
    # autoscaling pool: spawn 1, grow toward cpu/4 only if the input
    # actually has enough batches (small corpora stay spawn-cheap)
    # EXPLICIT moderate batch size: signature computation is per-row
    # Python (the expensive part); whole-block batches would hand one
    # giant batch to one actor and serialize the pool
    hashed = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"text_col": text_col, "num_perm": num_perm, "shingle_k": shingle_k},
        concurrency=(1, max(2, num_cpus_total // 4)),
        num_cpus=0.5,
        **{**_PYARROW, "batch_size": 256},
    ).materialize()

    triples = hashed.map_batches(
        lambda t: minhash_bands(t, id_col, bands, num_perm), **_PYARROW
    )

    def emit_pairs(g: pa.Table) -> pa.Table:
        ids = sorted(g[id_col].to_pylist())
        if len(ids) < 2:
            return pa.table({"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())})
        # ALL within-bucket pairs: star-linking only to the min id loses
        # true duplicate pairs whenever the min-id member is a minhash
        # false positive. Quadratic blowup is capped: oversized buckets
        # (hash collisions of near-identical content) fall back to the
        # star so one degenerate bucket can't emit millions of pairs.
        a_out, b_out = [], []
        if len(ids) <= _MAX_FULL_PAIR_BUCKET:
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    a_out.append(ids[x])
                    b_out.append(ids[y])
        else:
            a_out = [ids[0]] * (len(ids) - 1)
            b_out = ids[1:]
        return pa.table({"a": pa.array(a_out, type=pa.int64()), "b": pa.array(b_out, type=pa.int64())})

    pairs_tbl = (
        triples.groupby(["band", "bhash"])
        .map_groups(emit_pairs, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    pairs = list(pairs_tbl.itertuples(index=False, name=None))

    if verify and pairs:
        cand_ids = {i for p in pairs for i in p}
        texts = {}
        for b in hashed.iter_batches(batch_format="pyarrow"):
            for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
                if i in cand_ids:
                    texts[i] = t
        # shingle each candidate ONCE (a doc appears in many pairs;
        # recomputing per pair made verification O(pairs * doclen))
        shingles = {i: set(_shingle_hashes(texts[i] or "", shingle_k)) for i in cand_ids}

        def _jaccard_cached(a, b) -> float:
            sa, sb = shingles[a], shingles[b]
            if not sa and not sb:
                return 1.0
            return len(sa & sb) / max(1, len(sa | sb))

        pairs = [p for p in pairs if _jaccard_cached(p[0], p[1]) >= threshold]

    roots = _union_find(pairs)
    losers = {x for x, r in roots.items() if r != x}
    loser_ref = ray.put(losers)

    def drop_losers(t: pa.Table) -> pa.Table:
        lose = ray.get(loser_ref)
        mask = [i not in lose for i in t[id_col].to_pylist()]
        return t.filter(pa.array(mask)).drop_columns(["__minhash"])

    return hashed.map_batches(drop_losers, **_PYARROW)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word tokens (compiled regex + seeded nothing
    — stateless math, but the compiled regex lives per actor)."""

    def __init__(self, text_col: str):
        self.text_col = text_col
        self.word_re = re.compile(r"\w+")

    def simhash(self, text: Optional[str]) -> int:
        if not text:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for w in self.word_re.findall(text.lower()):
            h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
            bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8))
            acc += bits.astype(np.int64) * 2 - 1
        out = np.packbits((acc > 0).astype(np.uint8))
        return int.from_bytes(out.tobytes(), "little")

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [self.simhash(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column("__simhash", pa.array(np.array(hs, dtype=np.uint64)))


def dedup_simhash(
    ds: Dataset, text_col: str, id_col: str, *, max_hamming: int = 3, prefix_bits: int = 16
) -> Dataset:
    """SimHash near-dedup: 64-bit simhash (actor pool) → bucket by
    4 rotated ``prefix_bits`` prefixes (a doc pair within hamming
    distance k collides on ≥1 prefix w.h.p.) → within-bucket hamming
    verify → union-find → drop losers."""
    num_cpus_total = int(ray.cluster_resources().get("CPU", 4))
    hashed = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs={"text_col": text_col},
        concurrency=(1, max(2, num_cpus_total // 4)),
        num_cpus=0.5,
        **{**_PYARROW, "batch_size": 256},
    ).materialize()

    def emit_buckets(t: pa.Table) -> pa.Table:
        hs = t["__simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        rots, buckets, out_ids, out_hs = [], [], [], []
        for r in range(4):
            rot = np.bitwise_or(
                np.left_shift(hs, np.uint64(16 * r)), np.right_shift(hs, np.uint64(64 - 16 * r))
            ) if r else hs
            rots.extend([r] * len(ids))
            buckets.extend((rot >> np.uint64(64 - prefix_bits)).tolist())
            out_ids.extend(ids.tolist())
            out_hs.extend(hs.tolist())
        return pa.table(
            {
                "rot": pa.array(rots, type=pa.int32()),
                "bucket": pa.array(np.array(buckets, dtype=np.uint64)),
                id_col: pa.array(out_ids),
                "h": pa.array(np.array(out_hs, dtype=np.uint64)),
            }
        )

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_pylist()
        hs = g["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if bin(int(hs[i]) ^ int(hs[j])).count("1") <= max_hamming:
                    a, b = sorted((ids[i], ids[j]))
                    a_out.append(a)
                    b_out.append(b)
        return pa.table({"a": pa.array(a_out, type=pa.int64()), "b": pa.array(b_out, type=pa.int64())})

    pairs_df = (
        hashed.map_batches(emit_buckets, **_PYARROW)
        .groupby(["rot", "bucket"])
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    roots = _union_find(list(pairs_df.itertuples(index=False, name=None)))
    losers = {x for x, r in roots.items() if r != x}
    loser_ref = ray.put(losers)

    def drop_losers(t: pa.Table) -> pa.Table:
        lose = ray.get(loser_ref)
        mask = [i not in lose for i in t[id_col].to_pylist()]
        return t.filter(pa.array(mask)).drop_columns(["__simhash"])

    return hashed.map_batches(drop_losers, **_PYARROW)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def dedup_embedding(
    ds: Dataset,
    vec_col: str,
    id_col: str,
    *,
    threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 11,
) -> Dataset:
    """Embedding near-dedup: random-hyperplane LSH bucket (cosine
    SimHash) → within-bucket pairwise cosine ≥ threshold → union-find →
    drop losers. Bucketing keeps the pairwise O(n²) inside small
    buckets; the hyperplanes are seeded so every task derives the SAME
    projection."""

    def add_bucket(t: pa.Table) -> pa.Table:
        vecs = np.stack(t[vec_col].to_pandas().to_numpy())
        dim = vecs.shape[1]
        planes = np.random.default_rng(seed).normal(size=(dim, num_planes))
        bits = (vecs @ planes) > 0
        # direct bits->integer; works for any num_planes <= 62 (packbits
        # + view(uint16) crashed for num_planes <= 8)
        weights = (1 << np.arange(bits.shape[1], dtype=np.int64))
        bucket = (bits.astype(np.int64) * weights).sum(axis=1)
        return t.append_column("__bucket", pa.array(bucket))

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_pylist()
        a_out, b_out = [], []
        if len(ids) > 1:
            vecs = np.stack(g[vec_col].to_pandas().to_numpy())
            norm = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
            sim = norm @ norm.T
            ii, jj = np.where(np.triu(sim, 1) >= threshold)
            for i, j in zip(ii, jj):
                a, b = sorted((ids[i], ids[j]))
                a_out.append(a)
                b_out.append(b)
        return pa.table({"a": pa.array(a_out, type=pa.int64()), "b": pa.array(b_out, type=pa.int64())})

    pairs_df = (
        ds.map_batches(add_bucket, **_PYARROW)
        .groupby("__bucket")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    roots = _union_find(list(pairs_df.itertuples(index=False, name=None)))
    losers = {x for x, r in roots.items() if r != x}
    loser_ref = ray.put(losers)

    def drop_losers(t: pa.Table) -> pa.Table:
        lose = ray.get(loser_ref)
        mask = [i not in lose for i in t[id_col].to_pylist()]
        return t.filter(pa.array(mask))

    return ds.map_batches(drop_losers, **_PYARROW)
