"""Independent single-process reference implementations.

These exist to SYNTHESIZE oracle material for pipelines whose kernels
SQL cannot express (keyed BLAKE2 PRFs, hyperplane projections): a
plain-Python/NumPy implementation of the same published algorithm,
sharing no code with the distributed operators, computes the expected
result; ``__ray_entry__.oracle_sql`` embeds it into runnable SQL
(guarded IN-lists / VALUES joins). They are deliberately naive —
all-pairs loops, no Ray, no bucketing tricks unless the algorithm's
spec requires it — so a distribution bug in the engine cannot
replicate here.
"""

from __future__ import annotations

import hashlib
import ipaddress
import re

import numpy as np
import pyarrow.parquet as pq


def _uf_losers(n_ids, pairs):
    """Union-find (min-id root) over edges; return the loser set."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x for x in parent if find(x) != x}


def simhash_losers(documents_parquet: str, max_hamming: int = 2) -> set:
    """All-pairs 64-bit SimHash near-dup losers: word tokens, blake2b-8
    word hashes, sign-sum bits, exact pairwise hamming via bit-matrix
    algebra (popcount(x^y) = |x| + |y| - 2 x·y)."""
    t = pq.read_table(documents_parquet, columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    word_re = re.compile(r"\w+")
    bits = np.zeros((len(ids), 64), dtype=np.int8)
    for row, text in enumerate(t["text"].to_pylist()):
        if not text:
            continue
        acc = np.zeros(64, dtype=np.int64)
        for w in word_re.findall(text.lower()):
            h = hashlib.blake2b(w.encode(), digest_size=8).digest()
            acc += np.unpackbits(np.frombuffer(h, dtype=np.uint8)).astype(np.int64) * 2 - 1
        bits[row] = (acc > 0).astype(np.int8)
    b = bits.astype(np.float32)
    ones = b.sum(axis=1)
    dot = b @ b.T
    ham = ones[:, None] + ones[None, :] - 2 * dot
    ii, jj = np.where(np.triu(ham <= max_hamming, 1))
    pairs = [tuple(sorted((ids[i], ids[j]))) for i, j in zip(ii, jj)]
    return _uf_losers(len(ids), pairs)


def embedding_losers(
    embeddings_parquet: str,
    threshold: float = 0.999,
    num_planes: int = 12,
    seed: int = 11,
) -> set:
    """Hyperplane-LSH cosine near-dup losers, per the operator's spec:
    seeded Gaussian planes bucket the vectors; pairs verify by exact
    cosine within buckets only (the algorithm's contract — cross-bucket
    pairs are out of scope by design)."""
    t = pq.read_table(embeddings_parquet, columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_pylist()
    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    planes = np.random.default_rng(seed).normal(size=(vecs.shape[1], num_planes))
    proj = (vecs @ planes) > 0
    weights = 1 << np.arange(num_planes, dtype=np.int64)
    buckets = (proj.astype(np.int64) * weights).sum(axis=1)
    norm = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    pairs = []
    for bval in np.unique(buckets):
        members = np.flatnonzero(buckets == bval)
        if len(members) < 2:
            continue
        sub = norm[members]
        sim = sub @ sub.T
        ii, jj = np.where(np.triu(sim, 1) >= threshold)
        pairs.extend(
            tuple(sorted((ids[members[i]], ids[members[j]]))) for i, j in zip(ii, jj)
        )
    return _uf_losers(len(ids), pairs)


def pan_pseudonym(ip_str: str, seed: str = "") -> str:
    """Prefix-preserving pseudonym of one IPv4/IPv6 address: bit i of
    the output is ``orig_bit_i XOR (blake2b(key, orig_bits[:i]) & 1)``
    — the Crypto-PAn construction over a keyed BLAKE2 PRF."""
    key = hashlib.sha256(("tzr-pan:" + seed).encode()).digest()
    try:
        ip = ipaddress.ip_address(ip_str)
    except ValueError:
        return ip_str
    nbits = 32 if ip.version == 4 else 128
    src = format(int(ip), f"0{nbits}b")
    out = []
    for i in range(nbits):
        prf = hashlib.blake2b(src[:i].encode(), key=key, digest_size=1).digest()[0] & 1
        out.append(str(int(src[i]) ^ prf))
    return str(ipaddress.ip_address(int("".join(out), 2)))
