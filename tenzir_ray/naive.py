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


_M64 = (1 << 64) - 1


def _splitmix64_scalar(x: int) -> int:
    """Plain-Python splitmix64 finalizer (Steele et al. 2014) — the
    published mixer, written independently of the vectorized operator
    kernel."""
    x &= _M64
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & _M64
    x = (x ^ (x >> 27)) * 0x94D049BB133111EB & _M64
    return x ^ (x >> 31)


def _word_hash(w: str) -> int:
    """64-bit word hash: splitmix64 chained over the word's codepoints
    (h_0 = 0; h_{j+1} = splitmix64(h_j XOR cp_j)) — the SimHash word
    hash this repo defines (shared definition, independent code)."""
    h = 0
    for ch in w:
        h = _splitmix64_scalar(h ^ ord(ch))
    return h


def simhash_losers(documents_parquet: str, max_hamming: int = 2) -> set:
    """All-pairs 64-bit SimHash near-dup losers: word tokens,
    codepoint-chained splitmix64 word hashes, sign-sum bits (bit b set
    iff a strict majority of word hashes set bit b), exact pairwise
    hamming via bit-matrix algebra (popcount(x^y) = |x| + |y| - 2 x·y)."""
    t = pq.read_table(documents_parquet, columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    word_re = re.compile(r"\w+")
    bits = np.zeros((len(ids), 64), dtype=np.int8)
    for row, text in enumerate(t["text"].to_pylist()):
        if not text:
            continue
        acc = np.zeros(64, dtype=np.int64)
        for w in word_re.findall(text.lower()):
            h = _word_hash(w)
            acc += np.array([(h >> b) & 1 for b in range(64)], dtype=np.int64) * 2 - 1
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
    """Prefix-preserving AES Crypto-PAn pseudonym, straight from the
    PAPER's definition (Xu et al.): output bit i is ``orig_bit_i XOR
    MSB(AES(first i orig bits || pad bits i..127))`` where the 32-byte
    key's first half is the AES key and the encrypted second half is
    the pad. Built on bit STRINGS — structurally independent of the
    operator's incremental byte-masking loop — so a loop/mask bug in
    either implementation breaks the oracle equality. Seed parsing is
    duplicated here (hex pairs, strtoul semantics) on purpose."""
    from tenzir_ray.aes import encrypt_block, expand_key

    hexdigits = set("0123456789abcdefABCDEF")
    key = bytearray(32)
    for i in range(min(32, (len(seed) + 1) // 2)):
        b = seed[2 * i : 2 * i + 2]
        if len(b) == 1:
            b += "0"
        run = 0
        while run < len(b) and b[run] in hexdigits:
            run += 1
        key[i] = int(b[:run], 16) if run else 0
    rk = expand_key(bytes(key[:16]))
    pad = encrypt_block(rk, bytes(key[16:32]))
    pad_bits = "".join(format(b, "08b") for b in pad)
    try:
        ip = ipaddress.ip_address(ip_str)
    except ValueError:
        return ip_str
    nbits = 32 if ip.version == 4 else 128
    src = format(int(ip), f"0{nbits}b")
    out = []
    for i in range(nbits):
        inp = int(src[:i] + pad_bits[i:], 2).to_bytes(16, "big")
        prf = encrypt_block(rk, inp)[0] >> 7
        out.append(str(int(src[i]) ^ prf))
    return str(ipaddress.ip_address(int("".join(out), 2)))


def _cid_v1(src_ip: str, dst_ip: str, proto: int, sport: int, dport: int, seed: int = 0) -> str:
    """Community ID v1 straight from the published Corelight spec,
    independent of the operator's byte-level version: seed(2,BE) +
    addr-ordered (src, dst, proto, 0, sport, dport) → sha1 → base64."""
    import base64 as _b64

    a, b = ipaddress.ip_address(src_ip), ipaddress.ip_address(dst_ip)
    icmp_dual = {8: 0, 0: 8, 13: 14, 14: 13, 15: 16, 16: 15, 10: 9, 9: 10, 17: 18, 18: 17}
    one_way = False
    if proto == 1:
        if sport in icmp_dual:
            dport = icmp_dual[sport]
        else:
            one_way = True
    keep = one_way or a.packed < b.packed or (a.packed == b.packed and sport < dport)
    if not keep:
        a, b, sport, dport = b, a, dport, sport
    msg = (
        seed.to_bytes(2, "big") + a.packed + b.packed
        + bytes([proto, 0]) + sport.to_bytes(2, "big") + dport.to_bytes(2, "big")
    )
    return "1:" + _b64.b64encode(hashlib.sha1(msg).digest()).decode()


def decapsulate_expected(n: int = 1200, seed: int = 23):
    """Expected decapsulation output derived from the packet SPECS
    alone (tenzir_ray.pcap.gen_packet_specs) — never touches frame
    bytes, the pcap format, or the operator's parser, so it catches
    bugs in any of them."""
    import pyarrow as pa

    from tenzir_ray.pcap import gen_packet_specs

    def mac(bs: bytes) -> str:
        return "-".join(format(x, "02X") for x in bs)

    rows = []
    for s in gen_packet_specs(n, seed):
        k = s["kind"]
        row = dict.fromkeys(
            ["eth_src", "eth_dst", "eth_type", "vlan_outer", "vlan_inner",
             "ip_src", "ip_dst", "ip_proto", "src_port", "dst_port",
             "icmp_type", "icmp_code", "community_id"]
        )
        if k != "garbage":
            row["eth_src"] = mac(s["src_mac"])
            row["eth_dst"] = mac(s["dst_mac"])
            row["eth_type"] = 0x86DD if k == "tcp6" else 0x0800
            if k == "vlan_tcp4":
                row["vlan_outer"] = s["vlan_outer"]
            elif k == "qinq_udp4":
                row["vlan_outer"] = s["vlan_outer"]
                row["vlan_inner"] = s["vlan_inner"]
            src = str(ipaddress.ip_address(s["src_ip"]))
            dst = str(ipaddress.ip_address(s["dst_ip"]))
            row["ip_src"], row["ip_dst"] = src, dst
            if k == "icmp4":
                row["ip_proto"] = 1
                row["icmp_type"], row["icmp_code"] = s["icmp_type"], s["icmp_code"]
                row["community_id"] = _cid_v1(src, dst, 1, s["icmp_type"], s["icmp_code"])
            else:
                row["ip_proto"] = 17 if k in ("udp4", "qinq_udp4") else 6
                row["src_port"], row["dst_port"] = s["sport"], s["dport"]
                row["community_id"] = _cid_v1(src, dst, row["ip_proto"], s["sport"], s["dport"])
        rows.append(row)
    cols = {name: [r[name] for r in rows] for name in rows[0]}
    typed = {
        name: pa.array(
            vals,
            type=pa.string() if name in ("eth_src", "eth_dst", "ip_src", "ip_dst", "community_id") else pa.uint64(),
        )
        for name, vals in cols.items()
    }
    return pa.table(typed)
