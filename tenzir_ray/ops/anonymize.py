"""`pseudonymize` — prefix-preserving IP anonymization.

Reference: `pseudonymize --method=crypto-pan --seed=... fields...`
(``builtins/operators/pseudonymize.cpp:50-160``) applies Crypto-PAn to
ip columns. Real Crypto-PAn derives each prefix bit from an AES PRF;
with no crypto library in this container we implement the SAME
prefix-preserving construction over a keyed BLAKE2 PRF (pure hashlib,
C-speed): bit i of the anonymized address is ``orig_bit_i XOR
PRF(key, orig_bits_0..i-1)`` — so two addresses sharing a k-bit
prefix share exactly a k-bit anonymized prefix, the defining
Crypto-PAn property. Deterministic per (seed, address); per-actor
memoization makes repeated addresses O(1).
"""

from __future__ import annotations

import hashlib
import ipaddress
from typing import Dict, List

import pyarrow as pa
from ray.data import Dataset


class CryptoPanLike:
    """Actor-pool stage: keyed PRF + address cache live per actor."""

    def __init__(self, fields: List[str], seed: str = ""):
        self.fields = fields
        self.key = hashlib.sha256(("tzr-pan:" + seed).encode()).digest()
        self.cache: Dict[str, str] = {}

    def _prf_bit(self, prefix_bits: str) -> int:
        d = hashlib.blake2b(prefix_bits.encode(), key=self.key, digest_size=1).digest()
        return d[0] & 1

    def anonymize_ip(self, addr: str) -> str:
        if addr in self.cache:
            return self.cache[addr]
        try:
            ip = ipaddress.ip_address(addr)
        except ValueError:
            return addr
        nbits = 32 if ip.version == 4 else 128
        orig = format(int(ip), f"0{nbits}b")
        out_bits = []
        for i in range(nbits):
            out_bits.append(str(int(orig[i]) ^ self._prf_bit(orig[:i])))
        anon = str(ipaddress.ip_address(int("".join(out_bits), 2)))
        self.cache[addr] = anon
        return anon

    def __call__(self, batch: pa.Table) -> pa.Table:
        for f in self.fields:
            if f not in batch.column_names:
                continue
            vals = [None if v is None else self.anonymize_ip(v) for v in batch[f].to_pylist()]
            idx = batch.column_names.index(f)
            batch = batch.set_column(idx, f, pa.array(vals, type=pa.string()))
        return batch


def pseudonymize(ds: Dataset, fields: List[str], seed: str = "", concurrency: int = 2) -> Dataset:
    return ds.map_batches(
        CryptoPanLike,
        fn_constructor_kwargs={"fields": fields, "seed": seed},
        concurrency=concurrency,
        num_cpus=0.5,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
