"""`pseudonymize` — prefix-preserving IP anonymization (Crypto-PAn).

Reference: `pseudonymize --method=crypto-pan --seed=... fields...`
(``builtins/operators/pseudonymize.cpp:50-160``) applies Crypto-PAn
(Xu et al., "Prefix-Preserving IP Address Anonymization") with
AES-128-ECB as the PRF (``libtenzir/src/ip.cpp:37-96``): the 32-byte
seed's first half is the AES key, the second half encrypts to the
padding block, and output bit i is ``orig_bit_i XOR
MSB(AES(first i orig bits || pad bits))``. With the pure-Python
FIPS-197 block in :mod:`tenzir_ray.aes` this is WIRE-COMPATIBLE with
published Crypto-PAn implementations — verified against the public
node-cryptopan test vectors (the same data the reference's
``libtenzir/test/ip.cpp:181-330`` uses). Seed strings parse as hex
byte pairs exactly like ``pseudonymize.cpp:141-154`` (non-hex → 0,
odd trailing nibble zero-padded).

Deterministic per (seed, address); per-actor memoization makes
repeated addresses O(1), and the AES round keys + pad are derived
once per actor in ``__init__``.
"""

from __future__ import annotations

import ipaddress
from typing import Dict, List

import pyarrow as pa
from ray.data import Dataset

from tenzir_ray.aes import encrypt_block, expand_key

_HEX = set("0123456789abcdefABCDEF")


def parse_seed(seed: str) -> bytes:
    """Hex seed string → 32 key bytes, mirroring the reference's
    ``parse_seed_string`` (``pseudonymize.cpp:141-154``): consecutive
    2-char hex pairs, a trailing odd nibble padded with '0', and
    strtoul semantics (longest leading hex prefix; none → 0)."""
    out = bytearray(32)
    max_seed_size = min(64, len(seed))
    i = 0
    while i * 2 < max_seed_size:
        pos = i * 2
        byte = seed[pos : pos + 2]
        if len(byte) == 1:
            byte += "0"
        run = 0
        while run < len(byte) and byte[run] in _HEX:
            run += 1
        out[i] = int(byte[:run], 16) if run else 0
        i += 1
    return bytes(out)


class CryptoPan:
    """The Crypto-PAn core over one 32-byte key."""

    def __init__(self, key: bytes):
        if len(key) != 32:
            raise ValueError("Crypto-PAn key must be 32 bytes")
        self.round_keys = expand_key(key[:16])
        self.pad = encrypt_block(self.round_keys, key[16:32])

    def anonymize_bytes(self, b: bytes) -> bytes:
        """Anonymize an n-byte address region (4 for v4, 16 for v6) —
        the incremental loop of ``ip.cpp:68-95``: cipher input starts
        as the pad and accrues original bits left-to-right; each
        encryption's first output bit is the next OTP bit."""
        n = len(b)
        cipher_input = bytearray(self.pad)
        otp = bytearray(n)
        out = encrypt_block(self.round_keys, bytes(cipher_input))
        otp[0] |= out[0] & 0x80
        i = 0
        while i < n * 8 - 1:
            byte_index = i // 8
            bit_index = i % 8
            padding_mask = 0xFF >> (bit_index + 1)
            original_mask = ~padding_mask & 0xFF
            cipher_input[byte_index] = (b[byte_index] & original_mask) | (
                self.pad[byte_index] & padding_mask
            )
            out = encrypt_block(self.round_keys, bytes(cipher_input))
            i += 1
            otp[i // 8] |= (out[0] & 0x80) >> (i % 8)
        return bytes(x ^ y for x, y in zip(b, otp))

    def anonymize_ip(self, addr: str) -> str:
        try:
            ip = ipaddress.ip_address(addr)
        except ValueError:
            return addr
        return str(ipaddress.ip_address(self.anonymize_bytes(ip.packed)))


class CryptoPanLike:
    """Actor-pool stage: AES round keys, pad, and the address cache
    live per actor. (Name kept from the pre-AES round; the PRF is now
    real AES-128 Crypto-PAn.)"""

    def __init__(self, fields: List[str], seed: str = ""):
        self.fields = fields
        self.pan = CryptoPan(parse_seed(seed))
        self.cache: Dict[str, str] = {}

    def anonymize_ip(self, addr: str) -> str:
        if addr in self.cache:
            return self.cache[addr]
        anon = self.pan.anonymize_ip(addr)
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
