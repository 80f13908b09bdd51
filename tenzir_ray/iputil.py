"""IP / subnet domain operations over Arrow string columns.

The reference models ``ip`` and ``subnet`` as first-class value types
(``libtenzir/include/tenzir/type.hpp:703,795`` — 16-byte addresses,
prefix-masked subnets) with containment predicates in the expression
language (``expression.hpp``, e.g. ``where src_ip in 10.0.0.0/8``).
Parquet has no IP type, so this engine's carrier representation is the
STRING column; the kernels here give those columns the reference's
domain semantics:

- IPv4 fast path: one C-level regex extract over the batch, octet
  arithmetic in numpy — no per-row Python.
- IPv6 / mixed path: ``pd.factorize`` so the (Python) ``ipaddress``
  parse runs once per DISTINCT value, not per row — the right shape
  for address columns whose cardinality is far below the row count.

Null semantics are Kleene: null in → null out. A non-null value that
does not parse as an address compares False (the reference's typed
mismatch → no match)."""

from __future__ import annotations

import ipaddress
from typing import Union

import numpy as np
import pandas as pd
import pyarrow as pa

IPNetwork = Union[ipaddress.IPv4Network, ipaddress.IPv6Network]
IPAddress = Union[ipaddress.IPv4Address, ipaddress.IPv6Address]

_V4_RE = r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$"


def _to_object_series(arr) -> pd.Series:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pd.Series(arr.to_pandas(), copy=False).astype("object")


def _v4_u32(s: pd.Series):
    """(uint32 values, parsed-ok mask) for the dotted-quad rows of a
    string series — vectorized, one regex pass."""
    ext = s.str.extract(_V4_RE)
    ok = ext.notna().all(axis=1).to_numpy()
    vals = np.zeros(len(s), dtype=np.int64)
    if ok.any():
        parts = ext[ok].astype(np.int64)
        octet_ok = (parts <= 255).all(axis=1).to_numpy()
        v = (
            parts.iloc[:, 0] * 16777216
            + parts.iloc[:, 1] * 65536
            + parts.iloc[:, 2] * 256
            + parts.iloc[:, 3]
        ).to_numpy()
        idx = np.flatnonzero(ok)
        vals[idx] = np.where(octet_ok, v, 0)
        ok[idx[~octet_ok]] = False
    return vals, ok


def _per_unique(s: pd.Series, fn) -> np.ndarray:
    """Apply a Python predicate once per DISTINCT value (factorize);
    rows with null get False (caller masks them to null)."""
    codes, uniques = pd.factorize(s)
    per = np.zeros(len(uniques), dtype=bool)
    for i, u in enumerate(uniques):
        try:
            per[i] = fn(ipaddress.ip_address(str(u).strip()))
        except ValueError:
            per[i] = False
    out = np.zeros(len(s), dtype=bool)
    hit = codes >= 0
    out[hit] = per[codes[hit]]
    return out


def ip_in_subnet(arr, net: IPNetwork) -> pa.Array:
    """Boolean mask: string-IP column value ∈ ``net``."""
    s = _to_object_series(arr)
    isna = s.isna().to_numpy()
    if isinstance(net, ipaddress.IPv4Network):
        vals, ok = _v4_u32(s)
        lo, hi = int(net.network_address), int(net.broadcast_address)
        out = ok & (vals >= lo) & (vals <= hi)
    else:
        out = _per_unique(s, lambda a: a in net)
    return pa.array(out, mask=isna)


def ip_equal(arr, addr: IPAddress) -> pa.Array:
    """Boolean mask: string-IP column value == ``addr`` (canonical
    compare — '::1' equals '0:0:0:0:0:0:0:1')."""
    s = _to_object_series(arr)
    isna = s.isna().to_numpy()
    if isinstance(addr, ipaddress.IPv4Address):
        vals, ok = _v4_u32(s)
        out = ok & (vals == int(addr))
    else:
        out = _per_unique(s, lambda a: a == addr)
    return pa.array(out, mask=isna)


def looks_like_ip_column(arr, sample: int = 8) -> bool:
    """Heuristic used by the ``:ip`` type extractor when a string
    field carries no explicit ``tenzir_type=ip`` metadata: the first
    ``sample`` non-null values must ALL parse as addresses."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # drop_null + slice FIRST: a mostly-null column must not pull the
    # whole array through a per-row Python loop hunting for non-nulls
    head = arr.drop_null().slice(0, sample)
    if len(head) == 0:
        return False
    for v in head.to_pylist():
        try:
            ipaddress.ip_address(str(v).strip())
        except ValueError:
            return False
    return True
