"""PCAP format + ``decapsulate`` operator.

Reference semantics:

- pcap reader/printer: ``libtenzir/builtins/formats/pcap.cpp:127-290``
  (classic libpcap format, 24-byte file header, 16-byte record
  headers, concatenated-trace support) with the ``pcap.packet`` event
  shape from ``libtenzir/src/pcap.cpp:134-146`` (linktype, timestamp,
  captured_packet_length, original_packet_length, data).
- decapsulate: ``libtenzir/builtins/operators/decapsulate.cpp:303-440``
  — ethernet (+ 802.1Q / QinQ / 802.1ad double tags) → IPv4/IPv6 →
  TCP/UDP/ICMP, plus the Community ID flow hash
  (``libtenzir/include/tenzir/community_id.hpp:46-150``, the public
  Corelight "community ID" v1 spec).

The reference stores packet bytes in a string column with a ``skip``
attribute (its type system has no binary); here ``data`` is an Arrow
``binary`` column — the honest Arrow type.

Ray-Data shape: one task per pcap FILE (a trace must be scanned
serially because records are variable-length), so parallelism comes
from many files — the same unit of work the reference's one-pipeline-
per-file model uses. Packet decapsulation is a per-row byte parse
(inherently row-wise, as in the reference) inside ``map_batches``.
"""

from __future__ import annotations

import base64
import hashlib
import ipaddress
import os
import struct
from typing import Iterator, List, Optional, Tuple

import pyarrow as pa
from ray.data import Dataset

_PYARROW = dict(batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

# magic → (byteorder, nanosecond_resolution)
_MAGICS = {
    0xA1B2C3D4: ("<", False),
    0xA1B23C4D: ("<", True),
}
# the same magics read under the opposite byte order
_SWAPPED = {
    0xD4C3B2A1: (">", False),
    0x4D3CB2A1: (">", True),
}

ETHERTYPE_IPV4 = 0x0800
ETHERTYPE_IPV6 = 0x86DD
ETHERTYPE_VLAN = 0x8100  # IEEE 802.1Q / 802.1aq
ETHERTYPE_QINQ = 0x9100  # double-tagged

IPPROTO_ICMP = 1
IPPROTO_TCP = 6
IPPROTO_UDP = 17

LINKTYPE_ETHERNET = 1


# ---------------------------------------------------------------------------
# pcap byte format
# ---------------------------------------------------------------------------


def packet_record_schema() -> pa.Schema:
    """The ``pcap.packet`` event shape (``src/pcap.cpp:134-146``)."""
    return pa.schema(
        [
            ("linktype", pa.uint64()),
            ("timestamp", pa.timestamp("ns")),
            ("captured_packet_length", pa.uint64()),
            ("original_packet_length", pa.uint64()),
            ("data", pa.binary()),
        ]
    )


def parse_pcap_bytes(blob: bytes) -> Iterator[Tuple[int, int, int, int, bytes]]:
    """Yield (linktype, ts_ns, captured_len, original_len, data) per
    record. Supports byte-swapped traces, ns/us magics, and
    concatenated traces (a new file header mid-stream switches state,
    as in ``pcap.cpp:225-270``)."""
    pos, n = 0, len(blob)

    def read_file_header(at: int):
        if n - at < 24:
            raise ValueError(f"PCAP file header too short: {n - at} bytes")
        (magic,) = struct.unpack_from("<I", blob, at)
        if magic in _MAGICS:
            order, ns = _MAGICS[magic]
        elif magic in _SWAPPED:
            order, ns = _SWAPPED[magic]
        else:
            raise ValueError(f"invalid PCAP magic number: {magic:#x}")
        _, _, _, _, _, snaplen, linktype = struct.unpack_from(order + "IHHiIII", blob, at)
        return order, ns, linktype

    order, ns, linktype = read_file_header(pos)
    pos += 24
    while pos < n:
        if n - pos < 16:
            raise ValueError(f"PCAP packet header too short: {n - pos} bytes")
        # a new file header may start here (concatenated traces)
        (maybe_magic,) = struct.unpack_from("<I", blob, pos)
        if maybe_magic in _MAGICS or maybe_magic in _SWAPPED:
            order, ns, linktype = read_file_header(pos)
            pos += 24
            continue
        ts_sec, ts_frac, cap_len, orig_len = struct.unpack_from(order + "IIII", blob, pos)
        pos += 16
        if n - pos < cap_len:
            raise ValueError(f"truncated last packet; expected {cap_len} but got {n - pos}")
        data = blob[pos : pos + cap_len]
        pos += cap_len
        ts_ns = ts_sec * 1_000_000_000 + (ts_frac if ns else ts_frac * 1_000)
        yield linktype, ts_ns, cap_len, orig_len, data


def write_pcap(
    records: List[Tuple[int, bytes]],
    path: str,
    linktype: int = LINKTYPE_ETHERNET,
    snaplen: int = 262_144,
    nanosecond: bool = True,
) -> str:
    """Write (ts_ns, frame_bytes) records as a classic pcap file
    (printer analog of ``pcap.cpp``'s parser)."""
    magic = 0xA1B23C4D if nanosecond else 0xA1B2C3D4
    div = 1 if nanosecond else 1_000
    with open(path, "wb") as f:
        f.write(struct.pack("<IHHiIII", magic, 2, 4, 0, 0, snaplen, linktype))
        for ts_ns, frame in records:
            f.write(
                struct.pack(
                    "<IIII",
                    ts_ns // 1_000_000_000,
                    (ts_ns % 1_000_000_000) // div,
                    len(frame),
                    len(frame),
                )
            )
            f.write(frame)
    return path


def read_pcap(paths, emit_file_headers: bool = False) -> Dataset:
    """``from pcap`` — one Ray task per pcap file; each task streams
    its trace into ``pcap.packet`` rows (``emit_file_headers`` has no
    event-shape analog here; file headers carry no per-packet data and
    are folded into the per-record linktype)."""
    import ray.data

    files = ray.data.read_binary_files(paths, include_paths=False)

    def expand(t: pa.Table) -> pa.Table:
        lt, ts, cl, ol, data = [], [], [], [], []
        for blob in t["bytes"]:
            for linktype, ts_ns, cap, orig, d in parse_pcap_bytes(blob.as_py()):
                lt.append(linktype)
                ts.append(ts_ns)
                cl.append(cap)
                ol.append(orig)
                data.append(d)
        s = packet_record_schema()
        return pa.table(
            {
                "linktype": pa.array(lt, type=pa.uint64()),
                "timestamp": pa.array(ts, type=pa.int64()).cast(pa.timestamp("ns")),
                "captured_packet_length": pa.array(cl, type=pa.uint64()),
                "original_packet_length": pa.array(ol, type=pa.uint64()),
                "data": pa.array(data, type=pa.binary()),
            },
            schema=s,
        )

    return files.map_batches(expand, **_PYARROW)


# ---------------------------------------------------------------------------
# community ID (v1) — community_id.hpp:46-150
# ---------------------------------------------------------------------------

# request↔response ICMP message types (src/icmp.cpp:15-40)
_ICMP_DUAL = {8: 0, 0: 8, 13: 14, 14: 13, 15: 16, 16: 15, 10: 9, 9: 10, 17: 18, 18: 17}


def community_id(
    src: bytes, dst: bytes, proto: int, sport: int, dport: int, seed: int = 0
) -> str:
    """Community ID v1 over packed addresses (4 bytes v4 / 16 bytes
    v6): ``"1:" + base64(sha1(seed·src·dst·proto·0·sport·dport))``
    with the canonical endpoint ordering; ICMP type/code map to the
    port pair via the request↔response dual table."""
    one_way = False
    if proto == IPPROTO_ICMP:
        d = _ICMP_DUAL.get(sport)
        if d is None:
            one_way = True
        else:
            dport = d
    ordered = one_way or src < dst or (src == dst and sport < dport)
    if not ordered:
        src, dst, sport, dport = dst, src, dport, sport
    h = hashlib.sha1()
    h.update(struct.pack(">H", seed))
    h.update(src)
    h.update(dst)
    h.update(struct.pack(">BBHH", proto, 0, sport, dport))
    return "1:" + base64.b64encode(h.digest()).decode()


# ---------------------------------------------------------------------------
# decapsulate
# ---------------------------------------------------------------------------


def _fmt_mac(b: bytes) -> str:
    # fmt::formatter<mac>: "{:02X}" joined with "-" (mac.hpp:79-88)
    return "-".join(f"{x:02X}" for x in b)


def _parse_frame(data: bytes) -> Optional[dict]:
    """Layer 2: ethernet + single/double VLAN tags
    (decapsulate.cpp:36-105). Returns ether/vlan fields + payload."""
    if len(data) < 14:
        return None
    out = {
        "eth_dst": _fmt_mac(data[0:6]),
        "eth_src": _fmt_mac(data[6:12]),
        "vlan_outer": None,
        "vlan_inner": None,
    }
    (etype,) = struct.unpack_from(">H", data, 12)
    off = 14
    if etype == ETHERTYPE_VLAN:
        if len(data) < 18:
            return None
        out["vlan_outer"] = struct.unpack_from(">H", data, 14)[0] & 0x0FFF
        (etype,) = struct.unpack_from(">H", data, 16)
        off = 18
        if etype == ETHERTYPE_VLAN:  # QinQ with TPID 0x8100
            if len(data) < 22:
                return None
            out["vlan_inner"] = struct.unpack_from(">H", data, 18)[0] & 0x0FFF
            (etype,) = struct.unpack_from(">H", data, 20)
            off = 22
    elif etype == ETHERTYPE_QINQ:
        if len(data) < 22:
            return None
        out["vlan_outer"] = struct.unpack_from(">H", data, 14)[0] & 0x0FFF
        out["vlan_inner"] = struct.unpack_from(">H", data, 18)[0] & 0x0FFF
        (etype,) = struct.unpack_from(">H", data, 20)
        off = 22
    out["eth_type"] = etype
    out["payload"] = data[off:]
    return out


def _parse_ip(data: bytes, etype: int) -> Optional[dict]:
    """Layer 3: IPv4/IPv6 (decapsulate.cpp:108-146)."""
    if etype == ETHERTYPE_IPV4:
        if len(data) < 20:
            return None
        hlen = (data[0] & 0x0F) * 4
        if len(data) < hlen:
            return None
        return {
            "src": data[12:16],
            "dst": data[16:20],
            "proto": data[9],
            "payload": data[hlen:],
        }
    if etype == ETHERTYPE_IPV6:
        if len(data) < 40:
            return None
        return {
            "src": data[8:24],
            "dst": data[24:40],
            "proto": data[6],
            "payload": data[40:],
        }
    return None


def _parse_l4(data: bytes, proto: int) -> Optional[Tuple[int, int]]:
    """Layer 4: TCP/UDP ports or ICMP type/code
    (decapsulate.cpp:150-200)."""
    if proto == IPPROTO_TCP:
        if len(data) < 20:
            return None
        sport, dport = struct.unpack_from(">HH", data, 0)
        if len(data) < (data[12] >> 4) * 4:
            return None
        return sport, dport
    if proto == IPPROTO_UDP:
        if len(data) < 8:
            return None
        return struct.unpack_from(">HH", data, 0)
    if proto == IPPROTO_ICMP:
        if len(data) < 8:
            return None
        return data[0], data[1]
    return None


def decapsulate_row(data: Optional[bytes], linktype: int) -> dict:
    """One packet → flat decapsulated fields (None where a layer
    failed to parse, exactly the reference's early-return points)."""
    row = {
        "eth_src": None, "eth_dst": None, "eth_type": None,
        "vlan_outer": None, "vlan_inner": None,
        "ip_src": None, "ip_dst": None, "ip_proto": None,
        "src_port": None, "dst_port": None,
        "icmp_type": None, "icmp_code": None,
        "community_id": None,
    }
    if data is None or linktype != LINKTYPE_ETHERNET:
        return row
    frame = _parse_frame(data)
    if frame is None:
        return row
    row["eth_src"] = frame["eth_src"]
    row["eth_dst"] = frame["eth_dst"]
    row["eth_type"] = frame["eth_type"]
    row["vlan_outer"] = frame["vlan_outer"]
    row["vlan_inner"] = frame["vlan_inner"]
    ip = _parse_ip(frame["payload"], frame["eth_type"])
    if ip is None:
        return row
    row["ip_src"] = str(ipaddress.ip_address(ip["src"]))
    row["ip_dst"] = str(ipaddress.ip_address(ip["dst"]))
    row["ip_proto"] = ip["proto"]
    l4 = _parse_l4(ip["payload"], ip["proto"])
    if l4 is None:
        return row
    if ip["proto"] == IPPROTO_ICMP:
        row["icmp_type"], row["icmp_code"] = l4
    else:
        row["src_port"], row["dst_port"] = l4
    row["community_id"] = community_id(ip["src"], ip["dst"], ip["proto"], l4[0], l4[1])
    return row


_DECAP_FIELDS = [
    ("eth_src", pa.string()), ("eth_dst", pa.string()), ("eth_type", pa.uint64()),
    ("vlan_outer", pa.uint64()), ("vlan_inner", pa.uint64()),
    ("ip_src", pa.string()), ("ip_dst", pa.string()), ("ip_proto", pa.uint64()),
    ("src_port", pa.uint64()), ("dst_port", pa.uint64()),
    ("icmp_type", pa.uint64()), ("icmp_code", pa.uint64()),
    ("community_id", pa.string()),
]


def decapsulate(ds: Dataset, keep_pcap: bool = True) -> Dataset:
    """``decapsulate`` over ``pcap.packet`` rows. Output mirrors the
    reference's ``tenzir.packet`` (ether/vlan/ip/l4/community_id as
    nested records there, flattened-with-prefix columns here — the
    repo's ``flatten`` convention), plus the original row as a
    ``pcap`` struct column when ``keep_pcap``."""

    def apply(t: pa.Table) -> pa.Table:
        lts = t["linktype"].to_pylist()
        cols = {name: [] for name, _ in _DECAP_FIELDS}
        for blob, lt in zip(t["data"], lts):
            r = decapsulate_row(blob.as_py(), lt if lt is not None else 0)
            for name, _ in _DECAP_FIELDS:
                cols[name].append(r[name])
        arrays = [pa.array(cols[name], type=typ) for name, typ in _DECAP_FIELDS]
        names = [name for name, _ in _DECAP_FIELDS]
        if keep_pcap:
            arrays.append(
                pa.StructArray.from_arrays(
                    [t[c].combine_chunks() for c in t.column_names],
                    names=t.column_names,
                )
            )
            names.append("pcap")
        return pa.table(dict(zip(names, arrays)))

    return ds.map_batches(apply, **_PYARROW)


# ---------------------------------------------------------------------------
# deterministic synthetic packets (spec-level; shared with the oracle)
# ---------------------------------------------------------------------------


def gen_packet_specs(n: int = 1200, seed: int = 23) -> List[dict]:
    """Deterministic flow specs. The engine turns each spec into frame
    BYTES (build_frame), writes a pcap, re-parses, and decapsulates;
    the oracle (tenzir_ray.naive.decapsulate_expected) derives the
    expected output from the SPECS alone — it never sees the bytes or
    the parser."""
    import numpy as np

    rng = np.random.default_rng(seed)
    specs = []
    for i in range(n):
        kind = rng.choice(
            ["tcp4", "udp4", "icmp4", "tcp6", "vlan_tcp4", "qinq_udp4", "garbage"],
            p=[0.35, 0.2, 0.12, 0.12, 0.1, 0.06, 0.05],
        )
        spec = {
            "i": i,
            "kind": str(kind),
            "ts_ns": 1_700_000_000_000_000_000 + i * 1_000_003,
            "src_mac": bytes(rng.integers(0, 256, 6).tolist()),
            "dst_mac": bytes(rng.integers(0, 256, 6).tolist()),
            "sport": int(rng.integers(1024, 65536)),
            "dport": int(rng.choice([80, 443, 53, 22, 8080])),
            "icmp_type": int(rng.choice([8, 0, 3, 13, 11])),
            "icmp_code": int(rng.integers(0, 4)),
            "vlan_outer": int(rng.integers(1, 4095)),
            "vlan_inner": int(rng.integers(1, 4095)),
            "payload_len": int(rng.integers(0, 64)),
        }
        if kind == "tcp6":
            spec["src_ip"] = bytes([0x20, 0x01, 0x0D, 0xB8] + rng.integers(0, 256, 12).tolist())
            spec["dst_ip"] = bytes([0x20, 0x01, 0x0D, 0xB8] + rng.integers(0, 256, 12).tolist())
        else:
            spec["src_ip"] = bytes([10] + rng.integers(0, 256, 3).tolist())
            spec["dst_ip"] = bytes([192, 168] + rng.integers(0, 256, 2).tolist())
        specs.append(spec)
    return specs


def build_frame(spec: dict) -> bytes:
    """Spec → ethernet frame bytes (the generator side; the parser in
    this module must invert it)."""
    kind = spec["kind"]
    if kind == "garbage":
        return (spec["src_mac"] + spec["dst_mac"])[: 8 + spec["i"] % 5]
    pay = bytes((spec["i"] + j) % 256 for j in range(spec["payload_len"]))
    if kind in ("tcp4", "vlan_tcp4", "tcp6"):
        l4 = struct.pack(
            ">HHIIBBHHH", spec["sport"], spec["dport"], 1000 + spec["i"], 0,
            5 << 4, 0x18, 8192, 0, 0,
        ) + pay
        proto = IPPROTO_TCP
    elif kind in ("udp4", "qinq_udp4"):
        l4 = struct.pack(">HHHH", spec["sport"], spec["dport"], 8 + len(pay), 0) + pay
        proto = IPPROTO_UDP
    else:  # icmp4
        l4 = struct.pack(">BBHHH", spec["icmp_type"], spec["icmp_code"], 0, spec["i"] & 0xFFFF, 1) + pay
        proto = IPPROTO_ICMP
    if kind == "tcp6":
        ip = struct.pack(
            ">IHBB", 6 << 28, len(l4), proto, 64
        ) + spec["src_ip"] + spec["dst_ip"] + l4
        etype = ETHERTYPE_IPV6
    else:
        ip = struct.pack(
            ">BBHHHBBH", 0x45, 0, 20 + len(l4), spec["i"] & 0xFFFF, 0, 64, proto, 0
        ) + spec["src_ip"] + spec["dst_ip"] + l4
        etype = ETHERTYPE_IPV4
    eth = spec["dst_mac"] + spec["src_mac"]
    if kind == "vlan_tcp4":
        eth += struct.pack(">HH", ETHERTYPE_VLAN, spec["vlan_outer"]) + struct.pack(">H", etype)
    elif kind == "qinq_udp4":
        eth += (
            struct.pack(">HH", ETHERTYPE_QINQ, spec["vlan_outer"])
            + struct.pack(">HH", ETHERTYPE_VLAN, spec["vlan_inner"])  # inner TPID + TCI
            + struct.pack(">H", etype)
        )
    else:
        eth += struct.pack(">H", etype)
    return eth + ip


def write_spec_pcap(path: str, n: int = 1200, seed: int = 23) -> str:
    """Deterministic pcap on disk (idempotent)."""
    if not os.path.exists(path):
        specs = gen_packet_specs(n, seed)
        write_pcap([(s["ts_ns"], build_frame(s)) for s in specs], path + ".tmp")
        os.replace(path + ".tmp", path)
    return path
