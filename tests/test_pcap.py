"""pcap format + decapsulate tests (reference:
``builtins/formats/pcap.cpp``, ``builtins/operators/decapsulate.cpp``)."""

import struct

import pytest

from tenzir_ray import naive, pcap


def test_pcap_roundtrip_ns_and_us(tmp_path):
    recs = [(1_700_000_000_123_456_789 + i, bytes(range(i + 14))) for i in range(5)]
    for ns in (True, False):
        p = str(tmp_path / f"t_{ns}.pcap")
        pcap.write_pcap(recs, p, nanosecond=ns)
        got = list(pcap.parse_pcap_bytes(open(p, "rb").read()))
        assert [g[4] for g in got] == [r[1] for r in recs]
        assert all(g[0] == pcap.LINKTYPE_ETHERNET for g in got)
        for (ts, _), g in zip(recs, got):
            # us traces round the fractional part down to microseconds
            assert g[1] == ts if ns else g[1] == ts // 1_000 * 1_000


def test_pcap_byteswapped_trace():
    """A big-endian trace (swapped magic) parses identically
    (pcap.cpp's need_byte_swap path)."""
    frame = b"\xaa" * 20
    blob = struct.pack(">IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0, 65535, 1)
    blob += struct.pack(">IIII", 100, 7, len(frame), len(frame)) + frame
    (lt, ts, cap, orig, data), = pcap.parse_pcap_bytes(blob)
    assert (lt, cap, orig, data) == (1, 20, 20, frame)
    assert ts == 100 * 1_000_000_000 + 7_000


def test_pcap_concatenated_traces(tmp_path):
    """Concatenated pcap files parse as one stream with per-trace
    linktype (pcap.cpp:225-270)."""
    a, b = str(tmp_path / "a.pcap"), str(tmp_path / "b.pcap")
    pcap.write_pcap([(1, b"x" * 20)], a, linktype=1)
    pcap.write_pcap([(2, b"y" * 30)], b, linktype=101)
    blob = open(a, "rb").read() + open(b, "rb").read()
    got = list(pcap.parse_pcap_bytes(blob))
    assert [(g[0], g[4]) for g in got] == [(1, b"x" * 20), (101, b"y" * 30)]


def test_pcap_truncated_packet_raises():
    blob = struct.pack("<IHHiIII", 0xA1B23C4D, 2, 4, 0, 0, 65535, 1)
    blob += struct.pack("<IIII", 0, 0, 50, 50) + b"short"
    with pytest.raises(ValueError, match="truncated"):
        list(pcap.parse_pcap_bytes(blob))


def test_community_id_spec_vector():
    """Published Corelight community-id v1 test vector; must also be
    direction-invariant."""
    import socket

    src, dst = socket.inet_aton("128.232.110.120"), socket.inet_aton("66.35.250.204")
    want = "1:LQU9qZlK+B5F3KDmev6m5PMibrg="
    assert pcap.community_id(src, dst, 6, 34855, 80) == want
    assert pcap.community_id(dst, src, 6, 80, 34855) == want
    assert naive._cid_v1("128.232.110.120", "66.35.250.204", 6, 34855, 80) == want


def test_decapsulate_matches_spec_oracle(ray_session, tmp_path):
    """bytes-builder → pcap write → pcap read → decapsulate must equal
    the spec-level expected table (naive.decapsulate_expected shares
    only the flow specs, not the bytes or parser)."""
    p = str(tmp_path / "synth.pcap")
    pcap.write_spec_pcap(p, n=300, seed=5)
    got = pcap.decapsulate(pcap.read_pcap(p), keep_pcap=False).to_pandas()
    exp = naive.decapsulate_expected(300, 5).to_pandas()
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    g = got[cols].sort_values(cols, na_position="first").reset_index(drop=True)
    x = exp[cols].sort_values(cols, na_position="first").reset_index(drop=True)
    assert g.equals(x)


def test_decapsulate_keeps_pcap_struct(ray_session, tmp_path):
    p = str(tmp_path / "synth2.pcap")
    pcap.write_spec_pcap(p, n=50, seed=9)
    t = pcap.decapsulate(pcap.read_pcap(p)).limit(5).to_pandas()
    assert "pcap" in t.columns
    row = t["pcap"].iloc[0]
    assert set(row) == {
        "linktype", "timestamp", "captured_packet_length",
        "original_packet_length", "data",
    }
