"""Tests: format parsers, sigma rule engine, TQL mini-language,
pseudonymize, compress/decompress."""

import os
import time

import pyarrow as pa
import pytest
import ray.data

from tenzir_ray import formats, sigma, tql
from tenzir_ray.ops.anonymize import CryptoPanLike, pseudonymize
from tenzir_ray.ops.bytes import compress_op, decompress_op


def lines_ds(lines):
    return ray.data.from_arrow(pa.table({"text": lines}))


def test_parse_cef():
    line = (
        "CEF:0|Vendor|Product|1.0|42|Test Event|5|src=10.0.0.1 dst=10.0.0.2 "
        "msg=hello world act=blocked"
    )
    out = formats.parse_cef(lines_ds([line, "garbage"])).to_pandas()
    ok = out[out.device_vendor == "Vendor"].iloc[0]
    assert ok["signature_id"] == "42" and ok["severity"] == "5"
    ext = dict(ok["extension"])
    assert ext["src"] == "10.0.0.1" and ext["msg"] == "hello world"
    assert out.iloc[1]["device_vendor"] is None  # non-CEF line -> nulls


def test_parse_zeek_tsv():
    doc = [
        "#separator \\x09",
        "#empty_field\t(empty)",
        "#unset_field\t-",
        "#fields\tts\tuid\tid.orig_h\tport\tflag",
        "#types\ttime\tstring\taddr\tport\tbool",
        "1.5\tC1\t10.0.0.1\t80\tT",
        "2.5\tC2\t-\t443\tF",
    ]
    out = formats.parse_zeek_tsv(lines_ds(doc)).to_pandas()
    assert out["port"].tolist() == [80, 443]
    assert out["flag"].tolist() == [True, False]
    assert out["id.orig_h"].isna().tolist() == [False, True]


def test_parse_yaml_and_kv():
    out = formats.parse_yaml(lines_ds(['{"a": 1, "b": "x"}', "a: 2"])).to_pandas()
    assert sorted(out["a"].tolist()) == [1, 2]
    out = formats.parse_kv(lines_ds(['k1=v1 k2="two words" k3=3'])).to_pandas()
    kv = dict(out.iloc[0]["kv"])
    assert kv == {"k1": "v1", "k2": "two words", "k3": "3"}


def events_table():
    return pa.table(
        {
            "event_type": ["purchase", "click", "purchase", "error"],
            "value": [150.0, 10.0, 50.0, 500.0],
            "user_id": [1, 2, 3, 4],
        }
    )


def test_sigma_rules(tmp_path):
    rule = """
title: big purchase
detection:
  selection:
    event_type: purchase
    value|gt: 100
  condition: selection
"""
    p = tmp_path / "rule.yml"
    p.write_text(rule)
    ds = ray.data.from_arrow(events_table())
    out = sigma.sigma(ds, str(p), concurrency=1).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["user_id"] == 1 and out.iloc[0]["rule_title"] == "big purchase"


def test_sigma_condition_not_and_hot_reload(tmp_path):
    p = tmp_path / "r.yml"
    p.write_text(
        """
title: v1
detection:
  selection:
    value|gt: 40
  filter:
    event_type: error
  condition: selection and not filter
"""
    )
    m = sigma.SigmaMatcher(str(p), refresh_interval=0.0)
    out = m(events_table())
    assert sorted(out["user_id"].to_pylist()) == [1, 3]
    # hot reload: rewrite the rule, mtime changes -> recompiled
    time.sleep(0.01)
    p.write_text(
        """
title: v2
detection:
  selection:
    event_type: error
  condition: selection
"""
    )
    os.utime(p)
    out = m(events_table())
    assert out["rule_title"].to_pylist() == ["v2"]
    assert out["user_id"].to_pylist() == [4]


def test_tql_pipeline():
    t = pa.table({"x": [1, 2, 3, 4, 5], "g": ["a", "b", "a", "b", "a"]})
    ds = ray.data.from_arrow(t)
    out = tql.run("where x > 1 | extend y = x * 10 | summarize n=count(.), sy=sum(y) by g | sort g", ds)
    rows = out.to_pandas().to_dict("records")
    assert rows == [
        {"g": "a", "n": 2, "sy": 80},
        {"g": "b", "n": 2, "sy": 60},
    ]
    out = tql.run("select x | head 2", ds)
    assert out.count() == 2 and out.schema().names == ["x"]
    with pytest.raises(ValueError, match="unknown operator"):
        tql.compile_pipeline("frobnicate x")


def test_pseudonymize_prefix_preserving():
    # seeds are HEX strings per the reference's parse_seed_string
    # (pseudonymize.cpp:141-154) — non-hex chars parse to 0
    pan = CryptoPanLike(fields=["ip"], seed="aa11")
    a = pan.anonymize_ip("10.1.2.3")
    b = pan.anonymize_ip("10.1.2.99")   # shares /24
    c = pan.anonymize_ip("192.168.0.1")
    assert a != "10.1.2.3"  # actually anonymized
    # prefix preservation: same /24 in -> same /24 out
    assert a.rsplit(".", 1)[0] == b.rsplit(".", 1)[0]
    assert a.rsplit(".", 1)[0] != c.rsplit(".", 1)[0]
    # deterministic per seed, different across seeds
    assert CryptoPanLike(fields=["ip"], seed="aa11").anonymize_ip("10.1.2.3") == a
    assert CryptoPanLike(fields=["ip"], seed="bb22").anonymize_ip("10.1.2.3") != a

    ds = ray.data.from_arrow(pa.table({"ip": ["10.1.2.3", None, "bogus"]}))
    out = pseudonymize(ds, ["ip"], seed="aa11", concurrency=1).to_pandas()
    assert out["ip"].tolist()[0] == a
    assert out["ip"].tolist()[2] == "bogus"  # non-IP passes through


def test_compress_roundtrip():
    texts = ["hello world " * 50, None, "tiny"]
    ds = ray.data.from_arrow(pa.table({"doc_id": [0, 1, 2], "payload": texts}))
    comp = compress_op(ds, "payload", codec="zstd")
    back = decompress_op(comp, "payload", codec="zstd").to_pandas().sort_values("doc_id")
    vals = [None if v is None else v.decode() for v in back["payload"]]
    assert vals == texts


def test_parse_ndjson_selector():
    lines = [
        '{"event_type": "alert", "src": "10.0.0.1"}',
        '{"event_type": "dns", "q": "example.com"}',
        "not json",
    ]
    out = formats.parse_suricata(lines_ds(lines)).to_pandas()
    assert sorted(out["_schema"]) == ["suricata.alert", "suricata.dns"]
    out = formats.parse_ndjson(lines_ds(lines)).to_pandas()
    assert len(out) == 2 and "_schema" not in out.columns


def test_route_schemas():
    lines = [
        '{"event_type": "alert", "sev": 3}',
        '{"event_type": "dns", "q": "a.com"}',
        '{"event_type": "alert", "sev": 1}',
    ]
    routed = formats.route_schemas(formats.parse_suricata(lines_ds(lines)))
    assert set(routed) == {"suricata.alert", "suricata.dns"}
    alerts = routed["suricata.alert"].to_pandas()
    assert sorted(alerts["sev"]) == [1, 3]
    assert "q" not in alerts.columns  # dns-only field dropped from alert branch
    assert routed["suricata.dns"].count() == 1


def test_aes_fips197_vectors():
    # FIPS-197 Appendix B + C.1 known-answer vectors
    from tenzir_ray.aes import encrypt_block, expand_key

    rk = expand_key(bytes.fromhex("000102030405060708090a0b0c0d0e0f"))
    assert (
        encrypt_block(rk, bytes.fromhex("00112233445566778899aabbccddeeff")).hex()
        == "69c4e0d86a7b0430d8cdb78070b4c55a"
    )
    rk2 = expand_key(bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c"))
    assert (
        encrypt_block(rk2, bytes.fromhex("3243f6a8885a308d313198a2e0370734")).hex()
        == "3925841d02dc09fbdc118597196a0b32"
    )


def test_cryptopan_published_vectors():
    # public node-cryptopan test data — the same vectors the
    # reference's libtenzir/test/ip.cpp:181-330 checks, so the PRF is
    # wire-compatible with other Crypto-PAn implementations
    from tenzir_ray.ops.anonymize import CryptoPan

    pan3 = CryptoPan(bytes(range(32)))
    for orig, anon in {
        "192.0.2.1": "2.90.93.17",
        "0.0.0.0": "254.152.65.220",
        "10.0.1.128": "246.35.190.47",
        "127.0.0.1": "168.227.160.61",
        "255.255.255.255": "56.0.15.254",
        "148.88.132.153": "106.38.130.153",
        "148.88.133.200": "106.38.131.223",
    }.items():
        assert pan3.anonymize_ip(orig) == anon
    seed_1 = bytes([21, 34, 23, 141, 51, 164, 207, 128, 19, 10, 91, 22, 73, 144,
                    125, 16, 216, 152, 143, 131, 121, 121, 101, 39, 98, 87, 76,
                    45, 42, 132, 34, 2])
    pan1 = CryptoPan(seed_1)
    assert pan1.anonymize_ip("128.11.68.132") == "135.242.180.132"
    assert pan1.anonymize_ip("::1") == "78ff:f001:9fc0:20df:8380:b1f1:704:ed"
    assert pan1.anonymize_ip("2001:db8::1") == "4401:2bc:603f:d91d:27f:ff8e:e6f1:dc1e"


def test_cryptopan_naive_oracle_agrees():
    # the paper-style bit-string reference (naive.py) and the
    # operator's incremental byte-masking loop must agree bit-for-bit
    from tenzir_ray import naive
    from tenzir_ray.ops.anonymize import CryptoPanLike

    op = CryptoPanLike(fields=["ip"], seed="bench")
    for a in ("10.0.3.7", "10.0.3.8", "192.168.1.1", "2001:db8::5", "0.0.0.0"):
        assert op.anonymize_ip(a) == naive.pan_pseudonym(a, seed="bench")


def test_tql_new_aggregates_and_approx_top():
    """Round-3 aggregates via the TQL grammar: median, quantile_cont_<q>,
    approx_count_distinct, arg_max (multi-arg), top --approx, and the
    loud rare --approx rejection."""
    t = pa.table(
        {
            "g": ["a"] * 5 + ["b"] * 5,
            "v": [1.0, 2.0, 3.0, 4.0, 100.0, 10.0, 20.0, 30.0, 40.0, 50.0],
            "id": list(range(10)),
        }
    )
    ds = ray.data.from_arrow([t.slice(0, 5), t.slice(5)])
    rows = {
        r["g"]: r
        for r in tql.run(
            "summarize med=median(v), q5=quantile_cont_0.5(v), "
            "d=approx_count_distinct(v), w=arg_max(id, v, id) by g",
            ds,
        ).take_all()
    }
    assert rows["a"]["med"] == 3.0 and rows["b"]["med"] == 30.0
    assert rows["a"]["q5"] == 3.0
    assert rows["a"]["d"] == 5
    assert rows["a"]["w"] == 4 and rows["b"]["w"] == 9  # row of max v per group

    skew = pa.table({"x": ["hot"] * 50 + ["warm"] * 20 + ["c1", "c2", "c3"]})
    top = tql.run("top x 2 --approx", ray.data.from_arrow(skew)).take_all()
    assert [r["x"] for r in top] == ["hot", "warm"]
    assert top[0]["count"] >= top[1]["count"]

    with pytest.raises(ValueError, match="rare --approx"):
        tql.run("rare x 2 --approx", ray.data.from_arrow(skew))


def test_tql_nested_if_else(ray_session):
    """Pipeline-as-operator (pipeline.hpp:401-542): if/else routes TRUE
    rows to the then-branch, false AND null to else (Kleene), branch
    sub-pipelines nest their own pipes, outputs union."""
    import pyarrow as pa
    import ray.data

    from tenzir_ray import tql

    ds = ray.data.from_arrow(pa.table({"x": [1, 2, 3, 4, None]}))
    out = tql.run(
        "if x > 2 { extend tag = 1 } else { extend tag = 0 } | sort x", ds
    ).to_pandas()
    got = {(-1 if pd_isna(x) else int(x)): t for x, t in zip(out["x"], out["tag"])}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, -1: 0}
    # nested pipes inside a branch; no else keeps rows unchanged
    out2 = tql.run("if x > 1 { where x > 3 | extend tag = 9 }", ds).to_pandas()
    assert sorted(out2["x"].dropna()) == [1.0, 4.0]  # 2,3 filtered in-branch


def pd_isna(v):
    import pandas as pd

    return pd.isna(v)


def test_tql_fork_side_pipeline(ray_session, tmp_path):
    """fork { ... } drives a side sub-pipeline to completion and passes
    the input stream through unchanged."""
    import os

    import pyarrow as pa
    import ray.data

    from tenzir_ray import registry, tql

    out_dir = str(tmp_path / "forked")

    @registry.register_operator("_test-fork-sink")
    def _sink(d, arg):
        d.write_parquet(f"local://{out_dir}")
        return d

    try:
        ds = ray.data.from_arrow(pa.table({"x": [1, 2, 3, 4]}))
        out = tql.run("fork { where x > 2 | _test-fork-sink . } | extend y = x", ds)
        df = out.to_pandas()
        assert len(df) == 4 and list(df["y"]) == [1, 2, 3, 4]
        import pyarrow.parquet as pq

        side = pq.read_table(out_dir)
        assert sorted(side["x"].to_pylist()) == [3, 4]
    finally:
        registry.OPERATORS.pop("_test-fork-sink", None)


def test_tql_brace_errors():
    from tenzir_ray import tql

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unbalanced"):
        tql.compile_pipeline("if x > 1 { extend y = 1 ")
    with _pytest.raises(ValueError, match="trailing"):
        tql.compile_pipeline("fork { pass } garbage")


def test_tql_quoted_braces_and_pipes(ray_session):
    """Code-review r5: braces and pipes inside string literals are
    payload, not pipeline structure."""
    import pyarrow as pa
    import ray.data

    from tenzir_ray import tql

    ds = ray.data.from_arrow(
        pa.table({"msg": ["{json}", "plain", "a|b", "{x"]})
    )
    out = tql.run('where msg matches "^\\{"', ds).to_pandas()
    assert sorted(out["msg"]) == ["{json}", "{x"]
    out2 = tql.run('where msg == "a|b"', ds).to_pandas()
    assert out2["msg"].tolist() == ["a|b"]
    # quoted braces inside nested pipelines still balance
    out3 = tql.run('if msg matches "\\{" { extend t = 1 } else { extend t = 0 }', ds).to_pandas()
    assert sorted(out3["t"]) == [0, 0, 1, 1]
