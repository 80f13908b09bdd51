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
    pan = CryptoPanLike(fields=["ip"], seed="s1")
    a = pan.anonymize_ip("10.1.2.3")
    b = pan.anonymize_ip("10.1.2.99")   # shares /24
    c = pan.anonymize_ip("192.168.0.1")
    assert a != "10.1.2.3"  # actually anonymized
    # prefix preservation: same /24 in -> same /24 out
    assert a.rsplit(".", 1)[0] == b.rsplit(".", 1)[0]
    assert a.rsplit(".", 1)[0] != c.rsplit(".", 1)[0]
    # deterministic per seed, different across seeds
    assert CryptoPanLike(fields=["ip"], seed="s1").anonymize_ip("10.1.2.3") == a
    assert CryptoPanLike(fields=["ip"], seed="s2").anonymize_ip("10.1.2.3") != a

    ds = ray.data.from_arrow(pa.table({"ip": ["10.1.2.3", None, "bogus"]}))
    out = pseudonymize(ds, ["ip"], seed="s1", concurrency=1).to_pandas()
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
