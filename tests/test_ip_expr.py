"""ip/subnet domain types + type/meta extractors in the expression
language — VERDICT r4 item 2. Reference: expression.hpp:37-109
(meta/type extractors), type.hpp:703,795 (ip/subnet domains)."""

import ipaddress

import pyarrow as pa
import pytest

from tenzir_ray.expr import compile_predicate, parse, to_dataset_filter


T = pa.table(
    {
        "src_ip": ["10.1.2.3", "11.0.0.1", "10.255.0.9", None, "192.168.1.1",
                   "not-an-ip"],
        "host": ["a", "b", "c", "d", "e", "f"],
        "n": [1, 2, 3, 4, 5, 6],
    }
)


def _mask(expr, t=T):
    return compile_predicate(expr)(t).to_pylist()


def test_subnet_containment_v4():
    assert _mask("src_ip in 10.0.0.0/8") == [True, False, True, None, False, False]
    assert _mask("src_ip not in 10.0.0.0/8") == [False, True, False, None, True, True]
    # non-/8 masks exercise real prefix arithmetic
    assert _mask("src_ip in 10.0.0.0/9") == [True, False, False, None, False, False]


def test_ip_equality_and_canonical_v6():
    assert _mask("src_ip == 192.168.1.1") == [False, False, False, None, True, False]
    t6 = pa.table({"src_ip": ["::1", "0:0:0:0:0:0:0:1", "fe80::1", None]})
    assert _mask("src_ip == ::1", t6) == [True, True, False, None]
    assert _mask("src_ip in fe80::/10", t6) == [False, False, True, None]


def test_type_extractor_ip_fans_out():
    # :ip applies to the (sniffed) ip column only — `host`/`n` don't
    # match; a column with unparseable values is NOT sniffed as ip
    tc = pa.table(
        {
            "src_ip": ["10.1.2.3", "11.0.0.1", None, "192.168.1.1"],
            "host": ["a", "b", "c", "d"],
            "n": [1, 2, 3, 4],
        }
    )
    assert _mask(":ip in 10.0.0.0/8", tc) == [True, False, None, False]
    # the dirty column (contains 'not-an-ip') must not be sniffed
    assert _mask(":ip in 10.0.0.0/8") == [None] * 6
    # explicit tenzir_type metadata wins over sniffing
    t = pa.table(
        {
            "a": pa.array(["172.16.0.1", "10.0.0.2"]),
            "b": pa.array(["10.9.9.9", "172.16.0.1"]),
        },
        schema=pa.schema(
            [
                pa.field("a", pa.string(), metadata={"tenzir_type": "ip"}),
                pa.field("b", pa.string(), metadata={"tenzir_type": "string"}),
            ]
        ),
    )
    # only `a` is declared ip — if b were (wrongly) included, row 0's
    # 10.9.9.9 would flip it to True
    assert _mask(":ip in 10.0.0.0/8", t) == [False, True]


def test_type_extractor_arrow_types():
    t = pa.table({"x": [1, 2], "y": [1.5, 2.5], "s": ["a", "b"]})
    assert compile_predicate(":int >= 2")(t).to_pylist() == [False, True]
    assert compile_predicate(":double < 2")(t).to_pylist() == [True, False]
    assert compile_predicate(":string == 'a'")(t).to_pylist() == [True, False]


def test_meta_extractors():
    t = pa.table(
        {"_schema": ["zeek.conn", "zeek.dns", "suricata.alert"], "v": [1, 2, 3]}
    )
    assert compile_predicate("#schema == 'zeek.conn'")(t).to_pylist() == [
        True, False, False,
    ]
    assert compile_predicate("#schema matches '^zeek'")(t).to_pylist() == [
        True, True, False,
    ]
    # missing meta column -> null mask (missing-field rule)
    t2 = pa.table({"v": [1]})
    assert compile_predicate("#schema == 'x'")(t2).to_pylist() == [None]
    # #schema pushes down as the reserved column
    f = to_dataset_filter("#schema == 'zeek.conn'")
    assert f is not None


def test_ip_literal_parse_and_errors():
    node = parse("src_ip in 10.0.0.0/8")
    assert isinstance(node.rhs.value, ipaddress.IPv4Network)
    with pytest.raises(ValueError, match="invalid IP literal"):
        parse("src_ip == 999.1.2.3")
    with pytest.raises(ValueError, match="left side"):
        compile_predicate("'x' == :ip")
    with pytest.raises(TypeError, match="containment"):
        compile_predicate("src_ip == 10.0.0.0/8")(T)
    # subnet predicates don't push down (post-read filter instead)
    assert to_dataset_filter("src_ip in 10.0.0.0/8") is None


def test_plain_floats_still_tokenize():
    t = pa.table({"x": [1.5, 2.5]})
    assert compile_predicate("x > 1.6")(t).to_pylist() == [False, True]
    assert compile_predicate("x > 3.0 / 2")(t).to_pylist() == [False, True]


def test_ip_literal_on_left_and_bad_extractors():
    """Code-review r5: literal-on-left ip equality normalizes instead
    of crashing per batch; typo'd meta/type extractors and
    subnet-on-left fail at COMPILE time."""
    import pyarrow as pa
    import pytest

    from tenzir_ray.expr import compile_predicate

    t = pa.table({"src_ip": ["10.1.2.3", "10.1.2.4", None]})
    m = compile_predicate("10.1.2.3 == src_ip")(t)
    assert m.to_pylist() == [True, False, None]
    m2 = compile_predicate("10.1.2.3 != src_ip")(t)
    assert m2.to_pylist() == [False, True, None]
    with pytest.raises(ValueError, match="unknown meta extractor"):
        compile_predicate('#shema == "zeek.conn"')
    with pytest.raises(ValueError, match="unknown type extractor"):
        compile_predicate(':nosuch == "x"')
    with pytest.raises(TypeError, match="RIGHT side"):
        compile_predicate("10.0.0.0/8 in src_ip")(t)
