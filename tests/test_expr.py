"""Expression language unit tests (reference analog:
libtenzir/test/expression_evaluation.cpp)."""

import pyarrow as pa
import pytest

from tenzir_ray.expr import compile_predicate, compile_scalar, parse, to_dataset_filter

T = pa.table(
    {
        "x": [1, 2, 3, 4, None],
        "y": [1.5, 2.5, 3.5, 4.5, 5.5],
        "s": ["a", "b", "c", "a", None],
        "b": [True, False, True, None, False],
    }
)


def mask(expr):
    return compile_predicate(expr)(T).to_pylist()


def test_comparisons():
    assert mask("x == 2") == [False, True, False, False, None]
    assert mask("x != 2") == [True, False, True, True, None]
    assert mask("x >= 3") == [False, False, True, True, None]
    assert mask("y < 3.0") == [True, True, False, False, False]


def test_in_and_null():
    assert mask('s in ["a", "c"]') == [True, False, True, True, False]
    assert mask('s not in ["a"]') == [False, True, True, False, True]
    assert mask("x == null") == [False, False, False, False, True]
    assert mask("x != null") == [True, True, True, True, False]


def test_boolean_connectives():
    assert mask('x >= 2 && s == "a"') == [False, False, False, True, None]
    assert mask("x == 1 || x == 3") == [True, False, True, False, None]
    assert mask("!(x == 1)") == [False, True, True, True, None]


def test_scalar_arithmetic():
    vals = compile_scalar("x * 2 + 1")(T).to_pylist()
    assert vals == [3, 5, 7, 9, None]
    vals = compile_scalar("y - 0.5")(T).to_pylist()
    assert vals == [1.0, 2.0, 3.0, 4.0, 5.0]


def test_literal_only_scalar_broadcasts():
    vals = compile_scalar('"z"')(T).to_pylist()
    assert vals == ["z"] * 5


def test_parse_errors():
    with pytest.raises(ValueError):
        parse("x ==")
    with pytest.raises(ValueError):
        parse("x @ 3")


def test_pushdown_roundtrip():
    import pyarrow.dataset as pads

    f = to_dataset_filter('x > 2 && s in ["a", "b"]')
    assert isinstance(f, pads.Expression)
    # struct paths are not pushdown-expressible
    assert to_dataset_filter("a.b == 1") is None


def test_matches_regex():
    assert mask('s matches "a|b"') == [True, True, False, True, None]
    # regex is not pushdown-expressible -> None, not an exception
    assert to_dataset_filter('s matches "a"') is None


def test_scalar_function_calls():
    import pyarrow as pa
    import pytest

    from tenzir_ray.expr import compile_predicate, compile_scalar

    t = pa.table(
        {
            "name": ["Alice", "bob", None],
            "x": [1.234, -2.0, 9.0],
        }
    )
    assert compile_scalar("upper(name)")(t).to_pylist() == ["ALICE", "BOB", None]
    assert compile_scalar("substr(name, 2, 3)")(t).to_pylist() == ["lic", "ob", None]
    assert compile_scalar("coalesce(name, 'missing')")(t).to_pylist() == [
        "Alice", "bob", "missing",
    ]
    assert compile_scalar("round(x, 1)")(t).to_pylist() == [1.2, -2.0, 9.0]
    assert compile_scalar("length(trim(name))")(t).to_pylist() == [5, 3, None]
    mask = compile_predicate("starts_with(name, 'A') || abs(x) > 5")(t)
    assert mask.to_pylist() == [True, False, True]
    with pytest.raises(ValueError, match="unknown function"):
        compile_scalar("frobnicate(x)")
    with pytest.raises(ValueError, match="takes"):
        compile_scalar("upper(name, x)")


def test_int_literal_args_validated_at_compile_time():
    # ADVICE r4: substr/round kernels int() their args — a column there
    # must fail at compile time with a clear message, not per batch
    from tenzir_ray.expr import compile_scalar

    with pytest.raises(ValueError, match="integer literal"):
        compile_scalar("substr(name, x, 2)")
    with pytest.raises(ValueError, match="integer literal"):
        compile_scalar("round(x, x)")
    with pytest.raises(ValueError, match="integer literal"):
        compile_scalar("substr(name, 1.5)")
