"""Expression mini-language compiled to vectorized pyarrow.compute kernels.

This is the analog of the reference's expression AST
(``libtenzir/include/tenzir/expression.hpp``: ``conjunction`` :183,
``disjunction`` :198, ``negation`` :213, ``predicate`` :138 over
field/type extractors and literals) and its row-mask evaluation model
(``table_slice.hpp:358-373``: ``evaluate(expr) -> ids bitmap`` then
``filter``). Here an expression compiles ONCE (on the driver) to a
closure ``pa.Table -> pa.BooleanArray`` (predicates) or
``pa.Table -> pa.Array`` (scalars); the closure is shipped to
``map_batches`` workers and runs fully vectorized — no per-row Python.

Supported surface (TQL-flavored)::

    field == literal, !=, <, <=, >, >=
    field in [a, b, c], field not in [...]
    expr && expr, expr || expr, ! expr, ( expr )
    arithmetic: + - * / %  (scalar expressions, e.g. put/extend RHS)
    literals: ints, floats, "strings", true/false/null, [lists]
    dotted field paths resolve into nested structs (a.b.c)
    ip/subnet domain: src_ip in 10.0.0.0/8, ip == 192.168.1.1, ::1
      (string-carried columns, reference type.hpp:703,795)
    type extractors: :ip == 1.2.3.4, :string matches "x" — the
      predicate fans out over every field of that type in the batch
      (reference expression.hpp:86)
    meta extractors: #schema == "zeek.conn", #import_time > ... —
      reserved columns _schema/_import_time (expression.hpp:37)

Relational operators mirror ``libtenzir/include/tenzir/operator.hpp:44-55``
(in/not_in/equal/not_equal/less/.../greater_equal).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Callable, Optional, Union

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Field:
    """A dotted field path, e.g. ``a.b.c`` resolves into nested structs."""

    path: tuple

    def __repr__(self):
        return ".".join(self.path)


@dataclass(frozen=True)
class Literal:
    value: Any


@dataclass(frozen=True)
class Call:
    name: str
    args: tuple


@dataclass(frozen=True)
class TypeExtractor:
    """``:ip == 1.2.3.4`` — the predicate applies to EVERY field of
    the given domain type in the batch's schema (disjunction).
    Reference: ``expression.hpp:86`` (type_extractor), tailored per
    schema at evaluation; here resolved per Arrow batch schema."""

    name: str

    def __repr__(self):
        return f":{self.name}"


@dataclass(frozen=True)
class MetaExtractor:
    """``#schema`` / ``#import_time`` — event metadata, not payload.
    Reference: ``expression.hpp:37`` (meta_extractor). Carried here as
    reserved columns (``_schema`` from the selector-routing parsers,
    ``_import_time`` stamped by the lake)."""

    name: str

    def __repr__(self):
        return f"#{self.name}"


@dataclass(frozen=True)
class Cmp:
    op: str  # ==, !=, <, <=, >, >=, in, not_in
    lhs: Any
    rhs: Any


@dataclass(frozen=True)
class And:
    parts: tuple


@dataclass(frozen=True)
class Or:
    parts: tuple


@dataclass(frozen=True)
class Not:
    inner: Any


@dataclass(frozen=True)
class Arith:
    op: str  # + - * / %
    lhs: Any
    rhs: Any


Node = Union[Field, Literal, Cmp, And, Or, Not, Arith, TypeExtractor, MetaExtractor]

# meta extractor name -> reserved carrier column
_META_COLUMNS = {
    "schema": "_schema",
    "schema_id": "_schema_id",
    "import_time": "_import_time",
}

# ---------------------------------------------------------------------------
# Tokenizer / recursive-descent parser
# ---------------------------------------------------------------------------

# subnet/ip literal fragments (reference type.hpp:703,795 — ip and
# subnet are first-class literal domains in TQL expressions). Ordered
# BEFORE num so `10.0.0.0/8` never half-tokenizes as a float + divide.
_V4 = r"(?:\d{1,3}\.){3}\d{1,3}"
_V6 = r"(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}|[0-9A-Fa-f:]*::[0-9A-Fa-f:.]*"

_TOKEN_RE = re.compile(
    rf"""\s*(?:
        (?P<subnet>(?:{_V4}|{_V6})/\d{{1,3}})
      | (?P<ip>{_V4}|{_V6})
      | (?P<typex>:[A-Za-z_][A-Za-z0-9_]*)
      | (?P<metax>\#[A-Za-z_][A-Za-z0-9_]*)
      | (?P<num>-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+)
      | (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
      | (?P<op>==|!=|<=|>=|&&|\|\||not\s+in\b|in\b|matches\b|[()<>!+\-*/%,\[\]])
      | (?P<kw>true\b|false\b|null\b)
      | (?P<ident>[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)
    )""",
    re.VERBOSE,
)


def _tokenize(text: str):
    import ipaddress

    pos, out = 0, []
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip() == "":
                break
            raise ValueError(f"cannot tokenize expression at: {text[pos:]!r}")
        pos = m.end()
        if m.lastgroup == "subnet":
            try:
                out.append(("lit", ipaddress.ip_network(m.group("subnet"), strict=False)))
            except ValueError as e:
                raise ValueError(f"invalid subnet literal {m.group('subnet')!r}: {e}")
        elif m.lastgroup == "ip":
            try:
                out.append(("lit", ipaddress.ip_address(m.group("ip"))))
            except ValueError as e:
                raise ValueError(f"invalid IP literal {m.group('ip')!r}: {e}")
        elif m.lastgroup == "typex":
            out.append(("typex", m.group("typex")[1:]))
        elif m.lastgroup == "metax":
            out.append(("metax", m.group("metax")[1:]))
        elif m.lastgroup == "num":
            t = m.group("num")
            out.append(("lit", float(t) if ("." in t or "e" in t or "E" in t) else int(t)))
        elif m.lastgroup == "str":
            s = m.group("str")[1:-1]
            out.append(("lit", s.replace('\\"', '"').replace("\\'", "'").replace("\\\\", "\\")))
        elif m.lastgroup == "kw":
            out.append(("lit", {"true": True, "false": False, "null": None}[m.group("kw")]))
        elif m.lastgroup == "op":
            op = re.sub(r"\s+", " ", m.group("op"))
            out.append(("op", "not_in" if op == "not in" else op))
        else:
            out.append(("ident", m.group("ident")))
    return out


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def eat(self, kind=None, val=None):
        k, v = self.peek()
        if kind and k != kind or (val is not None and v != val):
            raise ValueError(f"expected {val or kind}, got {v!r}")
        self.i += 1
        return v

    def parse(self) -> Node:
        node = self.or_()
        if self.i != len(self.toks):
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return node

    def or_(self):
        parts = [self.and_()]
        while self.peek() == ("op", "||"):
            self.eat()
            parts.append(self.and_())
        return parts[0] if len(parts) == 1 else Or(tuple(parts))

    def and_(self):
        parts = [self.unary()]
        while self.peek() == ("op", "&&"):
            self.eat()
            parts.append(self.unary())
        return parts[0] if len(parts) == 1 else And(tuple(parts))

    def unary(self):
        if self.peek() == ("op", "!"):
            self.eat()
            return Not(self.unary())
        return self.cmp()

    def cmp(self):
        lhs = self.sum_()
        k, v = self.peek()
        if k == "op" and v in ("==", "!=", "<", "<=", ">", ">=", "in", "not_in", "matches"):
            self.eat()
            return Cmp(v, lhs, self.sum_())
        return lhs

    def sum_(self):
        node = self.term()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            op = self.eat()
            node = Arith(op, node, self.term())
        return node

    def term(self):
        node = self.factor()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/", "%"):
            op = self.eat()
            node = Arith(op, node, self.factor())
        return node

    def factor(self):
        k, v = self.peek()
        if k == "op" and v == "(":
            self.eat()
            node = self.or_()
            self.eat("op", ")")
            return node
        if k == "op" and v == "[":
            self.eat()
            items = []
            while self.peek() != ("op", "]"):
                kk, vv = self.peek()
                if kk != "lit":
                    raise ValueError("list literals may contain only literals")
                items.append(vv)
                self.eat()
                if self.peek() == ("op", ","):
                    self.eat()
            self.eat("op", "]")
            return Literal(items)
        if k == "op" and v == "-":
            self.eat()
            inner = self.factor()
            if isinstance(inner, Literal):
                return Literal(-inner.value)
            return Arith("-", Literal(0), inner)
        if k == "lit":
            self.eat()
            return Literal(v)
        if k == "typex":
            self.eat()
            return TypeExtractor(v)
        if k == "metax":
            self.eat()
            return MetaExtractor(v)
        if k == "ident":
            self.eat()
            if self.peek() == ("op", "("):
                self.eat()
                args = []
                while self.peek() != ("op", ")"):
                    args.append(self.or_())
                    if self.peek() == ("op", ","):
                        self.eat()
                self.eat("op", ")")
                return Call(v, tuple(args))
            return Field(tuple(v.split(".")))
        raise ValueError(f"unexpected token {v!r}")


def parse(text: str) -> Node:
    """Parse an expression string into the AST."""
    return _Parser(_tokenize(text)).parse()


# ---------------------------------------------------------------------------
# Compilation to pyarrow.compute closures
# ---------------------------------------------------------------------------


def _resolve_field(table: pa.Table, path: tuple):
    """Resolve a dotted path against a table, descending into structs.
    A missing field resolves to all-null (the reference's
    missing-field-becomes-null rule, cast.hpp / summarize unification)
    — which a concept disjunction relies on when only some of its
    concrete fields exist in a given schema."""
    if path[0] not in table.column_names:
        return pa.nulls(table.num_rows)
    col = table[path[0]]
    for part in path[1:]:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.struct_field(col, part)
    return col


# scalar functions (TQL function surface, the analog of the
# reference's function plugins — tenzir/tql2/functions): name ->
# (min_arity, max_arity, kernel). All vectorized pyarrow.compute;
# SQL twins noted for oracle parity. substr is 1-based like SQL.
_FUNCTIONS: dict = {
    "upper": (1, 1, pc.utf8_upper),
    "lower": (1, 1, pc.utf8_lower),
    "trim": (1, 1, pc.utf8_trim_whitespace),
    "length": (1, 1, pc.utf8_length),
    "substr": (
        2,
        3,
        lambda s, start, n=None: pc.utf8_slice_codeunits(
            s, int(start) - 1, (int(start) - 1 + int(n)) if n is not None else None
        ),
    ),
    "starts_with": (2, 2, lambda s, p: pc.starts_with(s, pattern=p)),
    "ends_with": (2, 2, lambda s, p: pc.ends_with(s, pattern=p)),
    "contains": (2, 2, lambda s, p: pc.match_substring(s, pattern=p)),
    "abs": (1, 1, pc.abs),
    "floor": (1, 1, pc.floor),
    "ceil": (1, 1, pc.ceil),
    "sqrt": (1, 1, pc.sqrt),
    "exp": (1, 1, pc.exp),
    "ln": (1, 1, pc.ln),
    # floor(x*10^n + 0.5)/10^n — matches the repo-wide _round_cols /
    # _sqlr convention (DuckDB round() half-away parity for x >= 0)
    "round": (
        1,
        2,
        lambda x, n=0: pc.divide(
            pc.floor(pc.add(pc.multiply(x, float(10 ** int(n))), 0.5)),
            float(10 ** int(n)),
        ),
    ),
    "coalesce": (2, 99, pc.coalesce),
    "year": (1, 1, pc.year),
    "month": (1, 1, pc.month),
    "day": (1, 1, pc.day),
    "hour": (1, 1, pc.hour),
    "minute": (1, 1, pc.minute),
    "second": (1, 1, pc.second),
}


# TypeExtractor name -> Arrow type predicate (domain types the
# reference tailors per schema, type.hpp; ip is string-carried here
# and resolved by metadata or value sniffing — see _type_columns)
_TYPE_PREDICATES = {
    "string": lambda t: pa.types.is_string(t) or pa.types.is_large_string(t),
    "int": pa.types.is_signed_integer,
    "int64": pa.types.is_signed_integer,
    "uint": pa.types.is_unsigned_integer,
    "uint64": pa.types.is_unsigned_integer,
    "double": pa.types.is_floating,
    "bool": pa.types.is_boolean,
    "time": pa.types.is_timestamp,
    "duration": pa.types.is_duration,
}


def _type_columns(table: pa.Table, tname: str):
    """Columns the ``:type`` extractor applies to in this batch.
    Explicit ``tenzir_type`` field metadata wins; otherwise the Arrow
    physical type decides, except ``:ip``, which (being string-carried)
    falls back to sniffing the first few non-null values."""
    cols = []
    for i, f in enumerate(table.schema):
        meta = (f.metadata or {}).get(b"tenzir_type")
        if meta is not None:
            if meta.decode() == tname:
                cols.append(f.name)
            continue
        if tname == "ip":
            from tenzir_ray.iputil import looks_like_ip_column

            if (pa.types.is_string(f.type) or pa.types.is_large_string(f.type)) \
                    and looks_like_ip_column(table.column(i)):
                cols.append(f.name)
        elif tname in _TYPE_PREDICATES and _TYPE_PREDICATES[tname](f.type):
            cols.append(f.name)
    return cols


def _eval(node: Node, table: pa.Table):
    if isinstance(node, Literal):
        return node.value
    if isinstance(node, Field):
        return _resolve_field(table, node.path)
    if isinstance(node, MetaExtractor):
        col = _META_COLUMNS.get(node.name, f"_{node.name}")
        return _resolve_field(table, (col,))
    if isinstance(node, TypeExtractor):
        raise TypeError(
            f"type extractor :{node.name} is only valid as the left side "
            "of a comparison"
        )
    if isinstance(node, Call):
        args = [_eval(a, table) for a in node.args]
        return _FUNCTIONS[node.name][2](*args)
    if isinstance(node, Arith):
        lhs, rhs = _eval(node.lhs, table), _eval(node.rhs, table)
        fn = {
            "+": pc.add,
            "-": pc.subtract,
            "*": pc.multiply,
            "/": pc.divide,
            "%": lambda a, b: pc.subtract(a, pc.multiply(pc.floor(pc.divide(a, b)), b)),
        }[node.op]
        return fn(lhs, rhs)
    if isinstance(node, Cmp):
        if isinstance(node.lhs, TypeExtractor):
            # disjunction over every field of the type in THIS batch's
            # schema (the reference tailors the expression per schema,
            # expression.hpp:86; no matching field -> null mask)
            cols = _type_columns(table, node.lhs.name)
            if not cols:
                return pa.nulls(table.num_rows, type=pa.bool_())
            out = None
            for c in cols:
                m = _as_mask(
                    _eval(Cmp(node.op, Field((c,)), node.rhs), table),
                    table.num_rows,
                )
                out = m if out is None else pc.or_kleene(out, m)
            return out
        lhs, rhs = _eval(node.lhs, table), _eval(node.rhs, table)
        import ipaddress

        # literal-on-left normalization: the ip special cases below
        # inspect the RHS, and `1.2.3.4 == src_ip` is the same
        # comparison — without the swap it would fall through to
        # pc.equal(IPv4Address, array) and crash inside every worker
        if isinstance(lhs, (ipaddress.IPv4Address, ipaddress.IPv6Address)) \
                and node.op in ("==", "!="):
            lhs, rhs = rhs, lhs
        if isinstance(lhs, (ipaddress.IPv4Network, ipaddress.IPv6Network)):
            raise TypeError(
                "subnet literal must be the RIGHT side of containment: "
                "x in 10.0.0.0/8"
            )

        # ip/subnet domain comparisons (reference type.hpp:703,795):
        # string-carried IP column vs ip/subnet literal
        if isinstance(rhs, (ipaddress.IPv4Network, ipaddress.IPv6Network)):
            from tenzir_ray.iputil import ip_in_subnet

            if node.op not in ("in", "not_in"):
                raise TypeError(
                    "subnet literals support 'in' / 'not in' containment only"
                )
            m = ip_in_subnet(lhs, rhs)
            return m if node.op == "in" else pc.invert(m)
        if isinstance(rhs, (ipaddress.IPv4Address, ipaddress.IPv6Address)):
            from tenzir_ray.iputil import ip_equal

            if node.op not in ("==", "!="):
                raise TypeError("IP literals support == / != comparison only")
            m = ip_equal(lhs, rhs)
            return m if node.op == "==" else pc.invert(m)
        # string literal vs temporal column: cast the literal (ISO format),
        # mirroring the reference's per-schema expression tailoring
        for a, b in ((lhs, "rhs"), (rhs, "lhs")):
            other = rhs if b == "rhs" else lhs
            if (
                isinstance(a, (pa.Array, pa.ChunkedArray))
                and pa.types.is_temporal(a.type)
                and isinstance(other, str)
            ):
                casted = pc.cast(pa.scalar(other), a.type)
                if b == "rhs":
                    rhs = casted
                else:
                    lhs = casted
        if node.op == "matches":
            # regex pattern predicate (reference: `pattern` literals as
            # data, operator.hpp; RE2 via Arrow match_substring_regex)
            return pc.match_substring_regex(lhs, rhs)
        if node.op == "in":
            return pc.is_in(lhs, value_set=pa.array(rhs))
        if node.op == "not_in":
            return pc.invert(pc.is_in(lhs, value_set=pa.array(rhs)))
        if rhs is None:  # `x == null` / `x != null`
            mask = pc.is_null(lhs)
            return mask if node.op == "==" else pc.invert(mask)
        fn = {
            "==": pc.equal,
            "!=": pc.not_equal,
            "<": pc.less,
            "<=": pc.less_equal,
            ">": pc.greater,
            ">=": pc.greater_equal,
        }[node.op]
        return fn(lhs, rhs)
    if isinstance(node, And):
        out = None
        for p in node.parts:
            m = _as_mask(_eval(p, table), table.num_rows)
            out = m if out is None else pc.and_kleene(out, m)
        return out
    if isinstance(node, Or):
        out = None
        for p in node.parts:
            m = _as_mask(_eval(p, table), table.num_rows)
            out = m if out is None else pc.or_kleene(out, m)
        return out
    if isinstance(node, Not):
        return pc.invert(_as_mask(_eval(node.inner, table), table.num_rows))
    raise TypeError(f"cannot evaluate {node!r}")


def _as_mask(value, num_rows: int):
    if isinstance(value, (pa.Array, pa.ChunkedArray)):
        return value
    return pa.array([bool(value)] * num_rows)


# argument positions (0-based) that must be integer LITERALS because
# the kernel closes over int(arg) rather than broadcasting a column
_INT_LITERAL_ARGS = {"substr": (1, 2), "round": (1,)}


def _validate(node: Node) -> None:
    """Driver-side sanity checks so malformed expressions fail at
    compile time, not inside remote workers."""
    if isinstance(node, Cmp):
        if node.op == "matches":
            if not isinstance(node.rhs, Literal) or not isinstance(node.rhs.value, str):
                raise ValueError("matches requires a string literal pattern")
            re.compile(node.rhs.value)  # syntax check (Python re ≈ RE2 for our subset)
        if isinstance(node.lhs, MetaExtractor):
            # closed set (reference meta_extractor, expression.hpp:37):
            # a typo'd #extractor would otherwise resolve to a missing
            # reserved column = all-null mask = silently zero rows
            if node.lhs.name not in _META_COLUMNS:
                raise ValueError(
                    f"unknown meta extractor #{node.lhs.name}; one of "
                    f"{sorted('#' + n for n in _META_COLUMNS)}"
                )
        elif isinstance(node.lhs, TypeExtractor):
            if node.lhs.name != "ip" and node.lhs.name not in _TYPE_PREDICATES:
                raise ValueError(
                    f"unknown type extractor :{node.lhs.name}; one of "
                    f"{sorted(':' + n for n in list(_TYPE_PREDICATES) + ['ip'])}"
                )
        else:
            _validate(node.lhs)
        if isinstance(node.rhs, (TypeExtractor, MetaExtractor)):
            raise ValueError("type/meta extractors belong on the comparison's left side")
        _validate(node.rhs)
    elif isinstance(node, (And, Or)):
        for p in node.parts:
            _validate(p)
    elif isinstance(node, Not):
        _validate(node.inner)
    elif isinstance(node, Arith):
        _validate(node.lhs)
        _validate(node.rhs)
    elif isinstance(node, Call):
        if node.name not in _FUNCTIONS:
            raise ValueError(
                f"unknown function {node.name!r}; available: "
                f"{sorted(_FUNCTIONS)}"
            )
        lo, hi, _ = _FUNCTIONS[node.name]
        if not lo <= len(node.args) <= hi:
            raise ValueError(
                f"{node.name} takes {lo}"
                + (f"..{hi}" if hi != lo else "")
                + f" args, got {len(node.args)}"
            )
        # substr's start/length and round's ndigits kernels call int()
        # on the evaluated value — a column there would raise an opaque
        # TypeError per batch at run time; demand integer literals here
        for pos in _INT_LITERAL_ARGS.get(node.name, ()):
            if pos < len(node.args):
                a = node.args[pos]
                if not (isinstance(a, Literal) and isinstance(a.value, int)
                        and not isinstance(a.value, bool)):
                    raise ValueError(
                        f"{node.name}: argument {pos + 1} must be an integer "
                        f"literal (column-valued arguments are not supported)"
                    )
        for a in node.args:
            _validate(a)
    elif isinstance(node, (TypeExtractor, MetaExtractor)):
        raise ValueError(
            f"{node!r} is only valid as the left side of a comparison"
        )


def resolve_concepts(node: Node, concepts: dict) -> Node:
    """Taxonomy/concept resolution (reference:
    ``include/tenzir/taxonomies.hpp:25-68``, applied by `where` before
    tailoring, ``builtins/operators/where.cpp:68-89``): a concept name
    maps to several concrete fields; a predicate over the concept
    becomes the DISJUNCTION of the predicate over each field present in
    the batch (missing fields contribute null → excluded)."""
    if isinstance(node, Cmp):
        lhs = node.lhs
        if isinstance(lhs, Field) and ".".join(lhs.path) in concepts:
            fields = concepts[".".join(lhs.path)]
            parts = tuple(Cmp(node.op, Field(tuple(f.split("."))), node.rhs) for f in fields)
            return parts[0] if len(parts) == 1 else Or(parts)
        return node
    if isinstance(node, And):
        return And(tuple(resolve_concepts(p, concepts) for p in node.parts))
    if isinstance(node, Or):
        return Or(tuple(resolve_concepts(p, concepts) for p in node.parts))
    if isinstance(node, Not):
        return Not(resolve_concepts(node.inner, concepts))
    return node


def compile_predicate(
    expr: Union[str, Node], concepts: Optional[dict] = None
) -> Callable[[pa.Table], pa.ChunkedArray]:
    """Compile a predicate to ``table -> boolean mask`` (nulls → excluded
    downstream, matching the reference's bitmap-filter semantics).
    ``concepts`` optionally maps vocabulary names to concrete field
    lists (taxonomy resolution)."""
    node = parse(expr) if isinstance(expr, str) else expr
    if concepts:
        node = resolve_concepts(node, concepts)
    _validate(node)

    def mask(table: pa.Table):
        return _as_mask(_eval(node, table), table.num_rows)

    return mask


def compile_scalar(expr: Union[str, Node]) -> Callable[[pa.Table], pa.Array]:
    """Compile a scalar expression to ``table -> array`` (for put/extend/
    replace right-hand sides)."""
    node = parse(expr) if isinstance(expr, str) else expr
    _validate(node)

    def evaluate(table: pa.Table):
        out = _eval(node, table)
        if not isinstance(out, (pa.Array, pa.ChunkedArray)):
            out = pa.array([out] * table.num_rows)
        return out

    return evaluate


# ---------------------------------------------------------------------------
# Predicate pushdown: AST -> pyarrow.dataset expression (for read_parquet)
# ---------------------------------------------------------------------------


def to_dataset_filter(
    expr: Union[str, Node], schema: Optional[pa.Schema] = None
) -> Optional[pads.Expression]:
    """Convert a predicate AST to a ``pyarrow.dataset`` expression usable as
    ``ray.data.read_parquet(filter=...)`` for row-group pruning — the Ray
    analog of the reference's ``optimize()`` filter pushdown
    (``builtins/operators/where.cpp:109-117``). Returns None for
    constructs the dataset expression language cannot express
    (struct paths, arithmetic on both sides, etc.).

    ``schema`` (e.g. from a parquet footer) enables literal coercion:
    a string literal compared against a temporal column becomes a
    typed scalar, so date predicates like ``ts <= "1998-09-02"`` still
    prune row groups instead of falling back to a post-read filter."""
    node = parse(expr) if isinstance(expr, str) else expr
    try:
        return _to_ds(node, schema)
    except (ValueError, TypeError, KeyError, pa.ArrowInvalid):
        return None


def _coerce_ds_literal(field_name: str, value, schema: Optional[pa.Schema]):
    """Type a bare literal against the schema (mirrors the temporal
    string-literal cast the post-read evaluator applies)."""
    if schema is None or not isinstance(value, str):
        return value
    idx = schema.get_field_index(field_name)
    if idx < 0:
        return value
    t = schema.field(idx).type
    if pa.types.is_temporal(t):
        return pc.cast(pa.scalar(value), t)
    return value


def _to_ds(node: Node, schema: Optional[pa.Schema] = None) -> pads.Expression:
    if isinstance(node, Cmp):
        lhs = node.lhs
        if isinstance(lhs, MetaExtractor):
            # meta extractors ride reserved columns, so they push down
            lhs = Field((_META_COLUMNS.get(lhs.name, f"_{lhs.name}"),))
        if not isinstance(lhs, Field) or len(lhs.path) != 1:
            raise ValueError("pushdown requires simple field on lhs")
        if not isinstance(node.rhs, Literal):
            raise ValueError("pushdown requires literal rhs")
        if type(node.rhs.value).__module__ == "ipaddress":
            raise ValueError("no row-group pushdown for ip/subnet predicates")
        f = pc.field(lhs.path[0])
        v = _coerce_ds_literal(lhs.path[0], node.rhs.value, schema)
        if node.op == "in":
            return f.isin(v)
        if node.op == "not_in":
            return ~f.isin(v)
        if v is None:
            return f.is_null() if node.op == "==" else ~f.is_null()
        return {
            "==": f == v,
            "!=": f != v,
            "<": f < v,
            "<=": f <= v,
            ">": f > v,
            ">=": f >= v,
        }[node.op]
    if isinstance(node, And):
        out = _to_ds(node.parts[0], schema)
        for p in node.parts[1:]:
            out = out & _to_ds(p, schema)
        return out
    if isinstance(node, Or):
        out = _to_ds(node.parts[0], schema)
        for p in node.parts[1:]:
            out = out | _to_ds(p, schema)
        return out
    if isinstance(node, Not):
        return ~_to_ds(node.inner, schema)
    raise ValueError(f"not pushdown-expressible: {node!r}")
