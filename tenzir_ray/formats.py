"""Format parsers (bytes/lines ⇄ events) beyond the Ray-native ones.

Ray Data covers json/csv/parquet/text natively (see
:mod:`tenzir_ray.sources`); these are the security-log formats the
reference ships as parser plugins, re-expressed as vectorized-ish
``map_batches`` kernels over a ``text`` line column:

- CEF (Common Event Format): header + ``k=v`` extension bag
  (reference ``builtins/formats/cef.cpp:382-430``);
- zeek-tsv: ``#fields``/``#types`` headered TSV with per-log schemas
  (reference ``builtins/formats/zeek_tsv.cpp:202-``);
- yaml: documents → records (reference
  ``builtins/formats/yaml.cpp:144-270``);
- kv: generic ``k=v`` splitter (building block of several reference
  parsers).

All parsers are line-oriented: feed them ``read_lines(...)`` output
(column ``text``) and get typed event tables back. Per-line parsing is
inherently row-wise; the loops call C-backed ``str.split``/regex and
emit Arrow columns once per batch.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

import pyarrow as pa
from ray.data import Dataset

# batch_size=None = one whole block per batch: every kernel here is
# vectorized, so Ray's 1024-row default would only add per-batch overhead
_PYARROW = dict(batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

# ---------------------------------------------------------------------------
# CEF
# ---------------------------------------------------------------------------

_CEF_HEADER_FIELDS = [
    "cef_version",
    "device_vendor",
    "device_product",
    "device_version",
    "signature_id",
    "name",
    "severity",
]
_CEF_EXT_RE = re.compile(r"(\w+)=((?:[^=\\]|\\.)*?)(?=\s+\w+=|$)")


def parse_cef_line(line: str) -> Optional[dict]:
    """One CEF line -> header fields + extension dict."""
    if not line or not line.startswith("CEF:"):
        return None
    parts = []
    buf, i = [], 4
    # split on unescaped '|' (7 header fields, rest is extension)
    while i < len(line) and len(parts) < 7:
        c = line[i]
        if c == "\\" and i + 1 < len(line):
            buf.append(line[i + 1])
            i += 2
            continue
        if c == "|":
            parts.append("".join(buf))
            buf = []
            i += 1
            continue
        buf.append(c)
        i += 1
    if len(parts) < 7:
        return None
    ext_str = line[i:]
    ext = {m.group(1): m.group(2).replace("\\=", "=").replace("\\\\", "\\")
           for m in _CEF_EXT_RE.finditer(ext_str)}
    rec = dict(zip(_CEF_HEADER_FIELDS, parts))
    rec["extension"] = ext
    return rec


def parse_cef(ds: Dataset, text_col: str = "text") -> Dataset:
    """CEF lines -> events (header columns + ``extension`` map)."""

    def apply(t: pa.Table) -> pa.Table:
        recs = [parse_cef_line(x) for x in t[text_col].to_pylist()]
        cols: Dict[str, list] = {f: [] for f in _CEF_HEADER_FIELDS}
        exts: List[Optional[list]] = []
        for r in recs:
            for f in _CEF_HEADER_FIELDS:
                cols[f].append(None if r is None else r[f])
            exts.append(None if r is None else list(r["extension"].items()))
        arrays = {f: pa.array(v, type=pa.string()) for f, v in cols.items()}
        arrays["extension"] = pa.array(exts, type=pa.map_(pa.string(), pa.string()))
        return pa.table(arrays)

    return ds.map_batches(apply, **_PYARROW)


# ---------------------------------------------------------------------------
# zeek-tsv
# ---------------------------------------------------------------------------

_ZEEK_TYPES = {
    "count": pa.int64(),
    "int": pa.int64(),
    "double": pa.float64(),
    "bool": pa.bool_(),
    "string": pa.string(),
    "addr": pa.string(),
    "port": pa.int64(),
    "time": pa.float64(),
    "interval": pa.float64(),
}


def parse_zeek_tsv_text(lines: List[str]) -> pa.Table:
    """Parse a whole zeek-tsv log (with #-metadata headers) into one
    typed table. Stateful across lines (the header defines the schema),
    so the caller must hand in a complete document."""
    sep = "\t"
    unset, empty = "-", "(empty)"
    fields: List[str] = []
    types: List[str] = []
    rows: List[List[str]] = []
    for line in lines:
        if line.startswith("#separator"):
            val = line.split(" ", 1)[1].strip()
            sep = bytes(val, "utf-8").decode("unicode_escape") if val.startswith("\\x") else val
        elif line.startswith("#unset_field"):
            unset = line.split(sep, 1)[1].strip()
        elif line.startswith("#empty_field"):
            empty = line.split(sep, 1)[1].strip()
        elif line.startswith("#fields"):
            fields = line.rstrip("\n").split(sep)[1:]
        elif line.startswith("#types"):
            types = line.rstrip("\n").split(sep)[1:]
        elif line.startswith("#"):
            continue
        elif line.strip():
            rows.append(line.rstrip("\n").split(sep))
    if not fields:
        return pa.table({})
    cols = {}
    for j, name in enumerate(fields):
        ztype = types[j] if j < len(types) else "string"
        raw = [r[j] if j < len(r) else None for r in rows]
        vals = [None if v in (None, unset) else ("" if v == empty else v) for v in raw]
        target = _ZEEK_TYPES.get(ztype, pa.string())
        if target == pa.int64():
            vals = [None if v in (None, "") else int(v) for v in vals]
        elif target == pa.float64():
            vals = [None if v in (None, "") else float(v) for v in vals]
        elif target == pa.bool_():
            vals = [None if v in (None, "") else v == "T" for v in vals]
        cols[name] = pa.array(vals, type=target)
    return pa.table(cols)


def parse_zeek_tsv(ds: Dataset, text_col: str = "text") -> Dataset:
    """zeek-tsv over a Dataset of lines. The #fields header must be in
    the FIRST block (repartition(1) for multi-block logs — header-aware
    parsing is stateful, like the reference's)."""

    def apply(t: pa.Table) -> pa.Table:
        return parse_zeek_tsv_text(t[text_col].to_pylist())

    return ds.repartition(1).map_batches(apply, **_PYARROW)


# ---------------------------------------------------------------------------
# yaml / kv
# ---------------------------------------------------------------------------


def parse_yaml(ds: Dataset, text_col: str = "text") -> Dataset:
    """YAML documents (one per row) -> records. Guarded import: raises
    a clear error when pyyaml is absent."""
    try:
        import yaml  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError("parse_yaml requires pyyaml") from e

    def apply(t: pa.Table) -> pa.Table:
        import yaml

        recs = [yaml.safe_load(x) if x else None for x in t[text_col].to_pylist()]
        recs = [r if isinstance(r, dict) else {"value": r} for r in recs]
        return pa.Table.from_pylist(recs)

    return ds.map_batches(apply, **_PYARROW)


def parse_ndjson(
    ds: Dataset,
    text_col: str = "text",
    selector: Optional[str] = None,
    selector_prefix: Optional[str] = None,
) -> Dataset:
    """NDJSON parser with the reference's ``--selector field[:prefix]``
    routing (``builtins/formats/json.cpp:96-110``): the selector
    field's value names the event's schema — emitted here as a
    ``_schema`` column (``prefix.value``), the single-Dataset analog of
    the reference's multi-schema stream. The `suricata` and
    `zeek-json` formats are exactly this parser configured with
    ``selector="event_type"`` / ``selector="_path:zeek"``
    (``json.cpp:1119-1120``)."""
    import json as _json

    def apply(t: pa.Table) -> pa.Table:
        recs = []
        for line in t[text_col].to_pylist():
            if not line:
                continue
            try:
                r = _json.loads(line)
            except ValueError:
                continue
            if isinstance(r, dict):
                recs.append(r)
        if selector:
            for r in recs:
                val = r.get(selector)
                r["_schema"] = f"{selector_prefix}.{val}" if selector_prefix else str(val)
        if not recs:
            return pa.table({})
        return pa.Table.from_pylist(recs)

    return ds.map_batches(apply, **_PYARROW)


def route_schemas(ds: Dataset, schema_col: str = "_schema") -> Dict[str, Dataset]:
    """Split a multi-schema stream into one Dataset per schema — the
    Ray-native stand-in for the reference's heterogeneous pipelines
    (every reference operator keeps per-schema state via
    ``schematic_operator``, ``pipeline.hpp:685-730``; here each schema
    gets its own homogeneous Dataset and the operator library applies
    per branch). The input is materialized once; each branch filters
    the shared blocks (no duplicate upstream execution)."""
    mat = ds.materialize()
    names = mat.unique(schema_col)
    out: Dict[str, Dataset] = {}
    for name in sorted(n for n in names if n is not None):

        def keep(t: pa.Table, name=name) -> pa.Table:
            import pyarrow.compute as pc

            kept = t.filter(pc.equal(t[schema_col], name))
            # drop all-null columns so each branch carries only its
            # schema's fields (union-parse fills the others with null)
            drop = [c for c in kept.column_names
                    if c != schema_col and kept[c].null_count == kept.num_rows]
            return kept.drop_columns(drop)

        out[name] = mat.map_batches(keep, **_PYARROW)
    return out


def parse_suricata(ds: Dataset, text_col: str = "text") -> Dataset:
    """Suricata EVE JSON (configured variant of the json parser,
    ``builtins/formats/json.cpp:1119``)."""
    return parse_ndjson(ds, text_col, selector="event_type", selector_prefix="suricata")


def parse_zeek_json(ds: Dataset, text_col: str = "text") -> Dataset:
    """Zeek streaming JSON (configured variant,
    ``builtins/formats/json.cpp:1120``)."""
    return parse_ndjson(ds, text_col, selector="_path", selector_prefix="zeek")


def decapsulate(ds: Dataset, data_col: str = "data") -> Dataset:
    """PCAP packet decapsulation (reference:
    ``builtins/operators/decapsulate.cpp:303-440``). Implemented in
    pure ``struct`` offset arithmetic — no packet library needed; see
    :mod:`tenzir_ray.pcap` for the parser and Community ID."""
    from tenzir_ray.pcap import decapsulate as _decap

    return _decap(ds)


_KV_RE = re.compile(r'(\w+)=(?:"([^"]*)"|(\S+))')


def parse_kv(ds: Dataset, text_col: str = "text") -> Dataset:
    """Generic ``k=v`` bag parser -> map column."""

    def apply(t: pa.Table) -> pa.Table:
        out = []
        for line in t[text_col].to_pylist():
            if line is None:
                out.append(None)
                continue
            out.append([(m.group(1), m.group(2) or m.group(3)) for m in _KV_RE.finditer(line)])
        return pa.table({"kv": pa.array(out, type=pa.map_(pa.string(), pa.string()))})

    return ds.map_batches(apply, **_PYARROW)
