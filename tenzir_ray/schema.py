"""Canonical Arrow schemas + additive schema evolution.

The reference's schema-evolution mechanism is its cast matrix
(``libtenzir/include/tenzir/cast.hpp:26-60``): records cast
field-by-field, missing fields become nulls. We confine evolution to
*additive* changes over a single unified superset schema (new columns
appended, pre-evolution rows read back as null) — the design the CDC
lake needs (FIXTURES.md F4) and the one that stays Dataset-native.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

# F1 — source-code repo table (BASELINE.json input_hint)
REPO_TABLE_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

# F2 — binlog / change-event stream (the CDC input)
CHANGE_EVENT_SCHEMA = pa.schema(
    [
        ("offset", pa.int64()),       # global monotone position, dense+unique
        ("commit_seq", pa.int64()),   # logical commit order (LWW tie-break)
        ("commit", pa.string()),
        ("op", pa.string()),          # insert | update | delete (tombstone)
        ("repo", pa.string()),
        ("path", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

# F3 — lake table (expected output): F1 + bookkeeping
LAKE_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
        ("commit_seq", pa.int64()),
        ("content_sha256", pa.string()),
    ]
)


def unify_schemas(schemas: List[pa.Schema]) -> pa.Schema:
    """Additive union: fields in first-seen order; a later schema may
    append new columns but an existing column's type must be identical
    (additive-only rule). Mirrors the record-cast semantics of
    ``cast.hpp`` restricted to the additive case."""
    fields: List[pa.Field] = []
    index = {}
    for schema in schemas:
        for f in schema:
            if f.name in index:
                existing = fields[index[f.name]]
                if existing.type != f.type:
                    raise TypeError(
                        f"non-additive evolution on {f.name!r}: "
                        f"{existing.type} vs {f.type}"
                    )
            else:
                index[f.name] = len(fields)
                fields.append(pa.field(f.name, f.type))
    return pa.schema(fields)


def conform(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast a table to the superset schema: missing columns become
    all-null (the reference's missing-field rule, ``cast.hpp``);
    column order follows the schema."""
    arrays = []
    for f in schema:
        if f.name in table.column_names:
            col = table[f.name]
            if col.type != f.type:
                col = col.cast(f.type)
            arrays.append(col)
        else:
            arrays.append(pa.nulls(table.num_rows, type=f.type))
    return pa.table(dict(zip([f.name for f in schema], arrays)))


def schema_to_json(schema: pa.Schema) -> list:
    """Serialize for the lake manifest (human-auditable)."""
    return [{"name": f.name, "type": str(f.type)} for f in schema]


def schema_from_json(spec: list) -> pa.Schema:
    _PARSE = {
        "string": pa.string(), "large_string": pa.large_string(),
        "int64": pa.int64(), "int32": pa.int32(), "uint64": pa.uint64(),
        "double": pa.float64(), "float": pa.float32(), "bool": pa.bool_(),
        "timestamp[us]": pa.timestamp("us"), "timestamp[ns]": pa.timestamp("ns"),
        "binary": pa.binary(),
    }
    return pa.schema([(f["name"], _PARSE[f["type"]]) for f in spec])
