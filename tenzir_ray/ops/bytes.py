"""Byte-stream operators: compress / decompress over binary columns.

Reference: `compress <codec>` / `decompress <codec>` stream chunks
through ``arrow::util::Codec``
(``builtins/operators/compress_decompress.cpp:145-350``). Ray Data has
no bytes-typed pipeline edge; the equivalent carrier is a ``binary``
column, and the same Arrow codecs do the work per batch. File-level
compression is better handled by the read/write codec args
(``write_parquet(compression=...)``) — these ops are for payload
columns (multimodal blobs, raw logs)."""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
from ray.data import Dataset

_CODECS = ("zstd", "gzip", "brotli", "lz4", "snappy", "bz2")


def _codec(name: str):
    import pyarrow as _pa

    if name not in _CODECS:
        raise ValueError(f"unknown codec {name!r}; choose from {_CODECS}")
    return _pa.Codec(name)


def compress_op(ds: Dataset, column: str, codec: str = "zstd", out_col: Optional[str] = None) -> Dataset:
    """Compress a binary/string column with an Arrow codec. The
    decompressed length is stored alongside (``{col}_raw_len``) because
    raw-codec frames don't always self-describe their size."""
    out_col = out_col or column

    def apply(t: pa.Table) -> pa.Table:
        c = _codec(codec)
        vals = t[column].to_pylist()
        lens, comp = [], []
        for v in vals:
            if v is None:
                lens.append(None)
                comp.append(None)
                continue
            raw = v.encode() if isinstance(v, str) else v
            lens.append(len(raw))
            comp.append(c.compress(raw, asbytes=True))
        t = t.append_column(f"{out_col}_raw_len", pa.array(lens, type=pa.int64()))
        arr = pa.array(comp, type=pa.binary())
        if out_col == column:
            return t.set_column(t.column_names.index(column), column, arr)
        # distinct output column: keep the source column intact
        return t.append_column(out_col, arr)

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


def decompress_op(ds: Dataset, column: str, codec: str = "zstd", out_col: Optional[str] = None) -> Dataset:
    """Inverse of :func:`compress_op` (uses ``{col}_raw_len``)."""
    out_col = out_col or column

    def apply(t: pa.Table) -> pa.Table:
        c = _codec(codec)
        vals = t[column].to_pylist()
        lens = t[f"{column}_raw_len"].to_pylist()
        out = [
            None if v is None else c.decompress(v, decompressed_size=n, asbytes=True)
            for v, n in zip(vals, lens)
        ]
        arr = pa.array(out, type=pa.binary())
        if out_col == column:
            t = t.set_column(t.column_names.index(column), column, arr)
        else:
            t = t.append_column(out_col, arr)
        return t.drop_columns([f"{column}_raw_len"])

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)
