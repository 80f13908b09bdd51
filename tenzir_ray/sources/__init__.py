"""Sources & sinks — connector/format analogs.

The reference splits byte-level connectors (file/s3/kafka/...,
``builtins/connectors/*``) from formats (json/csv/lines/parquet/...,
``builtins/formats/*``); `from X read Y` desugars to loader+parser
(``builtins/operators/from_load_read.cpp:19-230``). Ray Data fuses the
two: ``read_parquet``/``read_csv``/``read_json``/``read_text`` already
pair a filesystem loader with a vectorized Arrow parser, including
s3:///gcs:// URIs via Arrow filesystems — the same Arrow FS heritage as
the reference's s3 connector (``builtins/connectors/s3.cpp:54-234``).

The binlog *tail* source (the `file --follow` / kafka-offset analog,
``builtins/connectors/file.cpp:168-177``,
``plugins/kafka/src/configuration.cpp:73-110``) lives in
:mod:`tenzir_ray.cdc.binlog` because it is offset/checkpoint aware.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import ray.data
from ray.data import Dataset

from tenzir_ray.expr import Node, to_dataset_filter


def _strip_schema_metadata(t):
    """Drop schema-level metadata (e.g. the ``pandas`` blob parquet files
    written by pandas carry). pyarrow's ``Schema.__hash__`` raises
    ``unhashable type: 'dict'`` on any schema WITH metadata, which defeats
    Ray Data's schema deduplication (``unify_schemas`` logs "Failed to
    hash the schemas" on every concat). Zero-copy — metadata only."""
    return t.replace_schema_metadata(None)


def read_parquet(
    paths: Union[str, Sequence[str]],
    columns: Optional[Sequence[str]] = None,
    predicate: Union[str, Node, None] = None,
    **kwargs,
) -> Dataset:
    """Parquet source with projection + predicate pushdown.

    ``predicate`` (our expression language) converts to a pyarrow
    dataset expression so row groups are pruned AT THE READ — the Ray
    analog of the reference's `where.optimize()` pushdown
    (``builtins/operators/where.cpp:109-117``) and catalog pruning.
    Predicates the dataset expression language can't express (regex,
    struct paths, arithmetic) fall back to a post-read vectorized
    filter — the predicate is ALWAYS applied, never silently dropped.
    Reference store: ``plugins/parquet/parquet.cpp:379-478``.
    """
    # normalize to a concrete list BEFORE any peeking: if `paths` were a
    # generator, peeking its first element below would consume it and the
    # subsequent read_parquet would silently drop the first file
    if not isinstance(paths, str):
        paths = list(paths)
    flt = None
    if predicate is not None:
        # footer-only schema peek so temporal literals coerce and the
        # predicate can prune row groups (no data read happens here)
        schema = None
        try:
            import pyarrow.parquet as _pq

            first = paths if isinstance(paths, str) else paths[0]
            import os as _os

            if _os.path.isdir(first):
                cand = sorted(
                    f for f in _os.listdir(first) if f.endswith(".parquet")
                )
                first = _os.path.join(first, cand[0]) if cand else first
            schema = _pq.read_schema(first)
        except Exception:
            schema = None
        flt = to_dataset_filter(predicate, schema)
    ds = ray.data.read_parquet(
        paths, columns=list(columns) if columns else None, filter=flt, **kwargs
    )
    # fused into the read op by Ray's operator fusion; keeps every
    # downstream block's schema hashable so schema dedup works
    ds = ds.map_batches(
        _strip_schema_metadata, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    if predicate is not None and flt is None:
        from tenzir_ray.ops import where as _where

        ds = _where(ds, predicate)
    return ds


def read_csv(paths, **kwargs) -> Dataset:
    """CSV/TSV source (reference `xsv` parser, ``builtins/formats/xsv.cpp``)."""
    return ray.data.read_csv(paths, **kwargs)


def read_json(paths, **kwargs) -> Dataset:
    """NDJSON source (reference `json` parser, ``builtins/formats/json.cpp``)."""
    return ray.data.read_json(paths, **kwargs)


def read_lines(paths, **kwargs) -> Dataset:
    """Plain-text lines source (reference `lines` parser,
    ``builtins/formats/lines.cpp:41-105``)."""
    return ray.data.read_text(paths, **kwargs)


def read_binary(paths, include_paths: bool = True, **kwargs) -> Dataset:
    """Opaque byte blobs (reference byte-stream edges carry ``chunk_ptr``,
    ``include/tenzir/chunk.hpp``); for multimodal payload columns."""
    return ray.data.read_binary_files(paths, include_paths=include_paths, **kwargs)


def read_feather(paths: Union[str, Sequence[str]]) -> Dataset:
    """Arrow IPC / feather source (reference store:
    ``builtins/stores/feather.cpp:139-281``). Ray has no native feather
    reader; files load via pyarrow inside read tasks and stream as
    regular blocks."""
    import glob as _glob
    import os as _os

    import pyarrow.feather  # noqa: F401

    if isinstance(paths, str):
        if _os.path.isdir(paths):
            files = sorted(_glob.glob(_os.path.join(paths, "*")))
        else:
            files = [paths]
    else:
        files = list(paths)

    import ray as _ray

    @_ray.remote
    def _load(path: str):
        import pyarrow.feather as pf

        return pf.read_table(path)

    return ray.data.from_arrow_refs([_load.remote(f) for f in files])


def write_feather(ds: Dataset, path: str) -> None:
    """Arrow IPC / feather sink: one file per block, written inside the
    tasks (streaming; nothing gathers on the driver)."""
    import os as _os

    _os.makedirs(path, exist_ok=True)

    def write_block(t, ctx=None):
        import uuid

        import pyarrow.feather as pf

        fname = _os.path.join(path, f"part-{uuid.uuid4().hex}.feather")
        pf.write_feather(t, fname)
        import pyarrow as _pa

        return _pa.table({"path": _pa.array([fname])})

    ds.map_batches(write_block, batch_format="pyarrow", batch_size=None).materialize()


def write_parquet(ds: Dataset, path: str, **kwargs) -> None:
    """Parquet sink, zstd like the reference store
    (``plugins/parquet/parquet.cpp:318-378``: ZSTD, 64Ki row groups)."""
    kwargs.setdefault("compression", "zstd")
    ds.write_parquet(path, **kwargs)


def write_csv(ds: Dataset, path: str, **kwargs) -> None:
    ds.write_csv(path, **kwargs)


def write_json(ds: Dataset, path: str, **kwargs) -> None:
    ds.write_json(path, **kwargs)
