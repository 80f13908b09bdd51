"""tenzir_ray — a Ray-Data-native data-processing / CDC-ingest engine.

A from-scratch engine with the query and data-processing capabilities of
the reference security-pipeline engine (Tenzir v4.3.0), re-expressed
idiomatically on Ray Data:

- Pipelines are ``ray.data.Dataset`` transforms (``map_batches`` over
  zero-copy Arrow), not actor-per-operator chains (reference:
  ``libtenzir/src/pipeline_executor.cpp:35-66`` spawns one CAF actor per
  operator; Ray Data's streaming executor is data-parallel per stage).
- The unit of data is an Arrow record batch, mirroring the reference's
  ``table_slice`` (``libtenzir/include/tenzir/table_slice.hpp:26-28``,
  which is physically an Arrow RecordBatch).
- Stateful stages (rule engines, enrichers) are actor pools via
  ``map_batches(Cls, concurrency=N)``.
- The CDC north star lives in :mod:`tenzir_ray.cdc`: binlog tail →
  typed parse/filter/enrich → salted hash-partitioned last-writer-wins
  merge → exactly-once two-phase-commit Parquet lake with per-partition
  high-water marks.

No module in this package calls ``ray.init()``/``ray.shutdown()`` —
sessions are owned by the CLI entry points, ``bench.py`` and the test
fixture.
"""

__version__ = "0.1.0"

from tenzir_ray import ops  # noqa: F401
from tenzir_ray.expr import compile_predicate, compile_scalar, parse  # noqa: F401

# heavier subsystems import lazily on attribute access so `import
# tenzir_ray` stays cheap for workers
_LAZY = ("ann", "cdc", "dedup", "formats", "multimodal", "registry",
         "serve", "sigma", "sources", "text", "tql")


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return importlib.import_module(f"tenzir_ray.{name}")
    raise AttributeError(f"module 'tenzir_ray' has no attribute {name!r}")
