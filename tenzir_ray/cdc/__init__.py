"""CDC / incremental-ingest engine (the north star).

Tail a simulated binlog/WAL of change events (insert/update/delete
keyed on ``repo+path``, ordered by ``commit_seq``) over the source-code
repo table, run typed parse/filter/enrich stages as ``map_batches``
over zero-copy Arrow, apply a hash-partitioned last-writer-wins merge
with tombstones into a Parquet lake with additive schema evolution and
an idempotent two-phase-commit manifest sink, checkpoint per-partition
high-water marks for resume, and salt hot keys.

Reference lineage (what each piece re-expresses):

- binlog tail ............ `file --follow` / kafka `--offset` resume
  (``builtins/connectors/file.cpp:168-177``,
  ``plugins/kafka/src/configuration.cpp:73-110``)
- typed parse/enrich ..... parser + transform operators (§2.1/2.3 of
  SURVEY.md); the stateful enricher mirrors the `sigma` actor model
  (``plugins/sigma/src/plugin.cpp:36-195``)
- lake + manifest ........ active-partition write-then-publish with
  atomic rename + catalog registration
  (``libtenzir/src/active_partition.cpp:68-175``,
  ``src/posix_filesystem.cpp:29-40``, catalog ``src/catalog.cpp``)
- compaction ............. `tenzir rebuild`
  (``builtins/commands/rebuild.cpp``)
"""

from tenzir_ray.cdc.binlog import generate_binlog, read_binlog_meta  # noqa: F401
from tenzir_ray.cdc.lake import Lake  # noqa: F401
from tenzir_ray.cdc.engine import replay  # noqa: F401
