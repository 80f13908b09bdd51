"""Pluggable streaming-source protocol — the Kafka consumer seam.

Reference: the kafka connector (``plugins/kafka/src/plugin.cpp:86-239``)
wraps librdkafka behind a loader with offset seek/resume
(``plugins/kafka/src/configuration.cpp:73-110``: stored offsets,
beginning/end/timestamp seeks) and at-least-once redelivery semantics.

:class:`StreamSource` is that seam for the CDC engine: anything that
can enumerate offset-ordered record ranges ("shards") past a consumer
high-water mark and expose them as Ray Datasets can drive
``cdc.engine.replay`` — the exactly-once machinery (per-key HWM filter,
``applied_through`` duplicate drop, 2PC manifest) sits ABOVE this
interface, so at-least-once sources are handled by construction.

Implementations here:

- :class:`BinlogSource` — the parquet binlog (the file/`--follow`
  analog; shards are row-group files, offsets come from shard
  metadata, datasets are lazy ``read_parquet``).
- :class:`MemoryBrokerSource` — an in-process broker with the consumer
  API a real client would have (``poll`` / ``seek`` / ``commit`` /
  ``end_offsets``, per-partition orderings, optional duplicate
  redelivery) buffering records into Arrow. A librdkafka-backed
  implementation would subclass this shape with network polls; no
  broker exists in this sandbox.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict, List, Optional

import pyarrow as pa
from ray.data import Dataset


class StreamSource(ABC):
    """Offset-ordered, resumable record source."""

    @abstractmethod
    def pending(self, after_offset: int) -> List[Dict]:
        """Shard descriptors (dicts with at least ``min_offset`` /
        ``max_offset``) that may contain records past ``after_offset``,
        in offset order."""

    @abstractmethod
    def dataset(self, shards: List[Dict]) -> Dataset:
        """Lazy Dataset of the raw records in ``shards``."""

    @abstractmethod
    def schema(self, shards: List[Dict]) -> pa.Schema:
        """Record schema WITHOUT executing the dataset (footers /
        broker schema registry)."""


class BinlogSource(StreamSource):
    """The parquet binlog as a StreamSource (offset-ordered shard
    files + sidecar metadata)."""

    def __init__(self, binlog_dir: str):
        self.binlog_dir = binlog_dir

    def pending(self, after_offset: int) -> List[Dict]:
        from tenzir_ray.cdc import binlog as bl

        return bl.pending_shards(self.binlog_dir, after_offset)

    def dataset(self, shards: List[Dict]) -> Dataset:
        import ray.data

        return ray.data.read_parquet([f"{self.binlog_dir}/{s['file']}" for s in shards])

    def schema(self, shards: List[Dict]) -> pa.Schema:
        import pyarrow.parquet as pq

        from tenzir_ray.schema import unify_schemas

        return unify_schemas(
            [pq.read_schema(f"{self.binlog_dir}/{s['file']}") for s in shards]
        )

    def map_units(self, shards: List[Dict], target_units: int) -> List:
        """Row-group-ranged read units for the direct exchange
        (:mod:`tenzir_ray.cdc.exchange`). Sources that can enumerate
        splittable storage units expose this; others fall back to the
        Dataset merge path."""
        from tenzir_ray.cdc.exchange import plan_map_units

        return plan_map_units(
            [f"{self.binlog_dir}/{s['file']}" for s in shards], target_units
        )


class MemoryBrokerSource(StreamSource):
    """In-process broker with a Kafka-consumer-shaped API.

    Records append per partition with monotonically increasing GLOBAL
    offsets (an ``offset`` int64 column is stamped on, as the kafka
    loader surfaces librdkafka message offsets). ``redeliver_every``
    re-emits every Nth record to exercise at-least-once semantics —
    the engine's ``applied_through`` filter must drop the repeats.
    """

    def __init__(self, schema: pa.Schema, num_partitions: int = 1,
                 shard_records: int = 1024, redeliver_every: int = 0):
        if "offset" in schema.names:
            raise ValueError("the 'offset' column is stamped by the broker")
        self._schema = schema.append(pa.field("offset", pa.int64()))
        self._partitions: List[List[pa.Table]] = [[] for _ in range(num_partitions)]
        self._next_offset = 0
        self._positions: Dict[int, int] = dict.fromkeys(range(num_partitions), 0)
        self._committed: Dict[int, int] = {}
        self.shard_records = shard_records
        self.redeliver_every = redeliver_every

    # -- producer side -----------------------------------------------------

    def produce(self, records: pa.Table, partition: int = 0) -> None:
        """Append records to a partition, stamping global offsets (and
        duplicate redeliveries when configured)."""
        n = records.num_rows
        offsets = list(range(self._next_offset, self._next_offset + n))
        self._next_offset += n
        t = records.append_column("offset", pa.array(offsets, type=pa.int64()))
        if self.redeliver_every:
            dup_idx = list(range(0, n, self.redeliver_every))
            t = pa.concat_tables([t, t.take(dup_idx)])
        self._partitions[partition].append(t)

    # -- consumer API (the librdkafka-shaped surface) ----------------------

    def assignment(self) -> List[int]:
        return list(range(len(self._partitions)))

    def end_offsets(self) -> int:
        return self._next_offset

    def seek(self, partition: int, position: int) -> None:
        """Seek the consumer position (buffer index) of a partition."""
        self._positions[partition] = position

    def poll(self, partition: int, max_batches: int = 1) -> List[pa.Table]:
        pos = self._positions[partition]
        out = self._partitions[partition][pos : pos + max_batches]
        self._positions[partition] = pos + len(out)
        return out

    def commit(self, partition: int, offset: int) -> None:
        self._committed[partition] = offset

    def committed(self, partition: int) -> Optional[int]:
        return self._committed.get(partition)

    # -- StreamSource ------------------------------------------------------

    def pending(self, after_offset: int) -> List[Dict]:
        """Group buffered batches (all partitions, offset-ordered) into
        shard descriptors of ~shard_records records."""
        import pyarrow.compute as pc

        batches = [t for part in self._partitions for t in part]
        batches = [t for t in batches if pc.max(t["offset"]).as_py() > after_offset]
        batches.sort(key=lambda t: pc.min(t["offset"]).as_py())
        shards, cur, cur_rows = [], [], 0
        for t in batches:
            cur.append(t)
            cur_rows += t.num_rows
            if cur_rows >= self.shard_records:
                shards.append(self._shard(cur))
                cur, cur_rows = [], 0
        if cur:
            shards.append(self._shard(cur))
        return shards

    @staticmethod
    def _shard(tables: List[pa.Table]) -> Dict:
        # true min/max, NOT positional first/last: redelivered
        # duplicates sit out of order within a batch
        import pyarrow.compute as pc

        return {
            "tables": tables,
            "min_offset": min(pc.min(t["offset"]).as_py() for t in tables),
            "max_offset": max(pc.max(t["offset"]).as_py() for t in tables),
        }

    def dataset(self, shards: List[Dict]) -> Dataset:
        import ray.data

        tables = [t for s in shards for t in s["tables"]]
        return ray.data.from_arrow(pa.concat_tables(tables, promote_options="default"))

    def schema(self, shards: List[Dict]) -> pa.Schema:
        return self._schema
