"""Join operators — broadcast lookup join and as-of join.

The reference has NO two-input join (SURVEY §2.5 negative space:
pipelines are linear, ``pipeline.hpp:401-414``); its only lookup-style
enrichment is sigma matching and taxonomy resolution. These operators
are the training-data-pipeline extension the brief calls for, built
the Ray-Data-idiomatic way:

- **Broadcast pattern, stated assumption**: the RIGHT side is a
  dimension table small enough to ``ray.put`` once and read from the
  object store by every task (one copy per node). At 100 TB the left
  side streams; the right side must stay ~worker-heap-sized.
- **Big-big escape hatch**: :func:`shuffle_join` hash-partitions BOTH
  sides (Ray's native join aggregators) when the right side outgrows
  a broadcast — the co-partitioned reduce-side join.
- Per-batch kernels are C-backed: ``pyarrow.Table.join`` (hash join)
  and ``pandas.merge_asof`` (sorted as-of merge).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

_PYARROW = dict(batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def lookup_join(
    ds: Dataset,
    right: pa.Table,
    keys: Union[str, Sequence[str]],
    right_keys: Union[str, Sequence[str], None] = None,
    how: str = "left outer",
) -> Dataset:
    """Hash-join every batch of ``ds`` against a broadcast ``right``
    table (``pyarrow.Table.join`` per batch; join types as pyarrow
    names: 'left outer', 'inner', ...)."""
    # only LEFT-preserving join types are correct per batch: a
    # right-preserving type ('right outer', 'full outer', 'right
    # semi/anti') would emit unmatched/matched RIGHT rows once per left
    # batch, duplicating or fabricating rows. The escape hatch for those
    # is a co-partitioned shuffle join (the dedup reduce-side pattern).
    _LEFT_PRESERVING = {"left outer", "inner", "left semi", "left anti"}
    if how not in _LEFT_PRESERVING:
        raise ValueError(
            f"lookup_join supports only left-preserving join types "
            f"{sorted(_LEFT_PRESERVING)}, got {how!r}; right-preserving "
            f"joins need a co-partitioned shuffle join, not a broadcast"
        )
    keys = [keys] if isinstance(keys, str) else list(keys)
    right_keys = (
        keys if right_keys is None
        else [right_keys] if isinstance(right_keys, str) else list(right_keys)
    )
    r_ref = ray.put(right)

    def apply(t: pa.Table) -> pa.Table:
        r = ray.get(r_ref)
        return t.join(r, keys=keys, right_keys=right_keys, join_type=how)

    return ds.map_batches(apply, **_PYARROW)


def shuffle_join(
    left: Dataset,
    right: Dataset,
    keys: Union[str, Sequence[str]],
    right_keys: Union[str, Sequence[str], None] = None,
    how: str = "inner",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Big-big distributed hash join: BOTH sides are hash-partitioned
    on the key and each partition pair is joined independently
    (``ray.data.Dataset.join`` — Ray's native hash-shuffle join
    aggregators). This is the escape hatch :func:`lookup_join`'s
    broadcast contract points to: use it when the right side outgrows
    a worker's heap.

    ``how`` accepts the pyarrow-style names lookup_join uses ('inner',
    'left outer', 'right outer', 'full outer', 'left semi', ...).
    ``num_partitions`` defaults to ~2x cluster CPUs — at 100 TB size it
    so ONE partition pair fits a worker's heap, and reuse one
    partitioning key across pipeline stages where possible."""
    mapping = {
        "inner": "inner",
        "left outer": "left_outer",
        "right outer": "right_outer",
        "full outer": "full_outer",
        "left semi": "left_semi",
        "right semi": "right_semi",
        "left anti": "left_anti",
        "right anti": "right_anti",
    }
    if how not in mapping:
        raise ValueError(f"unknown join type {how!r}; one of {sorted(mapping)}")
    keys = (keys,) if isinstance(keys, str) else tuple(keys)
    right_keys = (
        keys if right_keys is None
        else (right_keys,) if isinstance(right_keys, str) else tuple(right_keys)
    )
    if num_partitions is None:
        num_partitions = max(8, 2 * int(ray.cluster_resources().get("CPU", 4)))
    return left.join(
        right,
        join_type=mapping[how],
        num_partitions=num_partitions,
        on=keys,
        right_on=right_keys if right_keys != keys else None,
    )


def asof_join(
    ds: Dataset,
    right: pa.Table,
    on: str,
    by: Union[str, Sequence[str], None] = None,
    direction: str = "backward",
    tolerance=None,
) -> Dataset:
    """As-of join: for each left row, attach the right row with the
    greatest ``on`` value <= the left's (direction='backward'; also
    'forward'/'nearest'), optionally matching ``by`` keys first —
    DuckDB's ``ASOF JOIN`` semantics, pandas' C merge kernel per
    batch.

    The right table must have UNIQUE (by, on) combinations — ties make
    the matched row ambiguous; callers pre-aggregate (the same
    discipline DuckDB's ASOF requires for determinism)."""
    by_cols: Optional[List[str]] = (
        None if by is None else [by] if isinstance(by, str) else list(by)
    )
    # broadcast the right side UNSORTED (one ray.put of Arrow bytes);
    # the sort happens once per ACTOR in __init__, not on the driver
    # and not per batch
    r_ref = ray.put(right)
    cpus = int(ray.cluster_resources().get("CPU", 4))

    class AsofJoiner:
        def __init__(self):
            r = ray.get(r_ref)
            self.rdf = r.to_pandas().sort_values(on, kind="mergesort").reset_index(drop=True)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            left = df.sort_values(on, kind="mergesort").reset_index(drop=True)
            return pd.merge_asof(
                left, self.rdf, on=on, by=by_cols, direction=direction,
                tolerance=tolerance,
            )

    return ds.map_batches(
        AsofJoiner, concurrency=(1, max(2, cpus // 4)), num_cpus=0.5,
        batch_format="pandas", batch_size=None,
    )
