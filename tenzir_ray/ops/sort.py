"""`sort`, `top`, `rare`.

Reference: `sort` buffers ALL input on one node and sorts with
``arrow::compute::SortIndices`` (``builtins/operators/sort.cpp:25-232``)
— a deliberate non-goal here: Ray Data's ``Dataset.sort`` is a
distributed range-partitioned sort (sample → range boundaries → shuffle
→ per-partition sort), which is what survives at 100 TB.

`top f` / `rare f` are syntactic sugar for
`summarize count=count(f) by f | sort count desc/asc`
(``builtins/operators/top_rare.cpp:24-96``, expansion :72-77).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from ray.data import Dataset
from ray.data.aggregate import Count


def sort(
    ds: Dataset,
    key: Union[str, Sequence[str]],
    descending: Union[bool, Sequence[bool]] = False,
) -> Dataset:
    """Global sort by one or more fields (reference: `sort`,
    ``builtins/operators/sort.cpp:181-207``). Nulls sort last per
    Arrow's default ordering."""
    keys = [key] if isinstance(key, str) else list(key)
    return ds.sort(keys, descending=descending)


def top(ds: Dataset, field: str, k: Optional[int] = None, count_name: str = "count") -> Dataset:
    """Most frequent values of a field (reference: `top`,
    ``builtins/operators/top_rare.cpp``). Secondary sort on the field
    itself makes tie order deterministic."""
    out = ds.groupby(field).aggregate(Count(alias_name=count_name))
    out = out.sort([count_name, field], descending=[True, False])
    return out.limit(k) if k else out


def rare(ds: Dataset, field: str, k: Optional[int] = None, count_name: str = "count") -> Dataset:
    """Least frequent values of a field (reference: `rare`)."""
    out = ds.groupby(field).aggregate(Count(alias_name=count_name))
    out = out.sort([count_name, field], descending=[False, False])
    return out.limit(k) if k else out
