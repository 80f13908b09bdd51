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


def top(
    ds: Dataset,
    field: str,
    k: Optional[int] = None,
    count_name: str = "count",
    approx: bool = False,
) -> Dataset:
    """Most frequent values of a field (reference: `top`,
    ``builtins/operators/top_rare.cpp``). Secondary sort on the field
    itself makes tie order deterministic.

    ``approx=True`` is the 100-TB path: a single Misra–Gries
    ``approx_top_k`` aggregate (mergeable, ≤32 counters per map-side
    accumulator) instead of an exact groupby-count over a possibly
    billion-cardinality field — only the sketch crosses the shuffle.
    Counts may undercount by at most n/33; k is capped at the sketch
    width (32)."""
    if approx:
        import pyarrow as pa
        import ray.data

        from tenzir_ray.ops.summarize import summarize

        row = summarize(ds, aggs={"__pairs": ("approx_top_k", field)}).take_all()[0]
        pairs = list(row["__pairs"])[: k] if k else list(row["__pairs"])
        return ray.data.from_arrow(
            pa.table(
                {
                    field: pa.array([p[0] for p in pairs]),
                    count_name: pa.array([int(p[1]) for p in pairs], type=pa.int64()),
                }
            )
        )
    out = ds.groupby(field).aggregate(Count(alias_name=count_name))
    out = out.sort([count_name, field], descending=[True, False])
    return out.limit(k) if k else out


def rare(
    ds: Dataset,
    field: str,
    k: Optional[int] = None,
    count_name: str = "count",
    approx: bool = False,
) -> Dataset:
    """Least frequent values of a field (reference: `rare`).

    ``approx`` is rejected loudly: Misra–Gries (and every classic
    mergeable frequency sketch) bounds error relative to TOTAL count,
    which identifies heavy hitters but cannot distinguish rare values
    from each other — an "approximate rare" would return arbitrary
    noise. Use the exact path (rare is a full groupby-count) or invert
    the question (filter by a count threshold after summarize)."""
    if approx:
        raise ValueError(
            "rare --approx is not supported: frequency sketches bound error "
            "relative to the total count, so rare values are indistinguishable "
            "below the noise floor; use exact rare or a count-threshold filter"
        )
    out = ds.groupby(field).aggregate(Count(alias_name=count_name))
    out = out.sort([count_name, field], descending=[False, False])
    return out.limit(k) if k else out
