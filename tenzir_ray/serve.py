"""`serve` analog: pull-based paged retrieval with continuation tokens.

Reference: the `serve` sink buffers results for REST retrieval in
64-event pages with continuation tokens
(``builtins/operators/serve.cpp:733-900``; defaults
``include/tenzir/defaults.hpp:169-186``: 64 events/page, 100 ms poll,
5 s max timeout). Here the buffer is a materialized Dataset and pages
stream from ``iter_batches`` — wrap :class:`Pager` in any HTTP
framework to get the REST endpoint."""

from __future__ import annotations

from typing import Dict, Optional

import pyarrow as pa
from ray.data import Dataset

DEFAULT_PAGE_SIZE = 64  # defaults.hpp:169-186


class Pager:
    """Continuation-token paging over a pipeline result.

    Tokens are opaque strings ("0", "64", ...); an empty ``next_token``
    means exhausted. The dataset is materialized ONCE; pages are served
    by slicing ONLY the blocks that overlap the requested range (the
    same block-offset arithmetic as `tail`), so serving a page is
    O(page), not O(prefix) — blocks stay in the object store until
    their page is requested."""

    def __init__(self, ds: Dataset, page_size: int = DEFAULT_PAGE_SIZE):
        import ray

        self.page_size = page_size
        mat = ds.materialize()
        self._refs = mat.to_arrow_refs()

        @ray.remote(num_cpus=0.25)
        def _count(t: pa.Table) -> int:
            return t.num_rows

        self._counts = ray.get([_count.remote(r) for r in self._refs])
        self._starts = [0]
        for c in self._counts:
            self._starts.append(self._starts[-1] + c)
        self._total = self._starts[-1]

    def page(self, token: Optional[str] = None) -> Dict:
        import ray

        start = int(token) if token else 0
        if start >= self._total:
            return {"events": [], "next_token": None}
        end = min(start + self.page_size, self._total)
        rows = []
        for i, (blk_start, cnt) in enumerate(zip(self._starts, self._counts)):
            blk_end = blk_start + cnt
            if blk_end <= start or blk_start >= end:
                continue
            t = ray.get(self._refs[i])
            lo = max(0, start - blk_start)
            hi = min(cnt, end - blk_start)
            rows.extend(t.slice(lo, hi - lo).to_pylist())
        return {
            "events": rows,
            "next_token": str(end) if end < self._total else None,
        }

    def __iter__(self):
        token: Optional[str] = None
        while True:
            out = self.page(token)
            if not out["events"]:
                return
            yield out["events"]
            token = out["next_token"]
            if token is None:
                return


def serve(ds: Dataset, page_size: int = DEFAULT_PAGE_SIZE) -> Pager:
    return Pager(ds, page_size)
