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
    means exhausted. The dataset is materialized ONCE (serve results
    are query outputs, already small relative to the input)."""

    def __init__(self, ds: Dataset, page_size: int = DEFAULT_PAGE_SIZE):
        self.page_size = page_size
        self._mat = ds.materialize()
        self._total = self._mat.count()

    def page(self, token: Optional[str] = None) -> Dict:
        start = int(token) if token else 0
        if start >= self._total:
            return {"events": [], "next_token": None}
        # split_at-like slice without pulling the whole dataset
        rows = self._mat.limit(start + self.page_size).take(start + self.page_size)[start:]
        nxt = start + len(rows)
        return {
            "events": rows,
            "next_token": str(nxt) if nxt < self._total else None,
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
