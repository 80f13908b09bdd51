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


# ---------------------------------------------------------------------------
# the /serve REST endpoint (serve.cpp:733-900; defaults.hpp:169-186)
# ---------------------------------------------------------------------------

MAX_TIMEOUT_SEC = 5.0  # defaults::api::serve::max_timeout
POLL_SEC = 0.1  # defaults::api::serve::timeout (100 ms)


class ServeHub:
    """serve_id registry with the reference's continuation-token
    protocol: tokens are opaque UUIDs; re-requesting the LAST delivered
    token replays the same page (client-retry semantics,
    ``serve.cpp:417-422``); any other stale token is an error; a null
    ``next_continuation_token`` means the pipeline is exhausted."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._pipes: Dict[str, dict] = {}

    def register(self, serve_id: str, ds_or_pager, page_size: int = DEFAULT_PAGE_SIZE):
        pager = ds_or_pager if isinstance(ds_or_pager, Pager) else Pager(ds_or_pager, page_size)
        import uuid

        with self._lock:
            if serve_id in self._pipes:
                raise ValueError(f"serve id {serve_id!r} already registered")
            self._pipes[serve_id] = {
                "pager": pager,
                "offset": 0,
                "token": str(uuid.uuid4()),  # token expected on the NEXT request
                "first": True,
                "last_token": None,
                "last_page": None,
                "done": False,
            }
        return pager

    def unregister(self, serve_id: str) -> None:
        with self._lock:
            self._pipes.pop(serve_id, None)

    def get(
        self,
        serve_id: str,
        continuation_token: str = "",
        max_events: int = DEFAULT_PAGE_SIZE,
        timeout: float = POLL_SEC,
    ) -> Dict:
        """One /serve request. Raises KeyError (unknown serve id after
        waiting ``timeout``) or ValueError (bad token / args)."""
        import time
        import uuid

        if timeout > MAX_TIMEOUT_SEC:
            raise ValueError(f"timeout must not be greater than {MAX_TIMEOUT_SEC} seconds")
        deadline = time.monotonic() + timeout
        while True:
            with self._lock:
                st = self._pipes.get(serve_id)
            if st is not None:
                break
            if time.monotonic() >= deadline:
                raise KeyError(f"unknown serve id {serve_id!r}")
            time.sleep(POLL_SEC)
        with self._lock:
            if continuation_token and st["last_token"] == continuation_token:
                # retry of the previous request: replay, keep state
                return {
                    "events": st["last_page"][:max_events],
                    "next_continuation_token": None if st["done"] else st["token"],
                }
            if continuation_token:
                if continuation_token != st["token"]:
                    raise ValueError(
                        f"unknown continuation token {continuation_token!r} "
                        f"for serve id {serve_id!r}"
                    )
            elif not st["first"]:
                raise ValueError(
                    f"unknown continuation token '' for serve id {serve_id!r}"
                )
            pager: Pager = st["pager"]
            pager.page_size = max_events
            out = pager.page(str(st["offset"]))
            st["first"] = False
            st["offset"] += len(out["events"])
            st["done"] = out["next_token"] is None
            st["last_token"] = continuation_token or None
            st["last_page"] = out["events"]
            st["token"] = str(uuid.uuid4())
            return {
                "events": out["events"],
                "next_continuation_token": None if st["done"] else st["token"],
            }


def start_http_server(hub: ServeHub, host: str = "127.0.0.1", port: int = 0):
    """Serve ``POST /serve`` over a stdlib ThreadingHTTPServer (the
    sandbox analog of the reference's REST endpoint; request/response
    bodies per the OpenAPI spec embedded at ``serve.cpp:79-140``).
    Returns (server, port); call ``server.shutdown()`` to stop."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _reply(self, code: int, obj: dict):
            body = json.dumps(obj, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path.rstrip("/") != "/serve":
                return self._reply(404, {"error": "unknown endpoint"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if "serve_id" not in req:
                    return self._reply(400, {"error": "serve_id is required"})
                out = hub.get(
                    req["serve_id"],
                    continuation_token=req.get("continuation_token", ""),
                    max_events=int(req.get("max_events", DEFAULT_PAGE_SIZE)),
                    timeout=float(req.get("timeout", POLL_SEC)),
                )
            except KeyError as e:
                return self._reply(404, {"error": str(e)})
            except (ValueError, TypeError) as e:
                return self._reply(400, {"error": str(e)})
            return self._reply(200, out)

    server = ThreadingHTTPServer((host, port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, server.server_address[1]
