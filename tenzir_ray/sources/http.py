"""HTTP/FTP loader — the `curl` connector analog.

Reference: ``libtenzir/builtins/connectors/curl.cpp:43-173`` — a
protocol-templated loader (http/https/ftp/ftps) that streams the
response body as byte chunks into a parser, default parser ``json``,
with HTTPie-style request items (``key=value`` data, ``key==value``
URL params, ``key:value`` headers).

Ray-Data shape: the URL LIST is the parallelism unit — one fetch task
per URL (stdlib ``urllib``; no curl/requests in the container), then
the body parses through the same format parsers every other source
uses. A 100k-URL crawl is a 100k-row Dataset streaming through a
fetch stage with bounded concurrency, not a driver loop.
"""

from __future__ import annotations

import urllib.parse
import urllib.request
from typing import Dict, Optional, Sequence, Union

import pyarrow as pa
from ray.data import Dataset

_PYARROW = dict(batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def _build_request(
    url: str,
    method: str,
    headers: Optional[Dict[str, str]],
    params: Optional[Dict[str, str]],
    data,
) -> urllib.request.Request:
    if params:
        sep = "&" if urllib.parse.urlparse(url).query else "?"
        url = url + sep + urllib.parse.urlencode(params)
    body = None
    hdrs = dict(headers or {})
    if data is not None:
        if isinstance(data, (bytes, bytearray)):
            body = bytes(data)
        else:  # dict → JSON, like HTTPie's default and curl.cpp's data items
            import json

            body = json.dumps(data).encode()
            hdrs.setdefault("Content-Type", "application/json")
        if method == "GET":
            method = "POST"
    return urllib.request.Request(url, data=body, headers=hdrs, method=method)


class _Fetch:
    """Actor-pool fetch stage: opener built once per actor; each batch
    of URLs downloads sequentially within the task (parallelism comes
    from `concurrency`, i.e. many in-flight URL batches)."""

    def __init__(self, method, headers, params, data, timeout):
        self.opener = urllib.request.build_opener()
        self.method = method
        self.headers = headers
        self.params = params
        self.data = data
        self.timeout = timeout

    def __call__(self, t: pa.Table) -> pa.Table:
        urls, bodies, statuses = [], [], []
        for url in t["url"].to_pylist():
            req = _build_request(url, self.method, self.headers, self.params, self.data)
            with self.opener.open(req, timeout=self.timeout) as resp:
                bodies.append(resp.read())
                statuses.append(resp.status)
            urls.append(url)
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "status": pa.array(statuses, type=pa.int64()),
                "content": pa.array(bodies, type=pa.binary()),
            }
        )


def load_http(
    urls: Union[str, Sequence[str]],
    method: str = "GET",
    headers: Optional[Dict[str, str]] = None,
    params: Optional[Dict[str, str]] = None,
    data=None,
    timeout: float = 30.0,
    concurrency: int = 4,
) -> Dataset:
    """Raw byte download: Dataset of (url, status, content) rows."""
    import ray.data

    if isinstance(urls, str):
        urls = [urls]
    ds = ray.data.from_items([{"url": u} for u in urls])
    return ds.map_batches(
        _Fetch,
        fn_constructor_kwargs=dict(
            method=method, headers=headers, params=params, data=data, timeout=timeout
        ),
        concurrency=(1, concurrency),  # autoscale: small URL lists need one actor
        num_cpus=0.25,  # I/O-bound: don't hold a full core per fetch
        batch_format="pyarrow",
        batch_size=8,
    )


def _to_lines(ds: Dataset) -> Dataset:
    def split(t: pa.Table) -> pa.Table:
        lines = []
        for body in t["content"].to_pylist():
            lines.extend(body.decode("utf-8", "replace").splitlines())
        return pa.table({"text": pa.array(lines, type=pa.string())})

    return ds.map_batches(split, **_PYARROW)


def read_http(
    urls: Union[str, Sequence[str]],
    format: str = "json",
    selector: Optional[str] = None,
    timeout: float = 30.0,
    concurrency: int = 4,
    **request_kwargs,
) -> Dataset:
    """`from http://… read <format>` — fetch + parse in one pipeline.

    Formats: ``json`` (NDJSON, the reference's default parser for
    curl loaders), ``lines``, ``csv``, ``binary`` (raw
    url/status/content rows).
    """
    raw = load_http(urls, timeout=timeout, concurrency=concurrency, **request_kwargs)
    if format in ("binary", "raw"):
        return raw
    if format == "lines":
        return _to_lines(raw)
    if format in ("json", "ndjson", "suricata", "zeek-json"):
        from tenzir_ray import formats

        sel = {"suricata": "event_type", "zeek-json": "_path:zeek"}.get(format, selector)
        return formats.parse_ndjson(_to_lines(raw), "text", selector=sel)
    if format == "csv":
        import io

        import pyarrow.csv as pcsv

        def parse(t: pa.Table) -> pa.Table:
            tables = [
                pcsv.read_csv(io.BytesIO(body)) for body in t["content"].to_pylist()
            ]
            return pa.concat_tables(tables, promote_options="default")

        return raw.map_batches(parse, **_PYARROW)
    raise ValueError(f"unknown http format: {format!r}")
