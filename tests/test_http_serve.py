"""HTTP loader (`curl` analog) and /serve REST endpoint tests."""

import json
import threading
import urllib.request

import pytest
import ray.data

from tenzir_ray.serve import ServeHub, start_http_server
from tenzir_ray.sources.http import read_http


@pytest.fixture(scope="module")
def file_server(tmp_path_factory):
    """A local HTTP file server standing in for any http(s) feed."""
    import functools
    from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

    root = tmp_path_factory.mktemp("www")
    (root / "events.ndjson").write_text(
        "\n".join(json.dumps({"i": i, "kind": "a" if i % 2 else "b"}) for i in range(10))
    )
    (root / "table.csv").write_text("x,y\n1,one\n2,two\n3,three\n")
    (root / "plain.txt").write_text("alpha\nbeta\ngamma\n")
    handler = functools.partial(SimpleHTTPRequestHandler, directory=str(root))
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_read_http_ndjson(ray_session, file_server):
    df = read_http(f"{file_server}/events.ndjson", format="json").to_pandas()
    assert len(df) == 10 and sorted(df["i"]) == list(range(10))


def test_read_http_lines_and_binary(ray_session, file_server):
    lines = read_http(f"{file_server}/plain.txt", format="lines").to_pandas()
    assert list(lines["text"]) == ["alpha", "beta", "gamma"]
    raw = read_http(f"{file_server}/plain.txt", format="binary").to_pandas()
    assert raw["status"].iloc[0] == 200 and bytes(raw["content"].iloc[0]).startswith(b"alpha")


def test_read_http_csv_multi_url(ray_session, file_server):
    df = read_http(
        [f"{file_server}/table.csv", f"{file_server}/table.csv"], format="csv"
    ).to_pandas()
    assert len(df) == 6 and set(df.columns) == {"x", "y"}


def _post(port, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/serve",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def serve_endpoint(ray_session):
    hub = ServeHub()
    server, port = start_http_server(hub)
    yield hub, port
    server.shutdown()


def test_serve_endpoint_pagination(serve_endpoint):
    hub, port = serve_endpoint
    hub.register("t1", ray.data.range(150))
    got, token, pages = [], "", 0
    while True:
        status, out = _post(port, {"serve_id": "t1", "continuation_token": token, "max_events": 64})
        assert status == 200
        got.extend(e["id"] for e in out["events"])
        pages += 1
        if out["next_continuation_token"] is None:
            break
        token = out["next_continuation_token"]
    assert sorted(got) == list(range(150)) and pages == 3


def test_serve_endpoint_retry_replays_last_page(serve_endpoint):
    hub, port = serve_endpoint
    hub.register("t2", ray.data.range(100))
    _, first = _post(port, {"serve_id": "t2", "max_events": 10})
    tok = first["next_continuation_token"]
    _, second = _post(port, {"serve_id": "t2", "continuation_token": tok, "max_events": 10})
    # client retries the same token (response was lost): same events back
    _, replay = _post(port, {"serve_id": "t2", "continuation_token": tok, "max_events": 10})
    assert replay["events"] == second["events"]
    assert replay["next_continuation_token"] == second["next_continuation_token"]
    # ...and the flow continues from the replayed token
    status, third = _post(
        port, {"serve_id": "t2", "continuation_token": replay["next_continuation_token"]}
    )
    assert status == 200
    assert third["events"][0]["id"] == 20


def test_serve_endpoint_errors(serve_endpoint):
    hub, port = serve_endpoint
    hub.register("t3", ray.data.range(5))
    status, _ = _post(port, {"serve_id": "missing", "timeout": 0.1})
    assert status == 404
    status, _ = _post(port, {"serve_id": "t3", "continuation_token": "bogus"})
    assert status == 400
    status, _ = _post(port, {"serve_id": "t3", "timeout": 99})
    assert status == 400
    status, _ = _post(port, {})
    assert status == 400


def test_serve_endpoint_waits_for_late_registration(serve_endpoint):
    hub, port = serve_endpoint

    def register_later():
        import time

        time.sleep(0.1)
        hub.register("late", ray.data.range(3))

    threading.Thread(target=register_later, daemon=True).start()
    # Max server-side wait: under a loaded test session, Ray may take
    # seconds to schedule the range() materialization.
    status, out = _post(port, {"serve_id": "late", "timeout": 5})
    assert status == 200 and len(out["events"]) == 3
