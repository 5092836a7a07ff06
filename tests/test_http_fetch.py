"""S2/S6: byte-blob CRUD, cached HTTP fetchers, pipeline e2e over a
local HTTP stub server (mirror of reference tests/test_azure_connector
.py:37-88 blob round-trip + azure_common_scrapers.py:35-64 cache
semantics)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from econdatapipeline_spark.pipeline import run_pipeline
from econdatapipeline_spark.registry import EDB_SPECS, FRED_SPECS
from econdatapipeline_spark.sources.http_fetch import (
    CachedHttpFetcher,
    default_http_get,
    edb_fetcher,
    fred_fetcher,
    fred_url,
)
from econdatapipeline_spark.sources.warehouse import Warehouse
from econdatapipeline_spark.sources.xls import write_xls


# ---------------------------------------------------------------- blob CRUD


def test_blob_crud_roundtrip(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.create_container("raw-files")
    wh.create_container("raw-files")  # idempotent
    assert wh.get_blob("raw-files", "missing.bin") is None
    assert wh.list_blobs("raw-files") == []
    assert wh.delete_blob("raw-files", "missing.bin") is False

    payload = b"\x00\x01binary\xff"
    wh.put_blob("raw-files", "a/b/data.bin", payload)
    wh.put_blob("raw-files", "data.json", '{"k": 1}')  # str -> utf-8
    assert wh.get_blob("raw-files", "a/b/data.bin") == payload  # content echo
    assert wh.get_blob("raw-files", "data.json") == b'{"k": 1}'
    assert wh.list_blobs("raw-files") == ["a/b/data.bin", "data.json"]
    assert wh.list_blobs("raw-files", name_starts_with="a/") == ["a/b/data.bin"]

    wh.put_blob("raw-files", "data.json", '{"k": 2}')  # overwrite
    assert wh.get_blob("raw-files", "data.json") == b'{"k": 2}'
    assert wh.delete_blob("raw-files", "data.json") is True
    assert wh.get_blob("raw-files", "data.json") is None
    assert wh.list_blobs("raw-files") == ["a/b/data.bin"]


def test_blob_name_cannot_escape_container(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="escapes"):
        wh.put_blob("raw-files", "../../etc/passwd", b"x")


# ------------------------------------------------------------- HTTP stub


class _Handler(BaseHTTPRequestHandler):
    routes: dict[str, bytes] = {}
    hits: list[str] = []

    def do_GET(self):  # noqa: N802 — http.server API
        self.hits.append(self.path)
        body = self.routes.get(self.path.split("?")[0])
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence
        pass


@pytest.fixture()
def stub_server():
    server = HTTPServer(("127.0.0.1", 0), _Handler)
    _Handler.routes = {}
    _Handler.hits = []
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}", _Handler
    server.shutdown()


def _edb_workbook() -> bytes:
    # one workbook, two sheets, the full 10-year header row the real
    # A6:K18 grids carry ('n/a' pads the years without data)
    years = list(range(2016, 2026))
    grid = lambda base: [[None] * 11] * 5 + [  # noqa: E731
        ["Month", *years],
        ["July", str(base), str(base + 10)] + ["n/a"] * 8,
        ["August", str(base + 1), str(base + 11)] + ["n/a"] * 8,
    ] + [[None] * 11] * 5
    return write_xls({"AS01": grid(100), "BAN01": grid(500)})


def test_cached_fetch_hits_network_once(spark, tmp_path, stub_server):
    base, handler = stub_server
    handler.routes["/I_AUTO.XLS"] = _edb_workbook()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    cache = CachedHttpFetcher(wh, http_get=default_http_get)

    b1 = cache.fetch(f"{base}/I_AUTO.XLS", "I_AUTO.XLS")
    b2 = cache.fetch(f"{base}/I_AUTO.XLS", "I_AUTO.XLS")  # cache hit
    assert b1 == b2 == handler.routes["/I_AUTO.XLS"]
    assert handler.hits == ["/I_AUTO.XLS"]  # exactly one network GET
    assert wh.list_blobs("raw-files") == ["I_AUTO.XLS"]

    # No TTL (documented reference behavior): still served from cache
    # even if the origin changes; delete_blob is the refetch lever.
    handler.routes["/I_AUTO.XLS"] = b"changed"
    assert cache.fetch(f"{base}/I_AUTO.XLS", "I_AUTO.XLS") == b1
    wh.delete_blob("raw-files", "I_AUTO.XLS")
    assert cache.fetch(f"{base}/I_AUTO.XLS", "I_AUTO.XLS") == b"changed"


def test_http_404_raises(stub_server):
    base, _ = stub_server
    with pytest.raises(Exception):  # noqa: B017 — urllib raises HTTPError
        default_http_get(f"{base}/nope.xls")


def _fred_payload(values: list[str]) -> bytes:
    obs = [
        {"date": f"2024-0{i + 1}-01", "value": v} for i, v in enumerate(values)
    ]
    return json.dumps({"observations": obs}).encode()


def test_pipeline_e2e_over_http_stub(spark, tmp_path, stub_server):
    """run_pipeline with live(-stub) fetchers: cache-miss first run,
    cache-hit + freshness-gate second run."""
    base, handler = stub_server
    handler.routes["/I_AUTO.XLS"] = _edb_workbook()
    handler.routes["/fred"] = _fred_payload(["1.5", ".", "2.5"])

    wh = Warehouse(spark, str(tmp_path / "wh"))
    specs = (
        next(s for s in EDB_SPECS if s.name == "autosales"),
        next(s for s in FRED_SPECS if s.name == "federalfundsrate"),
    )
    fetchers = {
        "edb_monthly": edb_fetcher(wh, base + "/", http_get=default_http_get),
        "fred": fred_fetcher(
            wh, api_key="test-key", http_get=default_http_get, base_url=f"{base}/fred"
        ),
    }
    summary = run_pipeline(spark, wh, fetchers, specs=specs)
    assert summary["updated"] == 2 and summary["failed"] == 0
    assert wh.read("autosales").count() == 4  # 2 months x 2 fiscal years
    assert wh.read("federalfundsrate").count() == 2  # '.' sentinel dropped
    assert set(wh.list_blobs("raw-files")) == {"I_AUTO.XLS", "fred_DFF.json"}
    n_hits = len(handler.hits)

    # Second run: freshness gate short-circuits before any fetch.
    summary2 = run_pipeline(spark, wh, fetchers, specs=specs)
    assert summary2["no_update_needed"] == 2
    assert len(handler.hits) == n_hits

    # Forced rerun: fetchers run again but serve from the blob cache.
    summary3 = run_pipeline(spark, wh, fetchers, specs=specs, force=True)
    assert summary3["updated"] == 2  # all-zero merge counts, still 'updated'
    assert len(handler.hits) == n_hits


def test_fred_url_contract():
    spec = next(s for s in FRED_SPECS if s.name == "realgdp")
    url = fred_url(spec, api_key="k123")
    assert "series_id=GDPC1" in url and "frequency=q" in url
    assert "file_type=json" in url and "api_key=k123" in url


def test_cached_fetcher_against_real_local_sockets(spark, tmp_path):
    """End-to-end over real HTTP: stdlib http.server on a loopback
    port exercises default_http_get -> cache-miss GET -> blob store ->
    cache-hit replay with zero further requests, plus the HTTP-error
    propagation path. No network egress: 127.0.0.1 only."""
    import http.server
    import threading

    from econdatapipeline_spark.sources.http_fetch import (
        CachedHttpFetcher,
        default_http_get,
    )
    from econdatapipeline_spark.sources.warehouse import Warehouse

    hits = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(self.path)
            if self.path.startswith("/missing"):
                self.send_response(404)
                self.end_headers()
                return
            body = f"payload-for:{self.path}".encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # quiet test output
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        wh = Warehouse(spark, str(tmp_path / "wh"))
        fetcher = CachedHttpFetcher(wh, http_get=default_http_get)

        # cache miss -> real GET over the socket
        got = fetcher.fetch(f"{base}/series/a.xls", "a.xls")
        assert got == f"payload-for:/series/a.xls".encode()
        assert hits == ["/series/a.xls"]

        # cache hit -> served from the blob store, no second request
        again = fetcher.fetch(f"{base}/series/a.xls", "a.xls")
        assert again == got
        assert hits == ["/series/a.xls"]
        assert wh.get_blob("raw-files", "a.xls") == got

        # HTTP error propagates (pipeline turns it into status=failed)
        with pytest.raises(OSError):
            fetcher.fetch(f"{base}/missing.xls", "missing.xls")
        # the failed fetch must NOT poison the cache
        assert wh.get_blob("raw-files", "missing.xls") is None
    finally:
        srv.shutdown()
        thread.join(timeout=5)
