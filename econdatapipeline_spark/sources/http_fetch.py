"""Driver-side HTTP fetchers with a landing-zone byte cache (S2/S6).

Mirrors the reference's download-with-cache pattern: check the blob
store first, else GET the URL and store the raw bytes for replay
(reference: core_local/azure_common_scrapers.py:35-64 for workbooks,
core_local/azure_fred_scraper.py:70-115 for FRED JSON). Two properties
carried over on purpose, both documented reference behavior:

- the cache has NO TTL — a cached object is served forever until
  explicitly deleted (the reference relies on the freshness gate, not
  cache expiry, to refetch);
- raw bytes are stored BEFORE any parsing, so the replay story is:
  re-normalize any time from the landing zone without touching the
  network.

Transport is injectable everywhere (``http_get: url -> bytes``); the
default uses stdlib ``urllib`` and is only exercised when a caller
opts in — tests and the sandboxed pipeline inject a stub or a local
HTTP server. Fetching is driver-side by design: payloads are KB-sized
config-driven downloads; everything after ``normalize`` is lazy and
distributed.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from urllib.parse import urlencode

from econdatapipeline_spark.registry import DatasetSpec
from econdatapipeline_spark.sources.warehouse import Warehouse
from econdatapipeline_spark.sources.xlsx import extract_data

RAW_CONTAINER = "raw-files"  # reference: azure_common_scrapers.py:40

HttpGet = Callable[[str], bytes]


def default_http_get(url: str, timeout: float = 30.0) -> bytes:
    """Stdlib GET, raising on HTTP errors (requests.raise_for_status
    analog). Only used when a caller explicitly opts into live HTTP."""
    from urllib.request import urlopen  # noqa: PLC0415 — keep import lazy

    with urlopen(url, timeout=timeout) as resp:  # noqa: S310 — caller-provided URL by design
        if resp.status >= 400:
            raise OSError(f"GET {url} -> HTTP {resp.status}")
        return resp.read()


class CachedHttpFetcher:
    """Blob-cache-first byte fetcher (download_excel semantics).

    ``fetch(url, name)``: return cached bytes if present, else GET,
    store, return. Misses that raise propagate to the caller (the
    pipeline's per-dataset isolation turns them into status=failed,
    like the reference's None return).
    """

    def __init__(
        self,
        wh: Warehouse,
        http_get: HttpGet | None = None,
        container: str = RAW_CONTAINER,
    ):
        self.wh = wh
        self.http_get = http_get or default_http_get
        self.container = container
        wh.create_container(container)

    def fetch(self, url: str, name: str) -> bytes:
        cached = self.wh.get_blob(self.container, name)
        if cached is not None:
            return cached
        data = self.http_get(url)
        self.wh.put_blob(self.container, name, data)
        return data


def edb_fetcher(
    wh: Warehouse, base_url: str, http_get: HttpGet | None = None
) -> Callable[[DatasetSpec], list[list]]:
    """Pipeline fetcher for EDB specs: cached workbook download ->
    ``extract_data`` grid rows (reference: azure_common_scrapers.py:
    35-79 — URL is base + file_name; cache key is the file name, so
    two datasets sharing one workbook download it once)."""
    cache = CachedHttpFetcher(wh, http_get)

    def fetch(spec: DatasetSpec) -> list[list]:
        content = cache.fetch(base_url + spec.file_name, spec.file_name)
        return extract_data(content, spec.sheet_name, spec.data_location)

    return fetch


FRED_BASE_URL = "https://api.stlouisfed.org/fred/series/observations"


def fred_url(
    spec: DatasetSpec,
    api_key: str,
    base_url: str = FRED_BASE_URL,
    observation_start: str = "2000-01-01",
    limit: int = 1000,
) -> str:
    """The reference's query-param contract (azure_fred_scraper.py:80-92)."""
    params = {
        "series_id": spec.fred_series_id,
        "api_key": api_key,
        "file_type": "json",
        "frequency": spec.frequency,
        "sort_order": "desc",
        "limit": limit,
        "observation_start": observation_start,
    }
    return f"{base_url}?{urlencode(params)}"


def fred_fetcher(
    wh: Warehouse,
    api_key: str,
    http_get: HttpGet | None = None,
    base_url: str = FRED_BASE_URL,
) -> Callable[[DatasetSpec], dict]:
    """Pipeline fetcher for FRED specs: cached series/observations GET
    -> parsed JSON dict for ``normalize_fred_observations``. Raw JSON
    bytes land in the blob cache keyed ``fred_<series>.json``
    (reference: azure_fred_scraper.py:74,103-104); the API key lives
    only in the URL, never in the cache key or stored payload."""
    cache = CachedHttpFetcher(wh, http_get)

    def fetch(spec: DatasetSpec) -> dict:
        name = f"fred_{spec.fred_series_id}.json"
        data = cache.fetch(fred_url(spec, api_key, base_url), name)
        payload = json.loads(data)
        if "observations" not in payload:
            raise ValueError(
                f"no observations in FRED response for {spec.fred_series_id}"
            )
        return payload

    return fetch
