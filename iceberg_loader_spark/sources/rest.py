"""REST API ingestion source (SURVEY.md §2 A6).

Parity with the reference's example-level REST adapter
(/root/reference examples/rest_adapter.py:9-35, examples/load_from_api.py:13-61):
GET an endpoint, parse the JSON body, yield it as list-of-dict batches
ready for the messy-JSON normalization path (A4,
``sources/normalize.create_arrow_table_from_data``). A non-list body is
wrapped in a single-element list with a warning, and transport errors
propagate after being logged.

The HTTP transport is injectable so tests (and air-gapped runs) can feed
canned payloads; the default uses urllib from the standard library. This
is a driver-side source by design — batches land in Spark via
``SparkLoader.load_data_batches``. For cluster-parallel API ingestion the
pattern is a DataFrame of endpoint URLs + ``mapInPandas`` fetching per
partition, which composes from these same pieces.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

from iceberg_loader_spark.services import get_logger

Transport = Callable[[str, float], str]


def _urllib_transport(url: str, timeout: float) -> str:
    from urllib.request import urlopen

    with urlopen(url, timeout=timeout) as resp:  # noqa: S310 - caller-supplied URL
        if getattr(resp, "status", 200) >= 400:
            raise OSError(f"HTTP {resp.status} from {url}")
        return resp.read().decode("utf-8")


class RestSource:
    """Fetches JSON batches from a REST API base URL."""

    def __init__(
        self,
        base_url: str,
        transport: Transport | None = None,
        timeout: float = 30.0,
    ):
        self.base_url = base_url.rstrip("/") + "/"
        self.transport = transport or _urllib_transport
        self.timeout = timeout

    def endpoint_url(self, endpoint: str) -> str:
        return self.base_url + endpoint.lstrip("/")

    def get_data(self, endpoint: str) -> Iterator[list[dict]]:
        """Yield list-of-dict batches from one endpoint."""
        url = self.endpoint_url(endpoint)
        log = get_logger()
        log.info("Fetching data from: %s", url)
        try:
            body = self.transport(url, self.timeout)
        except Exception:
            log.error("Failed to fetch data from %s", url, exc_info=True)
            raise
        data = json.loads(body)
        if isinstance(data, list):
            yield data
        else:
            log.warning("API returned non-list data, wrapping in list")
            yield [data]
