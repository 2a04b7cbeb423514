"""HTTP catalog-service adapter for the metadata seam — working proof
that the :class:`~iceberg_loader_spark.tables.format.MetadataBackend`
contract ports to a remote catalog service, not just local disk.

The reference's production deployment keeps table metadata behind a
catalog service (Hive Metastore in its docker stack,
``/root/reference examples/catalog.py:9-27``); Iceberg's modern
equivalent is the REST catalog, whose commit primitive is a
compare-and-swap on the table pointer. This module implements exactly
that shape with stdlib-only pieces:

* :class:`CatalogHTTPServer` — an in-process catalog service (stdlib
  ``ThreadingHTTPServer``) exposing blob get/put/delete/list with the
  two conditional-PUT primitives (``If-None-Match: *`` create,
  ``If-Match: <etag>`` CAS) returning HTTP 412 on a lost race — the
  same observable semantics S3 and an Iceberg REST catalog's
  ``commit`` endpoint provide.
* :class:`HttpCatalogStore` — a
  :class:`~iceberg_loader_spark.tables.objectstore.ConditionalPutStore`
  client over ``urllib``. Plugging it into
  :class:`~iceberg_loader_spark.tables.objectstore.ObjectStoreBackend`
  yields a fully network-backed catalog: every commit's linearization
  point happens server-side, across processes, with zero shared
  filesystem state.

Nothing above the store interface changes — ``Table``, the commit retry
loop, orphan recovery, and expiry run unmodified over HTTP, which is the
point of the seam.
"""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from iceberg_loader_spark.tables.objectstore import (
    ConditionalPutStore,
    InMemoryStore,
    PreconditionFailed,
)


class _Handler(BaseHTTPRequestHandler):
    """Blob API: GET/PUT/DELETE ``/blob?key=…``, GET ``/list?prefix=…``."""

    store: InMemoryStore  # class attribute, set by CatalogHTTPServer

    def log_message(self, *args):  # silence per-request stderr noise
        pass

    def _key(self) -> str:
        q = urllib.parse.urlparse(self.path).query
        return urllib.parse.parse_qs(q).get("key", [""])[0]

    def do_GET(self):
        parsed = urllib.parse.urlparse(self.path)
        if parsed.path == "/list":
            prefix = urllib.parse.parse_qs(parsed.query).get("prefix", [""])[0]
            body = json.dumps(self.store.list_keys(prefix)).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        try:
            data, etag = self.store.get(self._key())
        except KeyError:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("ETag", etag)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_PUT(self):
        length = int(self.headers.get("Content-Length", "0"))
        data = self.rfile.read(length)
        kwargs = {}
        if self.headers.get("If-None-Match") == "*":
            kwargs["if_none_match"] = True
        if "If-Match" in self.headers:
            kwargs["if_match"] = self.headers["If-Match"]
        try:
            etag = self.store.put(self._key(), data, **kwargs)
        except PreconditionFailed:
            self.send_response(412)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("ETag", etag)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def do_DELETE(self):
        self.store.delete(self._key())
        self.send_response(204)
        self.end_headers()


class CatalogHTTPServer:
    """In-process catalog service; ``with CatalogHTTPServer() as url:``."""

    def __init__(self):
        handler = type("BoundHandler", (_Handler,), {"store": InMemoryStore()})
        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address
        return f"http://{host}:{port}"

    def __enter__(self) -> str:
        self._thread.start()
        return self.url

    def __exit__(self, *exc) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


class HttpCatalogStore(ConditionalPutStore):
    """Conditional-PUT blob store client over HTTP (stdlib urllib)."""

    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")

    def _blob_url(self, key: str) -> str:
        return f"{self.base_url}/blob?key={urllib.parse.quote(key, safe='')}"

    def get(self, key: str) -> tuple[bytes, str]:
        try:
            with urllib.request.urlopen(self._blob_url(key)) as resp:
                return resp.read(), resp.headers["ETag"]
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise KeyError(key) from None
            raise

    def put(
        self,
        key: str,
        data: bytes,
        *,
        if_none_match: bool = False,
        if_match: str | None = None,
    ) -> str:
        req = urllib.request.Request(
            self._blob_url(key), data=data, method="PUT"
        )
        if if_none_match:
            req.add_header("If-None-Match", "*")
        if if_match is not None:
            req.add_header("If-Match", if_match)
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.headers["ETag"]
        except urllib.error.HTTPError as e:
            if e.code == 412:
                raise PreconditionFailed(key) from None
            raise

    def delete(self, key: str) -> None:
        req = urllib.request.Request(self._blob_url(key), method="DELETE")
        with urllib.request.urlopen(req):
            pass

    def list_keys(self, prefix: str) -> list[str]:
        url = (
            f"{self.base_url}/list?"
            f"prefix={urllib.parse.quote(prefix, safe='')}"
        )
        with urllib.request.urlopen(url) as resp:
            return json.loads(resp.read().decode())
