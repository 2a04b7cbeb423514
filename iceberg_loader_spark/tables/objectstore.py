"""Object-store metadata backend: the S3-semantics implementation of the
:class:`~iceberg_loader_spark.tables.format.MetadataBackend` seam.

The reference's production stack keeps table metadata on S3/MinIO behind a
catalog (``/root/reference examples/catalog.py:9-27``,
``examples/docker-compose.yml:1-61``). Object stores offer no POSIX
``O_EXCL``/``rename`` atomics; the primitives that exist are:

* **conditional PUT** ``If-None-Match: *`` — create-only, fails if the key
  exists (S3 supports this natively since 2024; GCS via
  ``x-goog-if-generation-match: 0``; Azure via ``If-None-Match: *``);
* **conditional PUT** ``If-Match: <etag>`` — compare-and-swap on an
  existing object.

:class:`ObjectStoreBackend` maps the table-commit contract onto exactly
those two primitives:

* ``write_manifest_exclusive`` → ``If-None-Match`` create of the immutable
  manifest blob. This is the **linearization point**: exactly one writer
  per version wins, losers get :class:`CommitConflict` and rebase.
* ``publish_current`` → a **monotonic CAS loop** on the ``current``
  pointer blob (``If-Match`` on the read etag, retry on conflict, no-op if
  the pointer already moved at-or-past the target). Monotonicity matters:
  a slow writer's delayed publish must never roll the pointer backwards
  over a later commit (the orphan-recovery path publishes on behalf of
  crashed writers, so two publishers for one version are expected and
  idempotent).

:class:`InMemoryStore` is the sandbox stand-in for the store itself — a
thread-safe dict that honors both conditions exactly as S3 does. A real
deployment swaps it for an S3/GCS client exposing the same four calls;
nothing in the backend or above it changes. Data files are unaffected by
this seam: Spark executors write parquet wherever the table root points
(s3a:// in production), and manifests reference them relatively.
"""

from __future__ import annotations

import threading
import uuid

from iceberg_loader_spark.tables.format import CommitConflict, MetadataBackend


class PreconditionFailed(Exception):
    """Conditional PUT lost (HTTP 412): key exists / etag mismatch."""


class ConditionalPutStore:
    """Minimal blob-store API the backend needs (S3 subset)."""

    def get(self, key: str) -> tuple[bytes, str]:
        """Return (data, etag). Raises KeyError if absent."""
        raise NotImplementedError

    def put(
        self,
        key: str,
        data: bytes,
        *,
        if_none_match: bool = False,
        if_match: str | None = None,
    ) -> str:
        """Write a blob, return its new etag.

        ``if_none_match=True`` → fail with :class:`PreconditionFailed` if
        the key exists. ``if_match=etag`` → fail unless the current etag
        matches (CAS).
        """
        raise NotImplementedError

    def delete(self, key: str) -> None:
        raise NotImplementedError

    def list_keys(self, prefix: str) -> list[str]:
        raise NotImplementedError


class InMemoryStore(ConditionalPutStore):
    """Thread-safe in-memory fake honoring the conditional-PUT contract."""

    def __init__(self):
        self._lock = threading.Lock()
        self._blobs: dict[str, tuple[bytes, str]] = {}

    def get(self, key: str) -> tuple[bytes, str]:
        with self._lock:
            return self._blobs[key]

    def put(
        self,
        key: str,
        data: bytes,
        *,
        if_none_match: bool = False,
        if_match: str | None = None,
    ) -> str:
        with self._lock:
            existing = self._blobs.get(key)
            if if_none_match and existing is not None:
                raise PreconditionFailed(f"{key} exists")
            if if_match is not None and (
                existing is None or existing[1] != if_match
            ):
                raise PreconditionFailed(f"{key} etag mismatch")
            etag = uuid.uuid4().hex
            self._blobs[key] = (data, etag)
            return etag

    def delete(self, key: str) -> None:
        with self._lock:
            self._blobs.pop(key, None)

    def list_keys(self, prefix: str) -> list[str]:
        with self._lock:
            return sorted(k for k in self._blobs if k.startswith(prefix))


class ObjectStoreBackend(MetadataBackend):
    """Table-metadata backend over a :class:`ConditionalPutStore`.

    Key layout under ``prefix`` (normally the table root's URI path)::

        <prefix>/_meta/v000000001.json   immutable manifest blobs
        <prefix>/_meta/current           pointer blob, body = version int
    """

    def __init__(self, store: ConditionalPutStore, prefix: str):
        self.store = store
        self.prefix = prefix.rstrip("/")

    # ---- keys ------------------------------------------------------------

    def _manifest_key(self, version: int) -> str:
        return f"{self.prefix}/_meta/v{version:09d}.json"

    @property
    def _current_key(self) -> str:
        return f"{self.prefix}/_meta/current"

    # ---- MetadataBackend contract ---------------------------------------

    def exists(self) -> bool:
        try:
            self.store.get(self._current_key)
            return True
        except KeyError:
            return False

    def read_current(self) -> int:
        try:
            data, _etag = self.store.get(self._current_key)
        except KeyError:
            raise FileNotFoundError(self._current_key) from None
        return int(data.decode())

    def read_manifest(self, version: int) -> dict:
        import json

        try:
            data, _etag = self.store.get(self._manifest_key(version))
        except KeyError:
            raise FileNotFoundError(self._manifest_key(version)) from None
        return json.loads(data.decode())

    def list_versions(self) -> list[int]:
        out = []
        for key in self.store.list_keys(f"{self.prefix}/_meta/v"):
            name = key.rsplit("/", 1)[-1]
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def write_manifest_exclusive(self, version: int, payload: dict) -> None:
        import json

        try:
            self.store.put(
                self._manifest_key(version),
                json.dumps(payload, separators=(",", ":")).encode(),
                if_none_match=True,
            )
        except PreconditionFailed as e:
            raise CommitConflict(f"v{version} already committed") from e

    def write_manifest_replace(self, version: int, payload: dict) -> None:
        import json

        # unconditional put: expiry-time materialization is a single-
        # maintenance-actor operation (same assumption as file deletion);
        # object stores make the swap atomic per key
        self.store.put(
            self._manifest_key(version),
            json.dumps(payload, separators=(",", ":")).encode(),
        )

    def publish_current(self, version: int) -> None:
        # Monotonic CAS loop: never move the pointer backwards. Two
        # publishers for the same version (original writer + orphan
        # recovery) are idempotent; a delayed publish for an older
        # version no-ops once a newer one is visible.
        body = str(version).encode()
        while True:
            try:
                data, etag = self.store.get(self._current_key)
            except KeyError:
                try:
                    self.store.put(self._current_key, body, if_none_match=True)
                    return
                except PreconditionFailed:
                    continue  # someone else created it; re-read and CAS
            if int(data.decode()) >= version:
                return
            try:
                self.store.put(self._current_key, body, if_match=etag)
                return
            except PreconditionFailed:
                continue  # pointer moved under us; re-read

    def delete_manifest(self, version: int) -> None:
        self.store.delete(self._manifest_key(version))

    def drop(self) -> None:
        for key in self.store.list_keys(f"{self.prefix}/_meta/"):
            self.store.delete(key)
