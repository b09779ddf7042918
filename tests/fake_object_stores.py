"""In-process fakes of the google-cloud-storage and azure-storage-blob
client surfaces the GCS/Azure ControlFS ports are written against —
the role moto plays for S3ControlFS.

What matters is the SERVER-side conditional semantics, enforced under
one lock so every individual API call is atomic (like the real
services): GCS bumps a per-key generation on every write and rejects
``if_generation_match`` mismatches with 412; Azure rotates the etag on
every write, rejects ``overwrite=False`` on a live blob with 409 and a
stale ``etag=`` with 412.  Exceptions carry only the HTTP status
attribute the ControlFS classes key on (``code`` / ``status_code``) —
no SDK exception classes are imitated, by design.
"""

from __future__ import annotations

import threading
import uuid
from datetime import datetime, timedelta, timezone


class FakeApiError(Exception):
    def __init__(self, status: int, msg: str = "") -> None:
        super().__init__(msg or f"HTTP {status}")
        self.code = status          # google.api_core style
        self.status_code = status   # azure.core style


def _now() -> datetime:
    return datetime.now(timezone.utc)


# ---------------------------------------------------------------- GCS


class _GcsObject:
    __slots__ = ("data", "generation", "updated")

    def __init__(self, data: bytes, generation: int) -> None:
        self.data = data
        self.generation = generation
        self.updated = _now()


class FakeGCSBlobSnapshot:
    """What ``get_blob`` / ``list_blobs`` yield: name + metadata pinned
    at read time, plus a generation-checked body read."""

    def __init__(self, client: "FakeGCSClient", name: str,
                 obj: _GcsObject) -> None:
        self._client = client
        self.name = name
        self.generation = obj.generation
        self.updated = obj.updated
        self._data = obj.data

    def download_as_bytes(self, if_generation_match: int | None = None) -> bytes:
        with self._client._lock:
            cur = self._client._store.get(self.name)
            if cur is None:
                raise FakeApiError(404, self.name)
            if (
                if_generation_match is not None
                and cur.generation != if_generation_match
            ):
                raise FakeApiError(412, "generation mismatch")
            return cur.data


class FakeGCSBlobHandle:
    """What ``bucket.blob(key)`` returns: a write/delete handle."""

    def __init__(self, client: "FakeGCSClient", name: str) -> None:
        self._client = client
        self.name = name

    def upload_from_string(
        self, payload: bytes | str, if_generation_match: int | None = None
    ) -> None:
        data = payload.encode() if isinstance(payload, str) else payload
        c = self._client
        with c._lock:
            cur = c._store.get(self.name)
            live_gen = cur.generation if cur is not None else 0
            if if_generation_match is not None and live_gen != if_generation_match:
                raise FakeApiError(412, "generation mismatch")
            c._gen_counter += 1
            c._store[self.name] = _GcsObject(data, c._gen_counter)

    def exists(self) -> bool:
        with self._client._lock:
            return self.name in self._client._store

    def delete(self) -> None:
        with self._client._lock:
            if self.name not in self._client._store:
                raise FakeApiError(404, self.name)
            del self._client._store[self.name]

    def download_as_bytes(
        self, start: int | None = None, end: int | None = None,
        if_generation_match: int | None = None,
    ) -> bytes:
        """Ranged read like the real SDK's ``Blob.download_as_bytes``:
        ``start``/``end`` are INCLUSIVE byte offsets (r12 — backs the
        kerchunk ranged-GET contract tests)."""
        with self._client._lock:
            cur = self._client._store.get(self.name)
            if cur is None:
                raise FakeApiError(404, self.name)
            if (
                if_generation_match is not None
                and cur.generation != if_generation_match
            ):
                raise FakeApiError(412, "generation mismatch")
            data = cur.data
            if start is None and end is None:
                return data
            s = int(start or 0)
            if end is None:
                return data[s:]
            return data[s:int(end) + 1]


class FakeGCSBucket:
    def __init__(self, client: "FakeGCSClient", name: str) -> None:
        self._client = client
        self.name = name

    def blob(self, key: str) -> FakeGCSBlobHandle:
        return FakeGCSBlobHandle(self._client, key)

    def get_blob(self, key: str) -> FakeGCSBlobSnapshot | None:
        with self._client._lock:
            obj = self._client._store.get(key)
            if obj is None:
                return None
            return FakeGCSBlobSnapshot(self._client, key, obj)


class _GcsListing:
    def __init__(self, blobs, prefixes) -> None:
        self._blobs = blobs
        self.prefixes = prefixes

    def __iter__(self):
        return iter(self._blobs)


class FakeGCSClient:
    def __init__(self) -> None:
        self._store: dict[str, _GcsObject] = {}
        self._gen_counter = 0
        self._lock = threading.RLock()

    def bucket(self, name: str) -> FakeGCSBucket:
        return FakeGCSBucket(self, name)

    def list_blobs(
        self, bucket, prefix: str = "", delimiter: str | None = None,
        max_results: int | None = None,
    ) -> _GcsListing:
        with self._lock:
            blobs, prefixes = [], set()
            for key in sorted(self._store):
                if not key.startswith(prefix):
                    continue
                rest = key[len(prefix):]
                if delimiter and delimiter in rest:
                    prefixes.add(prefix + rest.split(delimiter, 1)[0] + delimiter)
                    continue
                blobs.append(
                    FakeGCSBlobSnapshot(self, key, self._store[key])
                )
                if max_results is not None and len(blobs) >= max_results:
                    break
            return _GcsListing(blobs, prefixes)

    def _age(self, key: str, seconds: float) -> None:
        """Test helper: back-date an object's updated time."""
        with self._lock:
            self._store[key].updated -= timedelta(seconds=seconds)


# -------------------------------------------------------------- Azure


class _AzureBlob:
    __slots__ = ("data", "etag", "last_modified")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.etag = f'"{uuid.uuid4().hex}"'
        self.last_modified = _now()


class _AzureProps:
    def __init__(self, name: str, blob: _AzureBlob) -> None:
        self.name = name
        self.etag = blob.etag
        self.last_modified = blob.last_modified


class _AzureDownloader:
    def __init__(self, props: _AzureProps, data: bytes) -> None:
        self.properties = props
        self._data = data

    def readall(self) -> bytes:
        return self._data


class _AzureBlobClient:
    def __init__(self, container: "FakeAzureContainerClient",
                 name: str) -> None:
        self._c = container
        self._name = name

    def exists(self) -> bool:
        with self._c._lock:
            return self._name in self._c._store

    def get_blob_properties(self) -> _AzureProps:
        with self._c._lock:
            blob = self._c._store.get(self._name)
            if blob is None:
                raise FakeApiError(404, self._name)
            return _AzureProps(self._name, blob)


class _AzurePrefixItem:
    """walk_blobs' BlobPrefix stand-in: just a name with trailing /."""

    def __init__(self, name: str) -> None:
        self.name = name


class FakeAzureContainerClient:
    def __init__(self) -> None:
        self._store: dict[str, _AzureBlob] = {}
        self._lock = threading.RLock()

    def upload_blob(
        self, name: str, data: bytes | str, overwrite: bool = False,
        etag: str | None = None, match_condition=None,
    ) -> None:
        payload = data.encode() if isinstance(data, str) else data
        with self._lock:
            cur = self._store.get(name)
            if not overwrite and cur is not None:
                raise FakeApiError(409, "BlobAlreadyExists")
            if etag is not None:
                if cur is None or cur.etag != etag:
                    raise FakeApiError(412, "ConditionNotMet")
            self._store[name] = _AzureBlob(payload)

    def download_blob(
        self, name: str, offset: int | None = None,
        length: int | None = None,
    ) -> _AzureDownloader:
        """Ranged read like the real SDK's ``download_blob(blob,
        offset=, length=)`` (r12 — backs the kerchunk ranged-GET
        contract tests).  Like the real SDK, ``length`` without
        ``offset`` is an error."""
        if length is not None and offset is None:
            raise ValueError("offset must be provided when length is set")
        with self._lock:
            blob = self._store.get(name)
            if blob is None:
                raise FakeApiError(404, name)
            data = blob.data
            if offset is not None:
                data = (
                    data[offset:]
                    if length is None
                    else data[offset:offset + length]
                )
            return _AzureDownloader(_AzureProps(name, blob), data)

    def get_blob_client(self, name: str) -> _AzureBlobClient:
        return _AzureBlobClient(self, name)

    def delete_blob(self, name: str) -> None:
        with self._lock:
            if name not in self._store:
                raise FakeApiError(404, name)
            del self._store[name]

    def list_blobs(self, name_starts_with: str = ""):
        with self._lock:
            return [
                _AzureProps(k, v)
                for k, v in sorted(self._store.items())
                if k.startswith(name_starts_with)
            ]

    def walk_blobs(self, name_starts_with: str = "", delimiter: str = "/"):
        with self._lock:
            out, seen = [], set()
            for key in sorted(self._store):
                if not key.startswith(name_starts_with):
                    continue
                rest = key[len(name_starts_with):]
                if delimiter in rest:
                    p = name_starts_with + rest.split(delimiter, 1)[0] + delimiter
                    if p not in seen:
                        seen.add(p)
                        out.append(_AzurePrefixItem(p))
                else:
                    out.append(_AzureProps(key, self._store[key]))
            return out

    def _age(self, key: str, seconds: float) -> None:
        """Test helper: back-date a blob's last_modified."""
        with self._lock:
            self._store[key].last_modified -= timedelta(seconds=seconds)
