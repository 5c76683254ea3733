"""Storage accessors — every metadata/table-layer IO goes through one.

Mirrors moonlink's filesystem accessor abstraction
(reference: src/moonlink/src/storage/filesystem/storage_config.rs:15-43 —
fs / S3 / GCS variants behind one trait;
accessor/filesystem_accessor.rs — operation surface). The Spark-first split:

- ROW data (parquet) is read/written by Spark itself and by pyarrow, both of
  which speak object-store URIs natively on a real cluster (s3a:// via the
  Hadoop connector, s3:// via pyarrow.fs). The engine never streams row data
  through Python.
- METADATA (table metadata json, manifests, version hint, checkpoints) and
  file-level operations (listing a commit directory, deleting expired files)
  go through the accessor below, so the commit protocol's primitives are
  explicit and swappable:

    * ``create_exclusive`` — the CAS primitive. Local fs: O_CREAT|O_EXCL.
      Object stores: conditional PUT (S3 If-None-Match:*, GCS
      x-goog-if-generation-match:0). The in-memory store implements the
      object-store semantics and is what tests exercise.
    * ``write_atomic`` — temp + rename on fs; single PUT on object stores
      (PUTs are atomic by contract, no rename needed).

Scheme routing: ``mem://`` → shared in-memory object store (tests),
anything else → local fs. An S3 accessor would plug in via boto3 with the
same surface; the sandbox has no boto3, so the seam is the mem:// store.
"""

from __future__ import annotations

import glob as _glob
import os
import threading
import uuid
from abc import ABC, abstractmethod


class CasConflict(Exception):
    """create_exclusive lost the race — the object already exists."""


class StorageAccessor(ABC):
    @abstractmethod
    def read_text(self, path: str) -> str: ...

    @abstractmethod
    def write_atomic(self, path: str, data: str) -> None:
        """Readers see the old object or the new one, never a torn write."""

    @abstractmethod
    def create_exclusive(self, path: str, data: str) -> None:
        """Atomically create ``path`` iff absent; raise CasConflict else."""

    @abstractmethod
    def list(self, prefix: str, suffix: str = "") -> list[str]:
        """All object paths under ``prefix`` (recursive), sorted."""

    @abstractmethod
    def delete(self, path: str) -> None:
        """Remove; missing objects are a no-op (idempotent GC)."""

    @abstractmethod
    def exists(self, path: str) -> bool: ...

    @abstractmethod
    def mkdirs(self, path: str) -> None:
        """Ensure a directory prefix exists (no-op on object stores)."""


class LocalFSAccessor(StorageAccessor):
    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_atomic(self, path: str, data: str) -> None:
        tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as f:
            f.write(data)
        os.rename(tmp, path)

    def create_exclusive(self, path: str, data: str) -> None:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as e:
            raise CasConflict(path) from e
        with os.fdopen(fd, "w") as f:
            f.write(data)

    def list(self, prefix: str, suffix: str = "") -> list[str]:
        hits = _glob.glob(os.path.join(prefix, "**", f"*{suffix}"), recursive=True)
        return sorted(p for p in hits if os.path.isfile(p))

    def delete(self, path: str) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)


class InMemoryObjectStore(StorageAccessor):
    """Object-store-semantics mock (flat key space, conditional PUT, atomic
    overwrite, prefix listing). One shared store per authority, like a
    bucket: mem://bucket-a/... and a second accessor for the same bucket see
    the same objects — this is what the CAS contract tests race against."""

    _stores: dict[str, dict[str, str]] = {}
    _lock = threading.Lock()

    def __init__(self, authority: str):
        with InMemoryObjectStore._lock:
            self._objects = InMemoryObjectStore._stores.setdefault(authority, {})

    def read_text(self, path: str) -> str:
        try:
            return self._objects[path]
        except KeyError as e:
            raise FileNotFoundError(path) from e

    def write_atomic(self, path: str, data: str) -> None:
        with InMemoryObjectStore._lock:
            self._objects[path] = data

    def create_exclusive(self, path: str, data: str) -> None:
        with InMemoryObjectStore._lock:
            if path in self._objects:
                raise CasConflict(path)
            self._objects[path] = data

    def list(self, prefix: str, suffix: str = "") -> list[str]:
        p = prefix.rstrip("/") + "/"
        return sorted(
            k for k in self._objects if k.startswith(p) and k.endswith(suffix)
        )

    def delete(self, path: str) -> None:
        with InMemoryObjectStore._lock:
            self._objects.pop(path, None)

    def exists(self, path: str) -> bool:
        return path in self._objects

    def mkdirs(self, path: str) -> None:
        pass  # object stores have no directories


def accessor_for(path: str) -> StorageAccessor:
    """Route by scheme. mem://<authority>/... → shared in-memory store;
    plain paths and file:// → local fs."""
    if path.startswith("mem://"):
        authority = path[len("mem://"):].split("/", 1)[0]
        return InMemoryObjectStore(authority)
    return LocalFSAccessor()
