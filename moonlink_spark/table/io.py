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

    # binary variants (parquet manifests, index blobs). Default adapters keep
    # pre-existing accessor subclasses working: text stores round-trip bytes
    # via latin-1 (a lossless 1:1 byte<->codepoint mapping).
    def read_bytes(self, path: str) -> bytes:
        return self.read_text(path).encode("latin-1")

    def write_atomic_bytes(self, path: str, data: bytes) -> None:
        self.write_atomic(path, data.decode("latin-1"))

    @abstractmethod
    def create_exclusive(self, path: str, data: str) -> None:
        """Atomically create ``path`` iff absent; raise CasConflict else."""

    def cas_capability(self) -> str:
        """How strong this accessor's ``create_exclusive`` is:

        - ``"atomic"`` — a true compare-and-set (O_EXCL, conditional PUT,
          rename-without-overwrite): concurrent writers are safe.
        - ``"check-then-put"`` — exists-check followed by a write, with a
          race window: multi-writer use REQUIRES external coordination
          (single-writer-per-table discipline). Accessors in this mode
          warn loudly on first use; the commit contract tests parametrize
          over this probe (tests/test_concurrency.py).

        This is the engine's face of the per-backend CAS seam moonlink
        plugs catalogs into (file_catalog.rs:694-778: S3 If-None-Match /
        GCS if-generation-match conditional PUT)."""
        return "atomic"

    @abstractmethod
    def list(self, prefix: str, suffix: str = "") -> list[str]:
        """All object paths under ``prefix`` (recursive), sorted."""

    @abstractmethod
    def delete(self, path: str) -> None:
        """Remove; missing objects are a no-op (idempotent GC)."""

    @abstractmethod
    def exists(self, path: str) -> bool: ...

    @abstractmethod
    def mtime(self, path: str) -> float | None:
        """Last-modified epoch seconds, or None if unknown/missing — the
        grace-period input for orphan GC (operators/orphans.py)."""

    @abstractmethod
    def mkdirs(self, path: str) -> None:
        """Ensure a directory prefix exists (no-op on object stores)."""

    def delete_prefix(self, prefix: str) -> None:
        """Remove every object under ``prefix`` and the prefix itself
        (directory tree on fs; key-prefix sweep on object stores)."""
        for p in self.list(prefix):
            self.delete(p)


class LocalFSAccessor(StorageAccessor):
    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def write_atomic(self, path: str, data: str) -> None:
        tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as f:
            f.write(data)
        os.rename(tmp, path)

    def write_atomic_bytes(self, path: str, data: bytes) -> None:
        tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "wb") as f:
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
        # os.walk, not glob: a table path containing glob metacharacters
        # ([, ?, *) must list literally, never silently match nothing
        hits = []
        for root, _dirs, files in os.walk(prefix):
            for fn in files:
                if fn.endswith(suffix):
                    hits.append(os.path.join(root, fn))
        return sorted(hits)

    def delete(self, path: str) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def delete_prefix(self, prefix: str) -> None:
        import shutil

        shutil.rmtree(prefix, ignore_errors=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def mtime(self, path: str) -> float | None:
        try:
            return os.path.getmtime(path)
        except OSError:
            return None

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)


class InMemoryObjectStore(StorageAccessor):
    """Object-store-semantics mock (flat key space, conditional PUT, atomic
    overwrite, prefix listing). One shared store per authority, like a
    bucket: mem://bucket-a/... and a second accessor for the same bucket see
    the same objects — this is what the CAS contract tests race against."""

    _stores: dict[str, dict[str, str]] = {}
    _lock = threading.Lock()

    _mtimes: dict[str, dict[str, float]] = {}

    def __init__(self, authority: str):
        with InMemoryObjectStore._lock:
            self._objects = InMemoryObjectStore._stores.setdefault(authority, {})
            self._times = InMemoryObjectStore._mtimes.setdefault(authority, {})

    def read_text(self, path: str) -> str:
        try:
            data = self._objects[path]
        except KeyError as e:
            raise FileNotFoundError(path) from e
        return data.decode() if isinstance(data, bytes) else data

    def read_bytes(self, path: str) -> bytes:
        try:
            data = self._objects[path]
        except KeyError as e:
            raise FileNotFoundError(path) from e
        return data if isinstance(data, bytes) else data.encode()

    def write_atomic(self, path: str, data: str) -> None:
        import time

        with InMemoryObjectStore._lock:
            self._objects[path] = data
            self._times[path] = time.time()

    def write_atomic_bytes(self, path: str, data: bytes) -> None:
        self.write_atomic(path, data)  # values may be str or bytes

    def create_exclusive(self, path: str, data: str) -> None:
        import time

        with InMemoryObjectStore._lock:
            if path in self._objects:
                raise CasConflict(path)
            self._objects[path] = data
            self._times[path] = time.time()

    def list(self, prefix: str, suffix: str = "") -> list[str]:
        p = prefix.rstrip("/") + "/"
        with InMemoryObjectStore._lock:
            keys = list(self._objects)
        return sorted(k for k in keys if k.startswith(p) and k.endswith(suffix))

    def delete(self, path: str) -> None:
        with InMemoryObjectStore._lock:
            self._objects.pop(path, None)
            self._times.pop(path, None)

    def exists(self, path: str) -> bool:
        with InMemoryObjectStore._lock:
            return path in self._objects

    def mtime(self, path: str) -> float | None:
        with InMemoryObjectStore._lock:
            return self._times.get(path)

    def mkdirs(self, path: str) -> None:
        pass  # object stores have no directories


class PyArrowFSAccessor(StorageAccessor):
    """Metadata IO for real storage schemes via ``pyarrow.fs`` — the same
    library the data plane already uses for footers (table/stats.py). One
    class covers ``s3://``, ``gs://``, ``hdfs://`` and ``file://`` because
    pyarrow's FileSystem.from_uri resolves them all; every method accepts
    and returns full URIs so callers never see the scheme split.

    Semantics per operation (mirroring moonlink's per-backend accessors,
    reference: src/moonlink/src/storage/filesystem/accessor/filesystem_accessor.rs,
    storage_config.rs:15-43):

    - ``write_atomic``: temp + move on filesystems with atomic rename
      (local, HDFS); on object stores a single PUT is atomic by contract,
      so it writes directly — no rename needed or wanted (S3 "rename" is
      copy+delete, i.e. worse).
    - ``create_exclusive``: exists-check then write. pyarrow does not expose
      conditional PUT (S3 ``If-None-Match:*``, GCS
      ``x-goog-if-generation-match:0``), so on object stores this check is
      NOT atomic — the true CAS remains the documented per-store seam
      (exactly where moonlink plugs per-backend catalogs,
      file_catalog.rs:694-778). The engine's single-writer-per-table driver
      discipline (SURVEY §4) is the first line of defense; local and HDFS
      mounts get a real atomicity window of ~0.
    """

    #: pyarrow type_names whose move() is an atomic rename
    _ATOMIC_MOVE = {"local", "hdfs", "viewfs"}

    def __init__(self, uri: str):
        from pyarrow import fs as pafs

        self._fs, inner = pafs.FileSystem.from_uri(uri)
        # scheme prefix to reconstruct full URIs from inner paths:
        # file:///tmp/x -> ("file://", "/tmp/x"); s3://b/k -> ("s3://", "b/k")
        self._prefix = uri[: len(uri) - len(inner)] if inner and uri.endswith(inner) else uri.split("://", 1)[0] + "://"

    def _inner(self, path: str) -> str:
        return path[len(self._prefix):] if path.startswith(self._prefix) else path

    def read_text(self, path: str) -> str:
        return self.read_bytes(path).decode()

    def read_bytes(self, path: str) -> bytes:
        with self._fs.open_input_stream(self._inner(path)) as f:
            return f.read()

    def write_atomic(self, path: str, data: str) -> None:
        self.write_atomic_bytes(path, data.encode())

    def write_atomic_bytes(self, path: str, data: bytes) -> None:
        inner = self._inner(path)
        if self._fs.type_name in self._ATOMIC_MOVE:
            tmp = f"{inner}.{uuid.uuid4().hex[:8]}.tmp"
            with self._fs.open_output_stream(tmp) as f:
                f.write(data)
            self._fs.move(tmp, inner)
        else:  # object store: one PUT, atomic by contract
            with self._fs.open_output_stream(inner) as f:
                f.write(data)

    _warned_nonatomic = False

    def cas_capability(self) -> str:
        # local: O_EXCL below is a true CAS. hdfs/viewfs: tmp + rename and
        # HDFS rename does not overwrite. Object stores through pyarrow:
        # no conditional-PUT surface (S3 If-None-Match / GCS
        # if-generation-match are the per-store seam, reference
        # file_catalog.rs:694-778) — check-then-put with a race window.
        if self._fs.type_name == "local" or self._fs.type_name in self._ATOMIC_MOVE:
            return "atomic"
        return "check-then-put"

    def create_exclusive(self, path: str, data: str) -> None:
        inner = self._inner(path)
        if self._fs.type_name == "local":
            # genuine O_CREAT|O_EXCL on the underlying path — previously
            # even file:// URIs through this accessor were check-then-put
            try:
                fd = os.open(inner, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError as e:
                raise CasConflict(path) from e
            with os.fdopen(fd, "w") as f:
                f.write(data)
            return
        if self.cas_capability() != "atomic" and not PyArrowFSAccessor._warned_nonatomic:
            PyArrowFSAccessor._warned_nonatomic = True
            import logging

            logging.getLogger(__name__).warning(
                "%s store exposes no conditional PUT through pyarrow.fs: "
                "metadata CAS falls back to check-then-put (SINGLE-WRITER "
                "mode — concurrent commits from separate processes can "
                "race). Use a store-native conditional-PUT catalog for "
                "multi-writer deployments.",
                self._fs.type_name,
            )
        if self.exists(path):
            raise CasConflict(path)
        if self._fs.type_name in self._ATOMIC_MOVE:
            # rename refuses to overwrite on HDFS-like stores → exclusive
            tmp = f"{inner}.{uuid.uuid4().hex[:8]}.tmp"
            with self._fs.open_output_stream(tmp) as f:
                f.write(data.encode())
            self._fs.move(tmp, inner)
        else:
            self.write_atomic(path, data)

    def list(self, prefix: str, suffix: str = "") -> list[str]:
        from pyarrow import fs as pafs

        try:
            infos = self._fs.get_file_info(
                pafs.FileSelector(self._inner(prefix), recursive=True)
            )
        except (FileNotFoundError, OSError):
            return []
        return sorted(
            self._prefix + i.path
            for i in infos
            if i.type == pafs.FileType.File and i.path.endswith(suffix)
        )

    def delete(self, path: str) -> None:
        try:
            self._fs.delete_file(self._inner(path))
        except (FileNotFoundError, OSError):
            pass

    def delete_prefix(self, prefix: str) -> None:
        try:
            self._fs.delete_dir(self._inner(prefix))
        except (FileNotFoundError, OSError):
            for p in self.list(prefix):
                self.delete(p)

    def exists(self, path: str) -> bool:
        from pyarrow import fs as pafs

        return self._fs.get_file_info(self._inner(path)).type != pafs.FileType.NotFound

    def mtime(self, path: str) -> float | None:
        from pyarrow import fs as pafs

        info = self._fs.get_file_info(self._inner(path))
        if info.type == pafs.FileType.NotFound or info.mtime is None:
            return None
        return info.mtime.timestamp()

    def mkdirs(self, path: str) -> None:
        self._fs.create_dir(self._inner(path), recursive=True)


class TransientIOError(OSError):
    """Injected/transient storage failure (the retryable class)."""


class RetryAccessor(StorageAccessor):
    """Retries transient failures with exponential backoff — moonlink wraps
    every filesystem accessor the same way (reference:
    src/moonlink/src/storage/filesystem/accessor_config.rs — RetryConfig
    around the base accessor, ChaosConfig under test).

    ``CasConflict`` is NEVER retried: it is a protocol outcome, not a
    failure. Note the object-store ambiguity this implies: if a
    ``create_exclusive`` attempt fails transiently AFTER the object landed,
    the retry sees CasConflict against our own write. The commit layer is
    safe against this — the caller re-reads table state and the engine's
    LSN idempotence turns the re-apply into a no-op (merge_cdc_batch skips
    batches whose LSN is already persisted)."""

    def __init__(
        self,
        inner: StorageAccessor,
        attempts: int = 4,
        base_delay_s: float = 0.02,
        retryable: tuple = (TransientIOError, TimeoutError),
    ):
        self.inner = inner
        self.attempts = attempts
        self.base_delay_s = base_delay_s
        self.retryable = retryable

    def cas_capability(self):
        return self.inner.cas_capability()

    def _call(self, fn, *args):
        import time as _time

        last = None
        for i in range(self.attempts):
            try:
                return fn(*args)
            except CasConflict:
                raise
            except self.retryable as e:
                last = e
                _time.sleep(self.base_delay_s * (2**i))
        raise last

    def read_text(self, path):
        return self._call(self.inner.read_text, path)

    def read_bytes(self, path):
        return self._call(self.inner.read_bytes, path)

    def write_atomic(self, path, data):
        return self._call(self.inner.write_atomic, path, data)

    def write_atomic_bytes(self, path, data):
        return self._call(self.inner.write_atomic_bytes, path, data)

    def create_exclusive(self, path, data):
        return self._call(self.inner.create_exclusive, path, data)

    def list(self, prefix, suffix=""):
        return self._call(self.inner.list, prefix, suffix)

    def delete(self, path):
        return self._call(self.inner.delete, path)

    def delete_prefix(self, prefix):
        return self._call(self.inner.delete_prefix, prefix)

    def exists(self, path):
        return self._call(self.inner.exists, path)

    def mtime(self, path):
        return self._call(self.inner.mtime, path)

    def mkdirs(self, path):
        return self._call(self.inner.mkdirs, path)


class ChaosAccessor(StorageAccessor):
    """Seeded fault injection: each operation fails with ``error_rate``
    probability BEFORE reaching the inner store (deterministic per seed —
    replayable, like moonlink's chaos_generator). Compose as
    RetryAccessor(ChaosAccessor(real)) to test the retry path, or use bare
    to test failure surfacing."""

    def __init__(self, inner: StorageAccessor, seed: int = 0, error_rate: float = 0.2):
        import random

        self.inner = inner
        self.error_rate = error_rate
        self._rng = random.Random(seed)
        self.injected = 0

    def _maybe_fail(self, op: str, path: str):
        if self._rng.random() < self.error_rate:
            self.injected += 1
            raise TransientIOError(f"injected {op} failure: {path}")

    def read_text(self, path):
        self._maybe_fail("read", path)
        return self.inner.read_text(path)

    def read_bytes(self, path):
        self._maybe_fail("read", path)
        return self.inner.read_bytes(path)

    def write_atomic(self, path, data):
        self._maybe_fail("write", path)
        return self.inner.write_atomic(path, data)

    def write_atomic_bytes(self, path, data):
        self._maybe_fail("write", path)
        return self.inner.write_atomic_bytes(path, data)

    def create_exclusive(self, path, data):
        self._maybe_fail("create", path)
        return self.inner.create_exclusive(path, data)

    def cas_capability(self):
        return self.inner.cas_capability()

    def list(self, prefix, suffix=""):
        self._maybe_fail("list", prefix)
        return self.inner.list(prefix, suffix)

    def delete(self, path):
        self._maybe_fail("delete", path)
        return self.inner.delete(path)

    def delete_prefix(self, prefix):
        self._maybe_fail("delete_prefix", prefix)
        return self.inner.delete_prefix(prefix)

    def exists(self, path):
        self._maybe_fail("exists", path)
        return self.inner.exists(path)

    def mtime(self, path):
        self._maybe_fail("mtime", path)
        return self.inner.mtime(path)

    def mkdirs(self, path):
        self._maybe_fail("mkdirs", path)
        return self.inner.mkdirs(path)


def accessor_for(path: str) -> StorageAccessor:
    """Route by scheme. mem://<authority>/... → shared in-memory store
    (tests, CAS-true); any real scheme URI (s3://, gs://, hdfs://, file://)
    → pyarrow.fs; plain paths → local fs (O_EXCL CAS, fastest)."""
    if path.startswith("mem://"):
        authority = path[len("mem://"):].split("/", 1)[0]
        return InMemoryObjectStore(authority)
    if "://" in path:
        return PyArrowFSAccessor(path)
    return LocalFSAccessor()
