"""On-disk table format: metadata, snapshots, manifests.

A from-scratch, Iceberg-v2-inspired layout (the sandbox has no Iceberg
runtime jar, so the metadata layer itself is part of the engine — it mirrors
what moonlink's ``FileCatalog`` writes,
reference: src/moonlink/src/storage/iceberg/file_catalog.rs:15-41):

    <root>/
      data/<commit-uuid>/*.parquet        data files (written by Spark)
      deletes/<commit-uuid>/*.parquet     positional delete files
                                          (columns: file_path string, pos long)
      metadata/
        v<N>.metadata.json                full table metadata (exclusive-create
                                          = CAS commit, like Iceberg Hadoop
                                          catalog / moonlink file_catalog.rs:694-778)
        version-hint.text                 current version pointer
        manifest-<seq>-<uuid>.json        manifest: list of file entries

Snapshot semantics (reference: src/moonlink/src/storage/mooncake_table.rs:152-179
"A snapshot maps directly to an iceberg snapshot"):
- every commit produces a new snapshot with a monotone ``sequence_number``
- snapshot ``summary`` carries the moonlink flush LSN
  (``moonlink.table-flush-lsn``, reference:
  src/moonlink/src/storage/iceberg/iceberg_table_manager.rs:29-32)
- a positional delete file applies to a data file iff that data file is
  referenced by the same snapshot AND the data file's sequence number is
  <= the delete file's sequence number (Iceberg v2 rule; compaction rewrites
  make old delete rows dangling — dropped at manifest rewrite).

Metadata is tiny (JSON lists of file entries + stats); all row-level work is
Spark-side. At 10^12-image scale manifests would be parquet and the manifest
*list* would be hierarchical — the entry structure below is designed so that
swap is mechanical (entries are flat dicts).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass, field

FORMAT_VERSION = 1
LSN_PROP = "moonlink.table-flush-lsn"

DATA = "data"
DELETES = "deletes"


@dataclass
class FileEntry:
    """One data or positional-delete file tracked by a manifest.

    ``stats`` maps column name -> {"min": v, "max": v, "nulls": n} for
    orderable scalar columns (reference stats fold:
    src/moonlink/src/storage/iceberg/parquet_stats_utils.rs:327-412).
    """

    content: str  # "data" | "deletes"
    path: str  # absolute path
    record_count: int
    file_size_bytes: int
    sequence_number: int
    stats: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        return asdict(self)

    @staticmethod
    def from_dict(d: dict) -> "FileEntry":
        return FileEntry(**d)


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    sequence_number: int
    timestamp_ms: int
    manifests: list[str]  # absolute manifest paths
    summary: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        return asdict(self)

    @staticmethod
    def from_dict(d: dict) -> "Snapshot":
        return Snapshot(**d)


@dataclass
class TableMetadata:
    table_uuid: str
    location: str
    schema_json: dict  # Spark StructType.jsonValue()
    version: int
    last_sequence_number: int
    last_snapshot_id: int
    current_snapshot_id: int | None
    snapshots: list[Snapshot]
    properties: dict = field(default_factory=dict)

    def snapshot_by_id(self, snapshot_id: int) -> Snapshot:
        for s in self.snapshots:
            if s.snapshot_id == snapshot_id:
                return s
        raise KeyError(f"snapshot {snapshot_id} not found (expired?)")

    def current_snapshot(self) -> Snapshot | None:
        if self.current_snapshot_id is None:
            return None
        return self.snapshot_by_id(self.current_snapshot_id)

    def to_dict(self) -> dict:
        d = asdict(self)
        d["format_version"] = FORMAT_VERSION
        return d

    @staticmethod
    def from_dict(d: dict) -> "TableMetadata":
        d = dict(d)
        d.pop("format_version", None)
        d["snapshots"] = [Snapshot.from_dict(s) for s in d["snapshots"]]
        return TableMetadata(**d)


# ---------------------------------------------------------------- manifest IO


def write_manifest(metadata_dir: str, sequence_number: int, entries: list[FileEntry]) -> str:
    path = os.path.join(
        metadata_dir, f"manifest-{sequence_number}-{uuid.uuid4().hex[:12]}.json"
    )
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"entries": [e.to_dict() for e in entries]}, f)
    os.rename(tmp, path)
    return path


def read_manifest(path: str) -> list[FileEntry]:
    with open(path) as f:
        d = json.load(f)
    return [FileEntry.from_dict(e) for e in d["entries"]]


def snapshot_entries(md: TableMetadata, snapshot: Snapshot) -> list[FileEntry]:
    out: list[FileEntry] = []
    for m in snapshot.manifests:
        out.extend(read_manifest(m))
    return out


def now_ms() -> int:
    return int(time.time() * 1000)
