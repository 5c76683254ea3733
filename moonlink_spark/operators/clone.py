"""Zero-copy table clone — fork a table's metadata, share its data files.

The lakehouse "shallow clone" (Delta SHALLOW CLONE / Iceberg
snapshot-register): a new independent table whose snapshots reference the
SOURCE's data files, deletion vectors and bloom sidecars by absolute path —
O(metadata) work, zero row bytes copied. Moonlink's analog is the
iceberg-sync'd table being re-registered against an existing file set
(reference: src/moonlink/src/storage/iceberg/iceberg_table_manager.rs:29-56 —
table state is fully reconstructable from metadata + immutable files).

Independence after the fork:
- commits on either table are invisible to the other (separate metadata
  roots, separate CAS lines);
- the clone's writes (MERGE inserts, compaction rewrites) land under the
  CLONE's own data root; shared source files are progressively shed as
  maintenance rewrites them;
- FULL history is forked — manifest and snapshot objects are re-persisted
  under the clone's metadata dir (tiny), so time-travel, changelog reads
  and rollback work on the clone even after the source expires or deletes
  its own metadata.

GC safety (the shallow-clone hazard): a clone's snapshot expiry or orphan
sweep must never delete SHARED files it references but does not own.
Ownership is by location: GC deletes only objects under the table's own
roots (``operators/expire.py`` guard; the orphan sweep only lists its own
directories by construction). The cost is that a shed shared file is GC'd
by nobody until the SOURCE stops referencing it — exactly Delta's
documented shallow-clone semantics.
"""

from __future__ import annotations

import os
import uuid

from moonlink_spark.table.catalog import Table, _abs_location, _write_metadata_cas
from moonlink_spark.table.format import (
    Snapshot,
    TableMetadata,
    read_manifest,
    write_manifest,
    write_snapshot,
)
from moonlink_spark.table.io import accessor_for

CLONE_SOURCE_PROP = "moonlink.clone-source"


def clone_table(
    src: Table, location: str, data_location: str | None = None
) -> Table:
    """Fork ``src`` (current metadata, full snapshot history) into a new
    independent table at ``location``. Returns the clone's Table handle.

    Data/delete/index objects are shared by reference; manifest and
    snapshot objects are re-persisted under the clone's metadata dir so the
    clone survives the source's metadata lifecycle. All table properties
    (identity keys, bucket layout, manifest format, flush LSN) carry over —
    the clone resumes exactly where the source's history ends.
    """
    src.refresh()
    md = src.md
    location = _abs_location(location)
    data_location = _abs_location(data_location) if data_location else None
    meta_dir = os.path.join(location, "metadata")
    accessor_for(location).mkdirs(meta_dir)
    data_root = data_location or location
    dacc = accessor_for(data_root)
    for sub in ("data", "deletes"):
        dacc.mkdirs(os.path.join(data_root, sub))

    fmt = md.properties.get("write.manifest-format")
    manifest_map: dict[str, str] = {}
    snapshots: list[Snapshot] = []
    for s in md.snapshots:
        new_manifests = []
        for m in s.manifests:
            if m not in manifest_map:
                entries = read_manifest(m)
                seq = entries[0].sequence_number if entries else s.sequence_number
                manifest_map[m] = write_manifest(meta_dir, seq, entries, fmt=fmt)
            new_manifests.append(manifest_map[m])
        ns = Snapshot(
            snapshot_id=s.snapshot_id,
            parent_id=s.parent_id,
            sequence_number=s.sequence_number,
            timestamp_ms=s.timestamp_ms,
            manifests=new_manifests,
            summary=dict(s.summary),
        )
        write_snapshot(meta_dir, ns)
        snapshots.append(ns)

    props = dict(md.properties)
    props[CLONE_SOURCE_PROP] = f"{md.table_uuid}:{md.location}"
    new_md = TableMetadata(
        table_uuid=uuid.uuid4().hex,
        location=location,
        schema_json=md.schema_json,
        version=0,
        last_sequence_number=md.last_sequence_number,
        last_snapshot_id=md.last_snapshot_id,
        current_snapshot_id=md.current_snapshot_id,
        snapshots=snapshots,
        properties=props,
        data_location=data_location,
        refs=dict(md.refs),
    )
    _write_metadata_cas(new_md)
    return Table(new_md)
