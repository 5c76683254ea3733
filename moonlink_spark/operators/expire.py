"""Snapshot expiry + orphan file garbage collection.

Mirrors Iceberg expire_snapshots semantics with moonlink's guarantee that
retained snapshots stay byte-identical (the snapshot-isolation invariant of
src/moonlink/src/storage/iceberg/file_catalog.rs:694-778): expiry ONLY
removes snapshots from metadata and deletes files referenced by no retained
snapshot — it never rewrites live data.

Retention: keep the most recent ``retain_last`` snapshots (current snapshot
always kept); ``older_than_ms`` additionally protects any snapshot younger
than the cutoff (Iceberg's expire_snapshots(older_than) semantics — both
conditions must hold for a snapshot to expire). Orphan sweep covers data
files, delete files, manifests, and snapshot objects.
"""

from __future__ import annotations

from dataclasses import dataclass

from moonlink_spark.table.catalog import Table
from moonlink_spark.table.format import TableMetadata, read_manifest
from moonlink_spark.table.io import accessor_for


@dataclass
class ExpireResult:
    expired_snapshots: int
    deleted_data_files: int
    deleted_manifests: int
    skipped: bool = False
    deleted_metadata_versions: int = 0


# Iceberg's write.metadata.previous-versions-max analog: every commit writes
# a full v{N}.metadata.json root, so a table with 10^6 commits would hold
# 10^6 root files unless old versions are dropped after commit.
PREVIOUS_VERSIONS_MAX_PROP = "moonlink.metadata.previous-versions-max"
DEFAULT_PREVIOUS_VERSIONS_MAX = 20


def clean_metadata_versions(table: Table, keep_last: int | None = None) -> int:
    """Delete ``v{N}.metadata.json`` roots older than the newest
    ``keep_last`` versions. Readers never need them: the current version is
    resolved from ``version-hint.text`` (+ a forward probe) and time-travel
    reads come from the CURRENT metadata's retained snapshot list, never
    from old roots. Deletion walks BACKWARD from ``current - keep_last``
    and stops at the first already-missing version, so repeated cleanups
    cost O(new garbage), not O(history)."""
    from moonlink_spark.table.catalog import _metadata_path

    if keep_last is None:
        keep_last = int(
            table.md.properties.get(
                PREVIOUS_VERSIONS_MAX_PROP, DEFAULT_PREVIOUS_VERSIONS_MAX
            )
        )
    keep_last = max(2, keep_last)  # always keep a couple for crash forensics
    deleted = 0
    v = table.md.version - keep_last
    while v >= 0:
        path = _metadata_path(table.location, v)
        acc = accessor_for(path)
        if not acc.exists(path):
            break
        acc.delete(path)
        deleted += 1
        v -= 1
    return deleted


#: stats-file GC grace: a concurrent analyze_table writes its puffin
#: BEFORE the property CAS lands, so a no-grace sweep could delete the
#: file in that window and leave statistics.path dangling. Same role as
#: remove_orphan_files' grace-ms.
STATS_GRACE_MS = 10 * 60 * 1000


def clean_stale_stats(table: Table, grace_ms: int = STATS_GRACE_MS) -> int:
    """Delete ``stats-*.puffin`` statistics files not referenced by the
    current ``statistics.path`` property. analyze_table eagerly supersedes
    its predecessor, so garbage only exists after a crash between the
    puffin write and the property CAS (or between CAS and the eager
    delete) — this sweep is the backstop, run inside snapshot expiry like
    the metadata-version GC. Files younger than ``grace_ms`` are kept:
    they may belong to an analyze whose CAS has not landed yet."""
    import time as _time

    from moonlink_spark.operators.analyze import STATS_PATH_PROP

    table.refresh()
    current = table.md.properties.get(STATS_PATH_PROP)
    import os as _os

    acc = accessor_for(table.metadata_dir)
    cutoff = _time.time() - grace_ms / 1000.0
    deleted = 0
    for p in acc.list(table.metadata_dir, ".puffin"):
        if _os.path.basename(p).startswith("stats-") and p != current:
            mt = acc.mtime(p)
            if mt is not None and mt > cutoff:
                continue  # in-flight analyze — inside the grace window
            acc.delete(p)
            deleted += 1
    return deleted


def expire_snapshots(
    table: Table, retain_last: int = 2, older_than_ms: int | None = None
) -> ExpireResult:
    table.refresh()
    md = table.md
    if len(md.snapshots) <= retain_last:
        return ExpireResult(0, 0, 0, skipped=True)

    ordered = sorted(md.snapshots, key=lambda s: s.sequence_number)
    retained = list(ordered[-retain_last:])
    if older_than_ms is not None:
        # age guard: snapshots younger than the cutoff are never expired,
        # even beyond retain_last
        retained += [
            s for s in ordered[:-retain_last] if s.timestamp_ms >= older_than_ms
        ]
    # named refs are retention roots (Iceberg's expire-with-refs rule): a
    # tag protects its snapshot, a branch protects its head — each snapshot
    # is self-contained (full manifest list), so protecting the head alone
    # keeps branch/tag reads byte-identical. A ref past its max_ref_age_ms
    # is dropped FIRST, releasing its snapshot to normal retention.
    from moonlink_spark.table.format import now_ms

    live_refs: dict = {}
    for name, r in md.refs.items():
        age = r.get("max_ref_age_ms")
        born = r.get("created_at_ms")
        if age is not None and born is not None and now_ms() - born > int(age):
            continue
        live_refs[name] = r
    ref_ids = {int(r["snapshot_id"]) for r in live_refs.values()}
    seen = {s.snapshot_id for s in retained}
    retained += [s for s in ordered if s.snapshot_id in ref_ids and s.snapshot_id not in seen]
    retained_ids = {s.snapshot_id for s in retained}
    if len(retained_ids) == len(md.snapshots):
        return ExpireResult(0, 0, 0, skipped=True)
    retained = sorted(retained, key=lambda s: s.sequence_number)
    if md.current_snapshot_id not in retained_ids:
        raise AssertionError("current snapshot must be retained")
    expired = [s for s in md.snapshots if s.snapshot_id not in retained_ids]

    # a bloom sidecar (table/bloom.py) is referenced like a data file: kept
    # while ANY retained entry points at it, dropped with the last one
    from moonlink_spark.table.bloom import bloom_sidecar_path

    keep_manifests: set[str] = set()
    keep_files: set[str] = set()
    for s in retained:
        for m in s.manifests:
            keep_manifests.add(m)
            for e in read_manifest(m):
                keep_files.add(e.path)
                sp = bloom_sidecar_path(e)
                if sp:
                    keep_files.add(sp)

    drop_manifests: set[str] = set()
    drop_files: set[str] = set()
    for s in expired:
        for m in s.manifests:
            if m in keep_manifests:
                continue
            drop_manifests.add(m)
            for e in read_manifest(m):
                if e.path not in keep_files:
                    drop_files.add(e.path)
                sp = bloom_sidecar_path(e)
                if sp and sp not in keep_files:
                    drop_files.add(sp)

    # advance the changelog floor: commits at or below the highest expired
    # LSN can no longer be replayed incrementally (table/changelog.py) — the
    # WAL-truncation boundary of the reference (wal.rs:205-220)
    from moonlink_spark.table.changelog import MIN_CHANGELOG_LSN_PROP

    props = dict(md.properties)
    # only LINEAGE commits advance the floor: an expired UNDONE snapshot
    # (forked off by a rollback) can carry an LSN above the table's current
    # flush LSN, and advancing past that would wrongly invalidate every
    # future incremental read — undone commits never replay anyway
    ancestors = table.ancestor_ids()
    exp_lsns = [
        int(s.summary["lsn"])
        for s in expired
        if "lsn" in s.summary and s.snapshot_id in ancestors
    ]
    if exp_lsns:
        prev = int(props.get(MIN_CHANGELOG_LSN_PROP, 0))
        props[MIN_CHANGELOG_LSN_PROP] = str(max(prev, max(exp_lsns)))

    new_md = TableMetadata(
        table_uuid=md.table_uuid,
        location=md.location,
        schema_json=md.schema_json,
        version=md.version,  # bumped by replace_metadata
        last_sequence_number=md.last_sequence_number,
        last_snapshot_id=md.last_snapshot_id,
        current_snapshot_id=md.current_snapshot_id,
        snapshots=retained,
        properties=props,
        data_location=md.data_location,
        refs=live_refs,
    )
    table.replace_metadata(new_md)

    # physical GC strictly after the metadata commit — a crash between the
    # two leaves harmless orphans, never a broken retained snapshot.
    # OWNERSHIP GUARD: delete only objects under this table's own roots —
    # a shallow clone (operators/clone.py) references the source's files by
    # absolute path and must never GC them (Delta's shallow-clone rule);
    # likewise bulk-ingested foreign parquet stays untouched.
    own_roots = (table.data_root.rstrip("/") + "/", table.location.rstrip("/") + "/")
    drop_files = {p for p in drop_files if p.startswith(own_roots)}
    drop_manifests = {p for p in drop_manifests if p.startswith(own_roots)}
    drop_snaps = {s.file for s in expired if s.file and s.file.startswith(own_roots)}
    for p in drop_files | drop_manifests | drop_snaps:
        accessor_for(p).delete(p)
    n_md = clean_metadata_versions(table)
    clean_stale_stats(table)
    return ExpireResult(
        len(expired),
        len(drop_files),
        len(drop_manifests),
        deleted_metadata_versions=n_md,
    )
