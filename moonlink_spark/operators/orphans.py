"""Orphan file removal — GC objects referenced by NO retained snapshot.

A MERGE/compaction/clustering job that crashes AFTER writing data files but
BEFORE its CAS metadata commit leaks those files forever: snapshot expiry
only garbage-collects files that were referenced by now-expired snapshots
(operators/expire.py), so never-referenced objects are invisible to it.
Moonlink recovers the equivalent state via WAL replay + cache eviction
(reference: src/moonlink/src/storage/wal.rs:205-220 recovery,
src/moonlink/src/storage/cache/object_storage/object_storage_cache.rs
eviction deletes); the lakehouse-native analog is Iceberg's
``remove_orphan_files`` action, implemented here over the storage accessor.

Safety model (same crash-ordering discipline as expiry):

- the referenced set is computed from CURRENT metadata over **every**
  retained snapshot (not just the head), so time travel is never broken;
- a **grace period** on modification time protects in-flight jobs: a
  concurrent writer's files are younger than the cutoff and are skipped —
  by the time they age past it they are either committed (referenced) or
  genuinely orphaned;
- deletes are idempotent (missing object = no-op) and strictly follow the
  metadata read, so a crash mid-sweep leaves only fewer orphans.

Scale note: the sweep driver-lists the data prefixes. At the 10^9-file
design point the listing itself becomes a Spark job over an inventory
(object-store inventory manifests / `LIST` pagination fanned out per
prefix), anti-joined against the referenced set — the referenced set is
already available as a DataFrame via ``stats_dataframe``. The operator
boundary below (referenced-set ∖ listing, grace filter, accessor delete)
is unchanged by that swap.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from moonlink_spark.table.bloom import bloom_sidecar_path
from moonlink_spark.table.catalog import Table
from moonlink_spark.table.format import read_manifest
from moonlink_spark.table.io import accessor_for

DEFAULT_GRACE_MS = 3 * 3600 * 1000  # 3h — longer than any maintenance job


@dataclass
class OrphanResult:
    scanned: int
    referenced: int
    deleted: int
    skipped_young: int
    deleted_paths: list[str] = field(default_factory=list)
    dry_run: bool = False


def referenced_paths(table: Table) -> set[str]:
    """Every object any retained snapshot can reach: data/delete files plus
    their bloom sidecar index objects."""
    refs: set[str] = set()
    seen_manifests: set[str] = set()
    for snap in table.md.snapshots:
        for m in snap.manifests:
            if m in seen_manifests:
                continue
            seen_manifests.add(m)
            for e in read_manifest(m):
                refs.add(e.path)
                sp = bloom_sidecar_path(e)
                if sp:
                    refs.add(sp)
    return refs


def remove_orphan_files(
    table: Table,
    grace_ms: int = DEFAULT_GRACE_MS,
    dry_run: bool = False,
) -> OrphanResult:
    """Sweep ``data/`` and ``deletes/`` under the table's data root, deleting
    objects referenced by no retained snapshot and older than ``grace_ms``.

    Also collects Spark job litter that can never become table state:
    ``_temporary/`` task attempts of crashed jobs, ``_SUCCESS`` markers and
    ``.crc`` sidecars (manifest adoption excludes them by construction,
    table/writer.py:list_parquet).
    """
    table.refresh()
    refs = referenced_paths(table)
    cutoff = time.time() - grace_ms / 1000.0

    acc = accessor_for(table.data_root)
    scanned = 0
    young = 0
    victims: list[str] = []
    for sub in ("data", "deletes"):
        prefix = os.path.join(table.data_root, sub)
        for p in acc.list(prefix):
            scanned += 1
            if p in refs:
                continue
            mt = acc.mtime(p)
            if mt is None or mt >= cutoff:
                young += 1
                continue
            victims.append(p)

    if not dry_run:
        for p in victims:
            acc.delete(p)
    return OrphanResult(
        scanned=scanned,
        referenced=len(refs),
        deleted=len(victims),
        skipped_young=young,
        deleted_paths=sorted(victims),
        dry_run=dry_run,
    )
