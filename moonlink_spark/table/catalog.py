"""Table handle + optimistic catalog commits.

Commit protocol mirrors moonlink's file catalog CAS
(reference: src/moonlink/src/storage/iceberg/file_catalog.rs:694-778 — write
``v{N}.metadata.json`` then conditional-PUT ``version-hint.text``): the
exclusive-create of ``v{N+1}.metadata.json`` is the compare-and-swap —
O_CREAT|O_EXCL on local fs, conditional PUT on object stores, via the
storage accessor (table/io.py); ``version-hint.text`` is a convenience
pointer rewritten after. Writers are serialized per table by the engine
driver (moonlink's single-writer event loop, reference:
src/moonlink/src/table_handler.rs:374-411) with the CAS as the backstop.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.types import StructType

from moonlink_spark.table.format import (
    DATA,
    DELETES,
    LSN_PROP,
    MANIFEST_FORMAT_PROP,
    FileEntry,
    Snapshot,
    TableMetadata,
    now_ms,
    read_manifest,
    write_manifest,
    write_snapshot,
)
from moonlink_spark.table.io import CasConflict, accessor_for

LAST_FIELD_ID_PROP = "moonlink.last-field-id"


class CommitConflict(Exception):
    """Another writer committed the same version first."""


class ValidationConflict(Exception):
    """A concurrent commit invalidated this commit's inputs; the OPERATOR
    must re-run against the refreshed table — blind re-commit would corrupt
    (Iceberg's ValidationException)."""


class Table:
    def __init__(self, md: TableMetadata, branch: str | None = None):
        self.md = md
        # a non-None branch makes this handle a WRITABLE VIEW of a named
        # branch ref (table/refs.py): reads resolve the branch head instead
        # of the current snapshot, and commits advance the ref, never the
        # main pointer — Iceberg's branch semantics, giving write-audit-
        # publish isolation on one table.
        self.branch = branch

    # ------------------------------------------------------------ accessors
    @property
    def location(self) -> str:
        return self.md.location

    @property
    def metadata_dir(self) -> str:
        return os.path.join(self.md.location, "metadata")

    @property
    def data_root(self) -> str:
        """Root for row data (parquet). Defaults to the table location;
        split from it when metadata lives on an object store whose URIs
        Spark cannot read directly (the mem:// test store; moonlink keeps
        the same split between its catalog filesystem and data filesystem,
        reference: src/moonlink/src/storage/filesystem/storage_config.rs:15-43)."""
        return self.md.data_location or self.md.location

    @property
    def schema(self) -> StructType:
        return StructType.fromJson(self.md.schema_json)

    @property
    def flush_lsn(self) -> int | None:
        if self.branch is not None:
            head = self.head_snapshot()
            v = head.summary.get("lsn") if head else None
        else:
            v = self.md.properties.get(LSN_PROP)
        return int(v) if v is not None else None

    def refresh(self) -> "Table":
        self.md = _read_current_metadata(self.md.location)
        return self

    def head_snapshot(self, snapshot_id: int | None = None) -> Snapshot | None:
        """The snapshot reads/commits are based on: an explicit id, the
        branch head (branch handles), or the current snapshot."""
        if snapshot_id is not None:
            return self.md.snapshot_by_id(snapshot_id)
        if self.branch is not None:
            ref = self.md.refs.get(self.branch)
            if ref is None:
                raise KeyError(f"ref {self.branch!r} not found (dropped?)")
            if ref.get("type") != "branch":
                raise ValueError(f"ref {self.branch!r} is a tag; tags are read-only")
            return self.md.snapshot_by_id(ref["snapshot_id"])
        return self.md.current_snapshot()

    def for_branch(self, name: str) -> "Table":
        """A writable view of branch ``name`` (shares nothing mutable; each
        handle refreshes metadata independently)."""
        t = Table(self.md, branch=name)
        t.head_snapshot()  # validate now: exists and is a branch
        return t

    def entries(self, snapshot_id: int | None = None, content: str | None = None) -> list[FileEntry]:
        snap = self.head_snapshot(snapshot_id)
        if snap is None:
            return []
        out: list[FileEntry] = []
        for m in snap.manifests:
            for e in read_manifest(m):
                if content is None or e.content == content:
                    out.append(e)
        return out

    def data_entries(self, snapshot_id: int | None = None) -> list[FileEntry]:
        return self.entries(snapshot_id, DATA)

    def delete_entries(self, snapshot_id: int | None = None) -> list[FileEntry]:
        return self.entries(snapshot_id, DELETES)

    def snapshot_at_lsn(self, lsn: int) -> Snapshot:
        """Latest snapshot whose commit LSN <= lsn — 'read at LSN X sees all
        commits <= X' (reference: src/moonlink/src/storage/mooncake_table.rs:407-412)."""
        best = None
        for s in self.md.snapshots:
            s_lsn = s.summary.get("lsn")
            if s_lsn is not None and int(s_lsn) <= lsn:
                if best is None or s.sequence_number > best.sequence_number:
                    best = s
        if best is None:
            raise KeyError(f"no snapshot at lsn<={lsn}")
        return best

    # -------------------------------------------------------------- commits
    def commit(
        self,
        operation: str,
        added: list[FileEntry] | None = None,
        removed_paths: set[str] | None = None,
        lsn: int | None = None,
        summary_extra: dict | None = None,
        properties: dict | None = None,
        schema: StructType | None = None,
        manifests_override: list[list[FileEntry]] | None = None,
    ) -> Snapshot:
        """Create snapshot N+1 = parent snapshot ± (added, removed).

        - ``added`` entries get ``sequence_number`` = new sequence.
        - ``removed_paths``: manifests containing any removed file are
          rewritten without those entries (moonlink's manifest rewrite for
          removals, reference:
          src/moonlink/src/storage/iceberg/puffin_writer_proxy.rs:252-352).
        - LSN monotonicity is asserted like
          src/moonlink/src/storage/mooncake_table.rs:1223-1228.
        """
        md = self.md
        added = added or []
        removed_paths = removed_paths or set()
        seq = md.last_sequence_number + 1
        snap_id = md.last_snapshot_id + 1
        # branch handles commit on top of the BRANCH head; the main pointer
        # (and the table flush LSN) move only at publish (refs.fast_forward)
        parent = self.head_snapshot()

        if lsn is not None and self.flush_lsn is not None and lsn < self.flush_lsn:
            raise ValueError(
                f"LSN must be monotone: commit lsn={lsn} < table lsn={self.flush_lsn}"
            )

        fmt = md.properties.get(MANIFEST_FORMAT_PROP)
        manifests: list[str] = []
        if manifests_override is not None:
            # manifest rewrite: regroup entries, PRESERVING their original
            # sequence numbers (logical content must stay byte-identical)
            for group in manifests_override:
                if group:
                    manifests.append(
                        write_manifest(self.metadata_dir, seq, group, fmt=fmt)
                    )
        elif parent is not None and not removed_paths:
            # append-only commit (MERGE, flush): parent manifests are reused
            # BY REFERENCE — no manifest is read or rewritten; commit cost is
            # O(added files), not O(table)
            manifests = list(parent.manifests)
        elif parent is not None:
            for m in parent.manifests:
                entries = read_manifest(m)
                if any(e.path in removed_paths for e in entries):
                    kept = [e for e in entries if e.path not in removed_paths]
                    if kept:
                        manifests.append(
                            write_manifest(self.metadata_dir, seq, kept, fmt=fmt)
                        )
                else:
                    manifests.append(m)
        for e in added:
            e.sequence_number = seq
        if added:
            manifests.append(write_manifest(self.metadata_dir, seq, added, fmt=fmt))

        summary = {
            "operation": operation,
            "added-files": len(added),
            "removed-files": len(removed_paths),
        }
        if lsn is not None:
            summary["lsn"] = int(lsn)
        elif parent is not None and "lsn" in parent.summary:
            summary["lsn"] = parent.summary["lsn"]  # carry forward
        summary.update(summary_extra or {})

        snap = Snapshot(
            snapshot_id=snap_id,
            parent_id=parent.snapshot_id if parent else None,
            sequence_number=seq,
            timestamp_ms=now_ms(),
            manifests=manifests,
            summary=summary,
        )
        write_snapshot(self.metadata_dir, snap)
        props = dict(md.properties)
        refs = dict(md.refs)
        if self.branch is not None:
            # the commit LSN rides the snapshot summary; the table-level
            # flush LSN is main's and advances only when the branch publishes
            refs[self.branch] = {**refs[self.branch], "snapshot_id": snap_id}
        elif lsn is not None:
            props[LSN_PROP] = str(int(lsn))
        props.update(properties or {})

        new_md = TableMetadata(
            table_uuid=md.table_uuid,
            location=md.location,
            schema_json=(schema or self.schema).jsonValue(),
            version=md.version + 1,
            last_sequence_number=seq,
            last_snapshot_id=snap_id,
            current_snapshot_id=(
                md.current_snapshot_id if self.branch is not None else snap_id
            ),
            snapshots=md.snapshots + [snap],
            properties=props,
            data_location=md.data_location,
            refs=refs,
        )
        _write_metadata_cas(new_md)
        self.md = new_md
        return snap

    def commit_with_retry(
        self,
        operation: str,
        added: list[FileEntry] | None = None,
        removed_paths: set[str] | None = None,
        referenced_data_paths: set[str] | None = None,
        conflict_on_new_deletes: bool = False,
        conflict_on_operations: set[str] | None = None,
        attempts: int = 4,
        **kwargs,
    ) -> Snapshot:
        """Optimistic-concurrency commit: on losing the metadata CAS race,
        refresh to the winner's base, re-validate, and re-apply — Iceberg's
        SnapshotProducer retry loop. Moonlink serializes all writers per
        table inside its event loop (table_handler.rs:374-411); this is the
        multi-writer batch analog, so independent jobs (ingest + compaction,
        two appenders) can race the same table safely.

        Validation before each re-apply (serializable-isolation guards):

        - every path in ``removed_paths`` must still be live in the new
          base — else a concurrent replace already rewrote those files (two
          compactions of the same bin would double-delete);
        - every path in ``referenced_data_paths`` (data files a MERGE
          computed positional deletes against) must still be live — else
          concurrent compaction moved those rows to new positions and the
          staged DVs would silently fail to delete them (row resurrection);
        - with ``conflict_on_new_deletes`` (replace commits: compaction,
          clustering), no concurrent commit may have ADDED positional-delete
          files since this operator planned — a concurrent MERGE's DVs
          against the files being rewritten would dangle after the rewrite
          and its deleted rows would resurrect (Iceberg's
          validateNoNewDeletesForDataFiles);
        - with ``conflict_on_operations`` (MERGE passes ``{"merge"}``), no
          concurrent commit may carry one of those operation names — two
          MERGEs racing the same identity keys would both insert their row
          version (duplicate identities); mutating batches against one table
          stay serialized, exactly moonlink's single-writer event loop,
          while appends/maintenance compose freely around them.

        Violations raise :class:`ValidationConflict`. Manifests written by a
        lost attempt are unreferenced; ``remove_orphan_files`` sweeps them.

        Appends (no removes, no references) are always retry-safe: the
        rebuilt commit reuses the WINNER's manifests by reference and only
        appends its own.
        """
        removed_paths = removed_paths or set()
        referenced = set(referenced_data_paths or ())
        base_seq = self.md.last_sequence_number
        # a callable lsn is re-evaluated against the REFRESHED table on each
        # attempt — appenders that derive lsn = flush_lsn + 1 stay monotone
        # even when a concurrent commit advanced the table between attempts
        lsn = kwargs.pop("lsn", None)
        last: CommitConflict | None = None
        for _ in range(max(1, attempts)):
            try:
                return self.commit(
                    operation,
                    added=added,
                    removed_paths=removed_paths,
                    lsn=lsn(self) if callable(lsn) else lsn,
                    **kwargs,
                )
            except CommitConflict as e:
                last = e
                self.refresh()
                if removed_paths or referenced:
                    live = {en.path for en in self.entries()}
                    gone = (removed_paths | referenced) - live
                    if gone:
                        raise ValidationConflict(
                            f"{operation}: {len(gone)} file(s) this commit depends"
                            f" on were removed by a concurrent commit (e.g. "
                            f"{sorted(gone)[:3]}); re-run against fresh state"
                        ) from e
                if conflict_on_new_deletes:
                    # positional DVs would DANGLE after the rewrite; a
                    # concurrent eq-delete (lazy MERGE) is subtler: the
                    # rewrite's outputs take a NEWER sequence than the eq
                    # file, so keys this rewrite re-materializes would
                    # escape a delete committed before it — same re-plan rule
                    from moonlink_spark.table.format import EQ_DELETES

                    fresh_dvs = [
                        en
                        for c in (DELETES, EQ_DELETES)
                        for en in self.entries(content=c)
                        if en.sequence_number > base_seq
                    ]
                    if fresh_dvs:
                        raise ValidationConflict(
                            f"{operation}: {len(fresh_dvs)} delete "
                            "file(s) were committed concurrently; they would "
                            "dangle or mis-apply after this rewrite — re-plan "
                            "against fresh state"
                        ) from e
                if conflict_on_operations:
                    clashing = [
                        s.summary.get("operation")
                        for s in self.md.snapshots
                        if s.sequence_number > base_seq
                        and s.summary.get("operation") in conflict_on_operations
                    ]
                    if clashing:
                        raise ValidationConflict(
                            f"{operation}: concurrent {sorted(set(clashing))} "
                            "commit(s) landed first; mutating batches are "
                            "serialized per table — re-run against fresh state"
                        ) from e
        raise last  # type: ignore[misc]

    def set_properties(
        self, updates: dict | None = None, removes: set[str] | None = None,
        attempts: int = 4,
    ) -> None:
        """ALTER TABLE SET/UNSET PROPERTIES — a CAS-retried metadata-only
        commit (losers refresh and re-apply; property updates are
        last-writer-wins per key, like Iceberg's updateProperties).

        Layout-critical properties (bucket count/key, identity) may not
        drift under live data: persisted bucket ids and key blooms hash
        VALUES with the count and key set fixed at write time, so a bare
        property flip would silently desync the MERGE probe from the files
        (moonlink likewise fixes num_buckets inside each persisted index
        file, persisted_bucket_hash_map.rs:73-93). The rewrite operators —
        operators.rebucket.rebucket_table, operators.evolve.rename_column —
        change them atomically WITH the rewrite/commit instead."""
        import dataclasses

        _LAYOUT_PROPS = (
            "write.buckets", "write.bucket-key", "moonlink.identity-keys",
        )
        last: CommitConflict | None = None
        for _ in range(max(1, attempts)):
            self.refresh()
            cur = self.md.properties
            touched = [
                p
                for p in _LAYOUT_PROPS
                if (updates and p in updates and updates[p] != cur.get(p))
                or (removes and p in removes and p in cur)
            ]
            if touched and self.data_entries():
                raise ValueError(
                    f"refusing to change layout propert(ies) {touched} on a "
                    "table with live data files: persisted bucket ids/blooms/"
                    "identity would silently desync — use rebucket_table / "
                    "rename_column (or recreate the table)"
                )
            props = dict(self.md.properties)
            props.update(updates or {})
            for k in removes or ():
                props.pop(k, None)
            try:
                self.replace_metadata(dataclasses.replace(self.md, properties=props))
                return
            except CommitConflict as e:
                last = e
        raise last  # type: ignore[misc]

    def replace_metadata(self, new_md: TableMetadata) -> None:
        """Direct metadata commit (snapshot expiry / schema evolution path,
        reference: src/moonlink/src/storage/iceberg/moonlink_catalog.rs:37-47)."""
        new_md.version = self.md.version + 1
        _write_metadata_cas(new_md)
        self.md = new_md

    def ancestor_ids(self, snapshot_id: int | None = None) -> set[int]:
        """Snapshot ids on the parent chain of ``snapshot_id`` (default:
        current), inclusive. After a rollback the undone commits fork off
        this chain — consumers that replay history (changelog, sync) follow
        the lineage, never the flat snapshot list."""
        by_id = {s.snapshot_id: s for s in self.md.snapshots}
        cur = (
            self.md.current_snapshot()
            if snapshot_id is None
            else self.md.snapshot_by_id(snapshot_id)
        )
        out: set[int] = set()
        while cur is not None and cur.snapshot_id not in out:
            out.add(cur.snapshot_id)
            cur = by_id.get(cur.parent_id) if cur.parent_id is not None else None
        return out

    def rollback(self, snapshot_id: int | None = None, lsn: int | None = None) -> Snapshot:
        """Restore the table to an older retained snapshot — Iceberg's
        rollback: a NEW snapshot whose content (manifests, by reference —
        O(1) metadata) and LSN are the target's, parented on the TARGET so
        the undone commits leave the current lineage but stay retained for
        time-travel until expiry GCs them. The table's flush LSN moves BACK
        to the target's — moonlink's recovery semantic (replay resumes from
        the iceberg-persisted LSN, wal.rs:205-220), so re-merging the undone
        batches is the supported repair path.
        """
        if self.branch is not None:
            raise ValueError(
                "rollback operates on main; re-point the ref instead "
                "(drop_ref + create_branch)"
            )
        self.refresh()
        md = self.md
        if (snapshot_id is None) == (lsn is None):
            raise ValueError("rollback takes exactly one of snapshot_id / lsn")
        target = (
            md.snapshot_by_id(snapshot_id)
            if snapshot_id is not None
            else self.snapshot_at_lsn(lsn)
        )
        if target is None:
            raise KeyError(f"no retained snapshot {snapshot_id}")
        cur = md.current_snapshot()
        if cur is not None and cur.snapshot_id == target.snapshot_id:
            return cur
        seq = md.last_sequence_number + 1
        snap_id = md.last_snapshot_id + 1
        t_lsn = target.summary.get("lsn")
        summary = {
            "operation": "rollback",
            "added-files": 0,
            "removed-files": 0,
            "rollback-to": target.snapshot_id,
            "rollback-from": cur.snapshot_id if cur else None,
        }
        if t_lsn is not None:
            summary["lsn"] = int(t_lsn)
        snap = Snapshot(
            snapshot_id=snap_id,
            parent_id=target.snapshot_id,
            sequence_number=seq,
            timestamp_ms=now_ms(),
            manifests=list(target.manifests),
            summary=summary,
        )
        write_snapshot(self.metadata_dir, snap)
        props = dict(md.properties)
        if t_lsn is not None:
            props[LSN_PROP] = str(int(t_lsn))
        else:
            props.pop(LSN_PROP, None)
        new_md = TableMetadata(
            table_uuid=md.table_uuid,
            location=md.location,
            schema_json=md.schema_json,
            version=md.version + 1,
            last_sequence_number=seq,
            last_snapshot_id=snap_id,
            current_snapshot_id=snap_id,
            snapshots=md.snapshots + [snap],
            properties=props,
            data_location=md.data_location,
            refs=md.refs,
        )
        _write_metadata_cas(new_md)
        self.md = new_md
        return snap

    # ---------------------------------------------------------- store paths
    def new_data_dir(self) -> str:
        p = os.path.join(self.data_root, "data", uuid.uuid4().hex[:16])
        accessor_for(p).mkdirs(p)
        return p

    def new_delete_dir(self) -> str:
        p = os.path.join(self.data_root, "deletes", uuid.uuid4().hex[:16])
        accessor_for(p).mkdirs(p)
        return p


# ------------------------------------------------------------------ factory


def _abs_location(location: str) -> str:
    # object-store locations (scheme://...) are already absolute
    return location if "://" in location else os.path.abspath(location)


def create_table(
    location: str,
    schema: StructType,
    properties: dict | None = None,
    data_location: str | None = None,
) -> Table:
    location = _abs_location(location)
    data_location = _abs_location(data_location) if data_location else None
    accessor_for(location).mkdirs(os.path.join(location, "metadata"))
    data_root = data_location or location
    dacc = accessor_for(data_root)
    for sub in ("data", "deletes"):
        dacc.mkdirs(os.path.join(data_root, sub))
    # every new table gets parquet field ids (identity-based evolution,
    # fieldids.py — the PARQUET:field_id discipline of the reference,
    # bench_write.rs:33-44); the high-water property guarantees dropped
    # columns' ids are never reused
    from moonlink_spark.table.fieldids import assign_field_ids, next_field_id

    schema = assign_field_ids(schema)
    props = dict(properties or {})
    props.setdefault(LAST_FIELD_ID_PROP, str(next_field_id(schema) - 1))
    md = TableMetadata(
        table_uuid=uuid.uuid4().hex,
        location=location,
        schema_json=schema.jsonValue(),
        version=0,
        last_sequence_number=0,
        last_snapshot_id=0,
        current_snapshot_id=None,
        snapshots=[],
        properties=props,
        data_location=data_location,
    )
    _write_metadata_cas(md)
    return Table(md)


def load_table(location: str) -> Table:
    return Table(_read_current_metadata(_abs_location(location)))


# ----------------------------------------------------------------- internal


def _metadata_path(location: str, version: int) -> str:
    return os.path.join(location, "metadata", f"v{version}.metadata.json")


def _write_metadata_cas(md: TableMetadata) -> None:
    path = _metadata_path(md.location, md.version)
    acc = accessor_for(path)
    try:
        acc.create_exclusive(path, json.dumps(md.to_dict()))
    except CasConflict as e:
        raise CommitConflict(f"version {md.version} already committed") from e
    acc.write_atomic(
        os.path.join(md.location, "metadata", "version-hint.text"), str(md.version)
    )


def _read_current_metadata(location: str) -> TableMetadata:
    meta_dir = os.path.join(location, "metadata")
    acc = accessor_for(location)
    hint = os.path.join(meta_dir, "version-hint.text")
    version = None
    if acc.exists(hint):
        version = int(acc.read_text(hint).strip())
        # the hint can lag the latest CAS-committed version (a writer crashed
        # between CAS and hint rewrite) — probe FORWARD from the hint with
        # O(lag) existence checks instead of listing the whole metadata dir
        # (which is O(history) and, between expiries, can hold thousands of
        # snapshot/manifest objects a refresh must not pay for)
        while acc.exists(_metadata_path(location, version + 1)):
            version += 1
    else:
        # no hint (torn first commit / foreign table): full-list fallback
        candidates = [
            p
            for p in acc.list(meta_dir, suffix=".metadata.json")
            if os.path.basename(p).startswith("v")
        ]
        if not candidates:
            raise FileNotFoundError(f"not a table: {location}")
        version = max(int(os.path.basename(p)[1:].split(".")[0]) for p in candidates)
    return TableMetadata.from_dict(
        json.loads(acc.read_text(_metadata_path(location, version)))
    )
