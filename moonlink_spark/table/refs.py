"""Named refs: tags, branches, and write-audit-publish.

Iceberg's refs map re-expressed over this table format: a **tag** is an
immutable named pointer to a snapshot (audit marks, release pins — protected
from snapshot expiry until ``max_ref_age_ms``); a **branch** is a mutable
pointer commits can advance independently of the main lineage. ``main`` is
implicit (``current_snapshot_id``) and never stored in the refs map.

The write-audit-publish (WAP) pattern this enables: stage a MERGE on an
audit branch (``table.for_branch(name)`` — the WHOLE operator stack works
against the view, because reads resolve the branch head and commits advance
the ref, catalog.py), validate the staged state with any scan/oracle, then
``fast_forward`` main to the branch head — publication is one O(1) metadata
CAS; a failed audit just drops the ref and expiry GCs the staged files.

The reference's analog is moonlink's LSN-gated visibility (readers see only
committed LSNs, src/moonlink/src/storage/mooncake_table.rs:407-412); refs
give the same staged-until-published behavior to batch maintenance, plus
human-named time travel. All ref mutations are metadata-only commits behind
the same CAS as data commits, with a refresh-and-reapply retry loop (losers
re-validate, so two writers never silently clobber each other's refs).
"""

from __future__ import annotations

from dataclasses import replace

from moonlink_spark.table.catalog import CommitConflict, Table
from moonlink_spark.table.format import LSN_PROP, Snapshot, now_ms

_ATTEMPTS = 4


def _apply_refs_update(table: Table, mutate, attempts: int = _ATTEMPTS):
    """CAS-retried metadata-only update: ``mutate(md) -> (new_refs,
    extra_md_fields)`` runs against FRESH metadata on every attempt."""
    last: Exception | None = None
    for _ in range(attempts):
        table.refresh()
        md = table.md
        refs, extra = mutate(md)
        new_md = replace(md, refs=refs, **extra)
        try:
            table.replace_metadata(new_md)
            return
        except CommitConflict as e:
            last = e
    raise last  # type: ignore[misc]


def _resolve_snapshot(md, snapshot_id: int | None) -> Snapshot:
    snap = (
        md.current_snapshot() if snapshot_id is None else md.snapshot_by_id(snapshot_id)
    )
    if snap is None:
        raise ValueError("table has no snapshot to reference")
    return snap


def create_tag(
    table: Table,
    name: str,
    snapshot_id: int | None = None,
    max_ref_age_ms: int | None = None,
) -> None:
    """Pin ``name`` to a snapshot (default: current). Tags are read-only and
    protect their snapshot from expiry until ``max_ref_age_ms`` (None =
    forever, until ``drop_ref``)."""
    _create_ref(table, name, "tag", snapshot_id, max_ref_age_ms)


def create_branch(
    table: Table,
    name: str,
    snapshot_id: int | None = None,
    max_ref_age_ms: int | None = None,
) -> None:
    """Fork a mutable branch at a snapshot (default: current). Write through
    ``table.for_branch(name)``; publish with :func:`fast_forward`."""
    _create_ref(table, name, "branch", snapshot_id, max_ref_age_ms)


def _create_ref(table, name, kind, snapshot_id, max_ref_age_ms) -> None:
    if name == "main":
        raise ValueError("'main' is the implicit current pointer")

    def mutate(md):
        if name in md.refs:
            raise ValueError(f"ref {name!r} already exists")
        snap = _resolve_snapshot(md, snapshot_id)
        ref = {
            "snapshot_id": snap.snapshot_id,
            "type": kind,
            "created_at_ms": now_ms(),
        }
        if max_ref_age_ms is not None:
            ref["max_ref_age_ms"] = int(max_ref_age_ms)
        return {**md.refs, name: ref}, {}

    _apply_refs_update(table, mutate)


def drop_ref(table: Table, name: str) -> None:
    def mutate(md):
        if name not in md.refs:
            raise KeyError(f"ref {name!r} not found")
        refs = dict(md.refs)
        del refs[name]
        return refs, {}

    _apply_refs_update(table, mutate)


def list_refs(table: Table) -> dict:
    table.refresh()
    return dict(table.md.refs)


def resolve_ref(table: Table, name: str) -> int:
    """Ref name -> snapshot id, for ``scan(..., snapshot_id=...)`` /
    time travel by human name."""
    if name == "main":
        snap = table.md.current_snapshot()
        if snap is None:
            raise KeyError("table has no current snapshot")
        return snap.snapshot_id
    ref = table.md.refs.get(name)
    if ref is None:
        raise KeyError(f"ref {name!r} not found")
    return int(ref["snapshot_id"])


def fast_forward(table: Table, branch: str, drop: bool = False) -> Snapshot:
    """Publish: advance main to the head of ``branch`` — valid only when
    main's current snapshot is an ANCESTOR of the branch head (a true
    fast-forward; anything else means main moved since the fork and the
    branch must be re-staged against fresh state — the same re-plan rule as
    ValidationConflict). Publication adopts the head's LSN as the table
    flush LSN. O(1) metadata; with ``drop`` the ref is removed in the same
    commit (the WAP epilogue)."""

    def mutate(md):
        ref = md.refs.get(branch)
        if ref is None:
            raise KeyError(f"ref {branch!r} not found")
        if ref.get("type") != "branch":
            raise ValueError(f"ref {branch!r} is a tag")
        head = md.snapshot_by_id(int(ref["snapshot_id"]))
        cur = md.current_snapshot()
        if cur is not None and cur.snapshot_id != head.snapshot_id:
            # walk the branch head's parent chain; main must be on it
            by_id = {s.snapshot_id: s for s in md.snapshots}
            node, on_chain = head, False
            while node is not None:
                if node.snapshot_id == cur.snapshot_id:
                    on_chain = True
                    break
                node = (
                    by_id.get(node.parent_id) if node.parent_id is not None else None
                )
            if not on_chain:
                raise ValueError(
                    f"cannot fast-forward: main moved since {branch!r} forked; "
                    "re-stage the branch against current state"
                )
        props = dict(md.properties)
        head_lsn = head.summary.get("lsn")
        if head_lsn is not None:
            cur_lsn = props.get(LSN_PROP)
            if cur_lsn is not None and int(head_lsn) < int(cur_lsn):
                raise ValueError(
                    f"branch head lsn={head_lsn} < table lsn={cur_lsn}"
                )
            props[LSN_PROP] = str(int(head_lsn))
        refs = dict(md.refs)
        if drop:
            del refs[branch]
        return refs, {
            "current_snapshot_id": head.snapshot_id,
            "properties": props,
        }

    _apply_refs_update(table, mutate)
    return table.md.current_snapshot()
