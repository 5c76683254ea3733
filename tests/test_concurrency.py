"""Optimistic multi-writer commits: CAS retry + conflict validation.

Moonlink serializes all mutation through a per-table event loop
(reference: src/moonlink/src/table_handler.rs:374-411); the batch analog is
Iceberg-style optimistic concurrency — losers of the metadata CAS race
refresh, validate their inputs still hold, and re-apply. These tests drive
two independent ``Table`` handles against one mem:// table so every commit
pair really races the same metadata version.
"""

import uuid

import pytest

from moonlink_spark.table.catalog import (
    CommitConflict,
    ValidationConflict,
    create_table,
    load_table,
)
from moonlink_spark.table.format import FileEntry

from tests.test_object_store import SCHEMA, _entry


def _deletes_entry(name: str) -> FileEntry:
    return FileEntry(
        content="deletes",
        path=f"mem://bkt-{name}/deletes/{uuid.uuid4().hex}.parquet",
        record_count=5,
        file_size_bytes=500,
        sequence_number=-1,
    )


@pytest.fixture()
def loc():
    return f"mem://bkt-{uuid.uuid4().hex[:8]}/tbl"


def _two_handles(loc):
    create_table(loc, SCHEMA)
    return load_table(loc), load_table(loc)


def test_plain_commit_still_conflicts(loc):
    a, b = _two_handles(loc)
    a.commit("append", added=[_entry("a")])
    with pytest.raises(CommitConflict):
        b.commit("append", added=[_entry("b")])


def test_append_retry_rebases_over_winner(loc):
    a, b = _two_handles(loc)
    ea, eb = _entry("a"), _entry("b")
    a.commit("append", added=[ea])
    snap = b.commit_with_retry("append", added=[eb])
    live = {e.path for e in load_table(loc).entries()}
    assert {ea.path, eb.path} <= live
    assert snap.parent_id is not None


def test_retry_rebases_over_many_winners(loc):
    a, b = _two_handles(loc)
    for i in range(3):
        a.commit("append", added=[_entry(f"a{i}")])
    eb = _entry("b")
    b.commit_with_retry("append", added=[eb])
    t = load_table(loc)
    assert eb.path in {e.path for e in t.entries()}
    assert len(t.data_entries()) == 4


def test_removed_paths_gone_raises_validation_conflict(loc):
    a, b = _two_handles(loc)
    e1 = _entry("shared")
    a.commit("append", added=[e1])
    a.refresh()
    b.refresh()
    # both plan a replace of e1; a wins
    a.commit("compact", added=[_entry("a-out")], removed_paths={e1.path})
    with pytest.raises(ValidationConflict, match="removed by a concurrent"):
        b.commit_with_retry(
            "compact", added=[_entry("b-out")], removed_paths={e1.path}
        )


def test_referenced_paths_gone_raises_validation_conflict(loc):
    a, b = _two_handles(loc)
    e1 = _entry("probed")
    a.commit("append", added=[e1])
    a.refresh()
    b.refresh()
    # a compacts e1 away while b staged DVs computed against e1's positions
    a.commit("compact", added=[_entry("a-out")], removed_paths={e1.path})
    with pytest.raises(ValidationConflict, match="removed by a concurrent"):
        b.commit_with_retry(
            "merge",
            added=[_deletes_entry("b")],
            referenced_data_paths={e1.path},
        )


def test_concurrent_dv_adds_block_replace(loc):
    a, b = _two_handles(loc)
    e1, e2 = _entry("one"), _entry("two")
    a.commit("append", added=[e1, e2])
    a.refresh()
    b.refresh()
    # a MERGE lands DVs first; b's staged compaction of e1 must re-plan —
    # the DV positions could target e1 and would dangle after the rewrite
    a.commit("merge", added=[_deletes_entry("a")])
    with pytest.raises(ValidationConflict, match="delete"):
        b.commit_with_retry(
            "compact",
            added=[_entry("b-out")],
            removed_paths={e1.path},
            conflict_on_new_deletes=True,
        )


def test_replace_retries_over_plain_appends(loc):
    a, b = _two_handles(loc)
    e1 = _entry("one")
    a.commit("append", added=[e1])
    a.refresh()
    b.refresh()
    late, bout = _entry("late"), _entry("b-out")
    a.commit("append", added=[late])
    # append doesn't touch e1 and adds no DVs: b's compaction rebases
    snap = b.commit_with_retry(
        "compact",
        added=[bout],
        removed_paths={e1.path},
        conflict_on_new_deletes=True,
    )
    live = {e.path for e in load_table(loc).entries()}
    assert live == {late.path, bout.path}
    assert snap.summary["operation"] == "compact"


def test_conflicting_operation_names_serialize(loc):
    a, b = _two_handles(loc)
    a.commit("append", added=[_entry("base")])
    a.refresh()
    b.refresh()
    a.commit("merge", added=[_entry("a-merge")])
    with pytest.raises(ValidationConflict, match="serialized per table"):
        b.commit_with_retry(
            "merge",
            added=[_entry("b-merge")],
            conflict_on_operations={"merge"},
        )
    # but a non-conflicting winner lets the same commit through
    c = load_table(a.location)
    b.refresh()
    c.commit("append", added=[_entry("c-app")])
    b.commit_with_retry(
        "merge", added=[_entry("b-merge2")], conflict_on_operations={"merge"}
    )


def test_attempts_exhausted_reraises_commit_conflict(loc):
    a, b = _two_handles(loc)

    # a wins every race: simulate by committing from `a` inside a patched
    # refresh, so every one of b's attempts sees a fresh conflict
    orig_refresh = type(b).refresh

    def racing_refresh(self):
        out = orig_refresh(self)
        if self is b:
            orig_refresh(a)
            a.commit("append", added=[_entry("racer")])
        return out

    a.commit("append", added=[_entry("seed")])
    type(b).refresh = racing_refresh
    try:
        with pytest.raises(CommitConflict):
            b.commit_with_retry("append", added=[_entry("b")], attempts=3)
    finally:
        type(b).refresh = orig_refresh


@pytest.mark.parametrize(
    "mk_loc",
    [
        lambda tmp: f"mem://cas-{uuid.uuid4().hex[:8]}/tbl",   # conditional PUT
        lambda tmp: f"file://{tmp}/cas_tbl",                   # pyarrow O_EXCL
        lambda tmp: str(tmp / "cas_plain"),                    # local O_EXCL
    ],
    ids=["mem-conditional-put", "pyarrow-local", "plain-local"],
)
def test_cas_contract_per_capability(tmp_path, mk_loc):
    """The commit CAS contract, parametrized over the accessor capability
    probe (VERDICT r4 #6): every accessor that reports 'atomic' must
    enforce exclusive creation; capability is introspectable so deployers
    can refuse multi-writer mode on check-then-put stores."""
    from moonlink_spark.table.io import CasConflict, accessor_for

    loc = mk_loc(tmp_path)
    acc = accessor_for(loc)
    assert acc.cas_capability() == "atomic"
    a, b = _two_handles(loc)
    a.commit("append", added=[_entry("a")])
    with pytest.raises(CommitConflict):
        b.commit("append", added=[_entry("b")])
    # raw primitive, same contract
    key = f"{loc}/metadata/probe-{uuid.uuid4().hex[:6]}"
    acc.mkdirs(f"{loc}/metadata")
    acc.create_exclusive(key, "x")
    with pytest.raises(CasConflict):
        acc.create_exclusive(key, "y")


def test_check_then_put_fallback_warns_loudly(tmp_path, caplog, monkeypatch):
    """An object store without a conditional-PUT surface must degrade to
    check-then-put VISIBLY: capability reports it, the first exclusive
    create logs a single-writer-mode warning, and existing objects still
    conflict (best-effort)."""
    import logging

    from moonlink_spark.table.io import CasConflict, PyArrowFSAccessor

    acc = PyArrowFSAccessor(f"file://{tmp_path}")
    monkeypatch.setattr(acc, "cas_capability", lambda: "check-then-put")
    monkeypatch.setattr(PyArrowFSAccessor, "_warned_nonatomic", False)
    # drop off the O_EXCL fast path the way a real object store would
    monkeypatch.setattr(
        PyArrowFSAccessor, "_ATOMIC_MOVE", frozenset(), raising=False
    )
    class _S3Like:
        type_name = "s3-like"

        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, name):
            return getattr(self._inner, name)

    acc._fs = _S3Like(acc._fs)
    with caplog.at_level(logging.WARNING, logger="moonlink_spark.table.io"):
        acc.create_exclusive(f"file://{tmp_path}/k1", "v")
    assert any("SINGLE-WRITER" in r.message for r in caplog.records)
    with pytest.raises(CasConflict):
        acc.create_exclusive(f"file://{tmp_path}/k1", "v2")
