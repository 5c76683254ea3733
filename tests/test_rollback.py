"""Snapshot rollback (Table.rollback) — restore an older retained snapshot.

Iceberg's rollback_to_snapshot re-expressed over this catalog: a NEW
snapshot with the target's manifests (by reference) parented on the TARGET,
so undone commits fork off the current lineage but stay retained for
time-travel until expiry. The table's flush LSN moves back to the target's
(moonlink's recovery semantic: replay resumes from the iceberg-persisted
LSN, wal.rs:205-220), so re-merging the undone batches is the repair path.
Consumers that replay history follow the lineage: the changelog excludes
undone commits (ancestry walk) and sync refuses a replica that is ahead of
a rolled-back upstream.
"""

import pandas as pd
import pytest

from moonlink_spark.cdc import CdcScheduleGenerator, to_spark
from moonlink_spark.operators.expire import expire_snapshots
from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.operators.sync import sync_table
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.changelog import scan_changes
from moonlink_spark.table.scan import scan

_COLS = ["image_id", "caption", "phash"]


def _content(spark, t, snapshot_id=None):
    pdf = scan(spark, t.refresh(), snapshot_id=snapshot_id, columns=_COLS).toPandas()
    return pdf.sort_values("image_id").reset_index(drop=True)


@pytest.fixture()
def hist(spark, tmp_path):
    t = create_table(str(tmp_path / "t"), IMAGES_SCHEMA)
    gen = CdcScheduleGenerator(seed=11)
    states, lsns = {}, []
    for sizes in [(80, 0, 0), (10, 25, 10), (0, 15, 20)]:
        b = gen.next_batch(*sizes)
        merge_cdc_batch(spark, t, to_spark(spark, b), gen.commit_lsn)
        lsns.append(gen.commit_lsn)
        states[gen.commit_lsn] = _content(spark, t)
    return t, gen, states, lsns


def test_rollback_restores_state_and_lsn(spark, hist):
    t, gen, states, lsns = hist
    assert t.flush_lsn == lsns[2]
    undone_id = t.md.current_snapshot().snapshot_id
    snap = t.rollback(lsn=lsns[1])
    assert snap.summary["operation"] == "rollback"
    assert t.flush_lsn == lsns[1]
    pd.testing.assert_frame_equal(_content(spark, t), states[lsns[1]], check_dtype=False)
    # the undone commit stays retained: time-travel BY SNAPSHOT ID still
    # reads it (by LSN it is off-lineage — snapshot_at_lsn follows lineage
    # and resolves the rollback snapshot instead)
    pd.testing.assert_frame_equal(
        _content(spark, t, snapshot_id=undone_id), states[lsns[2]], check_dtype=False
    )
    assert t.snapshot_at_lsn(lsns[2]).snapshot_id == snap.snapshot_id
    # rollback to the current snapshot is a no-op
    again = t.rollback(snapshot_id=snap.snapshot_id)
    assert again.snapshot_id == snap.snapshot_id
    # repair path: replaying a (different) batch at the undone lsn applies
    gen2 = CdcScheduleGenerator(seed=99)
    gen2.next_new = 1000
    b = gen2.next_batch(5, 0, 0)
    b["lsn"] = lsns[2]
    merge_cdc_batch(spark, t, to_spark(spark, b), lsn=lsns[2])
    assert t.flush_lsn == lsns[2]
    assert len(_content(spark, t)) == len(states[lsns[1]]) + 5


def test_changelog_follows_lineage_after_rollback(spark, hist):
    t, gen, states, lsns = hist
    t.rollback(lsn=lsns[0])
    # the changelog window past the restore point must now be EMPTY: the
    # later commits are off-lineage (undone) and the rollback snapshot
    # itself emits nothing
    ev = scan_changes(spark, t, lsns[0], lsns[2], columns=_COLS)
    assert ev.count() == 0
    # new commits after the rollback are visible incrementally
    b = gen.next_batch(7, 0, 0)
    merge_cdc_batch(spark, t, to_spark(spark, b), gen.commit_lsn)
    ev2 = scan_changes(spark, t, lsns[0], gen.commit_lsn, columns=_COLS).toPandas()
    assert len(ev2) == 7 and (ev2["_change_type"] == "insert").all()


def test_sync_refuses_rolled_back_upstream(spark, hist, tmp_path):
    t, gen, states, lsns = hist
    dst = create_table(str(tmp_path / "replica"), IMAGES_SCHEMA)
    sync_table(spark, t, dst)
    assert dst.refresh().flush_lsn == lsns[2]
    t.rollback(lsn=lsns[1])
    with pytest.raises(ValueError, match="rolled back"):
        sync_table(spark, t, dst)


def test_expiry_gcs_undone_commits(spark, hist):
    t, gen, states, lsns = hist
    t.rollback(lsn=lsns[0])
    before = _content(spark, t)
    # retain only the last 2 snapshots (the rollback + one) — the undone
    # lsn-2/lsn-3 snapshots expire; their files must be GC'd without
    # touching the restored state, and the changelog floor must NOT advance
    # past the table's (rolled-back) flush LSN
    res = expire_snapshots(t, retain_last=2)
    assert res.expired_snapshots >= 2
    pd.testing.assert_frame_equal(_content(spark, t), before, check_dtype=False)
    floor = int(t.md.properties.get("moonlink.min-changelog-lsn", 0))
    assert floor <= (t.flush_lsn or 0)
