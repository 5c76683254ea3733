"""Failure injection: crash between file writes and snapshot commit.

Mirrors moonlink's failure tests (reference:
src/moonlink/src/table_handler/failure_tests.rs; chaos filesystem injection
src/moonlink/src/storage/filesystem/accessor_config.rs): a job that dies
after writing its output files but before the metadata CAS must leave the
table logically unchanged (writes invisible until commit — the same guarantee
as moonlink's streaming-xact abort, transaction_stream.rs:137-143), and a
re-run with the same checkpoint must REUSE the already-written files
(WAL-replay resume, wal.rs:205-220) instead of recomputing.
"""

import os

import pytest

from moonlink_spark.cdc import CdcScheduleGenerator, to_spark
from moonlink_spark.operators.compact import FULL, compact
from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import Table, create_table
from moonlink_spark.table.scan import scan


@pytest.fixture()
def table(tmp_path):
    return create_table(str(tmp_path / "t"), IMAGES_SCHEMA)


def _crashing_commit(monkeypatch):
    real = Table.commit
    state = {"crashes": 0}

    def boom(self, *a, **k):
        state["crashes"] += 1
        raise RuntimeError("injected crash before commit")

    monkeypatch.setattr(Table, "commit", boom)
    return real, state


def _data_dirs(table):
    return sorted(os.listdir(os.path.join(table.location, "data")))


def test_merge_crash_before_commit_then_resume(spark, table, tmp_path, monkeypatch):
    gen = CdcScheduleGenerator(seed=31)
    b1 = gen.next_batch(80, 0, 0)
    merge_cdc_batch(spark, table, to_spark(spark, b1), gen.commit_lsn)
    before_rows = scan(spark, table).count()
    before_snaps = len(table.md.snapshots)

    b2 = gen.next_batch(20, 30, 10)
    lsn2 = gen.commit_lsn
    ck = str(tmp_path / "ck")

    real, state = _crashing_commit(monkeypatch)
    with pytest.raises(RuntimeError, match="injected crash"):
        merge_cdc_batch(spark, table, to_spark(spark, b2), lsn2, checkpoint_root=ck)
    monkeypatch.setattr(Table, "commit", real)
    assert state["crashes"] == 1

    # crash left the table logically unchanged (files on disk are invisible)
    table.refresh()
    assert scan(spark, table).count() == before_rows
    assert len(table.md.snapshots) == before_snaps

    # resume: same job id -> the written files are adopted, not recomputed
    dirs_after_crash = _data_dirs(table)
    res = merge_cdc_batch(spark, table, to_spark(spark, b2), lsn2, checkpoint_root=ck)
    assert not res.skipped
    assert _data_dirs(table) == dirs_after_crash  # no new data dir created
    assert scan(spark, table).count() == before_rows + 20 - 10
    assert table.flush_lsn == lsn2


def test_compact_crash_before_commit_then_resume(spark, table, tmp_path, monkeypatch):
    gen = CdcScheduleGenerator(seed=32)
    for sizes in [(60, 0, 0), (20, 20, 10), (10, 15, 5)]:
        b = gen.next_batch(*sizes)
        merge_cdc_batch(spark, table, to_spark(spark, b), gen.commit_lsn)
    before = (
        scan(spark, table)
        .select("image_id", "caption")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    before_snaps = len(table.md.snapshots)
    ck = str(tmp_path / "ck")

    real, _ = _crashing_commit(monkeypatch)
    with pytest.raises(RuntimeError, match="injected crash"):
        compact(spark, table, mode=FULL, checkpoint_root=ck)
    monkeypatch.setattr(Table, "commit", real)

    table.refresh()
    assert len(table.md.snapshots) == before_snaps

    dirs_after_crash = _data_dirs(table)
    res = compact(spark, table, mode=FULL, checkpoint_root=ck)
    assert not res.skipped
    assert _data_dirs(table) == dirs_after_crash
    after = (
        scan(spark, table)
        .select("image_id", "caption")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(before, after)
