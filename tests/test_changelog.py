"""Incremental changelog scan (table/changelog.py) — CDC-out semantics.

Oracle: a pandas replay of the same batches tracks, per commit, the expected
insert events (latest-wins upserts) and delete events (pre-images of matched
live rows) — the event stream moonlink's WAL would carry
(reference: src/moonlink/src/storage/wal.rs:77-100).
"""

import pandas as pd
import pytest

from moonlink_spark.cdc import CdcScheduleGenerator, to_spark
from moonlink_spark.operators.maintenance import optimize_table
from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.changelog import (
    CHANGE_LSN_COL,
    CHANGE_TYPE_COL,
    scan_changes,
)

_COLS = ["image_id", "caption", "phash"]


class ChangeOracle:
    """Replays batches over a dict, recording per-commit expected events."""

    def __init__(self):
        self.rows: dict[str, dict] = {}
        self.events: list[dict] = []  # image_id, caption, phash, type, lsn

    def apply(self, batch: pd.DataFrame, commit_lsn: int) -> None:
        latest = batch.sort_values("lsn").groupby("image_id", as_index=False).tail(1)
        for r in latest.to_dict("records"):
            key = r["image_id"]
            pre = self.rows.get(key)
            if pre is not None:
                self.events.append(
                    {
                        "image_id": key,
                        "caption": pre["caption"],
                        "phash": pre["phash"],
                        CHANGE_TYPE_COL: "delete",
                        CHANGE_LSN_COL: commit_lsn,
                    }
                )
            if r["op"] == "D":
                self.rows.pop(key, None)
            else:
                self.rows[key] = {k: v for k, v in r.items() if k not in ("op", "lsn")}
                self.events.append(
                    {
                        "image_id": key,
                        "caption": r["caption"],
                        "phash": r["phash"],
                        CHANGE_TYPE_COL: "insert",
                        CHANGE_LSN_COL: commit_lsn,
                    }
                )

    def expected(self, from_lsn: int, to_lsn: int) -> pd.DataFrame:
        ev = [e for e in self.events if from_lsn < e[CHANGE_LSN_COL] <= to_lsn]
        cols = _COLS + [CHANGE_TYPE_COL, CHANGE_LSN_COL]
        if not ev:
            return pd.DataFrame(columns=cols)
        return pd.DataFrame(ev)[cols]


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.astype({"phash": "int64", CHANGE_LSN_COL: "int64"})
        .sort_values(_COLS + [CHANGE_TYPE_COL, CHANGE_LSN_COL])
        .reset_index(drop=True)
    )


def _collect(spark, table, lo, hi) -> pd.DataFrame:
    return (
        scan_changes(spark, table, lo, hi, columns=_COLS)
        .toPandas()
    )


@pytest.fixture()
def loaded(spark, tmp_path):
    t = create_table(str(tmp_path / "t"), IMAGES_SCHEMA)
    gen = CdcScheduleGenerator(seed=11)
    oracle = ChangeOracle()
    lsns = []
    for sizes in [(120, 0, 0), (30, 40, 20), (0, 25, 35)]:
        b = gen.next_batch(*sizes)
        lsn = gen.commit_lsn
        oracle.apply(b, lsn)
        merge_cdc_batch(spark, t, to_spark(spark, b), lsn)
        lsns.append(lsn)
    return t, gen, oracle, lsns


def test_changelog_full_window(spark, loaded):
    t, _, oracle, lsns = loaded
    got = _collect(spark, t, 0, lsns[-1])
    exp = oracle.expected(0, lsns[-1])
    pd.testing.assert_frame_equal(_sorted(got), _sorted(exp), check_dtype=False)
    # update = delete+insert pair at one LSN; batch 2 had 40 updates of live rows
    mid = got[got[CHANGE_LSN_COL] == lsns[1]]
    assert (mid[CHANGE_TYPE_COL] == "delete").sum() == 60  # 40 upd + 20 del
    assert (mid[CHANGE_TYPE_COL] == "insert").sum() == 70  # 30 ins + 40 upd


def test_changelog_sub_window_resume(spark, loaded):
    t, _, oracle, lsns = loaded
    # consuming (lsn1, lsn3] then (0, lsn1] partitions the full stream
    got_a = _collect(spark, t, lsns[0], lsns[-1])
    got_b = _collect(spark, t, 0, lsns[0])
    exp_a = oracle.expected(lsns[0], lsns[-1])
    exp_b = oracle.expected(0, lsns[0])
    pd.testing.assert_frame_equal(_sorted(got_a), _sorted(exp_a), check_dtype=False)
    pd.testing.assert_frame_equal(_sorted(got_b), _sorted(exp_b), check_dtype=False)


def test_changelog_invisible_to_maintenance(spark, loaded):
    t, gen, oracle, lsns = loaded
    # compaction/clustering rewrite layout, not content: no events, and the
    # delete pre-images of a LATER merge still resolve against rewritten files
    optimize_table(spark, t, mode="full", retain_last=len(t.md.snapshots) + 2)
    got = _collect(spark, t, lsns[-1], t.flush_lsn or lsns[-1])
    assert len(got) == 0

    b = gen.next_batch(0, 15, 10)
    lsn = gen.commit_lsn
    oracle.apply(b, lsn)
    merge_cdc_batch(spark, t, to_spark(spark, b), lsn)
    got = _collect(spark, t, lsns[-1], lsn)
    exp = oracle.expected(lsns[-1], lsn)
    pd.testing.assert_frame_equal(_sorted(got), _sorted(exp), check_dtype=False)


def test_changelog_expired_window_raises(spark, tmp_path):
    from moonlink_spark.operators.expire import expire_snapshots

    t = create_table(str(tmp_path / "t"), IMAGES_SCHEMA)
    gen = CdcScheduleGenerator(seed=12)
    lsns = []
    for sizes in [(40, 0, 0), (10, 10, 5), (5, 5, 5)]:
        b = gen.next_batch(*sizes)
        lsns.append(gen.commit_lsn)
        merge_cdc_batch(spark, t, to_spark(spark, b), lsns[-1])
    res = expire_snapshots(t, retain_last=1)
    assert res.expired_snapshots == 2
    with pytest.raises(KeyError, match="re-bootstrap"):
        scan_changes(spark, t, 0, lsns[-1])
    with pytest.raises(KeyError, match="re-bootstrap"):
        scan_changes(spark, t, lsns[0], lsns[-1])
    # resuming exactly at the expiry boundary is safe (nothing lost)
    got = scan_changes(spark, t, lsns[1], lsns[-1]).toPandas()
    assert set(got[CHANGE_LSN_COL].unique()) == {lsns[-1]}
