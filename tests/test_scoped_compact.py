"""Scoped compaction: key-range / bucket-subset spot maintenance."""

from __future__ import annotations

import pandas as pd

from moonlink_spark.cdc import CdcScheduleGenerator, ReferenceTable, to_spark
from moonlink_spark.operators.compact import FORCE_REGULAR, compact
from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.scan import scan
from moonlink_spark.table.writer import BUCKETS_PROP


def _mk(spark, tmp_path, batches=4, n=120):
    t = create_table(
        str(tmp_path / "t"), IMAGES_SCHEMA, properties={BUCKETS_PROP: "4"}
    )
    gen = CdcScheduleGenerator(seed=31)
    ref = ReferenceTable()
    for _ in range(batches):
        b = gen.next_batch(n, 15, 0)
        ref.apply(b)
        # avg_row_bytes = flush target: opts out of the micro-batch
        # coalesce so each commit keeps the input's range-partitioned
        # files — this fixture's scope assertions need files with NARROW
        # image_id ranges, the layout a real (full-size) flush produces
        from moonlink_spark.table.writer import FLUSH_TARGET_BYTES

        merge_cdc_batch(
            spark, t, to_spark(spark, b), gen.commit_lsn,
            avg_row_bytes=FLUSH_TARGET_BYTES,
        )
    return t, ref


def _content(spark, t) -> pd.DataFrame:
    return (
        scan(spark, t)
        .select("image_id", "caption", "phash")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )


def test_key_range_scope(spark, tmp_path):
    t, ref = _mk(spark, tmp_path)
    before = _content(spark, t)
    all_before = {e.path for e in t.data_entries()}
    # scope: the lower half of the id space
    ids = sorted(before["image_id"])
    mid = ids[len(ids) // 2]
    res = compact(
        spark, t, mode=FORCE_REGULAR,
        scope_key="image_id", scope_lo=ids[0], scope_hi=mid,
        target_bytes=1 << 22,
    )
    assert not res.skipped
    t.refresh()
    after = {e.path for e in t.data_entries()}
    # files wholly ABOVE the scoped range were untouched
    untouched = [
        e for e in t.data_entries()
        if e.path in all_before
        and e.stats.get("image_id", {}).get("min", "") > mid
    ]
    assert untouched, "scope rewrote the whole table"
    # logical content identical
    pd.testing.assert_frame_equal(before, _content(spark, t))


def test_bucket_scope(spark, tmp_path):
    t, ref = _mk(spark, tmp_path)
    # bucketize everything first so bucket scope is meaningful
    compact(spark, t, mode="full")
    t.refresh()
    before = _content(spark, t)
    # fragment bucket structure again with a couple of merges
    gen2 = CdcScheduleGenerator(seed=77)
    b = gen2.next_batch(60, 0, 0)
    ref2 = b  # content check via scan equality below
    merge_cdc_batch(spark, t, to_spark(spark, b), 10_000)
    t.refresh()
    pre_paths = {e.path: e.bucket for e in t.data_entries()}
    res = compact(
        spark, t, mode=FORCE_REGULAR, scope_buckets={0, 1},
        target_bytes=1 << 22,
    )
    t.refresh()
    if not res.skipped:
        # buckets 2,3's pre-existing files survive untouched
        for e in t.data_entries():
            if e.path in pre_paths and pre_paths[e.path] in (2, 3):
                assert e.bucket in (2, 3)
    # content preserved regardless
    got = _content(spark, t)
    assert len(got) == len(before) + len(
        set(b["image_id"]) - set(before["image_id"])
    )


def test_scope_with_no_matches_skips(spark, tmp_path):
    t, _ = _mk(spark, tmp_path, batches=2)
    res = compact(
        spark, t, mode=FORCE_REGULAR,
        scope_key="image_id", scope_lo="zzz0", scope_hi="zzz9",
    )
    assert res.skipped
