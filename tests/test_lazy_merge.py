"""Lazy MERGE via equality deletes (format.py EQ_DELETES).

The write path skips the probe entirely — one eq-delete file of the batch's
identity keys + plain data files, O(batch) with zero table reads (moonlink's
delete-by-key buffering, mooncake_table.rs:1160-1184; Iceberg v2 equality
deletes). Scans apply the keys to strictly-older files (sequence rule), so
a commit's own upserts survive; compaction folds the keys into rewrites and
drops the dangling eq files; the changelog reconstructs delete pre-images
with the deferred key probe.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from moonlink_spark.cdc import CdcScheduleGenerator, ReferenceTable, to_spark
from moonlink_spark.operators.maintenance import optimize_table
from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.changelog import scan_changes
from moonlink_spark.table.format import EQ_DELETES
from moonlink_spark.table.scan import scan
from moonlink_spark.table.writer import BUCKETS_PROP

_CMP = ["image_id", "w", "h", "fmt", "caption", "phash"]


def _content(spark, t, **kw):
    return (
        scan(spark, t.refresh(), **kw)
        .select(*_CMP)
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
        .astype({"w": "int64", "h": "int64"})
    )


def _check(spark, t, ref: ReferenceTable):
    got = _content(spark, t)
    exp = ref.to_pandas()
    assert len(got) == len(exp), (len(got), len(exp))
    if len(got):
        pd.testing.assert_frame_equal(
            got, exp[_CMP].reset_index(drop=True).astype({"w": "int64", "h": "int64"}),
            check_dtype=False,
        )


@pytest.fixture()
def table(tmp_path):
    return create_table(
        str(tmp_path / "t"), IMAGES_SCHEMA, properties={BUCKETS_PROP: "8"}
    )


def test_lazy_merge_matches_reference(spark, table):
    gen = CdcScheduleGenerator(seed=7)
    ref = ReferenceTable()
    for sizes in [(150, 0, 0), (40, 50, 20), (20, 35, 30)]:
        b = gen.next_batch(*sizes)
        ref.apply(b)
        res = merge_cdc_batch(
            spark, table, to_spark(spark, b), gen.commit_lsn, mode="lazy"
        )
        assert res.metrics["mode"] == "lazy"
        _check(spark, table, ref)
    # the lazy path really did defer: eq-delete files exist, no DVs
    assert table.entries(content=EQ_DELETES)
    assert not table.delete_entries()


def test_lazy_time_travel_unaffected(spark, table):
    gen = CdcScheduleGenerator(seed=8)
    ref = ReferenceTable()
    b1 = gen.next_batch(100, 0, 0)
    ref.apply(b1)
    merge_cdc_batch(spark, table, to_spark(spark, b1), gen.commit_lsn, mode="lazy")
    before = _content(spark, table)
    snap1 = table.md.current_snapshot().snapshot_id
    b2 = gen.next_batch(0, 40, 25)
    ref.apply(b2)
    merge_cdc_batch(spark, table, to_spark(spark, b2), gen.commit_lsn, mode="lazy")
    # older snapshot has no eq entries -> identical to its original read
    pd.testing.assert_frame_equal(_content(spark, table, snapshot_id=snap1), before)
    _check(spark, table, ref)


def test_compaction_folds_eq_deletes(spark, table):
    gen = CdcScheduleGenerator(seed=9)
    ref = ReferenceTable()
    for sizes in [(120, 0, 0), (30, 45, 20), (10, 30, 25)]:
        b = gen.next_batch(*sizes)
        ref.apply(b)
        merge_cdc_batch(spark, table, to_spark(spark, b), gen.commit_lsn, mode="lazy")
    assert table.entries(content=EQ_DELETES)
    optimize_table(spark, table, mode="full", retain_last=4)
    # folded: content identical, eq files dropped from the live snapshot
    assert not table.refresh().entries(content=EQ_DELETES)
    _check(spark, table, ref)


def test_eager_merge_after_lazy_probes_live_rows(spark, table):
    gen = CdcScheduleGenerator(seed=10)
    ref = ReferenceTable()
    b1 = gen.next_batch(100, 0, 0)
    ref.apply(b1)
    merge_cdc_batch(spark, table, to_spark(spark, b1), gen.commit_lsn, mode="lazy")
    b2 = gen.next_batch(0, 50, 20)
    ref.apply(b2)
    merge_cdc_batch(spark, table, to_spark(spark, b2), gen.commit_lsn, mode="lazy")
    # eager batch on top: its probe must see the eq-filtered state
    b3 = gen.next_batch(15, 30, 10)
    ref.apply(b3)
    res = merge_cdc_batch(spark, table, to_spark(spark, b3), gen.commit_lsn)
    assert res.metrics.get("mode") != "lazy"
    _check(spark, table, ref)


def test_lazy_changelog_replays_events(spark, table, tmp_path):
    """The changelog's deferred key probe yields the same event algebra as
    eager MERGE: applying the change stream to an empty dict reproduces the
    table state."""
    gen = CdcScheduleGenerator(seed=11)
    ref = ReferenceTable()
    for sizes in [(80, 0, 0), (20, 30, 15)]:
        b = gen.next_batch(*sizes)
        ref.apply(b)
        merge_cdc_batch(spark, table, to_spark(spark, b), gen.commit_lsn, mode="lazy")
    ch = scan_changes(spark, table, 0, gen.commit_lsn).toPandas()
    state = {}
    # within one LSN, deletes apply before inserts (upsert decomposition)
    for lsn in sorted(ch["_change_lsn"].unique()):
        w = ch[ch["_change_lsn"] == lsn]
        for _, r in w[w["_change_type"] == "delete"].iterrows():
            state.pop(r["image_id"], None)
        for _, r in w[w["_change_type"] == "insert"].iterrows():
            state[r["image_id"]] = r["caption"]
    exp = ref.to_pandas()
    assert state == dict(zip(exp["image_id"], exp["caption"]))


def test_lazy_merge_idempotent_and_lsn_monotone(spark, table):
    gen = CdcScheduleGenerator(seed=12)
    b = gen.next_batch(40, 0, 0)
    lsn = gen.commit_lsn
    merge_cdc_batch(spark, table, to_spark(spark, b), lsn, mode="lazy")
    assert merge_cdc_batch(spark, table, to_spark(spark, b), lsn, mode="lazy").skipped
    assert scan(spark, table).count() == 40


def test_rewrite_equality_deletes_materializes_dvs(spark, table):
    """The deferred key probe (operators/compact.py rewrite_equality_deletes)
    converts eq keys to positional DVs with NO data rewrite: content
    unchanged, eq files gone, data files byte-identical."""
    from moonlink_spark.operators.compact import rewrite_equality_deletes

    gen = CdcScheduleGenerator(seed=14)
    ref = ReferenceTable()
    for sizes in [(100, 0, 0), (25, 40, 15), (10, 20, 20)]:
        b = gen.next_batch(*sizes)
        ref.apply(b)
        merge_cdc_batch(spark, table, to_spark(spark, b), gen.commit_lsn, mode="lazy")
    data_before = sorted(e.path for e in table.data_entries())
    res = rewrite_equality_deletes(spark, table)
    assert not res.skipped
    table.refresh()
    assert not table.entries(content=EQ_DELETES)
    assert table.delete_entries()  # keys became positional DVs
    assert sorted(e.path for e in table.data_entries()) == data_before
    _check(spark, table, ref)
    # a later eager merge probes the DV-applied state correctly
    b = gen.next_batch(10, 15, 5)
    ref.apply(b)
    merge_cdc_batch(spark, table, to_spark(spark, b), gen.commit_lsn)
    _check(spark, table, ref)


def test_merge_mode_table_property(spark, tmp_path):
    """A table declaring moonlink.merge.mode=lazy makes every un-annotated
    MERGE (sync, service, streaming front-ends) take the lazy path."""
    from moonlink_spark.operators.merge import MERGE_MODE_PROP

    t = create_table(
        str(tmp_path / "lzt"),
        IMAGES_SCHEMA,
        properties={MERGE_MODE_PROP: "lazy"},
    )
    gen = CdcScheduleGenerator(seed=15)
    ref = ReferenceTable()
    for sizes in [(60, 0, 0), (10, 20, 10)]:
        b = gen.next_batch(*sizes)
        ref.apply(b)
        res = merge_cdc_batch(spark, t, to_spark(spark, b), gen.commit_lsn)
        assert res.metrics["mode"] == "lazy"
    assert t.entries(content=EQ_DELETES)
    _check(spark, t, ref)


def test_auto_optimize_resolves_eq_deletes(spark, table):
    from moonlink_spark.operators.maintenance import auto_optimize

    gen = CdcScheduleGenerator(seed=16)
    ref = ReferenceTable()
    for sizes in [(80, 0, 0), (10, 25, 10)]:
        b = gen.next_batch(*sizes)
        ref.apply(b)
        merge_cdc_batch(spark, table, to_spark(spark, b), gen.commit_lsn, mode="lazy")
    table.set_properties({"moonlink.resolve-eq-deletes.min-files": "1"})
    rep = auto_optimize(spark, table)
    assert "resolve-eq-deletes" in rep.triggered
    assert not table.refresh().entries(content=EQ_DELETES)
    _check(spark, table, ref)


def test_narrow_projection_with_live_eq_deletes(spark, table):
    """A scan whose projection EXCLUDES the identity key must still apply
    live equality deletes (the keys are read internally for the anti-join,
    then dropped) — regression: the join condition used to reference a
    column the narrow read never selected."""
    gen = CdcScheduleGenerator(seed=17)
    ref = ReferenceTable()
    for sizes in [(60, 0, 0), (10, 20, 15)]:
        b = gen.next_batch(*sizes)
        ref.apply(b)
        merge_cdc_batch(spark, table, to_spark(spark, b), gen.commit_lsn, mode="lazy")
    assert table.entries(content=EQ_DELETES)
    got = sorted(
        r["caption"] for r in scan(spark, table, columns=["caption"]).collect()
    )
    assert got == sorted(ref.to_pandas()["caption"])
    # projection shape untouched: only the asked-for column comes back
    assert scan(spark, table, columns=["caption"]).columns == ["caption"]


def test_unknown_mode_rejected(spark, table):
    gen = CdcScheduleGenerator(seed=13)
    b = gen.next_batch(5, 0, 0)
    with pytest.raises(ValueError, match="mode"):
        merge_cdc_batch(spark, table, to_spark(spark, b), gen.commit_lsn, mode="bogus")
