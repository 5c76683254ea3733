"""Bucket-layout rescale (operators/rebucket.py) and the layout-property
guard: `write.buckets` can only change through a full rewrite, because the
MERGE probe recomputes bucket ids with the table's CURRENT count while files
persist ids from write time (persisted_bucket_hash_map.rs:73-93 fixes
num_buckets per index file for the same reason)."""

import pytest
from pyspark.sql import functions as F

from moonlink_spark.cdc import CdcScheduleGenerator, ReferenceTable, to_spark
from moonlink_spark.operators.maintenance import optimize_table
from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.operators.rebucket import rebucket_table
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.scan import scan
from moonlink_spark.table.writer import BUCKETS_PROP, table_buckets


def _fill(spark, t, gen, ref, batches):
    for sizes in batches:
        b = gen.next_batch(*sizes)
        ref.apply(b)
        merge_cdc_batch(spark, t, to_spark(spark, b), gen.commit_lsn)


def _captions(spark, t):
    return dict(
        scan(spark, t.refresh(), columns=["image_id", "caption"])
        .toPandas()
        .itertuples(index=False, name=None)
    )


@pytest.fixture()
def table(tmp_path):
    return create_table(
        str(tmp_path / "t"), IMAGES_SCHEMA, properties={BUCKETS_PROP: "4"}
    )


def test_rebucket_rescales_layout_and_preserves_content(spark, table):
    gen = CdcScheduleGenerator(seed=31)
    ref = ReferenceTable()
    _fill(spark, table, gen, ref, [(200, 0, 0), (30, 60, 25)])
    optimize_table(spark, table, mode="full", retain_last=4)  # bucket-pure @4

    res = rebucket_table(spark, table, 16)
    assert not res.skipped and res.old_buckets == 4
    table.refresh()
    assert table_buckets(table) == 16
    # every file re-hashed into the new layout, ids within range, blooms on
    for e in table.data_entries():
        assert e.bucket is not None and 0 <= e.bucket < 16
    assert not table.delete_entries()  # folded by the rewrite
    exp = ref.to_pandas()
    assert _captions(spark, table) == dict(zip(exp["image_id"], exp["caption"]))

    # a MERGE against the rescaled layout probes correctly (build == probe)
    b = gen.next_batch(10, 25, 10)
    ref.apply(b)
    r = merge_cdc_batch(spark, table, to_spark(spark, b), gen.commit_lsn)
    assert r.matched > 0
    exp = ref.to_pandas()
    assert _captions(spark, table) == dict(zip(exp["image_id"], exp["caption"]))


def test_rebucket_bucketizes_plain_table(spark, tmp_path):
    t = create_table(str(tmp_path / "p"), IMAGES_SCHEMA)  # no bucket layout
    gen = CdcScheduleGenerator(seed=32)
    ref = ReferenceTable()
    _fill(spark, t, gen, ref, [(120, 0, 0)])
    res = rebucket_table(spark, t, 8)
    assert res.old_buckets is None and table_buckets(t.refresh()) == 8
    assert all(e.bucket is not None for e in t.data_entries())
    exp = ref.to_pandas()
    assert _captions(spark, t) == dict(zip(exp["image_id"], exp["caption"]))


def test_rebucket_same_count_noop_and_empty_table(spark, tmp_path, table):
    assert rebucket_table(spark, table, 4).skipped  # no data, same count
    empty = create_table(
        str(tmp_path / "e"), IMAGES_SCHEMA, properties={BUCKETS_PROP: "4"}
    )
    res = rebucket_table(spark, empty, 8)  # metadata-only flip
    assert res.out_files == 0 and table_buckets(empty.refresh()) == 8


def test_set_properties_refuses_layout_drift(spark, table):
    """Direct ALTER of write.buckets / write.bucket-key / identity on a
    table with live data is refused — only the rewrite operators may change
    layout (silent bucket-id desync otherwise)."""
    gen = CdcScheduleGenerator(seed=33)
    b = gen.next_batch(50, 0, 0)
    merge_cdc_batch(spark, table, to_spark(spark, b), gen.commit_lsn)
    optimize_table(spark, table, mode="data")
    for bad in (
        {BUCKETS_PROP: "8"},
        {"write.bucket-key": "phash"},
        {"moonlink.identity-keys": "phash"},
    ):
        with pytest.raises(ValueError, match="layout"):
            table.set_properties(bad)
    # no-op "change" to the same value stays allowed
    table.set_properties({BUCKETS_PROP: "4"})
    # unrelated properties unaffected
    table.set_properties({"moonlink.compaction.min-files": "4"})
