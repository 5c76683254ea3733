"""Parquet manifests + distributed scan planning (metadata-as-data)."""

import json

import pytest
from pyspark.sql import functions as F

import moonlink_spark.table.format as fmt_mod
from moonlink_spark.cdc import CdcScheduleGenerator, ReferenceTable, to_spark
from moonlink_spark.operators.maintenance import optimize_table
from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.format import MANIFEST_FORMAT_PROP, read_manifest
from moonlink_spark.table.planning import plan_data_candidates, plannable
from moonlink_spark.table.scan import prune_entries, scan
from moonlink_spark.table.writer import BUCKETS_PROP, bucket_id


@pytest.fixture()
def ptable(tmp_path):
    """Bucketed table whose manifests are parquet from the first commit."""
    return create_table(
        str(tmp_path / "pt"),
        IMAGES_SCHEMA,
        properties={MANIFEST_FORMAT_PROP: "parquet", BUCKETS_PROP: "4"},
    )


def _load(spark, table, seed=11, batches=((200, 0, 0), (40, 60, 30))):
    gen = CdcScheduleGenerator(seed=seed)
    ref = ReferenceTable()
    for sizes in batches:
        b = gen.next_batch(*sizes)
        ref.apply(b)
        merge_cdc_batch(spark, table, to_spark(spark, b), gen.commit_lsn)
    return gen, ref


def test_parquet_manifest_lifecycle(spark, ptable):
    """merge -> maintenance -> scan with parquet manifests end-to-end."""
    gen, ref = _load(spark, ptable)
    snap = ptable.md.current_snapshot()
    assert all(m.endswith(".parquet") for m in snap.manifests)
    optimize_table(spark, ptable, mode="full")
    snap = ptable.md.current_snapshot()
    assert all(m.endswith(".parquet") for m in snap.manifests)
    got = (
        scan(spark, ptable)
        .select("image_id", "caption")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    exp = ref.to_pandas()[["image_id", "caption"]].reset_index(drop=True)
    assert got.equals(exp)


def test_parquet_manifest_roundtrip_preserves_stats(spark, ptable):
    _load(spark, ptable)
    entries = ptable.data_entries()
    assert entries
    for e in entries:
        # stats dicts survive the JSON-string column round trip exactly
        assert isinstance(e.stats, dict)
        assert "image_id" in e.stats, e.stats
        assert e.stats["image_id"]["min"] <= e.stats["image_id"]["max"]


def test_plan_distributed_matches_driver_prune(spark, ptable):
    _load(spark, ptable)
    optimize_table(spark, ptable, mode="full")  # bucketize -> bucket-pure files
    all_data = ptable.data_entries()
    assert any(e.bucket is not None for e in all_data)
    lo, hi = "img-0001", "img-0400"
    buckets = {0, 2}
    assert plannable(ptable)
    planned, total = plan_data_candidates(
        spark, ptable, "image_id", lo, hi, batch_buckets=buckets
    )
    assert total == len(all_data)
    drv = [e for e in all_data if e.bucket is None or e.bucket in buckets]
    drv = prune_entries(drv, "image_id", lo, hi)
    assert sorted(e.path for e in planned) == sorted(e.path for e in drv)
    # full entry fidelity, not just paths (bloom refs ride in stats)
    by_path = {e.path: e for e in drv}
    for p in planned:
        d = by_path[p.path]
        assert (p.record_count, p.file_size_bytes, p.bucket, p.stats) == (
            d.record_count,
            d.file_size_bytes,
            d.bucket,
            d.stats,
        )


def test_merge_uses_distributed_planning(spark, ptable):
    """End-to-end MERGE correctness with the distributed planner engaged."""
    gen, ref = _load(spark, ptable)
    optimize_table(spark, ptable, mode="full")
    assert plannable(ptable)
    b = gen.next_batch(20, 30, 10)
    ref.apply(b)
    res = merge_cdc_batch(spark, ptable, to_spark(spark, b), gen.commit_lsn)
    assert res.metrics["total_data_files"] == len(ptable.data_entries(
        ptable.md.current_snapshot().parent_id
    ))
    got = (
        scan(spark, ptable)
        .select("image_id", "caption")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    exp = ref.to_pandas()[["image_id", "caption"]].reset_index(drop=True)
    assert got.equals(exp)


def test_json_table_not_plannable_but_merge_still_works(spark, tmp_path):
    t = create_table(str(tmp_path / "jt"), IMAGES_SCHEMA)
    gen, ref = _load(spark, t)
    assert not plannable(t)  # json manifests -> driver-side pruning
    snap = t.md.current_snapshot()
    assert all(m.endswith(".json") for m in snap.manifests)


@pytest.mark.parametrize("mode", ["best_effort", "force_regular", "full"])
def test_plan_compaction_matches_driver_selection(spark, ptable, mode):
    """Distributed compaction candidate selection == select_candidates for
    every trigger mode, on a table with deletes + unbucketed files."""
    from moonlink_spark.operators.compact import (
        _delete_counts,
        _delete_counts_df,
        select_candidates,
    )
    from moonlink_spark.table.planning import plan_compaction_candidates

    _load(spark, ptable)  # merges leave unbucketed inserts + delete files
    del_counts = _delete_counts(spark, ptable)
    kw = dict(
        mode=mode,
        target_bytes=1 << 20,
        min_files=2,
        max_files=3,
        delete_ratio=0.01,
    )
    planned = plan_compaction_candidates(
        spark, ptable, _delete_counts_df(spark, ptable), bucketed=True, **kw
    )
    assert planned is not None
    drv = select_candidates(ptable, del_counts, **kw)
    assert [e.path for e in planned] == [e.path for e in drv] or sorted(
        e.path for e in planned
    ) == sorted(e.path for e in drv)
    if mode != "full":  # ordered paths must agree exactly after sort+limit
        assert [e.path for e in planned] == [e.path for e in drv]


def test_scan_range_distributed_and_driver_agree(spark, ptable, tmp_path):
    """scan_range returns identical rows through the distributed planner
    (parquet manifests) and the driver-side prune (json manifests), and
    matches a plain scan + filter."""
    from moonlink_spark.table.scan import scan_range

    gen, ref = _load(spark, ptable)
    jt = create_table(str(tmp_path / "jt2"), IMAGES_SCHEMA)
    _load(spark, jt)  # same seed -> identical content
    lo, hi = "img000000000050", "img000000000150"

    exp = (
        scan(spark, ptable)
        .filter((F.col("image_id") >= lo) & (F.col("image_id") <= hi))
        .select("image_id", "caption")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert len(exp) > 0
    for t in (ptable, jt):
        got = (
            scan_range(spark, t, "image_id", lo, hi)
            .select("image_id", "caption")
            .toPandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        assert got.equals(exp), t.md.properties


def test_auto_upgrade_to_parquet_above_threshold(tmp_path, monkeypatch):
    """A JSON-format table still writes parquet manifests past the entry
    count where a single JSON document becomes a driver hazard."""
    monkeypatch.setattr(fmt_mod, "PARQUET_MANIFEST_AUTO_MIN", 3)
    from moonlink_spark.table.format import FileEntry, write_manifest

    entries = [
        FileEntry("data", f"/x/f{i}.parquet", 10, 100, 1, stats={"image_id": {"min": "a", "max": "b", "nulls": 0}})
        for i in range(5)
    ]
    p = write_manifest(str(tmp_path), 1, entries)
    assert p.endswith(".parquet")
    back = read_manifest(p)
    assert [e.to_dict() for e in back] == [e.to_dict() for e in entries]
