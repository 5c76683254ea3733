"""remove_orphan_files: a crashed job's uncommitted output is GC'd; every
retained snapshot's files (and bloom sidecars) survive untouched."""

import os

from pyspark.sql import functions as F

from moonlink_spark.datagen import generate_images
from moonlink_spark.operators.orphans import remove_orphan_files
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.scan import scan, scan_at_lsn
from moonlink_spark.table.writer import (
    BUCKETS_PROP,
    write_bucketed_data_files,
    write_data_files,
)


def _base_table(spark, tmp_path, n=120):
    t = create_table(str(tmp_path / "t"), IMAGES_SCHEMA, properties={BUCKETS_PROP: "4"})
    entries = write_bucketed_data_files(
        spark, generate_images(spark, n, partitions=4), t.new_data_dir(),
        "image_id", 4, max_records_per_file=50,
    )
    t.commit("append", added=entries, lsn=1)
    return t


def test_crashed_job_orphans_swept_exactly(spark, tmp_path):
    t = _base_table(spark, tmp_path)
    live_before = {e.path for e in t.data_entries()}
    n_before = scan(spark, t).count()

    # crash simulation: a merge wrote data files but died before its CAS
    # commit — the files are on disk, referenced by nothing
    orphan_dir = t.new_data_dir()
    write_data_files(spark, generate_images(spark, 30, partitions=1), orphan_dir)
    orphan_files = {
        os.path.join(r, f) for r, _, fs in os.walk(orphan_dir) for f in fs
    }
    assert orphan_files

    res = remove_orphan_files(t, grace_ms=0)
    assert set(res.deleted_paths) >= {p for p in orphan_files if p.endswith(".parquet")}
    # everything deleted was an orphan: no live file touched
    assert not set(res.deleted_paths) & live_before
    for p in live_before:
        assert os.path.exists(p)
    # table content and time travel unaffected
    assert scan(spark, t).count() == n_before
    assert scan_at_lsn(spark, t, lsn=1).count() == n_before


def test_grace_period_protects_inflight_writes(spark, tmp_path):
    t = _base_table(spark, tmp_path, n=40)
    write_data_files(spark, generate_images(spark, 10, partitions=1), t.new_data_dir())
    res = remove_orphan_files(t)  # default 3h grace: fresh files are young
    assert res.deleted == 0 and res.skipped_young > 0


def test_dry_run_reports_without_deleting(spark, tmp_path):
    t = _base_table(spark, tmp_path, n=40)
    write_data_files(spark, generate_images(spark, 10, partitions=1), t.new_data_dir())
    res = remove_orphan_files(t, grace_ms=0, dry_run=True)
    assert res.deleted > 0
    for p in res.deleted_paths:
        assert os.path.exists(p)
    res2 = remove_orphan_files(t, grace_ms=0)
    assert set(res2.deleted_paths) == set(res.deleted_paths)


def test_referenced_bloom_sidecars_survive(spark, tmp_path):
    from moonlink_spark.table.bloom import bloom_sidecar_path

    t = _base_table(spark, tmp_path, n=60)
    sidecars = {bloom_sidecar_path(e) for e in t.data_entries()} - {None}
    assert sidecars
    res = remove_orphan_files(t, grace_ms=0)
    assert not set(res.deleted_paths) & sidecars
    for p in sidecars:
        assert os.path.exists(p)
    # the table still scans with blooms intact
    assert scan(spark, t).filter(F.col("image_id").isNotNull()).count() == 60
