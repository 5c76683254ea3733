"""Metadata inspection tables (table/inspect.py)."""

import pytest
from pyspark.sql import functions as F

from moonlink_spark.datagen import generate_images
from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.table import inspect
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.format import MANIFEST_FORMAT_PROP
from moonlink_spark.table.writer import write_data_files
from moonlink_spark.schema import IMAGES_SCHEMA


@pytest.fixture()
def table(spark, tmp_path):
    t = create_table(str(tmp_path / "tbl"), IMAGES_SCHEMA)
    df = generate_images(spark, 200, partitions=2)
    t.commit(
        "append",
        added=write_data_files(spark, df, t.new_data_dir(), max_records_per_file=50),
        lsn=10,
    )
    cdc = (
        generate_images(spark, 40, partitions=2)
        .withColumn("op", F.when(F.col("phash") % 4 == 0, F.lit("D")).otherwise(F.lit("U")))
        .withColumn("lsn", F.lit(20))
    )
    merge_cdc_batch(spark, t, cdc, lsn=20)
    return t


def test_snapshots_and_history(spark, table):
    snaps = inspect.snapshots(spark, table)
    rows = {r.operation: r for r in snaps.collect()}
    assert "append" in rows and "merge" in rows
    assert rows["merge"].lsn == 20
    assert rows["merge"].parent_id == rows["append"].snapshot_id

    hist = inspect.history(spark, table).collect()
    assert all(r.is_current_ancestor for r in hist)
    assert [r.snapshot_id for r in hist] == sorted(r.snapshot_id for r in hist)


def test_history_flags_rolled_back_commits(spark, table):
    table.rollback(lsn=10)
    hist = {r.lsn: r.is_current_ancestor for r in inspect.history(spark, table).collect()}
    assert hist[20] is False  # undone merge forks off the lineage
    assert hist[10] is True


def test_files_matches_entries_and_filters(spark, table):
    fdf = inspect.files(spark, table)
    by_content = {r["content"]: r["count"] for r in fdf.groupBy("content").count().collect()}
    assert by_content["data"] == len(table.data_entries())
    assert by_content.get("deletes", 0) == len(table.delete_entries())
    dels = inspect.delete_files(spark, table)
    assert dels.count() == len(table.delete_entries())
    # stats ride along as JSON for ad-hoc pruning queries
    one = fdf.filter(F.col("content") == "data").first()
    assert one.stats is None or "image_id" in one.stats


def test_files_distributed_on_parquet_manifests(spark, tmp_path):
    t = create_table(
        str(tmp_path / "ptbl"),
        IMAGES_SCHEMA,
        properties={MANIFEST_FORMAT_PROP: "parquet"},
    )
    df = generate_images(spark, 120, partitions=2)
    t.commit(
        "append",
        added=write_data_files(spark, df, t.new_data_dir(), max_records_per_file=40),
        lsn=5,
    )
    fdf = inspect.files(spark, t, content="data")
    assert fdf.count() == len(t.data_entries())
    # the plan reads the manifests as parquet (no LocalTableScan of a
    # driver-collected list)
    assert "FileScan parquet" in fdf._jdf.queryExecution().executedPlan().toString()


def test_manifests_listing(spark, table):
    mdf = inspect.manifests(spark, table).collect()
    assert len(mdf) == len(table.md.current_snapshot().manifests)
    assert sum(r.entry_count for r in mdf) == len(table.entries())
