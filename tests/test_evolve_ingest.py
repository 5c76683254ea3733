"""Schema evolution (O18) + bulk file ingest (O22) tests."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField

from moonlink_spark.cdc import CdcScheduleGenerator, to_spark
from moonlink_spark.datagen import generate_images
from moonlink_spark.operators.evolve import add_columns, drop_columns
from moonlink_spark.operators.ingest import add_files
from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.scan import scan


@pytest.fixture()
def table(tmp_path):
    return create_table(str(tmp_path / "t"), IMAGES_SCHEMA)


def _load(spark, table, n=60):
    gen = CdcScheduleGenerator(seed=11)
    b = gen.next_batch(n, 0, 0)
    merge_cdc_batch(spark, table, to_spark(spark, b), gen.commit_lsn)
    return gen


def test_add_column_reads_null_on_old_files(spark, table):
    _load(spark, table, 50)
    add_columns(table, [StructField("license", StringType(), True)])
    df = scan(spark, table)
    assert "license" in df.columns
    assert df.filter(F.col("license").isNull()).count() == 50


def test_drop_column_projects_away(spark, table):
    _load(spark, table, 30)
    drop_columns(table, ["caption"])
    df = scan(spark, table)
    assert "caption" not in df.columns
    assert df.count() == 30
    # re-adding the name is SAFE on field-id tables (new id, old files read
    # NULL — see test_fieldids.py for the full matrix)
    add_columns(table, [StructField("caption", StringType(), True)])
    assert scan(spark, table).filter(F.col("caption").isNotNull()).count() == 0
    # merge key is protected
    with pytest.raises(ValueError, match="identity/bucket-layout"):
        drop_columns(table, ["image_id"])


def test_add_column_then_merge_new_rows_have_it(spark, table):
    gen = _load(spark, table, 20)
    add_columns(table, [StructField("score", LongType(), True)])
    # CDC batches now carry the new column
    b = gen.next_batch(10, 0, 0)
    b["score"] = range(len(b))
    from pyspark.sql.types import StructType

    cdc_schema = StructType(
        [StructField("op", StringType(), False), StructField("lsn", LongType(), False)]
        + table.schema.fields
    )
    sdf = spark.createDataFrame(b[[f.name for f in cdc_schema.fields]], cdc_schema)
    merge_cdc_batch(spark, table, sdf, gen.commit_lsn)
    df = scan(spark, table)
    assert df.count() == 30
    assert df.filter(F.col("score").isNotNull()).count() == 10


def test_add_files_adopts_without_rewrite(spark, table, tmp_path):
    ext = str(tmp_path / "external")
    generate_images(spark, 40, partitions=2).write.parquet(ext)
    paths = sorted(
        os.path.join(ext, p) for p in os.listdir(ext) if p.endswith(".parquet")
    )
    res = add_files(spark, table, paths, lsn=5)
    assert res.files == len(paths) and res.rows == 40
    # adopted in place: the table references the external paths directly
    assert {e.path for e in table.data_entries()} == set(paths)
    assert scan(spark, table).count() == 40
    # stats were collected from footers -> MERGE pruning works
    e = table.data_entries()[0]
    assert e.stats.get("image_id", {}).get("min") is not None
    # double-adopt is rejected
    with pytest.raises(ValueError, match="already referenced"):
        add_files(spark, table, paths)


def test_add_files_schema_mismatch_rejected(spark, table, tmp_path):
    bad = str(tmp_path / "bad")
    spark.range(10).withColumnRenamed("id", "not_a_column").write.parquet(bad)
    paths = [
        os.path.join(bad, p) for p in os.listdir(bad) if p.endswith(".parquet")
    ]
    with pytest.raises(ValueError, match="not in the table schema"):
        add_files(spark, table, paths)


def test_merge_works_after_add_files(spark, table, tmp_path):
    ext = str(tmp_path / "external")
    generate_images(spark, 30, partitions=1).write.parquet(ext)
    paths = [os.path.join(ext, p) for p in os.listdir(ext) if p.endswith(".parquet")]
    add_files(spark, table, paths, lsn=1)
    # delete 5 adopted rows via CDC
    gen = CdcScheduleGenerator(seed=13)
    gen.next_new = 30
    gen.live = {i: 0 for i in range(30)}
    gen.next_lsn = 2
    b = gen.next_batch(0, 0, 5)
    merge_cdc_batch(spark, table, to_spark(spark, b), gen.commit_lsn)
    assert scan(spark, table).count() == 25


def test_add_files_foreign_field_ids_scan_by_name(spark, table, tmp_path):
    """A foreign parquet whose footer carries its OWN (mismatched) field ids
    must take the name-resolved scan branch — id-resolving it against the
    table's ids would silently read every column as NULL."""
    from moonlink_spark.table.fieldids import (
        NO_FIELD_IDS_STAT,
        assign_field_ids,
        stamp_field_ids,
    )

    ext = str(tmp_path / "foreign")
    df = generate_images(spark, 25, partitions=1)
    # stamp ids starting at 100 — valid ids, but disagreeing with the table's
    foreign_schema = assign_field_ids(
        type(IMAGES_SCHEMA)([StructField(f.name, f.dataType, f.nullable) for f in IMAGES_SCHEMA.fields]),
        start=100,
    )
    stamp_field_ids(df, foreign_schema).write.parquet(ext)
    paths = [os.path.join(ext, p) for p in os.listdir(ext) if p.endswith(".parquet")]
    add_files(spark, table, paths, lsn=1)
    # classified name-resolved, NOT id-resolvable
    for e in table.data_entries():
        assert e.stats.get(NO_FIELD_IDS_STAT) is True
    out = scan(spark, table)
    assert out.count() == 25
    # values come back (the pre-fix failure mode was 25 all-NULL rows)
    assert out.filter(F.col("caption").isNull()).count() == 0
    assert out.filter(F.col("image_id").isNull()).count() == 0


def test_add_files_matching_field_ids_stay_id_resolved(spark, table, tmp_path):
    """A file stamped with the TABLE's own ids (e.g. exported from this
    table) keeps the id-resolved branch."""
    from moonlink_spark.table.fieldids import NO_FIELD_IDS_STAT, stamp_field_ids

    ext = str(tmp_path / "samefmt")
    stamp_field_ids(generate_images(spark, 10, partitions=1), table.schema).write.parquet(ext)
    paths = [os.path.join(ext, p) for p in os.listdir(ext) if p.endswith(".parquet")]
    add_files(spark, table, paths, lsn=1)
    for e in table.data_entries():
        assert not e.stats.get(NO_FIELD_IDS_STAT)
    assert scan(spark, table).filter(F.col("caption").isNull()).count() == 0


# ---- rename-column (metadata-only, field-id resolution) ----


def test_rename_column_keeps_old_values(spark, table):
    gen = _load(spark, table, 40)
    from moonlink_spark.operators.evolve import rename_column

    rename_column(table, "caption", "title")
    df = scan(spark, table)
    assert "title" in df.columns and "caption" not in df.columns
    # values written under the old name resolve by field id
    assert df.filter(F.col("title").isNotNull()).count() == 40
    # writes after the rename land under the new name and merge cleanly
    b = gen.next_batch(5, 5, 0)
    b = b.rename(columns={"caption": "title"})
    merge_cdc_batch(spark, table, to_spark_renamed(spark, table, b), gen.commit_lsn)
    df = scan(spark, table)
    assert df.count() == 45
    assert df.filter(F.col("title").isNull()).count() == 0


def to_spark_renamed(spark, table, pdf):
    from pyspark.sql.types import StructType

    cdc_schema = StructType(
        [StructField("op", StringType(), False), StructField("lsn", LongType(), False)]
        + table.schema.fields
    )
    return spark.createDataFrame(pdf[[f.name for f in cdc_schema.fields]], cdc_schema)


def test_rename_identity_column_updates_layout_props(spark, tmp_path):
    from moonlink_spark.operators.evolve import rename_column
    from moonlink_spark.operators.maintenance import optimize_table
    from moonlink_spark.schema import table_identity
    from moonlink_spark.table.writer import BUCKETS_PROP, table_bucket_key

    t = create_table(str(tmp_path / "b"), IMAGES_SCHEMA, properties={BUCKETS_PROP: "4"})
    gen = _load(spark, t, 60)
    optimize_table(spark, t, mode="full")  # bucketize + blooms over image_id
    rename_column(t, "image_id", "img_key")
    assert table_identity(t) == ["img_key"]
    assert table_bucket_key(t) == ["img_key"]
    # MERGE on the renamed key still prunes through the bucketed layout
    b = gen.next_batch(0, 10, 5)
    b = b.rename(columns={"image_id": "img_key"})
    res = merge_cdc_batch(spark, t, to_spark_renamed(spark, t, b), gen.commit_lsn)
    assert res.metrics["matched"] == 15  # 10 updates + 5 deletes hit live rows
    df = scan(spark, t)
    assert df.count() == 55
    assert df.filter(F.col("img_key").isNull()).count() == 0


def test_rename_guards(spark, table, tmp_path):
    from moonlink_spark.operators.evolve import rename_column

    _load(spark, table, 10)
    with pytest.raises(ValueError, match="no such column"):
        rename_column(table, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        rename_column(table, "caption", "w")
    # name-resolved foreign files block renames
    ext = str(tmp_path / "ext")
    generate_images(spark, 5, partitions=1).write.parquet(ext)
    paths = [os.path.join(ext, p) for p in os.listdir(ext) if p.endswith(".parquet")]
    add_files(spark, table, paths, lsn=99)
    with pytest.raises(ValueError, match="without parquet field ids"):
        rename_column(table, "caption", "title")


def test_rename_blocked_by_live_eq_deletes(spark, tmp_path):
    from moonlink_spark.operators.compact import rewrite_equality_deletes
    from moonlink_spark.operators.evolve import rename_column

    t = create_table(str(tmp_path / "e"), IMAGES_SCHEMA)
    gen = _load(spark, t, 30)
    b = gen.next_batch(0, 0, 5)
    merge_cdc_batch(spark, t, to_spark(spark, b), gen.commit_lsn, mode="lazy")
    with pytest.raises(ValueError, match="equality-delete"):
        rename_column(t, "image_id", "img_key")
    rewrite_equality_deletes(spark, t)
    rename_column(t, "image_id", "img_key")
    assert scan(spark, t).count() == 25


# ---- widen-column (in-place type promotion) ----


def test_widen_column_promotes_old_files(spark, tmp_path):
    from pyspark.sql.types import IntegerType

    from moonlink_spark.operators.evolve import widen_column

    t = create_table(str(tmp_path / "w"), IMAGES_SCHEMA)
    gen = _load(spark, t, 20)
    assert isinstance(t.schema["w"].dataType, IntegerType)
    widen_column(t, "w", LongType())
    df = scan(spark, t)
    assert dict(df.dtypes)["w"] == "bigint"
    assert df.filter(F.col("w").isNull()).count() == 0
    total_before = df.agg(F.sum("w")).collect()[0][0]
    # merges after the widen write the wide type; old+new files co-scan
    b = gen.next_batch(10, 0, 0)
    b["w"] = b["w"].astype("int64")
    merge_cdc_batch(spark, t, to_spark_renamed(spark, t, b), gen.commit_lsn)
    df = scan(spark, t)
    assert df.count() == 30 and dict(df.dtypes)["w"] == "bigint"
    assert df.agg(F.sum("w")).collect()[0][0] > total_before


def test_widen_guards(spark, table):
    from pyspark.sql.types import IntegerType

    from moonlink_spark.operators.evolve import widen_column

    _load(spark, table, 10)
    with pytest.raises(ValueError, match="identity/bucket-layout"):
        widen_column(table, "image_id", LongType())
    with pytest.raises(ValueError, match="unsupported type promotion"):
        widen_column(table, "w", IntegerType())  # same type
    with pytest.raises(ValueError, match="unsupported type promotion"):
        widen_column(table, "h", StringType())  # narrowing/sideways


def test_replica_follows_rename_and_widen(spark, tmp_path):
    from moonlink_spark.operators.evolve import rename_column, widen_column
    from moonlink_spark.operators.sync import sync_table

    src = create_table(str(tmp_path / "src"), IMAGES_SCHEMA)
    dst = create_table(str(tmp_path / "dst"), IMAGES_SCHEMA)
    gen = _load(spark, src, 25)
    sync_table(spark, src, dst)
    assert scan(spark, dst).count() == 25
    rename_column(src, "caption", "title")
    widen_column(src, "h", LongType())
    b = gen.next_batch(5, 5, 0)
    b = b.rename(columns={"caption": "title"})
    b["h"] = b["h"].astype("int64")
    merge_cdc_batch(spark, src, to_spark_renamed(spark, src, b), gen.commit_lsn)
    sync_table(spark, src, dst)
    ddf = scan(spark, dst)
    assert "title" in ddf.columns and dict(ddf.dtypes)["h"] == "bigint"
    # pre-rename rows kept their values under the new name (NOT nulled by a
    # drop+add degradation)
    assert ddf.filter(F.col("title").isNull()).count() == 0
    assert ddf.count() == 30
