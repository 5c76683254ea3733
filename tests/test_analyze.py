"""ANALYZE: column statistics puffin — exactness, NDV error, lifecycle."""

import pytest
from pyspark.sql import functions as F

from moonlink_spark.operators.analyze import (
    STATS_PATH_PROP,
    analyze_table,
    stats_dataframe,
    table_stats,
)
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.writer import write_data_files


def _img_rows(spark, n, null_every=None):
    cap = F.format_string("cap %d", F.col("id") % 500)
    if null_every:
        cap = F.when(F.col("id") % null_every == 0, None).otherwise(cap)
    return spark.range(n).select(
        F.format_string("id%06d", F.col("id")).alias("image_id"),
        F.encode(F.format_string("b%d", F.col("id") % 50), "utf-8").alias("bytes"),
        (F.col("id") % 100).cast("int").alias("w"),
        F.lit(32).cast("int").alias("h"),
        F.lit("png").alias("fmt"),
        cap.alias("caption"),
        (F.col("id") % 1000).cast("long").alias("phash"),
    )


@pytest.fixture()
def atable(spark, tmp_path):
    t = create_table(str(tmp_path / "at"), IMAGES_SCHEMA)
    df = _img_rows(spark, 5000, null_every=10)
    t.commit("append", added=write_data_files(spark, df, t.new_data_dir()), lsn=1)
    return t


def test_analyze_exact_fields(spark, atable):
    res = analyze_table(spark, atable)
    assert res.row_count == 5000
    assert res.columns["caption"]["null_count"] == 500
    assert res.columns["image_id"]["null_count"] == 0
    # byte sizes exact for sized types
    assert res.columns["fmt"]["total_size_bytes"] == 3 * 5000
    # ints have no size stat
    assert "total_size_bytes" not in res.columns["w"]


def test_analyze_ndv_within_hll_error(spark, atable):
    res = analyze_table(spark, atable)
    truth = {"image_id": 5000, "w": 100, "h": 1, "fmt": 1, "phash": 1000}
    for c, exact in truth.items():
        ndv = res.columns[c]["ndv"]
        assert abs(ndv - exact) <= max(2, 0.1 * exact), (c, ndv, exact)


def test_stats_roundtrip_and_supersede(spark, atable):
    r1 = analyze_table(spark, atable)
    got = table_stats(atable)
    assert got is not None
    snap_id, rows, cols = got
    assert snap_id == r1.snapshot_id and rows == 5000
    assert cols["caption"]["null_count"] == 500

    # new commit + re-analyze supersedes the old stats file
    df = _img_rows(spark, 100).withColumn(
        "image_id", F.concat(F.lit("x"), F.col("image_id"))
    )
    atable.commit(
        "append", added=write_data_files(spark, df, atable.new_data_dir()), lsn=2
    )
    r2 = analyze_table(spark, atable)
    assert r2.snapshot_id > r1.snapshot_id and r2.row_count == 5100
    import os

    assert not os.path.exists(r1.path)  # eager supersede
    assert atable.md.properties[STATS_PATH_PROP] == r2.path


def test_stats_dataframe_surface(spark, atable):
    analyze_table(spark, atable)
    pdf = stats_dataframe(spark, atable).toPandas().set_index("column")
    assert pdf.loc["caption", "null_count"] == 500
    assert pdf.loc["image_id", "row_count"] == 5000
    assert pdf.loc["w", "ndv"] is not None


def test_analyze_unknown_column_rejected(spark, atable):
    with pytest.raises(ValueError, match="unknown columns"):
        analyze_table(spark, atable, columns=["nope"])


def test_inspect_stats_surface(spark, atable):
    from moonlink_spark import inspect_stats

    analyze_table(spark, atable)
    pdf = inspect_stats(spark, atable).toPandas().set_index("column")
    assert pdf.loc["caption", "null_count"] == 500
    assert pdf.loc["image_id", "row_count"] == 5000
