"""Size-tuned Parquet data-file writing.

Mirrors moonlink's flush: drain buffered rows into size-tuned snappy Parquet
(128 MiB flush target / 512 MiB compaction target, reference:
src/moonlink/src/storage/mooncake_table_config.rs:21-24,
src/moonlink/src/storage/compaction/compaction_config.rs:52,
src/moonlink/src/storage/parquet_utils.rs:6). Spark-side sizing uses
``maxRecordsPerFile`` (no extra shuffle) plus an optional explicit
repartition/repartitionByRange when the caller knows total bytes (compaction
and clustering do, from manifest stats).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

from moonlink_spark.table.format import DATA, DELETES, FileEntry
from moonlink_spark.table.stats import collect_file_entries

FLUSH_TARGET_BYTES = 128 * 1024 * 1024
COMPACT_TARGET_BYTES = 512 * 1024 * 1024

DELETE_SCHEMA = "file_path string, pos long"


def write_data_files(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    num_files: int | None = None,
    range_cols: list | None = None,
    sort_cols: list | None = None,
    max_records_per_file: int | None = None,
) -> list[FileEntry]:
    """Write ``df`` as Parquet under ``out_dir``; return manifest entries.

    - ``range_cols`` + ``num_files``: repartitionByRange → clustered files
      with tight per-column min/max (the Z-order/compaction path).
    - ``max_records_per_file``: split oversize partitions without a shuffle
      (the MERGE/flush path, where batch size is known approximately).
    """
    w = df
    if num_files is not None and range_cols:
        w = w.repartitionByRange(num_files, *range_cols)
    elif num_files is not None:
        w = w.repartition(num_files)
    if sort_cols:
        w = w.sortWithinPartitions(*sort_cols)
    writer = w.write.mode("append").format("parquet")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.save(out_dir)
    paths = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    return collect_file_entries(spark, paths, content=DATA)


def write_delete_files(spark: SparkSession, deletes_df: DataFrame, out_dir: str) -> list[FileEntry]:
    """Write positional delete rows (file_path, pos) sorted for locality —
    the persisted form of moonlink's deletion vectors (reference:
    src/moonlink/src/storage/iceberg/deletion_vector.rs:16-98)."""
    (
        deletes_df.select("file_path", "pos")
        .sortWithinPartitions("file_path", "pos")
        .write.mode("append")
        .parquet(out_dir)
    )
    paths = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    return collect_file_entries(spark, paths, content=DELETES)
