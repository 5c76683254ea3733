"""Compressed deletion vectors — bitmap-per-data-file delete files.

Moonlink persists deletes as RoaringTreemap bitmaps in puffin blobs, one DV
per referenced data file (reference:
src/moonlink/src/storage/iceberg/deletion_vector.rs:16-98 — blob layout
``| len | magic | bitmap | crc32c |`` with referenced-data-file + cardinality
properties). The v1 representation here (one parquet row per deleted
position) is ~100x a bitmap at high delete ratios. v2 mirrors the reference:

    delete file schema: file_path string, card long, bitmap binary
    one row PER REFERENCED DATA FILE; bit i of ``bitmap`` set = row position
    i of that data file is deleted (little-endian bit order, dense from 0 to
    the max deleted position).

Cardinality is carried per row (like the reference's blob property) so
consumers can size broadcasts without unpacking.

Scale posture: the PACKED form is what's stored and shuffled; expansion to
(file_path, pos) rows happens lazily, executor-side, per Arrow batch
(``mapInPandas``) and only feeds the scan's anti-join — delete metadata is
orders of magnitude smaller than row data, so this Python step never touches
the image payload path.

v1 files (tagged by absence of the ``format=dv2`` stats marker) remain
readable for mixed histories.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moonlink_spark.table.format import FileEntry

DV_FORMAT_STAT = "format"
DV2 = "dv2"

POSITIONS_SCHEMA = "file_path string, pos long"
DV2_SCHEMA = "file_path string, card long, bitmap binary"


def _pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pos = np.unique(pdf["pos"].to_numpy(np.int64))
    nbytes = (int(pos.max()) >> 3) + 1 if len(pos) else 0
    bits = np.zeros(nbytes, dtype=np.uint8)
    np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return pd.DataFrame(
        {
            "file_path": [pdf["file_path"].iloc[0]],
            "card": [len(pos)],
            "bitmap": [bits.tobytes()],
        }
    )


def pack_positions(deletes_df: DataFrame) -> DataFrame:
    """(file_path, pos) rows → one (file_path, card, bitmap) row per file."""
    return (
        deletes_df.select("file_path", "pos")
        .groupBy("file_path")
        .applyInPandas(_pack_group, schema=DV2_SCHEMA)
    )


def _unpack_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        frames = []
        for fp, bm in zip(b["file_path"], b["bitmap"]):
            arr = np.frombuffer(bytes(bm), dtype=np.uint8)
            pos = np.nonzero(np.unpackbits(arr, bitorder="little"))[0].astype(np.int64)
            frames.append(pd.DataFrame({"file_path": fp, "pos": pos}))
        yield (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame({"file_path": pd.Series(dtype=str), "pos": pd.Series(dtype=np.int64)})
        )


def is_dv2(entry: FileEntry) -> bool:
    return entry.stats.get(DV_FORMAT_STAT) == DV2


def read_delete_positions(
    spark: SparkSession, delete_entries: list[FileEntry]
) -> DataFrame | None:
    """Delete entries → (file_path, pos) DataFrame (v2 bitmaps expanded
    lazily executor-side; v1 row files read as-is); None when no deletes."""
    if not delete_entries:
        return None
    v2 = [e.path for e in delete_entries if is_dv2(e)]
    v1 = [e.path for e in delete_entries if not is_dv2(e)]
    parts = []
    if v1:
        parts.append(spark.read.schema(POSITIONS_SCHEMA).parquet(*v1))
    if v2:
        packed = spark.read.schema(DV2_SCHEMA).parquet(*v2)
        parts.append(packed.mapInPandas(_unpack_batches, schema=POSITIONS_SCHEMA))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def dv2_cardinalities(spark: SparkSession, dv2_dir_files: list[str]) -> dict[str, int]:
    """Per-output-parquet-file total cardinality (sum of card) — sizes the
    manifest entry's record_count as DELETED POSITIONS, matching v1
    semantics and the reference's cardinality blob property."""
    if not dv2_dir_files:
        return {}
    df = (
        spark.read.schema(DV2_SCHEMA)
        .parquet(*dv2_dir_files)
        .select(
            F.regexp_replace(F.col("_metadata.file_path"), r"^file:/+", "/").alias("f"),
            "card",
        )
        .groupBy("f")
        .agg(F.sum("card").alias("n"))
    )
    return {r["f"]: int(r["n"]) for r in df.collect()}
