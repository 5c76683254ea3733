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

Integrity (v2c): the reference's DV blob is framed ``| len | magic D1D33964
| bitmap | crc32c |`` (deletion_vector.rs:16-49) so a torn or corrupt blob
fails LOUDLY instead of mis-scanning. v2c frames each bitmap the same way:
``magic(4B) || bits || crc32(bits)(4B LE)`` — crc32 (zlib) stands in for
crc32c, same integrity class, no extra dependency. Expansion verifies both
and raises on mismatch.

v1 files (row-per-position) and unframed v2 files remain readable for mixed
histories; new writes are v2c.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from moonlink_spark.table.format import FileEntry

DV_FORMAT_STAT = "format"
DV2 = "dv2"
DV2C = "dv2c"

# the reference's DV blob magic, deletion_vector.rs:16-49
DV_MAGIC = bytes.fromhex("D1D33964")

POSITIONS_SCHEMA = "file_path string, pos long"
DV2_SCHEMA = "file_path string, card long, bitmap binary"


class DVCorruption(ValueError):
    """A framed deletion-vector bitmap failed its magic/crc check."""


def _frame(bits: bytes) -> bytes:
    return DV_MAGIC + bits + struct.pack("<I", zlib.crc32(bits) & 0xFFFFFFFF)


def _unframe(blob: bytes, where: str) -> bytes:
    if len(blob) < 8 or blob[:4] != DV_MAGIC:
        raise DVCorruption(f"deletion vector missing magic: {where}")
    bits, crc = blob[4:-4], struct.unpack("<I", blob[-4:])[0]
    if zlib.crc32(bits) & 0xFFFFFFFF != crc:
        raise DVCorruption(f"deletion vector crc mismatch: {where}")
    return bits


def _pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pos = np.unique(pdf["pos"].to_numpy(np.int64))
    nbytes = (int(pos.max()) >> 3) + 1 if len(pos) else 0
    bits = np.zeros(nbytes, dtype=np.uint8)
    np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return pd.DataFrame(
        {
            "file_path": [pdf["file_path"].iloc[0]],
            "card": [len(pos)],
            "bitmap": [_frame(bits.tobytes())],
        }
    )


def pack_positions(deletes_df: DataFrame) -> DataFrame:
    """(file_path, pos) rows → one (file_path, card, bitmap) row per file."""
    return (
        deletes_df.select("file_path", "pos")
        .groupBy("file_path")
        .applyInPandas(_pack_group, schema=DV2_SCHEMA)
    )


def _expand_bitmaps(
    batches: Iterator[pd.DataFrame], framed: bool
) -> Iterator[pd.DataFrame]:
    for b in batches:
        frames = []
        for fp, bm in zip(b["file_path"], b["bitmap"]):
            raw = bytes(bm)
            bits = _unframe(raw, fp) if framed else raw
            arr = np.frombuffer(bits, dtype=np.uint8)
            pos = np.nonzero(np.unpackbits(arr, bitorder="little"))[0].astype(np.int64)
            frames.append(pd.DataFrame({"file_path": fp, "pos": pos}))
        yield (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame({"file_path": pd.Series(dtype=str), "pos": pd.Series(dtype=np.int64)})
        )


def _unpack_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Framed (v2c) expansion — magic + crc verified per bitmap."""
    return _expand_bitmaps(batches, framed=True)


def _unpack_batches_v2(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Legacy unframed (v2) expansion for pre-v2c histories."""
    return _expand_bitmaps(batches, framed=False)


def is_dv2(entry: FileEntry) -> bool:
    return entry.stats.get(DV_FORMAT_STAT) in (DV2, DV2C)


def read_delete_positions(
    spark: SparkSession, delete_entries: list[FileEntry]
) -> DataFrame | None:
    """Delete entries → (file_path, pos) DataFrame (v2/v2c bitmaps expanded
    lazily executor-side, v2c crc-verified; v1 row files read as-is); None
    when no deletes."""
    if not delete_entries:
        return None
    v2c = [e.path for e in delete_entries if e.stats.get(DV_FORMAT_STAT) == DV2C]
    v2 = [e.path for e in delete_entries if e.stats.get(DV_FORMAT_STAT) == DV2]
    v1 = [e.path for e in delete_entries if not is_dv2(e)]
    parts = []
    if v1:
        parts.append(spark.read.schema(POSITIONS_SCHEMA).parquet(*v1))
    for paths, unpack in ((v2, _unpack_batches_v2), (v2c, _unpack_batches)):
        if paths:
            packed = spark.read.schema(DV2_SCHEMA).parquet(*paths)
            parts.append(packed.mapInPandas(unpack, schema=POSITIONS_SCHEMA))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


