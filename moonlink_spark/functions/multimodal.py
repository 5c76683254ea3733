"""Multimodal column operators: decode / feature-extract / resize over opaque
binary columns, Arrow-batched.

The Spark-side plumbing (schemas, mapInPandas batch shape, partitioning) is
real and tested; pixel work uses the in-repo pure-numpy codec for png/qjpg.
Real-world formats (actual JPEG, audio, video) need codec libraries absent
from this container — those branches raise NotImplementedError and are
clearly marked STUB: swap in PIL/ffmpeg calls on a real cluster; nothing
else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from moonlink_spark.functions.imagecodec import decode, encode

_SUPPORTED = {"png", "jpeg"}  # jpeg == deterministic QJPG fake (see imagecodec)

FEATURE_SCHEMA = (
    "image_id string, w int, h int, fmt string, mean_r double, mean_g double, "
    "mean_b double, brightness double, contrast double"
)


def _decode_or_stub(data: bytes, fmt: str) -> np.ndarray:
    if fmt in _SUPPORTED:
        return decode(data, fmt)
    # STUB: real decoders (libjpeg/ffmpeg/...) unavailable in this container
    raise NotImplementedError(f"decoder for fmt={fmt!r} requires external codec libs")


def image_features(df: DataFrame) -> DataFrame:
    """Per-image channel means / brightness / contrast from decoded pixels."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                px = _decode_or_stub(bytes(r.bytes), r.fmt).astype(np.float64)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "w": px.shape[1],
                        "h": px.shape[0],
                        "fmt": r.fmt,
                        "mean_r": float(px[..., 0].mean()),
                        "mean_g": float(px[..., 1].mean()),
                        "mean_b": float(px[..., 2].mean()),
                        "brightness": float(px.mean()),
                        "contrast": float(px.std()),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("image_id", "bytes", "fmt").mapInPandas(run, FEATURE_SCHEMA)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize, re-encoded in the source format (numpy index
    arithmetic — deterministic, library-free)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                px = _decode_or_stub(bytes(r.bytes), r.fmt)
                h, w = px.shape[:2]
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                rs = px[yi][:, xi]
                out.append(
                    {
                        "image_id": r.image_id,
                        "bytes": encode(rs, r.fmt),
                        "w": out_w,
                        "h": out_h,
                        "fmt": r.fmt,
                    }
                )
            yield pd.DataFrame(out)

    return df.select("image_id", "bytes", "fmt").mapInPandas(
        run, "image_id string, bytes binary, w int, h int, fmt string"
    )


def perceptual_hash(df: DataFrame) -> DataFrame:
    """64-bit average-hash phash from decoded pixels (8x8 downsample vs mean).
    The recompute path for the images table's ``phash`` column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                px = _decode_or_stub(bytes(r.bytes), r.fmt).mean(axis=2)
                h, w = px.shape
                yi = (np.arange(8) * h // 8).clip(0, h - 1)
                xi = (np.arange(8) * w // 8).clip(0, w - 1)
                g = px[yi][:, xi]
                bits = (g > g.mean()).astype(np.uint64).ravel()
                val = int(
                    (bits << np.arange(64, dtype=np.uint64)).sum().astype(np.int64)
                )
                rows.append({"image_id": r.image_id, "ahash": val})
            yield pd.DataFrame(rows)

    return df.select("image_id", "bytes", "fmt").mapInPandas(
        run, "image_id string, ahash long"
    )


def frame_sample_stub(df: DataFrame, every_n: int = 10) -> DataFrame:
    """STUB: video frame sampling requires ffmpeg (absent here). The schema
    and batch plumbing are the real contract; the body raises."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError("video decoding requires ffmpeg — STUB")
        yield  # pragma: no cover

    return df.mapInPandas(run, "video_id string, frame_no int, bytes binary")
