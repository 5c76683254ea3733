"""Deterministic synthetic image+caption table (FIXTURES.md F1).

Generated distributed: ``spark.range(n)`` → ``mapInPandas`` builds every
column — including encoded image bytes — inside executors (no driver-side
row loop; generation cost scales out with cores). Seeded per row index, so
any scale factor reproduces byte-identical rows.

The phash column is skewed on purpose (90% of rows land in 16 hot buckets)
to exercise the explicit-salting path the north rule requires.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from moonlink_spark.functions.imagecodec import encode, synth_pixels
from moonlink_spark.schema import IMAGES_SCHEMA

_WORDS = (
    "amber basalt cirrus dune ember fjord glacier harbor isle juniper krill "
    "lagoon mesa nectar onyx prairie quartz reef summit tundra umber vale "
    "willow xenon yonder zephyr"
).split()


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 (same mixer moonlink uses for index key hashing,
    reference: src/moonlink/src/storage/index/persisted_bucket_hash_map.rs:25-31)."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def caption_for(i: int) -> str:
    ws = [_WORDS[(i * (k + 3) + k * k) % len(_WORDS)] for k in range(4)]
    return f"caption for img{i:012d}: {' '.join(ws)}"


def row_fields(i_arr: np.ndarray) -> pd.DataFrame:
    """All non-bytes columns, vectorized over row indices."""
    i = i_arr.astype(np.int64)
    w = (32 * (1 + i % 4)).astype(np.int32)
    h = (32 * (1 + (i // 4) % 4)).astype(np.int32)
    fmt = np.where(i % 2 == 0, "png", "jpeg")
    hot = splitmix64((i % 16).astype(np.uint64))
    uni = splitmix64(i.astype(np.uint64))
    phash = np.where(i % 10 != 0, hot, uni).astype(np.uint64)
    phash = (phash >> np.uint64(1)).astype(np.int64)  # non-negative int64
    return pd.DataFrame(
        {
            "image_id": [f"img{x:012d}" for x in i],
            "w": w,
            "h": h,
            "fmt": fmt,
            "caption": [caption_for(int(x)) for x in i],
            "phash": phash,
        }
    )


def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        i_arr = b["id"].to_numpy()
        out = row_fields(i_arr)
        out["bytes"] = [
            encode(synth_pixels(int(i), int(w), int(h)), f)
            for i, w, h, f in zip(i_arr, out["w"], out["h"], out["fmt"])
        ]
        yield out[[f.name for f in IMAGES_SCHEMA.fields]]


def generate_images(spark: SparkSession, n_rows: int, partitions: int | None = None) -> DataFrame:
    partitions = partitions or max(8, min(256, n_rows // 2000 or 1))
    return (
        spark.range(0, n_rows, numPartitions=partitions)
        .mapInPandas(_gen, schema=IMAGES_SCHEMA)
    )


def expected_pixels(i: int) -> np.ndarray:
    """Oracle: ground-truth pixels for row i (pre-encoding)."""
    w = 32 * (1 + i % 4)
    h = 32 * (1 + (i // 4) % 4)
    return synth_pixels(i, w, h)
