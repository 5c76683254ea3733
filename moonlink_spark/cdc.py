"""Seeded CDC schedule generator + in-memory reference oracle (FIXTURES.md F2).

Mirrors moonlink's chaos-test event generation (reference:
src/moonlink/src/table_handler/chaos_test.rs:1-76 — seeded random
interleavings with invariants "deletes come from committed appends, LSN always
increases"). Batches are deterministic per (seed, batch sizes); deletes only
target previously live ids; LSNs strictly increase across batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from moonlink_spark.datagen import row_fields
from moonlink_spark.functions.imagecodec import encode, synth_pixels
from moonlink_spark.schema import CDC_SCHEMA


def _payload_rows(indices: np.ndarray, version: np.ndarray) -> pd.DataFrame:
    """Full image rows for given row indices; ``version`` perturbs the pixel
    seed so an upsert visibly changes the image (caption gets a vN suffix)."""
    out = row_fields(indices)
    out["bytes"] = [
        encode(synth_pixels(int(i) + 1_000_000_007 * int(v), int(w), int(h)), f)
        for i, v, w, h, f in zip(indices, version, out["w"], out["h"], out["fmt"])
    ]
    out["caption"] = [
        c if v == 0 else f"{c} v{int(v)}" for c, v in zip(out["caption"], version)
    ]
    return out


class CdcScheduleGenerator:
    """Generates batches of (op, lsn, <image columns>) pandas frames."""

    def __init__(self, seed: int = 42, id_space: int = 100_000):
        self.rng = np.random.default_rng(seed)
        self.id_space = id_space
        self.live: dict[int, int] = {}  # row index -> version
        self.next_lsn = 1
        self.next_new = 0

    def next_batch(
        self, n_insert: int, n_update: int, n_delete: int
    ) -> pd.DataFrame:
        ins = np.arange(self.next_new, self.next_new + n_insert, dtype=np.int64)
        self.next_new += n_insert
        live_ids = np.array(sorted(self.live), dtype=np.int64)
        upd = (
            self.rng.choice(live_ids, size=min(n_update, live_ids.size), replace=False)
            if live_ids.size
            else np.array([], dtype=np.int64)
        )
        remaining = np.setdiff1d(live_ids, upd)
        dele = (
            self.rng.choice(remaining, size=min(n_delete, remaining.size), replace=False)
            if remaining.size
            else np.array([], dtype=np.int64)
        )

        frames = []
        for idx, is_del in ((ins, False), (upd, False), (dele, True)):
            if idx.size == 0:
                continue
            if is_del:
                f = pd.DataFrame({"image_id": [f"img{int(i):012d}" for i in idx]})
                for c in ["w", "h", "phash"]:
                    f[c] = pd.array([None] * len(f), dtype="Int64")
                f["bytes"] = None
                f["fmt"] = None
                f["caption"] = None
                f["op"] = "D"
            else:
                ver = np.array([self.live.get(int(i), -1) + 1 for i in idx], dtype=np.int64)
                f = _payload_rows(idx, ver)
                f["op"] = "U"
            frames.append(f)

        for i in ins:
            self.live[int(i)] = 0
        for i in upd:
            self.live[int(i)] += 1
        for i in dele:
            del self.live[int(i)]

        batch = pd.concat(frames, ignore_index=True)
        batch = batch.sample(frac=1.0, random_state=int(self.rng.integers(0, 2**31)))
        batch["lsn"] = np.arange(self.next_lsn, self.next_lsn + len(batch), dtype=np.int64)
        self.next_lsn += len(batch) + 1
        cols = [f.name for f in CDC_SCHEMA.fields]
        return batch[cols].reset_index(drop=True)

    @property
    def commit_lsn(self) -> int:
        return self.next_lsn - 1


def to_spark(spark: SparkSession, batch: pd.DataFrame) -> DataFrame:
    pdf = batch.copy()
    for c in ("w", "h"):
        pdf[c] = pdf[c].astype("Int32")
    pdf["lsn"] = pdf["lsn"].astype("int64")
    return spark.createDataFrame(pdf, schema=CDC_SCHEMA)


class ReferenceTable:
    """Pandas MERGE oracle: dict keyed by image_id, latest-LSN-wins
    (FIXTURES.md oracle #4)."""

    def __init__(self):
        self.rows: dict[str, dict] = {}

    def apply(self, batch: pd.DataFrame) -> None:
        latest = batch.sort_values("lsn").groupby("image_id", as_index=False).tail(1)
        for r in latest.to_dict("records"):
            if r["op"] == "D":
                self.rows.pop(r["image_id"], None)
            else:
                self.rows[r["image_id"]] = {
                    k: v for k, v in r.items() if k not in ("op", "lsn")
                }

    def to_pandas(self) -> pd.DataFrame:
        if not self.rows:
            return pd.DataFrame(
                columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )
        return (
            pd.DataFrame(list(self.rows.values()))
            .sort_values("image_id")
            .reset_index(drop=True)
        )
