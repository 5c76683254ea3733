"""Seeded CDC schedule generator + in-memory reference oracle (FIXTURES.md F2).

Mirrors moonlink's chaos-test event generation (reference:
src/moonlink/src/table_handler/chaos_test.rs:1-76 — seeded random
interleavings with invariants "deletes come from committed appends, LSN always
increases"). Batches are deterministic per (seed, batch sizes); deletes only
target previously live ids; LSNs strictly increase across batches.

Two materialization paths:

- ``next_spec()`` + ``spec_to_spark()`` — the scale path. The generator emits
  only a compact *spec* (row index, version, op, lsn — ~25 bytes/row); image
  payloads are synthesized inside executors via ``mapInPandas``, so CDC
  generation cost scales out with cores and the driver never touches a byte
  of image data (same pattern as datagen.generate_images).
- ``next_batch()`` + ``to_spark()`` — driver-side materialization of the same
  spec, for small correctness tests and the pandas reference oracle.

Both paths produce identical rows for the same generator state: the payload
is a pure function of (row index, version).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from moonlink_spark.datagen import row_fields
from moonlink_spark.functions.imagecodec import encode, synth_pixels
from moonlink_spark.schema import CDC_SCHEMA

_CDC_COLS = [f.name for f in CDC_SCHEMA.fields]

_SPEC_SCHEMA = "idx long, ver long, op string, lsn long"


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


def materialize_spec(spec: pd.DataFrame) -> pd.DataFrame:
    """Spec rows (idx, ver, op, lsn) → full CDC rows (op, lsn, <image cols>).

    Pure per-row function — safe to run on any partition of a spec.
    """
    frames = []
    u = spec[spec["op"] == "U"]
    if len(u):
        f = _payload_rows(u["idx"].to_numpy(), u["ver"].to_numpy())
        f["op"] = "U"
        f["lsn"] = u["lsn"].to_numpy()
        frames.append(f)
    d = spec[spec["op"] == "D"]
    if len(d):
        f = pd.DataFrame({"image_id": [f"img{int(i):012d}" for i in d["idx"]]})
        for c in ("w", "h", "phash"):
            f[c] = pd.array([None] * len(f), dtype="Int64")
        f["bytes"] = None
        f["fmt"] = None
        f["caption"] = None
        f["op"] = "D"
        f["lsn"] = d["lsn"].to_numpy()
        frames.append(f)
    if not frames:
        return pd.DataFrame(columns=_CDC_COLS)
    out = pd.concat(frames, ignore_index=True)
    for c in ("w", "h"):
        out[c] = out[c].astype("Int32")
    out["lsn"] = out["lsn"].astype("int64")
    return out[_CDC_COLS]


def _spec_mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        yield materialize_spec(b)


def spec_to_spark(
    spark: SparkSession, spec: pd.DataFrame, partitions: int = 64
) -> DataFrame:
    """Distribute a tiny spec and synthesize payloads executor-side."""
    sdf = spark.createDataFrame(spec[["idx", "ver", "op", "lsn"]], _SPEC_SCHEMA)
    return sdf.repartition(partitions).mapInPandas(_spec_mapper, schema=CDC_SCHEMA)


class CdcScheduleGenerator:
    """Generates batches of (op, lsn, <image columns>) — as compact specs
    (``next_spec``) or driver-materialized pandas frames (``next_batch``)."""

    def __init__(self, seed: int = 42, id_space: int = 100_000):
        self.rng = np.random.default_rng(seed)
        self.id_space = id_space
        self.live: dict[int, int] = {}  # row index -> version
        self.next_lsn = 1
        self.next_new = 0

    def next_spec(
        self, n_insert: int, n_update: int, n_delete: int
    ) -> pd.DataFrame:
        """One batch as a payload-free spec: (idx, ver, op, lsn)."""
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

        idx = np.concatenate([ins, upd, dele])
        ver = np.concatenate(
            [
                np.zeros(ins.size, dtype=np.int64),
                np.array([self.live[int(i)] + 1 for i in upd], dtype=np.int64),
                np.full(dele.size, -1, dtype=np.int64),
            ]
        )
        op = np.concatenate(
            [np.full(ins.size + upd.size, "U"), np.full(dele.size, "D")]
        )

        for i in ins:
            self.live[int(i)] = 0
        for i in upd:
            self.live[int(i)] += 1
        for i in dele:
            del self.live[int(i)]

        spec = pd.DataFrame({"idx": idx, "ver": ver, "op": op})
        spec = spec.sample(
            frac=1.0, random_state=int(self.rng.integers(0, 2**31))
        ).reset_index(drop=True)
        spec["lsn"] = np.arange(
            self.next_lsn, self.next_lsn + len(spec), dtype=np.int64
        )
        self.next_lsn += len(spec) + 1
        return spec

    def next_batch(
        self, n_insert: int, n_update: int, n_delete: int
    ) -> pd.DataFrame:
        """One batch materialized driver-side (small tests / pandas oracle)."""
        return materialize_spec(self.next_spec(n_insert, n_update, n_delete))

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
