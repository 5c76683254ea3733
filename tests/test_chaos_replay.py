"""Seeded chaos schedule: random CDC batches interleaved with maintenance.

Mirrors moonlink's chaos testing (reference:
src/moonlink/src/table_handler/chaos_test.rs:1-76 — seeded random
interleavings of append/delete/commit/flush/snapshot/maintenance with
invariants "deletes come from committed appends, LSN always increases";
replay harness src/moonlink/src/table_handler/chaos_replay.rs). Here:

- the schedule is deterministic per seed (CdcScheduleGenerator guarantees
  deletes only target live ids and LSNs strictly increase);
- after every step the scan must equal the pandas ReferenceTable oracle;
- maintenance ops (compact / cluster / manifest rewrite) are injected between
  batches and must never change logical content;
- at the end, pixel decode must match the per-row oracle (PSNR >= 40 dB for
  lossy fmt, exact for png) and time travel at each retained snapshot must
  reproduce the recorded content (snapshot isolation).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from moonlink_spark.cdc import CdcScheduleGenerator, ReferenceTable, to_spark
from moonlink_spark.functions.imagecodec import decode, psnr, synth_pixels
from moonlink_spark.operators.cluster import cluster
from moonlink_spark.operators.compact import FULL, compact
from moonlink_spark.operators.manifest_rewrite import rewrite_manifests
from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.scan import scan, scan_at_lsn

SEED = 1793  # nod to moonlink's regression issue_1793 replay

CMP_COLS = ["image_id", "w", "h", "fmt", "caption", "phash"]


def _content(spark, table, lsn=None) -> pd.DataFrame:
    df = scan_at_lsn(spark, table, lsn) if lsn is not None else scan(spark, table)
    return (
        df.select(*CMP_COLS)
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
        .astype({"w": "int64", "h": "int64"})
    )


def _assert_matches(got: pd.DataFrame, ref: ReferenceTable):
    exp = ref.to_pandas()
    assert len(got) == len(exp)
    if len(exp):
        pd.testing.assert_frame_equal(
            got, exp[CMP_COLS].astype({"w": "int64", "h": "int64"}), check_dtype=False
        )


def test_chaos_schedule_with_maintenance(spark, tmp_path):
    rng = np.random.default_rng(SEED)
    gen = CdcScheduleGenerator(seed=SEED)
    ref = ReferenceTable()
    table = create_table(str(tmp_path / "t"), IMAGES_SCHEMA)

    lsn_history: list[tuple[int, pd.DataFrame]] = []
    last_lsn = 0
    for step in range(6):
        sizes = (
            int(rng.integers(10, 60)),
            int(rng.integers(0, 40)),
            int(rng.integers(0, 20)),
        )
        b = gen.next_batch(*sizes)
        # invariant: LSN strictly increases
        assert b["lsn"].min() > last_lsn
        last_lsn = int(b["lsn"].max())
        ref.apply(b)
        merge_cdc_batch(spark, table, to_spark(spark, b), gen.commit_lsn)

        got = _content(spark, table)
        _assert_matches(got, ref)
        lsn_history.append((gen.commit_lsn, got))

        # random maintenance injection — must never change logical content
        op = rng.integers(0, 4)
        if op == 1:
            compact(spark, table, mode=FULL)
        elif op == 2:
            cluster(spark, table, strategy="hilbert" if step % 2 else "zorder")
        elif op == 3:
            rewrite_manifests(spark, table)
        if op != 0:
            _assert_matches(_content(spark, table), ref)

    # pixel + caption oracle on the final state (input_hint invariant)
    rows = scan(spark, table).select("image_id", "bytes", "fmt", "caption", "w", "h").collect()
    versions = {f"img{i:012d}": v for i, v in gen.live.items()}
    checked = 0
    for r in rows[:40]:
        i = int(r["image_id"][3:])
        v = versions[r["image_id"]]
        exp_px = synth_pixels(i + 1_000_000_007 * v, r["w"], r["h"])
        px = decode(bytes(r["bytes"]), r["fmt"])
        if r["fmt"] == "png":
            assert np.array_equal(px, exp_px)
        else:
            assert psnr(px, exp_px) >= 40.0
        checked += 1
    assert checked > 0

    # snapshot isolation: time travel at every still-retained LSN reproduces
    # the recorded content byte-for-byte
    table.refresh()
    retained_lsns = {
        int(s.summary["lsn"]) for s in table.md.snapshots if "lsn" in s.summary
    }
    replayed = 0
    for lsn, recorded in lsn_history:
        if lsn not in retained_lsns:
            continue
        pd.testing.assert_frame_equal(
            _content(spark, table, lsn=lsn), recorded, check_dtype=False
        )
        replayed += 1
    assert replayed >= 1


def test_replay_same_seed_is_identical(spark, tmp_path):
    """Determinism: two runs of the same seed produce identical tables
    (moonlink's replay-for-regression posture, chaos_replay.rs)."""
    outs = []
    for run in ("a", "b"):
        gen = CdcScheduleGenerator(seed=7)
        ref = ReferenceTable()
        t = create_table(str(tmp_path / f"t{run}"), IMAGES_SCHEMA)
        for sizes in [(40, 0, 0), (10, 20, 8)]:
            b = gen.next_batch(*sizes)
            ref.apply(b)
            merge_cdc_batch(spark, t, to_spark(spark, b), gen.commit_lsn)
        outs.append(
            scan(spark, t)
            .select("image_id", "caption", F.md5(F.hex("bytes")).alias("img_md5"))
            .toPandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_chaos_schedule_round4_ops(spark, tmp_path):
    """Round-4 action mix on a BUCKETED table: random eager/LAZY merges
    interleaved with eq-delete resolution, DV consolidation, bucket-count
    rescale, clustering and threshold-driven auto maintenance — logical
    content must equal the reference model after every step, and layout
    changes must never affect a subsequent MERGE's matches."""
    from moonlink_spark.operators.compact import (
        rewrite_equality_deletes,
        rewrite_position_deletes,
    )
    from moonlink_spark.operators.maintenance import auto_optimize
    from moonlink_spark.operators.rebucket import rebucket_table
    from moonlink_spark.table.writer import BUCKETS_PROP

    rng = np.random.default_rng(SEED + 4)
    gen = CdcScheduleGenerator(seed=SEED + 4)
    ref = ReferenceTable()
    table = create_table(
        str(tmp_path / "t4"), IMAGES_SCHEMA, properties={BUCKETS_PROP: "4"}
    )

    buckets_seq = [8, 4, 16]
    for step in range(7):
        sizes = (
            int(rng.integers(10, 50)),
            int(rng.integers(0, 35)),
            int(rng.integers(0, 20)),
        )
        b = gen.next_batch(*sizes)
        ref.apply(b)
        mode = "lazy" if rng.integers(0, 2) else "eager"
        res = merge_cdc_batch(
            spark, table, to_spark(spark, b), gen.commit_lsn, mode=mode
        )
        assert res.snapshot is not None
        _assert_matches(_content(spark, table), ref)

        op = rng.integers(0, 6)
        if op == 1:
            rewrite_equality_deletes(spark, table, min_files=1)
        elif op == 2:
            rewrite_position_deletes(spark, table, min_files=1)
        elif op == 3:
            rebucket_table(spark, table, buckets_seq[step % len(buckets_seq)])
        elif op == 4:
            cluster(spark, table, strategy="zorder")
        elif op == 5:
            table.set_properties({"moonlink.compaction.min-files": "2"})
            auto_optimize(spark, table)
        if op != 0:
            _assert_matches(_content(spark, table), ref)

    # final full maintenance folds everything; content still equals the model
    compact(spark, table, mode=FULL)
    _assert_matches(_content(spark, table), ref)
