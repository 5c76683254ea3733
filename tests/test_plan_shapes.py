"""Physical-plan regressions: the properties that make the engine scale are
visible in the executed plan, so assert them — column pruning reaches the
parquet scan (ReadSchema), range predicates land as PushedFilters (row-group
pruning inside surviving files), scans stay inside WholeStageCodegen, and
the MERGE probe broadcasts the CDC key side instead of shuffling the table."""

import contextlib
import io
import os

from pyspark.sql import functions as F

from moonlink_spark.cdc import CdcScheduleGenerator, to_spark
from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.scan import scan, scan_range
from moonlink_spark.table.writer import BUCKETS_PROP


def _plan(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _mk(spark, tmp_path, n=400):
    t = create_table(
        str(tmp_path / "t"), IMAGES_SCHEMA, properties={BUCKETS_PROP: "4"}
    )
    gen = CdcScheduleGenerator(seed=51)
    b = gen.next_batch(n, 0, 0)
    merge_cdc_batch(spark, t, to_spark(spark, b), gen.commit_lsn)
    return t, gen


def test_narrow_scan_prunes_read_schema(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    plan = _plan(scan(spark, t, columns=["image_id"]))
    # the payload column (15 KiB/row at scale) must NOT reach the reader
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read and all("bytes" not in l for l in read), plan
    assert "image_id" in read[0]


def test_scan_range_pushes_predicates(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    df = scan_range(spark, t, "image_id", "img000000000010", "img000000000050")
    plan = _plan(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and any(
        "GreaterThanOrEqual" in l or "IsNotNull" in l for l in pushed
    ), plan


def test_scan_runs_in_wholestage_codegen(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    # simple mode marks codegen stages with "*(n)"; formatted spells it out
    plan = _plan(scan(spark, t), mode="simple")
    assert "*(1)" in plan or "WholeStageCodegen" in plan, plan


def test_merge_probe_broadcasts_cdc_keys(spark, tmp_path):
    """A small CDC batch's probe is a BroadcastHashJoin with the batch on
    the build side — the table's payload never shuffles."""
    t, gen = _mk(spark, tmp_path)
    b = gen.next_batch(0, 20, 0)
    cdc = to_spark(spark, b)
    # reproduce the probe plan the MERGE builds (scan keys+pos ⋈ batch keys)
    probe = scan(spark, t, columns=["image_id"], with_pos=True)
    joined = probe.join(F.broadcast(cdc.select("image_id")), ["image_id"], "inner")
    plan = _plan(joined, mode="simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_lazy_merge_scan_broadcasts_eq_keys(spark, tmp_path):
    """A scan over live equality-deletes anti-joins against a BROADCAST of
    the key set — the payload never shuffles for merge-on-read."""
    t, gen = _mk(spark, tmp_path)
    b = gen.next_batch(0, 30, 10)
    merge_cdc_batch(spark, t, to_spark(spark, b), gen.commit_lsn, mode="lazy")
    plan = _plan(scan(spark, t), mode="simple")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_changelog_reads_only_touched_files(spark, tmp_path):
    """scan_changes over one commit window plans a FileScan over the files
    that commit ADDED, not the whole table (O(files-touched), never
    O(table))."""
    from moonlink_spark.table.changelog import scan_changes

    t, gen = _mk(spark, tmp_path, n=300)
    pre_files = {e.path for e in t.refresh().data_entries()}
    lsn0 = t.flush_lsn
    b = gen.next_batch(20, 0, 0)
    merge_cdc_batch(spark, t, to_spark(spark, b), gen.commit_lsn)
    df = scan_changes(spark, t.refresh(), from_lsn=lsn0, to_lsn=t.flush_lsn)
    plan = _plan(df)
    # none of the pre-existing files appear in the read plan
    hit = [p for p in pre_files if os.path.basename(p) in plan]
    assert hit == [], hit
