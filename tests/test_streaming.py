"""Structured-Streaming CDC front-end: foreachBatch → MERGE commits."""

import os

import pytest

from moonlink_spark.cdc import CdcScheduleGenerator, ReferenceTable, to_spark
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.streaming import apply_cdc_stream, cdc_file_stream
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.scan import scan


@pytest.fixture()
def table(tmp_path):
    return create_table(str(tmp_path / "t"), IMAGES_SCHEMA)


def _write_cdc_files(spark, gen, ref, cdc_dir, schedule):
    """One Parquet file per transaction batch, like a CDC log segment."""
    for i, sizes in enumerate(schedule):
        b = gen.next_batch(*sizes)
        ref.apply(b)
        to_spark(spark, b).coalesce(1).write.parquet(
            os.path.join(cdc_dir, f"batch-{i:04d}"), mode="overwrite"
        )


def test_stream_applies_batches_in_order(spark, table, tmp_path):
    cdc_dir = str(tmp_path / "cdc")
    os.makedirs(cdc_dir)
    gen = CdcScheduleGenerator(seed=21)
    ref = ReferenceTable()
    _write_cdc_files(
        spark, gen, ref, cdc_dir, [(80, 0, 0), (20, 30, 10), (0, 25, 15)]
    )
    stream = cdc_file_stream(spark, cdc_dir + "/*")
    stats = apply_cdc_stream(
        spark, table, stream, str(tmp_path / "stream_ck")
    )
    assert stats.merged >= 1
    got = (
        scan(spark, table)
        .select("image_id", "caption")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    exp = ref.to_pandas()
    assert len(got) == len(exp)
    assert list(got["caption"]) == list(exp["caption"])


def test_stream_restart_is_exactly_once(spark, table, tmp_path):
    cdc_dir = str(tmp_path / "cdc")
    os.makedirs(cdc_dir)
    gen = CdcScheduleGenerator(seed=22)
    ref = ReferenceTable()
    _write_cdc_files(spark, gen, ref, cdc_dir, [(50, 0, 0), (10, 20, 5)])
    ck = str(tmp_path / "stream_ck")
    stream = cdc_file_stream(spark, cdc_dir + "/*")
    apply_cdc_stream(spark, table, stream, ck)
    n1 = scan(spark, table).count()
    snaps1 = len(table.md.snapshots)
    # restart with the same checkpoint: nothing new -> no new commits
    stream2 = cdc_file_stream(spark, cdc_dir + "/*")
    stats2 = apply_cdc_stream(spark, table, stream2, ck)
    assert stats2.merged == 0
    table.refresh()
    assert scan(spark, table).count() == n1
    assert len(table.md.snapshots) == snaps1
    # a brand-new stream checkpoint replays everything; LSN idempotence
    # turns the replays into no-ops (exactly-once end to end)
    stream3 = cdc_file_stream(spark, cdc_dir + "/*")
    stats3 = apply_cdc_stream(spark, table, stream3, str(tmp_path / "ck2"))
    assert stats3.merged == 0 and stats3.skipped >= 1
    table.refresh()
    assert scan(spark, table).count() == n1


def test_streaming_transaction_commit_and_abort(spark, table):
    """O6: explicit streaming transaction — staged appends are invisible
    until commit; abort discards everything (transaction_stream.rs:137-143)."""
    from moonlink_spark.streaming.stream import StreamingTransaction

    gen = CdcScheduleGenerator(seed=21)
    ref = ReferenceTable()

    # committed transaction: two staged appends -> one snapshot
    tx = StreamingTransaction(spark, table)
    b1 = gen.next_batch(30, 0, 0)
    b2 = gen.next_batch(20, 5, 3)
    tx.append(to_spark(spark, b1))
    assert scan(spark, table).count() == 0  # staged rows invisible
    tx.append(to_spark(spark, b2))
    ref.apply(b1)
    ref.apply(b2)
    res = tx.commit(gen.commit_lsn)
    assert not res.skipped
    assert scan(spark, table).count() == len(ref.to_pandas())
    n_snapshots = len(table.md.snapshots)

    # aborted transaction: staged rows vanish, table untouched, no snapshot
    tx2 = StreamingTransaction(spark, table)
    tx2.append(to_spark(spark, gen.next_batch(10, 0, 0)))
    tx2.abort()
    table.refresh()
    assert len(table.md.snapshots) == n_snapshots
    assert scan(spark, table).count() == len(ref.to_pandas())
    with pytest.raises(RuntimeError):
        tx2.commit(gen.commit_lsn)


def test_streaming_transaction_abort_cleans_staging(spark, table):
    from moonlink_spark.streaming.stream import StreamingTransaction
    from moonlink_spark.table.io import accessor_for

    gen = CdcScheduleGenerator(seed=22)
    tx = StreamingTransaction(spark, table)
    tx.append(to_spark(spark, gen.next_batch(5, 0, 0)))
    stage = tx._stage_dir
    assert accessor_for(stage).list(stage, suffix=".parquet")
    tx.abort()
    assert not accessor_for(stage).list(stage, suffix=".parquet")
