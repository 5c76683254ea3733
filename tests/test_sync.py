"""Incremental table→table replication (operators/sync.py).

Oracle: the replica's content must equal the upstream's content after every
sync — checked as sorted pandas frames. Resume-cursor, idempotence,
maintenance-invisibility and expiry re-bootstrap semantics mirror moonlink's
replication loop (moonlink_sink.rs:179-258, wal.rs:205-220).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from moonlink_spark.cdc import CdcScheduleGenerator, to_spark
from moonlink_spark.operators.expire import expire_snapshots
from moonlink_spark.operators.maintenance import optimize_table
from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.operators.sync import sync_table
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.scan import scan

_COLS = ["image_id", "caption", "phash"]


def _content(spark, t) -> pd.DataFrame:
    pdf = scan(spark, t.refresh(), columns=_COLS).toPandas()
    return pdf.sort_values(_COLS).reset_index(drop=True)


def _assert_in_step(spark, src, dst):
    pd.testing.assert_frame_equal(
        _content(spark, src), _content(spark, dst), check_dtype=False
    )


@pytest.fixture()
def pair(spark, tmp_path):
    src = create_table(str(tmp_path / "src"), IMAGES_SCHEMA)
    dst = create_table(str(tmp_path / "dst"), IMAGES_SCHEMA)
    return src, dst, CdcScheduleGenerator(seed=21)


def test_sync_tracks_each_commit(spark, pair):
    src, dst, gen = pair
    for sizes in [(100, 0, 0), (20, 30, 15), (0, 10, 25)]:
        b = gen.next_batch(*sizes)
        merge_cdc_batch(spark, src, to_spark(spark, b), gen.commit_lsn)
        res = sync_table(spark, src, dst)
        assert not res.skipped and not res.bootstrapped
        assert res.to_lsn == gen.commit_lsn
        assert dst.refresh().flush_lsn == gen.commit_lsn
        _assert_in_step(spark, src, dst)


def test_sync_multi_commit_window_and_idempotence(spark, pair):
    src, dst, gen = pair
    # three upstream commits consumed in ONE window: latest-wins must
    # collapse update chains and net out insert-then-delete keys
    for sizes in [(80, 0, 0), (10, 40, 10), (5, 20, 30)]:
        b = gen.next_batch(*sizes)
        merge_cdc_batch(spark, src, to_spark(spark, b), gen.commit_lsn)
    res = sync_table(spark, src, dst)
    assert res.from_lsn == 0 and res.to_lsn == gen.commit_lsn
    _assert_in_step(spark, src, dst)
    # nothing new upstream → no-op, no commit
    n_snaps = len(dst.refresh().md.snapshots)
    res2 = sync_table(spark, src, dst)
    assert res2.skipped
    assert len(dst.refresh().md.snapshots) == n_snaps


def test_sync_skips_upstream_maintenance(spark, pair):
    src, dst, gen = pair
    b = gen.next_batch(60, 0, 0)
    merge_cdc_batch(spark, src, to_spark(spark, b), gen.commit_lsn)
    sync_table(spark, src, dst)
    before = _content(spark, dst)
    # upstream compaction rewrites bytes but changes nothing logical — it
    # does not advance the upstream LSN, so sync is a pure no-op
    optimize_table(spark, src, mode="full", retain_last=len(src.md.snapshots) + 2)
    res = sync_table(spark, src, dst)
    assert res.skipped
    pd.testing.assert_frame_equal(before, _content(spark, dst), check_dtype=False)
    # and a merge AFTER the rewrite still syncs (delete pre-images resolve
    # against compacted files)
    b2 = gen.next_batch(5, 10, 8)
    merge_cdc_batch(spark, src, to_spark(spark, b2), gen.commit_lsn)
    res2 = sync_table(spark, src, dst)
    assert not res2.skipped
    _assert_in_step(spark, src, dst)


def test_sync_bootstrap_after_expiry(spark, pair):
    src, dst, gen = pair
    for sizes in [(50, 0, 0), (10, 15, 5), (0, 5, 10)]:
        b = gen.next_batch(*sizes)
        merge_cdc_batch(spark, src, to_spark(spark, b), gen.commit_lsn)
    expire_snapshots(src, retain_last=1)  # changelog floor moves past lsn 2
    res = sync_table(spark, src, dst)  # empty replica: full re-bootstrap
    assert res.bootstrapped
    _assert_in_step(spark, src, dst)
    # a NON-empty replica below the floor must refuse (stale keys whose
    # deletes were expired could linger silently)
    stale = create_table(str(src.location) + "_stale", IMAGES_SCHEMA)
    early = gen.next_batch(5, 0, 0)
    merge_cdc_batch(spark, stale, to_spark(spark, early), lsn=1)
    with pytest.raises(ValueError, match="recreate the replica"):
        sync_table(spark, src, stale)


def test_changelog_keyed_preimage(spark, pair):
    # delete events with preimage_columns=[key] carry the key and NULL
    # payload — same schema, pre-image scan column-pruned to the key
    from moonlink_spark.table.changelog import (
        CHANGE_TYPE_COL,
        scan_changes,
    )

    src, _, gen = pair
    merge_cdc_batch(spark, src, to_spark(spark, gen.next_batch(50, 0, 0)), gen.commit_lsn)
    first = gen.commit_lsn
    merge_cdc_batch(spark, src, to_spark(spark, gen.next_batch(0, 10, 15)), gen.commit_lsn)
    ev = scan_changes(
        spark, src, first, gen.commit_lsn,
        columns=_COLS, preimage_columns=["image_id"],
    ).toPandas()
    de = ev[ev[CHANGE_TYPE_COL] == "delete"]
    assert len(de) == 25 and de["image_id"].notna().all()
    assert de["caption"].isna().all() and de["phash"].isna().all()
    ins = ev[ev[CHANGE_TYPE_COL] == "insert"]
    assert ins["caption"].notna().all()
    with pytest.raises(ValueError, match="subset"):
        scan_changes(spark, src, 0, 99, columns=["image_id"], preimage_columns=["caption"])


def test_sync_schema_mismatch_raises(spark, tmp_path, pair):
    src, _, gen = pair
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    # no merge-key column at all → a replica of some other table entirely
    other = create_table(
        str(tmp_path / "other"),
        StructType([StructField("k", StringType()), StructField("v", LongType())]),
    )
    b = gen.next_batch(5, 0, 0)
    merge_cdc_batch(spark, src, to_spark(spark, b), gen.commit_lsn)
    with pytest.raises(ValueError, match="schema mismatch"):
        sync_table(spark, src, other)
    # shared column with a different type → type changes can't replicate
    retyped = create_table(
        str(tmp_path / "retyped"),
        StructType(
            [StructField("image_id", StringType()), StructField("phash", StringType())]
        ),
    )
    with pytest.raises(ValueError, match="types differ"):
        sync_table(spark, src, retyped)


def test_sync_follows_schema_evolution(spark, pair):
    # upstream add/drop-column commits are mirrored onto the replica before
    # the window applies, so a replica never stalls on evolution
    from pyspark.sql.types import LongType, StructField

    from moonlink_spark.operators.evolve import add_columns, drop_columns

    src, dst, gen = pair
    merge_cdc_batch(spark, src, to_spark(spark, gen.next_batch(40, 0, 0)), gen.commit_lsn)
    sync_table(spark, src, dst)

    add_columns(src, [StructField("views", LongType(), True)])
    drop_columns(src, ["fmt"])
    b = gen.next_batch(0, 10, 5)
    merge_cdc_batch(spark, src, to_spark(spark, b).withColumn("views", F.lit(7)), gen.commit_lsn)
    res = sync_table(spark, src, dst)
    assert not res.skipped
    dst.refresh()
    names = [f.name for f in dst.schema.fields]
    assert "views" in names and "fmt" not in names
    _assert_in_step(spark, src, dst)
    got = scan(spark, dst, columns=["image_id", "views"]).toPandas()
    assert (got["views"].dropna() == 7).all() and got["views"].notna().sum() == 10


def test_sync_follows_swap_rename(spark, pair):
    """An upstream rename CYCLE (w <-> h between syncs) is mirrored through a
    temp name — field-id equality detects both sides, and no drop+add ever
    nulls untouched rows."""
    from moonlink_spark.operators.evolve import rename_column

    src, dst, gen = pair
    merge_cdc_batch(
        spark, src, to_spark(spark, gen.next_batch(30, 0, 0)), gen.commit_lsn
    )
    sync_table(spark, src, dst)

    rename_column(src, "w", "__swap_tmp")
    rename_column(src, "h", "w")
    rename_column(src, "__swap_tmp", "h")
    b = gen.next_batch(0, 5, 0)
    merge_cdc_batch(spark, src, to_spark(spark, b), gen.commit_lsn)
    res = sync_table(spark, src, dst)
    assert not res.skipped
    # values of the swapped columns match upstream row-for-row (ids followed)
    s = scan(spark, src.refresh(), columns=["image_id", "w", "h"]).toPandas()
    d = scan(spark, dst.refresh(), columns=["image_id", "w", "h"]).toPandas()
    pd.testing.assert_frame_equal(
        s.sort_values("image_id").reset_index(drop=True),
        d.sort_values("image_id").reset_index(drop=True),
        check_dtype=False,
    )


def test_stream_sync_continuous_replication(spark, pair, tmp_path):
    """The datasource CDC stream drives replication: drain, restart from
    checkpoint after more upstream commits, and survive maintenance."""
    from moonlink_spark.operators.sync import stream_sync

    src, dst, gen = pair
    ck = str(tmp_path / "sync_ck")
    for sizes in [(120, 0, 0), (15, 25, 10)]:
        b = gen.next_batch(*sizes)
        merge_cdc_batch(spark, src, to_spark(spark, b), gen.commit_lsn)

    stats = stream_sync(spark, src, dst, ck)
    assert stats.merged >= 1
    _assert_in_step(spark, src, dst)
    assert dst.refresh().flush_lsn == src.refresh().flush_lsn

    # more commits + upstream maintenance; restart from the same checkpoint
    b = gen.next_batch(10, 20, 30)
    merge_cdc_batch(spark, src, to_spark(spark, b), gen.commit_lsn)
    optimize_table(spark, src, mode="full")  # emits no changelog events

    stats2 = stream_sync(spark, src, dst, ck)
    assert stats2.merged == 1  # exactly the new window, nothing replayed
    _assert_in_step(spark, src, dst)

    # drained stream with nothing new: zero applied batches
    stats3 = stream_sync(spark, src, dst, ck)
    assert stats3.merged == 0
    _assert_in_step(spark, src, dst)
