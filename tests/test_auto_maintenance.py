"""Threshold-driven automatic maintenance (auto_optimize).

Moonlink triggers compaction / index merge from config thresholds inside its
snapshot event loop (reference: compaction_config.rs:7-27,
index_merge_config.rs:9-21, dispatch mooncake_table/snapshot.rs:568-573).
The batch analog reads the same thresholds from table properties; one
idempotent auto_optimize call per table per tick does only the work the
table's state calls for.
"""

import pytest
from pyspark.sql import functions as F

from moonlink_spark.datagen import generate_images
from moonlink_spark.operators.maintenance import auto_optimize
from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.scan import scan
from moonlink_spark.table.writer import write_data_files
from moonlink_spark.schema import IMAGES_SCHEMA


@pytest.fixture()
def small_file_table(spark, tmp_path):
    t = create_table(str(tmp_path / "tbl"), IMAGES_SCHEMA)
    df = generate_images(spark, 400, partitions=4)
    entries = write_data_files(
        spark, df, t.new_data_dir(), max_records_per_file=20
    )
    t.commit("append", added=entries, lsn=10)
    return t


def test_small_files_trigger_compaction(spark, small_file_table):
    t = small_file_table
    n_before = len(t.data_entries())
    assert n_before >= 16  # above the default min-files threshold
    rows = scan(spark, t).count()

    report = auto_optimize(spark, t)
    assert "compact" in report.triggered
    t.refresh()
    assert len(t.data_entries()) < n_before
    assert scan(spark, t).count() == rows

    # idempotent: a second tick has nothing to do
    report2 = auto_optimize(spark, t)
    assert report2.triggered == []


def test_thresholds_come_from_table_properties(spark, small_file_table):
    t = small_file_table
    # raise the bar: 20 small files are now below the compaction trigger
    t.commit("set-props", properties={"moonlink.compaction.min-files": "999"})
    report = auto_optimize(spark, t)
    assert "compact" not in report.triggered


def test_dv_accumulation_triggers_rewrite_deletes(spark, small_file_table):
    t = small_file_table
    t.commit(
        "set-props",
        properties={
            "moonlink.compaction.min-files": "999",  # keep compaction out
            "moonlink.rewrite-deletes.min-files": "2",
        },
    )
    # two MERGE batches -> two DV files
    for i, lsn in enumerate((20, 30)):
        cdc = (
            generate_images(spark, 30, partitions=2)
            .withColumn("op", F.lit("U"))
            .withColumn("lsn", F.lit(lsn))
        )
        merge_cdc_batch(spark, t, cdc, lsn=lsn)
    t.refresh()
    assert len(t.delete_entries()) >= 2
    rows = scan(spark, t).count()

    report = auto_optimize(spark, t)
    assert report.triggered == ["rewrite-deletes"]
    t.refresh()
    assert len(t.delete_entries()) == 1
    assert scan(spark, t).count() == rows


def test_manifest_count_and_expiry_triggers(spark, tmp_path):
    t = create_table(str(tmp_path / "tbl2"), IMAGES_SCHEMA)
    t.commit(
        "set-props",
        properties={
            "moonlink.compaction.min-files": "999",
            "moonlink.manifest-rewrite.min-manifests": "3",
            "moonlink.expire.retain-last": "2",
        },
    )
    for i in range(4):
        df = generate_images(spark, 30, partitions=1)
        entries = write_data_files(spark, df, t.new_data_dir())
        t.commit("append", added=entries, lsn=100 + i)
    rows = scan(spark, t).count()
    n_snaps = len(t.md.snapshots)
    assert len(t.md.current_snapshot().manifests) >= 3

    report = auto_optimize(spark, t)
    assert "manifest-rewrite" in report.triggered
    assert "expire" in report.triggered
    t.refresh()
    assert len(t.md.current_snapshot().manifests) < 3
    assert len(t.md.snapshots) <= max(2, n_snaps)
    assert scan(spark, t).count() == rows


def test_stale_stats_trigger_analyze(spark, small_file_table):
    from moonlink_spark.operators.analyze import (
        STATS_SNAPSHOT_PROP,
        analyze_table,
        table_stats,
    )

    t = small_file_table
    # disabled by default
    report = auto_optimize(spark, t)
    assert "analyze" not in report.triggered

    t.set_properties({"moonlink.analyze.max-snapshot-lag": "2"})
    analyze_table(spark, t)
    at0 = int(t.md.properties[STATS_SNAPSHOT_PROP])
    # one new commit: lag 1 < 2 -> no re-analyze
    df = generate_images(spark, 50, partitions=2)
    t.commit("append", added=write_data_files(spark, df, t.new_data_dir()),
             lsn=20)
    report = auto_optimize(spark, t)
    assert "analyze" not in report.triggered

    # second commit: lag reaches the threshold -> stats refresh
    df2 = generate_images(spark, 60, partitions=2)
    t.commit("append", added=write_data_files(spark, df2, t.new_data_dir()),
             lsn=21)
    report = auto_optimize(spark, t)
    assert "analyze" in report.triggered
    t.refresh()
    assert int(t.md.properties[STATS_SNAPSHOT_PROP]) > at0
    _, rows, _cols = table_stats(t)
    assert rows == scan(spark, t).count()


def test_optimize_all_fleet_sweep(spark, tmp_path):
    """One tick over a catalog: fragmented table compacts, clean table
    no-ops, a broken registration is reported, not raised."""
    from moonlink_spark.operators.maintenance import catalog_tables, optimize_all
    from moonlink_spark.table.namespace import FileCatalog

    cat = FileCatalog(str(tmp_path / "cat"))
    cat.create_namespace("db")
    frag = cat.create_table("db", "frag", IMAGES_SCHEMA)
    df = generate_images(spark, 400, partitions=4)
    frag.commit(
        "append",
        added=write_data_files(spark, df, frag.new_data_dir(),
                               max_records_per_file=20),
        lsn=1,
    )
    clean = cat.create_table("db", "clean", IMAGES_SCHEMA)
    clean.commit(
        "append",
        added=write_data_files(
            spark, generate_images(spark, 50, partitions=1), clean.new_data_dir()
        ),
        lsn=1,
    )
    import glob
    import os

    broken = cat.create_table("db", "broken", IMAGES_SCHEMA)
    # still listed (version hint intact) but its metadata roots are gone
    for p in glob.glob(os.path.join(broken.metadata_dir, "v*.metadata.json")):
        os.remove(p)

    results = {r.name: r for r in optimize_all(spark, catalog_tables(cat))}
    assert "compact" in results["db.frag"].report.triggered
    assert results["db.clean"].report.triggered == []
    assert results["db.broken"].error is not None
    assert results["db.broken"].report is None
    # content intact after the sweep
    frag.refresh()
    assert scan(spark, frag).count() == 400


def test_expiry_sweeps_orphaned_stats_files(spark, small_file_table):
    import os

    from moonlink_spark.operators.analyze import analyze_table
    from moonlink_spark.operators.expire import clean_stale_stats, expire_snapshots

    t = small_file_table
    res = analyze_table(spark, t)
    # simulate a crashed analyze: a stats puffin nobody references
    orphan = os.path.join(t.metadata_dir, "stats-99-deadbeef.puffin")
    with open(orphan, "wb") as f:
        f.write(b"PFA1junk")
    # grace window: a FRESH unreferenced file is an in-flight analyze whose
    # property CAS may not have landed yet — the sweep must keep it
    assert clean_stale_stats(t) == 0
    assert os.path.exists(orphan)
    # backdated past the grace window it is a true crash leftover
    old = os.path.getmtime(orphan) - 3600
    os.utime(orphan, (old, old))
    assert clean_stale_stats(t) == 1
    assert not os.path.exists(orphan)
    assert os.path.exists(res.path)  # the referenced stats file survives

    # and expiry runs the sweep as part of its GC
    with open(orphan, "wb") as f:
        f.write(b"PFA1junk")
    old = os.path.getmtime(orphan) - 3600
    os.utime(orphan, (old, old))
    for lsn in (11, 12, 13):
        df = generate_images(spark, 30, partitions=1)
        t.commit("append", added=write_data_files(spark, df, t.new_data_dir()),
                 lsn=lsn)
    expire_snapshots(t, retain_last=2)
    assert not os.path.exists(orphan)
    assert os.path.exists(res.path)


def test_cluster_drift_triggers_recluster(spark, tmp_path):
    from moonlink_spark.operators.cluster import cluster

    t = create_table(str(tmp_path / "cl"), IMAGES_SCHEMA)
    df = generate_images(spark, 300, partitions=2)
    t.commit("append", added=write_data_files(spark, df, t.new_data_dir()),
             lsn=1)
    cluster(spark, t, cols=("phash", "w"), strategy="zorder")
    t.set_properties({"moonlink.cluster.max-drift-ratio": "0.2"})

    # no drift yet -> no trigger
    rep = auto_optimize(spark, t)
    assert "cluster" not in rep.triggered

    # append ~50% new bytes -> drift over threshold -> recluster with the
    # SAME recorded cols/strategy
    df2 = generate_images(spark, 300, partitions=2)
    t.commit("append", added=write_data_files(spark, df2, t.new_data_dir()),
             lsn=2)
    rows = scan(spark, t).count()
    rep = auto_optimize(spark, t)
    assert "cluster" in rep.triggered
    assert rep.cluster.metrics["cols"] == ["phash", "w"]
    t.refresh()
    assert scan(spark, t).count() == rows

    # stable: immediately after reclustering there is no drift
    rep = auto_optimize(spark, t)
    assert "cluster" not in rep.triggered
