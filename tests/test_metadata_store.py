"""MetadataStore registry + restart recovery (moonlink_metadata_store /
backend recovery_utils parity)."""

from __future__ import annotations

import pytest

from moonlink_spark import pgoutput as pgo
from moonlink_spark.metadata_store import (
    MetadataStore,
    MetadataStoreError,
    TableMetadataEntry,
    recover_all_tables,
)
from moonlink_spark.pg_replication import ReplicationSink
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.scan import scan
from tests.test_pg_replication import IMG_REL, _txn, img_row


def test_registry_crud(tmp_path):
    db = str(tmp_path / "meta.db")
    store = MetadataStore(db)
    assert store.metadata_table_exists()
    e1 = TableMetadataEntry(
        "prod", "imgs", str(tmp_path / "t1"),
        src_table_name="public.images",
        src_table_uri="postgres://host/db",
        config={"moonlink.merge.mode": "lazy"},
    )
    store.store_table_metadata(e1)
    store.store_table_metadata(TableMetadataEntry("prod", "b", str(tmp_path / "t2")))
    with pytest.raises(MetadataStoreError, match="already registered"):
        store.store_table_metadata(e1)
    got = store.get_all_table_metadata_entries()
    assert [(g.database, g.table) for g in got] == [("prod", "b"), ("prod", "imgs")]
    assert got[1].config == {"moonlink.merge.mode": "lazy"}
    assert got[1].src_table_uri == "postgres://host/db"
    store.delete_table_metadata("prod", "b")
    assert len(store.get_all_table_metadata_entries()) == 1
    with pytest.raises(MetadataStoreError, match="not registered"):
        store.delete_table_metadata("prod", "b")
    store.close()

    # registry survives process restart (fresh connection, same file)
    store2 = MetadataStore(db)
    assert [g.table for g in store2.get_all_table_metadata_entries()] == ["imgs"]


def test_recovery_resumes_replication(spark, tmp_path):
    """Crash/restart: recover_all_tables re-attaches tables and reports the
    flush-LSN resume cursor; re-feeding the stream from before the cursor
    double-applies nothing (recovery_utils.rs:91-150 + wal.rs:205-220)."""
    store = MetadataStore(str(tmp_path / "meta.db"))
    loc = str(tmp_path / "imgs")
    t = create_table(loc, IMAGES_SCHEMA)
    store.store_table_metadata(
        TableMetadataEntry("prod", "imgs", loc, src_table_name="public.images")
    )

    enc = pgo.PgOutputEncoder()
    frames1 = _txn(
        enc,
        [enc.relation(IMG_REL)] + [enc.insert(IMG_REL, img_row(i)) for i in range(5)],
        final_lsn=100,
    )
    ReplicationSink(spark, {"public.images": t}).apply_frames(frames1)

    # --- "restart": recover from the registry alone
    rec = recover_all_tables(store)
    assert len(rec) == 1 and rec[0].error is None
    assert rec[0].flush_lsn == 100
    t2 = rec[0].table

    # resume the stream: replayed txn skipped, new txn applied
    enc2 = pgo.PgOutputEncoder()
    frames = _txn(
        enc2,
        [enc2.relation(IMG_REL)] + [enc2.insert(IMG_REL, img_row(i)) for i in range(5)],
        final_lsn=100,
    )
    frames += _txn(
        enc2, [enc2.insert(IMG_REL, img_row(9, "after"))], final_lsn=200, xid=2
    )
    sink = ReplicationSink(spark, {"public.images": t2})
    results = sink.apply_frames(frames)
    assert [r.skipped for r in results] == [True, False]
    assert scan(spark, t2).count() == 6


def test_recovery_isolates_broken_tables(tmp_path):
    store = MetadataStore(":memory:")
    store.store_table_metadata(
        TableMetadataEntry("prod", "gone", str(tmp_path / "nonexistent"))
    )
    ok = create_table(str(tmp_path / "ok"), IMAGES_SCHEMA)
    store.store_table_metadata(TableMetadataEntry("prod", "ok", ok.md.location))
    rec = recover_all_tables(store)
    by = {r.entry.table: r for r in rec}
    assert by["gone"].table is None and by["gone"].error
    assert by["ok"].table is not None and by["ok"].error is None
