"""moonlink_spark — a from-scratch PySpark-native table-maintenance engine.

Reproduces the semantics of nbiscaro/moonlink (a Rust ingestion +
Iceberg-maintenance engine, see SURVEY.md) as idiomatic Spark batch jobs over a
minimal Iceberg-v2-style table format implemented here:

- MERGE INTO (CDC upsert/delete batches) with LSN-stamped snapshot commits
  (reference: src/moonlink/src/storage/mooncake_table.rs:1134-1239)
- positional deletes as (file, pos) parquet files applied via anti-join on
  Spark's ``_metadata.row_index``
  (reference: src/moonlink/src/storage/mooncake_table/delete_vector.rs:8-105)
- bin-packing compaction, Z-order / Hilbert clustering, manifest rewrite with
  per-column min/max stats, snapshot expiry
  (reference: src/moonlink/src/storage/compaction/compactor.rs,
   src/moonlink/src/storage/iceberg/*)
- per-partition checkpoint lineage + metrics, idempotent resume
  (reference WAL: src/moonlink/src/storage/wal.rs)

Everything data-sized runs inside Spark (DataFrame ops, Arrow-vectorized
pandas UDFs); only metadata (manifest lists, commit CAS) is driver-side.
"""

__version__ = "0.1.0"

from moonlink_spark.table.catalog import create_table, load_table  # noqa: F401


def __getattr__(name):
    # lazy top-level conveniences (keep import light; Spark-heavy modules
    # load only when first touched)
    lazy = {
        "merge_cdc_batch": ("moonlink_spark.operators.merge", "merge_cdc_batch"),
        "optimize_table": ("moonlink_spark.operators.maintenance", "optimize_table"),
        "auto_optimize": ("moonlink_spark.operators.maintenance", "auto_optimize"),
        "sync_table": ("moonlink_spark.operators.sync", "sync_table"),
        "stream_sync": ("moonlink_spark.operators.sync", "stream_sync"),
        "clone_table": ("moonlink_spark.operators.clone", "clone_table"),
        "remove_orphan_files": ("moonlink_spark.operators.orphans", "remove_orphan_files"),
        "rebucket_table": ("moonlink_spark.operators.rebucket", "rebucket_table"),
        "analyze_table": ("moonlink_spark.operators.analyze", "analyze_table"),
        "table_stats": ("moonlink_spark.operators.analyze", "table_stats"),
        "register_datasource": ("moonlink_spark.datasource", "register"),
        "rewrite_position_deletes": ("moonlink_spark.operators.compact", "rewrite_position_deletes"),
        "expire_snapshots": ("moonlink_spark.operators.expire", "expire_snapshots"),
        "scan": ("moonlink_spark.table.scan", "scan"),
        "scan_at_lsn": ("moonlink_spark.table.scan", "scan_at_lsn"),
        "scan_range": ("moonlink_spark.table.scan", "scan_range"),
        "scan_changes": ("moonlink_spark.table.changelog", "scan_changes"),
        "register_view": ("moonlink_spark.table.scan", "register_view"),
        "inspect_snapshots": ("moonlink_spark.table.inspect", "snapshots"),
        "inspect_history": ("moonlink_spark.table.inspect", "history"),
        "inspect_files": ("moonlink_spark.table.inspect", "files"),
        "inspect_delete_files": ("moonlink_spark.table.inspect", "delete_files"),
        "inspect_manifests": ("moonlink_spark.table.inspect", "manifests"),
        "inspect_refs": ("moonlink_spark.table.inspect", "refs"),
        "inspect_stats": ("moonlink_spark.table.inspect", "stats"),
        "create_tag": ("moonlink_spark.table.refs", "create_tag"),
        "create_branch": ("moonlink_spark.table.refs", "create_branch"),
        "drop_ref": ("moonlink_spark.table.refs", "drop_ref"),
        "list_refs": ("moonlink_spark.table.refs", "list_refs"),
        "resolve_ref": ("moonlink_spark.table.refs", "resolve_ref"),
        "fast_forward": ("moonlink_spark.table.refs", "fast_forward"),
        "rewrite_equality_deletes": (
            "moonlink_spark.operators.compact",
            "rewrite_equality_deletes",
        ),
        "FileCatalog": ("moonlink_spark.table.namespace", "FileCatalog"),
        "ReplicationSink": ("moonlink_spark.pg_replication", "ReplicationSink"),
        "initial_copy": ("moonlink_spark.pg_replication", "initial_copy"),
        "MetadataStore": ("moonlink_spark.metadata_store", "MetadataStore"),
        "recover_all_tables": ("moonlink_spark.metadata_store", "recover_all_tables"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'moonlink_spark' has no attribute {name!r}")
