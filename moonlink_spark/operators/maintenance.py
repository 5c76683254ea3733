"""Maintenance dispatch — optimize_table(mode), mirroring moonlink's backend
API (reference: src/moonlink_backend/src/lib.rs:306-333 ``optimize_table`` with
mode in {data, index, full}; event dispatch src/moonlink/src/table_handler.rs:272-324).

- ``data``  → forced bin-packing compaction (min 2 files)
- ``index`` → manifest rewrite + delete-file sweep (the Spark analog of
  moonlink's index merge — coalescing metadata-scale objects)
- ``full``  → full compaction + clustering-preserving manifest rewrite +
  snapshot expiry

Jobs run serialized per table (moonlink's single-writer event loop,
table_handler.rs:374-411); each is independently resumable via its
checkpoint.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from moonlink_spark.operators.compact import FORCE_REGULAR, FULL, compact
from moonlink_spark.operators.expire import expire_snapshots
from moonlink_spark.operators.manifest_rewrite import rewrite_manifests
from moonlink_spark.table.catalog import Table


@dataclass
class MaintenanceResult:
    mode: str
    compact: object | None = None
    manifest_rewrite: object | None = None
    expire: object | None = None


def optimize_table(
    spark: SparkSession,
    table: Table,
    mode: str = "full",
    retain_last: int = 2,
    checkpoint_root: str | None = None,
    target_bytes: int | None = None,
) -> MaintenanceResult:
    ckw = {"target_bytes": target_bytes} if target_bytes else {}
    res = MaintenanceResult(mode=mode)
    if mode == "data":
        res.compact = compact(
            spark, table, mode=FORCE_REGULAR, checkpoint_root=checkpoint_root, **ckw
        )
    elif mode == "index":
        res.manifest_rewrite = rewrite_manifests(spark, table)
    elif mode == "full":
        res.compact = compact(spark, table, mode=FULL, checkpoint_root=checkpoint_root, **ckw)
        res.manifest_rewrite = rewrite_manifests(spark, table)
        res.expire = expire_snapshots(table, retain_last=retain_last)
    else:
        raise ValueError(f"unknown maintenance mode: {mode}")
    return res
