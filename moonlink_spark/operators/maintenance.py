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

from moonlink_spark.operators.compact import (
    BEST_EFFORT,
    COMPACT_TARGET_BYTES,
    FORCE_REGULAR,
    FULL,
    compact,
    rewrite_equality_deletes,
    rewrite_position_deletes,
)
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


# ---------------------------------------------------------------------------
# Automatic maintenance: moonlink decides WHEN to compact / merge indexes
# inside its snapshot event loop from config thresholds
# (compaction_config.rs:7-27 min/max files + final size + deletion
# percentage; index_merge_config.rs:9-21; dispatch
# mooncake_table/snapshot.rs:568-573). The batch analog reads the same
# thresholds from TABLE PROPERTIES, so a scheduler can run one idempotent
# `auto_optimize(table)` per table per tick and only the tables that crossed
# a threshold do any work.

AUTO_DEFAULTS = {
    # data compaction (reference release defaults: 16/32 files, 512 MiB
    # final size, 50% deletion percentage)
    "moonlink.compaction.min-files": "16",
    "moonlink.compaction.max-files": "32",
    "moonlink.compaction.target-bytes": str(COMPACT_TARGET_BYTES),
    "moonlink.compaction.delete-ratio": "0.5",
    # equality-delete resolution (lazy MERGE residue): pay the key probe
    # once and convert keys -> positional DVs, so scans drop the per-row
    # key anti-join without an O(table) data rewrite
    "moonlink.resolve-eq-deletes.min-files": "4",
    # DV-file consolidation between compactions (merge-on-read hygiene)
    "moonlink.rewrite-deletes.min-files": "8",
    # manifest coalescing (the index-merge analog: metadata-scale objects)
    "moonlink.manifest-rewrite.min-manifests": "16",
    # snapshot expiry: 0 disables auto-expiry
    "moonlink.expire.retain-last": "0",
    "moonlink.expire.older-than-ms": "",
    # column-statistics refresh (operators/analyze.py): re-ANALYZE when the
    # stats snapshot trails the head by >= this many data-changing commits;
    # 0 disables auto-analyze
    "moonlink.analyze.max-snapshot-lag": "0",
    # automatic re-clustering (liquid-clustering-style drift threshold):
    # re-run the table's clustering rewrite when data bytes written AFTER
    # the last cluster commit exceed this fraction of total data bytes.
    # Empty disables; requires a prior manual cluster() (its strategy/cols
    # are re-read from that commit's recorded metrics).
    "moonlink.cluster.max-drift-ratio": "",
}


def _prop(table: Table, name: str, cast):
    raw = table.md.properties.get(name, AUTO_DEFAULTS[name])
    if raw == "" or raw is None:
        return None
    return cast(raw)


@dataclass
class AutoMaintenanceReport:
    triggered: list[str]
    compact: object | None = None
    resolve_eq_deletes: object | None = None
    rewrite_deletes: object | None = None
    manifest_rewrite: object | None = None
    expire: object | None = None
    analyze: object | None = None
    cluster: object | None = None
    publish: object | None = None


def auto_optimize(
    spark: SparkSession,
    table: Table,
    checkpoint_root: str | None = None,
) -> AutoMaintenanceReport:
    """Run exactly the maintenance the table's own thresholds call for.

    Order matters and mirrors the reference's event-loop sequencing:
    equality-delete resolution first (the cheap key probe — O(key columns +
    matches), no data rewrite — so compaction never pays the O(table) fold
    for keys a DV bit can express, and its delete-ratio trigger sees true
    positional counts), then data compaction (it also folds DVs and
    bucketizes un-indexed files), then DV consolidation for whatever
    merge-on-read delete files remain, then manifest coalescing, then
    snapshot expiry. Each step re-reads
    fresh metadata, so a step only sees what the previous steps left
    behind; every step is independently a no-op below its threshold, which
    makes the whole call idempotent — safe on a cron against thousands of
    tables.
    """
    report = AutoMaintenanceReport(triggered=[])

    re_eq = rewrite_equality_deletes(
        spark,
        table,
        min_files=_prop(table, "moonlink.resolve-eq-deletes.min-files", int),
    )
    if not re_eq.skipped:
        report.triggered.append("resolve-eq-deletes")
        report.resolve_eq_deletes = re_eq

    res = compact(
        spark,
        table,
        mode=BEST_EFFORT,
        target_bytes=_prop(table, "moonlink.compaction.target-bytes", int),
        min_files=_prop(table, "moonlink.compaction.min-files", int),
        max_files=_prop(table, "moonlink.compaction.max-files", int),
        delete_ratio=_prop(table, "moonlink.compaction.delete-ratio", float),
        checkpoint_root=checkpoint_root,
    )
    if not res.skipped:
        report.triggered.append("compact")
        report.compact = res

    rd = rewrite_position_deletes(
        spark,
        table,
        min_files=_prop(table, "moonlink.rewrite-deletes.min-files", int),
    )
    if not rd.skipped:
        report.triggered.append("rewrite-deletes")
        report.rewrite_deletes = rd

    table.refresh()
    cur = table.head_snapshot()
    n_manifests = len(cur.manifests) if cur else 0
    if n_manifests >= _prop(table, "moonlink.manifest-rewrite.min-manifests", int):
        report.manifest_rewrite = rewrite_manifests(spark, table)
        report.triggered.append("manifest-rewrite")

    retain = _prop(table, "moonlink.expire.retain-last", int)
    if retain and retain > 0:
        ex = expire_snapshots(
            table,
            retain_last=retain,
            older_than_ms=_prop(table, "moonlink.expire.older-than-ms", int),
        )
        if not ex.skipped:
            report.triggered.append("expire")
            report.expire = ex

    _maybe_auto_cluster(spark, table, report)
    _maybe_auto_analyze(spark, table, report)
    _maybe_auto_publish(spark, table, report)

    return report


#: table property: when set, auto maintenance keeps a genuine Apache
#: Iceberg export of the table at this destination (operators/publish.py)
#: — the batch analog of moonlink's CONTINUOUS mooncake→Iceberg sync
#: (iceberg_table_syncer.rs:505-596: every snapshot lands in Iceberg).
PUBLISH_DEST_PROP = "moonlink.publish.dest"


def _maybe_auto_publish(spark, table, report):
    """Re-export the table as Iceberg when the published snapshot is
    behind the current one. Skip detection reads the DESTINATION's own
    version-hint/metadata — no state is kept on the source table, so a
    wiped or re-pointed destination simply republishes."""
    import json as _json
    import os as _os

    dest = table.md.properties.get(PUBLISH_DEST_PROP)
    if not dest:
        return
    from moonlink_spark.operators.publish import publish_iceberg

    table.refresh()
    cur = table.head_snapshot()
    if cur is None:
        return
    hint = _os.path.join(dest, "metadata", "version-hint.text")
    try:
        with open(hint) as f:
            v = int(f.read().strip())
        with open(_os.path.join(dest, "metadata", f"v{v}.metadata.json")) as f:
            published = _json.load(f)["current-snapshot-id"]
    except (OSError, ValueError, KeyError):
        published = None
    if published == cur.snapshot_id:
        return
    report.publish = publish_iceberg(spark, table, dest)
    report.triggered.append("publish")


def _maybe_auto_cluster(spark, table, report):
    """Re-cluster when enough new bytes landed since the last clustering
    rewrite — the batch analog of liquid clustering's background
    re-organization. Drift is measured from metadata only (per-entry
    sequence numbers vs the last cluster commit's sequence), so the check
    is free; the rewrite itself is the ordinary cluster() full rewrite
    (which folds deletes and re-attaches key blooms)."""
    ratio = _prop(table, "moonlink.cluster.max-drift-ratio", float)
    if not ratio or ratio <= 0:
        return
    table.refresh()
    last = None
    for s in table.md.snapshots:
        op = s.summary.get("operation", "")
        if op.startswith("cluster-") and (
            last is None or s.sequence_number > last.sequence_number
        ):
            last = s
    if last is None:
        return  # never clustered — auto mode has nothing to restore
    entries = table.data_entries()
    total = sum(e.file_size_bytes for e in entries)
    drifted = sum(
        e.file_size_bytes
        for e in entries
        if e.sequence_number > last.sequence_number
    )
    if total == 0 or drifted / total < ratio:
        return
    from moonlink_spark.operators.cluster import cluster

    m = last.summary.get("cluster-metrics", {})
    res = cluster(
        spark,
        table,
        cols=tuple(m.get("cols") or ("phash", "w", "h")),
        strategy=m.get("strategy", "zorder"),
    )
    report.cluster = res
    report.triggered.append("cluster")


@dataclass
class FleetTableResult:
    name: str
    report: AutoMaintenanceReport | None = None
    error: str | None = None


def optimize_all(spark: SparkSession, tables) -> list[FleetTableResult]:
    """One maintenance tick across a fleet of tables — the scheduler loop
    moonlink runs per-table inside its event loop, as a batch sweep.

    ``tables`` is an iterable of (name, Table) — or (name, zero-arg loader)
    so even table LOADING failures stay isolated. Each table gets one
    idempotent ``auto_optimize`` call under per-table fault isolation: a
    broken table is reported, not raised, so one bad table never blocks
    the rest (the recovery_utils.rs:118-150 discipline). Scale note: the
    sweep is sequential by design — each auto_optimize already
    parallelizes its Spark work across the cluster, and maintenance
    thresholds make untouched tables O(metadata) no-ops, so a tick over
    thousands of tables is dominated by the few that need work.
    """
    out: list[FleetTableResult] = []
    for name, t in tables:
        try:
            if callable(t):
                t = t()
            out.append(FleetTableResult(name, report=auto_optimize(spark, t)))
        except Exception as e:  # noqa: BLE001 — per-table fault isolation
            out.append(FleetTableResult(name, error=str(e)))
    return out


def catalog_tables(catalog):
    """(name, loader) pairs for every table in a FileCatalog — feed for
    ``optimize_all`` (lazy load keeps broken tables isolated)."""
    for ns in catalog.list_namespaces():
        for name in catalog.list_tables(ns):
            yield (
                f"{ns}.{name}",
                lambda ns=ns, name=name: catalog.load_table(ns, name),
            )


def store_tables(store):
    """(name, Table) pairs for every REACHABLE table in a MetadataStore
    registry (broken entries are skipped here; recover_all_tables reports
    them)."""
    from moonlink_spark.metadata_store import recover_all_tables

    for r in recover_all_tables(store):
        if r.table is not None:
            yield f"{r.entry.database}.{r.entry.table}", r.table


def _maybe_auto_analyze(spark, table, report):
    max_lag = _prop(table, "moonlink.analyze.max-snapshot-lag", int)
    if max_lag and max_lag > 0:
        from moonlink_spark.operators.analyze import STATS_SNAPSHOT_PROP, analyze_table

        table.refresh()
        head = table.head_snapshot()
        if head is not None:
            at = int(table.md.properties.get(STATS_SNAPSHOT_PROP, "-1"))
            # lag counts snapshots newer than the analyzed one — replace
            # commits included (compaction changes file-level stats too)
            lag = sum(1 for s in table.md.snapshots if s.snapshot_id > at)
            if lag >= max_lag:
                report.analyze = analyze_table(spark, table)
                report.triggered.append("analyze")

    return report
