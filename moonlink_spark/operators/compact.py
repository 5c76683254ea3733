"""Bin-packing data compaction — fold deletes in, coalesce small files.

Mirrors moonlink's compaction (selection:
src/moonlink/src/storage/mooncake_table/snapshot_maintenance.rs:42-196;
execution: src/moonlink/src/storage/compaction/compactor.rs:75-432;
thresholds: src/moonlink/src/storage/compaction/compaction_config.rs:47-54 —
files < 512 MiB final size or >= 50% rows deleted; min 16 / max 32 files per
op in best-effort mode, min 2 forced, everything in full mode).

Spark-first execution: the selected files are scanned WITH their deletion
vectors applied (the anti-join), then ``repartitionByRange(bins, image_id)``
+ ``sortWithinPartitions`` rewrites them as ~512 MiB files clustered by key —
so post-compaction manifests carry tight image_id bounds and future MERGE
probes prune harder (moonlink instead remaps (file,pos) indices,
compactor.rs:331-365 — Spark's shuffle makes the remap unnecessary).

Delete-file hygiene (moonlink's deletion-log remap, O11,
snapshot_maintenance.rs:369-424): delete files whose rows ALL reference
compacted-away data files are removed in the same commit; mixed-reference
delete files are kept — their dangling rows anti-join against nothing and are
swept later by rewrite_manifests.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from moonlink_spark.checkpoint import JobCheckpoint
from moonlink_spark.schema import MERGE_KEY
from moonlink_spark.table.catalog import Table
from moonlink_spark.table.format import FileEntry, Snapshot
from moonlink_spark.table.scan import scan
from moonlink_spark.table.writer import COMPACT_TARGET_BYTES, write_data_files

BEST_EFFORT = "best_effort"
FORCE_REGULAR = "force_regular"
FULL = "full"


@dataclass
class CompactResult:
    snapshot: Snapshot | None
    in_files: int
    out_files: int
    in_bytes: int
    out_bytes: int
    removed_delete_files: int
    skipped: bool = False
    metrics: dict | None = None


def _delete_counts(spark: SparkSession, table: Table) -> dict[str, int]:
    """Per-data-file deleted-row counts from the snapshot's delete files."""
    dels = table.delete_entries()
    if not dels:
        return {}
    df = spark.read.schema("file_path string, pos long").parquet(*[e.path for e in dels])
    rows = df.groupBy("file_path").agg(F.countDistinct("pos").alias("n")).collect()
    return {r["file_path"]: r["n"] for r in rows}


def removable_delete_files(
    spark: SparkSession, table: Table, removed_data_paths: set[str]
) -> set[str]:
    """Delete files whose rows ALL reference removed data files — safe to drop
    in the same commit (moonlink's deletion-log remap analog, O11,
    snapshot_maintenance.rs:369-424)."""
    dels = table.delete_entries()
    if not dels:
        return set()
    ddf = spark.read.schema("file_path string, pos long").parquet(*[e.path for e in dels])
    refs = (
        ddf.withColumn("src", F.input_file_name())
        .withColumn("src", F.regexp_replace("src", r"^file:/+", "/"))
        .groupBy("src")
        .agg(F.collect_set("file_path").alias("targets"))
        .collect()
    )
    return {
        r["src"] for r in refs if all(t in removed_data_paths for t in r["targets"])
    }


def select_candidates(
    table: Table,
    del_counts: dict[str, int],
    mode: str = BEST_EFFORT,
    target_bytes: int = COMPACT_TARGET_BYTES,
    min_files: int = 16,
    max_files: int = 32,
    delete_ratio: float = 0.5,
) -> list[FileEntry]:
    """Trigger policy per compaction_config.rs:47-54 + mode overrides per
    snapshot_maintenance.rs:57-76."""
    data = table.data_entries()
    if mode == FULL:
        cand = [
            e
            for e in data
            if e.file_size_bytes < target_bytes or del_counts.get(e.path, 0) > 0
        ]
        return cand if len(cand) >= 2 else []
    cand = [
        e
        for e in data
        if e.file_size_bytes < target_bytes
        or (e.record_count and del_counts.get(e.path, 0) / e.record_count >= delete_ratio)
    ]
    cand.sort(key=lambda e: e.file_size_bytes)
    need = 2 if mode == FORCE_REGULAR else min_files
    if len(cand) < need:
        return []
    return cand[:max_files]


def compact(
    spark: SparkSession,
    table: Table,
    mode: str = BEST_EFFORT,
    target_bytes: int = COMPACT_TARGET_BYTES,
    min_files: int = 16,
    max_files: int = 32,
    delete_ratio: float = 0.5,
    key: str = MERGE_KEY,
    checkpoint_root: str | None = None,
) -> CompactResult:
    table.refresh()
    del_counts = _delete_counts(spark, table)
    selected = select_candidates(
        table, del_counts, mode, target_bytes, min_files, max_files, delete_ratio
    )
    if not selected:
        return CompactResult(None, 0, 0, 0, 0, 0, skipped=True)

    sel_paths = {e.path for e in selected}
    live_bytes = 0
    for e in selected:
        live_frac = 1.0 - (del_counts.get(e.path, 0) / max(e.record_count, 1))
        live_bytes += int(e.file_size_bytes * live_frac)
    bins = max(1, math.ceil(live_bytes / target_bytes))

    base_snapshot = table.md.current_snapshot_id
    ckpt = (
        JobCheckpoint(checkpoint_root, f"compact-snap{base_snapshot}")
        if checkpoint_root
        else None
    )

    def rewrite() -> list[FileEntry]:
        live = scan(spark, table, data_entries=selected)
        return write_data_files(
            spark,
            live,
            table.new_data_dir(),
            num_files=bins,
            range_cols=[key],
            sort_cols=[key],
        )

    if ckpt:
        new_entries = ckpt.run("rewrite", rewrite, sources=sorted(sel_paths)).entries
    else:
        new_entries = rewrite()

    # delete files now fully dangling → drop in the same commit
    removable_deletes = removable_delete_files(spark, table, sel_paths)

    metrics = {
        "mode": mode,
        "in_files": len(selected),
        "out_files": len(new_entries),
        "in_bytes": sum(e.file_size_bytes for e in selected),
        "out_bytes": sum(e.file_size_bytes for e in new_entries),
        "removed_delete_files": len(removable_deletes),
        "bins": bins,
    }
    snap = table.commit(
        "compact",
        added=new_entries,
        removed_paths=sel_paths | removable_deletes,
        summary_extra={"compact-metrics": metrics},
    )
    return CompactResult(
        snap,
        len(selected),
        len(new_entries),
        metrics["in_bytes"],
        metrics["out_bytes"],
        len(removable_deletes),
        metrics=metrics,
    )
