"""Bucket-layout rescale — change a table's hash-bucket count atomically.

The bucketed layout (writer.py BUCKETS_PROP / BUCKET_KEY_PROP) persists a
bucket id per data file; the MERGE probe recomputes the batch's bucket set
with the TABLE's current bucket count (merge.py `bucket_expr(keys, buckets)`).
Build and probe must therefore agree on the count: changing `write.buckets`
without rewriting every bucketed file would silently desync persisted ids
from probe hashes and prune files that DO contain batch keys — the same
invariant moonlink keeps by fixing `num_buckets` inside each persisted index
file and rebuilding the index when layout changes (reference:
src/moonlink/src/storage/index/persisted_bucket_hash_map.rs:73-93, index
rebuild at compaction src/moonlink/src/storage/compaction/compactor.rs:331-365).

`rebucket_table` is the safe path: ONE commit that rewrites every live row
through the new bucketizer (deletes folded, blooms rebuilt over the same
sidecar discipline) and flips `write.buckets` in the same atomic metadata
swap. A crash before the CAS leaves the old layout fully intact (the
orphaned outputs are swept by remove_orphan_files); a concurrent MERGE's
delete files would dangle after the rewrite and abort it
(`conflict_on_new_deletes`).

Scale posture: inherently O(table) — a rescale IS a full rewrite — but it is
exactly one shuffle (repartition by new bucket id), the same plan as
compaction's deferred bucketize; bucket count = write parallelism, which is
the knob this operator exists to raise when a table outgrows its layout.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from moonlink_spark.table.catalog import Table
from moonlink_spark.table.format import EQ_DELETES, Snapshot
from moonlink_spark.table.scan import scan
from moonlink_spark.table.writer import (
    BUCKETS_PROP,
    COMPACT_TARGET_BYTES,
    table_bucket_key,
    table_buckets,
    write_bucketed_data_files,
)


@dataclass
class RebucketResult:
    snapshot: Snapshot | None
    old_buckets: int | None
    new_buckets: int
    in_files: int
    out_files: int
    skipped: bool = False


def rebucket_table(
    spark: SparkSession,
    table: Table,
    new_buckets: int,
    target_bytes: int = COMPACT_TARGET_BYTES,
) -> RebucketResult:
    """Rewrite the whole table into ``new_buckets`` hash buckets and update
    ``write.buckets`` in the same commit.

    Also the supported way to bucketize a previously UN-bucketed table in
    one shot (old_buckets None -> new layout). The rewrite scan applies
    positional and equality deletes, so every delete file is dangling
    afterwards and dropped in the same commit.
    """
    if new_buckets < 1:
        raise ValueError(f"new_buckets must be >= 1, got {new_buckets}")
    table.refresh()
    old = table_buckets(table)
    entries = table.data_entries()
    if old == new_buckets:
        return RebucketResult(None, old, new_buckets, len(entries), 0, skipped=True)
    if not entries:
        # metadata-only: no files carry ids yet, the property can just flip
        table.set_properties({BUCKETS_PROP: str(new_buckets)})
        return RebucketResult(None, old, new_buckets, 0, 0)

    rows = sum(e.record_count for e in entries)
    row_bytes = max(64, sum(e.file_size_bytes for e in entries) // max(rows, 1))
    live = scan(spark, table, data_entries=entries)
    new_entries = [
        e
        for e in write_bucketed_data_files(
            spark,
            live,
            table.new_data_dir(),
            key=table_bucket_key(table),
            buckets=new_buckets,
            max_records_per_file=max(256, target_bytes // row_bytes),
            field_id_schema=table.schema,
        )
        if e.record_count > 0
    ]
    removed = (
        {e.path for e in entries}
        | {e.path for e in table.delete_entries()}
        | {e.path for e in table.entries(content=EQ_DELETES)}
    )
    snap = table.commit_with_retry(
        "rebucket",
        added=new_entries,
        removed_paths=removed,
        conflict_on_new_deletes=True,
        properties={BUCKETS_PROP: str(new_buckets)},
        summary_extra={
            "rebucket": f"{old}->{new_buckets}",
            "rebucket-in-files": len(entries),
            "rebucket-out-files": len(new_entries),
        },
    )
    return RebucketResult(snap, old, new_buckets, len(entries), len(new_entries))
