"""Incremental table→table replication over the changelog (CDC relay).

Moonlink's whole reason to exist is being the replication middle layer:
consume an ordered change stream from an upstream system and keep a
downstream Iceberg table transactionally in step (sink loop
src/moonlink_connectors/src/pg_replicate/moonlink_sink.rs:179-258; LSN
bookkeeping src/moonlink/src/storage/mooncake_table.rs:407-412). This module
closes the loop *between two tables of this engine*: the upstream table's
changelog (table/changelog.py) is the ordered stream, and one MERGE commit
applies each consumed window to the replica — so a replica is maintained
with O(changes) work per sync, never O(table).

Contract — the replica is *managed*: every commit it receives comes from
``sync_table``, stamped with the upstream LSN it consumed up to. That makes
the replica's own ``flush_lsn`` the resume cursor (exactly moonlink's
"iceberg-persisted LSN = WAL replay start", wal.rs:205-220) — no side
channel, and a crashed sync resumes correctly because MERGE is idempotent
at the commit LSN.

Semantics per window ``(cursor, target]``:
- changelog events map 1:1 to a CDC batch: insert → op 'U' with the
  post-image, delete → op 'D' (pre-image payload ignored; deletes key only);
  event LSN becomes the CDC row's ``lsn``.
- MERGE's latest-wins dedup then collapses the window correctly: a key
  updated twice keeps the later image; inserted-then-deleted nets to a
  delete; an upsert's delete+insert pair at one LSN resolves to the insert
  ('U' > 'D' at equal LSN, functions/salting.py).
- upstream maintenance (compaction/clustering) emits no events — the
  replica never re-copies rewritten bytes.

If the cursor has fallen below the upstream's changelog floor (snapshots
expired), the incremental window is unrecoverable; ``sync_table``
re-bootstraps from a full snapshot scan — allowed only while the replica is
empty, because a stale non-empty replica may hold keys whose deletes were
expired (a loud error tells the operator to recreate the replica).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField

from moonlink_spark.operators.merge import MERGE_KEY, MergeResult, merge_cdc_batch
from moonlink_spark.table.catalog import Table
from moonlink_spark.table.changelog import (
    CHANGE_LSN_COL,
    CHANGE_TYPE_COL,
    MIN_CHANGELOG_LSN_PROP,
    scan_changes,
)
from moonlink_spark.table.scan import scan


@dataclass
class SyncResult:
    from_lsn: int
    to_lsn: int
    bootstrapped: bool = False
    skipped: bool = False
    merge: MergeResult | None = None


def _as_cdc(events: DataFrame, cols: list[str]) -> DataFrame:
    op = F.when(F.col(CHANGE_TYPE_COL) == "insert", F.lit("U")).otherwise(F.lit("D"))
    return events.select(
        op.alias("op"),
        F.col(CHANGE_LSN_COL).cast("long").alias("lsn"),
        *cols,
    )


def _follow_schema(src: Table, dst: Table, keys: list[str]) -> None:
    """Mirror upstream add/drop-column evolution onto the replica.

    Changelog events are always read in the upstream's CURRENT schema
    (dropped columns gone, added columns NULL for pre-evolution rows —
    field-id identity resolution, operators/evolve.py), so evolving the
    replica first keeps the applied window consistent. The merge key must
    exist on both sides and type changes are not an evolution the engine
    supports — both are loud errors, not silent evolution: a replica whose
    key is absent was created against a different table entirely.
    """
    # renames first, detected by field-id equality (the id IS the column's
    # identity): a renamed upstream column must NOT degrade into drop+add on
    # the replica — that would null out pre-rename values for rows the
    # changelog window never touches. Only then diff by name.
    from moonlink_spark.table.fieldids import field_id

    src_ids = {
        field_id(f): f.name for f in src.schema.fields if field_id(f) is not None
    }
    dst_ids = {
        field_id(f): f.name for f in dst.schema.fields if field_id(f) is not None
    }
    renames = {
        dst_ids[i]: n for i, n in src_ids.items()
        if i in dst_ids and dst_ids[i] != n
    }
    if renames:
        from moonlink_spark.operators.evolve import rename_column

        # a rename SET can chain or swap (a->b while b->a): apply the ones
        # whose target name is free first; a pure cycle is broken through a
        # temp name (two metadata-only commits — still no data rewrite)
        names_now = {f.name for f in dst.schema.fields}
        pending = dict(renames)
        while pending:
            ready = [
                (o, n) for o, n in pending.items()
                if n not in names_now or n == o
            ]
            if ready:
                for o, n in ready:
                    rename_column(dst, o, n)
                    names_now.discard(o)
                    names_now.add(n)
                    del pending[o]
                continue
            o, n = next(iter(pending.items()))
            tmp = f"__sync_tmp_{o}"
            rename_column(dst, o, tmp)
            names_now.discard(o)
            names_now.add(tmp)
            del pending[o]
            pending[tmp] = n

    src_f = {f.name: f for f in src.schema.fields}
    dst_f = {f.name: f for f in dst.schema.fields}
    missing = [k for k in keys if k not in src_f or k not in dst_f]
    if missing:
        raise ValueError(
            f"replica schema mismatch: identity column(s) {missing} must "
            f"exist in both upstream {sorted(src_f)} and replica {sorted(dst_f)}"
        )
    mismatched = [
        n for n in src_f.keys() & dst_f.keys()
        if src_f[n].dataType != dst_f[n].dataType
    ]
    if mismatched:
        # an upstream widen-column (same id/name, wider type) is mirrored;
        # anything else stays a loud error — a replica whose types diverge
        # in a non-promotable way was created against a different table
        from moonlink_spark.operators.evolve import widen_column

        for n in list(mismatched):
            try:
                widen_column(dst, n, src_f[n].dataType)
                mismatched.remove(n)
            except ValueError:
                pass
    if mismatched:
        raise ValueError(
            f"replica schema mismatch: column types differ for {mismatched} "
            "(only widening promotions can be replicated)"
        )
    from moonlink_spark.operators.evolve import add_columns, drop_columns

    to_drop = [n for n in dst_f if n not in src_f]
    if to_drop:
        drop_columns(dst, to_drop)
    to_add = [
        StructField(f.name, f.dataType, nullable=True)
        for f in src.schema.fields
        if f.name not in dst_f
    ]
    if to_add:
        add_columns(dst, to_add)


def sync_table(
    spark: SparkSession,
    src: Table,
    dst: Table,
    key: str | list[str] | None = None,
    checkpoint_root: str | None = None,
) -> SyncResult:
    """Advance replica ``dst`` to upstream ``src``'s current LSN.

    Call repeatedly (cron, foreachBatch, after each upstream commit) — each
    call consumes exactly the upstream window the replica has not seen.
    Idempotent: re-running after a crash between MERGE and return is a no-op
    (MERGE skips at an already-flushed LSN).
    """
    from moonlink_spark.schema import normalize_keys, table_identity

    src.refresh()
    dst.refresh()
    keys = normalize_keys(key) if key is not None else table_identity(src)
    _follow_schema(src, dst, keys)
    src_names = [f.name for f in src.schema.fields]

    cursor = dst.flush_lsn or 0
    target = src.flush_lsn
    if target is not None and target < cursor:
        # upstream rolled back past what the replica already applied — the
        # replica holds undone rows; only a rebuild restores consistency
        raise ValueError(
            f"upstream rolled back to lsn={target} but the replica has "
            f"applied lsn={cursor}; recreate the replica to re-sync"
        )
    if target is None or target <= cursor:
        return SyncResult(cursor, cursor, skipped=True)

    floor = int(src.md.properties.get(MIN_CHANGELOG_LSN_PROP, 0))
    if cursor < floor:
        # incremental history gone (upstream expiry) — full re-bootstrap
        if dst.data_entries():
            raise ValueError(
                f"replica cursor lsn={cursor} predates upstream retained "
                f"history (floor lsn={floor}) and the replica is non-empty; "
                "recreate the replica to re-bootstrap"
            )
        snap = scan(spark, src, columns=src_names)
        cdc = snap.select(
            F.lit("U").alias("op"), F.lit(target).cast("long").alias("lsn"), *src_names
        )
        res = merge_cdc_batch(
            spark, dst, cdc, lsn=target, key=keys, checkpoint_root=checkpoint_root
        )
        return SyncResult(cursor, target, bootstrapped=True, merge=res)

    # deletes apply by key only: prune the pre-image read down to the key
    # column (the payload — kilobytes per image row — is never materialized)
    events = scan_changes(
        spark, src, cursor, target, columns=src_names, preimage_columns=keys
    )
    res = merge_cdc_batch(
        spark,
        dst,
        _as_cdc(events, src_names),
        lsn=target,
        key=keys,
        checkpoint_root=checkpoint_root,
    )
    return SyncResult(cursor, target, merge=res)


def stream_sync(
    spark: SparkSession,
    src: Table,
    dst: Table,
    checkpoint_location: str,
    key: str | list[str] | None = None,
    available_now: bool = True,
    **merge_kwargs,
):
    """Continuous replication: the datasource CDC stream
    (``spark.readStream.format("moonlink")``) drives ``sync_table``'s batch
    semantics as a running Structured Streaming query — the push-based face
    of the same replication middle layer (moonlink mirrors upstream change
    streams into tables continuously; here the upstream IS a table of this
    engine and each micro-batch of its changelog lands as one latest-wins
    MERGE commit stamped with the window's max LSN).

    Exactly-once by double cursor: Spark's checkpoint replays a crashed
    micro-batch, and MERGE skips at an already-flushed LSN — the same
    idempotence ``sync_table`` relies on. A first start with no checkpoint
    begins at the REPLICA's flush LSN, so pull-synced history is never
    re-read. Schema is pinned at query start: evolve the upstream, and the
    stream must be restarted (sync_table mirrors the evolution on its next
    pull; the restart path goes through it).

    With ``available_now`` the call drains everything committed so far and
    returns stats; pass False for a continuously running query (caller owns
    ``.stop()`` — the returned object is the StreamingQuery).
    """
    from moonlink_spark.datasource import register
    from moonlink_spark.streaming.stream import StreamStats

    register(spark)
    from moonlink_spark.schema import normalize_keys, table_identity

    src.refresh()
    dst.refresh()
    keys = normalize_keys(key) if key is not None else table_identity(src)
    _follow_schema(src, dst, keys)
    src_names = [f.name for f in src.schema.fields]
    stats = StreamStats()

    ev = (
        spark.readStream.format("moonlink")
        .option("cdc", "true")
        .option("startingLsn", str(dst.flush_lsn or 0))
        # deletes apply by key — the image payload never crosses Arrow for
        # pre-images (same narrowing sync_table asks of scan_changes)
        .option("preimageColumns", "keys")
        .load(src.location)
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        mx = batch_df.agg(F.max(CHANGE_LSN_COL).alias("mx")).collect()[0]["mx"]
        if mx is None:
            return
        dst.refresh()
        res = merge_cdc_batch(
            spark,
            dst,
            _as_cdc(batch_df, src_names),
            lsn=int(mx),
            key=keys,
            **merge_kwargs,
        )
        stats.batches += 1
        stats.skipped += int(res.skipped)
        stats.merged += int(not res.skipped)
        stats.results.append(res)

    writer = (
        ev.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_location)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return stats
    return writer.start()
