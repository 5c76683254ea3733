"""Structured-Streaming front-end: a CDC stream drained into MERGE commits.

Moonlink's ingestion front-ends (PG logical replication, reference:
src/moonlink_connectors/src/pg_replicate/moonlink_sink.rs:188-392; REST,
src/moonlink_connectors/src/rest_ingest/moonlink_rest_sink.rs:179-258) feed a
single-writer event loop that periodically snapshots. The Spark-first
equivalent: ``readStream`` over the CDC log → ``foreachBatch`` → one
``merge_cdc_batch`` per micro-batch, i.e. one Iceberg-style snapshot commit
per micro-batch — moonlink's "streaming transaction commits atomically at its
commit LSN" guarantee (src/moonlink/src/storage/mooncake_table/
transaction_stream.rs:137-143) carried by the snapshot CAS.

Exactly-once: the streaming checkpoint replays an unacknowledged micro-batch
after a crash, and ``merge_cdc_batch`` is idempotent per LSN (table LSN >=
batch LSN → no-op), so replays never double-apply — the same
WAL-replay-meets-persisted-LSN dance as moonlink recovery
(src/moonlink/src/storage/wal.rs:205-220).

No watermark is needed: the CDC log is LSN-ordered by construction, the same
reason moonlink has no event-time semantics (LSN monotonicity asserted at
src/moonlink/src/storage/mooncake_table.rs:1223-1228). A batch whose LSN
range is entirely <= the table's flush LSN is a replay and is dropped by
idempotence; a batch that STRADDLES the flush LSN violates the ordering
assumption and fails loudly (see the guard in ``apply_cdc_stream``) instead
of silently losing or regressing data.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moonlink_spark.operators.merge import MergeResult, merge_cdc_batch
from moonlink_spark.schema import CDC_SCHEMA, MERGE_KEY
from moonlink_spark.table.catalog import Table
from moonlink_spark.table.io import accessor_for


@dataclass
class StreamStats:
    batches: int = 0
    merged: int = 0
    skipped: int = 0
    results: list = field(default_factory=list)


class StreamingTransaction:
    """Explicit streaming transaction: stage CDC rows across multiple
    appends, then commit atomically at one LSN — or abort, discarding all
    staged rows (moonlink O6, reference:
    src/moonlink/src/storage/mooncake_table/transaction_stream.rs:137-143 —
    TransactionStreamOutput::Commit/Abort).

    Staged rows live in a transaction-private directory outside any
    snapshot; nothing is visible to readers until ``commit`` lands the
    single MERGE snapshot. ``abort`` deletes the staging area — because no
    metadata ever referenced it, abort needs no table commit at all (the
    same reason moonlink's abort just drops the stream state).
    """

    def __init__(self, spark: SparkSession, table: Table, key: str = MERGE_KEY):
        self.spark = spark
        self.table = table
        self.key = key
        self.xact_id = uuid.uuid4().hex[:16]
        self._stage_dir = os.path.join(table.data_root, "stage", self.xact_id)
        self._acc = accessor_for(self._stage_dir)
        self._acc.mkdirs(self._stage_dir)
        self._open = True
        self.appended = 0

    def _cdc_schema(self):
        """op + lsn + the TABLE's columns — transactions work on any table
        schema (typed envelope, composite identity), not just images."""
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        return StructType(
            [
                StructField("op", StringType(), False),
                StructField("lsn", LongType(), False),
            ]
            + [StructField(f.name, f.dataType, True) for f in self.table.schema.fields]
        )

    def append(self, cdc_df: DataFrame) -> None:
        """Stage a chunk of CDC rows (schema: op, lsn, <table columns>)."""
        if not self._open:
            raise RuntimeError("transaction already committed or aborted")
        cdc_df.write.mode("append").parquet(self._stage_dir)
        self.appended += 1

    def commit(self, lsn: int, **merge_kwargs) -> MergeResult:
        """Apply everything staged as ONE MERGE snapshot at ``lsn``.

        The transaction closes only on a SUCCESSFUL merge: a failed commit
        (snapshot CAS conflict, LSN monotonicity violation) leaves it open,
        so the caller can retry ``commit`` at a corrected LSN or ``abort``
        — either way the staged files are never leaked."""
        if not self._open:
            raise RuntimeError("transaction already committed or aborted")
        staged = self.spark.read.schema(self._cdc_schema()).parquet(self._stage_dir)
        res = merge_cdc_batch(
            self.spark, self.table, staged, lsn, key=self.key, **merge_kwargs
        )
        self._open = False
        self._cleanup()
        return res

    def abort(self) -> None:
        """Discard all staged rows; the table is untouched (no snapshot was
        ever created, so readers never saw anything)."""
        if not self._open:
            raise RuntimeError("transaction already committed or aborted")
        self._open = False
        self._cleanup()

    def _cleanup(self) -> None:
        for p in self._acc.list(self._stage_dir):
            self._acc.delete(p)
        self._acc.delete_prefix(self._stage_dir)


def cdc_file_stream(
    spark: SparkSession, cdc_dir: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """CDC log as a file stream: each Parquet file dropped into ``cdc_dir`` is
    one (or part of one) transaction batch."""
    r = spark.readStream.schema(CDC_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return r.parquet(cdc_dir)


def apply_cdc_stream(
    spark: SparkSession,
    table: Table,
    cdc_stream: DataFrame,
    checkpoint_location: str,
    key: str = MERGE_KEY,
    available_now: bool = True,
    merge_checkpoint_root: str | None = None,
    **merge_kwargs,
) -> StreamStats:
    """Drain ``cdc_stream`` into the table, one MERGE commit per micro-batch.

    With ``available_now`` the call processes everything currently in the
    source and returns (the batch-maintenance posture); pass False for a
    continuously running query (returns after ``.stop()``).
    """
    stats = StreamStats()

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        r = batch_df.agg(F.min("lsn").alias("mn"), F.max("lsn").alias("mx")).collect()[0]
        mn, mx = r["mn"], r["mx"]
        if mx is None:
            return
        # The "CDC log is LSN-ordered" assumption is load-bearing — VERIFY it
        # instead of assuming: a batch that straddles the table's flush LSN
        # (min <= flushed < max) is an out-of-order/partial-overlap segment
        # (mod-time ties, producer clock skew). Applying it would either drop
        # data as a fake replay or let stale events win — fail loudly.
        flushed = table.refresh().flush_lsn
        if flushed is not None and int(mn) <= flushed < int(mx):
            raise ValueError(
                f"out-of-order CDC segment: batch LSN range [{mn}, {mx}] "
                f"straddles table flush LSN {flushed}; the source is not "
                "LSN-ordered — quarantine or re-order the segment"
            )
        res: MergeResult = merge_cdc_batch(
            spark,
            table,
            batch_df,
            int(mx),
            key=key,
            checkpoint_root=merge_checkpoint_root,
            **merge_kwargs,
        )
        stats.batches += 1
        stats.skipped += int(res.skipped)
        stats.merged += int(not res.skipped)
        stats.results.append(res)

    writer = (
        cdc_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_location)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.start()
        q.awaitTermination()
    return stats
