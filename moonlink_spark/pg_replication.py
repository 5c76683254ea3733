"""Replication sink: pgoutput event stream → MERGE snapshot commits.

The Spark-first re-expression of moonlink's ``Sink::process_cdc_event``
(reference: src/moonlink_connectors/src/pg_replicate/moonlink_sink.rs:188-392):

- **Begin** records the transaction's final LSN; data events buffer per
  table; **Commit** applies each touched table's buffer as ONE
  ``merge_cdc_batch`` snapshot at the commit's ``end_lsn`` (the reference
  marks its replication state at the same LSN and emits per-table Commit
  events) — so one PG transaction = one Iceberg-style snapshot per touched
  table, and restarting the stream from an older LSN is a no-op by MERGE's
  LSN idempotence (the WAL-replay recovery rule, wal.rs:205-220).
- **Streamed transactions** (protocol v2 ``streaming 'on'``): in-stream data
  events are staged into a per-xid :class:`StreamingTransaction` segment by
  segment — Stream Commit lands the single snapshot, Stream Abort discards
  the staging area with no table commit at all (transaction_stream.rs
  Commit/Abort semantics). Driver memory stays O(segment), not O(xact).
- **Update decomposition**: an update whose REPLICA IDENTITY tuple shows the
  row identity changed becomes delete(old identity) + upsert(new) at one
  LSN — moonlink's update = delete + append split (moonlink_sink.rs:286-317);
  identity-stable updates are plain upserts (op "U" already is
  delete+append inside MERGE).
- **Unchanged-TOAST** tuple values substitute the column type's default like
  the reference (conversions/cdc_event.rs:58, text.rs:133-173), or raise
  under ``on_unchanged_toast="error"`` for callers who prefer loud over
  lossy (upserts rewrite whole rows, so the default is only byte-faithful
  when the table's replica identity is FULL).
- **Truncate** is refused, matching the reference's
  ``CdcEventConversionError::MessageNotSupported``.

The socket itself (CopyBoth on a replication connection) is transport and
has no PostgreSQL server in this sandbox; :func:`moonlink_spark.pgoutput.
iter_copy_data` consumes the exact frame bytes a socket would deliver, and
:meth:`ReplicationSink.standby_status` produces the feedback frame a real
client would send back. Everything engine-owned — decode, typing,
transaction semantics, exactly-once — is implemented and tested against
synthetic wire bytes.
"""

from __future__ import annotations

import datetime as dt
import struct
import uuid as _uuid
from decimal import Decimal

from pyspark.sql import SparkSession
from pyspark.sql.types import StructField, StructType

from moonlink_spark import pgoutput as pgo
from moonlink_spark.operators.merge import MergeResult, merge_cdc_batch
from moonlink_spark.schema import table_identity
from moonlink_spark.streaming.stream import StreamingTransaction
from moonlink_spark.table.catalog import Table

#: reference default_value (text.rs:133-173) keyed by PG type OID
_DEFAULTS = {
    pgo.BOOL: False, pgo.INT2: 0, pgo.INT4: 0, pgo.INT8: 0, pgo.OID: 0,
    pgo.FLOAT4: 0.0, pgo.FLOAT8: 0.0, pgo.NUMERIC: Decimal(0),
    pgo.BYTEA: b"", pgo.CHAR: "", pgo.NAME: "", pgo.TEXT: "",
    pgo.BPCHAR: "", pgo.VARCHAR: "", pgo.JSON: "null", pgo.JSONB: "null",
    pgo.DATE: dt.date.min, pgo.TIME: dt.time.min,
    pgo.TIMESTAMP: dt.datetime.min,
    pgo.TIMESTAMPTZ: dt.datetime.min.replace(tzinfo=dt.timezone.utc),
    pgo.UUID: _uuid.UUID(int=0),
}


class ReplicationError(RuntimeError):
    pass


def _cdc_schema(table: Table) -> StructType:
    from pyspark.sql.types import LongType, StringType

    return StructType(
        [
            StructField("op", StringType(), False),
            StructField("lsn", LongType(), False),
        ]
        + [StructField(f.name, f.dataType, True) for f in table.schema.fields]
    )


def initial_copy(
    spark: SparkSession, table: Table, source_df, start_lsn: int
) -> None:
    """Bootstrap a table from a snapshot of the upstream relation before
    streaming begins — moonlink's initial copy (reference:
    pg_replicate/initial_copy.rs:31-117: the COPY stream is written to
    Parquet and bulk-ingested via one LoadFiles event at the slot's
    consistent-point LSN; the slot is created with USE_SNAPSHOT so the
    snapshot and the stream start are the same point,
    clients/postgres.rs:740).

    ``source_df`` is the snapshot (in production: ``spark.read.jdbc`` of
    the PG table under the exported snapshot); ``start_lsn`` is the slot's
    consistent point. One commit lands the whole copy; replication then
    replays from the slot and every transaction at or below ``start_lsn``
    is skipped by MERGE LSN idempotence — the exact recovery rule the
    streamed path already obeys.
    """
    from moonlink_spark.table.writer import write_data_files

    table.refresh()
    if table.flush_lsn is not None and table.flush_lsn >= start_lsn:
        return  # copy already landed (crash-retry); stream replay handles the rest
    entries = write_data_files(
        spark,
        source_df.select(*[f.name for f in table.schema.fields]),
        table.new_data_dir(),
        field_id_schema=table.schema,
    )
    table.commit("initial-copy", added=entries, lsn=start_lsn)


class ReplicationSink:
    """Routes decoded pgoutput events for one or more tables.

    ``tables`` maps PG qualified names (``schema.relname``) to engine
    tables; relations outside the map are skipped (a publication can carry
    more tables than this sink mirrors — the reference drops events for
    tables without an event sender the same way).
    """

    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, Table],
        on_unchanged_toast: str = "default",
        merge_mode: str | None = None,
    ):
        if on_unchanged_toast not in ("default", "error"):
            raise ValueError("on_unchanged_toast must be 'default' or 'error'")
        self.spark = spark
        self.tables = dict(tables)
        self.on_unchanged_toast = on_unchanged_toast
        self.merge_mode = merge_mode
        self.relations: dict[int, pgo.Relation] = {}
        # plain-transaction state
        self._final_lsn: int | None = None
        self._buffers: dict[int, list[dict]] = {}
        # Events WITHIN a transaction all carry the transaction's final LSN
        # on the wire (the reference's get_final_lsn does the same), so the
        # wire LSN cannot order same-key events inside one transaction. The
        # reference applies events sequentially; the batch equivalent stamps
        # each event's dedup-order column with a monotone intra-transaction
        # sequence — MERGE's latest-wins dedup then keeps exactly the row
        # the sequential apply would have left. The COMMIT lsn (snapshot
        # stamp, idempotence cursor) is always the wire end_lsn.
        self._seq = 0
        # streamed-transaction state: xid -> {relid: StreamingTransaction},
        # plus the current segment's row buffer (flushed at Stream Stop);
        # sequence counters persist across a xid's segments
        self._streams: dict[int, dict[int, StreamingTransaction]] = {}
        self._stream_seq: dict[int, int] = {}
        self._segment_xid: int | None = None
        self._segment_rows: dict[int, list[dict]] = {}
        #: last WAL position the sink has durably applied (feedback cursor)
        self.applied_lsn: int = 0
        self.results: list[MergeResult] = []

    # ------------------------------------------------------------ plumbing
    def _table_for(self, relation_id: int) -> Table | None:
        rel = self.relations.get(relation_id)
        if rel is None:
            raise ReplicationError(
                f"data event for unknown relation {relation_id} (no prior "
                "Relation message — out-of-order or truncated stream)"
            )
        return self.tables.get(rel.qualified_name)

    def _row(self, rel: pgo.Relation, tup: pgo.TupleData) -> dict:
        """TupleData → {column: python value} via text-format decode."""
        if len(tup.columns) != len(rel.columns):
            raise ReplicationError(
                f"tuple arity {len(tup.columns)} != relation arity "
                f"{len(rel.columns)} for {rel.qualified_name}"
            )
        out = {}
        for col, raw in zip(rel.columns, tup.columns):
            if raw is None:
                out[col.name] = None
            elif raw is pgo.TupleData.UNCHANGED:
                if self.on_unchanged_toast == "error":
                    raise ReplicationError(
                        f"unchanged-TOAST value for {rel.qualified_name}."
                        f"{col.name}; REPLICA IDENTITY FULL avoids these"
                    )
                out[col.name] = _DEFAULTS.get(col.type_oid, "")
            else:
                out[col.name] = pgo.decode_text(col.type_oid, raw.decode("utf-8"))
        return out

    def _buffer(self, relation_id: int, op: str, values: dict) -> None:
        rel_table = self._table_for(relation_id)
        if rel_table is None:
            return  # table not mirrored by this sink
        if self._segment_xid is not None:
            xid = self._segment_xid
            seq = self._stream_seq[xid] = self._stream_seq.get(xid, 0) + 1
            row = {"op": op, "__seq": seq, **values}
            self._segment_rows.setdefault(relation_id, []).append(row)
        else:
            if self._final_lsn is None:
                raise ReplicationError("data event outside any transaction")
            self._seq += 1
            row = {"op": op, "__seq": self._seq, **values}
            self._buffers.setdefault(relation_id, []).append(row)

    def _to_df(self, table: Table, rows: list[dict]):
        # the row 'lsn' column is MERGE's intra-batch dedup order; see the
        # _seq comment in __init__ for why it carries the event sequence
        schema = _cdc_schema(table)
        cols = [f.name for f in table.schema.fields]
        data = [
            tuple([r["op"], r["__seq"]] + [r.get(c) for c in cols])
            for r in rows
        ]
        return self.spark.createDataFrame(data, schema)

    def _identity_changed(self, table: Table, old: dict, new: dict) -> bool:
        keys = table_identity(table)
        missing = [k for k in keys if k not in old]
        if missing:
            raise ReplicationError(
                f"replica identity tuple lacks identity column(s) {missing}; "
                "the PG table's REPLICA IDENTITY must cover the engine "
                "table's identity keys"
            )
        return any(old[k] != new.get(k) for k in keys)

    # ------------------------------------------------------------- events
    def process(self, msg) -> None:
        """Apply one decoded pgoutput message (or framing object)."""
        if isinstance(msg, pgo.XLogData):
            return self.process(msg.message)
        if isinstance(msg, (pgo.PrimaryKeepalive, pgo.Origin, pgo.PgType,
                            pgo.LogicalMessage)):
            return None
        if isinstance(msg, pgo.Relation):
            known = self.relations.get(msg.relation_id)
            if known is not None and [c.name for c in known.columns] != [
                c.name for c in msg.columns
            ]:
                # upstream DDL mid-stream: the reference surfaces this as a
                # SchemaChangeRequest for the connector to resolve; the
                # batch engine requires evolve_*/sync to run first
                raise ReplicationError(
                    f"relation {msg.qualified_name} changed shape mid-stream; "
                    "apply schema evolution to the engine table, then resume"
                )
            self.relations[msg.relation_id] = msg
            return None

        if isinstance(msg, pgo.Begin):
            self._final_lsn = msg.final_lsn
            self._buffers = {}
            self._seq = 0
            return None
        if isinstance(msg, pgo.Commit):
            self._commit_buffers(self._buffers, msg.end_lsn)
            self._buffers = {}
            self._final_lsn = None
            self.applied_lsn = max(self.applied_lsn, msg.end_lsn)
            return None

        if isinstance(msg, pgo.StreamStart):
            self._segment_xid = msg.xid
            self._segment_rows = {}
            return None
        if isinstance(msg, pgo.StreamStop):
            xid = self._segment_xid
            if xid is None:
                raise ReplicationError("Stream Stop outside a stream segment")
            # flush the segment into the per-xid staging transactions so a
            # long streamed xact never accumulates driver-side
            xact = self._streams.setdefault(xid, {})
            for relid, rows in self._segment_rows.items():
                table = self._table_for(relid)
                if table is None:
                    continue
                st = xact.get(relid)
                if st is None:
                    st = xact[relid] = StreamingTransaction(
                        self.spark, table, key=table_identity(table)
                    )
                st.append(self._to_df(table, rows))
            self._segment_xid = None
            self._segment_rows = {}
            return None
        if isinstance(msg, pgo.StreamCommit):
            xact = self._streams.pop(msg.xid, {})
            self._stream_seq.pop(msg.xid, None)
            for st in xact.values():
                res = st.commit(msg.end_lsn, mode=self.merge_mode)
                self.results.append(res)
            self.applied_lsn = max(self.applied_lsn, msg.end_lsn)
            return None
        if isinstance(msg, pgo.StreamAbort):
            xact = self._streams.pop(msg.xid, {})
            self._stream_seq.pop(msg.xid, None)
            for st in xact.values():
                st.abort()
            return None

        if isinstance(msg, pgo.Insert):
            if self._table_for(msg.relation_id) is None:
                return None
            rel = self.relations[msg.relation_id]
            self._buffer(msg.relation_id, "U", self._row(rel, msg.new_tuple))
            return None
        if isinstance(msg, pgo.Update):
            if self._table_for(msg.relation_id) is None:
                return None
            rel = self.relations[msg.relation_id]
            new = self._row(rel, msg.new_tuple)
            old_tup = msg.old_tuple or msg.key_tuple
            if old_tup is not None:
                table = self._table_for(msg.relation_id)
                old = self._row(rel, old_tup)
                if msg.key_tuple is not None:
                    # 'K' form carries only key columns; drop the NULL padding
                    old = {
                        c.name: old[c.name]
                        for c in rel.columns
                        if old.get(c.name) is not None or c.is_key
                    }
                if table is not None and self._identity_changed(table, old, new):
                    self._buffer(msg.relation_id, "D", old)
            self._buffer(msg.relation_id, "U", new)
            return None
        if isinstance(msg, pgo.Delete):
            if self._table_for(msg.relation_id) is None:
                return None
            rel = self.relations[msg.relation_id]
            tup = msg.old_tuple or msg.key_tuple
            if tup is None:
                raise ReplicationError(
                    "delete without tuple (REPLICA IDENTITY NOTHING?)"
                )
            self._buffer(msg.relation_id, "D", self._row(rel, tup))
            return None
        if isinstance(msg, pgo.Truncate):
            raise ReplicationError(
                "TRUNCATE is not supported (reference parity: "
                "CdcEventConversionError::MessageNotSupported)"
            )
        raise ReplicationError(f"unhandled message {type(msg).__name__}")

    def _commit_buffers(self, buffers: dict[int, list[dict]], end_lsn: int) -> None:
        for relid, rows in buffers.items():
            table = self._table_for(relid)
            if table is None or not rows:
                continue
            res = merge_cdc_batch(
                self.spark,
                table,
                self._to_df(table, rows),
                end_lsn,
                key=table_identity(table),
                mode=self.merge_mode,
            )
            self.results.append(res)

    # ----------------------------------------------------------- sessions
    def apply_frames(self, frames) -> list[MergeResult]:
        """Consume an iterable of copy-data frame byte strings (what a
        replication socket delivers) end-to-end; returns the MERGE results
        of every committed transaction."""
        before = len(self.results)
        for item in pgo.iter_copy_data(frames):
            self.process(item)
        return self.results[before:]

    def standby_status(self, reply: bool = False) -> bytes:
        """The Standby Status Update frame ('r') a real client would send:
        written/flushed/applied all at ``applied_lsn`` — this engine applies
        durably at commit (snapshot CAS), so the three cursors coincide
        (the reference marks replication_state at the same point)."""
        lsn = self.applied_lsn
        return b"r" + struct.pack(
            ">QQQq", lsn, lsn, lsn, 0
        ) + (b"\x01" if reply else b"\x00")
