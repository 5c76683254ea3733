"""Row-event ingestion API — moonlink's REST front-end event model, Spark-first.

Mirrors the rest_ingest event surface (reference:
src/moonlink_connectors/src/rest_ingest/event_request.rs:10-26 —
``RowEventRequest { operation: Insert|Upsert|Delete, payload: json }``;
src/moonlink_connectors/src/rest_ingest/rest_source.rs assigns monotone LSNs
and batches events into per-table transactions). The HTTP layer itself is
transport (axum in the reference) and out of scope in this sandbox; the
engine-owned part is the EVENT CONTRACT — typed per-row events, LSN
assignment, batch-atomic apply, buffer back-pressure — and a thin HTTP
handler would call exactly these methods.

Spark-first shape: events accumulate driver-side as plain dicts (REST row
payloads are small; binary columns arrive base64 like the reference's JSON
row encoding). ``flush()`` turns the buffer into ONE Arrow-backed CDC
DataFrame and applies it through the same ``merge_cdc_batch`` path every
other front-end uses — one MERGE snapshot per flush, exactly-once via LSN
idempotence (a replayed flush at an already-applied LSN is skipped).
"""

from __future__ import annotations

import base64

from pyspark.sql import SparkSession
from pyspark.sql.types import BinaryType, StructField, StructType

from moonlink_spark.operators.merge import MergeResult, merge_cdc_batch
from moonlink_spark.schema import normalize_keys, table_identity
from moonlink_spark.table.catalog import Table


class RowEventIngestor:
    """Buffered row-event front-end for one table.

    - ``insert``/``upsert`` both map to op "U" (MERGE upserts — the
      reference's Insert on an existing key also replaces, moonlink_sink
      semantics).
    - ``delete`` carries only the key; payload columns are NULL.
    - ``flush`` applies the whole buffer as one LSN-stamped MERGE snapshot;
      on failure (commit conflict) the buffer is KEPT for retry.
    - ``max_buffer_rows`` auto-flushes — the batch back-pressure knob.
    """

    def __init__(
        self,
        spark: SparkSession,
        table: Table,
        key: str | list[str] | None = None,
        max_buffer_rows: int = 100_000,
        start_lsn: int | None = None,
    ):
        self.spark = spark
        self.table = table
        table.refresh()
        # identity resolution: explicit key > the table's declared identity
        # (IDENTITY_PROP — single, composite or full-row), same rule as MERGE
        self.keys = normalize_keys(key) if key is not None else table_identity(table)
        self.key = self.keys[0]  # back-compat for single-key callers
        self.max_buffer_rows = max_buffer_rows
        self._next_lsn = (
            start_lsn
            if start_lsn is not None
            else (table.flush_lsn or 0) + 1
        )
        self._buf: list[dict] = []
        self._binary_cols = {
            f.name for f in table.schema.fields if isinstance(f.dataType, BinaryType)
        }

    # ------------------------------------------------------------- events
    def insert(self, row: dict) -> None:
        self._event("U", row)

    def upsert(self, row: dict) -> None:
        self._event("U", row)

    def delete(self, key_value) -> None:
        """Delete by identity: a scalar for single-key tables, or a dict
        carrying every identity column for composite identities."""
        if isinstance(key_value, dict):
            self._event("D", dict(key_value))
        elif len(self.keys) == 1:
            self._event("D", {self.key: key_value})
        else:
            raise ValueError(
                f"composite identity {self.keys} requires a dict key payload"
            )

    def _event(self, op: str, row: dict) -> None:
        missing = [k for k in self.keys if row.get(k) is None]
        if missing:
            raise ValueError(f"row event must carry the identity column(s) {missing}")
        known = {f.name for f in self.table.schema.fields}
        unknown = set(row) - known
        if unknown:
            raise ValueError(f"unknown columns in row event: {sorted(unknown)}")
        r = dict(row)
        for c in self._binary_cols & set(r):
            if isinstance(r[c], str):  # base64 text payload, reference JSON rows
                r[c] = base64.b64decode(r[c])
        r["op"] = op
        self._buf.append(r)
        if len(self._buf) >= self.max_buffer_rows:
            self.flush()

    # -------------------------------------------------------------- flush
    def flush(self, lsn: int | None = None) -> MergeResult | None:
        """Apply the buffer as ONE MERGE snapshot at ``lsn`` (auto-assigned
        monotone if None). Returns None when the buffer is empty. A failed
        commit leaves the buffer intact so the caller can retry."""
        if not self._buf:
            return None
        use_lsn = lsn if lsn is not None else self._next_lsn
        # the whole flush shares one LSN (one snapshot), so intra-buffer
        # ordering is resolved HERE by arrival order — last event per key
        # wins, exactly the reference's per-event-lsn ordering collapsed to
        # batch granularity (rest_source.rs assigns lsn per event; moonlink
        # folds same-key events at snapshot time)
        last: dict = {}
        for i, r in enumerate(self._buf):
            last[tuple(r[k] for k in self.keys)] = i
        rows = [self._buf[i] for i in sorted(last.values())]
        cols = [f.name for f in self.table.schema.fields]
        # CDC frame schema from the LIVE table schema (evolution-safe — an
        # added column flows through the event payload immediately). Plain
        # tuples, not pandas: driver-side buffers are bounded by
        # max_buffer_rows and tuples avoid pandas' NaN-for-None integer
        # coercion on sparse delete events.
        from pyspark.sql.types import LongType, StringType

        frame_schema = StructType(
            [
                StructField("op", StringType(), False),
                StructField("lsn", LongType(), False),
            ]
            + list(self.table.schema.fields)
        )
        data = [
            tuple([r["op"], use_lsn] + [r.get(c) for c in cols]) for r in rows
        ]
        sdf = self.spark.createDataFrame(data, frame_schema)
        res = merge_cdc_batch(self.spark, self.table, sdf, use_lsn, key=self.keys)
        self._buf.clear()
        self._next_lsn = use_lsn + 1
        return res

    def __len__(self) -> int:
        return len(self._buf)
