"""Durable table registry + restart recovery — the metadata-store role.

Moonlink keeps a registry of every managed table OUTSIDE the tables
themselves — a `mooncake.tables` metadata table in Postgres or SQLite with
one row per (database, table): the source it replicates, and the full table
config (reference: src/moonlink_metadata_store/src/base_metadata_store.rs:
10-70 — ``TableMetadataEntry { database, table, src_table_name,
src_table_uri, moonlink_table_config }``; sqlite.rs / postgres.rs back the
same trait). On restart the backend loads all entries and re-attaches every
table from its latest Iceberg snapshot, resuming replication at the
persisted flush LSN (src/moonlink_backend/src/recovery_utils.rs:91-150).

The Spark-first equivalent uses the stdlib ``sqlite3`` (the reference's
sqlite flavor; the Postgres flavor is the same schema over a different
driver — a connection-string swap in production):

- :class:`MetadataStore` — the registry CRUD: store / get-all / delete,
  idempotent schema bootstrap, one row per (database, table) with the
  table's storage location, source info and config JSON.
- :func:`recover_all_tables` — load every entry, re-open its table from
  storage (``load_table`` resolves the current snapshot via version hint
  + forward probe, exactly the "recover from the latest iceberg snapshot"
  step), and report each table's resume cursor (``flush_lsn``) so ingest
  front-ends (ReplicationSink / RowEventIngestor) continue from where the
  durable state left off — the WAL-replay handshake (wal.rs:205-220):
  events at or below the cursor are no-ops by MERGE LSN idempotence.

Secrets (the reference's ``mooncake.secrets`` table) are out of scope:
object-store credentials in this engine ride Spark/Hadoop configuration,
the standard place for them on a cluster.
"""

from __future__ import annotations

import json
import sqlite3
from dataclasses import dataclass, field

from moonlink_spark.table.catalog import Table, load_table

_SCHEMA = """
CREATE TABLE IF NOT EXISTS tables (
    database        TEXT NOT NULL,
    "table"         TEXT NOT NULL,
    location        TEXT NOT NULL,
    src_table_name  TEXT NOT NULL DEFAULT '',
    src_table_uri   TEXT NOT NULL DEFAULT '',
    config_json     TEXT NOT NULL DEFAULT '{}',
    PRIMARY KEY (database, "table")
)
"""


@dataclass
class TableMetadataEntry:
    """One registry row (base_metadata_store.rs:18-29)."""

    database: str
    table: str
    location: str
    src_table_name: str = ""
    src_table_uri: str = ""
    config: dict = field(default_factory=dict)


class MetadataStoreError(Exception):
    pass


class MetadataStore:
    """SQLite-backed registry of managed tables.

    ``path`` is the sqlite database file (``":memory:"`` for tests).
    Writes are committed per call — the registry is tiny (one row per
    table) and correctness beats batching here.
    """

    def __init__(self, path: str):
        self._conn = sqlite3.connect(path)
        self._conn.execute(_SCHEMA)
        self._conn.commit()

    def metadata_table_exists(self) -> bool:
        row = self._conn.execute(
            "SELECT name FROM sqlite_master WHERE type='table' AND name='tables'"
        ).fetchone()
        return row is not None

    def store_table_metadata(self, entry: TableMetadataEntry) -> None:
        """Insert a new entry; duplicate (database, table) is an error —
        the reference preconditions on the id being unrecorded."""
        try:
            self._conn.execute(
                'INSERT INTO tables (database, "table", location, '
                "src_table_name, src_table_uri, config_json) "
                "VALUES (?, ?, ?, ?, ?, ?)",
                (
                    entry.database, entry.table, entry.location,
                    entry.src_table_name, entry.src_table_uri,
                    json.dumps(entry.config),
                ),
            )
        except sqlite3.IntegrityError as e:
            raise MetadataStoreError(
                f"{entry.database}.{entry.table} already registered"
            ) from e
        self._conn.commit()

    def get_all_table_metadata_entries(self) -> list[TableMetadataEntry]:
        rows = self._conn.execute(
            'SELECT database, "table", location, src_table_name, '
            "src_table_uri, config_json FROM tables "
            'ORDER BY database, "table"'
        ).fetchall()
        return [
            TableMetadataEntry(
                database=r[0], table=r[1], location=r[2],
                src_table_name=r[3], src_table_uri=r[4],
                config=json.loads(r[5]),
            )
            for r in rows
        ]

    def delete_table_metadata(self, database: str, table: str) -> None:
        cur = self._conn.execute(
            'DELETE FROM tables WHERE database = ? AND "table" = ?',
            (database, table),
        )
        if cur.rowcount == 0:
            raise MetadataStoreError(f"{database}.{table} not registered")
        self._conn.commit()

    def close(self) -> None:
        self._conn.close()


@dataclass
class RecoveredTable:
    entry: TableMetadataEntry
    table: Table | None
    flush_lsn: int | None  # resume cursor for the table's ingest front-end
    error: str | None = None


def recover_all_tables(store: MetadataStore) -> list[RecoveredTable]:
    """Re-attach every registered table from durable storage
    (recovery_utils.rs:118-150): load its current snapshot and surface the
    flush LSN each source should resume from. A table whose storage is
    gone is reported, not raised — one broken table must not block the
    rest of the fleet's recovery."""
    out: list[RecoveredTable] = []
    for entry in store.get_all_table_metadata_entries():
        try:
            t = load_table(entry.location)
            out.append(RecoveredTable(entry, t, t.flush_lsn))
        except Exception as e:  # noqa: BLE001 — per-table fault isolation
            out.append(RecoveredTable(entry, None, None, error=str(e)))
    return out
