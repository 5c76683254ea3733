"""Schema evolution — add / drop columns without rewriting data.

Mirrors moonlink's AlterTable (reference:
src/moonlink/src/storage/mooncake_table.rs:96-123 ``AlterTableRequest
{ new_columns, dropped_columns }`` rebuilds the Arrow schema;
src/moonlink/src/storage/iceberg/file_catalog.rs:790-808 commits the new
schema straight into table metadata; writes are quiesced around the commit by
the single-writer event loop, src/moonlink_connectors/src/pg_replicate/
moonlink_sink.rs:117-140).

Spark-first semantics:
- **add**: new nullable column appended to the schema. Existing Parquet files
  simply lack the column; ``spark.read.schema(table_schema)`` fills it with
  NULL on scan — no data rewrite (Iceberg's add-column behavior).
- **drop**: column removed from the schema; scans project it away (Parquet
  column pruning means the bytes are never read). Files keep the physical
  column until the next compaction/cluster rewrite naturally sheds it.
- **drop-then-re-add**: tables carry parquet field ids (fieldids.py, the
  "PARQUET:field_id" discipline of the reference,
  src/moonlink/benches/bench_write.rs:33-44), so a re-added name gets a NEW
  id and old files read NULL for it — identity resolution, no resurrection.
  The only guard left: while any LIVE data file lacks footer ids (foreign
  bulk-ingested parquet), such a file can only resolve by name, so re-adding
  a retired name is refused until compaction rewrites it through the
  stamping writer. Legacy id-less tables keep the retired-name registry.
"""

from __future__ import annotations

import json

from pyspark.sql.types import StructField, StructType

from moonlink_spark.table.catalog import Table
from moonlink_spark.table.format import Snapshot

RETIRED_PROP = "moonlink.retired-columns"


def _retired(table: Table) -> set[str]:
    return set(json.loads(table.md.properties.get(RETIRED_PROP, "[]")))


def add_columns(table: Table, new_fields: list[StructField]) -> Snapshot:
    from moonlink_spark.table.catalog import LAST_FIELD_ID_PROP
    from moonlink_spark.table.fieldids import (
        NO_FIELD_IDS_STAT,
        FIELD_ID_KEY,
        has_field_ids,
        next_field_id,
    )

    table.refresh()
    schema = table.schema
    existing = {f.name for f in schema.fields}
    retired = _retired(table)
    id_table = has_field_ids(schema)
    idless_live = id_table and any(
        e.stats.get(NO_FIELD_IDS_STAT) for e in table.data_entries()
    )
    for f in new_fields:
        if f.name in existing:
            raise ValueError(f"column already exists: {f.name}")
        if f.name in retired:
            if not id_table:
                raise ValueError(
                    f"column name {f.name!r} was dropped earlier; re-adding would "
                    "resurrect old file data (no field ids) — pick a new name or "
                    "compact first"
                )
            if idless_live:
                raise ValueError(
                    f"column name {f.name!r} was dropped earlier and live data "
                    "files without parquet field ids remain (name-resolved): "
                    "re-adding would resurrect their old values — run a full "
                    "compaction first so every file carries field ids"
                )
        if not f.nullable:
            raise ValueError(
                f"added column {f.name} must be nullable (existing files have no values)"
            )

    props = {}
    if id_table:
        # new columns get FRESH ids above the monotone high-water mark, so a
        # re-added name never aliases a dropped column's id
        hwm = int(table.md.properties.get(LAST_FIELD_ID_PROP, "0"))
        stamped = []
        for f in new_fields:
            fid = next_field_id(schema, floor=hwm)
            hwm = fid
            md = dict(f.metadata or {})
            md[FIELD_ID_KEY] = fid
            stamped.append(StructField(f.name, f.dataType, f.nullable, md))
        new_fields = stamped
        props[LAST_FIELD_ID_PROP] = str(hwm)
        readded = retired & {f.name for f in new_fields}
        if readded:
            props[RETIRED_PROP] = json.dumps(sorted(retired - readded))

    new_schema = StructType(schema.fields + list(new_fields))
    return table.commit(
        "add-columns",
        schema=new_schema,
        summary_extra={"added-columns": [f.name for f in new_fields]},
        properties=props or None,
    )


def drop_columns(table: Table, names: list[str]) -> Snapshot:
    from moonlink_spark.schema import table_identity
    from moonlink_spark.table.writer import table_bucket_key, table_buckets

    table.refresh()
    schema = table.schema
    existing = {f.name for f in schema.fields}
    # identity columns are undroppable (a row's identity must stay
    # resolvable, mooncake_table.rs:126-136); so are the physical bucket-
    # layout columns while a bucketed layout exists (files are hashed by
    # them — dropping one would silently desync build and probe hashes)
    protected = set(table_identity(table))
    if table_buckets(table):
        protected |= set(table_bucket_key(table))
    for n in names:
        if n not in existing:
            raise ValueError(f"no such column: {n}")
        if n in protected:
            raise ValueError(
                f"cannot drop {n!r}: identity/bucket-layout column "
                f"(protected: {sorted(protected)})"
            )
    new_schema = StructType([f for f in schema.fields if f.name not in names])
    retired = sorted(_retired(table) | set(names))
    return table.commit(
        "drop-columns",
        schema=new_schema,
        summary_extra={"dropped-columns": list(names)},
        properties={RETIRED_PROP: json.dumps(retired)},
    )
