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
- A dropped column name is *retired*: re-adding it would resurrect old
  physical values because Parquet resolves by name (Iceberg avoids this with
  field ids; the retired-name registry is the honest single-engine analog —
  at 10^12 scale you'd carry field ids in Parquet metadata exactly like
  moonlink does via "PARQUET:field_id", reference:
  src/moonlink/benches/bench_write.rs:33-44).
"""

from __future__ import annotations

import json

from pyspark.sql.types import StructField, StructType

from moonlink_spark.schema import MERGE_KEY
from moonlink_spark.table.catalog import Table
from moonlink_spark.table.format import Snapshot

RETIRED_PROP = "moonlink.retired-columns"


def _retired(table: Table) -> set[str]:
    return set(json.loads(table.md.properties.get(RETIRED_PROP, "[]")))


def add_columns(table: Table, new_fields: list[StructField]) -> Snapshot:
    table.refresh()
    schema = table.schema
    existing = {f.name for f in schema.fields}
    retired = _retired(table)
    for f in new_fields:
        if f.name in existing:
            raise ValueError(f"column already exists: {f.name}")
        if f.name in retired:
            raise ValueError(
                f"column name {f.name!r} was dropped earlier; re-adding would "
                "resurrect old file data (no field ids) — pick a new name or "
                "compact first"
            )
        if not f.nullable:
            raise ValueError(
                f"added column {f.name} must be nullable (existing files have no values)"
            )
    new_schema = StructType(schema.fields + list(new_fields))
    return table.commit(
        "add-columns",
        schema=new_schema,
        summary_extra={"added-columns": [f.name for f in new_fields]},
    )


def drop_columns(table: Table, names: list[str]) -> Snapshot:
    table.refresh()
    schema = table.schema
    existing = {f.name for f in schema.fields}
    for n in names:
        if n not in existing:
            raise ValueError(f"no such column: {n}")
        if n == MERGE_KEY:
            raise ValueError(f"cannot drop the merge key {MERGE_KEY!r}")
    new_schema = StructType([f for f in schema.fields if f.name not in names])
    retired = sorted(_retired(table) | set(names))
    return table.commit(
        "drop-columns",
        schema=new_schema,
        summary_extra={"dropped-columns": list(names)},
        properties={RETIRED_PROP: json.dumps(retired)},
    )
