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
- **rename**: metadata-only on id-tables — the field id IS the column's
  identity, so old files (written under the old name, same id) resolve to
  the new name with their original values; no data rewrite (Iceberg's
  rename semantics). Identity/bucket-layout renames update the layout
  properties in the SAME commit (bucket/bloom hashes are over VALUES, so
  the physical index stays valid). Refused while any live file is
  name-resolved (foreign id-less parquet) or any live equality-delete file
  was written over the old name.
- **widen**: in-place type promotion (int→long, float→double, int→double,
  decimal precision growth, date→timestamp_ntz — the promotions Spark 4's
  vectorized Parquet reader performs natively). Old files keep their
  narrow physical type and widen at scan; bounds stats stay valid (all
  allowed promotions are order-preserving). Refused on identity /
  bucket-layout columns: xxhash64 hashes the 4-byte int and 8-byte long
  representations differently, so widening a layout key would silently
  desync every persisted bucket id and bloom.
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


def rename_column(table: Table, old: str, new: str) -> Snapshot:
    """Rename ``old`` to ``new`` without touching data (id-tables only).

    Scans resolve columns by parquet field id (fieldids.py), so files
    written under the old name keep serving their values under the new one.
    When ``old`` is an identity or bucket-layout column, the corresponding
    table properties are rewritten in the same atomic commit — the
    persisted bucket ids and key blooms hash column VALUES, not names, so
    the physical index layout survives the rename intact.
    """
    from moonlink_spark.schema import IDENTITY_PROP, table_identity
    from moonlink_spark.table.fieldids import NO_FIELD_IDS_STAT, has_field_ids
    from moonlink_spark.table.format import EQ_DELETES
    from moonlink_spark.table.writer import BUCKET_KEY_PROP, EQ_KEYS_STAT, table_buckets

    table.refresh()
    schema = table.schema
    names = {f.name for f in schema.fields}
    if old not in names:
        raise ValueError(f"no such column: {old}")
    if new in names:
        raise ValueError(f"column already exists: {new}")
    if not has_field_ids(schema):
        raise ValueError(
            "rename requires parquet field ids (legacy id-less table): old "
            "files resolve by NAME, so a rename would silently read NULL"
        )
    if any(e.stats.get(NO_FIELD_IDS_STAT) for e in table.data_entries()):
        raise ValueError(
            f"cannot rename {old!r}: live data files without parquet field "
            "ids remain (name-resolved foreign ingest) — run a full "
            "compaction first so every file carries field ids"
        )
    # live equality-delete files record the identity column NAMES they were
    # written over (writer.EQ_KEYS_STAT); scan applies them by those names
    # and fails loudly on mismatch — resolve them to positional DVs first
    eq_over_old = [
        e.path
        for e in table.entries(content=EQ_DELETES)
        if old in (e.stats.get(EQ_KEYS_STAT) or "").split(",")
    ]
    if eq_over_old:
        raise ValueError(
            f"cannot rename {old!r}: {len(eq_over_old)} live equality-delete "
            "file(s) were written over it — run rewrite_equality_deletes "
            "(or a compaction) first"
        )

    new_fields = [
        StructField(new, f.dataType, f.nullable, f.metadata) if f.name == old else f
        for f in schema.fields
    ]
    props: dict[str, str] = {}
    ident = table_identity(table)
    if old in ident:
        props[IDENTITY_PROP] = ",".join(new if c == old else c for c in ident)
    if table_buckets(table):
        bkey = table.md.properties.get(BUCKET_KEY_PROP)
        if bkey:
            cols = [c.strip() for c in bkey.split(",")]
            if old in cols:
                props[BUCKET_KEY_PROP] = ",".join(
                    new if c == old else c for c in cols
                )
    # the old name may not be re-added while name-resolved files could still
    # carry it (same guard as drop-then-re-add); the new name, if previously
    # retired, is live again under a different id — no resurrection possible
    retired = _retired(table)
    props[RETIRED_PROP] = json.dumps(sorted((retired | {old}) - {new}))
    return table.commit(
        "rename-column",
        schema=StructType(new_fields),
        summary_extra={"renamed": f"{old}->{new}"},
        properties=props,
    )


# order-preserving promotions Spark 4's vectorized Parquet reader performs
# natively when the read schema is wider than the file's physical type
# (verified empirically in tests/test_evolve_ingest.py)
_WIDEN_OK: dict[str, set[str]] = {
    "byte": {"short", "integer", "long", "double"},
    "short": {"integer", "long", "double"},
    "integer": {"long", "double"},
    "float": {"double"},
    "date": {"timestamp_ntz"},
}


def widen_column(table: Table, name: str, new_type) -> Snapshot:
    """Promote ``name``'s type in place (no data rewrite): old files keep
    the narrow physical type and the Parquet reader widens at scan.

    Allowed promotions are the order-preserving ones Spark's vectorized
    reader supports (_WIDEN_OK, plus decimal precision growth at equal
    scale), so existing per-file min/max bounds stay valid for pruning.
    """
    from pyspark.sql.types import DecimalType

    from moonlink_spark.schema import table_identity
    from moonlink_spark.table.writer import table_bucket_key, table_buckets

    table.refresh()
    schema = table.schema
    field = next((f for f in schema.fields if f.name == name), None)
    if field is None:
        raise ValueError(f"no such column: {name}")
    protected = set(table_identity(table))
    if table_buckets(table):
        protected |= set(table_bucket_key(table))
    if name in protected:
        raise ValueError(
            f"cannot widen {name!r}: identity/bucket-layout column — "
            "xxhash64(int) != xxhash64(long) for the same value, so widening "
            "would desync every persisted bucket id and key bloom "
            f"(protected: {sorted(protected)})"
        )
    old_t, new_t = field.dataType, new_type
    ok = False
    if isinstance(old_t, DecimalType) and isinstance(new_t, DecimalType):
        ok = new_t.scale == old_t.scale and new_t.precision >= old_t.precision
    else:
        ok = new_t.typeName() in _WIDEN_OK.get(old_t.typeName(), set())
    if not ok:
        raise ValueError(
            f"unsupported type promotion for {name!r}: "
            f"{old_t.simpleString()} -> {new_t.simpleString()}"
        )
    new_fields = [
        StructField(f.name, new_t, f.nullable, f.metadata) if f.name == name else f
        for f in schema.fields
    ]
    return table.commit(
        "widen-column",
        schema=StructType(new_fields),
        summary_extra={
            "widened": f"{name}: {old_t.simpleString()}->{new_t.simpleString()}"
        },
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
