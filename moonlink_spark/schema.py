"""Canonical schemas.

The images table shape is authoritative from BASELINE.json input_hint:
(image_id string, bytes binary, w int32, h int32, fmt string,
 caption string, phash int64) — all inside moonlink's supported type envelope
(reference: src/moonlink/src/row/moonlink_type.rs:5-21).

CDC batch shape mirrors moonlink TableEvents / REST row events
(reference: src/moonlink/src/table_notify.rs:62-96,
src/moonlink_connectors/src/rest_ingest/event_request.rs:11-15): ``op`` is
"U" (upsert) or "D" (delete); updates arrive as delete+append at one LSN like
the PG sink (src/moonlink_connectors/src/pg_replicate/moonlink_sink.rs:286-317)
and are collapsed to upserts pre-MERGE.
"""

from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MERGE_KEY = "image_id"

# Row identity — moonlink's IdentityProp (reference:
# src/moonlink/src/row/moonlink_row.rs:271-280): SinglePrimitiveKey is a
# one-element key list, Keys([...]) a composite key, FullRow the whole row
# (identity = every column), None maps to the plain append path (no
# upsert/delete identity — table/writer.write_data_files + commit).
# Declared once per table via this property (comma-joined column names);
# MERGE/sync/changelog default to it when no key is passed.
IDENTITY_PROP = "moonlink.identity-keys"


def normalize_keys(key) -> list[str]:
    """A key argument (single column name or list of names) as a list."""
    return [key] if isinstance(key, str) else list(key)


def table_identity(table) -> list[str]:
    """The table's declared identity-key columns (IDENTITY_PROP), falling
    back to the single canonical MERGE_KEY."""
    v = table.md.properties.get(IDENTITY_PROP)
    if not v:
        return [MERGE_KEY]
    return [c.strip() for c in v.split(",") if c.strip()]

IMAGES_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("fmt", StringType(), True),
        StructField("caption", StringType(), True),
        StructField("phash", LongType(), True),
    ]
)

CDC_SCHEMA = StructType(
    [StructField("op", StringType(), False), StructField("lsn", LongType(), False)]
    + IMAGES_SCHEMA.fields
)
