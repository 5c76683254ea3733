"""Field-id schema evolution: drop-then-re-add resolves by ID, not name.

Reference behavior: moonlink stamps PARQUET:field_id on every column
(bench_write.rs:33-44) so Iceberg readers never resurrect dropped data.
"""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField

from moonlink_spark.cdc import CdcScheduleGenerator, to_spark
from moonlink_spark.operators.evolve import add_columns, drop_columns
from moonlink_spark.operators.maintenance import optimize_table
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.fieldids import (
    ARROW_FIELD_ID_KEY,
    assign_field_ids,
    field_id,
    has_field_ids,
    next_field_id,
    stamp_field_ids,
    strip_field_ids,
)
from moonlink_spark.table.scan import scan
from moonlink_spark.table.writer import write_data_files


def test_assign_strip_roundtrip():
    s = assign_field_ids(IMAGES_SCHEMA)
    assert has_field_ids(s)
    assert [field_id(f) for f in s.fields] == list(range(1, len(s.fields) + 1))
    # idempotent: existing ids kept
    assert assign_field_ids(s) == s
    assert not has_field_ids(strip_field_ids(s))
    assert next_field_id(s) == len(s.fields) + 1
    assert next_field_id(s, floor=99) == 100


@pytest.fixture()
def table(tmp_path):
    return create_table(str(tmp_path / "t"), IMAGES_SCHEMA)


def _append(spark, table, gen, n):
    b = gen.next_batch(n, 0, 0)
    df = to_spark(spark, b).drop("op", "lsn")
    entries = write_data_files(
        spark,
        stamp_field_ids(df, table.schema),
        table.new_data_dir(),
    )
    table.commit("append", added=entries, lsn=gen.commit_lsn)
    return entries


def test_new_table_files_carry_field_ids(spark, table):
    assert has_field_ids(table.schema)
    gen = CdcScheduleGenerator(seed=3)
    entries = _append(spark, table, gen, 50)
    sch = pq.read_schema(entries[0].path)
    assert all(
        ARROW_FIELD_ID_KEY in (sch.field(i).metadata or {})
        for i in range(len(sch.names))
    )


def test_drop_then_readd_does_not_resurrect(spark, table):
    gen = CdcScheduleGenerator(seed=4)
    _append(spark, table, gen, 40)
    old_caption_id = next(
        field_id(f) for f in table.schema.fields if f.name == "caption"
    )

    drop_columns(table, ["caption"])
    assert "caption" not in [f.name for f in table.schema.fields]

    # re-adding the SAME name is allowed (ids make it safe) and gets a NEW id
    add_columns(table, [StructField("caption", StringType(), True)])
    new_caption_id = next(
        field_id(f) for f in table.schema.fields if f.name == "caption"
    )
    assert new_caption_id != old_caption_id

    # pre-re-add files must read NULL captions — id resolution, not name
    got = scan(spark, table).select("image_id", "caption").toPandas()
    assert len(got) == 40
    assert got["caption"].isna().all()


def test_readd_blocked_while_idless_files_live(spark, table, tmp_path):
    """A live file with no footer ids can only resolve by name, so re-adding
    a dropped name must refuse until compaction rewrites it."""
    from moonlink_spark.operators.ingest import add_files

    gen = CdcScheduleGenerator(seed=5)
    df = to_spark(spark, gen.next_batch(30, 0, 0)).drop("op", "lsn")
    ext = str(tmp_path / "foreign")
    df.write.parquet(ext)  # foreign writer: no field ids stamped
    from moonlink_spark.table.writer import list_parquet

    add_files(spark, table, list_parquet(ext), lsn=gen.commit_lsn)

    drop_columns(table, ["caption"])
    with pytest.raises(ValueError, match="field ids"):
        add_columns(table, [StructField("caption", StringType(), True)])

    # compaction rewrites the id-less file through the stamped writer...
    optimize_table(spark, table, mode="full", retain_last=2)
    # ...after which the re-add is legal and old captions are gone
    add_columns(table, [StructField("caption", StringType(), True)])
    got = scan(spark, table).select("caption").toPandas()
    assert got["caption"].isna().all()


def test_mixed_history_scan_correct(spark, table, tmp_path):
    """Id-stamped and foreign id-less files coexist in one snapshot; the
    hybrid scan (id-resolved ∪ name-resolved) returns every row."""
    from moonlink_spark.operators.ingest import add_files

    gen = CdcScheduleGenerator(seed=6)
    _append(spark, table, gen, 25)
    df = to_spark(spark, gen.next_batch(15, 0, 0)).drop("op", "lsn")
    ext = str(tmp_path / "foreign2")
    df.write.parquet(ext)
    from moonlink_spark.table.writer import list_parquet

    add_files(spark, table, list_parquet(ext), lsn=gen.commit_lsn)

    got = scan(spark, table)
    assert got.count() == 40
    assert got.filter(F.col("caption").isNull()).count() == 0
