"""Row-event ingestion front-end (O29 analog) tests.

Target file: tests/test_ingest_api.py
"""

import base64

import pytest
from pyspark.sql import functions as F

from moonlink_spark.ingest_api import RowEventIngestor
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.scan import scan


@pytest.fixture()
def table(tmp_path):
    return create_table(str(tmp_path / "t"), IMAGES_SCHEMA)


def _row(i, caption="c", b=b"\x89PNG"):
    return {
        "image_id": f"img{i:04d}",
        "bytes": b,
        "w": 4,
        "h": 4,
        "fmt": "png",
        "caption": f"{caption}{i}",
        "phash": i,
    }


def test_insert_flush_scan(spark, table):
    ing = RowEventIngestor(spark, table)
    for i in range(20):
        ing.insert(_row(i))
    assert len(ing) == 20
    res = ing.flush()
    assert res is not None and len(ing) == 0
    assert scan(spark, table).count() == 20


def test_upsert_delete_latest_wins_within_buffer(spark, table):
    ing = RowEventIngestor(spark, table)
    for i in range(5):
        ing.insert(_row(i))
    ing.flush()
    # same key updated twice then one delete, all in ONE buffer
    ing.upsert(_row(1, caption="first"))
    ing.upsert(_row(1, caption="second"))
    ing.delete("img0003")
    ing.flush()
    rows = {r.image_id: r.caption for r in scan(spark, table).collect()}
    assert rows["img0001"] == "second1"  # last event per key wins
    assert "img0003" not in rows
    assert len(rows) == 4


def test_base64_binary_payload(spark, table):
    ing = RowEventIngestor(spark, table)
    payload = b"\x00\x01binary"
    r = _row(7)
    r["bytes"] = base64.b64encode(payload).decode()  # JSON-style event
    ing.insert(r)
    ing.flush()
    got = scan(spark, table).filter(F.col("image_id") == "img0007").collect()
    assert got[0].bytes == payload


def test_auto_flush_and_lsn_monotone(spark, table):
    ing = RowEventIngestor(spark, table, max_buffer_rows=10)
    for i in range(25):
        ing.insert(_row(i))
    assert len(ing) == 5  # two auto-flushes at 10 and 20
    ing.flush()
    assert scan(spark, table).count() == 25
    table.refresh()
    assert table.flush_lsn == 3


def test_event_validation(spark, table):
    ing = RowEventIngestor(spark, table)
    with pytest.raises(ValueError, match="identity column"):
        ing.insert({"caption": "no key"})
    with pytest.raises(ValueError, match="unknown columns"):
        ing.insert({"image_id": "x", "nope": 1})
