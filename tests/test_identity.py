"""Row identity beyond a single key — moonlink IdentityProp parity.

Reference: src/moonlink/src/row/moonlink_row.rs:271-280 —
``SinglePrimitiveKey`` (one column), ``Keys(Vec<usize>)`` (composite),
``FullRow`` (every column is the identity), ``None`` (append-only; maps to
the plain append path here). These tests drive composite and full-row
identities through the real MERGE lifecycle (create → merge×N → maintenance
→ merge) against a pandas oracle, including the bucketed layout built over
the composite key and the layout-key guard (bucket/bloom pruning must be
bypassed when a batch's identity differs from the table's physical layout
key — probing with mismatched hashes would silently drop matches).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from moonlink_spark.operators.maintenance import optimize_table
from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.schema import IDENTITY_PROP, table_identity
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.scan import scan
from moonlink_spark.table.writer import BUCKETS_PROP

LINES_SCHEMA = StructType(
    [
        StructField("ord", LongType(), False),
        StructField("line", IntegerType(), False),
        StructField("qty", LongType(), True),
        StructField("note", StringType(), True),
    ]
)

KEYS = ["ord", "line"]


def _cdc(spark, rows):
    # rows: (op, lsn, ord, line, qty, note)
    return spark.createDataFrame(
        rows, "op string, lsn long, ord long, line int, qty long, note string"
    )


def _content(spark, t):
    return (
        scan(spark, t.refresh())
        .toPandas()
        .sort_values(KEYS)
        .reset_index(drop=True)
    )


@pytest.fixture()
def table(tmp_path):
    return create_table(
        str(tmp_path / "lines"),
        LINES_SCHEMA,
        properties={IDENTITY_PROP: "ord,line", BUCKETS_PROP: "8"},
    )


def test_composite_merge_lifecycle(spark, table):
    assert table_identity(table) == KEYS
    base = [("U", 1, o, l, o * 10 + l, f"n{o}-{l}") for o in range(20) for l in range(1, 4)]
    merge_cdc_batch(spark, table, _cdc(spark, base), lsn=1)
    assert len(_content(spark, table)) == 60

    # same ord, different line = DIFFERENT identity: update (5,1), delete
    # (5,2), leave (5,3); insert a new line for an existing ord
    b2 = [
        ("U", 2, 5, 1, 999, "updated"),
        ("D", 2, 5, 2, None, None),
        ("U", 2, 5, 9, 59, "new-line"),
    ]
    res = merge_cdc_batch(spark, table, _cdc(spark, b2), lsn=2)
    assert res.upserted == 2 and res.matched == 2  # (5,1) updated, (5,2) deleted
    got = _content(spark, table)
    assert len(got) == 60  # -1 delete +1 insert
    g5 = got[got["ord"] == 5].set_index("line")
    assert g5.loc[1, "qty"] == 999 and g5.loc[1, "note"] == "updated"
    assert 2 not in g5.index and g5.loc[9, "qty"] == 59
    assert g5.loc[3, "qty"] == 53  # untouched sibling line survives

    # maintenance bucketizes ON THE COMPOSITE KEY; post-maintenance merges
    # still resolve identities correctly (build/probe hash agreement)
    optimize_table(spark, table, mode="full", retain_last=10)
    b3 = [("U", 3, 5, 3, -1, "post-maint"), ("D", 3, 5, 9, None, None)]
    res3 = merge_cdc_batch(spark, table, _cdc(spark, b3), lsn=3)
    assert res3.matched == 2
    got = _content(spark, table)
    g5 = got[got["ord"] == 5].set_index("line")
    assert g5.loc[3, "qty"] == -1 and 9 not in g5.index and len(got) == 59


def test_composite_latest_wins_within_batch(spark, table):
    merge_cdc_batch(
        spark, table, _cdc(spark, [("U", 1, 1, 1, 10, "a"), ("U", 1, 1, 2, 20, "b")]), lsn=1
    )
    # one window: (1,1) updated twice (later lsn wins), (1,2) updated then
    # deleted (net delete), (1,3) inserted then updated at same lsn batch
    b = [
        ("U", 2, 1, 1, 100, "first"),
        ("U", 3, 1, 1, 200, "second"),
        ("U", 2, 1, 2, 999, "doomed"),
        ("D", 3, 1, 2, None, None),
        ("U", 4, 1, 3, 30, "born"),
    ]
    merge_cdc_batch(spark, table, _cdc(spark, b), lsn=4)
    got = _content(spark, table).set_index(["ord", "line"])
    assert got.loc[(1, 1), "qty"] == 200 and got.loc[(1, 1), "note"] == "second"
    assert (1, 2) not in got.index
    assert got.loc[(1, 3), "qty"] == 30


def test_null_identity_column_raises(spark, table):
    with pytest.raises(ValueError, match="NULL identity"):
        merge_cdc_batch(
            spark, table, _cdc(spark, [("U", 1, 1, None, 1, "x")]), lsn=1
        )


def test_mismatched_key_bypasses_layout_pruning(spark, table):
    """A batch merged with an identity ≠ the table's bucket key must not use
    bucket/bloom pruning (hashes differ) — results stay correct."""
    base = [("U", 1, o, l, o, "z") for o in range(10) for l in range(1, 3)]
    merge_cdc_batch(spark, table, _cdc(spark, base), lsn=1)
    optimize_table(spark, table, mode="full", retain_last=10)  # bucketize on (ord,line)
    # delete every line of ord=3 keyed by ord ONLY (a coarser identity)
    res = merge_cdc_batch(
        spark, table, _cdc(spark, [("D", 2, 3, 1, None, None)]), lsn=2, key=["ord"]
    )
    assert res.metrics["matched"] == 2  # both (3,1) and (3,2) matched by ord
    got = _content(spark, table)
    assert 3 not in set(got["ord"]) and len(got) == 18


def test_full_row_identity(spark, tmp_path):
    """FullRow: the entire row is the identity — a delete removes only the
    exact row; a differing copy of the same logical record survives."""
    t = create_table(
        str(tmp_path / "fr"),
        StructType(
            [StructField("a", LongType(), False), StructField("b", StringType(), False)]
        ),
        properties={IDENTITY_PROP: "a,b"},
    )
    rows = [("U", 1, 1, "x"), ("U", 1, 1, "y"), ("U", 1, 2, "x")]
    merge_cdc_batch(
        spark, t, spark.createDataFrame(rows, "op string, lsn long, a long, b string"), lsn=1
    )
    merge_cdc_batch(
        spark,
        t,
        spark.createDataFrame(
            [("D", 2, 1, "x")], "op string, lsn long, a long, b string"
        ),
        lsn=2,
    )
    got = (
        scan(spark, t.refresh()).toPandas().sort_values(["a", "b"]).values.tolist()
    )
    assert got == [[1, "y"], [2, "x"]]


@pytest.mark.parametrize("seed", [5, 23])
def test_composite_random_batches_vs_oracle(spark, table, seed):
    """Seeded random CDC batches under composite identity vs a dict oracle:
    per (ord,line) key, latest (lsn, op) wins within a batch; batches apply
    sequentially (the pandas analog of tests/test_merge.py's ReferenceTable,
    keyed by the tuple)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    oracle = {}
    lsn = 0
    for _ in range(3):
        n = int(rng.integers(50, 150))
        events = []
        batch_latest = {}
        for _ in range(n):
            lsn += 1
            k = (int(rng.integers(0, 20)), int(rng.integers(1, 6)))
            if rng.random() < 0.3:
                events.append(("D", lsn, k[0], k[1], None, None))
                batch_latest[k] = (lsn, "D", None)
            else:
                v = int(rng.integers(0, 10_000))
                events.append(("U", lsn, k[0], k[1], v, f"n{v}"))
                batch_latest[k] = (lsn, "U", v)
        merge_cdc_batch(spark, table, _cdc(spark, events), lsn=lsn)
        for k, (_, op, v) in batch_latest.items():
            if op == "U":
                oracle[k] = v
            else:
                oracle.pop(k, None)
        got = {
            (r["ord"], r["line"]): r["qty"]
            for r in scan(spark, table.refresh()).collect()
        }
        assert got == oracle


def test_ingestor_resolves_composite_identity(spark, table):
    """RowEventIngestor defaults to the table's declared identity: deletes
    take a dict of all identity columns; scalar deletes are rejected."""
    from moonlink_spark.ingest_api import RowEventIngestor

    ing = RowEventIngestor(spark, table)
    assert ing.keys == KEYS
    ing.insert({"ord": 1, "line": 1, "qty": 5, "note": "a"})
    ing.insert({"ord": 1, "line": 2, "qty": 6, "note": "b"})
    ing.flush()
    ing.upsert({"ord": 1, "line": 1, "qty": 9, "note": "u"})
    ing.delete({"ord": 1, "line": 2})
    with pytest.raises(ValueError, match="dict key payload"):
        ing.delete(1)
    with pytest.raises(ValueError, match="identity column"):
        ing.insert({"ord": 2, "qty": 1, "note": "no-line"})
    ing.flush()
    got = _content(spark, table).set_index(["ord", "line"])
    assert got.loc[(1, 1), "qty"] == 9 and (1, 2) not in got.index and len(got) == 1


def test_composite_replication(spark, tmp_path):
    """sync_table resolves the upstream's declared composite identity."""
    from moonlink_spark.operators.sync import sync_table

    src = create_table(
        str(tmp_path / "src"), LINES_SCHEMA, properties={IDENTITY_PROP: "ord,line"}
    )
    dst = create_table(
        str(tmp_path / "dst"), LINES_SCHEMA, properties={IDENTITY_PROP: "ord,line"}
    )
    merge_cdc_batch(
        spark, src, _cdc(spark, [("U", 1, o, 1, o, "s") for o in range(30)]), lsn=1
    )
    merge_cdc_batch(
        spark,
        src,
        _cdc(spark, [("U", 2, 7, 1, 700, "u"), ("D", 2, 8, 1, None, None)]),
        lsn=2,
    )
    sync_table(spark, src, dst)
    pd.testing.assert_frame_equal(
        _content(spark, src), _content(spark, dst), check_dtype=False
    )
    assert dst.refresh().flush_lsn == 2


def test_scan_range_multi_column(spark, table):
    """Conjunctive multi-column range scan prunes and filters on every
    bound (composite-identity slice)."""
    from moonlink_spark.table.scan import scan_range

    base = [("U", 1, o, l, o * 10 + l, "x") for o in range(30) for l in range(1, 5)]
    merge_cdc_batch(spark, table, _cdc(spark, base), lsn=1)
    got = (
        scan_range(spark, table, ["ord", "line"], [10, 2], [12, 3])
        .toPandas()
        .sort_values(KEYS)
    )
    assert set(got["ord"]) == {10, 11, 12} and set(got["line"]) == {2, 3}
    assert len(got) == 6
    with pytest.raises(ValueError, match="align"):
        scan_range(spark, table, ["ord", "line"], [1], [2, 3])


def test_identity_columns_undroppable(spark, table):
    from moonlink_spark.operators.evolve import drop_columns

    merge_cdc_batch(spark, table, _cdc(spark, [("U", 1, 1, 1, 1, "x")]), lsn=1)
    for col in ("ord", "line"):
        with pytest.raises(ValueError, match="identity/bucket-layout"):
            drop_columns(table, [col])
    drop_columns(table, ["note"])  # non-identity columns still droppable
    assert "note" not in [f.name for f in table.refresh().schema.fields]
