"""pgoutput wire decode + ReplicationSink semantics (moonlink O28).

The sandbox has no PostgreSQL server, so sessions are synthesized with the
symmetric encoder — the byte streams are exactly what a replication socket
delivers after START_REPLICATION (XLogData / keepalive copy-data frames,
pgoutput proto v2 with streaming on, the reference's slot options at
clients/postgres.rs:740,845)."""

from __future__ import annotations

import datetime as dt
import math
import uuid as _uuid
from decimal import Decimal

import pytest

from moonlink_spark import pgoutput as pgo
from moonlink_spark.pg_replication import ReplicationError, ReplicationSink
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.scan import scan

# ---------------------------------------------------------------------------
# wire format
# ---------------------------------------------------------------------------

IMG_REL = pgo.Relation(
    relation_id=77,
    namespace="public",
    relation_name="images",
    replica_identity="d",
    columns=[
        pgo.RelationColumn(1, "image_id", pgo.TEXT, -1),
        pgo.RelationColumn(0, "bytes", pgo.BYTEA, -1),
        pgo.RelationColumn(0, "w", pgo.INT4, -1),
        pgo.RelationColumn(0, "h", pgo.INT4, -1),
        pgo.RelationColumn(0, "fmt", pgo.VARCHAR, -1),
        pgo.RelationColumn(0, "caption", pgo.TEXT, -1),
        pgo.RelationColumn(0, "phash", pgo.INT8, -1),
    ],
)


def img_row(i: int, caption: str = "cap", b: bytes = b"\x00\x01") -> dict:
    return {
        "image_id": f"img{i:012d}", "bytes": b, "w": 4, "h": 3,
        "fmt": "png", "caption": caption, "phash": i * 7,
    }


def test_decode_roundtrip_all_messages():
    enc, dec = pgo.PgOutputEncoder(), pgo.PgOutputDecoder()

    b = dec.decode(enc.begin(final_lsn=1000, xid=501, ts=7))
    assert (b.final_lsn, b.xid, b.commit_ts) == (1000, 501, 7)

    r = dec.decode(enc.relation(IMG_REL))
    assert r.qualified_name == "public.images" and r.xid is None
    assert [c.name for c in r.columns] == [c.name for c in IMG_REL.columns]
    assert r.columns[0].is_key and not r.columns[1].is_key
    assert r.replica_identity == "d"

    i = dec.decode(enc.insert(IMG_REL, img_row(1)))
    assert i.relation_id == 77 and i.xid is None
    assert i.new_tuple.columns[0] == b"img000000000001"

    # update with key tuple ('K'): only key columns present, rest NULL
    u = dec.decode(enc.update(IMG_REL, img_row(1, "v2"), key={"image_id": "img000000000001"}))
    assert u.key_tuple is not None and u.old_tuple is None
    assert u.key_tuple.columns[1] is None  # non-key NULL in K form
    # update with full old tuple ('O')
    u2 = dec.decode(enc.update(IMG_REL, img_row(1, "v3"), old=img_row(1, "v2")))
    assert u2.old_tuple is not None and u2.key_tuple is None

    d = dec.decode(enc.delete(IMG_REL, key={"image_id": "img000000000001"}))
    assert d.key_tuple is not None

    t = dec.decode(enc.truncate([77, 78], options=1))
    assert t.relation_ids == [77, 78] and t.options == 1

    c = dec.decode(enc.commit(commit_lsn=1000, end_lsn=1001))
    assert (c.commit_lsn, c.end_lsn, c.flags) == (1000, 1001, 0)

    # streamed segment: data messages gain the xid prefix
    s = dec.decode(enc.stream_start(xid=900, first=True))
    assert s.xid == 900 and s.first_segment
    i2 = dec.decode(enc.insert(IMG_REL, img_row(2)))
    assert i2.xid == 900
    r2 = dec.decode(enc.relation(IMG_REL))
    assert r2.xid == 900
    e = dec.decode(enc.stream_stop())
    assert isinstance(e, pgo.StreamStop)
    # outside the stream again: no xid
    i3 = dec.decode(enc.insert(IMG_REL, img_row(3)))
    assert i3.xid is None

    sc = dec.decode(enc.stream_commit(xid=900, commit_lsn=2000, end_lsn=2001))
    assert (sc.xid, sc.end_lsn) == (900, 2001)
    sa = dec.decode(enc.stream_abort(xid=901))
    assert (sa.xid, sa.subtransaction_xid) == (901, 901)


def test_unchanged_toast_and_null_markers():
    enc, dec = pgo.PgOutputEncoder(), pgo.PgOutputDecoder()
    row = img_row(5)
    row["bytes"] = pgo.TupleData.UNCHANGED
    row["caption"] = None
    i = dec.decode(enc.insert(IMG_REL, row))
    assert i.new_tuple.columns[1] is pgo.TupleData.UNCHANGED
    assert i.new_tuple.columns[5] is None


def test_copy_data_framing():
    enc = pgo.PgOutputEncoder()
    frames = [
        enc.keepalive(wal_end=42, reply=True),
        enc.xlogdata(enc.begin(100, 1), wal_start=90),
        enc.xlogdata(enc.commit(100, 101), wal_start=100),
    ]
    out = list(pgo.iter_copy_data(frames))
    assert isinstance(out[0], pgo.PrimaryKeepalive)
    assert out[0].wal_end == 42 and out[0].reply_requested
    assert isinstance(out[1].message, pgo.Begin) and out[1].wal_start == 90
    assert isinstance(out[2].message, pgo.Commit)


@pytest.mark.parametrize(
    "oid,text,expect",
    [
        (pgo.BOOL, "t", True),
        (pgo.BOOL, "f", False),
        (pgo.INT2, "-7", -7),
        (pgo.INT4, "123456", 123456),
        (pgo.INT8, "9007199254740993", 9007199254740993),
        (pgo.FLOAT4, "1.5", 1.5),
        (pgo.FLOAT8, "-Infinity", -math.inf),
        (pgo.NUMERIC, "12345.6789", Decimal("12345.6789")),
        (pgo.TEXT, "héllo", "héllo"),
        (pgo.BYTEA, "\\x00ff10", b"\x00\xff\x10"),
        (pgo.DATE, "2026-08-20", dt.date(2026, 8, 20)),
        (pgo.TIME, "13:14:15.250000", dt.time(13, 14, 15, 250000)),
        (pgo.TIMESTAMP, "2026-08-20 13:14:15.5",
         dt.datetime(2026, 8, 20, 13, 14, 15, 500000)),
        (pgo.UUID, "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11",
         _uuid.UUID("a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11")),
        (pgo.JSONB, '{"a": 1}', '{"a": 1}'),
        (1007, "{1,2,NULL,4}", [1, 2, None, 4]),  # int4[]
        (1009, '{plain,"qu\\"ote","with,comma",NULL}',
         ["plain", 'qu"ote', "with,comma", None]),  # text[]
        (1022, "{1.5,NaN}", None),  # float8[] — NaN compared below
    ],
)
def test_text_decode_matrix(oid, text, expect):
    got = pgo.decode_text(oid, text)
    if oid == 1022:
        assert got[0] == 1.5 and math.isnan(got[1])
    else:
        assert got == expect


def test_text_decode_nan_and_tz():
    assert math.isnan(pgo.decode_text(pgo.FLOAT8, "NaN"))
    v = pgo.decode_text(pgo.TIMESTAMPTZ, "2026-08-20 13:00:00+02")
    assert v == dt.datetime(2026, 8, 20, 11, 0, tzinfo=dt.timezone.utc)
    with pytest.raises(pgo.PgDecodeError):
        pgo.decode_text(pgo.BYTEA, "raw-not-hex")
    with pytest.raises(pgo.PgDecodeError):
        pgo.decode_text(1007, "{{1,2},{3,4}}")  # multidim out of envelope


def test_encode_decode_text_inverse():
    cases = [
        (pgo.BOOL, True), (pgo.INT8, -5), (pgo.FLOAT8, 2.25),
        (pgo.NUMERIC, Decimal("1.50")), (pgo.BYTEA, b"\x01\xfe"),
        (pgo.DATE, dt.date(2001, 2, 3)), (pgo.TIME, dt.time(1, 2, 3)),
        (pgo.TIMESTAMP, dt.datetime(2001, 2, 3, 4, 5, 6)),
        (pgo.UUID, _uuid.UUID(int=7)),
        (1009, ["a", None, 'b"c', "d\\e"]),
        (1231, [Decimal("1.5"), None]),
    ]
    for oid, v in cases:
        assert pgo.decode_text(oid, pgo.encode_text(oid, v)) == v


# ---------------------------------------------------------------------------
# sink semantics (needs Spark)
# ---------------------------------------------------------------------------


def _mk_table(tmp_path, name="t"):
    return create_table(str(tmp_path / name), IMAGES_SCHEMA)


def _content(spark, table):
    return {
        r["image_id"]: (r["caption"], bytes(r["bytes"]))
        for r in scan(spark, table).collect()
    }


def _txn(enc, ops, final_lsn, xid=1):
    """One plain transaction as copy-data frames."""
    frames = [enc.xlogdata(enc.begin(final_lsn, xid))]
    frames += [enc.xlogdata(p) for p in ops]
    frames.append(enc.xlogdata(enc.commit(final_lsn, final_lsn)))
    return frames


def test_sink_plain_transactions(spark, tmp_path):
    t = _mk_table(tmp_path)
    sink = ReplicationSink(spark, {"public.images": t})
    enc = pgo.PgOutputEncoder()

    # txn 1: relation + 3 inserts
    frames = _txn(
        enc,
        [enc.relation(IMG_REL)] + [enc.insert(IMG_REL, img_row(i)) for i in (1, 2, 3)],
        final_lsn=100,
    )
    # txn 2: update img2 (key unchanged), delete img3, insert img4
    frames += _txn(
        enc,
        [
            enc.update(IMG_REL, img_row(2, "v2"), key={"image_id": "img000000000002"}),
            enc.delete(IMG_REL, key={"image_id": "img000000000003"}),
            enc.insert(IMG_REL, img_row(4)),
        ],
        final_lsn=200,
        xid=2,
    )
    results = sink.apply_frames(frames)
    assert len(results) == 2 and all(not r.skipped for r in results)
    got = _content(spark, t)
    assert set(got) == {"img000000000001", "img000000000002", "img000000000004"}
    assert got["img000000000002"][0] == "v2"
    assert sink.applied_lsn == 200
    assert t.refresh().flush_lsn == 200

    # replaying the whole stream is a no-op (LSN idempotence = WAL replay)
    replay = ReplicationSink(spark, {"public.images": t})
    results2 = replay.apply_frames(frames)
    assert all(r.skipped for r in results2)
    assert _content(spark, t) == got


def test_sink_intra_txn_ordering(spark, tmp_path):
    """Same-key events inside ONE transaction apply in event order (the
    reference applies sequentially; wire LSNs cannot order them)."""
    t = _mk_table(tmp_path)
    sink = ReplicationSink(spark, {"public.images": t})
    enc = pgo.PgOutputEncoder()
    ops = [
        enc.relation(IMG_REL),
        enc.insert(IMG_REL, img_row(1, "first")),
        enc.update(IMG_REL, img_row(1, "second"), key={"image_id": "img000000000001"}),
        enc.insert(IMG_REL, img_row(2, "doomed")),
        enc.delete(IMG_REL, key={"image_id": "img000000000002"}),
        enc.update(IMG_REL, img_row(1, "third"), key={"image_id": "img000000000001"}),
    ]
    sink.apply_frames(_txn(enc, ops, final_lsn=50))
    got = _content(spark, t)
    assert set(got) == {"img000000000001"}
    assert got["img000000000001"][0] == "third"


def test_sink_update_changing_identity(spark, tmp_path):
    """An update whose replica-identity tuple shows a key change becomes
    delete(old) + upsert(new) — moonlink_sink.rs:286-317 decomposition."""
    t = _mk_table(tmp_path)
    sink = ReplicationSink(spark, {"public.images": t})
    enc = pgo.PgOutputEncoder()
    sink.apply_frames(_txn(
        enc,
        [enc.relation(IMG_REL), enc.insert(IMG_REL, img_row(1))],
        final_lsn=10,
    ))
    renamed = img_row(9, "moved")
    sink.apply_frames(_txn(
        enc,
        [enc.update(IMG_REL, renamed, key={"image_id": "img000000000001"})],
        final_lsn=20,
        xid=2,
    ))
    got = _content(spark, t)
    assert set(got) == {"img000000000009"}
    assert got["img000000000009"][0] == "moved"


def test_sink_streamed_commit_and_abort(spark, tmp_path):
    """v2 streamed transactions: interleaved segments of two xids — the
    committed one lands as ONE snapshot at its end_lsn, the aborted one
    leaves no trace (transaction_stream.rs Commit/Abort)."""
    t = _mk_table(tmp_path)
    sink = ReplicationSink(spark, {"public.images": t})
    enc = pgo.PgOutputEncoder()
    # seed one row in a plain txn so abort leaves a non-empty table
    frames = _txn(
        enc, [enc.relation(IMG_REL), enc.insert(IMG_REL, img_row(1))], final_lsn=10
    )
    # xid 900 (will commit): segment 1
    frames += [enc.xlogdata(enc.stream_start(900, first=True))]
    frames += [enc.xlogdata(enc.insert(IMG_REL, img_row(2, "s900")))]
    frames += [enc.xlogdata(enc.stream_stop())]
    # xid 901 (will abort): interleaved segment
    frames += [enc.xlogdata(enc.stream_start(901, first=True))]
    frames += [enc.xlogdata(enc.insert(IMG_REL, img_row(3, "s901")))]
    frames += [enc.xlogdata(enc.delete(IMG_REL, key={"image_id": "img000000000001"}))]
    frames += [enc.xlogdata(enc.stream_stop())]
    # xid 900 segment 2: update its own row (cross-segment ordering)
    frames += [enc.xlogdata(enc.stream_start(900, first=False))]
    frames += [enc.xlogdata(
        enc.update(IMG_REL, img_row(2, "s900v2"), key={"image_id": "img000000000002"})
    )]
    frames += [enc.xlogdata(enc.stream_stop())]
    frames += [enc.xlogdata(enc.stream_commit(900, 500, 500))]
    frames += [enc.xlogdata(enc.stream_abort(901))]

    results = sink.apply_frames(frames)
    assert len(results) == 2  # plain txn + stream commit; abort commits nothing
    got = _content(spark, t)
    assert set(got) == {"img000000000001", "img000000000002"}
    assert got["img000000000002"][0] == "s900v2"
    assert t.refresh().flush_lsn == 500
    # no staging leftovers from the aborted xact
    assert sink._streams == {}


def test_sink_unchanged_toast_modes(spark, tmp_path):
    t = _mk_table(tmp_path)
    enc = pgo.PgOutputEncoder()
    row = img_row(1, "t1")
    row["bytes"] = pgo.TupleData.UNCHANGED
    frames = _txn(enc, [enc.relation(IMG_REL), enc.insert(IMG_REL, row)], final_lsn=10)

    strict = ReplicationSink(spark, {"public.images": t}, on_unchanged_toast="error")
    with pytest.raises(ReplicationError, match="unchanged-TOAST"):
        strict.apply_frames(frames)

    # default mode substitutes the type default (cdc_event.rs:58)
    lossy = ReplicationSink(spark, {"public.images": t})
    lossy.apply_frames(frames)
    got = _content(spark, t)
    assert got["img000000000001"] == ("t1", b"")


def test_sink_refuses_truncate_and_unknown_relation(spark, tmp_path):
    t = _mk_table(tmp_path)
    sink = ReplicationSink(spark, {"public.images": t})
    enc = pgo.PgOutputEncoder()
    with pytest.raises(ReplicationError, match="TRUNCATE"):
        sink.apply_frames(_txn(
            enc, [enc.relation(IMG_REL), enc.truncate([77])], final_lsn=10
        ))
    sink2 = ReplicationSink(spark, {"public.images": t})
    with pytest.raises(ReplicationError, match="unknown relation"):
        sink2.apply_frames(_txn(enc, [enc.insert(IMG_REL, img_row(1))], final_lsn=20))


def test_sink_skips_unmirrored_tables(spark, tmp_path):
    t = _mk_table(tmp_path)
    other = pgo.Relation(
        relation_id=88, namespace="public", relation_name="other",
        replica_identity="d",
        columns=[pgo.RelationColumn(1, "id", pgo.INT4, -1)],
    )
    sink = ReplicationSink(spark, {"public.images": t})
    enc = pgo.PgOutputEncoder()
    frames = _txn(
        enc,
        [
            enc.relation(IMG_REL), enc.relation(other),
            enc.insert(other, {"id": 1}),
            enc.insert(IMG_REL, img_row(1)),
        ],
        final_lsn=10,
    )
    results = sink.apply_frames(frames)
    assert len(results) == 1
    assert set(_content(spark, t)) == {"img000000000001"}


def test_standby_status_frame(spark, tmp_path):
    t = _mk_table(tmp_path)
    sink = ReplicationSink(spark, {"public.images": t})
    enc = pgo.PgOutputEncoder()
    sink.apply_frames(_txn(
        enc, [enc.relation(IMG_REL), enc.insert(IMG_REL, img_row(1))], final_lsn=77
    ))
    fb = sink.standby_status(reply=True)
    assert fb[0:1] == b"r" and len(fb) == 1 + 8 * 4 + 1
    import struct

    written, flushed, applied, _ts = struct.unpack_from(">QQQq", fb, 1)
    assert written == flushed == applied == 77
    assert fb[-1] == 1


def test_initial_copy_then_stream(spark, tmp_path):
    """initial_copy bootstraps at the slot's consistent point; replaying the
    stream from before that point no-ops the already-snapshotted txns and
    applies only later ones (initial_copy.rs:31-117 + USE_SNAPSHOT slot)."""
    from moonlink_spark.pg_replication import initial_copy

    t = _mk_table(tmp_path)
    snap = spark.createDataFrame(
        [tuple(img_row(i).values()) for i in (1, 2)],
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )
    initial_copy(spark, t, snap, start_lsn=100)
    # crash-retry: second call is a no-op
    initial_copy(spark, t, snap, start_lsn=100)
    assert t.refresh().flush_lsn == 100

    enc = pgo.PgOutputEncoder()
    # txn at LSN 100 (already inside the snapshot) + txn at 200 (new)
    frames = _txn(
        enc, [enc.relation(IMG_REL), enc.insert(IMG_REL, img_row(2))], final_lsn=100
    )
    frames += _txn(
        enc, [enc.insert(IMG_REL, img_row(3, "post-copy"))], final_lsn=200, xid=2
    )
    sink = ReplicationSink(spark, {"public.images": t})
    results = sink.apply_frames(frames)
    assert [r.skipped for r in results] == [True, False]
    got = _content(spark, t)
    assert set(got) == {"img000000000001", "img000000000002", "img000000000003"}
    assert got["img000000000003"][0] == "post-copy"


def test_chaos_schedule_through_wire_path(spark, tmp_path):
    """The seeded chaos CDC schedule (FIXTURES F2) routed through the FULL
    wire path — pgoutput encode → decode → ReplicationSink — must land the
    same logical content as the pandas reference model, batch after batch.
    Batches alternate plain transactions and v2 streamed transactions, and
    every third batch replays its own frames first (socket retry) to prove
    the wire path inherits MERGE's exactly-once."""
    import pandas as pd

    from moonlink_spark.cdc import CdcScheduleGenerator, ReferenceTable

    gen = CdcScheduleGenerator(seed=4211)
    ref = ReferenceTable()
    t = _mk_table(tmp_path, "wire")
    sink = ReplicationSink(spark, {"public.images": t})
    enc = pgo.PgOutputEncoder()
    sink.process(pgo.XLogData(0, 0, 0, pgo.PgOutputDecoder().decode(enc.relation(IMG_REL))))

    for step in range(5):
        b = gen.next_batch(25 + step * 7, 10 + step * 3, 5)
        ref.apply(b)
        lsn = gen.commit_lsn
        ordered = b.sort_values("lsn").to_dict("records")

        def ev(r):
            if r["op"] == "D":
                return enc.delete(IMG_REL, key={"image_id": r["image_id"]})
            vals = {k: v for k, v in r.items() if k not in ("op", "lsn")}
            vals["bytes"] = bytes(vals["bytes"])
            return enc.insert(IMG_REL, vals)

        if step % 2 == 0:
            frames = [enc.xlogdata(enc.begin(lsn, xid=step + 1))]
            frames += [enc.xlogdata(ev(r)) for r in ordered]
            frames.append(enc.xlogdata(enc.commit(lsn, lsn)))
        else:  # streamed, two segments
            xid = 9000 + step
            half = len(ordered) // 2
            frames = [enc.xlogdata(enc.stream_start(xid, True))]
            frames += [enc.xlogdata(ev(r)) for r in ordered[:half]]
            frames.append(enc.xlogdata(enc.stream_stop()))
            frames.append(enc.xlogdata(enc.stream_start(xid, False)))
            frames += [enc.xlogdata(ev(r)) for r in ordered[half:]]
            frames.append(enc.xlogdata(enc.stream_stop()))
            frames.append(enc.xlogdata(enc.stream_commit(xid, lsn, lsn)))
        if step % 3 == 0:
            sink.apply_frames(frames)  # duplicate delivery (socket retry)
        sink.apply_frames(frames)

        got = (
            scan(spark, t)
            .select("image_id", "caption", "phash")
            .toPandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        exp = ref.to_pandas()
        assert len(got) == len(exp), f"step {step}: {len(got)} != {len(exp)}"
        if len(exp):
            pd.testing.assert_frame_equal(
                got,
                exp[["image_id", "caption", "phash"]].reset_index(drop=True),
                check_dtype=False,
            )


# ---------------------------------------------------------------------------
# property tests: arbitrary rows survive the wire round-trip
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=40,
)


@settings(max_examples=150, deadline=None)
@given(
    image_id=_texts.filter(bool),
    payload=st.binary(max_size=64),
    w=st.integers(-(2**31), 2**31 - 1),
    h=st.integers(-(2**31), 2**31 - 1),
    caption=st.one_of(st.none(), _texts),
    phash=st.integers(-(2**63), 2**63 - 1),
)
def test_wire_roundtrip_arbitrary_rows(image_id, payload, w, h, caption, phash):
    enc, dec = pgo.PgOutputEncoder(), pgo.PgOutputDecoder()
    row = {
        "image_id": image_id, "bytes": payload, "w": w, "h": h,
        "fmt": "png", "caption": caption, "phash": phash,
    }
    msg = dec.decode(enc.insert(IMG_REL, row))
    got = {}
    for col, raw in zip(IMG_REL.columns, msg.new_tuple.columns):
        got[col.name] = (
            None if raw is None else pgo.decode_text(col.type_oid, raw.decode())
        )
    assert got == row


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), _texts),
        max_size=8,
    )
)
def test_text_array_roundtrip(arr):
    assert pgo.decode_text(1009, pgo.encode_text(1009, arr)) == arr


def test_typed_envelope_through_wire(spark, tmp_path):
    """PG type decode lands correctly in a typed-envelope table: NUMERIC →
    Decimal, TIMESTAMP, DATE, INT8[] → array<long> through pgoutput → sink
    → MERGE → scan (conversions/text.rs parity on real engine storage)."""
    import datetime as dtm
    from decimal import Decimal

    from pyspark.sql.types import (
        ArrayType, DateType, DecimalType, LongType,
        StringType, StructField, StructType, TimestampType,
    )

    schema = StructType([
        StructField("k", StringType(), False),
        StructField("amount", DecimalType(12, 2), True),
        StructField("ts", TimestampType(), True),
        StructField("d", DateType(), True),
        StructField("tags", ArrayType(LongType()), True),
    ])
    t = create_table(
        str(tmp_path / "typed"), schema,
        properties={"moonlink.identity-keys": "k"},
    )
    rel = pgo.Relation(
        relation_id=5, namespace="public", relation_name="typed",
        replica_identity="d",
        columns=[
            pgo.RelationColumn(1, "k", pgo.TEXT, -1),
            pgo.RelationColumn(0, "amount", pgo.NUMERIC, -1),
            pgo.RelationColumn(0, "ts", pgo.TIMESTAMP, -1),
            pgo.RelationColumn(0, "d", pgo.DATE, -1),
            pgo.RelationColumn(0, "tags", 1016, -1),  # int8[]
        ],
    )
    enc = pgo.PgOutputEncoder()
    rows = [
        {"k": "a", "amount": Decimal("12.50"),
         "ts": dtm.datetime(2026, 8, 20, 10, 30, 0, 250000),
         "d": dtm.date(2026, 1, 2), "tags": [1, 2, None]},
        {"k": "b", "amount": None, "ts": None, "d": None, "tags": None},
    ]
    frames = _txn(
        enc, [enc.relation(rel)] + [enc.insert(rel, r) for r in rows], final_lsn=10
    )
    sink = ReplicationSink(spark, {"public.typed": t})
    sink.apply_frames(frames)
    got = {r["k"]: r for r in scan(spark, t).collect()}
    assert got["a"]["amount"] == Decimal("12.50")
    assert got["a"]["ts"] == dtm.datetime(2026, 8, 20, 10, 30, 0, 250000)
    assert got["a"]["d"] == dtm.date(2026, 1, 2)
    assert got["a"]["tags"] == [1, 2, None]
    assert got["b"]["amount"] is None and got["b"]["tags"] is None
