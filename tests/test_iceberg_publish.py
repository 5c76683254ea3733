"""publish_iceberg: the engine snapshot as a GENUINE Apache Iceberg v2 table.

Three layers of evidence, strongest available in this offline sandbox
(the DuckDB iceberg extension cannot be installed without network):

1. round-trip — ``read_published`` plans from the published metadata only
   and must reproduce the engine scan exactly;
2. an INDEPENDENT from-spec Avro/OCF decoder (written below against the
   public Avro 1.11 spec, importing nothing from moonlink_spark) parses
   the manifest list and manifests and validates the Iceberg v2 layout
   (spec field ids, sequence numbers, reserved delete-file ids);
3. DuckDB consumes the published parquet directly — data files,
   position-delete files, equality-delete files — and replays the v2
   delete semantics in SQL; an external engine reproducing the table
   content from the published files alone.
"""

from __future__ import annotations

import io
import json
import os
import struct

from pyspark.sql import functions as F

from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.operators.publish import publish_iceberg, read_published
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.scan import scan
from moonlink_spark.table.writer import BUCKETS_PROP, write_bucketed_data_files

COLS = ["image_id", "caption", "phash"]


# ---------------------------------------------------------------------------
# Independent from-spec Avro decoder (NOT moonlink_spark.table.avro):
# zigzag varints, length-prefixed bytes, unions as index+branch, records in
# field order, array/map blocks — straight from the Avro 1.11 binary spec.
# ---------------------------------------------------------------------------


def _zz(buf: io.BytesIO) -> int:
    shift = acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return (acc >> 1) ^ -(acc & 1)
        shift += 7


def _bts(buf: io.BytesIO) -> bytes:
    return buf.read(_zz(buf))


def _decode(buf: io.BytesIO, sch):
    if isinstance(sch, list):
        return _decode(buf, sch[_zz(buf)])
    t = sch["type"] if isinstance(sch, dict) else sch
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _zz(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _bts(buf)
    if t == "string":
        return _bts(buf).decode()
    if t == "record":
        return {f["name"]: _decode(buf, f["type"]) for f in sch["fields"]}
    if t == "array":
        out = []
        while True:
            n = _zz(buf)
            if n == 0:
                return out
            if n < 0:
                _zz(buf)
                n = -n
            out.extend(_decode(buf, sch["items"]) for _ in range(n))
    if t == "map":
        out = {}
        while True:
            n = _zz(buf)
            if n == 0:
                return out
            if n < 0:
                _zz(buf)
                n = -n
            for _ in range(n):
                k = _bts(buf).decode()  # key MUST decode before the value
                out[k] = _decode(buf, sch["values"])
    raise AssertionError(f"unexpected type {t}")


def spec_read_ocf(path: str) -> tuple[dict, dict, list]:
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    assert buf.read(4) == b"Obj\x01", "bad OCF magic"
    meta = {}
    while True:
        n = _zz(buf)
        if n == 0:
            break
        if n < 0:
            _zz(buf)
            n = -n
        for _ in range(n):
            k = _bts(buf).decode()  # key MUST decode before the value
            meta[k] = _bts(buf)
    assert meta.get("avro.codec", b"null") in (b"null", b"")
    sch = json.loads(meta["avro.schema"])
    sync = buf.read(16)
    recs = []
    while True:
        probe = buf.read(1)
        if not probe:
            break
        buf.seek(-1, 1)
        cnt = _zz(buf)
        _zz(buf)
        recs.extend(_decode(buf, sch) for _ in range(cnt))
        assert buf.read(16) == sync, "sync marker mismatch"
    return sch, meta, recs


# --------------------------------------------------------------- fixtures


def _rows(spark, n, tag="a"):
    return spark.range(n).select(
        F.format_string("id%05d", F.col("id")).alias("image_id"),
        F.encode(F.format_string("b%d", F.col("id")), "utf-8").alias("bytes"),
        (F.col("id") % 100).cast("int").alias("w"),
        F.lit(16).cast("int").alias("h"),
        F.lit("png").alias("fmt"),
        F.format_string(tag + " %d", F.col("id")).alias("caption"),
        (F.col("id") % 50).cast("long").alias("phash"),
    )


def _cdc(spark, n, lo, hi, dlo, dhi, tag):
    u = _rows(spark, n, tag).filter(
        (F.col("image_id") >= f"id{lo:05d}") & (F.col("image_id") < f"id{hi:05d}")
    ).select(F.lit("U").alias("op"), F.lit(1).cast("long").alias("lsn"), "*")
    d = _rows(spark, n).filter(
        (F.col("image_id") >= f"id{dlo:05d}") & (F.col("image_id") < f"id{dhi:05d}")
    ).select(
        F.lit("D").alias("op"),
        F.lit(1).cast("long").alias("lsn"),
        "image_id",
        F.lit(None).cast("binary").alias("bytes"),
        F.lit(None).cast("int").alias("w"),
        F.lit(None).cast("int").alias("h"),
        F.lit(None).cast("string").alias("fmt"),
        F.lit(None).cast("string").alias("caption"),
        F.lit(None).cast("long").alias("phash"),
    )
    return u.unionByName(d)


def _mk_published(spark, tmp_path):
    t = create_table(
        str(tmp_path / "src"), IMAGES_SCHEMA, properties={BUCKETS_PROP: "4"}
    )
    entries = write_bucketed_data_files(
        spark, _rows(spark, 400), t.new_data_dir(), "image_id", 4
    )
    t.commit("append", added=entries, lsn=1)
    # eager MERGE -> positional DVs; lazy MERGE -> a live eq-delete file
    merge_cdc_batch(spark, t, _cdc(spark, 400, 100, 140, 200, 230, "v2"), lsn=2)
    merge_cdc_batch(
        spark, t, _cdc(spark, 400, 300, 320, 350, 360, "v3"), lsn=3, mode="lazy"
    )
    res = publish_iceberg(spark, t, str(tmp_path / "pub"))
    return t, res


# ------------------------------------------------------------------- tests


def test_publish_roundtrip_matches_engine_scan(spark, tmp_path):
    t, res = _mk_published(spark, tmp_path)
    assert res.pos_delete_files == 1 and res.eq_delete_files == 1
    got = (
        read_published(spark, res.location)
        .select(*COLS).orderBy("image_id").collect()
    )
    want = scan(spark, t).select(*COLS).orderBy("image_id").collect()
    assert got == want and len(got) > 0


def test_published_layout_is_spec_conformant(spark, tmp_path):
    import pyarrow.parquet as pq

    t, res = _mk_published(spark, tmp_path)
    meta_dir = os.path.join(res.location, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        v = int(f.read())
    with open(os.path.join(meta_dir, f"v{v}.metadata.json")) as f:
        md = json.load(f)
    # required v2 metadata fields
    assert md["format-version"] == 2
    for k in (
        "table-uuid", "location", "last-sequence-number", "last-column-id",
        "schemas", "partition-specs", "sort-orders", "current-snapshot-id",
        "snapshots",
    ):
        assert k in md, k
    schema = md["schemas"][md["current-schema-id"]]
    ids = [f["id"] for f in schema["fields"]]
    assert len(ids) == len(set(ids)) and all(isinstance(i, int) for i in ids)

    snap = md["snapshots"][0]
    # manifest list decoded by the INDEPENDENT reader
    ml_sch, _, manifest_files = spec_read_ocf(snap["manifest-list"])
    fid = {
        f["name"]: f.get("field-id") for f in ml_sch["fields"]
    }
    assert fid["manifest_path"] == 500 and fid["content"] == 517
    assert {mf["content"] for mf in manifest_files} == {0, 1}

    n_rows = 0
    for mf in manifest_files:
        m_sch, m_meta, entries = spec_read_ocf(mf["manifest_path"])
        assert m_meta["format-version"] == b"2"
        e_fids = {f["name"]: f.get("field-id") for f in m_sch["fields"]}
        assert e_fids["status"] == 0 and e_fids["data_file"] == 2
        for e in entries:
            df = e["data_file"]
            assert os.path.exists(df["file_path"])
            assert df["file_format"] == "PARQUET"
            assert e["sequence_number"] <= md["last-sequence-number"]
            if mf["content"] == 0:
                n_rows += df["record_count"]
            elif df["content"] == 1:
                # reserved position-delete field ids in the parquet footer
                sch = pq.read_schema(df["file_path"])
                fp = sch.field("file_path").metadata[b"PARQUET:field_id"]
                ps = sch.field("pos").metadata[b"PARQUET:field_id"]
                assert fp == b"2147483546" and ps == b"2147483545"
            else:
                assert df["content"] == 2 and df["equality_ids"]
    assert n_rows == 400 + 40 + 20  # base + eager upserts + lazy upserts


def test_duckdb_reads_published_files(spark, tmp_path):
    """External-engine check: DuckDB reconstructs the live table content
    from the PUBLISHED parquet alone (data + position deletes + equality
    deletes with the v2 sequence rule) — no moonlink code in the read."""
    import duckdb

    t, res = _mk_published(spark, tmp_path)
    _, data_entries, delete_entries = _published_entries(res.location)
    data_paths = [e["data_file"]["file_path"] for e in data_entries]
    pos_paths = [
        e["data_file"]["file_path"]
        for e in delete_entries
        if e["data_file"]["content"] == 1
    ]
    eqs = [e for e in delete_entries if e["data_file"]["content"] == 2]
    seq_rows = ", ".join(
        f"('{e['data_file']['file_path']}', {e['sequence_number']})"
        for e in data_entries
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW data AS SELECT *, filename AS fpath, file_row_number AS pos "
        f"FROM read_parquet({data_paths!r}, filename=true, file_row_number=true)"
    )
    con.execute(f"CREATE VIEW seqs (fpath, seq) AS SELECT * FROM (VALUES {seq_rows})")
    con.execute(
        f"CREATE VIEW posdel AS SELECT * FROM read_parquet({pos_paths!r})"
    )
    eq_clauses = ""
    for i, e in enumerate(eqs):
        p = e["data_file"]["file_path"]
        eq_clauses += (
            f" AND NOT (s.seq < {e['sequence_number']} AND d.image_id IN "
            f"(SELECT image_id FROM read_parquet(['{p}'])))"
        )
    rows = con.execute(
        "SELECT d.image_id, d.caption, d.phash FROM data d "
        "JOIN seqs s ON d.fpath = s.fpath "
        "WHERE NOT EXISTS (SELECT 1 FROM posdel p "
        "  WHERE p.file_path = d.fpath AND p.pos = d.pos)"
        + eq_clauses
        + " ORDER BY d.image_id"
    ).fetchall()
    want = [
        (r["image_id"], r["caption"], r["phash"])
        for r in scan(spark, t).select(*COLS).orderBy("image_id").collect()
    ]
    assert rows == want and len(rows) > 0


def _published_entries(location):
    meta_dir = os.path.join(location, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        v = int(f.read())
    with open(os.path.join(meta_dir, f"v{v}.metadata.json")) as f:
        md = json.load(f)
    snap = md["snapshots"][0]
    _, _, manifest_files = spec_read_ocf(snap["manifest-list"])
    data, deletes = [], []
    for mf in manifest_files:
        _, _, entries = spec_read_ocf(mf["manifest_path"])
        for e in entries:
            (data if mf["content"] == 0 else deletes).append(e)
    return md, data, deletes


def test_publish_snapshot_pinning_and_time_travel(spark, tmp_path):
    """Publishing an OLDER snapshot exports that snapshot's content —
    the Iceberg face of the engine's LSN time travel."""
    t = create_table(str(tmp_path / "src2"), IMAGES_SCHEMA)
    from moonlink_spark.table.writer import write_data_files

    t.commit(
        "append",
        added=write_data_files(
            spark, _rows(spark, 50), t.new_data_dir(), field_id_schema=t.schema
        ),
        lsn=1,
    )
    first = t.head_snapshot().snapshot_id
    merge_cdc_batch(spark, t, _cdc(spark, 50, 10, 20, 30, 40, "v2"), lsn=2)
    res_old = publish_iceberg(spark, t, str(tmp_path / "pub_old"), snapshot_id=first)
    res_new = publish_iceberg(spark, t, str(tmp_path / "pub_new"))
    assert read_published(spark, res_old.location).count() == 50
    got = read_published(spark, res_new.location).count()
    assert got == scan(spark, t).count() < 50 + 10


def test_republish_increments_metadata_version(spark, tmp_path):
    """Re-publishing after new commits writes vN+1.metadata.json and flips
    the version-hint atomically; readers follow the hint to fresh state."""
    t = create_table(str(tmp_path / "src3"), IMAGES_SCHEMA)
    from moonlink_spark.table.writer import write_data_files

    t.commit(
        "append",
        added=write_data_files(
            spark, _rows(spark, 40), t.new_data_dir(), field_id_schema=t.schema
        ),
        lsn=1,
    )
    dest = str(tmp_path / "pub3")
    publish_iceberg(spark, t, dest)
    assert read_published(spark, dest).count() == 40

    merge_cdc_batch(spark, t, _cdc(spark, 40, 0, 0, 10, 20, "x"), lsn=2)
    t.refresh()
    publish_iceberg(spark, t, dest)
    meta_dir = os.path.join(dest, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        assert f.read().strip() == "2"
    assert os.path.exists(os.path.join(meta_dir, "v1.metadata.json"))
    with open(os.path.join(meta_dir, "v2.metadata.json")) as f:
        md = json.load(f)
    assert md["metadata-log"] and md["metadata-log"][0]["metadata-file"].endswith(
        "v1.metadata.json"
    )
    assert read_published(spark, dest).count() == 30


def test_cli_publish(spark, tmp_path, capsys):
    from moonlink_spark.__main__ import main

    t = create_table(str(tmp_path / "src4"), IMAGES_SCHEMA)
    from moonlink_spark.table.writer import write_data_files

    t.commit(
        "append",
        added=write_data_files(
            spark, _rows(spark, 25), t.new_data_dir(), field_id_schema=t.schema
        ),
        lsn=1,
    )
    dest = str(tmp_path / "pub4")
    rc = main(["publish", str(tmp_path / "src4"), dest])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["published"] == dest and out["data_files"] >= 1
    assert read_published(spark, dest).count() == 25


def test_auto_maintenance_keeps_published_table_fresh(spark, tmp_path):
    """moonlink's core loop CONTINUOUSLY syncs the table to Iceberg
    (iceberg_table_syncer.rs:505-596); the batch analog: a table with
    moonlink.publish.dest set republishes during auto maintenance whenever
    the export is behind, and skips when it is current."""
    from moonlink_spark.operators.maintenance import (
        PUBLISH_DEST_PROP,
        auto_optimize,
    )
    from moonlink_spark.table.writer import write_data_files

    dest = str(tmp_path / "pub_auto")
    t = create_table(
        str(tmp_path / "src5"), IMAGES_SCHEMA,
        properties={PUBLISH_DEST_PROP: dest},
    )
    t.commit(
        "append",
        added=write_data_files(
            spark, _rows(spark, 60), t.new_data_dir(), field_id_schema=t.schema
        ),
        lsn=1,
    )
    rep = auto_optimize(spark, t)
    assert "publish" in rep.triggered
    assert read_published(spark, dest).count() == 60

    # current export → second tick is a publish no-op
    rep2 = auto_optimize(spark, t)
    assert "publish" not in rep2.triggered

    # new commit → the next tick refreshes the export
    merge_cdc_batch(spark, t, _cdc(spark, 60, 0, 0, 10, 30, "y"), lsn=2)
    rep3 = auto_optimize(spark, t)
    assert "publish" in rep3.triggered
    t.refresh()
    assert read_published(spark, dest).count() == scan(spark, t).count()


def test_import_iceberg_roundtrip(spark, tmp_path):
    """Switch-over path: an Iceberg table comes UNDER engine maintenance.
    Zero-copy adoption when the snapshot has no deletes; materialized
    import (rows survive, delete metadata resolved) when it does."""
    from moonlink_spark.operators.publish import import_iceberg

    # with deletes -> materialized
    t, res = _mk_published(spark, tmp_path)
    imp = import_iceberg(spark, res.location, str(tmp_path / "imp1"))
    got = scan(spark, imp).select(*COLS).orderBy("image_id").collect()
    want = scan(spark, t).select(*COLS).orderBy("image_id").collect()
    assert got == want

    # delete-free -> zero-copy adoption (same file paths referenced)
    t2 = create_table(str(tmp_path / "plain"), IMAGES_SCHEMA)
    from moonlink_spark.table.writer import write_data_files

    t2.commit(
        "append",
        added=write_data_files(
            spark, _rows(spark, 80), t2.new_data_dir(), field_id_schema=t2.schema
        ),
        lsn=1,
    )
    pub2 = publish_iceberg(spark, t2, str(tmp_path / "pub_plain"))
    imp2 = import_iceberg(spark, pub2.location, str(tmp_path / "imp2"))
    assert scan(spark, imp2).count() == 80
    src_paths = {e.path for e in t2.data_entries()}
    assert {e.path for e in imp2.data_entries()} == src_paths  # zero copy

    # and the imported table is a full engine citizen: MERGE works on it
    merge_cdc_batch(spark, imp2, _cdc(spark, 80, 0, 0, 10, 20, "z"), lsn=2)
    assert scan(spark, imp2.refresh()).count() == 70
