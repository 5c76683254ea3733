"""Metadata layer against the object-store accessor (mem:// mock).

Exercises the full commit protocol — CAS exclusive-create, atomic hint
update, snapshot-object indirection, manifest reuse-by-reference, expiry
GC — on a store with object-store semantics (flat keys, conditional PUT, no
rename, no directories). Mirrors moonlink's storage_config fs/S3/GCS split
(reference: src/moonlink/src/storage/filesystem/storage_config.rs:15-43).
"""

import uuid

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from moonlink_spark.operators.expire import expire_snapshots
from moonlink_spark.table.catalog import CommitConflict, create_table, load_table
from moonlink_spark.table.format import FileEntry
from moonlink_spark.table.io import CasConflict, InMemoryObjectStore, accessor_for

SCHEMA = StructType(
    [StructField("k", StringType(), False), StructField("v", LongType(), True)]
)


def _entry(name: str, n: int = 10) -> FileEntry:
    return FileEntry(
        content="data",
        path=f"mem://bkt-{name}/data/{uuid.uuid4().hex}.parquet",
        record_count=n,
        file_size_bytes=n * 100,
        sequence_number=-1,
        stats={"k": {"min": "a", "max": "z", "nulls": 0}},
    )


@pytest.fixture()
def loc():
    return f"mem://bkt-{uuid.uuid4().hex[:8]}/tbl"


@pytest.fixture(params=["mem", "pyarrow-fs"])
def any_loc(request, tmp_path):
    """Metadata root on either accessor backend: the mem:// object store or
    a pyarrow.fs-mounted scheme URI (LocalFileSystem via file://) — the same
    class that serves s3://, gs://, hdfs:// on a real cluster. Passing the
    identical lifecycle on both proves the accessor boundary is
    scheme-clean."""
    if request.param == "mem":
        return f"mem://bkt-{uuid.uuid4().hex[:8]}/tbl"
    return f"file://{tmp_path}/meta-tbl"


def test_mem_store_roundtrip_commits(loc):
    t = create_table(loc, SCHEMA)
    e1, e2 = _entry("a"), _entry("a")
    t.commit("append", added=[e1], lsn=1)
    t.commit("append", added=[e2], lsn=2)

    t2 = load_table(loc)
    assert len(t2.md.snapshots) == 2
    got = t2.data_entries()
    assert {e.path for e in got} == {e1.path, e2.path}
    assert t2.flush_lsn == 2
    # snapshot objects are separate immutable files (O(delta) metadata)
    assert all(s.file and s.file.startswith("mem://") for s in t2.md.snapshots)
    # stats survive the round trip
    assert got[0].stats["k"]["min"] == "a"


def test_mem_store_cas_conflict(loc):
    t = create_table(loc, SCHEMA)
    t.commit("append", added=[_entry("b")], lsn=1)
    stale = load_table(loc)
    t.commit("append", added=[_entry("b")], lsn=2)  # winner
    with pytest.raises(CommitConflict):
        stale.commit("append", added=[_entry("b")], lsn=2)
    # refresh resolves the race
    stale.refresh()
    stale.commit("append", added=[_entry("b")], lsn=3)
    assert load_table(loc).flush_lsn == 3


def test_mem_store_append_reuses_manifests_by_reference(loc):
    t = create_table(loc, SCHEMA)
    t.commit("append", added=[_entry("c")], lsn=1)
    m1 = list(t.md.current_snapshot().manifests)
    t.commit("append", added=[_entry("c")], lsn=2)
    m2 = t.md.current_snapshot().manifests
    # parent manifest referenced verbatim, one new manifest for the delta
    assert m1[0] in m2 and len(m2) == 2


def test_mem_store_expire_deletes_objects(loc):
    t = create_table(loc, SCHEMA)
    # an OWNED data file (under the table's root — GC may delete it) and a
    # FOREIGN one (another bucket: shallow-clone / add_files shared object —
    # the ownership guard must leave it alone, operators/expire.py)
    dropped = _entry("d")
    dropped.path = f"{loc}/data/{uuid.uuid4().hex}.parquet"
    foreign = _entry("f")
    t.commit("append", added=[dropped, foreign], lsn=1)
    kept = _entry("d")
    kept.path = f"{loc}/data/{uuid.uuid4().hex}.parquet"
    t.commit(
        "replace",
        added=[kept],
        removed_paths={dropped.path, foreign.path},
        lsn=2,
    )
    t.commit("append", added=[_entry("d")], lsn=3)
    acc = accessor_for(loc)
    old_snap_files = [s.file for s in t.md.snapshots[:-2]]

    # the dropped data file must be GC'd; give both real objects to sweep
    accessor_for(dropped.path).write_atomic(dropped.path, "x")
    accessor_for(foreign.path).write_atomic(foreign.path, "x")
    res = expire_snapshots(t, retain_last=2)
    assert res.expired_snapshots == 1
    assert not accessor_for(dropped.path).exists(dropped.path)
    assert accessor_for(foreign.path).exists(foreign.path)  # never GC'd
    for p in old_snap_files:
        assert not acc.exists(p)
    # retained snapshots still readable from a fresh handle
    t3 = load_table(loc)
    assert len(t3.md.snapshots) == 2
    assert {e.path for e in t3.data_entries()} >= {kept.path}


def test_refresh_is_o_delta_not_o_history(loc, monkeypatch):
    """After one commit, refresh() reads O(1) metadata objects — the new
    metadata version (+ hint/existence probes), never the whole snapshot
    history (snap/manifest objects are immutable and cached by path)."""
    t = create_table(loc, SCHEMA)
    for i in range(12):  # build up history
        t.commit("append", added=[_entry("h")], lsn=i + 1)
    reader = load_table(loc)  # fresh handle, caches warm from commits
    t.commit("append", added=[_entry("h")], lsn=100)  # one new commit

    reads = []
    real_read = InMemoryObjectStore.read_text

    def counting_read(self, path):
        reads.append(path)
        return real_read(self, path)

    monkeypatch.setattr(InMemoryObjectStore, "read_text", counting_read)
    reader.refresh()
    assert reader.flush_lsn == 100
    # hint + new metadata json; every historical snap-*.json comes from cache
    assert len(reads) <= 3, f"refresh read {len(reads)} objects: {reads}"
    assert not any("snap-" in p for p in reads)

    # listing entries after refresh reads no manifest objects either (all 13
    # manifests were cached when written/first read)
    reads.clear()
    assert len(reader.data_entries()) == 13
    assert reads == []


def test_cas_primitive_semantics():
    acc = InMemoryObjectStore("race")
    acc.create_exclusive("mem://race/obj", "first")
    with pytest.raises(CasConflict):
        acc.create_exclusive("mem://race/obj", "second")
    assert acc.read_text("mem://race/obj") == "first"
    acc.write_atomic("mem://race/obj", "third")  # unconditional overwrite
    assert acc.read_text("mem://race/obj") == "third"


def test_remote_metadata_local_data_full_lifecycle(spark, tmp_path, any_loc):
    """create -> append (REAL parquet) -> MERGE -> full maintenance -> scan /
    time-travel with metadata on a remote-scheme accessor (mem:// object
    store AND pyarrow.fs file:// mount — the class serving s3/gs/hdfs) and
    row data on a Spark-readable filesystem — the documented production
    split (table/io.py: Spark and pyarrow speak object-store URIs natively
    for ROW data; the engine's own metadata protocol goes through the
    accessor). Verifies the data plane (footer stats, listing, scan,
    compaction) never assumes metadata and data share a root."""
    loc = any_loc
    from moonlink_spark.cdc import CdcScheduleGenerator, ReferenceTable, to_spark
    from moonlink_spark.operators.maintenance import optimize_table
    from moonlink_spark.operators.merge import merge_cdc_batch
    from moonlink_spark.schema import IMAGES_SCHEMA
    from moonlink_spark.table.catalog import load_table
    from moonlink_spark.table.scan import scan, scan_at_lsn
    from moonlink_spark.table.writer import write_data_files

    t = create_table(loc, IMAGES_SCHEMA, data_location=str(tmp_path / "rows"))
    gen = CdcScheduleGenerator(seed=7)
    ref = ReferenceTable()

    b0 = gen.next_batch(200, 0, 0)
    ref.apply(b0)
    entries = write_data_files(
        spark, to_spark(spark, b0).drop("op", "lsn"), t.new_data_dir()
    )
    assert entries and all(not e.path.startswith("mem://") for e in entries)
    assert all(e.stats.get("image_id") for e in entries)  # footer stats ran
    t.commit("append", added=entries, lsn=gen.commit_lsn)
    pre_lsn = t.flush_lsn

    b1 = gen.next_batch(50, 100, 30)
    ref.apply(b1)
    merge_cdc_batch(spark, t, to_spark(spark, b1), gen.commit_lsn)

    optimize_table(spark, t, mode="full", retain_last=4)

    got = scan(spark, t).select("image_id", "caption").toPandas()
    exp = ref.to_pandas()
    assert sorted(got["image_id"]) == sorted(exp["image_id"])
    assert dict(zip(got["image_id"], got["caption"])) == dict(
        zip(exp["image_id"], exp["caption"])
    )

    # time-travel to the pre-merge snapshot still resolves (metadata on
    # mem://, manifests reused by reference)
    old = scan_at_lsn(spark, t, pre_lsn)
    assert old.count() == 200

    # a fresh loader sees the same table through the hint object
    t2 = load_table(loc)
    assert t2.flush_lsn == t.flush_lsn
    assert scan(spark, t2).count() == len(exp)


def test_pyarrow_fs_accessor_primitives(tmp_path):
    """PyArrowFSAccessor surface over a file:// mount: roundtrip, atomic
    write, exists/mtime, recursive list with suffix filter, idempotent
    delete, exclusive-create conflict (the documented non-atomic seam on
    object stores — real CAS is per-store conditional PUT)."""
    from moonlink_spark.table.io import PyArrowFSAccessor, accessor_for

    base = f"file://{tmp_path}/store"
    acc = accessor_for(base + "/x.json")
    assert isinstance(acc, PyArrowFSAccessor)
    acc.mkdirs(base + "/sub")
    acc.write_atomic(base + "/sub/a.json", '{"v":1}')
    acc.write_atomic(base + "/sub/b.txt", "t")
    assert acc.read_text(base + "/sub/a.json") == '{"v":1}'
    assert acc.exists(base + "/sub/a.json")
    assert not acc.exists(base + "/sub/missing")
    assert acc.mtime(base + "/sub/a.json") is not None
    assert acc.mtime(base + "/sub/missing") is None
    # list returns full URIs, recursive, suffix-filtered
    assert acc.list(base, suffix=".json") == [base + "/sub/a.json"]
    assert len(acc.list(base)) == 2
    assert acc.list(base + "/nope") == []
    with pytest.raises(CasConflict):
        acc.create_exclusive(base + "/sub/a.json", "x")
    acc.create_exclusive(base + "/sub/c.json", "c")
    assert acc.read_text(base + "/sub/c.json") == "c"
    acc.delete(base + "/sub/c.json")
    acc.delete(base + "/sub/c.json")  # idempotent
    assert not acc.exists(base + "/sub/c.json")
    # no tmp litter from write_atomic (moved, not copied)
    assert not [p for p in acc.list(base) if ".tmp" in p]
