"""Object-store data plane + IO fault injection.

1. Full engine lifecycle (create → MERGE → compact → scan) on a table whose
   METADATA lives on the object-store-semantics mem:// store while ROW data
   stays on a Spark/pyarrow-readable filesystem — the storage split moonlink
   makes between catalog filesystem and data filesystem
   (reference: src/moonlink/src/storage/filesystem/storage_config.rs:15-43).
2. RetryAccessor/ChaosAccessor (reference: accessor_config.rs Retry/Chaos
   wrappers): the commit/expire/checkpoint protocol survives seeded
   transient failures; CAS conflicts still surface; persistent failures
   give up loudly.
"""

import uuid

import pytest

from moonlink_spark.cdc import CdcScheduleGenerator, ReferenceTable, to_spark
from moonlink_spark.operators.maintenance import optimize_table
from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import CommitConflict, create_table, load_table
from moonlink_spark.table.io import (
    CasConflict,
    ChaosAccessor,
    InMemoryObjectStore,
    RetryAccessor,
    TransientIOError,
    accessor_for,
)
from moonlink_spark.table.scan import scan
from moonlink_spark.table.writer import BUCKETS_PROP


def test_mem_metadata_local_data_lifecycle(spark, tmp_path):
    loc = f"mem://bkt-{uuid.uuid4().hex[:8]}/tbl"
    t = create_table(
        loc,
        IMAGES_SCHEMA,
        properties={BUCKETS_PROP: "8"},
        data_location=str(tmp_path / "rows"),
    )
    gen = CdcScheduleGenerator(seed=21)
    ref = ReferenceTable()
    for sizes in [(250, 0, 0), (60, 80, 40)]:
        b = gen.next_batch(*sizes)
        ref.apply(b)
        merge_cdc_batch(spark, t, to_spark(spark, b), gen.commit_lsn)
    optimize_table(spark, t, mode="full", retain_last=2, target_bytes=1 << 20)

    # reload purely from the object store and scan
    t2 = load_table(loc)
    got = scan(spark, t2).select("image_id", "caption").toPandas()
    exp = ref.to_pandas()
    assert len(got) == len(exp)
    assert set(got["image_id"]) == set(exp["image_id"])

    # every metadata object is IN the store; every data file is local parquet
    assert all(s.file.startswith("mem://") for s in t2.md.snapshots)
    assert all(m.startswith("mem://") for m in t2.md.current_snapshot().manifests)
    assert all(e.path.startswith(str(tmp_path)) for e in t2.data_entries())
    # stats/footers were collected for the local files through the data plane
    assert all(e.file_size_bytes > 0 and e.record_count > 0 for e in t2.data_entries())


def _patch_scheme(monkeypatch, auth: str, wrapped):
    """Route every mem://<auth>/ access in every consuming module through
    ``wrapped`` (modules import accessor_for by name)."""
    def patched(path: str):
        if path.startswith(f"mem://{auth}/"):
            return wrapped
        return accessor_for(path)

    for mod in (
        "moonlink_spark.table.catalog",
        "moonlink_spark.table.format",
        "moonlink_spark.operators.expire",
        "moonlink_spark.checkpoint",
    ):
        monkeypatch.setattr(f"{mod}.accessor_for", patched)


def test_chaos_commit_protocol_survives_transient_failures(monkeypatch):
    from moonlink_spark.operators.expire import expire_snapshots
    from moonlink_spark.table.format import FileEntry, clear_metadata_cache

    auth = f"chaos-{uuid.uuid4().hex[:8]}"
    chaos = ChaosAccessor(InMemoryObjectStore(auth), seed=7, error_rate=0.2)
    wrapped = RetryAccessor(chaos, attempts=6)
    _patch_scheme(monkeypatch, auth, wrapped)
    clear_metadata_cache()

    loc = f"mem://{auth}/tbl"
    t = create_table(loc, IMAGES_SCHEMA)
    for i in range(8):
        e = FileEntry("data", f"mem://{auth}/data/{i}.parquet", 5, 500, -1)
        t.commit("append", added=[e], lsn=i + 1)
    res = expire_snapshots(t, retain_last=2)
    assert res.expired_snapshots == 6
    assert load_table(loc).flush_lsn == 8
    assert chaos.injected > 0, "chaos never fired — test is vacuous"

    # CAS conflicts are protocol outcomes, never retried into success
    stale = load_table(loc)
    t.commit("append", added=[FileEntry("data", f"mem://{auth}/d9", 1, 10, -1)], lsn=9)
    with pytest.raises(CommitConflict):
        stale.commit("append", added=[FileEntry("data", f"mem://{auth}/d9b", 1, 10, -1)], lsn=9)


def test_retry_gives_up_on_persistent_failure():
    dead = ChaosAccessor(InMemoryObjectStore("dead"), seed=1, error_rate=1.0)
    acc = RetryAccessor(dead, attempts=3, base_delay_s=0.001)
    with pytest.raises(TransientIOError):
        acc.read_text("mem://dead/x")
    assert dead.injected == 3  # one per attempt


def test_cas_conflict_passes_through_retry():
    real = InMemoryObjectStore(f"casr-{uuid.uuid4().hex[:6]}")
    acc = RetryAccessor(real)
    acc.create_exclusive("mem://casr/x", "a")
    with pytest.raises(CasConflict):
        acc.create_exclusive("mem://casr/x", "b")
