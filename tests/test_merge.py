import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from moonlink_spark.cdc import CdcScheduleGenerator, ReferenceTable, to_spark
from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.scan import scan


@pytest.fixture()
def table(tmp_path):
    return create_table(str(tmp_path / "t"), IMAGES_SCHEMA)


def _check_vs_oracle(spark, table, ref: ReferenceTable):
    got = (
        scan(spark, table)
        .select("image_id", "w", "h", "fmt", "caption", "phash")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    exp = ref.to_pandas()
    exp_cmp = exp[["image_id", "w", "h", "fmt", "caption", "phash"]].reset_index(drop=True) if len(exp) else exp
    assert len(got) == len(exp), (len(got), len(exp))
    if len(got):
        pd.testing.assert_frame_equal(
            got.astype({"w": "int64", "h": "int64"}),
            exp_cmp.astype({"w": "int64", "h": "int64"}),
            check_dtype=False,
        )


def test_merge_single_batch_insert(spark, table):
    gen = CdcScheduleGenerator(seed=1)
    ref = ReferenceTable()
    b = gen.next_batch(100, 0, 0)
    ref.apply(b)
    res = merge_cdc_batch(spark, table, to_spark(spark, b), gen.commit_lsn)
    assert res.upserted == 100 and res.deleted == 0
    _check_vs_oracle(spark, table, ref)


def test_merge_upsert_delete_sequence(spark, table):
    gen = CdcScheduleGenerator(seed=2)
    ref = ReferenceTable()
    for sizes in [(200, 0, 0), (50, 60, 25), (30, 40, 40), (0, 80, 10)]:
        b = gen.next_batch(*sizes)
        ref.apply(b)
        merge_cdc_batch(spark, table, to_spark(spark, b), gen.commit_lsn)
        _check_vs_oracle(spark, table, ref)


def test_merge_updates_change_payload(spark, table):
    gen = CdcScheduleGenerator(seed=3)
    ref = ReferenceTable()
    b1 = gen.next_batch(50, 0, 0)
    ref.apply(b1)
    merge_cdc_batch(spark, table, to_spark(spark, b1), gen.commit_lsn)
    b2 = gen.next_batch(0, 50, 0)
    ref.apply(b2)
    merge_cdc_batch(spark, table, to_spark(spark, b2), gen.commit_lsn)
    caps = scan(spark, table).select("caption").toPandas()["caption"]
    assert (caps.str.contains(" v1")).all()
    _check_vs_oracle(spark, table, ref)


def test_merge_idempotent_replay(spark, table):
    gen = CdcScheduleGenerator(seed=4)
    b = gen.next_batch(40, 0, 0)
    lsn = gen.commit_lsn
    merge_cdc_batch(spark, table, to_spark(spark, b), lsn)
    res2 = merge_cdc_batch(spark, table, to_spark(spark, b), lsn)
    assert res2.skipped
    assert scan(spark, table).count() == 40
    assert len(table.md.snapshots) == 1


def test_merge_intra_batch_dedup(spark, table):
    # same key appears 3x in one batch: U, D, U — latest LSN wins
    rows = []
    for i, op in enumerate(["U", "D", "U"]):
        rows.append(
            {
                "op": op, "lsn": 10 + i, "image_id": "img000000000001",
                "bytes": b"\x89PNG", "w": 32, "h": 32, "fmt": "png",
                "caption": f"c{i}", "phash": 7,
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["w"] = pdf["w"].astype("Int32"); pdf["h"] = pdf["h"].astype("Int32")
    from moonlink_spark.schema import CDC_SCHEMA
    df = spark.createDataFrame(pdf, CDC_SCHEMA)
    merge_cdc_batch(spark, table, df, 12)
    got = scan(spark, table).collect()
    assert len(got) == 1 and got[0]["caption"] == "c2"


def test_merge_checkpoint_resume(spark, table, tmp_path):
    gen = CdcScheduleGenerator(seed=5)
    b = gen.next_batch(60, 0, 0)
    lsn = gen.commit_lsn
    ck = str(tmp_path / "ck")
    merge_cdc_batch(spark, table, to_spark(spark, b), lsn, checkpoint_root=ck)
    from moonlink_spark.checkpoint import JobCheckpoint
    jc = JobCheckpoint(ck, f"merge-lsn{lsn}")
    m = jc.all_metrics()
    assert "inserts" in m and m["inserts"]["rows"] == 60
    assert m["inserts"]["skew_ratio"] >= 1.0


def test_bucketed_probe_prunes_candidates(spark, tmp_path):
    """The GlobalIndex replacement: on a hash-bucketed table, a small CDC
    batch probes ONLY the buckets its keys hash into — pruned_candidates
    must be far below the total file count even for uniformly-spread keys
    (min/max pruning alone is a no-op there)."""
    from moonlink_spark.cdc import materialize_spec
    from moonlink_spark.datagen import generate_images
    from moonlink_spark.table.writer import BUCKETS_PROP, write_bucketed_data_files

    B = 64
    t = create_table(
        str(tmp_path / "bt"), IMAGES_SCHEMA, properties={BUCKETS_PROP: str(B)}
    )
    df = generate_images(spark, 2000, partitions=8)
    entries = write_bucketed_data_files(
        spark, df, t.new_data_dir(), "image_id", B, max_records_per_file=40
    )
    assert all(e.bucket is not None for e in entries)
    t.commit("append", added=entries, lsn=1)
    total = len(t.data_entries())
    assert total >= B  # at least one file per bucket

    # a 6-key batch of uniformly-spread updates (keys span the table, so
    # min/max bounds prune nothing)
    gen = CdcScheduleGenerator(seed=11)
    gen.next_new = 2000
    gen.live = {i: 0 for i in range(0, 2000, 7)}
    gen.next_lsn = 2
    spec = gen.next_spec(0, 6, 0)
    ref_keys = {f"img{int(i):012d}" for i in spec["idx"]}
    res = merge_cdc_batch(
        spark, t, to_spark(spark, materialize_spec(spec)), gen.commit_lsn
    )
    assert res.metrics["pruned_candidates"] <= 6 * (total // B + 1)
    assert res.metrics["pruned_candidates"] < total // 4
    assert res.metrics["matched"] == 6
    # correctness: exactly the updated keys carry the new caption
    got = scan(spark, t).filter(F.col("caption").contains(" v1")).collect()
    assert {r["image_id"] for r in got} == ref_keys


def test_bloom_prunes_within_buckets(spark, tmp_path):
    """Per-KEY pruning (the bloom half of the GlobalIndex analog): with few
    buckets and many files per bucket, a narrow batch touches every BUCKET —
    bucket-set pruning is a no-op — but the per-file key blooms keep only the
    files that actually contain a batch key."""
    from moonlink_spark.cdc import materialize_spec
    from moonlink_spark.datagen import generate_images
    from moonlink_spark.table.bloom import BLOOM_STAT
    from moonlink_spark.table.writer import BUCKETS_PROP, write_bucketed_data_files

    B = 4
    t = create_table(
        str(tmp_path / "blm"), IMAGES_SCHEMA, properties={BUCKETS_PROP: str(B)}
    )
    df = generate_images(spark, 2000, partitions=8)
    entries = write_bucketed_data_files(
        spark, df, t.new_data_dir(), "image_id", B, max_records_per_file=40
    )
    assert all(BLOOM_STAT in e.stats for e in entries)
    t.commit("append", added=entries, lsn=1)
    total = len(t.data_entries())
    assert total >= 40  # many files per bucket

    gen = CdcScheduleGenerator(seed=13)
    gen.next_new = 2000
    gen.live = {i: 0 for i in range(0, 2000, 7)}
    gen.next_lsn = 2
    spec = gen.next_spec(0, 6, 0)
    ref_keys = {f"img{int(i):012d}" for i in spec["idx"]}
    res = merge_cdc_batch(
        spark, t, to_spark(spark, materialize_spec(spec)), gen.commit_lsn
    )
    # bucket prune alone keeps every file of every touched bucket (>= half
    # the table for a 6-key batch over 4 buckets)...
    assert res.metrics["bloom_pruned_from"] >= total // 2
    # ...the blooms cut it to ~one file per key (+ rare false positives)
    assert res.metrics["pruned_candidates"] <= 10
    assert res.metrics["pruned_candidates"] < res.metrics["bloom_pruned_from"]
    assert res.metrics["matched"] == 6
    got = scan(spark, t).filter(F.col("caption").contains(" v1")).collect()
    assert {r["image_id"] for r in got} == ref_keys


def test_compaction_bucketizes_flushed_files(spark, tmp_path):
    """Flush/index split: MERGE inserts land unbucketed (no shuffle on the
    ingest path); a full compaction routes them through the bucketed rewrite
    so the whole table becomes bucket-pure and probes prune again."""
    from moonlink_spark.operators.maintenance import optimize_table
    from moonlink_spark.table.writer import BUCKETS_PROP

    t = create_table(
        str(tmp_path / "fb"), IMAGES_SCHEMA, properties={BUCKETS_PROP: "8"}
    )
    gen = CdcScheduleGenerator(seed=12)
    ref = ReferenceTable()
    for sizes in [(300, 0, 0), (100, 80, 40)]:
        b = gen.next_batch(*sizes)
        ref.apply(b)
        merge_cdc_batch(spark, t, to_spark(spark, b), gen.commit_lsn)
    assert all(e.bucket is None for e in t.data_entries())  # flushed fast

    optimize_table(spark, t, mode="full", retain_last=2, target_bytes=1 << 20)
    assert all(e.bucket is not None for e in t.data_entries())  # indexed
    _check_vs_oracle(spark, t, ref)


def test_merge_pixels_survive(spark, table):
    from moonlink_spark.datagen import expected_pixels
    from moonlink_spark.functions.imagecodec import decode, psnr

    gen = CdcScheduleGenerator(seed=6)
    ref = ReferenceTable()
    b = gen.next_batch(20, 0, 0)
    ref.apply(b)
    merge_cdc_batch(spark, table, to_spark(spark, b), gen.commit_lsn)
    rows = scan(spark, table).filter(F.col("image_id") == "img000000000007").collect()
    r = rows[0]
    px = decode(bytes(r["bytes"]), r["fmt"])
    exp = expected_pixels(7)
    if r["fmt"] == "png":
        assert np.array_equal(px, exp)
    else:
        assert psnr(px, exp) >= 40.0


def test_bloom_sidecar_placement(spark, tmp_path):
    """Bloom bits live in ONE sidecar index object per build call; manifest
    entries carry only an O(100B) reference (the 1e9-file posture — inline
    blooms made manifests O(100KB)/file). Probing resolves from the sidecar
    on disk, surviving a fresh table handle and a cold cache."""
    import json

    import numpy as np

    from moonlink_spark.datagen import generate_images
    from moonlink_spark.table.bloom import (
        BLOOM_STAT,
        SIDECAR_SUFFIX,
        _sidecar_cache,
        bloom_may_contain_any,
        bloom_sidecar_path,
    )
    from moonlink_spark.table.catalog import load_table
    from moonlink_spark.table.writer import BUCKETS_PROP, write_bucketed_data_files

    t = create_table(
        str(tmp_path / "sc"), IMAGES_SCHEMA, properties={BUCKETS_PROP: "4"}
    )
    entries = write_bucketed_data_files(
        spark, generate_images(spark, 400, partitions=4), t.new_data_dir(),
        "image_id", 4, max_records_per_file=100,
    )
    refs = {bloom_sidecar_path(e) for e in entries}
    assert len(refs) == 1, "one sidecar per build call"
    sidecar = next(iter(refs))
    assert sidecar.endswith(SIDECAR_SUFFIX) and os.path.exists(sidecar)
    assert all(len(json.dumps(e.stats[BLOOM_STAT])) < 200 for e in entries)
    t.commit("append", added=entries, lsn=1)

    # cold probe: fresh handle, cleared cache -> blooms resolve from disk
    _sidecar_cache.clear()
    t2 = load_table(str(tmp_path / "sc"))
    e0 = t2.data_entries()[0]
    present = spark.read.parquet(e0.path).select(
        F.xxhash64("image_id").alias("h")
    ).limit(1).collect()[0]["h"]
    assert bloom_may_contain_any(e0, np.array([present], dtype=np.int64).view(np.uint64))
    absent = np.array([-1], dtype=np.int64).view(np.uint64)
    assert not bloom_may_contain_any(e0, absent)
    # a deleted sidecar degrades to "may contain" (optimization, never a filter)
    _sidecar_cache.clear()
    os.remove(sidecar)
    assert bloom_may_contain_any(e0, absent)


def test_distributed_bloom_probe_matches_driver(spark, tmp_path, monkeypatch):
    """prune_by_bloom_distributed == prune_by_bloom for every key-set shape:
    hits in specific files, no hits anywhere, and entries with no bloom at
    all (always kept). Forced onto the Spark path via DISTRIBUTED_PROBE_MIN."""
    import moonlink_spark.table.bloom as bloom_mod
    from moonlink_spark.datagen import generate_images
    from moonlink_spark.table.bloom import prune_by_bloom, prune_by_bloom_distributed
    from moonlink_spark.table.format import DATA, FileEntry
    from moonlink_spark.table.writer import BUCKETS_PROP, write_bucketed_data_files

    t = create_table(
        str(tmp_path / "dblm"), IMAGES_SCHEMA, properties={BUCKETS_PROP: "4"}
    )
    entries = write_bucketed_data_files(
        spark, generate_images(spark, 1200, partitions=4), t.new_data_dir(),
        "image_id", 4, max_records_per_file=60,
    )
    assert len(entries) >= 16
    no_bloom = FileEntry(
        content=DATA, path="/nowhere.parquet", record_count=1,
        file_size_bytes=1, sequence_number=1, stats={},
    )
    entries = entries + [no_bloom]
    monkeypatch.setattr(bloom_mod, "DISTRIBUTED_PROBE_MIN", 1)

    present = np.array(
        [r["h"] for r in spark.read.parquet(entries[0].path, entries[3].path)
         .select(F.xxhash64("image_id").alias("h")).limit(5).collect()],
        dtype=np.int64,
    )
    for hashes in (present, np.array([-1, -2, -3], dtype=np.int64)):
        want = {e.path for e in prune_by_bloom(entries, hashes)}
        got = {e.path for e in prune_by_bloom_distributed(spark, entries, hashes)}
        assert got == want
        assert no_bloom.path in got  # bloom-less entries always survive
    assert prune_by_bloom_distributed(spark, entries, np.array([], dtype=np.int64)) == []


def test_register_view_sql(spark, table):
    from moonlink_spark.table.scan import register_view

    gen = CdcScheduleGenerator(seed=44)
    ref = ReferenceTable()
    b = gen.next_batch(60, 0, 0)
    ref.apply(b)
    merge_cdc_batch(spark, table, to_spark(spark, b), gen.commit_lsn)
    first_lsn = gen.commit_lsn
    register_view(spark, table, "imgs_v")
    n = spark.sql("SELECT count(*) AS n FROM imgs_v").collect()[0]["n"]
    assert n == 60
    # the view pins its snapshot: a later commit is invisible until
    # re-registration; an lsn-pinned view reads history
    b2 = gen.next_batch(0, 0, 10)
    ref.apply(b2)
    merge_cdc_batch(spark, table, to_spark(spark, b2), gen.commit_lsn)
    assert spark.sql("SELECT count(*) FROM imgs_v").collect()[0][0] == 60
    register_view(spark, table.refresh(), "imgs_v")
    assert spark.sql("SELECT count(*) FROM imgs_v").collect()[0][0] == 50
    register_view(spark, table, "imgs_v1", lsn=first_lsn)
    assert spark.sql("SELECT count(*) FROM imgs_v1").collect()[0][0] == 60
