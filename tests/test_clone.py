"""Zero-copy table clone (operators/clone.py) — shallow clone semantics.

Oracle: clone content == source content at fork time; full history works on
the clone (time travel, changelog); commits on either side are invisible to
the other; the clone's GC never touches shared source files.
"""

import os

import pandas as pd
import pytest

from moonlink_spark.cdc import CdcScheduleGenerator, to_spark
from moonlink_spark.operators.clone import clone_table
from moonlink_spark.operators.expire import expire_snapshots
from moonlink_spark.operators.maintenance import optimize_table
from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import create_table, load_table
from moonlink_spark.table.scan import scan, scan_at_lsn

_COLS = ["image_id", "caption", "phash"]


def _content(spark, t):
    pdf = scan(spark, t.refresh(), columns=_COLS).toPandas()
    return pdf.sort_values("image_id").reset_index(drop=True)


@pytest.fixture()
def src(spark, tmp_path):
    t = create_table(str(tmp_path / "src"), IMAGES_SCHEMA)
    gen = CdcScheduleGenerator(seed=31)
    lsns = []
    for sizes in [(70, 0, 0), (10, 20, 10)]:
        merge_cdc_batch(spark, t, to_spark(spark, gen.next_batch(*sizes)), gen.commit_lsn)
        lsns.append(gen.commit_lsn)
    return t, gen, lsns


def test_clone_content_and_history(spark, src, tmp_path):
    t, gen, lsns = src
    c = clone_table(t, str(tmp_path / "clone"))
    assert c.flush_lsn == t.flush_lsn
    pd.testing.assert_frame_equal(_content(spark, t), _content(spark, c), check_dtype=False)
    # full history forked: time travel works on the clone
    pd.testing.assert_frame_equal(
        scan_at_lsn(spark, c, lsn=lsns[0]).select(*_COLS).toPandas().sort_values("image_id").reset_index(drop=True),
        scan_at_lsn(spark, t, lsn=lsns[0]).select(*_COLS).toPandas().sort_values("image_id").reset_index(drop=True),
        check_dtype=False,
    )
    # the clone's metadata is self-contained (fresh handle from disk) and
    # its manifests live under ITS root while data files are shared
    c2 = load_table(str(tmp_path / "clone"))
    assert {e.path for e in c2.data_entries()} == {e.path for e in t.data_entries()}
    for s in c2.md.snapshots:
        for m in s.manifests:
            assert m.startswith(c2.location)


def test_clone_independence(spark, src, tmp_path):
    t, gen, lsns = src
    c = clone_table(t, str(tmp_path / "clone"))
    before_src = _content(spark, t)
    # commit on the clone: invisible to the source; new files under clone root
    b = gen.next_batch(5, 10, 5)
    merge_cdc_batch(spark, c, to_spark(spark, b), gen.commit_lsn)
    pd.testing.assert_frame_equal(_content(spark, t), before_src, check_dtype=False)
    new_files = {e.path for e in c.refresh().data_entries()} - {
        e.path for e in t.data_entries()
    }
    assert new_files and all(p.startswith(c.location) for p in new_files)
    # commit on the source: invisible to the clone
    after_clone = _content(spark, c)
    b2 = gen.next_batch(4, 0, 0)
    merge_cdc_batch(spark, t, to_spark(spark, b2), gen.commit_lsn)
    pd.testing.assert_frame_equal(_content(spark, c), after_clone, check_dtype=False)


def test_clone_gc_never_touches_shared_files(spark, src, tmp_path):
    t, gen, lsns = src
    c = clone_table(t, str(tmp_path / "clone"))
    src_files = {e.path for e in t.data_entries()}
    # maintenance on the clone rewrites content into its OWN root, shedding
    # the shared files from its manifests...
    optimize_table(spark, c, mode="full", retain_last=1)
    expire_snapshots(c, retain_last=1)
    kept = {e.path for e in c.refresh().data_entries()}
    assert not (kept & src_files)
    # ...and every shared source file must still exist on disk (ownership
    # guard: the clone expired snapshots referencing them but does not own
    # them), so the source reads intact
    assert all(os.path.exists(p) for p in src_files)
    assert len(_content(spark, t)) == len(_content(spark, c))
    pd.testing.assert_frame_equal(_content(spark, t), _content(spark, c), check_dtype=False)


def test_clone_on_object_store(spark, tmp_path):
    """Clone a table whose METADATA lives on the mem:// object store while
    data stays Spark-readable (split roots) — proves the clone path is
    accessor-clean (manifest/snapshot copies ride the accessor, never
    local-fs assumptions)."""
    import uuid as _uuid

    from moonlink_spark import clone_table as clone_fn

    src = create_table(
        f"mem://bkt-{_uuid.uuid4().hex[:8]}/src",
        IMAGES_SCHEMA,
        data_location=str(tmp_path / "srcdata"),
    )
    gen = CdcScheduleGenerator(seed=77)
    merge_cdc_batch(spark, src, to_spark(spark, gen.next_batch(40, 0, 0)), gen.commit_lsn)
    c = clone_fn(
        src,
        f"mem://bkt-{_uuid.uuid4().hex[:8]}/clone",
        data_location=str(tmp_path / "clonedata"),
    )
    pd.testing.assert_frame_equal(
        _content(spark, src), _content(spark, c), check_dtype=False
    )
    merge_cdc_batch(spark, c, to_spark(spark, gen.next_batch(5, 0, 0)), gen.commit_lsn)
    assert len(_content(spark, c)) == 45 and len(_content(spark, src)) == 40
