"""Named refs (tags/branches) + write-audit-publish (table/refs.py).

Iceberg's refs surface over this catalog: tags pin snapshots (expiry
protection + time travel by name); branches take the WHOLE operator stack
through a Table view (reads resolve the branch head, commits advance the
ref) without moving main; fast_forward is the O(1) publish. The reference
analog is moonlink's LSN-gated visibility (readers see only committed LSNs,
mooncake_table.rs:407-412) — staged-until-published for batch maintenance.
"""

import pandas as pd
import pytest

from moonlink_spark.cdc import CdcScheduleGenerator, to_spark
from moonlink_spark.operators.expire import expire_snapshots
from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import create_table, load_table
from moonlink_spark.table.refs import (
    create_branch,
    create_tag,
    drop_ref,
    fast_forward,
    list_refs,
    resolve_ref,
)
from moonlink_spark.table.scan import scan

_COLS = ["image_id", "caption", "phash"]


def _content(spark, t, **kw):
    pdf = scan(spark, t.refresh(), columns=_COLS, **kw).toPandas()
    return pdf.sort_values("image_id").reset_index(drop=True)


@pytest.fixture()
def tbl(spark, tmp_path):
    t = create_table(str(tmp_path / "t"), IMAGES_SCHEMA)
    gen = CdcScheduleGenerator(seed=23)
    for sizes in [(60, 0, 0), (8, 20, 6)]:
        b = gen.next_batch(*sizes)
        merge_cdc_batch(spark, t, to_spark(spark, b), gen.commit_lsn)
    return t, gen


def test_tag_pins_state_and_survives_expiry(spark, tbl):
    t, gen = tbl
    before = _content(spark, t)
    create_tag(t, "audited-v1")
    # two more commits, then expire everything but the last
    for sizes in [(5, 10, 3), (4, 9, 2)]:
        b = gen.next_batch(*sizes)
        merge_cdc_batch(spark, t, to_spark(spark, b), gen.commit_lsn)
    after = _content(spark, t)
    res = expire_snapshots(t, retain_last=1)
    assert res.expired_snapshots > 0
    # the tagged snapshot is a retention root: reads at the tag are
    # byte-identical to the pre-tag state
    pd.testing.assert_frame_equal(_content(spark, t, ref="audited-v1"), before)
    pd.testing.assert_frame_equal(_content(spark, t), after)
    # dropping the tag releases it; the next expiry GCs the snapshot
    drop_ref(t, "audited-v1")
    res2 = expire_snapshots(t, retain_last=1)
    assert res2.expired_snapshots == 1
    with pytest.raises(KeyError):
        resolve_ref(t.refresh(), "audited-v1")


def test_tag_max_age_expires_ref(spark, tbl):
    t, gen = tbl
    create_tag(t, "ephemeral", max_ref_age_ms=0)  # already past its age
    b = gen.next_batch(3, 5, 1)
    merge_cdc_batch(spark, t, to_spark(spark, b), gen.commit_lsn)
    expire_snapshots(t, retain_last=1)
    assert "ephemeral" not in list_refs(t)


def test_branch_merge_is_invisible_until_publish(spark, tbl):
    t, gen = tbl
    main_before = _content(spark, t)
    main_lsn = t.flush_lsn
    create_branch(t, "audit")
    bt = t.for_branch("audit")
    b = gen.next_batch(10, 15, 5)
    res = merge_cdc_batch(spark, bt, to_spark(spark, b), gen.commit_lsn)
    assert not res.skipped and res.snapshot is not None
    staged = _content(spark, bt)
    assert not staged.equals(main_before)
    # main untouched: content, pointer, flush LSN
    t.refresh()
    pd.testing.assert_frame_equal(_content(spark, t), main_before)
    assert t.flush_lsn == main_lsn
    assert resolve_ref(t, "main") != resolve_ref(t, "audit")
    # a branch view read through ref= matches the branch handle
    pd.testing.assert_frame_equal(_content(spark, t, ref="audit"), staged)
    # publish: main adopts the branch head and its LSN, O(1) metadata
    fast_forward(t, "audit", drop=True)
    pd.testing.assert_frame_equal(_content(spark, t), staged)
    assert t.flush_lsn == gen.commit_lsn
    assert "audit" not in list_refs(t)


def test_branch_merge_idempotent_at_branch_lsn(spark, tbl):
    t, gen = tbl
    create_branch(t, "audit")
    bt = t.for_branch("audit")
    b = gen.next_batch(4, 6, 2)
    merge_cdc_batch(spark, bt, to_spark(spark, b), gen.commit_lsn)
    # replaying the same batch against the branch is a no-op (the branch
    # head's summary LSN is the branch's flush cursor)
    res2 = merge_cdc_batch(spark, bt.refresh(), to_spark(spark, b), gen.commit_lsn)
    assert res2.skipped


def test_fast_forward_requires_ancestry(spark, tbl):
    t, gen = tbl
    create_branch(t, "audit")
    bt = t.for_branch("audit")
    b1 = gen.next_batch(4, 6, 2)
    merge_cdc_batch(spark, bt, to_spark(spark, b1), gen.commit_lsn)
    # main moves independently -> branch head no longer descends from main
    b2 = gen.next_batch(3, 5, 1)
    merge_cdc_batch(spark, t.refresh(), to_spark(spark, b2), gen.commit_lsn)
    with pytest.raises(ValueError, match="fast-forward"):
        fast_forward(t, "audit")


def test_tag_is_read_only_and_main_reserved(spark, tbl):
    t, _ = tbl
    create_tag(t, "pin")
    with pytest.raises(ValueError, match="tag"):
        t.for_branch("pin")
    with pytest.raises(ValueError, match="main"):
        create_tag(t, "main")
    with pytest.raises(ValueError, match="exists"):
        create_tag(t, "pin")


def test_refs_survive_reload_and_inspect(spark, tbl):
    t, _ = tbl
    create_tag(t, "v1")
    create_branch(t, "wip")
    t2 = load_table(t.location)
    assert set(list_refs(t2)) == {"v1", "wip"}
    from moonlink_spark.table.inspect import refs as inspect_refs

    pdf = inspect_refs(spark, t2).toPandas().set_index("name")
    assert pdf.loc["v1", "type"] == "tag"
    assert pdf.loc["wip", "type"] == "branch"
    assert pdf.loc["main", "snapshot_id"] == t2.md.current_snapshot().snapshot_id
