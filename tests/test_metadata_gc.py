"""Old metadata-version GC (Iceberg's write.metadata.previous-versions-max).

Every commit writes a full v{N}.metadata.json root; without cleanup a table
with 10^6 commits holds 10^6 root files. Readers only ever resolve the
CURRENT version (version-hint + forward probe) and time-travel uses the
current metadata's snapshot list, so old roots are pure garbage.
"""

import uuid

from moonlink_spark.operators.expire import (
    clean_metadata_versions,
    expire_snapshots,
)
from moonlink_spark.table.catalog import (
    _metadata_path,
    create_table,
    load_table,
)
from moonlink_spark.table.io import accessor_for

from tests.test_object_store import SCHEMA, _entry


def _loc():
    return f"mem://bkt-{uuid.uuid4().hex[:8]}/tbl"


def _versions_present(t):
    acc = accessor_for(t.location)
    return [
        v
        for v in range(t.md.version + 1)
        if acc.exists(_metadata_path(t.location, v))
    ]


def test_clean_metadata_versions_keeps_recent_and_stops_early(tmp_path):
    loc = _loc()
    t = create_table(loc, SCHEMA)
    for i in range(30):
        t.commit("append", added=[_entry(f"e{i}")])
    assert len(_versions_present(t)) == t.md.version + 1

    n = clean_metadata_versions(t, keep_last=5)
    vs = _versions_present(t)
    assert vs == list(range(t.md.version - 4, t.md.version + 1))
    assert n == t.md.version - 4  # versions 0 .. current-5

    # table still loads and its current state is intact
    t2 = load_table(loc)
    assert t2.md.version == t.md.version
    assert len(t2.data_entries()) == 30

    # second cleanup after a few more commits only touches the new garbage
    for i in range(3):
        t.commit("append", added=[_entry(f"late{i}")])
    n2 = clean_metadata_versions(t, keep_last=5)
    assert n2 == 3


def test_expire_runs_metadata_cleanup_by_property(tmp_path):
    loc = _loc()
    t = create_table(loc, SCHEMA)
    t.commit(
        "set-props", properties={"moonlink.metadata.previous-versions-max": "4"}
    )
    for i in range(12):
        t.commit("append", added=[_entry(f"e{i}")])
    res = expire_snapshots(t, retain_last=2)
    assert res.deleted_metadata_versions > 0
    vs = _versions_present(t)
    assert min(vs) == t.md.version - 3  # keep_last=4 incl. current
    # retained snapshots still readable after the cleanup
    t2 = load_table(loc)
    assert len(t2.md.snapshots) == 2
    assert len(t2.data_entries()) == 12
