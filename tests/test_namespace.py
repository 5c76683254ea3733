"""FileCatalog: namespaces + table directory over accessors (moonlink's
file catalog, file_catalog.rs:372-810), parametrized over local fs and the
mem:// object store."""

from __future__ import annotations

import pytest

from moonlink_spark.cdc import CdcScheduleGenerator, to_spark
from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.namespace import (
    AlreadyExists,
    CatalogError,
    FileCatalog,
    NoSuchNamespace,
    NoSuchTable,
)
from moonlink_spark.table.scan import scan


@pytest.fixture(params=["file", "mem"])
def cat(request, tmp_path):
    if request.param == "file":
        return FileCatalog(str(tmp_path / "cat"))
    import uuid

    return FileCatalog(
        f"mem://nscat{uuid.uuid4().hex[:8]}/cat", data_root=str(tmp_path / "data")
    )


def _fill(spark, t, n=30, seed=9, lsn=None):
    gen = CdcScheduleGenerator(seed=seed)
    merge_cdc_batch(
        spark, t, to_spark(spark, gen.next_batch(n, 0, 0)), lsn or gen.commit_lsn
    )


def test_namespace_lifecycle(cat):
    assert cat.list_namespaces() == []
    cat.create_namespace("prod")
    cat.create_namespace("dev")
    assert cat.list_namespaces() == ["dev", "prod"]
    assert cat.namespace_exists("prod") and not cat.namespace_exists("qa")
    with pytest.raises(AlreadyExists):
        cat.create_namespace("prod")
    cat.drop_namespace("dev")
    assert cat.list_namespaces() == ["prod"]
    with pytest.raises(NoSuchNamespace):
        cat.drop_namespace("dev")
    with pytest.raises(NoSuchNamespace):
        cat.create_table("qa", "t", IMAGES_SCHEMA)


def test_table_lifecycle(spark, cat):
    cat.create_namespace("prod")
    t = cat.create_table("prod", "imgs", IMAGES_SCHEMA)
    _fill(spark, t)
    assert cat.list_tables("prod") == ["imgs"]
    assert cat.table_exists("prod", "imgs")
    with pytest.raises(AlreadyExists):
        cat.create_table("prod", "imgs", IMAGES_SCHEMA)

    # load through the catalog: same content
    t2 = cat.load_table("prod", "imgs")
    assert scan(spark, t2).count() == 30

    # a non-empty namespace refuses to drop
    with pytest.raises(CatalogError, match="not empty"):
        cat.drop_namespace("prod")

    # in-place tables require purge
    with pytest.raises(CatalogError, match="purge"):
        cat.drop_table("prod", "imgs")
    cat.drop_table("prod", "imgs", purge=True)
    assert not cat.table_exists("prod", "imgs")
    with pytest.raises(NoSuchTable):
        cat.load_table("prod", "imgs")
    cat.drop_namespace("prod")  # now empty for real


def test_register_and_drop_pointer(spark, cat, tmp_path):
    from moonlink_spark.table.catalog import create_table, load_table

    ext = create_table(str(tmp_path / "external"), IMAGES_SCHEMA)
    _fill(spark, ext, n=10)
    cat.create_namespace("prod")
    cat.register_table("prod", "adopted", str(tmp_path / "external"))
    assert cat.list_tables("prod") == ["adopted"]
    assert scan(spark, cat.load_table("prod", "adopted")).count() == 10

    # non-purge drop of a REGISTERED table leaves the shared location alive
    cat.drop_table("prod", "adopted")
    assert not cat.table_exists("prod", "adopted")
    assert scan(spark, load_table(str(tmp_path / "external"))).count() == 10


def test_rename_in_place_and_pointer(spark, cat):
    cat.create_namespace("prod")
    cat.create_namespace("qa")
    t = cat.create_table("prod", "imgs", IMAGES_SCHEMA)
    _fill(spark, t, n=12)

    # in-place rename: O(1), bytes never move, old name stops resolving
    cat.rename_table("prod", "imgs", "qa", "imgs2")
    assert not cat.table_exists("prod", "imgs")
    assert cat.list_tables("prod") == []
    assert scan(spark, cat.load_table("qa", "imgs2")).count() == 12
    with pytest.raises(NoSuchTable):
        cat.load_table("prod", "imgs")
    # the retired name cannot be recreated over the surviving storage
    with pytest.raises(CatalogError, match="retired"):
        cat.create_table("prod", "imgs", IMAGES_SCHEMA)
    # and prod cannot be dropped while it still stores imgs2's bytes
    with pytest.raises(CatalogError, match="not empty"):
        cat.drop_namespace("prod")

    # rename of a pointer entry: pointer moves, content identical
    cat.rename_table("qa", "imgs2", "qa", "imgs3")
    assert cat.list_tables("qa") == ["imgs3"]
    assert scan(spark, cat.load_table("qa", "imgs3")).count() == 12

    # the renamed table stays fully writable through its new name (the
    # seed-77 batch upserts 5 existing keys — row count stays 12, the
    # commit LSN proves the write landed through the pointer)
    t3 = cat.load_table("qa", "imgs3")
    _fill(spark, t3, n=5, seed=77, lsn=10_000)
    t3 = cat.load_table("qa", "imgs3")
    assert t3.flush_lsn == 10_000
    assert scan(spark, t3).count() == 12

    # purge-drop through the pointer cleans the original storage too
    cat.drop_table("qa", "imgs3", purge=True)
    assert cat.list_tables("qa") == []
    cat.drop_namespace("qa")
