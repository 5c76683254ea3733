"""CLI (`python -m moonlink_spark`) — the service-binary analog, driven
in-process through main(argv)."""

from __future__ import annotations

import json

import pytest

from moonlink_spark.__main__ import main
from moonlink_spark.cdc import CdcScheduleGenerator, to_spark


@pytest.fixture
def run(capsys, spark, monkeypatch):
    # main() builds its own session via get_spark, which returns the active
    # one in tests; --cores is then ignored by getOrCreate reuse.
    def _run(*argv):
        rc = main([*map(str, argv)])
        out = capsys.readouterr().out.strip()
        return rc, out

    return _run


def test_catalog_roundtrip(run, tmp_path):
    cat = str(tmp_path / "cat")
    rc, out = run("create", "prod.imgs", "--catalog", cat,
                  "--property", "moonlink.merge.mode=lazy")
    assert rc == 0 and json.loads(out)["created"] == "prod.imgs"
    rc, out = run("tables", "--catalog", cat)
    assert json.loads(out) == {"prod": ["imgs"]}

    loc = str(tmp_path / "cat" / "prod" / "imgs")

    # ingest a CDC parquet batch through the CLI
    gen = CdcScheduleGenerator(seed=5)
    batch = to_spark(None or _spark_of(run), gen.next_batch(40, 0, 0))
    bpath = str(tmp_path / "batch.parquet")
    batch.write.parquet(bpath)
    rc, out = run("ingest", loc, bpath, "--lsn", gen.commit_lsn)
    assert rc == 0 and json.loads(out)["skipped"] is False

    rc, out = run("scan", loc, "--columns", "image_id,caption", "--limit", "5")
    rows = [json.loads(l) for l in out.splitlines()]
    assert len(rows) == 5 and set(rows[0]) == {"image_id", "caption"}

    rc, out = run("optimize", loc, "--mode", "auto")
    assert json.loads(out)["auto"] is True

    rc, out = run("orphans", loc)
    assert json.loads(out)["dry_run"] is True

    rc, out = run("drop", "prod.imgs", "--catalog", cat, "--purge")
    assert json.loads(out)["dropped"] == "prod.imgs"
    rc, out = run("tables", "--catalog", cat)
    assert json.loads(out) == {"prod": []}


def _spark_of(run):
    from pyspark.sql import SparkSession

    return SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()


def test_recover_cmd(run, tmp_path):
    from moonlink_spark.metadata_store import MetadataStore, TableMetadataEntry
    from moonlink_spark.schema import IMAGES_SCHEMA
    from moonlink_spark.table.catalog import create_table

    t = create_table(str(tmp_path / "t"), IMAGES_SCHEMA)
    db = str(tmp_path / "meta.db")
    MetadataStore(db).store_table_metadata(
        TableMetadataEntry("prod", "t", t.md.location)
    )
    rc, out = run("recover", "--store", db)
    rec = json.loads(out)
    assert rc == 0 and rec[0]["table"] == "prod.t" and rec[0]["error"] is None
