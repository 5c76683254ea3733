"""Python DataSource: spark.read / spark.readStream format('moonlink')."""

import pytest
from pyspark.sql import functions as F

from moonlink_spark.datasource import register
from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.scan import scan, scan_at_lsn
from moonlink_spark.table.writer import BUCKETS_PROP, write_bucketed_data_files

COLS = ["image_id", "caption", "phash", "w"]


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
    """Upserts for ids [lo,hi), deletes for [dlo,dhi)."""
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


@pytest.fixture()
def dstable(spark, tmp_path):
    """Bucketed table: append 600 rows, one MERGE (updates 100-150,
    deletes 300-350) => live DVs in the current snapshot."""
    register(spark)
    t = create_table(str(tmp_path / "ds"), IMAGES_SCHEMA,
                     properties={BUCKETS_PROP: "4"})
    entries = write_bucketed_data_files(
        spark, _rows(spark, 600), t.new_data_dir(), "image_id", 4
    )
    t.commit("append", added=entries, lsn=1)
    merge_cdc_batch(spark, t, _cdc(spark, 600, 100, 150, 300, 350, "upd"), lsn=2)
    return t


def _pdf(df):
    return (
        df.select(*COLS).toPandas().sort_values("image_id").reset_index(drop=True)
    )


def test_batch_read_matches_scan(spark, dstable):
    got = _pdf(spark.read.format("moonlink").load(dstable.location))
    exp = _pdf(scan(spark, dstable))
    assert len(exp) == 550  # 600 - 50 deleted
    assert got.equals(exp)


def test_batch_read_time_travel(spark, dstable):
    got = _pdf(
        spark.read.format("moonlink").option("lsn", "1").load(dstable.location)
    )
    exp = _pdf(scan_at_lsn(spark, dstable, 1))
    assert len(exp) == 600
    assert got.equals(exp)


def test_batch_read_applies_eq_deletes(spark, tmp_path):
    register(spark)
    t = create_table(str(tmp_path / "eq"), IMAGES_SCHEMA,
                     properties={BUCKETS_PROP: "4"})
    entries = write_bucketed_data_files(
        spark, _rows(spark, 400), t.new_data_dir(), "image_id", 4
    )
    t.commit("append", added=entries, lsn=1)
    merge_cdc_batch(
        spark, t, _cdc(spark, 400, 50, 80, 200, 240, "nv"), lsn=2, mode="lazy"
    )
    got = _pdf(spark.read.format("moonlink").load(t.location))
    exp = _pdf(scan(spark, t))
    # eq keys cover upserts+deletes (70); upserted rows re-land (30)
    assert len(exp) == 400 - 70 + 30
    assert got.equals(exp)


def test_batch_read_evolved_schema(spark, tmp_path):
    from pyspark.sql.types import IntegerType, StructField

    from moonlink_spark.operators.evolve import add_columns, drop_columns

    register(spark)
    t = create_table(str(tmp_path / "ev"), IMAGES_SCHEMA)
    from moonlink_spark.table.writer import write_data_files

    t.commit(
        "append",
        added=write_data_files(
            spark, _rows(spark, 100), t.new_data_dir(),
            field_id_schema=t.schema,
        ),
        lsn=1,
    )
    add_columns(t, [StructField("rating", IntegerType(), True)])
    drop_columns(t, ["fmt"])
    got = (
        spark.read.format("moonlink").load(t.location)
        .toPandas().sort_values("image_id").reset_index(drop=True)
    )
    exp = (
        scan(spark, t).toPandas().sort_values("image_id").reset_index(drop=True)
    )
    assert list(got.columns) == list(exp.columns)
    assert got["rating"].isna().all()
    assert got.equals(exp)


def test_cdc_preimage_columns(spark, dstable):
    """preimageColumns narrows what delete events materialize; 'keys'
    resolves to the identity. Schema unchanged, other columns NULL."""
    ev = (
        spark.read.format("moonlink")
        .option("cdc", "true")
        .option("startingLsn", "1")
        .option("preimageColumns", "keys")
        .load(dstable.location)
        .toPandas()
    )
    dels = ev[ev["_change_type"] == "delete"]
    assert len(dels) == 100
    assert dels["image_id"].notna().all()
    assert dels["caption"].isna().all() and dels["bytes"].isna().all()
    # inserts unaffected
    ins = ev[ev["_change_type"] == "insert"]
    assert ins["caption"].notna().all()

    with pytest.raises(Exception, match="unknown columns"):
        (
            spark.read.format("moonlink")
            .option("cdc", "true")
            .option("preimageColumns", "bogus")
            .load(dstable.location)
            .count()
        )


def test_stream_eq_delete_commits(spark, tmp_path):
    """Lazy-MERGE windows: loud by default, key-only events on opt-in."""
    register(spark)
    t = create_table(str(tmp_path / "eqs"), IMAGES_SCHEMA,
                     properties={BUCKETS_PROP: "4"})
    entries = write_bucketed_data_files(
        spark, _rows(spark, 200), t.new_data_dir(), "image_id", 4
    )
    t.commit("append", added=entries, lsn=1)
    merge_cdc_batch(
        spark, t, _cdc(spark, 200, 10, 20, 100, 130, "nv"), lsn=2, mode="lazy"
    )

    def _run(name, **opts):
        out = str(tmp_path / name)
        r = spark.readStream.format("moonlink").option("cdc", "true")
        for k, v in opts.items():
            r = r.option(k, v)
        q = (
            r.load(t.location)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / (name + "_ck")))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(out).toPandas()

    with pytest.raises(Exception, match="eqDeletes"):
        _run("strict")

    ev = _run("keys", eqDeletes="keys")
    dels = ev[ev["_change_type"] == "delete"]
    assert len(dels) == 40  # 10 upsert keys + 30 delete keys
    assert dels["caption"].isna().all()  # key-only pre-images
    assert dels["image_id"].notna().all()
    assert len(ev[ev["_change_type"] == "insert"]) == 200 + 10


def test_batch_filter_pushdown_prunes_files(spark, tmp_path):
    """Comparison filters prune partitions via manifest stats; results
    unchanged (Spark re-applies every filter)."""
    from moonlink_spark.datasource import MoonlinkBatchReader
    from moonlink_spark.table.writer import write_data_files

    register(spark)
    t = create_table(str(tmp_path / "fp"), IMAGES_SCHEMA)
    entries = write_data_files(
        spark, _rows(spark, 800), t.new_data_dir(),
        num_files=8, range_cols=["image_id"],
    )
    t.commit("append", added=entries, lsn=1)

    # planner-level: bounds shrink the planned FILE list (partitions are
    # bin-packed groups since round 5, so count member files, not splits)
    def _files(parts):
        out = []
        for p in parts:
            out += (
                [m.data_path for m in p.members]
                if p.kind == "data-group"
                else [p.data_path]
            )
        return out

    r = MoonlinkBatchReader({"path": t.location})
    assert len(_files(r.partitions())) == 8
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    returned = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("image_id",), "id00100"),
                LessThan(("image_id",), "id00200"),
            ]
        )
    )
    assert len(returned) == 2  # everything handed back to Spark
    pruned = _files(r.partitions())
    assert 0 < len(pruned) < 8

    # end-to-end: same rows as the engine scan with the same predicate
    df = (
        spark.read.format("moonlink")
        .load(t.location)
        .filter((F.col("image_id") >= "id00100") & (F.col("image_id") < "id00200"))
    )
    assert df.count() == 100
    exp = _pdf(
        scan(spark, t).filter(
            (F.col("image_id") >= "id00100") & (F.col("image_id") < "id00200")
        )
    )
    assert _pdf(df).equals(exp)


def test_batch_filter_with_deletes_stays_correct(spark, dstable):
    """Bounds + live DVs: positions must stay aligned (full read path)."""
    pred = (F.col("image_id") >= "id00250") & (F.col("image_id") < "id00400")
    got = _pdf(spark.read.format("moonlink").load(dstable.location).filter(pred))
    exp = _pdf(scan(spark, dstable).filter(pred))
    assert len(exp) == 100  # 150 in range minus 50 deleted (300-350)
    assert got.equals(exp)


def test_batch_write_append(spark, tmp_path):
    register(spark)
    t = create_table(str(tmp_path / "w"), IMAGES_SCHEMA)
    _rows(spark, 300).write.format("moonlink").mode("append").save(t.location)
    t.refresh()
    assert t.flush_lsn == 1
    got = _pdf(scan(spark, t))
    assert len(got) == 300
    # field ids stamped: files take the id-resolved branch
    from moonlink_spark.table.fieldids import NO_FIELD_IDS_STAT

    assert all(NO_FIELD_IDS_STAT not in e.stats for e in t.data_entries())
    # round-trip through the read side too
    assert _pdf(spark.read.format("moonlink").load(t.location)).equals(got)

    with pytest.raises(Exception, match="append"):
        _rows(spark, 10).write.format("moonlink").mode("overwrite").save(
            t.location
        )


def test_stream_write_exactly_once(spark, tmp_path):
    register(spark)
    t = create_table(str(tmp_path / "sw"), IMAGES_SCHEMA)
    src = str(tmp_path / "src")
    _rows(spark, 100, "s1").write.parquet(src)

    def _run():
        q = (
            spark.readStream.schema(_rows(spark, 1).schema)
            .parquet(src)
            .writeStream.format("moonlink")
            .option("path", t.location)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    _run()
    assert scan(spark, t.refresh()).count() == 100
    # no new files => re-run commits nothing (and no replay duplicates)
    _run()
    assert scan(spark, t.refresh()).count() == 100
    # second source file arrives => exactly its rows land
    _rows(spark, 40, "s2").withColumn(
        "image_id", F.concat(F.lit("x"), F.col("image_id"))
    ).write.mode("append").parquet(src)
    _run()
    assert scan(spark, t.refresh()).count() == 140


def test_batch_read_columns_projection(spark, dstable, tmp_path):
    """Explicit .option('columns') keeps the image payload off the Arrow
    transport; results match a projected engine scan incl. DV application
    and, on a lazy table, the eq anti-join reading keys internally."""
    got = (
        spark.read.format("moonlink")
        .option("columns", "image_id,caption,phash,w")
        .load(dstable.location)
    )
    assert [f.name for f in got.schema.fields] == COLS[:2] + ["phash", "w"]
    g = _pdf(got)
    assert len(g) == 550
    assert g.equals(_pdf(scan(spark, dstable)))

    # projection EXCLUDING the identity key on a lazy (eq-delete) table
    t = create_table(str(tmp_path / "eqp"), IMAGES_SCHEMA,
                     properties={BUCKETS_PROP: "4"})
    entries = write_bucketed_data_files(
        spark, _rows(spark, 200), t.new_data_dir(), "image_id", 4
    )
    t.commit("append", added=entries, lsn=1)
    merge_cdc_batch(
        spark, t, _cdc(spark, 200, 10, 20, 100, 130, "nv"), lsn=2, mode="lazy"
    )
    proj = (
        spark.read.format("moonlink")
        .option("columns", "caption,w")
        .load(t.location)
        .toPandas()
        .sort_values(["caption", "w"])
        .reset_index(drop=True)
    )
    exp = (
        scan(spark, t)
        .select("caption", "w")
        .toPandas()
        .sort_values(["caption", "w"])
        .reset_index(drop=True)
    )
    assert proj.equals(exp)

    with pytest.raises(Exception, match="unknown columns"):
        spark.read.format("moonlink").option("columns", "nope").load(
            dstable.location
        ).count()


def test_batch_cdc_window_read(spark, dstable):
    """spark.read with cdc=true returns the (a, b] commit window's events,
    matching scan_changes row for row."""
    from moonlink_spark.table.changelog import scan_changes

    ev = (
        spark.read.format("moonlink")
        .option("cdc", "true")
        .option("startingLsn", "1")
        .load(dstable.location)
        .toPandas()
    )
    assert set(ev["_change_lsn"]) == {2}
    assert len(ev[ev["_change_type"] == "insert"]) == 50
    assert len(ev[ev["_change_type"] == "delete"]) == 100

    exp = scan_changes(spark, dstable, 1, 2).toPandas()
    cols = ["image_id", "_change_type", "_change_lsn"]
    got_s = ev[cols].sort_values(cols).reset_index(drop=True)
    exp_s = (
        exp.rename(columns={})[cols].sort_values(cols).reset_index(drop=True)
    )
    assert got_s.equals(exp_s)

    # full-history window (default start = floor) includes the base load
    all_ev = (
        spark.read.format("moonlink")
        .option("cdc", "true")
        .load(dstable.location)
    )
    assert all_ev.filter("_change_lsn = 1").count() == 600


def test_stream_requires_cdc_option(spark, dstable, tmp_path):
    q = (
        spark.readStream.format("moonlink")
        .load(dstable.location)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck0"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="cdc"):
        q.awaitTermination(120)


def test_stream_cdc_events(spark, dstable, tmp_path):
    out = str(tmp_path / "events")

    def _run():
        q = (
            spark.readStream.format("moonlink")
            .option("cdc", "true")
            .load(dstable.location)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    _run()
    ev = spark.read.parquet(out).toPandas()
    ins1 = ev[(ev["_change_lsn"] == 1) & (ev["_change_type"] == "insert")]
    ins2 = ev[(ev["_change_lsn"] == 2) & (ev["_change_type"] == "insert")]
    del2 = ev[(ev["_change_lsn"] == 2) & (ev["_change_type"] == "delete")]
    assert len(ins1) == 600
    assert len(ins2) == 50  # upserts 100-150
    assert len(del2) == 100  # 50 update pre-images + 50 deletes
    # delete pre-images carry the pre-update payload
    assert set(del2["caption"].str.split(" ").str[0]) == {"a"}

    # incremental restart: a third commit streams alone from the checkpoint
    merge_cdc_batch(
        spark, dstable, _cdc(spark, 600, 0, 10, 580, 590, "v3"), lsn=3
    )
    _run()
    all_ev = spark.read.parquet(out).toPandas()
    ev2 = all_ev[all_ev["_change_lsn"] == 3]
    assert len(all_ev) == len(ev) + len(ev2)  # no replay of lsn<=2
    assert len(ev2[ev2["_change_type"] == "insert"]) == 10
    assert len(ev2[ev2["_change_type"] == "delete"]) == 20


def test_partition_grouping_bounds_split_count(spark, dstable):
    """Small files bin-pack into ~128MB input splits (ADVICE r4 #7): the
    batch read must NOT create one Spark partition per data file, and the
    grouped read must return exactly the ungrouped content."""
    from moonlink_spark.datasource import MoonlinkBatchReader

    t = dstable
    reader = MoonlinkBatchReader({"path": t.location})
    parts = reader.partitions()
    n_files = len(t.data_entries())
    assert n_files > 1
    # all files here are tiny -> they all fit one 128MB split
    assert len(parts) == 1 and parts[0].kind == "data-group"
    assert len(parts[0].members) == n_files

    got = (
        spark.read.format("moonlink").load(t.location)
        .select(*COLS).orderBy("image_id").collect()
    )
    want = scan(spark, t).select(*COLS).orderBy("image_id").collect()
    assert got == want
