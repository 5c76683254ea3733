"""Clustering keeps the per-key index alive: cluster outputs carry key-bloom
sidecars (order-independent, unlike bucket ids), so narrow MERGE batches
still prune files on a freshly clustered table; dangling equality-delete
files are dropped by the same commit."""

from moonlink_spark.cdc import CdcScheduleGenerator, ReferenceTable, to_spark
from moonlink_spark.operators.cluster import cluster
from moonlink_spark.operators.merge import merge_cdc_batch
from moonlink_spark.schema import IMAGES_SCHEMA
from moonlink_spark.table.bloom import BLOOM_STAT
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.format import EQ_DELETES
from moonlink_spark.table.scan import scan
from moonlink_spark.table.writer import BUCKETS_PROP


def test_cluster_attaches_blooms_and_drops_eq_deletes(spark, tmp_path):
    t = create_table(
        str(tmp_path / "t"), IMAGES_SCHEMA, properties={BUCKETS_PROP: "4"}
    )
    gen = CdcScheduleGenerator(seed=41)
    ref = ReferenceTable()
    b = gen.next_batch(150, 0, 0)
    ref.apply(b)
    merge_cdc_batch(spark, t, to_spark(spark, b), gen.commit_lsn)
    b = gen.next_batch(10, 30, 20)
    ref.apply(b)
    merge_cdc_batch(spark, t, to_spark(spark, b), gen.commit_lsn, mode="lazy")
    assert t.entries(content=EQ_DELETES)

    cluster(spark, t, cols=("phash", "w", "h"), strategy="zorder")
    t.refresh()
    # eq files folded by the full rewrite, gone from the live snapshot
    assert not t.entries(content=EQ_DELETES)
    entries = t.data_entries()
    assert entries and all(BLOOM_STAT in e.stats for e in entries)
    assert all(e.bucket is None for e in entries)  # SFC order, not hash order

    # content still equals the reference
    got = dict(
        scan(spark, t, columns=["image_id", "caption"])
        .toPandas()
        .itertuples(index=False, name=None)
    )
    exp = ref.to_pandas()
    assert got == dict(zip(exp["image_id"], exp["caption"]))

    # a narrow MERGE on the clustered table prunes via blooms alone
    b = gen.next_batch(2, 3, 2)
    ref.apply(b)
    res = merge_cdc_batch(spark, t, to_spark(spark, b), gen.commit_lsn)
    m = res.metrics
    assert m["pruned_candidates"] <= m["bloom_pruned_from"]
    exp = ref.to_pandas()
    got = dict(
        scan(spark, t.refresh(), columns=["image_id", "caption"])
        .toPandas()
        .itertuples(index=False, name=None)
    )
    assert got == dict(zip(exp["image_id"], exp["caption"]))
