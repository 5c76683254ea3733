"""dedupe_table: content dedup as a maintenance MERGE commit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from moonlink_spark.operators.dedupe import dedupe_table
from moonlink_spark.schema import IDENTITY_PROP
from moonlink_spark.table.catalog import create_table
from moonlink_spark.table.scan import scan, scan_at_lsn
from moonlink_spark.table.writer import write_data_files

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
    ]
)


def _mk(spark, tmp_path, rows):
    t = create_table(
        str(tmp_path / "docs"), DOCS_SCHEMA, properties={IDENTITY_PROP: "doc_id"}
    )
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    t.commit(
        "append",
        added=write_data_files(spark, df, t.new_data_dir(), field_id_schema=t.schema),
        lsn=1,
    )
    return t


def test_exact_dedupe(spark, tmp_path):
    rows = [
        (1, "The quick brown fox"),
        (2, "the  QUICK   brown fox "),  # normalized dup of 1
        (3, "something else entirely"),
        (4, "The quick brown fox"),      # dup of 1
        (5, "unique five"),
    ]
    t = _mk(spark, tmp_path, rows)
    res = dedupe_table(spark, t, text_col="text", strategy="exact")
    assert res.removed == 2 and not res.skipped
    kept = sorted(r["doc_id"] for r in scan(spark, t).collect())
    assert kept == [1, 3, 5]
    # the dedup is a snapshot like any other: time travel sees the pre state
    assert scan_at_lsn(spark, t, 1).count() == 5
    # replay at the same LSN is a no-op
    res2 = dedupe_table(spark, t, text_col="text", lsn=res.merge.snapshot.summary["lsn"])
    assert res2.skipped
    # a second pass finds nothing new
    res3 = dedupe_table(spark, t, text_col="text")
    assert res3.removed == 0


def test_minhash_dedupe_near_dups(spark, tmp_path):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest near the river bank every morning"
    )
    rows = [
        (1, base),
        (2, base.replace("morning", "evening")),  # near-dup of 1
        (3, "completely different content about spark table maintenance "
            "engines compacting parquet files with deletion vectors daily"),
        (4, base.replace("quick", "swift")),       # near-dup of 1
    ]
    t = _mk(spark, tmp_path, rows)
    res = dedupe_table(
        spark, t, text_col="text", strategy="minhash", min_jaccard=0.5
    )
    kept = sorted(r["doc_id"] for r in scan(spark, t).collect())
    # greedy pairwise: 2 and 4 are the larger ends of verified pairs
    assert kept == [1, 3]
    assert res.removed == 2


def test_dedupe_emits_changelog_deletes(spark, tmp_path):
    from moonlink_spark.table.changelog import scan_changes

    rows = [(1, "same text"), (2, "same text"), (3, "other")]
    t = _mk(spark, tmp_path, rows)
    lsn0 = t.flush_lsn
    dedupe_table(spark, t, text_col="text")
    t.refresh()
    ev = scan_changes(spark, t, from_lsn=lsn0, to_lsn=t.flush_lsn)
    dels = [r["doc_id"] for r in ev.filter(F.col("_change_type") == "delete").collect()]
    assert dels == [2]


def test_dedupe_requires_single_identity(spark, tmp_path):
    t = create_table(
        str(tmp_path / "c"), DOCS_SCHEMA,
        properties={IDENTITY_PROP: "doc_id,text"},
    )
    with pytest.raises(ValueError, match="single identity"):
        dedupe_table(spark, t, text_col="text")


PH_SCHEMA = StructType(
    [
        StructField("img_id", LongType(), False),
        StructField("phash", LongType(), True),
    ]
)


def test_phash_dedupe(spark, tmp_path):
    base = 0x0F0F0F0F0F0F0F
    rows = [
        (1, base),
        (2, base ^ (1 << 3)),          # hamming 1 from 1 -> loser
        (3, base ^ (1 << 10) ^ (1 << 40)),  # hamming 2 -> loser
        (4, base ^ 0x3F),              # hamming 6 -> survives (> max 4)
        (5, 0x123456789ABCD),          # far away -> survives
    ]
    t = create_table(
        str(tmp_path / "imgs"), PH_SCHEMA, properties={IDENTITY_PROP: "img_id"}
    )
    df = spark.createDataFrame(rows, PH_SCHEMA)
    t.commit(
        "append",
        added=write_data_files(spark, df, t.new_data_dir(), field_id_schema=t.schema),
        lsn=1,
    )
    res = dedupe_table(spark, t, text_col="phash", strategy="phash", max_hamming=4)
    assert res.removed == 2
    t.refresh()
    left = sorted(
        r["img_id"] for r in scan(spark, t).select("img_id").collect()
    )
    assert left == [1, 4, 5]
    # time travel still sees the duplicates
    assert scan_at_lsn(spark, t, 1).count() == 5


def test_phash_pairs_completeness_guard(spark):
    from moonlink_spark.functions.dedup import phash_near_dup_pairs

    df = spark.createDataFrame([(1, 2)], "id long, phash long")
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_near_dup_pairs(df, "id", max_hamming=5, band_bits=12, bits=60)


def test_embedding_dedupe(spark, tmp_path):
    from pyspark.sql.types import ArrayType, FloatType

    EMB_SCHEMA = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("emb", ArrayType(FloatType()), True),
        ]
    )
    base = [1.0, 0.5, -0.25, 2.0]
    near = [1.01, 0.5, -0.25, 2.0]      # cosine ~0.99995 -> dup
    far = [-1.0, 2.0, 0.5, -0.25]
    rows = [(1, base), (2, near), (3, far), (4, base)]
    t = create_table(
        str(tmp_path / "emb"), EMB_SCHEMA, properties={IDENTITY_PROP: "vec_id"}
    )
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    t.commit(
        "append",
        added=write_data_files(spark, df, t.new_data_dir(), field_id_schema=t.schema),
        lsn=1,
    )
    res = dedupe_table(spark, t, text_col="emb", strategy="embedding",
                       min_cos=0.99)
    assert res.removed == 2  # ids 2 and 4 lose to 1
    t.refresh()
    left = sorted(r["vec_id"] for r in scan(spark, t).select("vec_id").collect())
    assert left == [1, 3]


def test_phash_pairs_pigeonhole_completeness(spark):
    """Adversarial completeness: pairs at EXACTLY max_hamming with all
    differing bits packed to defeat naive banding — straddling band
    boundaries, inside one band, in the top uncovered bits (60..63) —
    must all be found; one beyond the threshold must not."""
    from moonlink_spark.functions.dedup import phash_near_dup_pairs

    base = 0x0123456789ABCD
    rows = [
        (0, base),
        # 4 diffs straddling the band-0/band-1 boundary (bits 10..13)
        (1, base ^ (0xF << 10)),
        # 4 diffs inside a single band (bits 24..27, band 2)
        (2, base ^ (0xF << 24)),
        # diffs split across the covered/uncovered boundary: 2 in band 4,
        # 2 above bit 60 (uncovered by any band, still counted by verify)
        (3, base ^ (0x3 << 58) ^ (0x3 << 61)),
        # 5 diffs -> beyond max_hamming, must NOT pair with 0
        (4, base ^ 0x1F),
    ]
    df = spark.createDataFrame(rows, "id long, phash long")
    pairs = phash_near_dup_pairs(
        df, "id", max_hamming=4, band_bits=12, bits=60
    ).toPandas()
    with_zero = {
        tuple(sorted((a, b)))
        for a, b in zip(pairs["id_a"], pairs["id_b"])
        if 0 in (a, b)
    }
    assert {(0, 1), (0, 2), (0, 3)} <= with_zero
    assert (0, 4) not in with_zero
    h = {
        tuple(sorted((a, b))): hm
        for a, b, hm in zip(pairs["id_a"], pairs["id_b"], pairs["hamming"])
    }
    assert h[(0, 1)] == 4 and h[(0, 2)] == 4 and h[(0, 3)] == 4
