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


def test_phash_viral_cluster_bounded(spark):
    """Adversarial skew (VERDICT r4 #2): a 10^4-member viral cluster of
    IDENTICAL phash values — the north-rule hot-key case. The collapsed
    band join must finish in bounded time (the uncollapsed join would put
    10^4 rows into the same bucket of every band: 5*10^8 joined rows
    BEFORE the distinct) and the pair output must be exactly the expanded
    cluster: C(c,2) hamming-0 intra pairs plus c cross pairs to the one
    near neighbor, and nothing to the far value."""
    import time

    from moonlink_spark.functions.dedup import phash_near_dup_pairs
    from moonlink_spark.operators.dedupe import phash_duplicate_losers

    c = 10_000
    P = 0x0123456789ABCD
    near = P ^ 0x3          # hamming 2 — pairs with every member
    far = P ^ ((1 << 40) - 1)  # hamming 40 — must not pair
    df = (
        spark.range(c).select(F.col("id"), F.lit(P).alias("phash"))
        .unionByName(
            spark.createDataFrame(
                [(c, near), (c + 1, far)], "id long, phash long"
            )
        )
    )
    t0 = time.monotonic()
    pairs = phash_near_dup_pairs(df, "id", max_hamming=4)
    total = pairs.count()
    by_h = {
        r["hamming"]: r["n"]
        for r in pairs.groupBy("hamming").agg(F.count("*").alias("n")).collect()
    }
    elapsed = time.monotonic() - t0
    intra = c * (c - 1) // 2
    assert by_h.get(0) == intra          # every identical pair, exactly once
    assert by_h.get(2) == c              # each member x the near neighbor
    assert total == intra + c            # nothing else (far value excluded)
    assert elapsed < 240, f"viral cluster took {elapsed:.0f}s"

    # the dedup loser path never expands intra pairs at all: losers are
    # every member but the global min, plus the near neighbor
    t1 = time.monotonic()
    losers = phash_duplicate_losers(df, "id", "phash", max_hamming=4)
    n_losers = losers.count()
    loser_elapsed = time.monotonic() - t1
    assert n_losers == c  # ids 1..c-1 (cluster) + id c (near neighbor)
    assert losers.agg(F.min("id")).collect()[0][0] == 1
    assert loser_elapsed < 60, f"loser path took {loser_elapsed:.0f}s"


def test_minhash_viral_cluster_exact_output(spark):
    """Identical-text viral cluster through the VERIFIED MinHash pipeline:
    collapse on the shingle set must reproduce the exact expanded output —
    every intra pair at jaccard 1.0 — and the loser path must skip the
    expansion entirely."""
    from moonlink_spark.functions.dedup import verified_near_dup_pairs
    from moonlink_spark.operators.dedupe import near_duplicate_losers

    c = 2_000
    viral = "the same caption repeated everywhere on the internet today"
    df = (
        spark.range(c).select(F.col("id").alias("doc_id"), F.lit(viral).alias("text"))
        .unionByName(
            spark.createDataFrame(
                [
                    (c, "a completely different document about gardens"),
                    (c + 1, "the same caption repeated everywhere on the internet right now"),
                ],
                "doc_id long, text string",
            )
        )
    )
    pairs = verified_near_dup_pairs(df, "doc_id", "text", min_jaccard=0.5)
    intra = c * (c - 1) // 2
    stats = pairs.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("jaccard") == 1.0, 1).otherwise(0)).alias("ones"),
    ).collect()[0]
    # all intra pairs at exactly 1.0; the near-text may or may not clear
    # 0.5 via its cross pairs, the garden doc must contribute nothing
    assert stats["ones"] == intra
    cross = pairs.filter(F.col("jaccard") < 1.0)
    assert cross.filter((F.col("id_a") == c) | (F.col("id_b") == c)).count() == 0

    losers = near_duplicate_losers(df, "doc_id", "text", min_jaccard=0.5)
    ids = {r["doc_id"] for r in losers.collect()}
    assert set(range(1, c)) <= ids     # every cluster member but the min
    assert 0 not in ids and c not in ids


def test_embedding_viral_cluster(spark):
    """Identical embeddings (exact-dup images) collapse before the LSH
    bucket self-join; pair output and group-min losers stay exact."""
    from moonlink_spark.functions.similarity import embedding_near_dups

    c = 1_000
    vec = [0.5, -0.25, 0.125, 1.0]
    rows = [(i, vec) for i in range(c)] + [
        (c, [5.0, 1.0, -2.0, 0.25]),          # unrelated direction
        (c + 1, [1.0, -0.5, 0.25, 2.0]),      # same direction as vec (cos 1)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_near_dups(df, dim=4, min_cos=0.999)
    intra = c * (c - 1) // 2
    n = pairs.count()
    # all intra pairs + c cross pairs to the colinear vector; none to the
    # unrelated one (subject to LSH bucketing for CROSS pairs — colinear
    # vectors share every sign bucket, so those c pairs are guaranteed)
    assert n == intra + c
    assert pairs.filter((F.col("id_a") == c) | (F.col("id_b") == c)).count() == 0
