"""Deduplication operators for training-data pipelines.

Spark-first designs, all shuffle-conscious:

- exact: hash-groupBy on a normalized fingerprint (one shuffle).
- MinHash + LSH: shingle → k minhashes (one pandas-UDF pass) → band buckets
  → candidate pairs via a self-join ON THE BAND KEY (never all-pairs) →
  exact-jaccard verification of candidates only. At 100 TB the band join is
  the only shuffle and its keys are uniformly distributed by construction.
- SimHash: 64-bit hyperplane-free simhash from token hashes (pandas UDF,
  numpy bit ops); near-dups = identical simhash band keys.
- n-gram Jaccard: exact pairwise similarity via shingle explode + join on
  shingle + group-by-pair — SQL-expressible (the DuckDB oracle runs the same
  algebra). A frequent-shingle cap bounds join fan-out (skew guard).
- embedding cosine near-dup: see similarity.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from moonlink_spark.functions.text import normalize_text

_MERSENNE = (1 << 61) - 1


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of exact duplicates (normalized text) with member ids."""
    return (
        df.select(F.col(id_col), normalize_text(F.col(text_col)).alias("__norm"))
        .groupBy("__norm")
        .agg(F.count("*").alias("n"), F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.col("n") > 1)
        .select(F.col("ids")[0].alias("keep_id"), "n", "ids")
    )


def word_shingles(text_col, n: int = 3):
    """Word n-gram shingle array (built-in functions only)."""
    toks = F.split(F.trim(F.lower(text_col)), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig: array<long>) — one Arrow-batched pass; numpy per batch.

    NOTE: uses a deterministic string hash via xxhash64 on the Spark side to
    stay seed-stable across Python processes.
    """
    shingled = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    # deterministic 63-bit shingle hashes JVM-side, then numpy minhash
    hashed = shingled.select(
        "id",
        F.transform(
            F.col("sh"), lambda s: F.abs(F.xxhash64(s))
        ).alias("shingles"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rng = np.random.default_rng(seed)
        a = rng.integers(1, 2**31, size=num_hashes, dtype=np.int64)
        b = rng.integers(0, 2**31, size=num_hashes, dtype=np.int64)
        for pdf in batches:
            sigs = []
            for hs in pdf["shingles"]:
                if hs is None or len(hs) == 0:
                    sigs.append([0] * num_hashes)
                    continue
                arr = np.asarray(hs, dtype=np.uint64) % np.uint64(_MERSENNE)
                # (num_hashes, n_shingles) without python loops
                m = (
                    a[:, None].astype(np.uint64) * arr[None, :] + b[:, None].astype(np.uint64)
                ) % np.uint64(_MERSENNE)
                sigs.append(m.min(axis=1).astype(np.int64).tolist())
            yield pd.DataFrame({"id": pdf["id"], "sig": sigs})

    return hashed.mapInPandas(run, schema="id long, sig array<long>")


def lsh_candidate_pairs(
    sig_df: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Band the signatures; pairs sharing any band bucket are candidates.
    Self-join is on (band, bucket-hash) — uniform keys, bounded fan-out."""
    banded = sig_df.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


def exact_jaccard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    min_jaccard: float = 0.0,
    max_shingle_freq: int = 10_000,
) -> DataFrame:
    """Exact pairwise word-shingle Jaccard via explode + shingle join.
    ``max_shingle_freq`` drops degenerate shingles shared by huge numbers of
    docs (skew/fan-out guard; logged as a coverage cap by callers)."""
    sh = (
        df.select(
            F.col(id_col).alias("id"), word_shingles(F.col(text_col), shingle_n).alias("sh")
        )
        .select("id", F.explode(F.array_distinct("sh")).alias("s"))
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    freq = sh.groupBy("s").agg(F.count("*").alias("f"))
    sh2 = sh.join(freq.filter(F.col("f") <= max_shingle_freq), "s", "left_semi")
    inter = (
        sh2.alias("a")
        .join(sh2.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64
) -> DataFrame:
    """64-bit SimHash from token xxhash64 values (numpy bit-count per batch)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: F.xxhash64(t)
        ).alias("th"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for hs in pdf["th"]:
                if hs is None or len(hs) == 0:
                    out.append(0)
                    continue
                arr = np.asarray(hs, dtype=np.uint64)
                cols = ((arr[:, None] >> np.arange(bits, dtype=np.uint64)) & np.uint64(1))
                votes = cols.sum(axis=0) * 2 - len(arr)  # +1/-1 votes
                sim = np.uint64(0)
                for b in np.nonzero(votes > 0)[0]:
                    sim |= np.uint64(1) << np.uint64(b)
                out.append(int(sim.astype(np.int64)))
            yield pd.DataFrame({"id": pdf["id"], "simhash": out})

    return toks.mapInPandas(run, schema="id long, simhash long")


def simhash_near_dups(sim_df: DataFrame, band_bits: int = 16) -> DataFrame:
    """Near-dup candidates: docs sharing any of the 64/band_bits simhash
    bands (Hamming-distance LSH)."""
    nbands = 64 // band_bits
    banded = sim_df.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), i * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("key"),
                    )
                    for i in range(nbands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.key")
    return (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
