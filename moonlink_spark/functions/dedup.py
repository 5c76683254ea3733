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


def minhash_coeffs(num_hashes: int = 64, seed: int = 42) -> tuple[list[int], list[int]]:
    """The seeded (a, b) permutation coefficients — exposed so an external
    oracle (e.g. the DuckDB contract SQL) can inline the same constants.
    a < 2^30 and shingle hashes < 2^32 keep a*h+b inside int64 in ANY engine."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**30, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, 2**30, size=num_hashes, dtype=np.int64)
    return a.tolist(), b.tolist()


def portable_hash32(col):
    """Engine-portable 32-bit string hash: first 8 hex chars of md5.
    Spark: conv(substr(md5,1,8),16,10); DuckDB: CAST('0x'||substr(md5,1,8)
    AS BIGINT) — identical values, so seeded-hash operators get real SQL
    oracles instead of rows-only checks."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig: array<long>) — one Arrow-batched pass, no shuffle.

    Shingle hashing is the engine-portable md5-derived 32-bit hash (JVM-side
    built-ins); the per-batch minhash fold is fully vectorized numpy over the
    FLATTENED batch (concatenate + minimum.reduceat) — no per-document
    Python loop. sig_i = min over shingles of (a_i*h + b_i) mod (2^61-1),
    all int64-exact in both Spark and DuckDB.
    """
    shingled = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(F.col(text_col), shingle_n)).alias("sh"),
    )
    hashed = shingled.select(
        "id", F.transform(F.col("sh"), portable_hash32).alias("shingles")
    )
    a_l, b_l = minhash_coeffs(num_hashes, seed)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        a = np.asarray(a_l, dtype=np.int64)[:, None]
        b = np.asarray(b_l, dtype=np.int64)[:, None]
        for pdf in batches:
            lens = np.array([0 if h is None else len(h) for h in pdf["shingles"]])
            n_docs = len(lens)
            if n_docs == 0:
                yield pd.DataFrame({"id": pdf["id"], "sig": []})
                continue
            flat = (
                np.concatenate([np.asarray(h, dtype=np.int64) for h in pdf["shingles"] if h is not None and len(h)])
                if lens.sum()
                else np.empty(0, dtype=np.int64)
            )
            # (num_hashes, total_shingles): one multiply-add-mod for the batch
            m = (a * flat[None, :] + b) % _MERSENNE
            sigs = np.zeros((n_docs, len(a_l)), dtype=np.int64)
            nz = lens > 0
            if nz.any():
                offsets = np.concatenate([[0], np.cumsum(lens[nz])[:-1]])
                mins = np.minimum.reduceat(m, offsets, axis=1)  # (H, nz_docs)
                sigs[nz] = mins.T
            yield pd.DataFrame({"id": pdf["id"], "sig": list(sigs)})

    return hashed.mapInPandas(run, schema="id long, sig array<long>")


def lsh_candidate_pairs(
    sig_df: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Band the signatures; pairs sharing any band bucket are candidates.
    Self-join is on (band, bucket-hash) — uniform keys, bounded fan-out.
    The bucket is md5 of the band's signature slice (engine-portable)."""
    banded = sig_df.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
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


SIMHASH_BITS = 60  # below int64's sign bit so ANY engine reconstructs it


def portable_hash60(col):
    """Engine-portable 60-bit string hash: first 15 hex chars of md5 (keeps
    1 << 59 inside int64 in both Spark and DuckDB)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS
) -> DataFrame:
    """SimHash from portable md5-derived token hashes.

    The per-batch fold is fully vectorized over the flattened batch
    (bit-matrix + add.reduceat) — no per-document Python loop. 60 bits (not
    64) so the signature and its SQL oracle reconstruction stay inside
    signed int64 in every engine.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), portable_hash60
        ).alias("th"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(bits, dtype=np.int64)
        for pdf in batches:
            lens = np.array([0 if h is None else len(h) for h in pdf["th"]])
            out = np.zeros(len(lens), dtype=np.int64)
            nz = lens > 0
            if nz.any():
                flat = np.concatenate(
                    [np.asarray(h, dtype=np.int64) for h in pdf["th"] if h is not None and len(h)]
                )
                bitmat = ((flat[:, None] >> shifts[None, :]) & 1).astype(np.int64)
                offsets = np.concatenate([[0], np.cumsum(lens[nz])[:-1]])
                ones = np.add.reduceat(bitmat, offsets, axis=0)  # (docs, bits)
                votes = 2 * ones - lens[nz][:, None]
                out[nz] = ((votes > 0).astype(np.int64) << shifts[None, :]).sum(axis=1)
            yield pd.DataFrame({"id": pdf["id"], "simhash": out})

    return toks.mapInPandas(run, schema="id long, simhash long")


def simhash_near_dups(
    sim_df: DataFrame, band_bits: int = 15, bits: int = SIMHASH_BITS
) -> DataFrame:
    """Near-dup candidates: docs sharing any of the bits/band_bits simhash
    bands (Hamming-distance LSH)."""
    nbands = bits // band_bits
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


def phash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    phash_col: str = "phash",
    max_hamming: int = 4,
    band_bits: int = 12,
    bits: int = 60,
) -> DataFrame:
    """Image near-dup pairs over a perceptual hash — Hamming-LSH with a
    COMPLETENESS guarantee, then exact verify.

    ``bits/band_bits`` bands: a pair within ``max_hamming`` differing bits
    touches at most ``max_hamming`` bands, so with ``max_hamming < nbands``
    it matches on >= 1 whole band (pigeonhole) — the band-equality
    self-join generates EVERY qualifying pair without all-pairs work, and
    the verify is pure JVM ``bit_count(a XOR b) <= max_hamming``. This is
    the image-payload analog of ``simhash_near_dups`` (same banded shape);
    phash is the north-rule hot-key column, so band keys inherit its skew —
    callers dedup clusters, they don't join payloads.

    Returns (id_a, id_b, hamming) with id_a < id_b, exact and complete
    (not probabilistic, unlike MinHash banding)."""
    nbands = bits // band_bits
    if max_hamming >= nbands:
        raise ValueError(
            f"max_hamming={max_hamming} needs more bands: only {nbands} "
            f"bands of {band_bits} bits — the pigeonhole completeness "
            "guarantee requires max_hamming < bands"
        )
    base = df.select(F.col(id_col).alias("id"), F.col(phash_col).alias("ph"))
    banded = base.select(
        "id",
        "ph",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("ph"), i * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("key"),
                    )
                    for i in range(nbands)
                ]
            )
        ).alias("bk"),
    ).select("id", "ph", "bk.band", "bk.key")
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.bit_count(
                F.col("l.ph").bitwiseXOR(F.col("r.ph"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def verified_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    rows_per_band: int = 4,
    seed: int = 42,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """The scale-correct near-dup pipeline: MinHash LSH candidate pairs →
    exact shingle-Jaccard verification of CANDIDATES ONLY.

    Never materializes all-pairs: the only quadratic-risk step is the band
    self-join, whose fan-out is bounded by bucket sizes (uniform md5 keys).
    The verify step joins each candidate pair to its two (distinct-)shingle
    sets and computes |A∩B| via JVM array_intersect — O(|A|+|B|) per pair,
    no shingle-level join. Fully SQL-expressible, so the whole pipeline has
    an exact DuckDB oracle (see __spark_entry__.oracle_sql).
    """
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n, seed)
    cands = lsh_candidate_pairs(sigs, bands, rows_per_band)
    shing = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(F.col(text_col), shingle_n)).alias("sh"),
    )
    a = shing.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = shing.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                inter / (F.size("sh_a") + F.size("sh_b") - inter), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
