"""Explicit skew handling: salted joins and two-phase latest-wins dedup.

The north rule requires explicit salting for phash-hot-key skew (90% of rows
share 16 phash buckets in the F1 fixture). AQE skew-join splits oversized
shuffle partitions, but salting at the plan level is deterministic and also
fixes skewed *aggregations*, which AQE does not repartition.

Patterns:
- ``salted_join``: big (skewed) side gets ``salt = pmod(xxhash64(...), S)``;
  small side is exploded S× — classic fan-out salting.
- ``latest_wins_dedup``: two-phase max_by — partial dedup per (key, salt)
  bucket (map-side-combine-like), then final dedup per key. A hot key that
  would pin one reducer is first reduced S-ways.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, buckets: int, cols: list[str] | None = None) -> DataFrame:
    """Deterministic salt: hash of all (or given) columns — spreads hot join
    keys without RNG (keeps jobs replayable)."""
    cols = cols or df.columns
    return df.withColumn(SALT_COL, F.pmod(F.xxhash64(*cols), F.lit(buckets)).cast("int"))


def explode_salt(df: DataFrame, buckets: int) -> DataFrame:
    return df.withColumn(
        SALT_COL, F.explode(F.array([F.lit(i) for i in range(buckets)]))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    buckets: int = 16,
) -> DataFrame:
    """Join a skew-keyed big side with a small side on ``on`` columns,
    spreading each hot key across ``buckets`` shuffle partitions.

    The salt on the big side hashes the full row (not just the key), so rows
    sharing a hot key scatter; the small side is replicated ``buckets``×.
    Result is identical to ``big.join(small, on, how)``.
    """
    b = with_salt(big, buckets)  # full-row hash → hot keys scatter
    s = explode_salt(small, buckets)
    out = b.join(s, on + [SALT_COL], how)
    return out.drop(SALT_COL)


def latest_wins_dedup(
    df: DataFrame,
    key: str,
    order_col: str,
    tiebreak_col: str | None = None,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Keep, per key, the row with max (order_col[, tiebreak_col]).

    This is the CDC pre-MERGE dedup (latest LSN wins; 'U' beats 'D' at equal
    LSN because moonlink updates decompose to delete+append at one LSN,
    reference: src/moonlink_connectors/src/pg_replicate/moonlink_sink.rs:286-317).

    Implemented as max_by over a struct — with ``salt_buckets`` it runs in two
    phases, (key, salt) then key, so a key receiving millions of CDC events
    never lands on a single reducer.
    """
    ord_expr = (
        F.struct(F.col(order_col), F.col(tiebreak_col))
        if tiebreak_col
        else F.struct(F.col(order_col))
    )
    payload = F.struct(*[F.col(c) for c in df.columns])

    def reduce_step(d: DataFrame, group_cols: list[str]) -> DataFrame:
        return d.groupBy(*group_cols).agg(
            F.max_by(F.col("__payload"), F.col("__ord")).alias("__payload"),
            F.max(F.col("__ord")).alias("__ord"),
        )

    staged = df.withColumn("__payload", payload).withColumn("__ord", ord_expr)
    if salt_buckets and salt_buckets > 1:
        staged = with_salt(staged, salt_buckets)
        staged = reduce_step(staged, [key, SALT_COL])
    reduced = reduce_step(staged, [key])
    return reduced.select("__payload.*")
