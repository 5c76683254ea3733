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


ORD_COL = "__ord"


def winning_ords(
    df: DataFrame,
    key: str | list[str],
    order_col: str,
    tiebreak_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(staged, winners): ``staged`` = df + ``__ord`` struct column;
    ``winners`` = per-key max __ord — a TINY frame (key + order columns only,
    no payload). The groupBy is map-side combined by Spark, so a hot key
    reaching the reducer carries at most one row per map task — no explicit
    salting needed for the aggregation. ``key`` may be a composite column
    list (moonlink IdentityProp::Keys, moonlink_row.rs:271-280)."""
    from moonlink_spark.schema import normalize_keys

    ord_expr = (
        F.struct(F.col(order_col), F.col(tiebreak_col))
        if tiebreak_col
        else F.struct(F.col(order_col))
    )
    staged = df.withColumn(ORD_COL, ord_expr)
    winners = staged.groupBy(*normalize_keys(key)).agg(F.max(ORD_COL).alias(ORD_COL))
    return staged, winners


def latest_wins_dedup(
    df: DataFrame,
    key: str | list[str],
    order_col: str,
    tiebreak_col: str | None = None,
    salt_buckets: int | None = None,  # kept for API compat; see note below
) -> DataFrame:
    """Keep, per key, the row with max (order_col[, tiebreak_col]).

    This is the CDC pre-MERGE dedup (latest LSN wins; 'U' beats 'D' at equal
    LSN because moonlink updates decompose to delete+append at one LSN,
    reference: src/moonlink_connectors/src/pg_replicate/moonlink_sink.rs:286-317).

    Plan shape: one map-side-combined aggregation over ONLY (key, order)
    — never the payload — then a semi join of the payload against the winner
    set, which AQE broadcasts when small. The payload (15 KB image rows)
    is never the object of an aggregation and usually never shuffles at all.
    (An earlier design ran max_by(payload-struct) through a salted two-phase
    groupBy; ObjectHashAggregate falls back to sort-based aggregation past
    128 keys per partition, which sorts the binary payloads — measurably
    slow and memory-hungry. Skew needs no salt here: the tiny agg map-side
    combines, and the semi join keys on (key, __ord) so a hot key's events
    scatter across partitions by their distinct LSNs.)

    Requires (order_col, tiebreak_col) unique per key among tied winners —
    CDC LSNs are globally unique, so this holds by construction (a duplicated
    event at the same (key, order, tiebreak) would survive twice; enforce
    upstream uniqueness, e.g. LSN assignment).

    NULL keys are handled: the join is null-safe, so a NULL-key group
    dedups like any other group instead of being silently dropped.
    """
    from moonlink_spark.schema import normalize_keys

    keys = normalize_keys(key)
    staged, winners = winning_ords(df, keys, order_col, tiebreak_col)
    w = winners.withColumnRenamed(ORD_COL, "__wo")
    for i, k in enumerate(keys):
        w = w.withColumnRenamed(k, f"__wk{i}")
    cond = staged[ORD_COL] == F.col("__wo")
    for i, k in enumerate(keys):
        cond = cond & staged[k].eqNullSafe(F.col(f"__wk{i}"))
    return staged.join(w, cond, "left_semi").drop(ORD_COL)
