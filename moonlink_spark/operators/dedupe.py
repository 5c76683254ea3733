"""Deduplication as a table-maintenance operator.

The training-data pipeline's dedup passes (exact fingerprint, MinHash-LSH
near-dup) applied to an ENGINE table as one MERGE delete commit — the same
snapshot/LSN machinery as every other mutation, so dedup is time-travelable,
replayable (LSN idempotence), shows up in the changelog as ordinary delete
events, and composes with compaction/expiry like any commit. Moonlink has no
dedup operator (its identity upsert IS key-level dedup, mooncake_table.rs
delete+append); this extends the maintenance surface with the content-level
dedup a 100 TB image+caption corpus needs — a maintenance-dispatch citizen
like optimize_table (reference dispatch shape: table_handler.rs:374-411).

Strategies (both scale-correct — nothing all-pairs):

- ``exact``: duplicate = identical normalized text (lowercase, collapsed
  whitespace — functions/text.normalize_text). ONE hash-groupBy over
  (identity, fingerprint) keyed by the tiny normalized-hash frame; the
  winner per group is the MIN identity (deterministic), losers become
  delete events.
- ``minhash``: MinHash-LSH banding → candidate pairs → exact shingle-
  Jaccard verify (functions/dedup.verified_near_dup_pairs); every verified
  pair deletes its LARGER id. Greedy pairwise survivorship (the common
  LSH-dedup policy): within any near-dup cluster the smallest id that is
  never the larger end of a verified pair survives; no iterative
  connected-components job on the hot path.

The delete commit carries ONLY identity keys (payload columns NULL), so a
dedup over a 10^12-row table moves O(losers) bytes, and ``mode="lazy"``
writes a single equality-delete file with zero table probe.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moonlink_spark.functions.text import normalize_text
from moonlink_spark.operators.merge import MergeResult, merge_cdc_batch
from moonlink_spark.schema import table_identity
from moonlink_spark.table.catalog import Table
from moonlink_spark.table.scan import scan


@dataclass
class DedupeResult:
    strategy: str
    removed: int
    merge: MergeResult | None

    @property
    def skipped(self) -> bool:
        return self.merge is None or self.merge.skipped


def _delete_batch(table: Table, losers: DataFrame, key: str, lsn: int) -> DataFrame:
    """Loser ids → CDC delete rows (op 'D', payload NULL)."""
    cols = [F.lit("D").alias("op"), F.lit(lsn).cast("long").alias("lsn")]
    for f in table.schema.fields:
        if f.name == key:
            cols.append(F.col(key).cast(f.dataType).alias(key))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return losers.select(*cols)


def exact_duplicate_losers(df: DataFrame, key: str, text_col: str) -> DataFrame:
    """Identity values that lose exact dedup: every row whose normalized
    text matches a group whose minimum identity is someone else. The
    groupBy carries only (norm-hash, identity) — never the text payload —
    and map-side combines, so a viral duplicate (the hot-key case) reaches
    the reducer as one row per map task."""
    norm = df.select(
        F.col(key), F.md5(normalize_text(F.col(text_col))).alias("__fp")
    )
    winners = norm.groupBy("__fp").agg(F.min(key).alias("__keep"))
    return (
        norm.join(winners, "__fp")
        .filter(F.col(key) != F.col("__keep"))
        .select(key)
    )


def _group_losers(members: DataFrame, verified: DataFrame, key: str,
                  intra_valid=None) -> DataFrame:
    """Loser ids from the COLLAPSED near-dup structure without ever
    materializing member-level pairs.

    ``members``: (id, gk, …) — gk the collapse key (identical gk ⇒ the
    pair qualifies whenever ``intra_valid`` holds). ``verified``: rep-level
    qualifying pairs (gk_a, gk_b, rep_a, rep_b). A member m is the LARGER
    end of some qualifying member pair iff

      m.id > min(own group)  (intra — the pair (min, m) qualifies)   OR
      m.id > min(rep of a verified partner group)  (cross — it pairs with
        EVERY member of the partner, in particular the partner's min)

    so losers = exactly ``expanded_pairs.id_b.distinct()`` at
    O(members + rep pairs) cost — a 10⁶-member viral cluster yields 10⁶-1
    delete keys without 5·10¹¹ intermediate pairs."""
    uniq = members.groupBy("gk").agg(F.min("id").alias("rep"))
    pm = (
        verified.select(F.col("gk_a").alias("gk"), F.col("rep_b").alias("pm"))
        .unionByName(
            verified.select(F.col("gk_b").alias("gk"), F.col("rep_a").alias("pm"))
        )
        .groupBy("gk")
        .agg(F.min("pm").alias("pm"))
    )
    m = members.join(uniq, "gk").join(pm, "gk", "left")
    intra_ok = F.lit(True) if intra_valid is None else intra_valid
    cond = ((F.col("id") > F.col("rep")) & intra_ok) | (
        F.col("pm").isNotNull() & (F.col("id") > F.col("pm"))
    )
    return m.filter(cond).select(F.col("id").alias(key)).distinct()


def near_duplicate_losers(
    df: DataFrame, key: str, text_col: str, min_jaccard: float, **lsh_kw
) -> DataFrame:
    """Identity values that are the LARGER end of at least one verified
    near-dup pair (greedy pairwise survivorship) — computed group-wise, so
    a viral cluster of identical texts never expands to pairs."""
    from moonlink_spark.functions.dedup import _verified_rep_pairs

    members, uniq, verified = _verified_rep_pairs(
        df, key, text_col, min_jaccard=min_jaccard, **lsh_kw
    )
    m = members.join(uniq.select("gk", "sz"), "gk")
    # intra pair (same shingle set) has jaccard exactly 1 when the set is
    # non-empty, NULL (never qualifying) when empty — same as the formula
    intra_ok = (F.col("sz") > 0) & F.lit(1.0 >= min_jaccard)
    return _group_losers(m, verified, key, intra_valid=intra_ok)


def phash_duplicate_losers(
    df: DataFrame, key: str, phash_col: str, max_hamming: int, **ph_kw
) -> DataFrame:
    """Identity values that are the LARGER end of at least one phash
    near-dup pair (complete Hamming-LSH + exact verify — dedup.py),
    computed group-wise: identical phash values (THE north-rule hot key)
    collapse before the band join and never expand to pairs here."""
    from moonlink_spark.functions.dedup import _phash_rep_pairs

    members, verified = _phash_rep_pairs(
        df, key, phash_col, max_hamming,
        ph_kw.pop("band_bits", 12), ph_kw.pop("bits", 60),
        ph_kw.pop("hot_bucket_cap", None),
    )
    # intra pairs have hamming 0 — always qualifying (max_hamming >= 0)
    return _group_losers(members, verified, key)


def dedupe_table(
    spark: SparkSession,
    table: Table,
    text_col: str,
    strategy: str = "exact",
    lsn: int | None = None,
    min_jaccard: float = 0.8,
    mode: str | None = None,
    max_hamming: int = 4,
    min_cos: float = 0.98,
    **lsh_kw,
) -> DedupeResult:
    """Remove duplicate rows as ONE MERGE delete snapshot at ``lsn``
    (default: flush LSN + 1). Requires a single-column identity — content
    dedup keys rows by their one id, like every corpus pipeline here."""
    keys = table_identity(table)
    if len(keys) != 1:
        raise ValueError(
            f"dedupe_table requires a single identity column, got {keys}"
        )
    key = keys[0]
    table.refresh()
    df = scan(spark, table, columns=[key, text_col])
    if strategy == "exact":
        losers = exact_duplicate_losers(df, key, text_col)
    elif strategy == "minhash":
        losers = near_duplicate_losers(
            df, key, text_col, min_jaccard=min_jaccard, **lsh_kw
        )
    elif strategy == "phash":
        # image near-dup: text_col names the perceptual-hash column
        losers = phash_duplicate_losers(
            df, key, text_col, max_hamming=max_hamming, **lsh_kw
        )
    elif strategy == "embedding":
        # embedding-cosine near-dup: text_col names an array<float> column;
        # LSH bucket self-join + exact cosine (functions/similarity.py),
        # dim inferred from the first non-null vector. Losers computed
        # group-wise (identical vectors never expand to pairs).
        from moonlink_spark.functions.similarity import (
            _embedding_rep_pairs,
            cosine,
        )

        first = (
            df.where(F.col(text_col).isNotNull())
            .select(F.size(text_col).alias("d"))
            .first()
        )
        if first is None:
            losers = df.select(F.col(key)).limit(0)
        elif int(first["d"]) <= 0:
            raise ValueError(
                f"embedding dedupe: column {text_col!r} has empty vectors "
                "(size 0) — cannot infer an embedding dimension"
            )
        else:
            members, verified = _embedding_rep_pairs(
                df,
                dim=int(first["d"]),
                min_cos=min_cos,
                bits=lsh_kw.pop("bits", 10),
                seed=lsh_kw.pop("seed", 11),
                id_col=key,
                vec_col=text_col,
                **lsh_kw,
            )
            # intra pair (identical vectors) qualifies iff round(cos(v,v),6)
            # >= min_cos — 1.0 unless the zero vector (NULL, never qualifies)
            intra_ok = F.round(cosine(F.col("gk"), F.col("gk")), 6) >= min_cos
            losers = _group_losers(members, verified, key, intra_valid=intra_ok)
    else:
        raise ValueError(f"unknown dedupe strategy {strategy!r}")

    commit_lsn = lsn if lsn is not None else (table.flush_lsn or 0) + 1
    batch = _delete_batch(table, losers, key, commit_lsn)
    res = merge_cdc_batch(spark, table, batch, commit_lsn, key=key, mode=mode)
    removed = 0 if res.skipped else int(res.metrics.get("matched", 0))
    return DedupeResult(strategy=strategy, removed=removed, merge=res)
