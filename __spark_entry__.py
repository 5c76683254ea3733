"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family of the
moonlink_spark engine (SURVEY.md §2) over the driver's parquet tables, with
a DuckDB-equivalent ``oracle_sql()`` for EVERY entry — including the
seeded-hash operators (MinHash LSH, SimHash), whose hashes are
engine-portable md5 derivations with the seeded constants inlined into the
oracle SQL, and the engine-lifecycle entries, which run the real table
engine (create → append → MERGE → compact/cluster/expire → snapshot scan)
and compare the final table content against a closed-form SQL state.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

STOPWORDS_SQL = "('the','a','of','and','to','in','is','it','for','on')"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------- entry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the MERGE pre-apply pipeline shape (salted latest-wins CDC
    dedup) on the events table at sf0.001."""
    return q_cdc_latest_wins(spark, "/root/testdata/sf0.001")


# ------------------------------------------------------------------- queries


def q_cdc_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine op: latest_wins_dedup (merge.py pre-MERGE dedup, O1-O4)."""
    from moonlink_spark.functions.salting import latest_wins_dedup

    ev = _t(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    out = latest_wins_dedup(ev, "user_id", "ts_us", tiebreak_col="event_id", salt_buckets=8)
    return out.select(
        F.col("user_id"),
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.round(F.col("value"), 6).alias("last_value"),
    )


def q_merge_upsert_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine op: MERGE INTO latest-wins apply semantics (O2-O4) as a
    full-outer reconciliation over a synthetic CDC stream from orders."""
    orders = _t(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    cdc = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 4 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.round(F.col("o_totalprice") * 2, 2).alias("new_price"),
    )
    b = base.alias("b")
    c = cdc.alias("c")
    joined = b.join(c, F.col("b.o_orderkey") == F.col("c.o_orderkey"), "full_outer")
    merged = joined.filter(
        (F.col("c.op").isNull()) | (F.col("c.op") == "U")
    ).select(
        F.coalesce(F.col("c.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
        F.when(F.col("c.op") == "U", F.col("c.new_price"))
        .otherwise(F.col("b.price"))
        .alias("price"),
        F.when(F.col("c.op") == "U", F.lit("upserted"))
        .otherwise(F.lit("kept"))
        .alias("status"),
    )
    return merged


def q_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine op: explicit salted join (salting.py) — result must equal the
    plain join the oracle runs."""
    from moonlink_spark.functions.salting import salted_join

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    # join keys differ by name: align first
    big = orders.withColumnRenamed("o_custkey", "c_custkey")
    j = salted_join(big, cust, ["c_custkey"], buckets=8)
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("sum_price_cents"),
        )
        .orderBy("c_mktsegment")
    )


def q_file_stats_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine op: per-column min/max stats fold (stats.py, O19)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_quantity").cast("long").alias("min_qty"),
            F.max("l_quantity").cast("long").alias("max_qty"),
            F.min(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("min_price_cents"),
            F.max(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("max_price_cents"),
            F.min("l_shipdate").alias("min_shipdate"),
            F.max("l_shipdate").alias("max_shipdate"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine op: compaction bin planning (compact.py) — cumulative-size
    binning of 'files' (orders as proxies) into 50-unit bins.

    The global prefix sum is two-phase so NO single-partition WindowExec
    touches the full file list (a 10^9-file anti-pattern): an in-range-group
    cumulative window (partitioned, parallel) plus a broadcast join against
    per-group offsets — the only global window runs over #groups rows."""
    li = _t(spark, sf_dir, "lineitem")
    files = li.groupBy("l_orderkey").agg(F.count("*").alias("size_units"))
    files = files.withColumn(
        "__grp", F.floor(F.col("l_orderkey") / F.lit(8192))
    )
    w_in = (
        Window.partitionBy("__grp")
        .orderBy("l_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_in = F.sum("size_units").over(w_in)
    # per-group offsets: prefix-sum ONE tiny frame (rows = #groups) with a
    # global window — single-partition is fine at #groups scale, and the
    # totals agg reuses the files groupBy exchange (ReusedExchange), so no
    # second lineitem scan, no driver collect barrier
    totals = files.groupBy("__grp").agg(F.sum("size_units").alias("t"))
    w_g = Window.orderBy("__grp").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__grp", F.coalesce(F.sum("t").over(w_g), F.lit(0)).alias("__off")
    )
    return (
        files.join(F.broadcast(offsets), "__grp")
        .select(
            "l_orderkey",
            "size_units",
            F.floor((F.col("__off") + cum_in - F.col("size_units")) / F.lit(50))
            .cast("long")
            .alias("bin"),
        )
    )


def q_zorder_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine op: Morton Z-order code (codes.py) as a pure JVM bitwise
    expression (whole-stage codegen — the path cluster() uses for zorder);
    oracle recomputes the bit-interleave in pure SQL."""
    from moonlink_spark.functions.codes import zorder_expr

    li = _t(spark, sf_dir, "lineitem")
    code = zorder_expr(
        [
            (F.col("l_partkey") % 256).cast("long"),
            (F.col("l_suppkey") % 256).cast("long"),
        ],
        [(0, 255), (0, 255)],
        total_bits=16,
    )
    return li.select("l_orderkey", "l_linenumber", code.alias("zcode"))


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation coverage (TPC-H Q1 shape, exact integer arithmetic)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sum_base_cents"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * F.round((1 - F.col("l_discount")) * 100).cast("long")
            ).alias("sum_disc_units"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function coverage: per-user running totals over event time."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count("*").over(w).alias("run_cnt"),
        F.sum(F.round(F.col("value") * 100).cast("long")).over(w).alias("run_sum_cents"),
    )


def q_topk_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + window top-k coverage."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    j = orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "c_mktsegment",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            "rank",
        )
    )


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-ish coverage: gap-based sessionization (30-min gap)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tsc = F.col("ts").cast("timestamp")
    gap = F.unix_micros(tsc) - F.unix_micros(F.lag(tsc).over(w))
    flagged = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), F.lit(1)).otherwise(F.lit(0)),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return flagged.select(
        "user_id", "event_id", F.sum("new_sess").over(w2).alias("session_id")
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine op: exact-dedup fingerprint (text.py) — md5 over normalized
    text, plus the per-source distinct counts exact dedup reports."""
    from moonlink_spark.functions.text import fingerprint

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", fingerprint(F.col("text")).alias("fingerprint")
    )


def q_exact_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from moonlink_spark.functions.text import normalize_text

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("source", normalize_text(F.col("text")).alias("norm"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("norm").alias("n_distinct"),
        )
        .orderBy("source")
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine op: text quality scoring (text.py)."""
    from moonlink_spark.functions.text import (
        punct_ratio,
        stopword_ratio,
        token_count,
    )

    docs = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        token_count(c).alias("n_tokens"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
    )


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine op: marker-word language ID (text.py)."""
    from moonlink_spark.functions.text import predict_lang

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", predict_lang(F.col("text")).alias("lang_pred"))


def q_ngram_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine op: the scale-correct near-dup composition — MinHash-LSH
    candidate pairs, exact shingle-Jaccard verification of candidates only,
    top-20. The oracle replays the IDENTICAL pipeline in SQL (portable
    md5-derived hashes), so approximation never causes a mismatch."""
    from moonlink_spark.functions.dedup import verified_near_dup_pairs

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    pairs = verified_near_dup_pairs(docs, "doc_id", "text", shingle_n=3)
    return (
        pairs.orderBy(F.desc("jaccard"), F.asc("id_a"), F.asc("id_b"))
        .limit(20)
        .select("id_a", "id_b", "jaccard")
    )


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine op: exact cosine top-k via the matmul pandas stage
    (similarity.exact_topk — one corpus pass, per-batch local top-k, tiny
    global reduction). Output ranks only (float cosines are
    engine-rounding-sensitive)."""
    from moonlink_spark.functions.similarity import exact_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return exact_topk(emb, q, k=3).select("query_id", "neighbor_id", "rank")


def q_engine_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: IVF as a table layout (operators/ivf.py) — the
    embeddings corpus loaded into an engine table, rewritten cell-ordered
    with the centroid matrix pinned in table properties (build/probe
    symmetry — the invariant moonlink pins per persisted index file,
    persisted_bucket_hash_map.rs:73-93), then probed top-k through ONE
    interval-union planning pass (table/scan.scan_values, VERDICT r4 #4).

    Every stage is a closed SQL form, so this gets an EXACT DuckDB oracle:
    centroids = first 8 corpus vectors ordered by the engine-portable
    md5("<vec_id>-<seed>"); cell = argmax cosine with smallest-cell
    tie-break; probe = each query's 3 nearest cells; re-rank =
    round(cosine, 6) DESC with neighbor_id tie-break. Output ranks only
    (raw float cosines are engine-rounding-sensitive)."""
    import tempfile

    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    from moonlink_spark.operators.ivf import ivf_index_table, ivf_topk_table
    from moonlink_spark.schema import IDENTITY_PROP
    from moonlink_spark.table.catalog import create_table
    from moonlink_spark.table.writer import write_data_files

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    schema = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType()), True),
        ]
    )
    wd = tempfile.mkdtemp(prefix="moonlink_ivf_")
    t = create_table(
        f"{wd}/tbl", schema, properties={IDENTITY_PROP: "vec_id"}
    )
    t.commit(
        "append",
        added=write_data_files(
            spark, emb, t.new_data_dir(), field_id_schema=t.schema
        ),
        lsn=1,
    )
    ivf_index_table(spark, t, dim=64, n_cells=8, seed=13, target_bytes=64 << 10)
    t.refresh()
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk_table(spark, t, queries, k=3, n_probe=3).select(
        "query_id", "neighbor_id", "rank"
    )


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine op: MinHash+LSH near-dup candidates (dedup.py). The signature
    hashes are engine-portable (md5-derived + seeded affine permutations
    inlined into the oracle SQL), so this seeded-hash operator has an exact
    DuckDB oracle."""
    from moonlink_spark.functions.dedup import lsh_candidate_pairs, minhash_signatures

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=64)
    return lsh_candidate_pairs(sigs, bands=16, rows_per_band=4).orderBy("id_a", "id_b")


def q_phash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline op: image near-dup pairs by perceptual hash
    (functions/dedup.phash_near_dup_pairs) — Hamming-LSH banding with the
    pigeonhole completeness guarantee + exact JVM bit_count verify, never
    all-pairs. The phash here is an engine-portable md5 derivation over
    documents (base per doc_id%100 cluster, up to two deterministic bit
    flips per doc), so the SQL oracle reproduces it exactly; completeness
    means the oracle can be the plain quadratic form."""
    from moonlink_spark.functions.dedup import phash_near_dup_pairs, portable_hash60

    docs = _t(spark, sf_dir, "documents")
    base = portable_hash60((F.col("doc_id") % 100).cast("string"))
    flip1 = F.expr(
        "CASE WHEN doc_id % 3 = 0 THEN "
        "shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 59 AS INT)) "
        "ELSE CAST(0 AS BIGINT) END"
    )
    flip2 = F.expr(
        "CASE WHEN doc_id % 5 = 0 THEN "
        "shiftleft(CAST(1 AS BIGINT), CAST((doc_id * 7) % 59 AS INT)) "
        "ELSE CAST(0 AS BIGINT) END"
    )
    ph = docs.select(
        F.col("doc_id").alias("id"),
        base.bitwiseXOR(flip1).bitwiseXOR(flip2).alias("phash"),
    )
    pairs = phash_near_dup_pairs(ph, "id", "phash", max_hamming=4)
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine op: SimHash signatures (dedup.py; 60-bit portable md5 token
    hashes) — exact DuckDB oracle reconstructs the bit votes in SQL."""
    from moonlink_spark.functions.dedup import simhash_signatures

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return simhash_signatures(docs, "doc_id", "text").orderBy("id")


# ------------------------------------------------- engine lifecycle queries
#
# These run the ACTUAL table engine end-to-end (create → append → MERGE
# CDC batches → maintenance → snapshot scan) on a deterministic image-style
# table derived from the driver's orders parquet, so the DuckDB oracle
# checks the engine itself — commit protocol, positional deletes, DV-aware
# scan, compaction content preservation, clustering rewrite, LSN time
# travel — not just the function library.


# one fully-merged lifecycle base per (process, sf_dir): the load + two
# MERGE commits are byte-identical across the post-merge lifecycle queries,
# so they are built ONCE (with parquet manifests — the scale posture, so
# the base's merges run the DISTRIBUTED planner) and each query forks its
# own independent table via zero-copy clone (operators/clone.py — shared
# data files, forked metadata with full history). Every graded operator
# (compaction, clustering, time travel, changelog, rollback, range scan)
# still runs on its own table; only the common prefix is shared, exactly
# like a fleet of jobs cloning one prod table. Driver-side (JSON-manifest)
# planning stays covered by the sync/stream/evolve/typed/ingest/rest/
# composite lifecycles, which build their own tables.
_LIFECYCLE_BASE: dict = {}


def _lifecycle_table(
    spark: SparkSession,
    sf_dir: str,
    post: str | None = None,
    extra_props: dict | None = None,
    each_commit: Callable | None = None,
):
    """A fully-merged lifecycle table: cached-base fork when the prefix is
    the shared one (no per-commit hook, no custom props), else a fresh
    build via ``_build_lifecycle_table``."""
    import tempfile

    if each_commit is None and extra_props is None:
        from moonlink_spark.operators.clone import clone_table
        from moonlink_spark.operators.cluster import cluster
        from moonlink_spark.operators.maintenance import optimize_table
        from moonlink_spark.table.catalog import load_table
        from moonlink_spark.table.format import MANIFEST_FORMAT_PROP

        base_loc = _LIFECYCLE_BASE.get(sf_dir)
        if base_loc is None:
            base = _build_lifecycle_table(
                spark, sf_dir, extra_props={MANIFEST_FORMAT_PROP: "parquet"}
            )
            _LIFECYCLE_BASE[sf_dir] = base_loc = base.location
        t = clone_table(
            load_table(base_loc),
            tempfile.mkdtemp(prefix="moonlink_lifecycle_fork_") + "/tbl",
        )
        if post == "compact":
            optimize_table(spark, t, mode="full", retain_last=2)
        elif post == "cluster":
            cluster(spark, t, cols=("phash", "w", "h"), strategy="zorder")
        return t
    return _build_lifecycle_table(spark, sf_dir, post, extra_props, each_commit)


def _build_lifecycle_table(
    spark: SparkSession,
    sf_dir: str,
    post: str | None = None,
    extra_props: dict | None = None,
    each_commit: Callable | None = None,
    merge_mode: str = "eager",
):
    """Build an image-schema table from orders; apply two CDC batches via
    merge_cdc_batch; optionally run maintenance. Returns the Table.
    ``each_commit(table)`` fires after every data commit (replication hook).

    CDC design (k = o_orderkey), chosen so the final state is a closed-form
    SQL predicate:
      base    : k%10<3
      b1 upd  : k%10<3 and k%7==1  (caption + ' v2')
      b1 del  : k%10<3 and k%7==2
      b1 ins  : k%10==5 and k%3==0
      b2 upd  : k%10<3 and k%7==4  (caption + ' v3')
      b2 del  : k%10<3 and k%7==5
      b2 ins  : k%10==7 and k%3==1
    """
    import tempfile

    from moonlink_spark.operators.cluster import cluster
    from moonlink_spark.operators.maintenance import optimize_table
    from moonlink_spark.operators.merge import merge_cdc_batch
    from moonlink_spark.schema import IMAGES_SCHEMA
    from moonlink_spark.table.catalog import create_table
    from moonlink_spark.table.writer import BUCKETS_PROP, write_bucketed_data_files

    k = F.col("o_orderkey")

    def rows(df):
        return df.select(
            k.cast("string").alias("image_id"),
            F.col("o_orderpriority").cast("binary").alias("bytes"),
            (k % 100).cast("int").alias("w"),
            F.length("o_orderpriority").cast("int").alias("h"),
            F.col("o_orderstatus").alias("fmt"),
            F.col("o_orderpriority").alias("caption"),
            F.col("o_custkey").cast("long").alias("phash"),
        )

    def cdc(upd_df, del_df, suffix):
        u = rows(upd_df).withColumn(
            "caption", F.concat(F.col("caption"), F.lit(suffix))
        ).select(
            F.lit("U").alias("op"),
            F.col("image_id").cast("long").alias("lsn"),
            "*",
        )
        d = del_df.select(
            F.lit("D").alias("op"),
            k.cast("long").alias("lsn"),
            k.cast("string").alias("image_id"),
            F.lit(None).cast("binary").alias("bytes"),
            F.lit(None).cast("int").alias("w"),
            F.lit(None).cast("int").alias("h"),
            F.lit(None).cast("string").alias("fmt"),
            F.lit(None).cast("string").alias("caption"),
            F.lit(None).cast("long").alias("phash"),
        )
        return u.unionByName(d)

    orders = _t(spark, sf_dir, "orders")
    base = orders.filter(k % 10 < 3)
    wd = tempfile.mkdtemp(prefix="moonlink_lifecycle_")
    props = {BUCKETS_PROP: "16", **(extra_props or {})}
    t = create_table(f"{wd}/tbl", IMAGES_SCHEMA, properties=props)
    entries = write_bucketed_data_files(
        spark, rows(base), t.new_data_dir(), "image_id", 16,
        max_records_per_file=4096,
    )
    t.commit("append", added=entries, lsn=1)
    if each_commit:
        each_commit(t)

    b1 = cdc(
        orders.filter((k % 10 < 3) & (k % 7 == 1)),
        orders.filter((k % 10 < 3) & (k % 7 == 2)),
        " v2",
    ).unionByName(
        rows(orders.filter((k % 10 == 5) & (k % 3 == 0))).select(
            F.lit("U").alias("op"), F.col("image_id").cast("long").alias("lsn"), "*"
        )
    )
    merge_cdc_batch(spark, t, b1, lsn=2, mode=merge_mode)
    if each_commit:
        each_commit(t)

    b2 = cdc(
        orders.filter((k % 10 < 3) & (k % 7 == 4)),
        orders.filter((k % 10 < 3) & (k % 7 == 5)),
        " v3",
    ).unionByName(
        rows(orders.filter((k % 10 == 7) & (k % 3 == 1))).select(
            F.lit("U").alias("op"), F.col("image_id").cast("long").alias("lsn"), "*"
        )
    )
    merge_cdc_batch(spark, t, b2, lsn=3, mode=merge_mode)
    if each_commit:
        each_commit(t)

    if post == "compact":
        optimize_table(spark, t, mode="full", retain_last=2)
    elif post == "cluster":
        cluster(spark, t, cols=("phash", "w", "h"), strategy="zorder")
    return t


_LIFECYCLE_COLS = ["image_id", "caption", "phash"]


def q_engine_iceberg_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: the full MERGE lifecycle table EXPORTED as a genuine
    Apache Iceberg v2 table (operators/publish.py — real Avro manifests +
    manifest list + metadata.json + version-hint, DVs converted to
    standard position-delete parquet with the spec's reserved field ids),
    then scanned back through read_published, which plans from the
    PUBLISHED metadata only — no engine metadata in the read path. This is
    the external-interop face the reference leads with (README.md:84-105:
    the maintained table is a standard Iceberg table other engines read
    directly; iceberg_table_manager.rs:29-32). The oracle is the same
    closed form as engine_merge_scan: publishing must change NOTHING about
    the table's logical content."""
    import tempfile

    from moonlink_spark.operators.publish import publish_iceberg, read_published

    t = _lifecycle_table(spark, sf_dir)
    dest = tempfile.mkdtemp(prefix="moonlink_pub_") + "/iceberg"
    publish_iceberg(spark, t, dest)
    return read_published(spark, dest).select(*_LIFECYCLE_COLS)


def q_engine_merge_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: append + 2 MERGE CDC batches (upsert/delete, positional
    deletes, DV-aware scan) → final snapshot content. The lifecycle base runs on
    PARQUET manifests, so MERGE candidate selection goes through the
    distributed planner (table/planning.py — metadata-as-data); the
    sync/stream/evolve/typed/ingest/rest/composite lifecycles keep covering
    the JSON-manifest driver-side path. Content (and therefore the oracle)
    is identical either way."""
    from moonlink_spark.table.scan import scan

    t = _lifecycle_table(spark, sf_dir)
    return scan(spark, t).select(*_LIFECYCLE_COLS)


def q_engine_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: key-range scan (scan_range) over the post-MERGE snapshot
    — file pruning runs DISTRIBUTED over parquet manifests
    (plan_data_candidates), then the residual predicate pushes into the
    parquet scan. String-lexicographic bounds match the SQL oracle's VARCHAR
    BETWEEN semantics."""
    from moonlink_spark.table.scan import scan_range

    t = _lifecycle_table(spark, sf_dir)
    return scan_range(spark, t, "image_id", "2", "5").select(*_LIFECYCLE_COLS)


def q_engine_compact_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: MERGE batches then FULL maintenance (bin-pack compaction
    folding deletes + manifest rewrite + snapshot expiry) — content must be
    byte-identical to the pre-compaction state."""
    from moonlink_spark.table.scan import scan

    t = _lifecycle_table(spark, sf_dir, post="compact")
    return scan(spark, t).select(*_LIFECYCLE_COLS)


def q_engine_cluster_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: MERGE batches then Z-order clustering rewrite on
    (phash, w, h) — content preserved, layout re-ordered."""
    from moonlink_spark.table.scan import scan

    t = _lifecycle_table(spark, sf_dir, post="cluster")
    return scan(spark, t).select(*_LIFECYCLE_COLS)


def q_engine_scoped_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: key-range SPOT compaction — compact only the image_id
    slice ['2','5'] (candidate pool pruned by manifest min/max exactly like
    scan_range, distributed at parquet-manifest scale; files outside the
    scope untouched), then read the slice back through scan_range so the
    probe serves the rewritten files. The 100 TB shape: maintain the hot
    key range a skewed ingest fragmented, not the whole table."""
    from moonlink_spark.operators.compact import compact
    from moonlink_spark.table.scan import scan_range

    t = _lifecycle_table(spark, sf_dir)
    compact(spark, t, mode="full", scope_key="image_id", scope_lo="2", scope_hi="5")
    return scan_range(spark, t, "image_id", "2", "5").select(*_LIFECYCLE_COLS)


def q_engine_rebucket_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: bucket-count rescale 16→8 as ONE atomic full-rewrite
    commit — deletes folded, key blooms rebuilt, ``write.buckets`` flipped
    co-atomically so build and probe always hash with the same bucket count
    (the invariant moonlink pins per persisted index file,
    persisted_bucket_hash_map.rs:73-93). Content must be byte-identical."""
    from moonlink_spark.operators.rebucket import rebucket_table
    from moonlink_spark.table.scan import scan

    t = _lifecycle_table(spark, sf_dir)
    rebucket_table(spark, t, 8)
    return scan(spark, t).select(*_LIFECYCLE_COLS)


def q_engine_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e through the PySpark Python DataSource integration surface
    (moonlink_spark/datasource.py): ``spark.read.format("moonlink")`` over
    the post-MERGE lifecycle fork — partitions planned from snapshot
    metadata only, executor-side pyarrow reads applying the packed-bitmap
    deletion vectors per file. Must equal the engine scan's closed form,
    proving the out-of-library read path (DV application, column
    resolution) byte-matches table.scan."""
    from moonlink_spark.datasource import register

    t = _lifecycle_table(spark, sf_dir)
    register(spark)
    # explicit projection (the Python DataSource API has no pruning hook):
    # keeps the image payload off the Arrow transport — the documented
    # contract for wide-payload tables
    return (
        spark.read.format("moonlink")
        .option("columns", ",".join(_LIFECYCLE_COLS))
        .load(t.location)
        .select(*_LIFECYCLE_COLS)
    )


def q_engine_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: ANALYZE over the post-MERGE snapshot — ONE distributed
    aggregation (HLL++ NDV + exact nulls/sizes, operators/analyze.py)
    persisted as a puffin statistics file and read back. The oracled
    projection is the EXACT part (row count, null counts, byte sizes of the
    sized columns); NDV accuracy is pinned by pytest (test_analyze.py)."""
    from moonlink_spark.operators.analyze import analyze_table, table_stats

    t = _lifecycle_table(spark, sf_dir)
    analyze_table(spark, t, columns=["image_id", "fmt", "caption"])
    _, row_count, cols = table_stats(t)
    rows = [
        (c, row_count, cols[c]["null_count"], cols[c]["total_size_bytes"])
        for c in ("caption", "fmt", "image_id")
    ]
    return spark.createDataFrame(
        rows,
        "column string, row_count long, null_count long, total_size_bytes long",
    )


def q_engine_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: snapshot-isolation time travel — after both MERGE
    batches, read back at LSN 2 (post-batch-1 state)."""
    from moonlink_spark.table.scan import scan_at_lsn

    t = _lifecycle_table(spark, sf_dir)
    return scan_at_lsn(spark, t, lsn=2).select(*_LIFECYCLE_COLS)


def q_engine_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: incremental changelog read (CDC-out, table/changelog.py) —
    every row event the two MERGE commits applied after the initial load
    (insert events carry the post-image, delete events the pre-image; an
    upsert of a live key is a delete+insert pair at one LSN, moonlink's
    update decomposition, moonlink_sink.rs:286-317)."""
    from moonlink_spark.table.changelog import (
        CHANGE_LSN_COL,
        CHANGE_TYPE_COL,
        scan_changes,
    )

    t = _lifecycle_table(spark, sf_dir)
    return scan_changes(spark, t, 1, 3, columns=_LIFECYCLE_COLS).select(
        *_LIFECYCLE_COLS,
        F.col(CHANGE_TYPE_COL).alias("change_type"),
        F.col(CHANGE_LSN_COL).alias("change_lsn"),
    )


def q_engine_sync_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: incremental table→table replication (operators/sync.py) —
    a replica is synced after EVERY upstream commit by consuming the
    changelog window it has not seen (moonlink's replication-sink role,
    moonlink_sink.rs:179-258); the replica's final content must equal the
    upstream's final MERGE state (same closed form as engine_merge_scan)."""
    import tempfile

    from moonlink_spark.operators.sync import sync_table
    from moonlink_spark.schema import IMAGES_SCHEMA
    from moonlink_spark.table.catalog import create_table
    from moonlink_spark.table.scan import scan

    wd = tempfile.mkdtemp(prefix="moonlink_sync_")
    replica = create_table(f"{wd}/replica", IMAGES_SCHEMA)
    _lifecycle_table(
        spark, sf_dir, each_commit=lambda src: sync_table(spark, src, replica)
    )
    return scan(spark, replica.refresh()).select(*_LIFECYCLE_COLS)


def q_engine_rollback_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: snapshot ROLLBACK + replay (Table.rollback — Iceberg's
    rollback_to_snapshot with moonlink's recovery semantic: the flush LSN
    moves back so corrected batches replay at the undone LSNs,
    wal.rs:205-220). Lifecycle: both MERGE batches → rollback to LSN 2
    (batch 2 forks off the lineage: its ' v3' updates, deletes and inserts
    must all vanish) → a DIFFERENT corrected batch replays at LSN 3
    (update k%7==6 with ' r3', delete k%7==0, insert k%10==9 & k%3==0).
    The final state is closed-form only if the rollback truly erased batch
    2 and the replay applied on the restored state."""
    from moonlink_spark.operators.merge import merge_cdc_batch
    from moonlink_spark.table.scan import scan

    t = _lifecycle_table(spark, sf_dir)
    t.rollback(lsn=2)

    k = F.col("o_orderkey")
    orders = _t(spark, sf_dir, "orders")

    def rows(df):
        return df.select(
            k.cast("string").alias("image_id"),
            F.col("o_orderpriority").cast("binary").alias("bytes"),
            (k % 100).cast("int").alias("w"),
            F.length("o_orderpriority").cast("int").alias("h"),
            F.col("o_orderstatus").alias("fmt"),
            F.col("o_orderpriority").alias("caption"),
            F.col("o_custkey").cast("long").alias("phash"),
        )

    upd = rows(orders.filter((k % 10 < 3) & (k % 7 == 6))).withColumn(
        "caption", F.concat(F.col("caption"), F.lit(" r3"))
    )
    ins = rows(orders.filter((k % 10 == 9) & (k % 3 == 0)))
    u = upd.unionByName(ins).select(
        F.lit("U").alias("op"), F.col("image_id").cast("long").alias("lsn"), "*"
    )
    d = orders.filter((k % 10 < 3) & (k % 7 == 0)).select(
        F.lit("D").alias("op"),
        k.cast("long").alias("lsn"),
        k.cast("string").alias("image_id"),
        F.lit(None).cast("binary").alias("bytes"),
        F.lit(None).cast("int").alias("w"),
        F.lit(None).cast("int").alias("h"),
        F.lit(None).cast("string").alias("fmt"),
        F.lit(None).cast("string").alias("caption"),
        F.lit(None).cast("long").alias("phash"),
    )
    merge_cdc_batch(spark, t, u.unionByName(d), lsn=3)
    return scan(spark, t).select(*_LIFECYCLE_COLS)


def q_engine_wap_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: WRITE-AUDIT-PUBLISH via branch refs (table/refs.py —
    Iceberg's refs map; the batch analog of moonlink's LSN-gated visibility,
    mooncake_table.rs:407-412). A third CDC batch (update k%7==0 ' w4',
    delete k%7==3, insert k%10==9 & k%3==2, LSN 4) is MERGEd onto an audit
    BRANCH — the full operator stack (distributed planning, bucket/bloom
    probe, DV write) runs against the branch view. The returned frame holds
    BOTH phases: main scanned while the staged commit physically exists
    ('pre-publish' — must equal the 2-batch state, proving isolation) and
    main after fast_forward ('published' — must show batch 3). Both phases
    are closed-form, so the oracle checks isolation AND publication."""
    from moonlink_spark.operators.merge import merge_cdc_batch
    from moonlink_spark.table.refs import create_branch, fast_forward
    from moonlink_spark.table.scan import scan

    t = _lifecycle_table(spark, sf_dir)
    create_branch(t, "audit")
    bt = t.for_branch("audit")

    k = F.col("o_orderkey")
    orders = _t(spark, sf_dir, "orders")
    upd = _img_rows(orders.filter((k % 10 < 3) & (k % 7 == 0))).withColumn(
        "caption", F.concat(F.col("caption"), F.lit(" w4"))
    )
    ins = _img_rows(orders.filter((k % 10 == 9) & (k % 3 == 2)))
    u = upd.unionByName(ins).select(
        F.lit("U").alias("op"), F.col("image_id").cast("long").alias("lsn"), "*"
    )
    d = orders.filter((k % 10 < 3) & (k % 7 == 3)).select(
        F.lit("D").alias("op"),
        k.cast("long").alias("lsn"),
        k.cast("string").alias("image_id"),
        F.lit(None).cast("binary").alias("bytes"),
        F.lit(None).cast("int").alias("w"),
        F.lit(None).cast("int").alias("h"),
        F.lit(None).cast("string").alias("fmt"),
        F.lit(None).cast("string").alias("caption"),
        F.lit(None).cast("long").alias("phash"),
    )
    merge_cdc_batch(spark, bt, u.unionByName(d), lsn=4)

    # scan() pins the snapshot's file set at CALL time, so this plan reads
    # main's pre-publish state even though it executes after the publish
    pre = scan(spark, t.refresh(), columns=_LIFECYCLE_COLS).withColumn(
        "phase", F.lit("pre-publish")
    )
    fast_forward(t, "audit", drop=True)
    post = scan(spark, t, columns=_LIFECYCLE_COLS).withColumn(
        "phase", F.lit("published")
    )
    return pre.unionByName(post)


def q_engine_lazy_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: LAZY MERGE via equality deletes (operators/merge.py
    mode='lazy' → format.py EQ_DELETES; moonlink's delete-by-key buffering,
    mooncake_table.rs:1160-1184, as Iceberg v2 eq-deletes). Both lifecycle
    CDC batches commit with ZERO table reads — keys land in eq-delete files
    resolved at scan under the sequence rule (a commit's own upserts
    survive, every older key version dies). Three phases in one frame:
    'merge-on-read' (eq keys applied by the scan anti-join), 'resolved'
    (after rewrite_equality_deletes pays the key probe ONCE and converts
    keys to positional DVs — data files byte-identical, eq files dropped),
    and 'compacted' (after full maintenance folds everything into
    rewrites) — all must equal the eager-MERGE closed form, proving
    read-path application ≡ key-probe resolution ≡ compaction folding ≡
    eager probing."""
    from moonlink_spark.operators.compact import rewrite_equality_deletes
    from moonlink_spark.operators.maintenance import optimize_table
    from moonlink_spark.table.scan import scan

    t = _build_lifecycle_table(spark, sf_dir, merge_mode="lazy")
    pre = scan(spark, t, columns=_LIFECYCLE_COLS).withColumn(
        "phase", F.lit("merge-on-read")
    )
    rewrite_equality_deletes(spark, t)
    mid = scan(spark, t.refresh(), columns=_LIFECYCLE_COLS).withColumn(
        "phase", F.lit("resolved")
    )
    optimize_table(spark, t, mode="full", retain_last=10)
    post = scan(spark, t.refresh(), columns=_LIFECYCLE_COLS).withColumn(
        "phase", F.lit("compacted")
    )
    return pre.unionByName(mid).unionByName(post)


def q_engine_resume_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: crash-resume + orphan GC behind the oracle (moonlink O25 —
    WAL replay on recovery, wal.rs:205-220; failure_tests.rs). A third CDC
    batch's MERGE is killed after its delete/data files are written but
    BEFORE the metadata CAS: the table stays logically unchanged (files are
    invisible until commit — the streaming-abort guarantee,
    transaction_stream.rs:137-143). Re-running with the same checkpoint
    ADOPTS the already-written files (no recompute) and commits exactly once;
    a further re-run at the committed LSN is an idempotent no-op (the
    WAL-truncation rule: events at or below the persisted LSN never replay).
    A second crashed job that is never resumed leaves true orphans, which
    remove_orphan_files sweeps without touching live state. Exactly-once is
    what the oracle hash checks: double-applied deletes/inserts would change
    row count or values. Final content = closed form of base + b1 + b2 + b3."""
    import tempfile

    from moonlink_spark.operators.merge import merge_cdc_batch
    from moonlink_spark.operators.orphans import remove_orphan_files
    from moonlink_spark.table.catalog import Table
    from moonlink_spark.table.scan import scan

    k = F.col("o_orderkey")
    orders = _t(spark, sf_dir, "orders")
    t = _lifecycle_table(spark, sf_dir)

    def upd(df, suffix):
        return (
            _img_rows(df)
            .withColumn("caption", F.concat(F.col("caption"), F.lit(suffix)))
            .select(
                F.lit("U").alias("op"),
                F.col("image_id").cast("long").alias("lsn"),
                "*",
            )
        )

    def dele(df):
        return df.select(
            F.lit("D").alias("op"),
            k.cast("long").alias("lsn"),
            k.cast("string").alias("image_id"),
            F.lit(None).cast("binary").alias("bytes"),
            F.lit(None).cast("int").alias("w"),
            F.lit(None).cast("int").alias("h"),
            F.lit(None).cast("string").alias("fmt"),
            F.lit(None).cast("string").alias("caption"),
            F.lit(None).cast("long").alias("phash"),
        )

    # b3: upd k%7==3, del k%7==6 (both untouched by b1/b2), ins k%10==9
    b3 = (
        upd(orders.filter((k % 10 < 3) & (k % 7 == 3)), " v4")
        .unionByName(dele(orders.filter((k % 10 < 3) & (k % 7 == 6))))
        .unionByName(
            _img_rows(orders.filter((k % 10 == 9) & (k % 3 == 2))).select(
                F.lit("U").alias("op"),
                F.col("image_id").cast("long").alias("lsn"),
                "*",
            )
        )
    )

    real_commit = Table.commit

    def crash(self, *a, **kw):
        raise RuntimeError("injected crash before metadata commit")

    ck = tempfile.mkdtemp(prefix="moonlink_resume_ck_")
    Table.commit = crash
    try:
        try:
            merge_cdc_batch(spark, t, b3, lsn=4, checkpoint_root=ck)
        except RuntimeError:
            pass
    finally:
        Table.commit = real_commit
    t.refresh()  # crashed job left no snapshot; its files are invisible

    res = merge_cdc_batch(spark, t, b3, lsn=4, checkpoint_root=ck)
    if res.skipped:
        raise AssertionError("resume must commit (table LSN below batch LSN)")
    res2 = merge_cdc_batch(spark, t, b3, lsn=4, checkpoint_root=ck)
    if not res2.skipped:
        raise AssertionError("re-run at a committed LSN must be a no-op")

    # a job that crashes and is NEVER resumed leaves genuine orphans
    Table.commit = crash
    try:
        try:
            merge_cdc_batch(
                spark,
                t,
                upd(orders.filter((k % 10 < 3) & (k % 7 == 0)), " XX"),
                lsn=5,
            )
        except RuntimeError:
            pass
    finally:
        Table.commit = real_commit
    t.refresh()
    swept = remove_orphan_files(t, grace_ms=0)
    if swept.deleted == 0:
        raise AssertionError("crashed job's files must be swept as orphans")
    return scan(spark, t).select(*_LIFECYCLE_COLS)


def _img_rows(df: DataFrame) -> DataFrame:
    """orders → image-schema rows (same mapping as _lifecycle_table)."""
    k = F.col("o_orderkey")
    return df.select(
        k.cast("string").alias("image_id"),
        F.col("o_orderpriority").cast("binary").alias("bytes"),
        (k % 100).cast("int").alias("w"),
        F.length("o_orderpriority").cast("int").alias("h"),
        F.col("o_orderstatus").alias("fmt"),
        F.col("o_orderpriority").alias("caption"),
        F.col("o_custkey").cast("long").alias("phash"),
    )


def q_engine_stream_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: streaming transactions (moonlink O6,
    transaction_stream.rs:137-143) — one multi-append transaction COMMITS
    (updates + deletes land as a single snapshot), a second transaction
    ABORTS (its staged rows must never be visible)."""
    import tempfile

    from moonlink_spark.schema import IMAGES_SCHEMA
    from moonlink_spark.streaming.stream import StreamingTransaction
    from moonlink_spark.table.catalog import create_table
    from moonlink_spark.table.scan import scan
    from moonlink_spark.table.writer import write_data_files

    k = F.col("o_orderkey")
    orders = _t(spark, sf_dir, "orders")
    wd = tempfile.mkdtemp(prefix="moonlink_stream_")
    t = create_table(f"{wd}/tbl", IMAGES_SCHEMA)
    entries = write_data_files(
        spark, _img_rows(orders.filter(k % 10 < 3)), t.new_data_dir()
    )
    t.commit("append", added=entries, lsn=1)

    def upd(df, suffix):
        return (
            _img_rows(df)
            .withColumn("caption", F.concat(F.col("caption"), F.lit(suffix)))
            .select(
                F.lit("U").alias("op"),
                F.col("image_id").cast("long").alias("lsn"),
                "*",
            )
        )

    def dele(df):
        return df.select(
            F.lit("D").alias("op"),
            k.cast("long").alias("lsn"),
            k.cast("string").alias("image_id"),
            F.lit(None).cast("binary").alias("bytes"),
            F.lit(None).cast("int").alias("w"),
            F.lit(None).cast("int").alias("h"),
            F.lit(None).cast("string").alias("fmt"),
            F.lit(None).cast("string").alias("caption"),
            F.lit(None).cast("long").alias("phash"),
        )

    tx = StreamingTransaction(spark, t)
    tx.append(upd(orders.filter((k % 10 < 3) & (k % 7 == 1)), " s2"))
    tx.append(dele(orders.filter((k % 10 < 3) & (k % 7 == 2))))
    tx.commit(lsn=2)

    tx2 = StreamingTransaction(spark, t)
    tx2.append(upd(orders.filter((k % 10 < 3) & (k % 7 == 3)), " XX"))
    tx2.abort()  # staged rows discarded — never visible

    return scan(spark, t).select(*_LIFECYCLE_COLS)


def q_engine_evolve_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: schema evolution (moonlink O18, AlterTable
    mooncake_table.rs:96-123) + bulk file ingest (O22, add_files
    batch_ingestion.rs:21-120) — add a column, adopt external parquet that
    HAS it, drop another; old files read NULL for the new column."""
    import tempfile

    from pyspark.sql.types import IntegerType, StringType, StructField

    from moonlink_spark.operators.evolve import add_columns, drop_columns
    from moonlink_spark.operators.ingest import add_files
    from moonlink_spark.schema import IMAGES_SCHEMA
    from moonlink_spark.table.catalog import create_table
    from moonlink_spark.table.scan import scan
    from moonlink_spark.table.writer import list_parquet, write_data_files

    k = F.col("o_orderkey")
    orders = _t(spark, sf_dir, "orders")
    wd = tempfile.mkdtemp(prefix="moonlink_evolve_")
    t = create_table(f"{wd}/tbl", IMAGES_SCHEMA)
    entries = write_data_files(
        spark, _img_rows(orders.filter(k % 10 < 3)), t.new_data_dir()
    )
    t.commit("append", added=entries, lsn=1)

    add_columns(t, [StructField("rating", IntegerType(), True)])
    drop_columns(t, ["fmt"])

    ext = (
        _img_rows(orders.filter(k % 10 == 9))
        .drop("fmt")  # matches the post-evolution schema
        .withColumn("rating", (F.col("image_id").cast("long") % 5).cast("int"))
    )
    ext_dir = f"{wd}/external"
    ext.write.parquet(ext_dir)
    add_files(spark, t, list_parquet(ext_dir), lsn=2)

    # field-id no-resurrection (O18 the moonlink way, PARQUET:field_id —
    # bench_write.rs:33-44): full maintenance rewrites every live file with
    # stamped ids (foreign ingested parquet included), then caption is
    # dropped and RE-ADDED under the same name. The re-added column has a
    # fresh id, so files still physically holding old caption values must
    # read NULL — identity resolution, not name matching.
    from moonlink_spark.operators.maintenance import optimize_table

    optimize_table(spark, t, mode="full", retain_last=4)
    drop_columns(t, ["caption"])
    add_columns(t, [StructField("caption", StringType(), True)])

    return scan(spark, t).select("image_id", "caption", "rating")


def q_engine_typed_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e over the FULL type envelope (SURVEY §1.3, moonlink
    RowValue types moonlink_type.rs:5-21): a table with Decimal(12,2),
    Timestamp(µs), Date, List<long> and Struct columns through create →
    MERGE×2 (updates touching every typed column) → FULL maintenance →
    scan. The compared projection reduces list/struct to scalar derivatives
    so the oracle hash is representation-stable; the lifecycle itself
    stores, merges, compacts and rewrites the nested values."""
    import tempfile

    from pyspark.sql.types import (
        ArrayType,
        DateType,
        DecimalType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from moonlink_spark.operators.maintenance import optimize_table
    from moonlink_spark.operators.merge import merge_cdc_batch
    from moonlink_spark.table.catalog import create_table
    from moonlink_spark.table.scan import scan
    from moonlink_spark.table.writer import write_data_files

    typed_schema = StructType(
        [
            StructField("k", StringType(), False),
            StructField("amount", DecimalType(12, 2), True),
            StructField("ts", TimestampType(), True),
            StructField("d", DateType(), True),
            StructField("tags", ArrayType(LongType()), True),
            StructField(
                "meta",
                StructType(
                    [
                        StructField("a", IntegerType(), True),
                        StructField("b", StringType(), True),
                    ]
                ),
                True,
            ),
        ]
    )
    k = F.col("o_orderkey")

    def rows(df):
        return df.select(
            k.cast("string").alias("k"),
            F.col("o_totalprice").cast("decimal(12,2)").alias("amount"),
            F.col("o_orderdate").alias("ts"),
            F.col("o_orderdate").cast("date").alias("d"),
            F.array(F.col("o_custkey").cast("long"), (k % 7).cast("long")).alias("tags"),
            F.struct(
                (k % 100).cast("int").alias("a"),
                F.col("o_orderpriority").alias("b"),
            ).alias("meta"),
        )

    def as_cdc(df):
        return df.select(
            F.lit("U").alias("op"), F.col("k").cast("long").alias("lsn"), "*"
        )

    def dels(df):
        return df.select(
            F.lit("D").alias("op"),
            k.cast("long").alias("lsn"),
            k.cast("string").alias("k"),
            F.lit(None).cast("decimal(12,2)").alias("amount"),
            F.lit(None).cast("timestamp").alias("ts"),
            F.lit(None).cast("date").alias("d"),
            F.lit(None).cast("array<long>").alias("tags"),
            F.lit(None).cast("struct<a:int,b:string>").alias("meta"),
        )

    orders = _t(spark, sf_dir, "orders")
    base = orders.filter(k % 10 < 4)
    wd = tempfile.mkdtemp(prefix="moonlink_typed_")
    t = create_table(f"{wd}/tbl", typed_schema)
    entries = write_data_files(
        spark, rows(base), t.new_data_dir(), field_id_schema=t.schema
    )
    t.commit("append", added=entries, lsn=1)

    # batch 1: update amount + struct field; delete a disjoint class
    upd1 = rows(orders.filter((k % 10 < 4) & (k % 5 == 1))).withColumn(
        "amount", (F.col("amount") + F.lit(1.11)).cast("decimal(12,2)")
    ).withColumn(
        "meta",
        F.struct(F.col("meta.a").alias("a"), F.concat(F.col("meta.b"), F.lit(" v2")).alias("b")),
    )
    b1 = as_cdc(upd1).unionByName(dels(orders.filter((k % 10 < 4) & (k % 5 == 2))))
    merge_cdc_batch(spark, t, b1, lsn=2, key="k")

    # batch 2: update timestamp + list; insert a new key class
    upd2 = rows(orders.filter((k % 10 < 4) & (k % 5 == 3))).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 1 DAY")
    ).withColumn("tags", F.concat(F.col("tags"), F.array(F.lit(99).cast("long"))))
    ins2 = rows(orders.filter((k % 10 == 6) & (k % 3 == 0)))
    merge_cdc_batch(spark, t, as_cdc(upd2.unionByName(ins2)), lsn=3, key="k")

    optimize_table(spark, t, mode="full", retain_last=2)

    out = scan(spark, t)
    return out.select(
        "k",
        F.round(F.col("amount").cast("double"), 2).alias("amount_d"),
        F.unix_timestamp("ts").alias("ts_s"),
        F.col("d").cast("string").alias("d_s"),
        F.size("tags").cast("long").alias("n_tags"),
        F.element_at("tags", 1).alias("tag0"),
        F.col("meta.a").alias("meta_a"),
        F.col("meta.b").alias("meta_b"),
    )


def q_engine_composite_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: COMPOSITE row identity (moonlink IdentityProp::Keys,
    moonlink_row.rs:271-280) over lineitem's natural primary key
    (l_orderkey, l_linenumber) — create (identity + bucketed layout declared
    over BOTH columns) → MERGE batch 1 (update one line of an order, delete
    a sibling line; other lines of the same order must survive) → FULL
    maintenance (bucketize + blooms hash the composite key) → MERGE batch 2
    (post-maintenance updates probe the composite-bucketed layout, plus
    fresh inserts) → scan."""
    import tempfile

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from moonlink_spark.operators.maintenance import optimize_table
    from moonlink_spark.operators.merge import merge_cdc_batch
    from moonlink_spark.schema import IDENTITY_PROP
    from moonlink_spark.table.catalog import create_table
    from moonlink_spark.table.scan import scan
    from moonlink_spark.table.writer import BUCKETS_PROP, write_data_files

    lines_schema = StructType(
        [
            StructField("okey", LongType(), False),
            StructField("lineno", IntegerType(), False),
            StructField("qty", DoubleType(), True),
            StructField("ret", StringType(), True),
        ]
    )

    def rows(df):
        return df.select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_linenumber").alias("lineno"),
            F.col("l_quantity").alias("qty"),
            F.col("l_returnflag").alias("ret"),
        )

    def as_cdc(df, lsn):
        return df.select(
            F.lit("U").alias("op"), F.lit(lsn).cast("long").alias("lsn"), "*"
        )

    li = _t(spark, sf_dir, "lineitem")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber")
    base = li.filter(ok % 10 < 3)
    wd = tempfile.mkdtemp(prefix="moonlink_composite_")
    t = create_table(
        f"{wd}/tbl",
        lines_schema,
        properties={IDENTITY_PROP: "okey,lineno", BUCKETS_PROP: "16"},
    )
    t.commit(
        "append",
        added=write_data_files(
            spark, rows(base), t.new_data_dir(), field_id_schema=t.schema
        ),
        lsn=1,
    )

    # batch 1: update line 1 of every okey%5==1 order; delete line 2 of
    # every okey%5==2 order — sibling lines with the same okey but another
    # lineno are DIFFERENT identities and must be untouched
    upd1 = rows(base.filter((ok % 5 == 1) & (ln == 1))).withColumn(
        "qty", F.col("qty") + F.lit(100.0)
    )
    del1 = rows(base.filter((ok % 5 == 2) & (ln == 2))).select(
        F.lit("D").alias("op"), F.lit(2).cast("long").alias("lsn"), "*"
    )
    merge_cdc_batch(spark, t, as_cdc(upd1, 2).unionByName(del1), lsn=2)

    optimize_table(spark, t, mode="full", retain_last=2)

    # batch 2 (post-maintenance, probes the composite-bucketed layout):
    # update line 3 of okey%5==3 orders; insert lineitem rows from a
    # disjoint okey class as brand-new identities
    upd2 = rows(base.filter((ok % 5 == 3) & (ln == 3))).withColumn(
        "qty", F.col("qty") * F.lit(2.0)
    )
    ins2 = rows(li.filter(ok % 10 == 4))
    merge_cdc_batch(spark, t, as_cdc(upd2.unionByName(ins2), 3), lsn=3)

    return scan(spark, t).select("okey", "lineno", "qty", "ret")


def q_engine_ingest_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: the REST row-event contract (moonlink O29,
    rest_ingest/event_request.rs:10-26 — Insert/Upsert/Delete row events,
    monotone LSN assignment, batch-atomic flush, base64 binary payloads)
    driven through RowEventIngestor to a closed-form state: two flushes,
    each one MERGE snapshot."""
    import base64
    import tempfile

    from moonlink_spark.ingest_api import RowEventIngestor
    from moonlink_spark.schema import IMAGES_SCHEMA
    from moonlink_spark.table.catalog import create_table
    from moonlink_spark.table.scan import scan
    from moonlink_spark.table.writer import write_data_files

    k = F.col("o_orderkey")
    orders = _t(spark, sf_dir, "orders")
    wd = tempfile.mkdtemp(prefix="moonlink_ingest_")
    t = create_table(f"{wd}/tbl", IMAGES_SCHEMA)
    entries = write_data_files(
        spark, _img_rows(orders.filter(k % 10 < 3)), t.new_data_dir(),
        field_id_schema=t.schema,
    )
    t.commit("append", added=entries, lsn=1)

    ing = RowEventIngestor(spark, t)  # next lsn auto = 2

    def payload(r, caption, b64=False):
        body = caption.encode()
        return {
            "image_id": r["image_id"],
            "bytes": base64.b64encode(body).decode() if b64 else body,
            "w": r["w"], "h": r["h"], "fmt": r["fmt"],
            "caption": caption, "phash": r["phash"],
        }

    # flush 1: upserts (k%7==3, caption ' u2'), deletes (k%7==6),
    # inserts of a new key class (k%10==4 and k%3==0) with base64 bytes
    up1 = _img_rows(orders.filter((k % 10 < 3) & (k % 7 == 3))).collect()
    for r in up1:
        ing.upsert(payload(r, r["caption"] + " u2"))
    for r in orders.filter((k % 10 < 3) & (k % 7 == 6)).select(
        k.cast("string").alias("image_id")
    ).collect():
        ing.delete(r["image_id"])
    for r in _img_rows(orders.filter((k % 10 == 4) & (k % 3 == 0))).collect():
        ing.insert(payload(r, "ing", b64=True))
    res1 = ing.flush()
    assert res1 is not None and not res1.skipped

    # flush 2: a second upsert wave (k%7==1, caption ' u3') — LSN monotone
    for r in _img_rows(orders.filter((k % 10 < 3) & (k % 7 == 1))).collect():
        ing.upsert(payload(r, r["caption"] + " u3"))
    res2 = ing.flush()
    assert res2 is not None and res2.snapshot.summary["lsn"] == res1.snapshot.summary["lsn"] + 1

    # base64 round-trip check rides the result: decoded bytes == caption
    out = scan(spark, t)
    return out.select(
        "image_id",
        "caption",
        "phash",
        (F.col("bytes") == F.col("caption").cast("binary")).alias("bytes_ok"),
    )


def q_engine_rest_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: the REST service END-TO-END over real HTTP (moonlink O29
    incl. transport, rest_api.rs:196-204) — create table via POST, bulk-load
    via /upload (add_files), upsert/delete/insert row events via /ingest
    (base64 binary), one sync flush = one MERGE snapshot. Closed form:
      base   : k%10<3                      (uploaded parquet)
      upsert : k%10<3  and k%97==1         (caption + ' r2')
      delete : k%10<3  and k%97==2
      insert : k%10==6 and k%97==3         (caption 'rest')
    """
    import base64
    import json as _json
    import tempfile
    import threading
    import urllib.request

    from moonlink_spark.service import make_server
    from moonlink_spark.table.scan import scan

    k = F.col("o_orderkey")
    orders = _t(spark, sf_dir, "orders")
    wd = tempfile.mkdtemp(prefix="moonlink_rest_")
    srv = make_server(spark, f"{wd}/tables")
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    base_url = f"http://127.0.0.1:{srv.server_address[1]}"

    def post(path, body):
        req = urllib.request.Request(
            f"{base_url}{path}", data=_json.dumps(body).encode(), method="POST"
        )
        req.add_header("Content-Type", "application/json")
        with urllib.request.urlopen(req, timeout=300) as resp:
            assert resp.status == 200
            return _json.loads(resp.read())

    try:
        post("/tables/imgs", {})
        load_dir = f"{wd}/load"
        _img_rows(orders.filter(k % 10 < 3)).write.parquet(load_dir)
        import glob

        post("/upload/imgs", {
            "operation": "insert",
            "files": sorted(glob.glob(f"{load_dir}/*.parquet")),
        })

        def payload(r, caption):
            return {
                "image_id": r["image_id"],
                "bytes": base64.b64encode(caption.encode()).decode(),
                "w": r["w"], "h": r["h"], "fmt": r["fmt"],
                "caption": caption, "phash": r["phash"],
            }

        for r in _img_rows(orders.filter((k % 10 < 3) & (k % 97 == 1))).collect():
            post("/ingest/imgs", {"operation": "upsert",
                                  "data": payload(r, r["caption"] + " r2")})
        for r in orders.filter((k % 10 < 3) & (k % 97 == 2)).select(
            k.cast("string").alias("image_id")
        ).collect():
            post("/ingest/imgs", {"operation": "delete",
                                  "data": {"image_id": r["image_id"]}})
        for r in _img_rows(orders.filter((k % 10 == 6) & (k % 97 == 3))).collect():
            post("/ingest/imgs", {"operation": "insert",
                                  "data": payload(r, "rest")})
        ack = post("/ingest/imgs", {"operation": "flush"})
        assert isinstance(ack["lsn"], int), ack

        t = srv.RequestHandlerClass.state._get("imgs")[0]
        return scan(spark, t).select(
            "image_id",
            "caption",
            "phash",
            (F.col("bytes") == F.col("caption").cast("binary")).alias("bytes_ok"),
        )
    finally:
        srv.shutdown()


def q_engine_pg_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: PostgreSQL logical replication (moonlink O28,
    pg_replicate/moonlink_sink.rs:188-392) — a synthesized pgoutput v2 wire
    session (proto + slot options per clients/postgres.rs:740,845) decoded
    byte-for-byte and applied through ReplicationSink:
      txn 1 (plain) : update k%7==2 (caption+' pg2'), delete k%7==5,
                      insert k%10==5 & k%3==0 (caption 'pg')  → one snapshot
      xid 900 stream: update k%7==3 (caption+' pg3'), COMMIT   → one snapshot
      xid 901 stream: delete k%7==1, ABORT                     → invisible
    bytes ride the hex-encoded bytea wire form; bytes_ok proves the binary
    round-trip (bytes always mirror the row's caption)."""
    import tempfile

    from moonlink_spark import pgoutput as pgo
    from moonlink_spark.pg_replication import ReplicationSink
    from moonlink_spark.schema import IMAGES_SCHEMA
    from moonlink_spark.table.catalog import create_table
    from moonlink_spark.table.scan import scan
    from moonlink_spark.table.writer import write_data_files

    k = F.col("o_orderkey")
    orders = _t(spark, sf_dir, "orders")
    wd = tempfile.mkdtemp(prefix="moonlink_pg_")
    t = create_table(f"{wd}/tbl", IMAGES_SCHEMA)
    entries = write_data_files(
        spark, _img_rows(orders.filter(k % 10 < 3)), t.new_data_dir(),
        field_id_schema=t.schema,
    )
    t.commit("append", added=entries, lsn=1)

    rel = pgo.Relation(
        relation_id=77, namespace="public", relation_name="images",
        replica_identity="d",
        columns=[
            pgo.RelationColumn(1, "image_id", pgo.TEXT, -1),
            pgo.RelationColumn(0, "bytes", pgo.BYTEA, -1),
            pgo.RelationColumn(0, "w", pgo.INT4, -1),
            pgo.RelationColumn(0, "h", pgo.INT4, -1),
            pgo.RelationColumn(0, "fmt", pgo.VARCHAR, -1),
            pgo.RelationColumn(0, "caption", pgo.TEXT, -1),
            pgo.RelationColumn(0, "phash", pgo.INT8, -1),
        ],
    )

    def payload(r, caption):
        return {
            "image_id": r["image_id"], "bytes": caption.encode(),
            "w": r["w"], "h": r["h"], "fmt": r["fmt"],
            "caption": caption, "phash": r["phash"],
        }

    enc = pgo.PgOutputEncoder()
    base = orders.filter(k % 10 < 3)
    frames = [enc.xlogdata(enc.begin(1000, xid=11)), enc.xlogdata(enc.relation(rel))]
    for r in _img_rows(base.filter(k % 7 == 2)).collect():
        frames.append(enc.xlogdata(enc.update(
            rel, payload(r, r["caption"] + " pg2"), key={"image_id": r["image_id"]}
        )))
    for r in base.filter(k % 7 == 5).select(
        k.cast("string").alias("image_id")
    ).collect():
        frames.append(enc.xlogdata(enc.delete(rel, key={"image_id": r["image_id"]})))
    for r in _img_rows(orders.filter((k % 10 == 5) & (k % 3 == 0))).collect():
        frames.append(enc.xlogdata(enc.insert(rel, payload(r, "pg"))))
    frames.append(enc.xlogdata(enc.commit(1000, 1000)))

    frames.append(enc.xlogdata(enc.stream_start(900, first=True)))
    for r in _img_rows(base.filter(k % 7 == 3)).collect():
        frames.append(enc.xlogdata(enc.update(
            rel, payload(r, r["caption"] + " pg3"), key={"image_id": r["image_id"]}
        )))
    frames.append(enc.xlogdata(enc.stream_stop()))
    frames.append(enc.xlogdata(enc.stream_start(901, first=True)))
    for r in base.filter(k % 7 == 1).select(
        k.cast("string").alias("image_id")
    ).collect():
        frames.append(enc.xlogdata(enc.delete(rel, key={"image_id": r["image_id"]})))
    frames.append(enc.xlogdata(enc.stream_stop()))
    frames.append(enc.xlogdata(enc.stream_commit(900, 2000, 2000)))
    frames.append(enc.xlogdata(enc.stream_abort(901)))
    frames.append(enc.keepalive(wal_end=2000))

    sink = ReplicationSink(spark, {"public.images": t})
    results = sink.apply_frames(frames)
    assert len(results) == 2 and all(not r.skipped for r in results)
    assert sink.applied_lsn == 2000

    return scan(spark, t).select(
        "image_id",
        "caption",
        "phash",
        (F.col("bytes") == F.col("caption").cast("binary")).alias("bytes_ok"),
    )


def q_engine_dedupe_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine e2e: content dedup as a MAINTENANCE COMMIT — the documents
    corpus plus injected exact copies (doc_id+100000 for doc_id%5==0) loaded
    into an engine table keyed by doc_id, then ``dedupe_table(strategy=
    "exact")`` removes every normalized-text duplicate as ONE MERGE delete
    snapshot (winner = min doc_id per group). Closed form: keep exactly the
    min-id member of each normalized-text group."""
    import tempfile

    from moonlink_spark.operators.dedupe import dedupe_table
    from moonlink_spark.schema import IDENTITY_PROP
    from moonlink_spark.table.catalog import create_table
    from moonlink_spark.table.scan import scan
    from moonlink_spark.table.writer import write_data_files

    docs = _t(spark, sf_dir, "documents")
    dup = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    wd = tempfile.mkdtemp(prefix="moonlink_dedupe_")
    t = create_table(
        f"{wd}/tbl", docs.schema, properties={IDENTITY_PROP: "doc_id"}
    )
    entries = write_data_files(
        spark, docs.unionByName(dup), t.new_data_dir(), field_id_schema=t.schema
    )
    t.commit("append", added=entries, lsn=1)

    res = dedupe_table(spark, t, text_col="text", strategy="exact")
    assert not res.skipped and res.removed > 0

    return scan(spark, t).select("doc_id", "lang", "source")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_latest_wins": q_cdc_latest_wins,
        "merge_upsert_semantics": q_merge_upsert_semantics,
        "salted_join_agg": q_salted_join_agg,
        "file_stats_minmax": q_file_stats_minmax,
        "bin_packing": q_bin_packing,
        "zorder_code": q_zorder_code,
        "pricing_summary": q_pricing_summary,
        "window_running": q_window_running,
        "topk_per_segment": q_topk_per_segment,
        "sessionization": q_sessionization,
        "doc_fingerprint": q_doc_fingerprint,
        "exact_dedup_stats": q_exact_dedup_stats,
        "text_quality": q_text_quality,
        "langid": q_langid,
        "ngram_jaccard_topk": q_ngram_jaccard_topk,
        "embedding_topk": q_embedding_topk,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash": q_simhash,
        "phash_near_dups": q_phash_near_dups,
        "engine_merge_scan": q_engine_merge_scan,
        "engine_range_scan": q_engine_range_scan,
        "engine_compact_scan": q_engine_compact_scan,
        "engine_scoped_compact": q_engine_scoped_compact,
        "engine_rebucket_scan": q_engine_rebucket_scan,
        "engine_analyze_stats": q_engine_analyze_stats,
        "engine_datasource_scan": q_engine_datasource_scan,
        "engine_cluster_scan": q_engine_cluster_scan,
        "engine_timetravel": q_engine_timetravel,
        "engine_changelog": q_engine_changelog,
        "engine_sync_scan": q_engine_sync_scan,
        "engine_rollback_scan": q_engine_rollback_scan,
        "engine_wap_scan": q_engine_wap_scan,
        "engine_lazy_scan": q_engine_lazy_scan,
        "engine_resume_scan": q_engine_resume_scan,
        "engine_stream_scan": q_engine_stream_scan,
        "engine_evolve_scan": q_engine_evolve_scan,
        "engine_typed_scan": q_engine_typed_scan,
        "engine_composite_scan": q_engine_composite_scan,
        "engine_ingest_api": q_engine_ingest_api,
        "engine_rest_scan": q_engine_rest_scan,
        "engine_pg_cdc": q_engine_pg_cdc,
        "engine_dedupe_scan": q_engine_dedupe_scan,
        "engine_ivf_topk": q_engine_ivf_topk,
        "engine_iceberg_publish": q_engine_iceberg_publish,
    }


# -------------------------------------------------------------------- oracle


def _minhash_sql_parts(
    filter_expr: str,
    num_hashes: int = 64,
    bands: int = 16,
    rows_per_band: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
) -> str:
    """Shared CTE prefix replaying dedup.minhash_signatures +
    lsh_candidate_pairs in DuckDB SQL: portable md5-derived 32-bit shingle
    hashes and the SAME seeded (a, b) permutation constants inlined."""
    from moonlink_spark.functions.dedup import _MERSENNE, minhash_coeffs

    a, b = minhash_coeffs(num_hashes, seed)
    mins = ",\n                ".join(
        f"list_min(list_transform(hs, h -> ({a[j]} * h + {b[j]}) % {_MERSENNE})) AS s{j}"
        for j in range(num_hashes)
    )
    band_structs = ", ".join(
        "struct_pack(band := {}, key := md5({}))".format(
            bb,
            " || ',' || ".join(
                f"CAST(s{bb * rows_per_band + r} AS VARCHAR)"
                for r in range(rows_per_band)
            ),
        )
        for bb in range(bands)
    )
    return f"""
            WITH d AS (
                SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
                FROM documents WHERE {filter_expr}
            ), sh AS (
                SELECT doc_id, list_distinct(list_transform(
                    range(1, greatest(len(t) - {shingle_n - 1}, 1) + 1),
                    i -> array_to_string(list_slice(t, i, i + {shingle_n - 1}), ' '))) AS shingles
                FROM d
            ), hx AS (
                SELECT doc_id, list_transform(shingles, s ->
                    CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)) AS hs
                FROM sh
            ), sig AS (
                SELECT doc_id, {mins}
                FROM hx
            ), bands_t AS (
                SELECT doc_id, bk.band AS band, bk.key AS key FROM (
                    SELECT doc_id, unnest([{band_structs}]) AS bk FROM sig
                )
            ), pairs AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM bands_t a JOIN bands_t b
                  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
            )
    """


def _simhash_sql(filter_expr: str, bits: int = 60) -> str:
    """Replay dedup.simhash_signatures in DuckDB SQL: portable 60-bit md5
    token hashes, per-bit +1/-1 votes, signature reconstruction."""
    votes = ",\n                       ".join(
        f"sum(((h >> {b}) & 1) * 2 - 1) AS v{b}" for b in range(bits)
    )
    recon = " + ".join(
        f"CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(bits)
    )
    return f"""
            WITH d AS (
                SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
                FROM documents WHERE {filter_expr}
            ), tok AS (
                SELECT doc_id, CAST('0x' || substr(md5(u), 1, 15) AS BIGINT) AS h
                FROM (SELECT doc_id, unnest(t) AS u FROM d)
            ), v AS (
                SELECT doc_id, {votes}
                FROM tok GROUP BY doc_id
            )
            SELECT doc_id AS id, CAST({recon} AS BIGINT) AS simhash
            FROM v ORDER BY id
    """


_LIFECYCLE_BASE_SQL = """
    WITH base AS (
        SELECT o_orderkey AS k, o_orderpriority AS c, o_custkey AS ph
        FROM orders
    )
"""


def _zorder_sql_terms() -> str:
    pk_terms = " + ".join(
        f"(((l_partkey % 256) >> {b}) & 1) * {1 << (2 * b + 1)}" for b in range(8)
    )
    sk_terms = " + ".join(
        f"(((l_suppkey % 256) >> {b}) & 1) * {1 << (2 * b)}" for b in range(8)
    )
    return f"CAST({pk_terms} + {sk_terms} AS BIGINT)"


def oracle_sql() -> dict[str, str]:
    toks = "regexp_split_to_array(trim(text), '\\s+')"
    toks_l = "regexp_split_to_array(trim(lower(text)), '\\s+')"
    return {
        "cdc_latest_wins": f"""
            SELECT user_id,
                   event_id AS last_event_id,
                   event_type AS last_event_type,
                   round(value, 6) AS last_value
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id
                    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "merge_upsert_semantics": """
            WITH base AS (
                SELECT o_orderkey, round(o_totalprice, 2) AS price
                FROM orders WHERE o_orderkey % 3 <> 0
            ), cdc AS (
                SELECT o_orderkey,
                       CASE WHEN o_orderkey % 4 = 0 THEN 'D' ELSE 'U' END AS op,
                       round(o_totalprice * 2, 2) AS new_price
                FROM orders WHERE o_orderkey % 2 = 0
            )
            SELECT coalesce(c.o_orderkey, b.o_orderkey) AS o_orderkey,
                   CASE WHEN c.op = 'U' THEN c.new_price ELSE b.price END AS price,
                   CASE WHEN c.op = 'U' THEN 'upserted' ELSE 'kept' END AS status
            FROM base b FULL OUTER JOIN cdc c ON b.o_orderkey = c.o_orderkey
            WHERE c.op IS NULL OR c.op = 'U'
        """,
        "salted_join_agg": """
            SELECT c_mktsegment,
                   count(*) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "file_stats_minmax": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS n_rows,
                   CAST(min(l_quantity) AS BIGINT) AS min_qty,
                   CAST(max(l_quantity) AS BIGINT) AS max_qty,
                   min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS min_price_cents,
                   max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS max_price_cents,
                   min(l_shipdate) AS min_shipdate,
                   max(l_shipdate) AS max_shipdate
            FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "bin_packing": """
            WITH files AS (
                SELECT l_orderkey, count(*) AS size_units
                FROM lineitem GROUP BY l_orderkey
            )
            SELECT l_orderkey, size_units,
                   CAST(floor((sum(size_units) OVER (
                        ORDER BY l_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - size_units) / 50) AS BIGINT) AS bin
            FROM files
        """,
        "zorder_code": f"""
            SELECT l_orderkey, l_linenumber, {_zorder_sql_terms()} AS zcode
            FROM lineitem
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_units,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "window_running": """
            SELECT user_id, event_id,
                   count(*) OVER w AS run_cnt,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS run_sum_cents
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "topk_per_segment": """
            SELECT c_mktsegment, o_orderkey, round(o_totalprice, 2) AS price, rank
            FROM (
                SELECT c_mktsegment, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY c_mktsegment
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rank
                FROM orders JOIN customer ON o_custkey = c_custkey
            ) WHERE rank <= 5
        """,
        "sessionization": """
            SELECT user_id, event_id,
                   CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
            FROM (
                SELECT user_id, event_id, ts,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                 IS NULL
                                 OR epoch_us(ts) - epoch_us(lag(ts) OVER (
                                    PARTITION BY user_id ORDER BY ts, event_id))
                                    > 30 * 60 * 1000000
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
            )
        """,
        "doc_fingerprint": """
            SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
            FROM documents
        """,
        "exact_dedup_stats": """
            SELECT source, count(*) AS n_docs,
                   count(DISTINCT regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                       AS n_distinct
            FROM documents GROUP BY source ORDER BY source
        """,
        "text_quality": f"""
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len({toks}) END AS n_tokens,
                   round(len(list_filter({toks_l}, x -> x IN {STOPWORDS_SQL}))
                         / greatest(len({toks_l}), 1), 6) AS stopword_ratio,
                   round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                         / greatest(length(text), 1), 6) AS punct_ratio
            FROM documents
        """,
        "langid": f"""
            SELECT doc_id,
                CASE
                  WHEN en >= de AND en >= fr AND en >= es AND en > 0 THEN 'en'
                  WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
                  WHEN fr >= es AND fr > 0 THEN 'fr'
                  WHEN es > 0 THEN 'es'
                  ELSE 'und' END AS lang_pred
            FROM (
                SELECT doc_id,
                       len(list_filter({toks_l}, x -> x IN ('the','and','of'))) AS en,
                       len(list_filter({toks_l}, x -> x IN ('der','und','die'))) AS de,
                       len(list_filter({toks_l}, x -> x IN ('le','et','la'))) AS fr,
                       len(list_filter({toks_l}, x -> x IN ('el','y','de'))) AS es
                FROM documents
            )
        """,
        "ngram_jaccard_topk": _minhash_sql_parts("doc_id < 150") + """
            SELECT id_a, id_b,
                   round(len(list_intersect(sa.shingles, sb.shingles)) /
                         (len(sa.shingles) + len(sb.shingles)
                          - len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
            FROM pairs
            JOIN sh sa ON sa.doc_id = id_a
            JOIN sh sb ON sb.doc_id = id_b
            ORDER BY jaccard DESC, id_a, id_b
            LIMIT 20
        """,
        "minhash_lsh_pairs": _minhash_sql_parts("doc_id < 200") + """
            SELECT id_a, id_b FROM pairs ORDER BY id_a, id_b
        """,
        "simhash": _simhash_sql("doc_id < 200"),
        "engine_merge_scan": _LIFECYCLE_BASE_SQL + """
            SELECT CAST(k AS VARCHAR) AS image_id,
                   CASE WHEN k % 10 < 3 AND k % 7 = 1 THEN c || ' v2'
                        WHEN k % 10 < 3 AND k % 7 = 4 THEN c || ' v3'
                        ELSE c END AS caption,
                   ph AS phash
            FROM base
            WHERE (k % 10 < 3 AND k % 7 NOT IN (2, 5))
               OR (k % 10 = 5 AND k % 3 = 0)
               OR (k % 10 = 7 AND k % 3 = 1)
        """,
        # state after rollback-to-LSN-2 + corrected replay at LSN 3: batch
        # 2's effects (v3 updates, k%7=5 deletes, k%10=7 inserts) are GONE;
        # the replay's update/delete/insert classes apply on the b1 state
        "engine_iceberg_publish": _LIFECYCLE_BASE_SQL + """
            SELECT CAST(k AS VARCHAR) AS image_id,
                   CASE WHEN k % 10 < 3 AND k % 7 = 1 THEN c || ' v2'
                        WHEN k % 10 < 3 AND k % 7 = 4 THEN c || ' v3'
                        ELSE c END AS caption,
                   ph AS phash
            FROM base
            WHERE (k % 10 < 3 AND k % 7 NOT IN (2, 5))
               OR (k % 10 = 5 AND k % 3 = 0)
               OR (k % 10 = 7 AND k % 3 = 1)
        """,
        "engine_rollback_scan": _LIFECYCLE_BASE_SQL + """
            SELECT CAST(k AS VARCHAR) AS image_id,
                   CASE WHEN k % 10 < 3 AND k % 7 = 1 THEN c || ' v2'
                        WHEN k % 10 < 3 AND k % 7 = 6 THEN c || ' r3'
                        ELSE c END AS caption,
                   ph AS phash
            FROM base
            WHERE (k % 10 < 3 AND k % 7 NOT IN (2, 0))
               OR (k % 10 = 5 AND k % 3 = 0)
               OR (k % 10 = 9 AND k % 3 = 0)
        """,
        # write-audit-publish: 'pre-publish' rows = the 2-batch state (the
        # staged branch commit is invisible on main); 'published' rows =
        # after fast-forward, batch 3 applied (w4 updates, k%7=3 deletes,
        # k%10=9&k%3=2 inserts)
        "engine_wap_scan": _LIFECYCLE_BASE_SQL + """
            SELECT image_id, caption, phash, phase FROM (
                SELECT CAST(k AS VARCHAR) AS image_id,
                       CASE WHEN k % 10 < 3 AND k % 7 = 1 THEN c || ' v2'
                            WHEN k % 10 < 3 AND k % 7 = 4 THEN c || ' v3'
                            ELSE c END AS caption,
                       ph AS phash, 'pre-publish' AS phase
                FROM base
                WHERE (k % 10 < 3 AND k % 7 NOT IN (2, 5))
                   OR (k % 10 = 5 AND k % 3 = 0)
                   OR (k % 10 = 7 AND k % 3 = 1)
                UNION ALL
                SELECT CAST(k AS VARCHAR) AS image_id,
                       CASE WHEN k % 10 < 3 AND k % 7 = 1 THEN c || ' v2'
                            WHEN k % 10 < 3 AND k % 7 = 4 THEN c || ' v3'
                            WHEN k % 10 < 3 AND k % 7 = 0 THEN c || ' w4'
                            ELSE c END AS caption,
                       ph AS phash, 'published' AS phase
                FROM base
                WHERE (k % 10 < 3 AND k % 7 NOT IN (2, 3, 5))
                   OR (k % 10 = 5 AND k % 3 = 0)
                   OR (k % 10 = 7 AND k % 3 = 1)
                   OR (k % 10 = 9 AND k % 3 = 2)
            )
        """,
        # lazy (equality-delete) MERGE: all three phases equal the eager
        # final state — 'merge-on-read' via the scan-time key anti-join,
        # 'resolved' after rewrite_equality_deletes converts keys to
        # positional DVs (no data rewrite), 'compacted' after maintenance
        # folds everything into rewrites
        "engine_lazy_scan": _LIFECYCLE_BASE_SQL + """
            SELECT CAST(k AS VARCHAR) AS image_id,
                   CASE WHEN k % 10 < 3 AND k % 7 = 1 THEN c || ' v2'
                        WHEN k % 10 < 3 AND k % 7 = 4 THEN c || ' v3'
                        ELSE c END AS caption,
                   ph AS phash, phase
            FROM base
            CROSS JOIN (SELECT UNNEST(['merge-on-read', 'resolved', 'compacted']) AS phase)
            WHERE (k % 10 < 3 AND k % 7 NOT IN (2, 5))
               OR (k % 10 = 5 AND k % 3 = 0)
               OR (k % 10 = 7 AND k % 3 = 1)
        """,
        # crash -> checkpoint resume -> idempotent re-run -> orphan sweep:
        # the final state is base + b1 + b2 + the exactly-once-applied b3
        # (upd k%7==3 ' v4', del k%7==6, ins k%10==9 & k%3==2); a crashed
        # never-resumed 4th job and the orphan sweep contribute nothing
        "engine_resume_scan": _LIFECYCLE_BASE_SQL + """
            SELECT CAST(k AS VARCHAR) AS image_id,
                   CASE WHEN k % 10 < 3 AND k % 7 = 1 THEN c || ' v2'
                        WHEN k % 10 < 3 AND k % 7 = 4 THEN c || ' v3'
                        WHEN k % 10 < 3 AND k % 7 = 3 THEN c || ' v4'
                        ELSE c END AS caption,
                   ph AS phash
            FROM base
            WHERE (k % 10 < 3 AND k % 7 NOT IN (2, 5, 6))
               OR (k % 10 = 5 AND k % 3 = 0)
               OR (k % 10 = 7 AND k % 3 = 1)
               OR (k % 10 = 9 AND k % 3 = 2)
        """,
        # replica synced per-commit over the changelog == upstream final state
        "engine_sync_scan": _LIFECYCLE_BASE_SQL + """
            SELECT CAST(k AS VARCHAR) AS image_id,
                   CASE WHEN k % 10 < 3 AND k % 7 = 1 THEN c || ' v2'
                        WHEN k % 10 < 3 AND k % 7 = 4 THEN c || ' v3'
                        ELSE c END AS caption,
                   ph AS phash
            FROM base
            WHERE (k % 10 < 3 AND k % 7 NOT IN (2, 5))
               OR (k % 10 = 5 AND k % 3 = 0)
               OR (k % 10 = 7 AND k % 3 = 1)
        """,
        "engine_range_scan": _LIFECYCLE_BASE_SQL + """
            SELECT * FROM (
                SELECT CAST(k AS VARCHAR) AS image_id,
                       CASE WHEN k % 10 < 3 AND k % 7 = 1 THEN c || ' v2'
                            WHEN k % 10 < 3 AND k % 7 = 4 THEN c || ' v3'
                            ELSE c END AS caption,
                       ph AS phash
                FROM base
                WHERE (k % 10 < 3 AND k % 7 NOT IN (2, 5))
                   OR (k % 10 = 5 AND k % 3 = 0)
                   OR (k % 10 = 7 AND k % 3 = 1)
            ) WHERE image_id BETWEEN '2' AND '5'
        """,
        # phash near-dup: completeness (pigeonhole) lets the oracle be the
        # plain quadratic form over the same portable derivation
        "phash_near_dups": """
    WITH ph AS (
        SELECT doc_id AS id,
               xor(xor(CAST('0x' || substr(md5(CAST(doc_id % 100 AS VARCHAR)),
                                           1, 15) AS BIGINT),
                       CASE WHEN doc_id % 3 = 0
                            THEN (CAST(1 AS BIGINT) << CAST(doc_id % 59 AS INT))
                            ELSE CAST(0 AS BIGINT) END),
                   CASE WHEN doc_id % 5 = 0
                        THEN (CAST(1 AS BIGINT) << CAST((doc_id * 7) % 59 AS INT))
                        ELSE CAST(0 AS BIGINT) END) AS phash
        FROM documents
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
    FROM ph a JOIN ph b ON a.id < b.id
    WHERE bit_count(xor(a.phash, b.phash)) <= 4
        """,
        # datasource read path == engine scan closed form
        "engine_datasource_scan": _LIFECYCLE_BASE_SQL + """
            SELECT CAST(k AS VARCHAR) AS image_id,
                   CASE WHEN k % 10 < 3 AND k % 7 = 1 THEN c || ' v2'
                        WHEN k % 10 < 3 AND k % 7 = 4 THEN c || ' v3'
                        ELSE c END AS caption,
                   ph AS phash
            FROM base
            WHERE (k % 10 < 3 AND k % 7 NOT IN (2, 5))
               OR (k % 10 = 5 AND k % 3 = 0)
               OR (k % 10 = 7 AND k % 3 = 1)
        """,
        # ANALYZE: exact fields (row count / nulls / byte sizes) of the
        # merged closed form; NDV is sketch-approximate and pytest-pinned
        "engine_analyze_stats": """
    WITH merged AS (
        SELECT CAST(o_orderkey AS VARCHAR) AS image_id,
               o_orderstatus AS fmt,
               CASE WHEN o_orderkey % 10 < 3 AND o_orderkey % 7 = 1
                        THEN o_orderpriority || ' v2'
                    WHEN o_orderkey % 10 < 3 AND o_orderkey % 7 = 4
                        THEN o_orderpriority || ' v3'
                    ELSE o_orderpriority END AS caption
        FROM orders
        WHERE (o_orderkey % 10 < 3 AND o_orderkey % 7 NOT IN (2, 5))
           OR (o_orderkey % 10 = 5 AND o_orderkey % 3 = 0)
           OR (o_orderkey % 10 = 7 AND o_orderkey % 3 = 1)
    )
    SELECT 'caption' AS "column", COUNT(*) AS row_count,
           CAST(SUM(CASE WHEN caption IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_count,
           CAST(SUM(LENGTH(caption)) AS BIGINT) AS total_size_bytes
    FROM merged
    UNION ALL
    SELECT 'fmt', COUNT(*),
           CAST(SUM(CASE WHEN fmt IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(LENGTH(fmt)) AS BIGINT)
    FROM merged
    UNION ALL
    SELECT 'image_id', COUNT(*),
           CAST(SUM(CASE WHEN image_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(LENGTH(image_id)) AS BIGINT)
    FROM merged
        """,
        # spot compaction preserves slice content; probe reads rewritten files
        "engine_scoped_compact": _LIFECYCLE_BASE_SQL + """
            SELECT * FROM (
                SELECT CAST(k AS VARCHAR) AS image_id,
                       CASE WHEN k % 10 < 3 AND k % 7 = 1 THEN c || ' v2'
                            WHEN k % 10 < 3 AND k % 7 = 4 THEN c || ' v3'
                            ELSE c END AS caption,
                       ph AS phash
                FROM base
                WHERE (k % 10 < 3 AND k % 7 NOT IN (2, 5))
                   OR (k % 10 = 5 AND k % 3 = 0)
                   OR (k % 10 = 7 AND k % 3 = 1)
            ) WHERE image_id BETWEEN '2' AND '5'
        """,
        # bucket rescale is a content-preserving full rewrite
        "engine_rebucket_scan": _LIFECYCLE_BASE_SQL + """
            SELECT CAST(k AS VARCHAR) AS image_id,
                   CASE WHEN k % 10 < 3 AND k % 7 = 1 THEN c || ' v2'
                        WHEN k % 10 < 3 AND k % 7 = 4 THEN c || ' v3'
                        ELSE c END AS caption,
                   ph AS phash
            FROM base
            WHERE (k % 10 < 3 AND k % 7 NOT IN (2, 5))
               OR (k % 10 = 5 AND k % 3 = 0)
               OR (k % 10 = 7 AND k % 3 = 1)
        """,
        "engine_compact_scan": _LIFECYCLE_BASE_SQL + """
            SELECT CAST(k AS VARCHAR) AS image_id,
                   CASE WHEN k % 10 < 3 AND k % 7 = 1 THEN c || ' v2'
                        WHEN k % 10 < 3 AND k % 7 = 4 THEN c || ' v3'
                        ELSE c END AS caption,
                   ph AS phash
            FROM base
            WHERE (k % 10 < 3 AND k % 7 NOT IN (2, 5))
               OR (k % 10 = 5 AND k % 3 = 0)
               OR (k % 10 = 7 AND k % 3 = 1)
        """,
        "engine_cluster_scan": _LIFECYCLE_BASE_SQL + """
            SELECT CAST(k AS VARCHAR) AS image_id,
                   CASE WHEN k % 10 < 3 AND k % 7 = 1 THEN c || ' v2'
                        WHEN k % 10 < 3 AND k % 7 = 4 THEN c || ' v3'
                        ELSE c END AS caption,
                   ph AS phash
            FROM base
            WHERE (k % 10 < 3 AND k % 7 NOT IN (2, 5))
               OR (k % 10 = 5 AND k % 3 = 0)
               OR (k % 10 = 7 AND k % 3 = 1)
        """,
        "engine_timetravel": _LIFECYCLE_BASE_SQL + """
            SELECT CAST(k AS VARCHAR) AS image_id,
                   CASE WHEN k % 10 < 3 AND k % 7 = 1 THEN c || ' v2'
                        ELSE c END AS caption,
                   ph AS phash
            FROM base
            WHERE (k % 10 < 3 AND k % 7 <> 2)
               OR (k % 10 = 5 AND k % 3 = 0)
        """,
        "engine_changelog": _LIFECYCLE_BASE_SQL + """
            -- closed-form event stream of the two lifecycle MERGE batches:
            -- an upsert of a live key = delete(pre-image) + insert(post-image)
            -- at the same LSN; batch-2 keys (k%7 in 4,5) were untouched by
            -- batch 1 (k%7 in 1,2), so their pre-images carry the original
            -- caption
            SELECT image_id, caption, phash, change_type, change_lsn FROM (
                SELECT CAST(k AS VARCHAR) AS image_id, c || ' v2' AS caption,
                       ph AS phash, 'insert' AS change_type,
                       CAST(2 AS BIGINT) AS change_lsn
                FROM base WHERE k % 10 < 3 AND k % 7 = 1
                UNION ALL
                SELECT CAST(k AS VARCHAR), c, ph, 'insert', 2
                FROM base WHERE k % 10 = 5 AND k % 3 = 0
                UNION ALL
                SELECT CAST(k AS VARCHAR), c, ph, 'delete', 2
                FROM base WHERE k % 10 < 3 AND k % 7 IN (1, 2)
                UNION ALL
                SELECT CAST(k AS VARCHAR), c || ' v3', ph, 'insert', 3
                FROM base WHERE k % 10 < 3 AND k % 7 = 4
                UNION ALL
                SELECT CAST(k AS VARCHAR), c, ph, 'insert', 3
                FROM base WHERE k % 10 = 7 AND k % 3 = 1
                UNION ALL
                SELECT CAST(k AS VARCHAR), c, ph, 'delete', 3
                FROM base WHERE k % 10 < 3 AND k % 7 IN (4, 5)
            )
        """,
        "engine_stream_scan": _LIFECYCLE_BASE_SQL + """
            SELECT CAST(k AS VARCHAR) AS image_id,
                   CASE WHEN k % 7 = 1 THEN c || ' s2' ELSE c END AS caption,
                   ph AS phash
            FROM base
            WHERE k % 10 < 3 AND k % 7 <> 2
        """,
        "engine_evolve_scan": _LIFECYCLE_BASE_SQL + """
            -- caption was dropped and re-added under a NEW field id after a
            -- full rewrite: every file's old caption values must read NULL
            SELECT CAST(k AS VARCHAR) AS image_id,
                   CAST(NULL AS VARCHAR) AS caption,
                   CASE WHEN k % 10 = 9 THEN CAST(k % 5 AS INTEGER)
                        ELSE NULL END AS rating
            FROM base
            WHERE k % 10 < 3 OR k % 10 = 9
        """,
        "engine_typed_scan": """
            -- final state after: base (k%10<4), b1 upd k%5=1 (amount+1.11,
            -- meta.b||' v2'), b1 del k%5=2, b2 upd k%5=3 (ts+1d, tags+[99]),
            -- b2 ins k%10=6 and k%3=0, then full compaction (content-neutral)
            WITH src AS (
                SELECT o_orderkey AS k, o_totalprice AS p, o_orderdate AS ts,
                       o_custkey AS ck, o_orderpriority AS pr
                FROM orders
            ), final AS (
                SELECT k, p, ts, ck, pr,
                       (k % 10 < 4 AND k % 5 = 1) AS up1,
                       (k % 10 < 4 AND k % 5 = 3) AS up2
                FROM src
                WHERE (k % 10 < 4 AND k % 5 <> 2) OR (k % 10 = 6 AND k % 3 = 0)
            )
            SELECT CAST(k AS VARCHAR) AS k,
                   round(CASE WHEN up1 THEN round(p, 2) + 1.11
                              ELSE round(p, 2) END, 2) AS amount_d,
                   CAST(epoch(CASE WHEN up2 THEN ts + INTERVAL 1 DAY
                                   ELSE ts END) AS BIGINT) AS ts_s,
                   CAST(CAST(ts AS DATE) AS VARCHAR) AS d_s,
                   CAST(CASE WHEN up2 THEN 3 ELSE 2 END AS BIGINT) AS n_tags,
                   ck AS tag0,
                   CAST(k % 100 AS INTEGER) AS meta_a,
                   CASE WHEN up1 THEN pr || ' v2' ELSE pr END AS meta_b
            FROM final
        """,
        "engine_composite_scan": """
            -- final state under composite identity (okey, lineno): base
            -- okey%10<3; b1 updates (okey%5=1, lineno=1) qty+100 and deletes
            -- (okey%5=2, lineno=2) ONLY (sibling linenos survive); full
            -- maintenance is content-neutral; b2 doubles qty at
            -- (okey%5=3, lineno=3) and inserts all okey%10=4 rows
            WITH src AS (
                SELECT l_orderkey AS okey, l_linenumber AS lineno,
                       l_quantity AS qty, l_returnflag AS ret
                FROM lineitem
            )
            SELECT okey, lineno,
                   CASE WHEN okey % 5 = 1 AND lineno = 1 THEN qty + 100.0
                        WHEN okey % 5 = 3 AND lineno = 3 THEN qty * 2.0
                        ELSE qty END AS qty,
                   ret
            FROM src
            WHERE okey % 10 < 3 AND NOT (okey % 5 = 2 AND lineno = 2)
            UNION ALL
            SELECT okey, lineno, qty, ret FROM src WHERE okey % 10 = 4
        """,
        "engine_ingest_api": _LIFECYCLE_BASE_SQL + """
            SELECT CAST(k AS VARCHAR) AS image_id,
                   CASE WHEN k % 7 = 3 THEN c || ' u2'
                        WHEN k % 7 = 1 THEN c || ' u3'
                        ELSE c END AS caption,
                   ph AS phash,
                   TRUE AS bytes_ok
            FROM base WHERE k % 10 < 3 AND k % 7 <> 6
            UNION ALL
            SELECT CAST(k AS VARCHAR), 'ing', ph, TRUE
            FROM base WHERE k % 10 = 4 AND k % 3 = 0
        """,
        "engine_dedupe_scan": """
            WITH all_docs AS (
                SELECT doc_id, text, lang, source FROM documents
                UNION ALL
                SELECT doc_id + 100000, text, lang, source
                FROM documents WHERE doc_id % 5 = 0
            ), norm AS (
                SELECT doc_id, lang, source,
                       regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt
                FROM all_docs
            ), keep AS (
                SELECT min(doc_id) AS doc_id FROM norm GROUP BY nt
            )
            SELECT n.doc_id, n.lang, n.source
            FROM norm n JOIN keep k ON n.doc_id = k.doc_id
        """,
        "engine_ivf_topk": """
            WITH cent AS (
                SELECT CAST(row_number() OVER (ORDER BY h) - 1 AS BIGINT)
                           AS cell,
                       embedding
                FROM (
                    SELECT md5(CAST(vec_id AS VARCHAR) || '-13') AS h,
                           embedding
                    FROM embeddings ORDER BY h LIMIT 8
                )
            ), corpus_cells AS (
                SELECT vec_id, embedding, cell FROM (
                    SELECT e.vec_id, e.embedding, c.cell,
                           row_number() OVER (
                               PARTITION BY e.vec_id
                               ORDER BY list_cosine_similarity(
                                   CAST(e.embedding AS DOUBLE[]),
                                   CAST(c.embedding AS DOUBLE[])) DESC,
                               c.cell) AS rn
                    FROM embeddings e CROSS JOIN cent c
                ) WHERE rn = 1
            ), qprobe AS (
                SELECT query_id, cell FROM (
                    SELECT q.vec_id AS query_id, c.cell,
                           row_number() OVER (
                               PARTITION BY q.vec_id
                               ORDER BY list_cosine_similarity(
                                   CAST(q.embedding AS DOUBLE[]),
                                   CAST(c.embedding AS DOUBLE[])) DESC,
                               c.cell) AS pr
                    FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 5
                ) WHERE pr <= 3
            ), cand AS (
                SELECT p.query_id, q.embedding AS qv,
                       cc.vec_id AS neighbor_id, cc.embedding AS cv
                FROM qprobe p
                JOIN embeddings q ON q.vec_id = p.query_id
                JOIN corpus_cells cc ON cc.cell = p.cell
                WHERE cc.vec_id <> p.query_id
            )
            SELECT query_id, neighbor_id, rank FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY round(list_cosine_similarity(
                               CAST(qv AS DOUBLE[]),
                               CAST(cv AS DOUBLE[])), 6) DESC,
                           neighbor_id) AS rank
                FROM cand
            ) WHERE rank <= 3
        """,
        "engine_pg_cdc": _LIFECYCLE_BASE_SQL + """
            SELECT CAST(k AS VARCHAR) AS image_id,
                   CASE WHEN k % 7 = 2 THEN c || ' pg2'
                        WHEN k % 7 = 3 THEN c || ' pg3'
                        ELSE c END AS caption,
                   ph AS phash,
                   TRUE AS bytes_ok
            FROM base WHERE k % 10 < 3 AND k % 7 <> 5
            UNION ALL
            SELECT CAST(k AS VARCHAR), 'pg', ph, TRUE
            FROM base WHERE k % 10 = 5 AND k % 3 = 0
        """,
        "engine_rest_scan": _LIFECYCLE_BASE_SQL + """
            SELECT CAST(k AS VARCHAR) AS image_id,
                   CASE WHEN k % 97 = 1 THEN c || ' r2' ELSE c END AS caption,
                   ph AS phash,
                   TRUE AS bytes_ok
            FROM base WHERE k % 10 < 3 AND k % 97 <> 2
            UNION ALL
            SELECT CAST(k AS VARCHAR), 'rest', ph, TRUE
            FROM base WHERE k % 10 = 6 AND k % 97 = 3
        """,
        "embedding_topk": """
            SELECT query_id, neighbor_id, rank FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                               CAST(q.embedding AS DOUBLE[]),
                               CAST(c.embedding AS DOUBLE[])) DESC,
                           c.vec_id) AS rank
                FROM embeddings q, embeddings c
                WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
            ) WHERE rank <= 3
        """,
    }
