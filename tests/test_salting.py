from pyspark.sql import functions as F

from moonlink_spark.functions.salting import latest_wins_dedup, salted_join


def test_salted_join_matches_plain_join(spark):
    big = spark.range(0, 10000).withColumn("k", (F.col("id") % 7).cast("long"))
    small = spark.createDataFrame([(i, f"v{i}") for i in range(7)], "k long, v string")
    a = salted_join(big, small, ["k"], buckets=8).orderBy("id").collect()
    b = big.join(small, "k").orderBy("id").collect()
    assert len(a) == len(b) == 10000
    assert {(r["id"], r["v"]) for r in a} == {(r["id"], r["v"]) for r in b}


def test_salted_join_left(spark):
    big = spark.range(0, 100).withColumn("k", (F.col("id") % 10).cast("long"))
    small = spark.createDataFrame([(0, "x")], "k long, v string")
    out = salted_join(big, small, ["k"], how="left", buckets=4)
    assert out.count() == 100
    assert out.filter(F.col("v").isNotNull()).count() == 10


def test_latest_wins_dedup_salted_equals_unsalted(spark):
    df = spark.createDataFrame(
        [("a", 1, "U", "p1"), ("a", 3, "D", "p2"), ("a", 2, "U", "p3"),
         ("b", 5, "U", "p4"), ("b", 5, "D", "p5")],
        "image_id string, lsn long, op string, payload string",
    )
    for salt in (None, 4):
        out = {r["image_id"]: (r["op"], r["payload"])
               for r in latest_wins_dedup(df, "image_id", "lsn", "op", salt).collect()}
        assert out == {"a": ("D", "p2"), "b": ("U", "p4")}, out
