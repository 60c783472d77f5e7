"""Salted-join/agg equivalence: results must equal the unsalted plans
on a deliberately skewed key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from cheetah_spark.functions.skew import salted_agg, salted_join


def _skewed(spark, n=20_000):
    # ~90% of rows share key 0 — the shape AQE partition-splitting
    # alone can't rebalance for a single-key group
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    plain = big.join(small, ["k"]).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("w").alias("sw")
    )
    salted = salted_join(big, small, ["k"], buckets=8, salt_on="v").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("w").alias("sw")
    )
    assert sorted(map(str, plain.collect())) == sorted(map(str, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    big = _skewed(spark)
    small = spark.range(3).select(F.col("id").alias("k"), F.lit("m").alias("w"))
    plain = big.join(small, ["k"], "left")
    salted = salted_join(big, small, ["k"], how="left", buckets=8, salt_on="v")
    assert plain.count() == salted.count()
    assert (
        plain.where("w IS NULL").count() == salted.where("w IS NULL").count()
    )


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed(spark)
    plain = df.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("s"), F.countDistinct("v").alias("d")
    )
    salted = salted_agg(
        df,
        ["k"],
        partial_aggs=[
            F.count("*").alias("pn"),
            F.sum("v").alias("ps"),
            F.countDistinct("v").alias("pd"),
        ],
        final_aggs=[
            F.sum("pn").alias("n"),
            F.sum("ps").alias("s"),
            F.sum("pd").alias("d"),  # distinct v values never share salt (salt_on=v)
        ],
        buckets=8,
        salt_on="v",
    )
    assert sorted(map(str, plain.collect())) == sorted(map(str, salted.collect()))
