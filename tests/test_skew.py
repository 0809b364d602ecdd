"""Salted join must be result-equal to the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from sayn_spark.plans.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # skewed fact: key 0 holds half the rows
    big = spark.range(0, 10000).select(
        F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(0, 100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    plain = big.join(small, "k").groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
    salted = (
        salted_join(big, small, "k").groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.range(0, 50).select((F.col("id") % 60).alias("k"), F.col("id").alias("v"))
    small = spark.range(0, 10).select(F.col("id").alias("k"), F.lit("m").alias("tag"))
    plain = big.join(small, "k", "left")
    salted = salted_join(big, small, "k", how="left")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
