"""Salted-join / two-phase-agg equivalence on a skewed fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.operators.skew import salted_join, two_phase_agg


def _skewed(spark):
    # 90% of fact rows share one key
    facts = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 50).alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    dim = spark.range(0, 50).select(F.col("id").alias("k"), F.concat(F.lit("d"), "id").alias("name"))
    return facts, dim


def test_salted_join_equals_plain_join(spark):
    facts, dim = _skewed(spark)
    plain = facts.join(dim, "k").groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("n"))
    salted = (
        salted_join(facts, dim, "k", salt=8)
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    facts, dim = _skewed(spark)
    missing = facts.withColumn("k", F.col("k") + 1000)  # no dim match
    out = salted_join(missing, dim, "k", salt=4, how="left")
    assert out.count() == missing.count()
    assert out.filter(F.col("name").isNotNull()).count() == 0


def test_two_phase_agg_equals_plain(spark):
    facts, _ = _skewed(spark)
    plain = facts.groupBy("k").agg(F.sum("v").alias("sum_v"), F.count("*").alias("n"))
    two = two_phase_agg(facts, "k", "v", salt=8)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, two.collect()))
