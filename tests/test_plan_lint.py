"""Lint-rule unit tests: the DeadBroadcastHint detector must flag a
broadcast hint on the row-preserved side of an outer join (the shape
Spark cannot build-broadcast — it warns via HintErrorLogger and falls
back to a shuffle join) and must NOT flag honorable hints."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from plan_lint import dead_broadcast_hints  # noqa: E402


def _opt(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_flags_broadcast_on_preserved_left_of_left_join(spark):
    a = spark.range(10).withColumnRenamed("id", "k")
    b = spark.range(5).withColumnRenamed("id", "k").withColumn("v", F.lit(1))
    hits = dead_broadcast_hints(_opt(F.broadcast(a).join(b, "k", "left")))
    assert hits == ["leftHint=broadcast on LeftOuter"]


def test_flags_broadcast_on_preserved_right_of_right_join(spark):
    a = spark.range(10).withColumnRenamed("id", "k")
    b = spark.range(5).withColumnRenamed("id", "k").withColumn("v", F.lit(1))
    hits = dead_broadcast_hints(_opt(a.join(F.broadcast(b), "k", "right")))
    assert hits == ["rightHint=broadcast on RightOuter"]


def test_honorable_hints_pass(spark):
    a = spark.range(10).withColumnRenamed("id", "k")
    b = spark.range(5).withColumnRenamed("id", "k").withColumn("v", F.lit(1))
    for df in (
        a.join(F.broadcast(b), "k", "left"),  # build-right on LeftOuter: legal
        a.join(F.broadcast(b), "k", "inner"),
        a.join(F.broadcast(b), "k", "left_semi"),
        F.broadcast(a).join(b, "k", "right"),  # build-left on RightOuter: legal
    ):
        assert dead_broadcast_hints(_opt(df)) == []


def test_q96_q127_plans_have_no_dead_hints(spark):
    """The round-4 finding: the gap-fill/anomaly grid joins must hint
    the aggregate (non-preserved) side, and the hint must be honored
    (a BroadcastHashJoin actually executes)."""
    from ml_with_spark_streaming_spark.plans import QUERIES

    for name in ("q96_gapfill_resample", "q127_daily_anomalies"):
        qe = QUERIES[name](spark, "/root/testdata/sf0.001")._jdf.queryExecution()
        assert dead_broadcast_hints(qe.optimizedPlan().toString()) == []
        assert "BroadcastHashJoin" in qe.executedPlan().toString()
