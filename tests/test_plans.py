"""Physical-plan assertions: the scale posture is enforced, not
aspirational — pushdown, pruning, broadcast joins, and JVM-side
execution are checked on the real optimized plans."""

from __future__ import annotations

import pytest

from ml_with_spark_streaming_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString() + df._jdf.queryExecution().optimizedPlan().toString()


def test_q01_filter_pushed_to_scan(spark):
    plan = _plan(spark, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q01_column_pruning(spark):
    plan = _plan(spark, "q01_pricing_summary")
    # the scan must read only the 7 needed columns, not all 11
    scan_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in scan_schema and "l_partkey" not in scan_schema
    assert "l_quantity" in scan_schema


def test_q02_dimension_joins_broadcast(spark):
    plan = _plan(spark, "q02_revenue_by_nation")
    assert "BroadcastHashJoin" in plan


def test_hot_text_path_stays_jvm_side(spark):
    # every oracle-checked text query must be UDF-free (BatchEvalPython /
    # ArrowEvalPython nodes mean rows leave the JVM); only the explicitly
    # Python paths (stemming q47, multimodal q56/q57) may cross.
    for name in ("q40_clean_documents", "q42_word_count_topk", "q45_quality_score",
                 "q50_minhash_candidates", "q52_simhash_neardup", "q53_cosine_topk"):
        plan = _plan(spark, name)
        assert "EvalPython" not in plan, name


def test_q31_scalar_subquery_broadcasts(spark):
    plan = _plan(spark, "q31_above_global_avg_parts")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


@pytest.mark.parametrize("name", ["q29_asof_purchase_view", "q39_best_order_per_customer"])
def test_single_shuffle_aggregates(spark, name):
    # partial aggregation: the plan must not contain more exchanges than
    # stages strictly need (no accidental double shuffle on the same key)
    plan = _plan(spark, name)
    assert plan.count("Exchange hashpartitioning") <= 2, plan
