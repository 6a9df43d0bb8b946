"""Statement-level SQL front door: run a registered query from its SQL
TEXT through ``spark.sql`` instead of the DataFrame API.

Every registered query already carries an ANSI-SQL twin (the DuckDB
oracle). For the relational subset that twin is dialect-neutral enough
to execute UNMODIFIED in Spark SQL — so the engine accepts the SQL
statement directly, with the oracle string as the single source of
truth (no third copy of the semantics to drift). ``SQL_RUNNABLE``
pins exactly which queries qualify; each one is verified by test to
produce the SAME rows and column names as its DataFrame-API path
(both compile to Catalyst plans over the same parquet scans, so the
physical strategies — broadcast joins, partial aggregation, pushdown
— are the optimizer's choice either way).

Queries stay EXCLUDED when their twin needs DuckDB-only surface
(list_* lambdas, ``unnest``/``string_split``, ``strftime``, ``//``
integer division, ``VALUES``-row constructors in CTEs, recursive CTE
syntax differences) — for those the DataFrame API is the front door,
and the DuckDB twin exists only for the oracle harness.

Usage::

    from ml_with_spark_streaming_spark.plans.sql_front import run_sql
    df = run_sql(spark, "/root/testdata/sf0.01", "q01_pricing_summary")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ml_with_spark_streaming_spark.plans.registry import ORACLES
from ml_with_spark_streaming_spark.schemas import TABLE_SCHEMAS
from ml_with_spark_streaming_spark.sources.batch import load_table

# Verified dialect-portable queries: each runs verbatim under
# spark.sql AND matches the DataFrame-API rows + column names
# (tests/test_sql_front.py re-proves the whole list).
SQL_RUNNABLE: tuple[str, ...] = (
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_top_unshipped_orders",
    "q04_priority_semi_join",
    "q05_customers_no_orders",
    "q06_promo_revenue",
    "q07_nation_volume",
    "q08_topk_parts_per_brand",
    "q09_running_customer_total",
    "q14_setop_intersect",
    "q15_setop_except",
    "q16_union_all_counts",
    "q17_distinct_flags",
    "q18_conditional_agg",
    "q19_event_stats",
    "q20_pivot_status",
    "q21_above_avg_suppliers",
    "q22_above_brand_avg_parts",
    "q23_string_functions",
    "q25_math_functions",
    "q27_value_histogram",
    "q28_top_orders",
    "q30_range_join_bands",
    "q31_above_global_avg_parts",
    "q32_order_history_lag_lead",
    "q33_acctbal_quartiles",
    "q39_best_order_per_customer",
    "q63_running_user_totals",
    "q64_grouped_agg_udaf",
    "q66_approx_count_distinct",
    "q67_regional_revenue_6way",
    "q68_or_predicate_revenue",
    "q75_unpivot_event_stats",
    "q76_null_safe_join",
    "q78_dedup_replayed_events",
    "q79_full_outer_customer_orders",
    "q80_stats_aggregates",
    "q87_waiting_suppliers",
    "q94_funnel_steps",
    "q122_crossmodal_integrity",
    "q155_fuzzy_name_pairs",
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every base table as a temp view (through
    ``load_table``, so the timestamp-encoding session confs apply to
    the SQL path exactly as they do to the DataFrame path)."""
    for t in TABLE_SCHEMAS:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def run_sql(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Execute query ``name`` from its SQL text over ``sf_dir``'s
    tables. Raises ``KeyError`` for unknown names and ``ValueError``
    for registered queries whose twin is not dialect-portable."""
    if name not in ORACLES or ORACLES[name] is None:
        raise KeyError(f"no SQL text registered for {name!r}")
    if name not in SQL_RUNNABLE:
        raise ValueError(
            f"{name!r} has a SQL twin for the oracle harness, but it uses "
            "DuckDB-only surface — use the DataFrame API (plans.QUERIES) "
            "for this query"
        )
    register_views(spark, sf_dir)
    return spark.sql(ORACLES[name])
