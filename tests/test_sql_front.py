"""SQL front door: every SQL_RUNNABLE query executed from its SQL text
(and every SQL_REWRITTEN query executed through the spark_dialect
layer) must produce the same rows and column names as its
DataFrame-API path."""

from __future__ import annotations

import pytest

from ml_with_spark_streaming_spark.plans import QUERIES
from ml_with_spark_streaming_spark.plans.sql_front import (
    SQL_REWRITTEN,
    SQL_RUNNABLE,
    run_sql,
    spark_dialect,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    # None-safe, type-stable total order (rollup/cube rows carry NULL
    # group keys; decimals and floats compare by string form)
    return sorted(
        map(tuple, df.collect()),
        key=lambda t: tuple((v is None, str(type(v)), str(v)) for v in t),
    )


@pytest.mark.parametrize("name", SQL_RUNNABLE + SQL_REWRITTEN)
def test_sql_text_matches_dataframe_api(spark, name):
    sql_df = run_sql(spark, SF, name)
    api_df = QUERIES[name](spark, SF)
    assert [f.name for f in sql_df.schema] == [f.name for f in api_df.schema]
    assert _rows(sql_df) == _rows(api_df)


def test_tiers_are_disjoint_and_rewrites_change_text(spark):
    assert not set(SQL_RUNNABLE) & set(SQL_REWRITTEN)
    # the dialect layer is only applied where it's needed — for tier-2
    # queries the rewritten text must differ from the DuckDB original
    from ml_with_spark_streaming_spark.plans.registry import ORACLES

    changed = sum(
        1 for n in SQL_REWRITTEN if spark_dialect(ORACLES[n]) != ORACLES[n]
    )
    assert changed == len(SQL_REWRITTEN)


def test_run_sql_rejects_non_portable_and_unknown(spark):
    with pytest.raises(ValueError):
        run_sql(spark, SF, "q90_dedup_clusters")  # recursive-CTE UNION
    with pytest.raises(KeyError):
        run_sql(spark, SF, "q47_stemmed_tokens")  # no SQL twin at all
    with pytest.raises(KeyError):
        run_sql(spark, SF, "nope")
