"""SQL front door: every SQL_RUNNABLE query executed from its SQL text
must produce the same rows and column names as its DataFrame-API path."""

from __future__ import annotations

import pytest

from ml_with_spark_streaming_spark.plans import QUERIES
from ml_with_spark_streaming_spark.plans.sql_front import SQL_RUNNABLE, run_sql

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", SQL_RUNNABLE)
def test_sql_text_matches_dataframe_api(spark, name):
    sql_df = run_sql(spark, SF, name)
    api_df = QUERIES[name](spark, SF)
    assert [f.name for f in sql_df.schema] == [f.name for f in api_df.schema]
    assert sorted(map(tuple, sql_df.collect())) == sorted(
        map(tuple, api_df.collect())
    )


def test_run_sql_rejects_non_portable_and_unknown(spark):
    with pytest.raises(ValueError):
        run_sql(spark, SF, "q42_word_count_topk")  # DuckDB list functions
    with pytest.raises(KeyError):
        run_sql(spark, SF, "q47_stemmed_tokens")  # no SQL twin at all
    with pytest.raises(KeyError):
        run_sql(spark, SF, "nope")
