"""Named-query registry: every operator the engine claims is represented
here as a (Spark DataFrame builder, DuckDB oracle SQL) pair.

Import side effects: importing this package registers all queries.
"""

from ml_with_spark_streaming_spark.plans.registry import ORACLES, QUERIES, query

# noqa imports below populate the registry
from ml_with_spark_streaming_spark.plans import relational  # noqa: F401,E402
from ml_with_spark_streaming_spark.plans import relational_ext  # noqa: F401,E402
from ml_with_spark_streaming_spark.plans import text_ml  # noqa: F401,E402
from ml_with_spark_streaming_spark.plans import llm_ops  # noqa: F401,E402
from ml_with_spark_streaming_spark.plans import events_streaming  # noqa: F401,E402
from ml_with_spark_streaming_spark.plans import ml_queries  # noqa: F401,E402
from ml_with_spark_streaming_spark.plans import curation  # noqa: F401,E402
from ml_with_spark_streaming_spark.plans import analytics  # noqa: F401,E402

__all__ = ["QUERIES", "ORACLES", "query"]
