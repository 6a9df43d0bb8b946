"""Column-level text/feature/metric functions (JVM-side built-ins
wherever possible; pandas UDFs only for the genuinely non-expressible
piece — stemming)."""

from ml_with_spark_streaming_spark.functions.text import (
    clean_text_expr,
    stem_tokens_udf,
    tokens_expr,
)

__all__ = ["clean_text_expr", "tokens_expr", "stem_tokens_udf"]
