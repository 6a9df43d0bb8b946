"""ml_with_spark_streaming_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``gopali24/ML_with_Spark_Streaming`` (surveyed in
SURVEY.md): streaming text ingestion, text featurization, incremental
ML (Passive-Aggressive / SGD / Bernoulli NB / MiniBatch KMeans), plus
the extended relational + LLM-data-pipeline surface (joins, aggs,
windows, dedup, similarity search, text analysis, multimodal columns)
designed for a 1000-executor / 100 TB deployment, tested on local mode.

Layout:
  session.py    SparkSession factory (AQE, Arrow, UTC, shuffle sizing)
  schemas.py    declared StructTypes — never rely on inference
  sources/      batch readers + streaming sources + sinks
  functions/    text cleaning, featurization, metrics (Column-level)
  operators/    relational surface, dedup, similarity, text analysis
  plans/        the named-query registry + DuckDB oracle SQL
  streaming/    wire-format parse, foreachBatch pipelines, scoring
  ml/           incremental learners (partial_fit semantics on Spark)
"""

__version__ = "0.1.0"
