"""Batch and streaming sources/sinks."""

from ml_with_spark_streaming_spark.sources.batch import load_table, load_tables

__all__ = ["load_table", "load_tables"]
