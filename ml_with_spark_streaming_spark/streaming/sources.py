"""Streaming source builders (S1 mapping, SURVEY.md §2.1).

The reference's only source is ``ssc.socketTextStream('localhost',
6100)`` (PAC/passiveAgressiveModel.py:167). Structured Streaming
equivalents, all returning a DataFrame with a ``value: string``
column compatible with ``wire.parse_wire``:

* socket — live parity with the reference's replay server;
* file   — the testable path: drop text files into a dir, each
  micro-batch picks up new files (used by the test-suite);
* rate   — synthetic load generator for throughput checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def socket_stream(spark: SparkSession, host: str = "localhost", port: int = 6100) -> DataFrame:
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def file_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """Text-file source: one ``value`` column per line; bounded files
    per trigger so replays exercise real micro-batch boundaries."""
    return (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def rate_stream(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Synthetic ``value`` lines shaped like the wire format, for
    throughput tests (reference ceiling: 600 rec/s — BASELINE.md)."""
    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    )
    rec = F.concat(
        F.when(F.col("value") % 2 == 0, F.lit("0")).otherwise(F.lit("4")),
        F.lit(",synthetic tweet number "),
        F.col("value").cast("string"),
    )
    return rate.select(F.to_json(F.array(rec)).alias("value"))


def read_state(spark: SparkSession, checkpoint: str, **options: str) -> DataFrame:
    """Read a streaming query's state store as a DataFrame (Spark 4
    ``statestore`` source) — inspect live aggregation/join/dedup state
    from its checkpoint without touching the running query. The
    reference's only 'state' was opaque pickles on disk; here every
    window count, join buffer, and dedup key is queryable.

    Options pass through (e.g. ``batchId``, ``operatorId``,
    ``storeName``, ``joinSide`` for stream-stream join state).
    """
    reader = spark.read.format("statestore")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(checkpoint)
