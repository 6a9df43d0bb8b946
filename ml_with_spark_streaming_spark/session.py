"""SparkSession factory.

The reference runs ``SparkContext("local[2]")`` with a 5 s DStream
interval (reference: PAC/passiveAgressiveModel.py:142,148). Here the
session is configured once, Spark-first:

* AQE on — runtime shuffle-partition coalescing, skew-join splitting,
  runtime broadcast-join demotion/promotion. At 100 TB this is what
  keeps a static ``shuffle.partitions`` choice from being fatal.
* Arrow on — every pandas UDF / toPandas crosses JVM<->Python in
  columnar batches, not pickled rows.
* UTC session timezone — required for DuckDB-oracle comparability.
* shuffle partitions default to the local core count; on a real
  cluster this would be ~2-3x total executor cores and AQE coalesces
  down per stage.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

# AQE coalescing floor (round 11). With the default 1m floor,
# parallelismFirst coalesces any shuffle smaller than ~1 MB/partition
# down to ONE post-shuffle partition, serializing every small
# intermediate stage — candidate-pair tables after LSH, per-round CC
# label joins, weight tables. Those stages exist at every corpus size;
# a 64k floor keeps them parallel while leaving large shuffles
# untouched (the floor never binds above it). Env-overridable for
# cluster profiles where scheduling overhead dominates tiny tasks.
# Measured at sf0.1 (10 text-heavy queries, 3 alternating runs):
# min 31.4 s -> 28.9 s, p50 32.2 s -> 29.1 s.
AQE_MIN_PARTITION_SIZE = os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "64k")


def get_spark(
    app_name: str = "ml_with_spark_streaming_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Honors an already-running session's master (e.g. the driver's
    harness creates the session; our configs that matter per-query are
    set via ``spark.conf.set`` where runtime-settable).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", AQE_MIN_PARTITION_SIZE)
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet carries TIMESTAMP(NANOS) which Spark has no native
        # type for; read as long and convert in sources/batch.py
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # unadjusted-to-UTC parquet micros must surface as TIMESTAMP (LTZ,
        # UTC session) not TIMESTAMP_NTZ: the whole engine + oracle suite
        # is pinned to LTZ semantics, and a read-time NTZ->LTZ cast would
        # break predicate pushdown on timestamp columns
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable configs to an externally-created session.

    The driver's verify harness passes us its own SparkSession; these
    confs are all runtime-mutable (not JVM-startup-only) so the
    engine's semantics (UTC, Arrow, AQE) hold regardless of who built
    the session.
    """
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": AQE_MIN_PARTITION_SIZE,
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked by the host session — semantics degrade gracefully
    return spark
