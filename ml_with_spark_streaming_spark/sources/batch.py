"""Batch readers for the testdata star schema (and generic formats).

Plain ``spark.read.parquet`` — Catalyst gets predicate pushdown,
column pruning, and partition pruning for free from the declarative
plan; nothing to hand-schedule. At 100 TB the same call works against
a partitioned table directory; partition-column filters prune files
before any IO happens.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table from ``{sf_dir}/{name}.parquet``.

    ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), a type
    Spark has no native equivalent for. With
    ``spark.sql.legacy.parquet.nanosAsLong=true`` it surfaces as a long
    (nanos since epoch); we truncate to micros (integer div — no FP
    precision loss at 1e18 magnitudes) and cast back to a real
    timestamp, matching DuckDB's nanos→micros truncation.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view for the SQL API path."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
