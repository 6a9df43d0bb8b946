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
        # unadjusted parquet micros must read as TIMESTAMP (LTZ, UTC
        # session), not NTZ — the engine + oracles are pinned to LTZ,
        # and functions like unix_micros reject NTZ input
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
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


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options: str,
) -> DataFrame:
    """Generic batch reader (SURVEY.md §2.5 file-format scans).

    Schema is DECLARED, never inferred (the reference's per-batch
    schema inference — PAC/passiveAgressiveModel.py:39 — is the bug
    class this engine bans): pass a DDL string for csv/json. CSV/JSON
    readers get corrupt-record quarantining via PERMISSIVE mode with a
    _corrupt_record column rather than silent drops.
    """
    reader = spark.read.format(fmt)
    if schema:
        if fmt in ("csv", "json"):
            schema = schema + ", _corrupt_record string"
            reader = reader.option("mode", "PERMISSIVE").option(
                "columnNameOfCorruptRecord", "_corrupt_record"
            )
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(f"declare a schema for {fmt} reads — inference is banned")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Partitioned batch sink — partition columns become directory
    keys, so downstream reads with filters on them prune files before
    any IO (the 100 TB layout primitive)."""
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: tuple[str, ...],
    num_buckets: int = 32,
    sort_by: tuple[str, ...] = (),
    path: str | None = None,
) -> None:
    """Bucketed managed-table sink — the co-located-join layout
    primitive (SURVEY.md §2.5 'bucketing for co-located joins').

    Rows are hash-distributed into ``num_buckets`` files per partition
    by ``bucket_by``; Spark records the layout in the catalog. A join
    or groupBy on the bucket key between tables bucketed the same way
    then runs with NO Exchange — at 100 TB that deletes the dominant
    shuffle of fact-to-fact joins (asserted on plans in
    tests/test_sources.py). ``sort_by`` additionally pre-sorts within
    buckets so sort-merge join skips its Sort.
    """
    writer = df.write.format("parquet").mode("overwrite").bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)
