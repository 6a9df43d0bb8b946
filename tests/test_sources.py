"""File-format scans and partitioned sinks (SURVEY.md §2.5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.sources.batch import load_table, read_any, write_partitioned

SF = "/root/testdata/sf0.001"
SCHEMA = "l_orderkey long, l_quantity double, l_returnflag string"


def test_csv_json_roundtrip(spark, tmp_path):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity", "l_returnflag")
    for fmt, opts in (("csv", {"header": "true"}), ("json", {})):
        p = str(tmp_path / fmt)
        li.write.format(fmt).options(**opts).save(p)
        back = read_any(spark, p, fmt, SCHEMA, **opts).drop("_corrupt_record")
        assert back.count() == li.count()
        assert back.agg(F.round(F.sum("l_quantity"), 2)).head()[0] == li.agg(
            F.round(F.sum("l_quantity"), 2)
        ).head()[0]


def test_csv_quarantines_corrupt_rows(spark, tmp_path):
    p = tmp_path / "bad.json"
    p.write_text('{"l_orderkey": 1, "l_quantity": 2.0, "l_returnflag": "N"}\nnot json\n')
    # Spark disallows referencing ONLY _corrupt_record on raw-file scans;
    # cache materializes the full rows first (documented workaround)
    df = read_any(spark, str(p), "json", SCHEMA).cache()
    try:
        assert df.filter(F.col("_corrupt_record").isNotNull()).count() == 1
        assert df.filter(F.col("_corrupt_record").isNull()).count() == 1
    finally:
        df.unpersist()


def test_partitioned_write_prunes(spark, tmp_path):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity", "l_returnflag")
    p = str(tmp_path / "part")
    write_partitioned(li, p, partition_by=("l_returnflag",))
    back = spark.read.parquet(p).filter(F.col("l_returnflag") == "R")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan  # pruned at planning
    assert back.count() == li.filter(F.col("l_returnflag") == "R").count()
