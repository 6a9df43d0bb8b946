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


def test_bucketed_join_and_agg_have_no_shuffle(spark, tmp_path):
    """Tables bucketed on the join key co-locate: the join and a
    groupBy on the bucket key must plan WITHOUT any Exchange (shuffle),
    which is the point of bucketing at scale."""
    from ml_with_spark_streaming_spark.sources.batch import write_bucketed

    left = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS a")
    right = spark.range(0, 500).selectExpr("id AS k", "id * 3 AS b")
    write_bucketed(left, "t_left_b", ("k",), num_buckets=8, sort_by=("k",), path=str(tmp_path / "lb"))
    write_bucketed(right, "t_right_b", ("k",), num_buckets=8, sort_by=("k",), path=str(tmp_path / "rb"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_left_b").join(spark.table("t_right_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 500

        g = spark.table("t_left_b").groupBy("k").count()
        gplan = g._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in gplan, gplan
        assert g.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_left_b")
        spark.sql("DROP TABLE IF EXISTS t_right_b")


def test_orc_avro_roundtrip(spark, tmp_path):
    """Remaining columnar/row formats: ORC ships with Spark; Avro needs
    the external spark-avro package — assert it degrades with a clear
    error rather than silently, and round-trip ORC."""
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity", "l_returnflag")
    p = str(tmp_path / "orc")
    li.write.format("orc").save(p)
    back = read_any(spark, p, "orc")
    assert back.count() == li.count()
    assert back.schema == li.schema  # ORC preserves types exactly

    try:
        li.write.format("avro").save(str(tmp_path / "avro"))
        avro_ok = True
    except Exception as e:
        avro_ok = False
        assert "avro" in str(e).lower()  # actionable FAILED_TO_LOAD error
    if avro_ok:  # environment-dependent: bundled in some distros
        assert read_any(spark, str(tmp_path / "avro"), "avro").count() == li.count()
