"""Relational operator surface (SURVEY.md §2.5) as named, oracle-checked
queries over the TPC-H-ish testdata.

The reference contains no joins/aggs/windows at all (SURVEY.md §2.5 —
verified absence across its 867 LoC); this module supplies the general
query surface the north star requires, expressed declaratively so
Catalyst handles pushdown/pruning/join-selection.

Scale posture (100 TB):
* dimension tables (region, nation, supplier at TPC-H proportions) are
  broadcast explicitly — no shuffle of the fact side for those joins;
* fact-fact joins (orders ⋈ lineitem) are plain equi-joins on their
  keys — sort-merge with AQE skew handling at scale;
* every aggregate is expressed as groupBy().agg() → Spark plans a
  map-side partial aggregate before the shuffle;
* filters are plain Column predicates on scan columns → pushed to the
  parquet reader (verified via .explain — see tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ml_with_spark_streaming_spark.plans.registry import query
from ml_with_spark_streaming_spark.sources.batch import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation: TPC-H Q1-style pricing summary (the flagship query)
# ---------------------------------------------------------------------------

Q01_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
  ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
  ROUND(ROUND(SUM(l_quantity), 2) / COUNT(*), 4)                   AS avg_qty,
  ROUND(ROUND(SUM(l_extendedprice), 2) / COUNT(*), 4)              AS avg_price,
  ROUND(ROUND(SUM(l_discount), 2) / COUNT(*), 4)                   AS avg_disc,
  COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q01_pricing_summary", Q01_SQL)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.round(F.sum("l_quantity"), 2) / F.count("*"), 4).alias("avg_qty"),
            F.round(F.round(F.sum("l_extendedprice"), 2) / F.count("*"), 4).alias("avg_price"),
            F.round(F.round(F.sum("l_discount"), 2) / F.count("*"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Multi-way join with broadcast dimensions
# ---------------------------------------------------------------------------

Q02_SQL = """
SELECT
  r_name,
  n_name,
  COUNT(DISTINCT c.c_custkey)        AS n_customers,
  COUNT(*)                           AS n_orders,
  ROUND(SUM(o_totalprice), 2)        AS revenue,
  ROUND(ROUND(SUM(o_totalprice), 2) / COUNT(*), 4) AS avg_order_value
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


@query("q02_revenue_by_nation", Q02_SQL)
def q02_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.round(F.round(F.sum("o_totalprice"), 2) / F.count("*"), 4).alias("avg_order_value"),
        )
        .orderBy("r_name", "n_name")
    )


# ---------------------------------------------------------------------------
# Join + agg + top-k (TPC-H Q3 shape)
# ---------------------------------------------------------------------------

Q03_SQL = """
SELECT
  l_orderkey,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  CAST(o_orderdate AS DATE)                         AS orderdate,
  o_orderpriority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q03_top_unshipped_orders", Q03_SQL)
def q03_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1996-01-01 00:00:00").cast("timestamp"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("orderdate"), "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Semi-join (EXISTS)
# ---------------------------------------------------------------------------

Q04_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q04_priority_semi_join", Q04_SQL)
def q04_priority_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    cond = (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Anti-join (NOT EXISTS)
# ---------------------------------------------------------------------------

Q05_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
ORDER BY c_custkey
"""


@query("q05_customers_no_orders", Q05_SQL)
def q05_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Selective filter + single-row aggregate (TPC-H Q6 shape) — the classic
# predicate-pushdown showcase: all three filters reach the parquet scan.
# ---------------------------------------------------------------------------

Q06_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS promo_revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.09
  AND l_quantity < 24
"""


@query("q06_promo_revenue", Q06_SQL)
def q06_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.09)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("promo_revenue"),
            F.count("*").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Six-way join across both fact tables (TPC-H Q7 shape)
# ---------------------------------------------------------------------------

Q07_SQL = """
SELECT
  sn.n_name                                          AS supp_nation,
  cn.n_name                                          AS cust_nation,
  CAST(year(l.l_shipdate) AS INT)                    AS ship_year,
  ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS volume
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_0', 'NATION_1') AND cn.n_name IN ('NATION_0', 'NATION_1')
GROUP BY supp_nation, cust_nation, ship_year
ORDER BY supp_nation, cust_nation, ship_year
"""


@query("q07_nation_volume", Q07_SQL)
def q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    nations = ["NATION_0", "NATION_1"]
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation").isin(nations) & F.col("cust_nation").isin(nations))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


# ---------------------------------------------------------------------------
# Window: top-k per group
# ---------------------------------------------------------------------------

Q08_SQL = """
SELECT p_brand, p_partkey, p_retailprice, rn
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
) t
WHERE rn <= 3
ORDER BY p_brand, rn
"""


@query("q08_topk_parts_per_brand", Q08_SQL)
def q08_topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), "p_partkey")
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
        .orderBy("p_brand", "rn")
    )


# ---------------------------------------------------------------------------
# Window: running aggregate + rank
# ---------------------------------------------------------------------------

Q09_SQL = """
SELECT
  o_custkey,
  o_orderkey,
  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq,
  ROUND(SUM(o_totalprice) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
WHERE o_custkey <= 50
ORDER BY o_custkey, order_seq
"""


@query("q09_running_customer_total", Q09_SQL)
def q09_running_customer_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("order_seq"),
            F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2).alias(
                "running_total"
            ),
        )
        .orderBy("o_custkey", "order_seq")
    )


# ---------------------------------------------------------------------------
# Window: lag / lead over event time
# ---------------------------------------------------------------------------

Q10_SQL = """
SELECT
  user_id,
  event_id,
  ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS delta_value,
  epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
FROM events
WHERE user_id <= 20
ORDER BY user_id, event_id
"""


@query("q10_event_deltas", Q10_SQL)
def q10_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros("ts")
    return (
        e.select(
            "user_id",
            "event_id",
            F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta_value"),
            (micros - F.lag(micros).over(w)).alias("gap_us"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# ROLLUP / CUBE / GROUPING SETS
# ---------------------------------------------------------------------------

Q11_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@query("q11_rollup_quantity", Q11_SQL)
def q11_rollup_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


Q12_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


@query("q12_cube_orders", Q12_SQL)
def q12_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


Q13_SQL = """
SELECT n_name, r_name, COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 2) AS total_balance
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY GROUPING SETS ((n_name), (r_name), ())
ORDER BY n_name NULLS FIRST, r_name NULLS FIRST
"""


@query("q13_grouping_sets", Q13_SQL)
def q13_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    j.createOrReplaceTempView("_q13_cnr")
    return spark.sql(
        """
        SELECT n_name, r_name, COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 2) AS total_balance
        FROM _q13_cnr
        GROUP BY GROUPING SETS ((n_name), (r_name), ())
        ORDER BY n_name ASC NULLS FIRST, r_name ASC NULLS FIRST
        """
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

Q14_SQL = """
SELECT c_custkey FROM (
  SELECT DISTINCT o_custkey AS c_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
  INTERSECT
  SELECT DISTINCT o_custkey AS c_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00' AND o_orderdate < TIMESTAMP '2001-01-01 00:00:00'
) t ORDER BY c_custkey
"""


@query("q14_setop_intersect", Q14_SQL)
def q14_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")

    def _year(y: int) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp"))
            )
            .select(F.col("o_custkey").alias("c_custkey"))
            .distinct()
        )

    return _year(1995).intersect(_year(2000)).orderBy("c_custkey")


Q15_SQL = """
SELECT c_custkey FROM (
  SELECT DISTINCT o_custkey AS c_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
  EXCEPT
  SELECT DISTINCT o_custkey AS c_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00' AND o_orderdate < TIMESTAMP '2001-01-01 00:00:00'
) t ORDER BY c_custkey
"""


@query("q15_setop_except", Q15_SQL)
def q15_setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")

    def _year(y: int) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp"))
            )
            .select(F.col("o_custkey").alias("c_custkey"))
            .distinct()
        )

    return _year(1995).exceptAll(_year(2000)).orderBy("c_custkey")


Q16_SQL = """
SELECT src, COUNT(*) AS n, COUNT(DISTINCT key) AS n_distinct
FROM (
  SELECT 'cust' AS src, c_custkey AS key FROM customer
  UNION ALL
  SELECT 'supp' AS src, s_suppkey AS key FROM supplier
  UNION ALL
  SELECT 'part' AS src, p_partkey AS key FROM part
) u
GROUP BY src
ORDER BY src
"""


@query("q16_union_all_counts", Q16_SQL)
def q16_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.lit("cust").alias("src"), F.col("c_custkey").alias("key"))
    s = _t(spark, sf_dir, "supplier").select(F.lit("supp").alias("src"), F.col("s_suppkey").alias("key"))
    p = _t(spark, sf_dir, "part").select(F.lit("part").alias("src"), F.col("p_partkey").alias("key"))
    return (
        c.unionByName(s)
        .unionByName(p)
        .groupBy("src")
        .agg(F.count("*").alias("n"), F.countDistinct("key").alias("n_distinct"))
        .orderBy("src")
    )


# ---------------------------------------------------------------------------
# DISTINCT / conditional aggregation / statistics
# ---------------------------------------------------------------------------

Q17_SQL = """
SELECT DISTINCT l_returnflag, l_linestatus
FROM lineitem
ORDER BY l_returnflag, l_linestatus
"""


@query("q17_distinct_flags", Q17_SQL)
def q17_distinct_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


Q18_SQL = """
SELECT
  l_linestatus,
  ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END), 2) AS returned_value,
  ROUND(SUM(CASE WHEN l_returnflag <> 'R' THEN l_extendedprice ELSE 0 END), 2) AS kept_value,
  COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_discounted,
  ROUND(MIN(l_extendedprice), 2) AS min_price,
  ROUND(MAX(l_extendedprice), 2) AS max_price
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


@query("q18_conditional_agg", Q18_SQL)
def q18_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.round(F.sum(F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).otherwise(0.0)), 2).alias(
                "returned_value"
            ),
            F.round(F.sum(F.when(F.col("l_returnflag") != "R", F.col("l_extendedprice")).otherwise(0.0)), 2).alias(
                "kept_value"
            ),
            F.count(F.when(F.col("l_discount") > 0.05, F.lit(1))).alias("n_discounted"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
        .orderBy("l_linestatus")
    )


Q19_SQL = """
SELECT
  event_type,
  COUNT(*) AS n,
  ROUND(AVG(value), 4) AS avg_value,
  ROUND(STDDEV_SAMP(value), 4) AS std_value,
  ROUND(MIN(value), 4) AS min_value,
  ROUND(MAX(value), 4) AS max_value,
  ROUND(MEDIAN(value), 4) AS median_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("q19_event_stats", Q19_SQL)
def q19_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.stddev_samp("value"), 4).alias("std_value"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("median_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Pivot
# ---------------------------------------------------------------------------

Q20_SQL = """
SELECT
  l_returnflag,
  ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
  ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("q20_pivot_status", Q20_SQL)
def q20_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Scalar subqueries via windows
# ---------------------------------------------------------------------------

Q21_SQL = """
SELECT s_suppkey, s_name, ROUND(s_acctbal, 2) AS acctbal
FROM (
  SELECT s_suppkey, s_name, s_acctbal,
         ROUND(SUM(s_acctbal) OVER (), 2) / COUNT(*) OVER () AS avg_bal
  FROM supplier
) t
WHERE s_acctbal > avg_bal
ORDER BY s_suppkey
"""


@query("q21_above_avg_suppliers", Q21_SQL)
def q21_above_avg_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table average as a broadcast 1-row aggregate (q31's
    pattern): the windowed formulation (``SUM() OVER ()``) moves every
    supplier row to ONE task — the GlobalWindow lint shape. The SQL
    oracle keeps the window form (DuckDB is single-node); values are
    identical."""
    s = _t(spark, sf_dir, "supplier")
    avg = s.agg(
        (F.round(F.sum("s_acctbal"), 2) / F.count("*")).alias("_avg_bal")
    )
    return (
        s.crossJoin(F.broadcast(avg))
        .filter(F.col("s_acctbal") > F.col("_avg_bal"))
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .orderBy("s_suppkey")
    )


Q22_SQL = """
SELECT p_partkey, p_brand, ROUND(p_retailprice, 2) AS price, ROUND(brand_avg, 4) AS brand_avg
FROM (
  SELECT p_partkey, p_brand, p_retailprice,
         ROUND(SUM(p_retailprice) OVER (PARTITION BY p_brand), 1)
           / COUNT(*) OVER (PARTITION BY p_brand) AS brand_avg
  FROM part
) t
WHERE p_retailprice > 1.02 * brand_avg
ORDER BY p_partkey
"""


@query("q22_above_brand_avg_parts", Q22_SQL)
def q22_above_brand_avg_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand")
    return (
        p.withColumn(
            "brand_avg",
            F.round(F.sum("p_retailprice").over(w), 1) / F.count("*").over(w),
        )
        .filter(F.col("p_retailprice") > 1.02 * F.col("brand_avg"))
        .select(
            "p_partkey",
            "p_brand",
            F.round("p_retailprice", 2).alias("price"),
            F.round("brand_avg", 4).alias("brand_avg"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# Scalar function coverage: strings, dates, math, JSON
# ---------------------------------------------------------------------------

Q23_SQL = """
SELECT
  p_partkey,
  UPPER(p_name)                       AS name_upper,
  LENGTH(p_name)                      AS name_len,
  SUBSTR(p_name, 1, 8)                AS name_prefix,
  REPLACE(p_name, ' ', '_')           AS name_snake,
  CONCAT(p_brand, ':', p_type)        AS brand_type,
  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
  CASE WHEN p_size >= 25 THEN 'large' WHEN p_size >= 10 THEN 'medium' ELSE 'small' END AS size_class
FROM part
WHERE p_partkey <= 100
ORDER BY p_partkey
"""


@query("q23_string_functions", Q23_SQL)
def q23_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return (
        p.select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.length("p_name").alias("name_len"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
            F.when(F.col("p_size") >= 25, "large")
            .when(F.col("p_size") >= 10, "medium")
            .otherwise("small")
            .alias("size_class"),
        )
        .orderBy("p_partkey")
    )


Q24_SQL = """
SELECT
  o_orderkey,
  CAST(year(o_orderdate) AS INT)                    AS order_year,
  CAST(month(o_orderdate) AS INT)                   AS order_month,
  CAST(quarter(o_orderdate) AS INT)                 AS order_quarter,
  CAST(day(o_orderdate) AS INT)                     AS order_day,
  CAST(isodow(o_orderdate) AS INT)                  AS order_isodow,
  CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
  CAST(o_orderdate + INTERVAL 30 DAY AS DATE)       AS due_date,
  datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch
FROM orders
WHERE o_orderkey <= 200
ORDER BY o_orderkey
"""


@query("q24_date_functions", Q24_SQL)
def q24_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    return (
        o.select(
            "o_orderkey",
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
            F.quarter("o_orderdate").cast("int").alias("order_quarter"),
            F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
            (F.weekday("o_orderdate") + 1).cast("int").alias("order_isodow"),
            F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
            F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
                "days_since_epoch"
            ),
        )
        .orderBy("o_orderkey")
    )


Q25_SQL = """
SELECT
  l_orderkey, l_linenumber,
  CAST(ROUND(ABS(l_extendedprice - 1000) * 10000) AS BIGINT)  AS abs_diff_e4,
  CAST(CEIL(l_quantity) AS BIGINT)                            AS qty_ceil,
  CAST(FLOOR(l_quantity) AS BIGINT)                           AS qty_floor,
  CAST(ROUND(SQRT(l_extendedprice) * 1000000) AS BIGINT)      AS price_sqrt_e6,
  CAST(ROUND(LN(l_extendedprice + 1) * 1000000) AS BIGINT)    AS price_ln_e6,
  CAST(ROUND(POWER(l_discount, 2) * 1000000) AS BIGINT)       AS disc_sq_e6,
  l_linenumber % 3                                            AS line_mod
FROM lineitem
WHERE l_orderkey <= 100
ORDER BY l_orderkey, l_linenumber
"""


@query("q25_math_functions", Q25_SQL)
def q25_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar math surface. All fractional outputs are surfaced as
    SCALED BIGINTs (×10^4 / ×10^6): ROUND(double, k) produces doubles
    whose last ulp differs between engines (Spark rounds the exact
    BigDecimal of the double, DuckDB multiplies by 10^k), and DuckDB's
    CEIL/FLOOR on DOUBLE stay DOUBLE while Spark's return BIGINT — both
    killed the driver's hash in round 1. Integer surfacing removes the
    float channel entirely."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.abs(F.col("l_extendedprice") - 1000) * 10000, 0)
            .cast("long")
            .alias("abs_diff_e4"),
            F.ceil("l_quantity").alias("qty_ceil"),
            F.floor("l_quantity").alias("qty_floor"),
            F.round(F.sqrt("l_extendedprice") * 1000000, 0).cast("long").alias("price_sqrt_e6"),
            F.round(F.log(F.col("l_extendedprice") + 1) * 1000000, 0)
            .cast("long")
            .alias("price_ln_e6"),
            F.round(F.pow("l_discount", F.lit(2)) * 1000000, 0).cast("long").alias("disc_sq_e6"),
            (F.col("l_linenumber") % 3).alias("line_mod"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


Q26_SQL = """
SELECT
  event_type,
  CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT)  AS sum_k,
  CAST(FLOOR((SUM(CAST(json_extract(props, '$.k') AS INT)) * 20000
              + COUNT(json_extract(props, '$.k'))) * 1.0
             / (2 * COUNT(json_extract(props, '$.k')))) AS BIGINT) AS avg_k_e4
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("q26_json_extract", Q26_SQL)
def q26_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction + aggregation. sum_k is CAST to BIGINT in the
    oracle because DuckDB SUM(INTEGER) returns HUGEINT (pandas turns it
    into float64 → driver hash mismatch). avg_k is surfaced as a scaled
    BIGINT (×10^4, HALF-UP in integer arithmetic) because ROUND(AVG,4)
    is a small-denominator rational — exactly the tie case where Spark
    and DuckDB ROUND(double) disagree."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    s, n = F.sum(k), F.count(k)
    return (
        e.groupBy("event_type")
        .agg(
            s.alias("sum_k"),
            F.floor((s * 20000 + n) / (2 * n)).cast("long").alias("avg_k_e4"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Histogram / bucketing
# ---------------------------------------------------------------------------

Q27_SQL = """
SELECT CAST(FLOOR(value / 100) AS BIGINT) AS bucket, COUNT(*) AS n,
       ROUND(SUM(value), 2) AS total
FROM events
GROUP BY bucket
ORDER BY bucket
"""


@query("q27_value_histogram", Q27_SQL)
def q27_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.floor(F.col("value") / 100).cast("bigint").alias("bucket"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Plain sort + limit
# ---------------------------------------------------------------------------

Q28_SQL = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@query("q28_top_orders", Q28_SQL)
def q28_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# As-of join (Spark lacks a native one — composed from union + window,
# one shuffle on the join key; scales as a single sort-merge pass)
# ---------------------------------------------------------------------------

Q29_SQL = """
SELECT p.event_id, p.user_id, epoch_us(p.ts) - epoch_us(v.ts) AS since_view_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
ORDER BY p.event_id
"""


@query("q29_asof_purchase_view", Q29_SQL)
def q29_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest view at-or-before it.

    Implemented as tagged union + running `last(..., ignorenulls)` window —
    a single shuffle on (user_id), linear scan per partition. This is the
    scale-out formulation (no per-row subquery, no range explosion).
    """
    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("is_p")
    )
    v = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(None).cast("long").alias("event_id"), F.lit(0).alias("is_p")
    )
    u = p.unionByName(v)
    # views sort before purchases at identical ts (is_p asc) → inclusive asof
    w = W.partitionBy("user_id").orderBy("ts", "is_p").rowsBetween(W.unboundedPreceding, W.currentRow)
    view_ts = F.last(F.when(F.col("is_p") == 0, F.col("ts")), ignorenulls=True).over(w)
    return (
        u.withColumn("view_ts", view_ts)
        .filter((F.col("is_p") == 1) & F.col("view_ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            (F.unix_micros("ts") - F.unix_micros("view_ts")).alias("since_view_us"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Range join against a small band dimension (broadcast)
# ---------------------------------------------------------------------------

Q30_SQL = """
WITH bands(band, lo, hi) AS (
  VALUES ('budget', 0.0, 500.0), ('mid', 500.0, 1000.0), ('premium', 1000.0, 100000.0)
)
SELECT b.band, COUNT(*) AS n_parts, ROUND(ROUND(SUM(p.p_retailprice), 1) / COUNT(*), 4) AS avg_price
FROM part p
JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
GROUP BY b.band
ORDER BY b.band
"""


@query("q30_range_join_bands", Q30_SQL)
def q30_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 500.0), ("mid", 500.0, 1000.0), ("premium", 1000.0, 100000.0)],
        "band string, lo double, hi double",
    )
    return (
        p.join(F.broadcast(bands), (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi))
        .groupBy("band")
        .agg(F.count("*").alias("n_parts"), F.round(F.round(F.sum("p_retailprice"), 1) / F.count("*"), 4).alias("avg_price"))
        .orderBy("band")
    )
