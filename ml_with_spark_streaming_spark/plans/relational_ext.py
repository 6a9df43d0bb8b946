"""Extended relational surface: subqueries, window-function variants,
array aggregation, regexp extraction, percentiles, max_by — all
oracle-checked (SURVEY.md §2.5 completion).

Determinism notes follow the registry rules; every tie-sensitive
construct (max_by, collect_list) orders by a unique total ordering.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ml_with_spark_streaming_spark.plans.registry import query
from ml_with_spark_streaming_spark.sources.batch import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Scalar subquery: parts above the global average retail price
# ---------------------------------------------------------------------------

Q31_SQL = """
SELECT p_partkey, p_name, ROUND(p_retailprice, 2) AS retail
FROM part
WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
ORDER BY p_partkey
"""


@query("q31_above_global_avg_parts", Q31_SQL)
def q31_above_global_avg_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery as a broadcast of a 1-row aggregate (a window
    over an empty partition would shuffle everything to one task —
    the cross-join of a 1-row frame broadcasts instead)."""
    p = _t(spark, sf_dir, "part")
    avg = p.agg(F.avg("p_retailprice").alias("_avg"))
    return (
        p.crossJoin(F.broadcast(avg))
        .filter(F.col("p_retailprice") > F.col("_avg"))
        .select("p_partkey", "p_name", F.round("p_retailprice", 2).alias("retail"))
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# lag / lead / first_value / last_value over per-customer order history
# ---------------------------------------------------------------------------

Q32_SQL = """
SELECT
  o_custkey,
  o_orderkey,
  ROUND(o_totalprice - LAG(o_totalprice) OVER w, 2)  AS delta_prev,
  ROUND(LEAD(o_totalprice) OVER w, 2)                AS next_price,
  ROUND(FIRST_VALUE(o_totalprice) OVER w, 2)         AS first_price,
  ROUND(LAST_VALUE(o_totalprice) OVER
        (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


@query("q32_order_history_lag_lead", Q32_SQL)
def q32_order_history_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias("delta_prev"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w_full), 2).alias("last_price"),
    ).orderBy("o_custkey", "o_orderkey")


# ---------------------------------------------------------------------------
# ntile / percent_rank / cume_dist over customer balances
# ---------------------------------------------------------------------------

Q33_SQL = """
SELECT
  c_custkey,
  NTILE(4) OVER w                      AS quartile,
  ROUND(PERCENT_RANK() OVER w, 4)      AS pct_rank,
  ROUND(CUME_DIST() OVER w, 4)         AS cume
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey
"""


@query("q33_acctbal_quartiles", Q33_SQL)
def q33_acctbal_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase global ranking — the scale-correct replacement for a
    partition-less window (which serializes every row through ONE task).

    Phase 1: ``repartitionByRange`` on the total order key gives
    range-disjoint partitions; per-partition local ``row_number`` runs
    in parallel (window partitioned by ``spark_partition_id``).
    Phase 2: per-partition counts (one tiny P-row table, P = shuffle
    partitions) are prefix-summed into offsets; a broadcast join adds
    each partition's offset to its local ranks, yielding the exact
    global ``row_number`` without any global sort onto one task.

    Because (c_acctbal, c_custkey) is a total order with no ties,
    ``rank == row_number``, so NTILE / PERCENT_RANK / CUME_DIST are
    closed-form in (rn, n) — assigned as a codegen projection:
      ntile(4):      first (n%4) buckets get n/4+1 rows, rest n/4
      percent_rank:  (rn-1)/(n-1)
      cume_dist:     rn/n
    The only remaining partition-less window runs over the P-row count
    table (same shape as q98's bucket-offset table) — bounded by the
    partition count, never by the data.
    """
    c = _t(spark, sf_dir, "customer")
    parts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    ranged = (
        c.select("c_custkey", "c_acctbal")
        .repartitionByRange(parts, "c_acctbal", "c_custkey")
        .withColumn("_pid", F.spark_partition_id())
    )
    # P-row side: per-range-partition counts -> exclusive prefix-sum
    # offsets + grand total (window over <= `parts` rows)
    w_pid = W.orderBy("_pid")
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.count("*").alias("_cnt"))
        .select(
            "_pid",
            F.coalesce(
                F.sum("_cnt").over(w_pid.rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0),
            ).alias("_off"),
            F.sum("_cnt")
            .over(w_pid.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
            .alias("_n"),
        )
    )
    w_local = W.partitionBy("_pid").orderBy("c_acctbal", "c_custkey")
    rn = (F.col("_off") + F.row_number().over(w_local)).alias("_rn")
    ranked = ranged.join(F.broadcast(offsets), "_pid").select("c_custkey", rn, "_n")
    # closed-form ntile(4): base = n div 4, rem = n mod 4; the first
    # `rem` buckets hold base+1 rows (Spark's and DuckDB's shared
    # NTILE definition); ceil(a/b) = (a+b-1) div b in exact longs
    n, r4 = F.col("_n"), F.col("_n") % 4
    big = (F.floor(F.col("_n") / 4) + 1).cast("long")  # rows per early bucket
    cut = r4 * big  # rows covered by the base+1-sized buckets
    rn_c = F.col("_rn")
    quartile = (
        F.when(n < 4, rn_c)  # degenerate: fewer rows than buckets
        .when(rn_c <= cut, F.floor((rn_c + big - 1) / big))
        .otherwise(r4 + F.floor((rn_c - cut + F.floor(n / 4) - 1) / F.floor(n / 4)))
        .cast("int")
        .alias("quartile")
    )
    return ranked.select(
        "c_custkey",
        quartile,
        F.round(
            F.when(n > 1, (rn_c - 1).cast("double") / (n - 1).cast("double")).otherwise(0.0), 4
        ).alias("pct_rank"),
        F.round(rn_c.cast("double") / n.cast("double"), 4).alias("cume"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# RANGE frame: orders within ±10 days per customer
# ---------------------------------------------------------------------------

Q34_SQL = """
SELECT
  o_custkey,
  o_orderkey,
  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                 RANGE BETWEEN 864000 PRECEDING AND 864000 FOLLOWING) AS neighbors,
  ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                 RANGE BETWEEN 864000 PRECEDING AND 864000 FOLLOWING), 2) AS neighbor_spend
FROM orders
ORDER BY o_custkey, o_orderkey
"""


@query("q34_range_frame_neighbors", Q34_SQL)
def q34_range_frame_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-864000, 864000)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count("*").over(w).alias("neighbors"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("neighbor_spend"),
    ).orderBy("o_custkey", "o_orderkey")


# ---------------------------------------------------------------------------
# Array aggregation: sorted distinct size list per brand
# ---------------------------------------------------------------------------

Q35_SQL = """
SELECT p_brand,
       array_to_string(list_sort(list(DISTINCT p_size)), ',') AS sizes,
       len(list_sort(list(DISTINCT p_size))) AS n_sizes
FROM part
GROUP BY p_brand
ORDER BY p_brand
"""


@query("q35_brand_size_arrays", Q35_SQL)
def q35_brand_size_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array agg surfaced as a canonical ','-joined STRING: the driver's
    comparator sorts result columns in pandas and crashes on ndarray
    cells (round-1 q35/q36/q37 err), so no oracled query may return
    array<T>. The array op itself (array_sort ∘ collect_set) is
    unchanged — only the surfacing is scalar."""
    p = _t(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(F.array_sort(F.collect_set("p_size")).alias("_sizes"))
        .select(
            "p_brand",
            F.array_join(F.col("_sizes").cast("array<string>"), ",").alias("sizes"),
            F.size("_sizes").alias("n_sizes"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# Per-order quantity arrays (ordered collect_list) + array reductions
# ---------------------------------------------------------------------------

Q36_SQL = """
SELECT l_orderkey,
       array_to_string(list(CAST(l_quantity AS INT) ORDER BY l_linenumber, l_quantity), ',')
         AS quantities,
       CAST(MAX(l_quantity) AS BIGINT) AS max_qty,
       CAST(SUM(l_quantity) AS BIGINT) AS total_qty
FROM lineitem
GROUP BY l_orderkey
HAVING COUNT(*) >= 5
ORDER BY l_orderkey
"""


@query("q36_order_quantity_arrays", Q36_SQL)
def q36_order_quantity_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive collect: sort_array over (linenumber, qty)
    structs then strip the key — deterministic without relying on
    collect_list's undefined ordering. Surfaced driver-safe: the array
    as a ','-joined string of ints (l_quantity is integral 1..50 in the
    data), max/total as BIGINT — no array or raw-double output."""
    li = _t(spark, sf_dir, "lineitem")
    pairs = F.array_sort(F.collect_list(F.struct("l_linenumber", "l_quantity")))
    qty = F.transform(pairs, lambda s: s["l_quantity"])
    return (
        li.groupBy("l_orderkey")
        .agg(qty.alias("_quantities"), F.count("*").alias("_n"))
        .filter(F.col("_n") >= 5)
        .select(
            "l_orderkey",
            F.array_join(
                F.transform("_quantities", lambda x: x.cast("int").cast("string")), ","
            ).alias("quantities"),
            F.array_max("_quantities").cast("long").alias("max_qty"),
            F.aggregate("_quantities", F.lit(0.0), lambda a, x: a + x)
            .cast("long")
            .alias("total_qty"),
        )
        .orderBy("l_orderkey")
    )


# ---------------------------------------------------------------------------
# regexp_extract_all over part names
# ---------------------------------------------------------------------------

Q37_SQL = """
SELECT p_partkey,
       array_to_string(regexp_extract_all(p_name, '[a-z]+', 0), ' ') AS words,
       len(regexp_extract_all(p_name, '[a-z]+', 0)) AS n_words
FROM part
WHERE p_partkey <= 500
ORDER BY p_partkey
"""


@query("q37_part_name_tokens", Q37_SQL)
def q37_part_name_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all surfaced as a ' '-joined string (driver's
    comparator can't sort array cells — see q35)."""
    p = _t(spark, sf_dir, "part")
    words = F.expr("regexp_extract_all(p_name, '[a-z]+', 0)")
    return (
        p.filter(F.col("p_partkey") <= 500)
        .select(
            "p_partkey",
            F.array_join(words, " ").alias("words"),
            F.size(words).alias("n_words"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# Exact percentiles per market segment
# ---------------------------------------------------------------------------

Q38_SQL = """
SELECT c_mktsegment,
       ROUND(quantile_cont(c_acctbal, 0.25), 4) AS q25,
       ROUND(quantile_cont(c_acctbal, 0.50), 4) AS q50,
       ROUND(quantile_cont(c_acctbal, 0.75), 4) AS q75
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("q38_segment_percentiles", Q38_SQL)
def q38_segment_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolating) percentiles — the oracle-checkable twin;
    at 100 TB swap percentile() for approx_percentile (t-digest sketch,
    mergeable map-side) and accept sketch error."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(c_acctbal, 0.25)"), 4).alias("q25"),
            F.round(F.expr("percentile(c_acctbal, 0.50)"), 4).alias("q50"),
            F.round(F.expr("percentile(c_acctbal, 0.75)"), 4).alias("q75"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# max_by / arg_max: each customer's highest-value order
# ---------------------------------------------------------------------------

Q39_SQL = """
SELECT o_custkey, o_orderkey AS best_order, ROUND(o_totalprice, 2) AS best_price
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
  FROM orders
)
WHERE rn = 1
ORDER BY o_custkey
"""


@query("q39_best_order_per_customer", Q39_SQL)
def q39_best_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by with a (price, orderkey) compound ordering — tie-broken
    deterministically, one map-side-combinable aggregate (vs the
    row_number window alternative, which shuffles whole rows)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.expr(
                "max_by(o_orderkey, struct(o_totalprice, o_orderkey))"
            ).alias("best_order"),
            F.round(F.max("o_totalprice"), 2).alias("best_price"),
        )
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# Map functions: construct, merge, sort entries, stringify
# ---------------------------------------------------------------------------

Q49_SQL = """
SELECT event_id,
       'src=' || 'events' || ',type=' || event_type || ',uid=' || CAST(user_id AS VARCHAR)
         AS map_repr,
       3 AS n_keys
FROM events
WHERE event_id < 1000
ORDER BY event_id
"""


@query("q49_map_functions", Q49_SQL)
def q49_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map surface (create_map / map_concat / map_entries /
    map_keys) — surfaced as a canonical sorted-entries string because
    map column hashing is engine-specific; the oracle builds the same
    string directly."""
    e = _t(spark, sf_dir, "events")
    m = F.map_concat(
        F.create_map(F.lit("type"), F.col("event_type")),
        F.create_map(F.lit("uid"), F.col("user_id").cast("string")),
        F.create_map(F.lit("src"), F.lit("events")),
    )
    entries = F.array_sort(F.map_entries(m))
    repr_ = F.concat_ws(
        ",", F.transform(entries, lambda kv: F.concat(kv["key"], F.lit("="), kv["value"]))
    )
    return (
        e.filter(F.col("event_id") < 1000)
        .select("event_id", repr_.alias("map_repr"), F.size(F.map_keys(m)).alias("n_keys"))
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Grouped-aggregate pandas UDAF: geometric mean of event values
# ---------------------------------------------------------------------------

Q64_SQL = """
SELECT event_type,
       ROUND(exp(AVG(ln(value))), 4) AS geo_mean
FROM events
WHERE value > 0
GROUP BY event_type
ORDER BY event_type
"""


@query("q64_grouped_agg_udaf", Q64_SQL)
def q64_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDAF surface (SURVEY.md §2.5): an Arrow grouped-aggregate
    pandas UDF. Geometric mean is deliberately also SQL-expressible
    (exp∘avg∘ln) so even the Python-aggregate path stays under the
    DuckDB oracle. At scale: grouped-agg pandas UDFs get no partial
    aggregation — the whole group ships to one worker — so built-ins
    remain the hot-path rule; this demonstrates the escape hatch."""
    @F.pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    e = _t(spark, sf_dir, "events")
    return (
        e.filter(F.col("value") > 0)
        .groupBy("event_type")
        .agg(F.round(geo_mean("value"), 4).alias("geo_mean"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Python UDTF (lateral join): tokenize part names with positions
# ---------------------------------------------------------------------------

Q65_SQL = """
SELECT p_partkey, u.w AS word, u.i AS pos
FROM (SELECT p_partkey, string_split(p_name, ' ') AS ws
      FROM part WHERE p_partkey <= 200),
     UNNEST(list_transform(generate_series(1, len(ws)),
                           i -> {'w': ws[i], 'i': i})) AS t(u)
ORDER BY p_partkey, pos
"""


@query("q65_udtf_lateral_tokens", Q65_SQL)
def q65_udtf_lateral_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDTF surface (SURVEY.md §2.5): a Python table function in a
    LATERAL join. This one is also expressible as posexplode (hence
    oracle-checkable); real uses are row-expanding logic Python owns
    (parsers, segmenters). Arrow-batched like any pandas UDF path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, pos int", useArrow=True)
    class TokenizeWithPos:
        def eval(self, name: str):
            for i, w in enumerate((name or "").split(" "), start=1):
                yield w, i

    spark.udtf.register("tokenize_with_pos", TokenizeWithPos)
    _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200).createOrReplaceTempView(
        "_part_for_udtf"
    )
    return spark.sql(
        """
        SELECT p_partkey, t.word, t.pos
        FROM _part_for_udtf, LATERAL tokenize_with_pos(p_name) t
        ORDER BY p_partkey, pos
        """
    )


# ---------------------------------------------------------------------------
# approx_count_distinct: HLL sketch vs exact, tolerance asserted in-query
# ---------------------------------------------------------------------------

Q66_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS approx_within_5pct
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("q66_approx_count_distinct", Q66_SQL)
def q66_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++, rsd=0.02) — sketches aren't
    portable across engines, so the oracle-checked surface is the
    exact count plus a boolean asserting the sketch landed within 5%
    of it. At 100 TB the sketch is the point: mergeable, map-side
    combinable, no distinct shuffle."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("approx_within_5pct"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Six-table multi-way join (TPC-H Q5 shape): regional revenue
# ---------------------------------------------------------------------------

Q67_SQL = """
SELECT r_name AS region, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
GROUP BY r_name
ORDER BY r_name
"""


@query("q67_regional_revenue_6way", Q67_SQL)
def q67_regional_revenue_6way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: fact-fact join (orders⋈lineitem) shuffles on its
    key; supplier/nation/region ride as broadcasts. Catalyst reorders
    freely because the plan is declarative."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1995-01-01")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# OR-of-ANDs predicates (TPC-H Q19 shape): pushdown across disjunctions
# ---------------------------------------------------------------------------

Q68_SQL = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#5' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


@query("q68_or_predicate_revenue", Q68_SQL)
def q68_or_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctions across BOTH join
    sides — Catalyst derives the single-side implications (brand/size
    on part, quantity on lineitem) and pushes them below the join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    ) | (
        (F.col("p_brand") == "Brand#5")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Windowed ratio: customers spending > 2x their segment average
# ---------------------------------------------------------------------------

Q69_SQL = """
WITH spend AS (
  SELECT c_custkey, c_mktsegment, SUM(o_totalprice) AS total
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey, c_mktsegment
),
ranked AS (
  SELECT c_custkey, c_mktsegment, total,
         AVG(total) OVER (PARTITION BY c_mktsegment) AS seg_avg
  FROM spend
)
SELECT c_custkey, c_mktsegment,
       ROUND(total, 2) AS total_spend,
       ROUND(total / seg_avg, 4) AS vs_segment
FROM ranked
WHERE total > 2 * seg_avg
ORDER BY c_custkey
"""


@query("q69_big_spenders_vs_segment", Q69_SQL)
def q69_big_spenders_vs_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate → window-over-aggregate → filter on the window value
    (QUALIFY shape). One shuffle for the groupBy, one for the segment
    window — both on small (per-customer) data after the fact-side
    reduction."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    spend = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.sum("o_totalprice").alias("total"))
    )
    w = W.partitionBy("c_mktsegment")
    return (
        spend.withColumn("_seg_avg", F.avg("total").over(w))
        .filter(F.col("total") > 2 * F.col("_seg_avg"))
        .select(
            "c_custkey",
            "c_mktsegment",
            F.round("total", 2).alias("total_spend"),
            F.round(F.col("total") / F.col("_seg_avg"), 4).alias("vs_segment"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Unpivot / melt: wide per-type stats → long (metric, value) rows
# ---------------------------------------------------------------------------

Q75_SQL = """
WITH wide AS (
  SELECT event_type,
         ROUND(AVG(value), 4) AS avg_value,
         ROUND(MIN(value), 4) AS min_value,
         ROUND(MAX(value), 4) AS max_value
  FROM events
  GROUP BY event_type
)
SELECT event_type, metric, value
FROM wide UNPIVOT (value FOR metric IN (avg_value, min_value, max_value))
ORDER BY event_type, metric
"""


@query("q75_unpivot_event_stats", Q75_SQL)
def q75_unpivot_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reshape surface: wide→long via DataFrame.unpivot (melt) — the
    inverse of q20's pivot. Narrow op, no shuffle beyond the agg."""
    e = _t(spark, sf_dir, "events")
    wide = e.groupBy("event_type").agg(
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
    )
    return wide.unpivot(
        ids=["event_type"],
        values=["avg_value", "min_value", "max_value"],
        variableColumnName="metric",
        valueColumnName="value",
    ).orderBy("event_type", "metric")


# ---------------------------------------------------------------------------
# Null semantics: null-safe equality join + coalesce/nullif
# ---------------------------------------------------------------------------

Q76_SQL = """
WITH l AS (
  SELECT o_orderkey, NULLIF(o_orderpriority, '3-MEDIUM') AS pri
  FROM orders WHERE o_orderkey <= 2000
),
r AS (
  SELECT DISTINCT NULLIF(o_orderpriority, '3-MEDIUM') AS pri, 1 AS matched
  FROM orders
)
SELECT COALESCE(l.pri, 'none') AS priority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(r.matched) AS BIGINT) AS n_matched
FROM l JOIN r ON l.pri IS NOT DISTINCT FROM r.pri
GROUP BY 1
ORDER BY 1
"""


@query("q76_null_safe_join", Q76_SQL)
def q76_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics surface: NULLIF manufactures nulls, the join uses
    null-safe equality (<=> / IS NOT DISTINCT FROM — nulls DO match
    nulls, unlike plain =), COALESCE restores a display value."""
    o = _t(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderkey") <= 2000).select(
        "o_orderkey", F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("pri")
    )
    right = (
        o.select(F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("pri"))
        .distinct()
        .withColumn("matched", F.lit(1))
    )
    return (
        left.join(right, left["pri"].eqNullSafe(right["pri"]))
        .groupBy(F.coalesce(left["pri"], F.lit("none")).alias("priority"))
        .agg(F.count("*").alias("n"), F.sum("matched").alias("n_matched"))
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Full outer join — both-sided non-matches surfaced with COALESCE
# ---------------------------------------------------------------------------

Q79_SQL = """
WITH l AS (
  SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
),
r AS (
  SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS spend
  FROM orders GROUP BY o_custkey
)
SELECT
  COALESCE(l.c_custkey, r.o_custkey) AS custkey,
  l.c_custkey IS NOT NULL AS in_segment,
  r.o_custkey IS NOT NULL AS has_orders,
  COALESCE(r.n_orders, 0) AS n_orders,
  COALESCE(r.spend, 0.0) AS spend
FROM l FULL OUTER JOIN r ON l.c_custkey = r.o_custkey
ORDER BY custkey
"""


@query("q79_full_outer_customer_orders", Q79_SQL)
def q79_full_outer_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER completes the join-type surface (inner q02, semi q04,
    anti q05, as-of q29, range q30, null-safe q76): BUILDING customers
    with no orders surface left-only, other segments' orders right-only.
    Full outer can't broadcast — Catalyst picks sort-merge; both sides
    shuffle on the key, which is the correct 100 TB plan."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_name")
    r = o.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("spend")
    )
    j = l.join(r, l["c_custkey"] == r["o_custkey"], "full_outer")
    return j.select(
        F.coalesce(l["c_custkey"], r["o_custkey"]).alias("custkey"),
        l["c_custkey"].isNotNull().alias("in_segment"),
        r["o_custkey"].isNotNull().alias("has_orders"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("spend", F.lit(0.0)).alias("spend"),
    ).orderBy("custkey")


# ---------------------------------------------------------------------------
# Statistical aggregates: correlation, covariance, variance, regression
# ---------------------------------------------------------------------------

Q80_SQL = """
SELECT
  l_returnflag,
  COUNT(*) AS n,
  ROUND(corr(l_quantity, l_extendedprice), 4)       AS corr_qty_price,
  ROUND(covar_pop(l_quantity, l_extendedprice), 2)  AS covar_pop_qp,
  ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_samp_qp,
  ROUND(stddev_samp(l_quantity), 4)                 AS sd_qty,
  ROUND(var_pop(l_quantity), 4)                     AS var_qty,
  ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
  ROUND(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("q80_stats_aggregates", Q80_SQL)
def q80_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-moment aggregates (corr/covar/var/regr): all single-pass,
    map-side-combinable HashAggregates — one shuffle of 3-field
    moment buffers per group, nothing data-sized moves.

    Determinism note: these ROUND partition-order-dependent double
    accumulations, which flakes only if a group's true value sits
    within the engines' ~1e-12 accumulation difference of a rounding
    boundary — unlike q43/q45's small-denominator rationals (which DID
    land exactly on boundaries and now use exact_round_div), co-moment
    values carry n-dependent irrational-ish denominators; verified
    stable at sf0.01/sf0.1 × 7/32-way."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
            F.round(F.covar_pop("l_quantity", "l_extendedprice"), 2).alias("covar_pop_qp"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_samp_qp"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_pop("l_quantity"), 4).alias("var_qty"),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias("intercept"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Deterministic sampling (layout-independent, engine-portable)
# ---------------------------------------------------------------------------

Q84_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS sampled_spend
FROM orders
WHERE substr(md5(CAST(o_orderkey AS VARCHAR) || '#' || 'sample'), 1, 8) < '19999999'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q84_hash_sample", Q84_SQL)
def q84_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample of orders by key hash. Unlike
    df.sample(), the selected set is a pure function of the key — the
    same rows at any partitioning, executor count, or engine (the
    oracle runs the identical md5-threshold predicate)."""
    from ml_with_spark_streaming_spark.operators.sampling import hash_sample

    o = _t(spark, sf_dir, "orders")
    return (
        hash_sample(o, "o_orderkey", 0.1)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("sampled_spend"))
        .orderBy("o_orderpriority")
    )


Q85_SQL = """
SELECT o_orderpriority, COUNT(*) AS n
FROM orders
WHERE substr(md5(CAST(o_orderkey AS VARCHAR) || '#' || 'sample'), 1, 8) <
      CASE o_orderpriority
        WHEN '1-URGENT' THEN '80000000'
        WHEN '5-LOW'    THEN '0ccccccc'
        ELSE '00000000'
      END
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q85_stratified_sample", Q85_SQL)
def q85_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling: keep 50% of URGENT, 5% of
    LOW, drop everything else — the class-rebalancing primitive for
    training-data pipelines, as one codegen predicate."""
    from ml_with_spark_streaming_spark.operators.sampling import stratified_hash_sample

    o = _t(spark, sf_dir, "orders")
    return (
        stratified_hash_sample(o, "o_orderkey", "o_orderpriority", {"1-URGENT": 0.5, "5-LOW": 0.05})
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# VariantType semi-structured access (Spark 4 parse_json)
# ---------------------------------------------------------------------------

Q86_SQL = """
SELECT CAST(json_extract(props, '$.k') AS INT) // 10 AS k_decade,
       COUNT(*) AS n,
       ROUND(AVG(value), 4) AS avg_value
FROM events
GROUP BY k_decade
ORDER BY k_decade
"""


@query("q86_variant_json", Q86_SQL)
def q86_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VariantType
    (parse_json → variant_get) rather than per-path string re-parsing
    (q26's get_json_object): parse once, extract many — the open-table
    semi-structured pattern."""
    e = _t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        e.select((F.floor(k / 10)).cast("int").alias("k_decade"), "value")
        .groupBy("k_decade")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
        .orderBy("k_decade")
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: correlated EXISTS + NOT EXISTS self-joins on the fact table
# ---------------------------------------------------------------------------

Q87_SQL = """
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS is_late
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
)
SELECT s.s_name, COUNT(*) AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE l1.is_late
  AND EXISTS (SELECT 1 FROM late l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.is_late)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
"""


@query("q87_waiting_suppliers", Q87_SQL)
def q87_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (testdata lacks receipt/commit dates, so 'late'
    = shipped >60 days after order date): the sole late supplier in a
    multi-supplier finished order.

    SINGLE-PASS rewrite (round-1 plan_lint flagged the literal
    EXISTS/NOT-EXISTS form for scanning lineitem 3x — at 100 TB that is
    three full fact scans): scan lineitem ONCE, aggregate per
    (orderkey, suppkey) counting that supplier's late rows, then decide
    both correlated predicates per order with window counts over the
    already-shuffled slim table — EXISTS(other supplier) == n_supp >= 2,
    NOT EXISTS(other LATE supplier) == n_late_supp == 1. The explicit
    repartition(l_orderkey) makes one shuffle serve the groupBy AND the
    window (HashPartitioning(orderkey) satisfies both distributions).
    numwait stays lineitem-row-grained via sum(n_late_rows)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    late = li.join(o.select("o_orderkey", "o_orderdate"), li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.date_add("o_orderdate", 60)).alias("is_late"),
    )
    per_supp = (
        late.repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(F.col("is_late").cast("long")).alias("n_late_rows"))
    )
    w = W.partitionBy("l_orderkey")
    sole = per_supp.select(
        "l_suppkey",
        "n_late_rows",
        F.count("*").over(w).alias("n_supp"),
        F.sum((F.col("n_late_rows") > 0).cast("long")).over(w).alias("n_late_supp"),
    ).filter((F.col("n_late_rows") > 0) & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    return (
        sole.join(s, sole["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.sum("n_late_rows").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE): ancestor-chain walk
# ---------------------------------------------------------------------------

Q89_SQL = """
WITH RECURSIVE chain(custkey, anc, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey <= 200
  UNION ALL
  SELECT custkey, anc // 2, depth + 1 FROM chain WHERE anc > 1
)
SELECT depth, COUNT(*) AS n, CAST(SUM(anc) AS BIGINT) AS anc_sum
FROM chain
GROUP BY depth
ORDER BY depth
"""


@query("q89_recursive_hierarchy", Q89_SQL)
def q89_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (new in Spark 4): walk the synthetic binary-tree
    ancestry anc -> anc/2 from each customer key to the root —
    per-level node counts + ancestor-key checksums. Iterative plans
    (each recursion step is one more union leg) are the one SQL shape
    the DataFrame API can't express declaratively."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("_cust_for_rec")
    return spark.sql(
        """
        WITH RECURSIVE chain(custkey, anc, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM _cust_for_rec WHERE c_custkey <= 200
          UNION ALL
          SELECT custkey, anc DIV 2, depth + 1 FROM chain WHERE anc > 1
        )
        SELECT depth, COUNT(*) AS n, SUM(anc) AS anc_sum
        FROM chain
        GROUP BY depth
        ORDER BY depth
        """
    )
