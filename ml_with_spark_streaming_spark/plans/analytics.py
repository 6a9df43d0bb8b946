"""Product/time-series analytics queries: funnel steps, retention
cohorts, gap-filled resampling.

These are the classic event-analytics shapes (funnel, cohort
retention, resample+fill) every warehouse/product-analytics engine
ships; none needs more than windows + joins + conditional aggregation,
so they stay entirely inside whole-stage codegen.

Timestamp hygiene: every output time column is a formatted string
(house rule — the driver comparator mishandles raw timestamps), and
events are read via ``load_table`` (nanos-parquet handling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.lineage import maybe_checkpoint
from ml_with_spark_streaming_spark.plans.registry import query
from ml_with_spark_streaming_spark.sources.batch import load_table

_FMT = "yyyy-MM-dd HH:mm:ss"

# ---------------------------------------------------------------------------
# q94 — funnel: view → click → purchase, per-user sequential milestones
# ---------------------------------------------------------------------------

Q94_SQL = """
WITH s1 AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) OVER (PARTITION BY user_id) AS t1,
         ts, event_type
  FROM events
),
s2 AS (
  SELECT user_id, t1,
         MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END) OVER (PARTITION BY user_id) AS t2,
         ts, event_type
  FROM s1
),
s3 AS (
  SELECT user_id, t1, t2,
         MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END) OVER (PARTITION BY user_id) AS t3
  FROM s2
),
u AS (SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3 FROM s3 GROUP BY user_id)
SELECT 'step1_view' AS step, CAST(COUNT(t1) AS BIGINT) AS n_users FROM u
UNION ALL
SELECT 'step2_click', CAST(COUNT(t2) AS BIGINT) FROM u
UNION ALL
SELECT 'step3_purchase', CAST(COUNT(t3) AS BIGINT) FROM u
ORDER BY step
"""


@query("q94_funnel_steps", Q94_SQL)
def q94_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential conversion funnel (first view → first later click →
    first later purchase) counted per user.

    One scan: all three milestone columns are windows partitioned by
    user_id, planned as chained Window operators — the sequential
    data dependency costs no extra pass over events (the follow-up
    per-user groupBy reuses the window's hash partitioning)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    s = (
        e.select("user_id", "event_type", "ts")
        .withColumn("t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w))
        .withColumn(
            "t2",
            F.min(
                F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")), F.col("ts")
                )
            ).over(w),
        )
    )
    u = s.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    agg = u.agg(
        F.count("t1").cast("long").alias("step1_view"),
        F.count("t2").cast("long").alias("step2_click"),
        F.count("t3").cast("long").alias("step3_purchase"),
    )
    return (
        agg.unpivot([], ["step1_view", "step2_click", "step3_purchase"], "step", "n_users")
        .select("step", F.col("n_users").cast("long").alias("n_users"))
        .orderBy("step")
    )


# ---------------------------------------------------------------------------
# q95 — weekly retention cohorts
# ---------------------------------------------------------------------------

Q95_SQL = """
WITH ev AS (
  SELECT user_id, ts FROM events WHERE ts IS NOT NULL
),
firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week FROM ev GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(date_diff('day', f.cohort_week, date_trunc('week', e.ts)) // 7 AS BIGINT) AS week_offset
  FROM ev e JOIN firsts f ON f.user_id = e.user_id
)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week, week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM activity
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("q95_retention_cohorts", Q95_SQL)
def q95_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: users grouped by the week of their
    first event; n_users active per (cohort, week-offset).

    Two shuffles (per-user first-event agg, then the cohort
    re-aggregation); the user→cohort table is user-count-sized and
    joins back broadcast/shuffled by AQE's choice. NULL ts rows are
    filtered explicitly so cohort semantics are pinned rather than
    dependent on the testdata happening to be non-null."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    # cohort as a window over the single event scan — the groupBy+
    # self-join formulation reads events twice
    activity = (
        e.select(
            "user_id",
            F.date_trunc("week", F.min("ts").over(W.partitionBy("user_id"))).alias(
                "cohort_week"
            ),
            "ts",
        )
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / F.lit(7)
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_users",
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# q96 — daily resample with gap fill (zero-fill + forward carry)
# ---------------------------------------------------------------------------

Q96_SQL = """
WITH ev AS (
  SELECT ts, event_type, value FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
bounds AS (
  SELECT date_trunc('day', MIN(ts)) AS d0, date_trunc('day', MAX(ts)) AS d1 FROM ev
),
grid AS (
  SELECT t.event_type, g.day
  FROM (SELECT DISTINCT event_type FROM ev) t
  CROSS JOIN (SELECT unnest(generate_series(d0, d1, INTERVAL '1 day')) AS day FROM bounds) g
),
daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
  FROM ev GROUP BY 1, 2
)
SELECT strftime(g.day, '%Y-%m-%d') AS day, g.event_type,
       CAST(COALESCE(d.n, 0) AS BIGINT) AS n,
       CAST(COALESCE(d.sum_cents, 0) AS BIGINT) AS zero_filled_cents,
       CAST(COALESCE(LAST_VALUE(d.sum_cents IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT) AS carried_cents
FROM grid g LEFT JOIN daily d ON d.event_type = g.event_type AND d.day = g.day
ORDER BY 1, 2
"""


@query("q96_gapfill_resample", Q96_SQL)
def q96_gapfill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample: daily per-type sums over a dense day grid
    spanning [min(ts), max(ts)], with both fill policies surfaced —
    zero-fill and forward-carry (LAST_VALUE IGNORE NULLS).

    The grid is generated with ``sequence()`` from a 1-row bounds
    aggregate (days × types, never data-sized); the heavy side is one
    daily aggregation of events. The gap-fill join broadcasts the
    DAILY side: both join inputs are group-count-bounded (observed
    (type, day) groups ⊆ the dense grid), and a broadcast hint on the
    row-preserved grid side of a left join is un-honorable — Spark
    cannot build-broadcast the preserved side (the lint's
    DeadBroadcastHint rule pins this).

    Daily sums are surfaced as exact integer cents (per-row half-up
    ``floor(value*100 + 0.5)`` — the same IEEE double ops on both
    engines — summed as BIGINT): distributed SUM(double) order and
    Spark-vs-DuckDB ROUND(double) algorithm differences must never
    cross the engine boundary (house rule). NULL ts/event_type rows
    are filtered explicitly on both sides (collect_set drops NULLs
    while DISTINCT keeps them — pin the semantics instead)."""
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
    )
    # one metadata pass yields bounds AND the (bounded-cardinality)
    # type set — separate bounds/distinct scans read events twice more
    meta = e.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
        F.array_sort(F.collect_set("event_type")).alias("types"),
    )
    grid = meta.select(F.explode("types").alias("event_type"), "d0", "d1").select(
        "event_type",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    daily = F.broadcast(
        e.groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        ).agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("sum_cents"),
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(daily, ["event_type", "day"], "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.coalesce("sum_cents", F.lit(0)).cast("long").alias("zero_filled_cents"),
            F.coalesce(
                F.last("sum_cents", ignorenulls=True).over(w), F.lit(0)
            )
            .cast("long")
            .alias("carried_cents"),
        )
        .orderBy("day", "event_type")
    )


# ---------------------------------------------------------------------------
# q97 — table profile (data-quality summary per column)
# ---------------------------------------------------------------------------

Q97_SQL = """
WITH p AS (
  SELECT
    CAST(COUNT(*) AS BIGINT) AS n_rows,
    CAST(COUNT(l_shipdate) AS BIGINT) AS sd_nn, CAST(COUNT(DISTINCT l_shipdate) AS BIGINT) AS sd_nd,
    strftime(MIN(l_shipdate), '%Y-%m-%d') AS sd_min, strftime(MAX(l_shipdate), '%Y-%m-%d') AS sd_max,
    CAST(COUNT(l_quantity) AS BIGINT) AS q_nn, CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS q_nd,
    CAST(MIN(l_quantity) AS VARCHAR) AS q_min, CAST(MAX(l_quantity) AS VARCHAR) AS q_max,
    CAST(COUNT(l_returnflag) AS BIGINT) AS rf_nn, CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS rf_nd,
    MIN(l_returnflag) AS rf_min, MAX(l_returnflag) AS rf_max,
    CAST(COUNT(l_orderkey) AS BIGINT) AS ok_nn, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS ok_nd,
    CAST(MIN(l_orderkey) AS VARCHAR) AS ok_min, CAST(MAX(l_orderkey) AS VARCHAR) AS ok_max
  FROM lineitem
)
SELECT col, n_rows, n_nulls, n_distinct, min_value, max_value FROM (
  SELECT 'l_shipdate' AS col, n_rows, n_rows - sd_nn AS n_nulls, sd_nd AS n_distinct,
         sd_min AS min_value, sd_max AS max_value FROM p
  UNION ALL
  SELECT 'l_quantity', n_rows, n_rows - q_nn, q_nd, q_min, q_max FROM p
  UNION ALL
  SELECT 'l_returnflag', n_rows, n_rows - rf_nn, rf_nd, rf_min, rf_max FROM p
  UNION ALL
  SELECT 'l_orderkey', n_rows, n_rows - ok_nn, ok_nd, ok_min, ok_max FROM p
)
ORDER BY col
"""


@query("q97_table_profile", Q97_SQL)
def q97_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile (row count, nulls, exact
    distinct, min/max) for a representative column set of lineitem —
    the ANALYZE/profiling pass a pipeline runs before trusting a new
    drop of data.

    ONE scan, one aggregate: all per-column statistics are computed as
    parallel aggregate expressions in a single pass (count-distinct
    columns are planned via Expand — one shuffle, no per-column jobs);
    values surfaced as strings so one long-format result can carry
    heterogeneous column types. At real scale swap exact
    COUNT(DISTINCT) for approx_count_distinct per column."""
    li = load_table(spark, sf_dir, "lineitem")
    p = li.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count("l_shipdate").cast("long").alias("sd_nn"),
        F.count_distinct("l_shipdate").cast("long").alias("sd_nd"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("sd_min"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("sd_max"),
        F.count("l_quantity").cast("long").alias("q_nn"),
        F.count_distinct("l_quantity").cast("long").alias("q_nd"),
        F.min("l_quantity").cast("string").alias("q_min"),
        F.max("l_quantity").cast("string").alias("q_max"),
        F.count("l_returnflag").cast("long").alias("rf_nn"),
        F.count_distinct("l_returnflag").cast("long").alias("rf_nd"),
        F.min("l_returnflag").alias("rf_min"),
        F.max("l_returnflag").alias("rf_max"),
        F.count("l_orderkey").cast("long").alias("ok_nn"),
        F.count_distinct("l_orderkey").cast("long").alias("ok_nd"),
        F.min("l_orderkey").cast("string").alias("ok_min"),
        F.max("l_orderkey").cast("string").alias("ok_max"),
    )
    # ONE row — materialize it, or each long-format union branch below
    # re-plans the whole aggregation from the scan (4 scans -> 1)
    p = maybe_checkpoint(p)
    rows = []
    for col, nn, nd, mn, mx in [
        ("l_shipdate", "sd_nn", "sd_nd", "sd_min", "sd_max"),
        ("l_quantity", "q_nn", "q_nd", "q_min", "q_max"),
        ("l_returnflag", "rf_nn", "rf_nd", "rf_min", "rf_max"),
        ("l_orderkey", "ok_nn", "ok_nd", "ok_min", "ok_max"),
    ]:
        rows.append(
            p.select(
                F.lit(col).alias("col"),
                F.col("n_rows"),
                (F.col("n_rows") - F.col(nn)).cast("long").alias("n_nulls"),
                F.col(nd).alias("n_distinct"),
                F.col(mn).alias("min_value"),
                F.col(mx).alias("max_value"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("col")


# ---------------------------------------------------------------------------
# q109 — table profile at scale: approx distinct counts (q97's scale swap)
# ---------------------------------------------------------------------------


@query("q109_table_profile_approx", no_oracle_reason="HLL sketches differ across engines")
def q109_table_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q97's per-column profile with the documented 100 TB swap
    applied: ``approx_count_distinct`` (HyperLogLog++, rsd 2%) instead
    of exact COUNT(DISTINCT). Exact distinct plans an Expand — one
    duplicated pass of the aggregation input per distinct column (4x
    here); the sketch version is ONE ordinary aggregation pass with
    four 16 KB HLL buffers, the only formulation that survives a
    100 TB fact table. Rows-only check (DuckDB's approx_distinct is a
    different HLL — values legitimately differ); the accuracy contract
    vs exact counts is pinned by
    tests/test_analytics.py::test_approx_profile_within_rsd."""
    li = load_table(spark, sf_dir, "lineitem")
    p = li.agg(
        F.count("*").cast("long").alias("n_rows"),
        *[
            e
            for col, key in (
                ("l_shipdate", "sd"),
                ("l_quantity", "q"),
                ("l_returnflag", "rf"),
                ("l_orderkey", "ok"),
            )
            for e in (
                F.count(col).cast("long").alias(f"{key}_nn"),
                F.approx_count_distinct(col, rsd=0.02).cast("long").alias(f"{key}_nd"),
            )
        ],
    )
    p = maybe_checkpoint(p)
    rows = []
    for col, key in (
        ("l_shipdate", "sd"),
        ("l_quantity", "q"),
        ("l_returnflag", "rf"),
        ("l_orderkey", "ok"),
    ):
        rows.append(
            p.select(
                F.lit(col).alias("col"),
                F.col("n_rows"),
                (F.col("n_rows") - F.col(f"{key}_nn")).cast("long").alias("n_nulls"),
                F.col(f"{key}_nd").alias("approx_distinct"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("col")


# ---------------------------------------------------------------------------
# q119 — approximate quantile profile (the sketch twin of q97's min/max)
# ---------------------------------------------------------------------------


@query("q119_quantile_profile", no_oracle_reason="GK quantile sketches are engine/merge-order-specific")
def q119_quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column approximate quantiles (p25/p50/p75/p95) for the
    numeric lineitem measures — the distribution half of data
    profiling, next to q109's HLL distinct counts. ``percentile_approx``
    is the Greenwald-Khanna sketch: one ordinary aggregation pass with
    a bounded (accuracy-sized) buffer per column — the only
    formulation that survives a 100 TB fact table, where exact
    percentiles would need a full sort per column.

    Rows-only check: GK results are sketch- and merge-order-specific
    (DuckDB's approx_quantile is t-digest — legitimately different
    values); the rank-error contract vs exact percentiles is pinned by
    tests/test_analytics.py::test_quantile_profile_within_rank_error.
    One scan, one aggregate, 1 sketch row to the driver."""
    li = load_table(spark, sf_dir, "lineitem")
    qs = [0.25, 0.5, 0.75, 0.95]
    cols = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    p = li.agg(
        F.count("*").cast("long").alias("n_rows"),
        *[
            F.percentile_approx(c, qs, 10000).alias(f"_q{i}")
            for i, c in enumerate(cols)
        ],
    )
    p = maybe_checkpoint(p)
    rows = []
    for i, c in enumerate(cols):
        rows.append(
            p.select(
                F.lit(c).alias("col"),
                F.col("n_rows"),
                *[
                    F.format_number(F.col(f"_q{i}")[j], 4).alias(name)
                    for j, name in enumerate(("p25", "p50", "p75", "p95"))
                ],
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("col")


# ---------------------------------------------------------------------------
# q122 — cross-modal referential-integrity audit (documents <-> embeddings)
# ---------------------------------------------------------------------------

Q122_SQL = """
WITH d AS (SELECT doc_id FROM documents),
v AS (SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_rows FROM embeddings GROUP BY vec_id),
j AS (
  SELECT d.doc_id, v.vec_id, v.n_rows
  FROM d FULL OUTER JOIN v ON v.vec_id = d.doc_id
)
SELECT
  CAST(COUNT(doc_id) AS BIGINT) AS n_docs,
  CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) AS n_vec_rows,
  CAST(COUNT(CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL THEN 1 END) AS BIGINT) AS n_matched,
  CAST(COUNT(CASE WHEN vec_id IS NULL THEN 1 END) AS BIGINT) AS n_docs_unembedded,
  CAST(COUNT(CASE WHEN doc_id IS NULL THEN 1 END) AS BIGINT) AS n_orphan_vec_ids,
  CAST(COUNT(CASE WHEN n_rows > 1 THEN 1 END) AS BIGINT) AS n_dup_vec_ids
FROM j
"""


@query("q122_crossmodal_integrity", Q122_SQL)
def q122_crossmodal_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across modalities — the check a
    multimodal pipeline runs before joining text to its embedding
    (or image/audio) sidecar: matched ids, documents without a vector,
    orphan vectors, and duplicated vector ids. One row out.

    Plan: two column-pruned id scans (doc_id; vec_id pre-aggregated so
    duplicate ids collapse before the join), one id-keyed full outer
    join, one conditional aggregate — at 100 TB both sides shuffle by
    the id once and nothing else moves."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    v = (
        load_table(spark, sf_dir, "embeddings")
        .groupBy("vec_id")
        .agg(F.count("*").cast("long").alias("n_rows"))
    )
    j = d.join(v, d.doc_id == v.vec_id, "full_outer")
    return j.agg(
        F.count("doc_id").cast("long").alias("n_docs"),
        F.coalesce(F.sum("n_rows"), F.lit(0)).cast("long").alias("n_vec_rows"),
        F.count(F.when(F.col("doc_id").isNotNull() & F.col("vec_id").isNotNull(), 1))
        .cast("long")
        .alias("n_matched"),
        F.count(F.when(F.col("vec_id").isNull(), 1)).cast("long").alias("n_docs_unembedded"),
        F.count(F.when(F.col("doc_id").isNull(), 1)).cast("long").alias("n_orphan_vec_ids"),
        F.count(F.when(F.col("n_rows") > 1, 1)).cast("long").alias("n_dup_vec_ids"),
    )


# ---------------------------------------------------------------------------
# q127 — exact daily volume anomalies (z^2 threshold, no floats)
# ---------------------------------------------------------------------------

# |z| >= 2 rewritten WITHOUT division, sqrt, or floats: with per-type
# daily counts x over a DENSE day grid (zero-event days included — an
# outage is the anomaly a volume monitor most needs to see), n days,
# S = Σx, Q = Σx²:
#   z² = (n·x − S)² / (n·Q − S²)   →   flag ⟺ (n·x − S)² >= 4·(n·Q − S²)
# Moments run in 128-bit exact integers (Spark DECIMAL(38,0) / DuckDB
# HUGEINT — S² alone exceeds int64 once a type logs ~3e9 events, where
# non-ANSI Spark would wrap silently while DuckDB errors); only the
# BIGINT-safe day count, z²·10⁴, and flag cross the boundary. The
# HALF-UP division is the exact identity (a − a % b) / b on decimals
# (Spark's DIV is integral-only), `//` on HUGEINT in DuckDB.
Q127_SQL = """
WITH ev AS (
  SELECT event_type, date_trunc('day', ts) AS day FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
grid AS (
  SELECT t.event_type, g.day
  FROM (SELECT DISTINCT event_type FROM ev) t
  CROSS JOIN (SELECT unnest(generate_series(d0, d1, INTERVAL '1 day')) AS day FROM bounds) g
),
cnt AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x FROM ev GROUP BY 1, 2),
daily AS (
  SELECT g.event_type, g.day, CAST(COALESCE(c.x, 0) AS HUGEINT) AS x
  FROM grid g LEFT JOIN cnt c ON c.event_type = g.event_type AND c.day = g.day
),
st AS (
  SELECT event_type,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS s,
         CAST(SUM(x * x) AS HUGEINT) AS q
  FROM daily GROUP BY 1
)
SELECT d.event_type,
       strftime(d.day, '%Y-%m-%d') AS day,
       CAST(d.x AS BIGINT) AS n_events,
       CAST(CASE WHEN st.n * st.q - st.s * st.s = 0 THEN 0
            ELSE ((st.n * d.x - st.s) * (st.n * d.x - st.s) * 20000 + (st.n * st.q - st.s * st.s))
                 // (2 * (st.n * st.q - st.s * st.s)) END AS BIGINT) AS z2_x1e4,
       CAST(CASE WHEN (st.n * d.x - st.s) * (st.n * d.x - st.s) >= 4 * (st.n * st.q - st.s * st.s)
                  AND st.n * st.q - st.s * st.s > 0
            THEN 1 ELSE 0 END AS INT) AS anomaly
FROM daily d JOIN st USING (event_type)
ORDER BY d.event_type, day
"""


@query("q127_daily_anomalies", Q127_SQL)
def q127_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection over the event stream's daily counts —
    the ops-monitoring query behind every ingestion dashboard: per
    (event_type, day) over a DENSE day grid (a zero-event outage day
    is the anomaly that matters most), the count, its squared z-score
    vs that type's own distribution, and an |z| >= 2 flag.

    Engine-exact with ZERO floats: the z² threshold is the
    pure-integer comparison (n·x − S)² >= 4·(n·Q − S²) (see Q127_SQL
    derivation); moments run in 128-bit exact integers so no
    production event volume can overflow-wrap (S² passes int64 at
    ~3e9 events/type); the surfaced z²·10⁴ uses the exact decimal
    floor-div identity (a − a % b) / b. Flags are bit-identical at
    any partition layout.

    Plan: one scan → (type, day) count (map-side combine), which is
    group-count-bounded and BROADCAST into the dense-grid left join
    (hinting the preserved grid side instead is un-honorable — the
    lint's DeadBroadcastHint rule pins this); the per-type moment
    aggregate is group-count-sized and broadcast back."""
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", F.date_trunc("day", "ts").alias("day"))
    )
    e = maybe_checkpoint(e)
    meta = e.agg(
        F.min("day").alias("d0"),
        F.max("day").alias("d1"),
        F.array_sort(F.collect_set("event_type")).alias("types"),
    )
    grid = meta.select(F.explode("types").alias("event_type"), "d0", "d1").select(
        "event_type",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    cnt = F.broadcast(
        e.groupBy("event_type", "day").agg(F.count("*").cast("long").alias("x"))
    )
    daily = maybe_checkpoint(
        grid.join(cnt, ["event_type", "day"], "left").select(
            "event_type",
            "day",
            F.coalesce("x", F.lit(0)).cast("decimal(19,0)").alias("x"),
        )
    )
    st = daily.groupBy("event_type").agg(
        F.count("*").cast("decimal(19,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("q"),
    )
    return (
        daily.join(F.broadcast(st), "event_type")
        .selectExpr(
            "event_type",
            "date_format(day, 'yyyy-MM-dd') AS day",
            "CAST(x AS LONG) AS n_events",
            "CAST(n*x - s AS DECIMAL(38,0)) AS dev",
            "CAST(n*q - s*s AS DECIMAL(38,0)) AS varn",
        )
        .selectExpr(
            "event_type",
            "day",
            "n_events",
            "CAST(CASE WHEN varn = 0 THEN 0 ELSE"
            " ((dev*dev*20000 + varn) - ((dev*dev*20000 + varn) % (2*varn))) / (2*varn)"
            " END AS LONG) AS z2_x1e4",
            "CAST(CASE WHEN dev*dev >= 4*varn AND varn > 0 THEN 1 ELSE 0 END AS INT) AS anomaly",
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# q145 — trade-flow PageRank (weighted, integer fixed-point, engine-exact)
# ---------------------------------------------------------------------------


def _q145_sql(iters: int = 5, scale: int = 10**12, d: int = 85) -> str:
    """Unrolled-iteration SQL twin of ``operators.graph.pagerank``.

    The oracle replays the exact integer recurrence as ``iters`` chained
    CTEs (r0 -> r1 -> ... -> r{iters}) — feasible precisely because the
    operator is defined in fixed-point BIGINT arithmetic with floor
    division: no float ever appears, so an independent SQL engine
    reproduces every iterate bit-for-bit. Sums are cast back to BIGINT
    (DuckDB widens SUM(BIGINT) to HUGEINT; the house canon bans HUGEINT
    at the boundary and the engine stays int64 throughout).
    """
    parts = [
        f"""WITH e AS (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
outw AS (SELECT src AS id, CAST(SUM(w) AS BIGINT) AS ow FROM e GROUP BY 1),
r0 AS (SELECT id, CAST({scale} // nn.n AS BIGINT) AS r FROM nodes CROSS JOIN nn)"""
    ]
    for k in range(1, iters + 1):
        p = f"r{k - 1}"
        parts.append(
            f"""d{k} AS (
  SELECT CAST(COALESCE(SUM(r), 0) AS BIGINT) AS dm
  FROM {p} LEFT JOIN outw USING (id) WHERE ow IS NULL
),
c{k} AS (
  SELECT e.dst AS id, CAST(SUM((pr.r * e.w) // o.ow) AS BIGINT) AS inc
  FROM e JOIN {p} pr ON e.src = pr.id JOIN outw o ON e.src = o.id
  GROUP BY e.dst
),
r{k} AS (
  SELECT nodes.id,
         CAST(((100 - {d}) * ({scale} // nn.n)
               + {d} * (COALESCE(c{k}.inc, 0) + d{k}.dm // nn.n)) // 100 AS BIGINT) AS r
  FROM nodes CROSS JOIN nn CROSS JOIN d{k} LEFT JOIN c{k} ON nodes.id = c{k}.id
)"""
        )
    return (
        ",\n".join(parts)
        + f"""
SELECT n.n_name AS nation, rf.r AS rank_x1e12
FROM r{iters} rf JOIN nation n ON rf.id = n.n_nationkey
ORDER BY rank_x1e12 DESC, nation"""
    )


@query("q145_nation_pagerank", _q145_sql())
def q145_nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the trade-flow graph (supplier nation -> customer
    nation, edge weight = lineitem count): which markets concentrate
    inbound trade influence. The graph-centrality modality the engine
    was missing next to connected components — same join+groupBy
    iterative dataflow (``operators/graph.py::pagerank``), reusable on
    any edge list (e.g. a document citation/near-dup graph).

    Engine-exact by construction: integer fixed-point ranks (BIGINT out
    of 1e12), floor-division damping — distributed float PageRank is
    never bit-reproducible, this is. Oracle = the recurrence unrolled
    as chained CTEs.

    Scale shape: edge-building shuffles lineitem ONCE into a
    nation-pair aggregate (map-side combined, dims broadcast); the
    iteration then runs on the aggregated edge list — node- and
    edge-table-sized work per round, one keyed shuffle each,
    O(1) scalars to the driver, lineage checkpointed. On a 100 TB
    web-graph-sized edge list the identical loop holds: rank join is
    node-keyed, contribution agg is dst-keyed, both map-side
    combinable.
    """
    from ml_with_spark_streaming_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    pr = pagerank(edges, "src", "dst", "w", damping_pct=85, iters=5)
    return (
        pr.join(F.broadcast(n), pr["id"] == n["n_nationkey"])
        .select(F.col("n_name").alias("nation"), F.col("rank").alias("rank_x1e12"))
        .orderBy(F.col("rank_x1e12").desc(), "nation")
    )


# ---------------------------------------------------------------------------
# q146 — Z-order layout planning: per-file skipping stats, zorder vs linear
# ---------------------------------------------------------------------------

from ml_with_spark_streaming_spark.operators.layout import (  # noqa: E402
    zorder_file_stats,
    zorder_oracle_sql,
)

Q146_SQL = zorder_oracle_sql("lineitem", "l_partkey", "l_suppkey")


@query("q146_zorder_layout", Q146_SQL)
def q146_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout planning for lineitem over
    (l_partkey, l_suppkey): per-file min/max skipping statistics under
    the z-ordered file assignment vs the default single-key (linear)
    sort — the decision table behind a Delta/Iceberg-style
    ``OPTIMIZE ZORDER BY``, computed as one scan + one projection +
    one unpivot + one groupBy (``operators/layout.py``).

    Why it matters at 100 TB: min/max file pruning is the first-order
    scan cost lever; linear layout leaves the second key's per-file
    span at the full domain (zero pruning), z-order bounds both. The
    bit-interleave and min/max normalization are generated from ONE
    Python loop in two SQL dialects, so the oracle is hash-exact by
    construction; file assignment is value-based bucketing (top bits
    of the z-value) — no global sort, no window, fully parallel.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return zorder_file_stats(li, "l_partkey", "l_suppkey")


# ---------------------------------------------------------------------------
# q147 — Bloom-filter semi-join pruning with exact false-positive accounting
# ---------------------------------------------------------------------------

from ml_with_spark_streaming_spark.operators.bloom import (  # noqa: E402
    BLOOM_BITS_DUCK,
    BLOOM_HASH_DUCK,
    bloom_build,
    bloom_probe,
)

_B_HASH = BLOOM_HASH_DUCK.format(v="v", i="CAST(i AS VARCHAR)", m="m")
_P_HASH = BLOOM_HASH_DUCK.format(
    v="CAST(c_custkey AS VARCHAR)", i="CAST(i AS VARCHAR)", m="m"
)

# The oracle deliberately uses SET semantics (a distinct bit-position
# table + join-count) instead of the engine's 32-bit-word bitmap +
# bitwise probe — a hash match proves the bitmap mechanics, not a
# shared formulation.
Q147_SQL = f"""
WITH members AS (
  SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS v, o_custkey
  FROM orders WHERE o_orderstatus = 'F'
),
kb AS (SELECT {BLOOM_BITS_DUCK.format(bpk=8, n="COUNT(*)")} AS m FROM members),
mp AS (
  SELECT DISTINCT {_B_HASH} AS p
  FROM members CROSS JOIN kb CROSS JOIN range(5) AS t(i)
),
probe AS (
  SELECT c_custkey, c_mktsegment, {_P_HASH} AS p
  FROM customer CROSS JOIN kb CROSS JOIN range(5) AS t(i)
),
hits AS (
  SELECT c_custkey, c_mktsegment,
         SUM(CASE WHEN mp.p IS NOT NULL THEN 1 ELSE 0 END) AS nh
  FROM probe LEFT JOIN mp ON probe.p = mp.p
  GROUP BY 1, 2
),
fl AS (
  SELECT c_mktsegment AS segment,
         CASE WHEN nh = 5 THEN 1 ELSE 0 END AS pos,
         CASE WHEN c_custkey IN (SELECT o_custkey FROM members) THEN 1 ELSE 0 END AS mem
  FROM hits
)
SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(pos) AS BIGINT) AS n_bloom_positive,
       CAST(SUM(mem) AS BIGINT) AS n_members,
       CAST(SUM(pos * (1 - mem)) AS BIGINT) AS n_false_positive
FROM fl GROUP BY segment ORDER BY segment
"""


@query("q147_bloom_semijoin", Q147_SQL)
def q147_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning, audited: build a Bloom bitmap
    over the finished orders' customer keys (``operators/bloom.py`` —
    bit domain derived IN-PLAN from the member count with integer-only
    arithmetic), probe every customer, and report per market segment
    how many customers the filter passes vs truly match — the exact
    false-positive bill of the pruning filter a 100 TB fact-dim join
    would push below its shuffle.

    Scale shape: build is one distinct + explode(5) + word-keyed
    bit_or groupBy (bitmap = m/32 rows, broadcast); probe never
    shuffles on the key — explode(5), broadcast bitmap join, per-key
    count. The truth join here exists only to AUDIT the fp rate; a
    production user just drops rows where the probe misses.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
        .distinct()
    )
    o = maybe_checkpoint(o)
    knob, bitmap = bloom_build(o, "o_custkey", bits_per_key=8, n_hashes=5)
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    probed = bloom_probe(c, "c_custkey", knob, bitmap, n_hashes=5)
    mem = o.withColumn("is_member", F.lit(1))
    return (
        probed.join(mem, probed["c_custkey"] == mem["o_custkey"], "left")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("bloom_positive").cast("long").alias("n_bloom_positive"),
            F.sum(F.coalesce("is_member", F.lit(0))).cast("long").alias("n_members"),
            F.sum(
                F.col("bloom_positive") * (1 - F.coalesce("is_member", F.lit(0)))
            )
            .cast("long")
            .alias("n_false_positive"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# q149 — shuffle-skew profile: per-key imbalance diagnostics for join keys
# ---------------------------------------------------------------------------

Q149_SQL = """
WITH ks AS (
  SELECT 'l_orderkey' AS key_col, l_orderkey AS k FROM lineitem
  UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem
),
pk AS (SELECT key_col, k, CAST(COUNT(*) AS BIGINT) AS c FROM ks GROUP BY key_col, k),
st AS (
  SELECT key_col,
         CAST(SUM(c) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(MAX(c) AS BIGINT) AS max_key_rows,
         CAST(SUM(CASE WHEN c >= 32 THEN c ELSE 0 END) AS BIGINT) AS hot_rows
  FROM pk GROUP BY key_col
)
SELECT key_col, n_rows, n_keys, max_key_rows,
       CAST((max_key_rows * n_keys * 1000000) // n_rows AS BIGINT) AS imbalance_x1e6,
       CAST((hot_rows * 1000000) // n_rows AS BIGINT) AS hot_share_x1e6
FROM st ORDER BY key_col
"""


@query("q149_shuffle_skew_profile", Q149_SQL)
def q149_shuffle_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnostics for lineitem's three join keys — the
    pre-flight check for "will this join melt a reducer at 1000
    executors": per candidate shuffle key, the row count, distinct-key
    count, heaviest key's row count, the imbalance factor
    max*keys/rows (1e6 = perfectly uniform; k×1e6 = the hottest
    partition-of-one-key holds k× its fair share) and the share of
    rows in keys with >= 32 rows (the salting candidates
    ``operators/skew.py::salted_join`` would split).

    Scale shape: one scan unpivoted to (key_col, k) map-side, one
    (key_col, k)-keyed partial-aggregated groupBy, then a 3-group
    rollup — all integer arithmetic (floor division), oracle-exact.
    The output is what decides between plain shuffle join, AQE skew
    split, and explicit salting before a 100 TB join runs.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    ks = li.selectExpr(
        "stack(3, 'l_orderkey', l_orderkey, 'l_partkey', l_partkey,"
        " 'l_suppkey', l_suppkey) AS (key_col, k)"
    )
    pk = ks.groupBy("key_col", "k").agg(F.count("*").cast("long").alias("c"))
    st = pk.groupBy("key_col").agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("c").cast("long").alias("max_key_rows"),
        F.sum(F.when(F.col("c") >= 32, F.col("c")).otherwise(0))
        .cast("long")
        .alias("hot_rows"),
    )
    return st.selectExpr(
        "key_col",
        "n_rows",
        "n_keys",
        "max_key_rows",
        "CAST((max_key_rows * n_keys * 1000000) DIV n_rows AS BIGINT) AS imbalance_x1e6",
        "CAST((hot_rows * 1000000) DIV n_rows AS BIGINT) AS hot_share_x1e6",
    ).orderBy("key_col")


# ---------------------------------------------------------------------------
# q150 — small-file compaction planner (bin-pack daily files to a target)
# ---------------------------------------------------------------------------

_COMPACT_TARGET = 4000  # rows per output file (stand-in for a byte budget)

Q150_SQL = f"""
WITH files AS (
  SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
ordered AS (
  SELECT day, n,
         CAST(COALESCE(SUM(n) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prior
  FROM files
)
SELECT CAST(prior // {_COMPACT_TARGET} AS BIGINT) AS bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       strftime(MIN(day), '%Y-%m-%d') AS day_min,
       strftime(MAX(day), '%Y-%m-%d') AS day_max
FROM ordered GROUP BY 1 ORDER BY 1
"""


@query("q150_compaction_plan", Q150_SQL)
def q150_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning — the other half of table
    maintenance next to q146's z-order: treat each event day as one
    file, bin-pack consecutive days into merge groups of ~TARGET rows
    via an exclusive running sum (bin = prior_rows div TARGET), and
    emit per-bin file counts, row totals, and day ranges — the merge
    manifest an OPTIMIZE job would execute.

    Exclusive-prefix binning keeps every bin's overshoot bounded by
    one input file (the standard bin-pack-by-cumsum guarantee) while
    preserving day ordering, so time-range pruning still works on the
    compacted files. The window runs over the per-day AGGREGATE (days,
    not events — bounded input, the lint's spine rule); at 100 TB the
    file list comes from the table manifest, making this a pure
    metadata plan. Integer arithmetic throughout.
    """
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    files = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, -1)
    ordered = files.select(
        "day", "n", F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long").alias("prior")
    )
    return (
        ordered.groupBy(
            F.expr(f"CAST(prior DIV {_COMPACT_TARGET} AS BIGINT)").alias("bin_id")
        )
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("n").cast("long").alias("n_rows"),
            F.date_format(F.min("day"), "yyyy-MM-dd").alias("day_min"),
            F.date_format(F.max("day"), "yyyy-MM-dd").alias("day_max"),
        )
        .orderBy("bin_id")
    )


# ---------------------------------------------------------------------------
# q151 — incremental materialized-view maintenance (partial-agg merge)
# ---------------------------------------------------------------------------

_MV_CUTOFF = "1999-01-01"

# The oracle computes the view DIRECTLY over all orders; the engine
# computes it INCREMENTALLY (stored base state + delta partials,
# merged). A hash match proves refresh(state, delta) == recompute(all)
# — the invariant every incremental-view maintainer must hold.
Q151_SQL = f"""
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
            // COUNT(*) AS BIGINT) AS avg_cents
FROM orders
GROUP BY o_orderpriority
ORDER BY priority
"""


@query("q151_incremental_view", Q151_SQL)
def q151_incremental_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the revenue-by-
    priority view is refreshed by MERGING a stored aggregate state
    (orders before the ``_MV_CUTOFF`` date, 1999-01-01) with the
    delta's partial aggregates (orders on/after), never rescanning
    the base — the count/sum-mergeable-state pattern behind every
    streaming/MV refresh. The oracle recomputes the view from
    scratch over ALL orders, so the driver's hash check IS the
    incremental==full invariant.

    Scale shape: the stored state is group-cardinality-sized (here
    5 rows; materialized via maybe_checkpoint standing in for the MV
    table); a refresh costs one scan of the DELTA plus an
    O(groups)-sized merge groupBy. Sums are exact integer cents
    (FLOOR(x*100+0.5)), averages derived by floor division at read
    time — avg is not mergeable, sum/count are.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderdate",
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    o = maybe_checkpoint(o)  # one scan feeds base-state and delta branches

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("o_orderpriority").alias("priority")).agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )

    # the "stored" MV state — in production a parquet/Delta table
    state = maybe_checkpoint(partials(o.filter(F.col("o_orderdate") < _MV_CUTOFF)))
    delta = partials(o.filter(F.col("o_orderdate") >= _MV_CUTOFF))
    return (
        state.unionByName(delta)
        .groupBy("priority")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("sum_cents").cast("long").alias("sum_cents"),
        )
        .selectExpr(
            "priority",
            "n_orders",
            "sum_cents",
            "CAST(sum_cents DIV n_orders AS BIGINT) AS avg_cents",
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# q152 — exact distributed quantiles via value histogram (bounded domain)
# ---------------------------------------------------------------------------

_Q152_PCTS = (25, 50, 75, 90, 99)
_Q152_PCTS_SQL = ", ".join(str(p) for p in _Q152_PCTS)

Q152_SQL = f"""
WITH vals AS (
  SELECT 'l_quantity' AS col_name, CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS v
  FROM lineitem
  UNION ALL
  SELECT 'l_discount', CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) FROM lineitem
),
hist AS (SELECT col_name, v, CAST(COUNT(*) AS BIGINT) AS c FROM vals GROUP BY col_name, v),
cum AS (
  SELECT col_name, v,
         CAST(SUM(c) OVER (PARTITION BY col_name ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(c) OVER (PARTITION BY col_name) AS BIGINT) AS n
  FROM hist
),
want AS (SELECT col_name, p, CAST((n * p + 99) // 100 AS BIGINT) AS rnk, n
         FROM (SELECT DISTINCT col_name, n FROM cum) CROSS JOIN unnest([{_Q152_PCTS_SQL}]) AS t(p))
SELECT w.col_name AS col_name, CAST(w.p AS BIGINT) AS pct, w.n AS n_rows,
       CAST(MIN(c.v) AS BIGINT) AS value_x100
FROM want w JOIN cum c ON c.col_name = w.col_name AND c.cum >= w.rnk
GROUP BY w.col_name, w.p, w.n
ORDER BY 1, 2
"""


@query("q152_exact_quantiles", Q152_SQL)
def q152_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed quantiles for bounded-cardinality numeric
    columns via the value-histogram method: per column, one map-side-
    combinable value-count groupBy, a cumulative sum over the (tiny)
    distinct-value table, and rank selection at ceil(n*p/100) — the
    exact companion to q119's sketch-based profile (GK sketches are
    engine-specific, so q119 is rows-only; THIS one hash-matches
    because nothing is approximate).

    Scale judgment: correctness costs one shuffle keyed by (col,
    value); the window runs over the histogram (distinct values:
    ~50 quantities, ~11 discounts), not the data — the standard
    at-scale trade: exact quantiles are cheap precisely when the
    value domain is bounded; unbounded domains keep the q119 sketch
    path. Values are exact integer cents (x100).
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_quantity", "l_discount")
    vals = li.selectExpr(
        "stack(2, 'l_quantity', CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT),"
        " 'l_discount', CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) AS (col_name, v)"
    )
    hist = vals.groupBy("col_name", "v").agg(F.count("*").cast("long").alias("c"))
    wcum = W.partitionBy("col_name").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    wall = W.partitionBy("col_name")
    # histogram-sized (≈60 rows); materialized because BOTH the rank
    # table and the selection join consume it — without this the
    # lineitem scan would run twice
    cum = maybe_checkpoint(
        hist.select(
            "col_name",
            "v",
            F.sum("c").over(wcum).cast("long").alias("cum"),
            F.sum("c").over(wall).cast("long").alias("n"),
        )
    )
    pcts = ", ".join(
        f"{p}, CAST((n * {p} + 99) DIV 100 AS BIGINT)" for p in _Q152_PCTS
    )
    want = (
        cum.select("col_name", "n")
        .distinct()
        .selectExpr(
            "col_name",
            "n",
            f"stack({len(_Q152_PCTS)}, {pcts}) AS (p, rnk)",
        )
        .select("col_name", "n", F.col("p").cast("long").alias("p"), "rnk")
    )
    return (
        want.alias("w")
        .join(
            cum.alias("c"),
            (F.col("c.col_name") == F.col("w.col_name"))
            & (F.col("c.cum") >= F.col("w.rnk")),
        )
        .groupBy(F.col("w.col_name").alias("col_name"), "w.p", "w.n")
        .agg(F.min("c.v").cast("long").alias("value_x100"))
        .select(
            "col_name",
            F.col("p").alias("pct"),
            F.col("n").alias("n_rows"),
            "value_x100",
        )
        .orderBy("col_name", "pct")
    )


# ---------------------------------------------------------------------------
# q154 — CDC changelog apply: SCD Type-2 dimension history (MERGE semantics)
# ---------------------------------------------------------------------------

Q154_SQL = """
WITH chg AS (
  SELECT user_id, event_id, event_type, ts,
         epoch_us(ts) AS from_us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_cents,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_us
  FROM events
),
up AS (
  SELECT user_id, value_cents, from_us, to_us,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY from_us, event_id) AS version
  FROM chg WHERE event_type <> 'error'
)
SELECT user_id, CAST(version AS BIGINT) AS version, value_cents,
       from_us AS valid_from_us, to_us AS valid_to_us,
       CAST(CASE WHEN to_us IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
FROM up ORDER BY user_id, version
"""


def _scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q154's SCD2 core without the presentation sort — shared with
    q159's AS-OF read."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("from_us"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("value_cents"),
    )
    # both windows order by (from_us, event_id) so one Exchange + one
    # Sort serves them (unix_micros is order-equivalent to ts, but
    # Catalyst can't know that — project first, then window)
    w_all = W.partitionBy("user_id").orderBy("from_us", "event_id")
    chg = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "from_us",
        "value_cents",
        F.lead("from_us").over(w_all).alias("to_us"),
    )
    w_up = W.partitionBy("user_id").orderBy("from_us", "event_id")
    return chg.filter(F.col("event_type") != "error").select(
        "user_id",
        F.row_number().over(w_up).cast("long").alias("version"),
        "value_cents",
        F.col("from_us").alias("valid_from_us"),
        F.col("to_us").alias("valid_to_us"),
        F.isnull("to_us").cast("int").alias("is_current"),
    )


@query("q154_scd2_history", Q154_SQL)
def q154_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply — the batch equivalent of ``MERGE INTO``
    with SCD Type-2 history retention: every event is a change record
    for entity ``user_id`` (``error`` = DELETE marker, anything else =
    UPSERT of ``value``); the output is the versioned dimension
    history (``valid_from_us``/``valid_to_us`` interval per version,
    ``is_current`` on the open row). A DELETE closes the previous
    version's interval without opening a new one — a user whose last
    change is a delete has NO current row, exactly the semantics of
    ``MERGE ... WHEN MATCHED AND op='D' THEN DELETE``. Filtering
    ``is_current = 1`` yields the latest-wins snapshot a plain upsert
    MERGE would produce.

    Engine-exact: times as epoch micros (BIGINT), value as half-up
    cents; ties broken by the unique ``event_id``.

    Scale shape: ONE hash exchange on the entity key + one sort feeds
    both window functions (lead over all changes, row_number over
    surviving upserts — same partitioning and order, so Catalyst
    plans a single Exchange/Sort) and the delete filter; nothing else
    shuffles. At 100 TB the changelog is date-partitioned and the
    history is maintained incrementally q151-style (apply only the
    new partition's changes against the stored open rows) — this
    query IS that merge step run over the full log, so the oracle's
    from-scratch recompute checks the invariant.
    """
    return _scd2_history(spark, sf_dir).orderBy("user_id", "version")


# ---------------------------------------------------------------------------
# q155 — fuzzy name reconciliation (record linkage over the value domain)
# ---------------------------------------------------------------------------

Q155_SQL = """
WITH nm AS (
  SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY p_name
)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
       a.n AS n_parts_a, b.n AS n_parts_b
FROM nm a JOIN nm b
  ON a.name < b.name AND levenshtein(a.name, b.name) <= 2
ORDER BY name_a, name_b
"""


@query("q155_fuzzy_name_pairs", Q155_SQL)
def q155_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage / entity resolution: every pair of DISTINCT part
    names within Levenshtein distance 2 (typo'd duplicate listings),
    weighted by how many rows carry each spelling. The engine finds
    pairs via the LOSSLESS rarest-first q-gram prefix filter
    (``operators/fuzzy_join.py`` — Gravano VLDB'01 / ED-Join blocking,
    never all-pairs); the ORACLE is the direct nested-loop
    formulation over the name domain, so the driver's hash check
    proves the blocking loses nothing.

    Scale shape: reconciliation runs over the distinct VALUE DOMAIN
    (named-entity domains are orders of magnitude smaller than the
    fact table), so the corpus pays one groupBy(name); the posting
    self-join touches only each name's <= 5 rarest bigrams.
    """
    from ml_with_spark_streaming_spark.operators.fuzzy_join import (
        fuzzy_string_pairs,
    )

    p = load_table(spark, sf_dir, "part").select("p_name")
    nm = maybe_checkpoint(
        p.groupBy(F.col("p_name").alias("name")).agg(
            F.count("*").cast("long").alias("n")
        )
    )
    pairs = fuzzy_string_pairs(nm, "name", k=2, q=2)
    na = nm.select(F.col("name").alias("name_a"), F.col("n").alias("n_parts_a"))
    nb = nm.select(F.col("name").alias("name_b"), F.col("n").alias("n_parts_b"))
    return (
        pairs.join(F.broadcast(na), "name_a")
        .join(F.broadcast(nb), "name_b")
        .select("name_a", "name_b", "dist", "n_parts_a", "n_parts_b")
        .orderBy("name_a", "name_b")
    )


# ---------------------------------------------------------------------------
# q159 — temporal AS-OF read of the SCD2 dimension (time travel)
# ---------------------------------------------------------------------------

# 2024-01-15 00:00:00 UTC — mid-range of the events table at every SF
_ASOF_US = 1_705_276_800_000_000

Q159_SQL = f"""
WITH chg AS (
  SELECT user_id, event_id, event_type, ts,
         epoch_us(ts) AS from_us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_cents,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_us
  FROM events
),
up AS (
  SELECT user_id, value_cents, from_us, to_us,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY from_us, event_id) AS version
  FROM chg WHERE event_type <> 'error'
)
SELECT user_id, CAST(version AS BIGINT) AS version, value_cents,
       from_us AS valid_from_us
FROM up
WHERE from_us <= {_ASOF_US} AND (to_us IS NULL OR to_us > {_ASOF_US})
ORDER BY user_id
"""


@query("q159_scd2_asof", Q159_SQL)
def q159_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal AS-OF read (time travel) over the q154 SCD2 history:
    the dimension exactly as it stood at 2024-01-15T00:00:00Z — the
    version whose validity interval covers the cutoff. Entities whose
    state at the cutoff was DELETED (interval closed by a delete
    marker at or before it) correctly have no row; entities created
    later don't either. ``FOR SYSTEM_TIME AS OF`` re-expressed as an
    interval predicate over the versioned table.

    Scale shape: q154's single-exchange plan plus one codegen filter.
    Against a STORED SCD2 table (the q154/streaming-scd2 artifact,
    partitioned on is_current + date-bucketed valid_from) the same
    predicate prunes to a handful of partitions; here it recomputes
    through the shared ``_scd2_history`` lineage so the oracle checks
    the whole path.
    """
    h = _scd2_history(spark, sf_dir)
    return (
        h.filter(
            (F.col("valid_from_us") <= F.lit(_ASOF_US))
            & (F.col("valid_to_us").isNull() | (F.col("valid_to_us") > F.lit(_ASOF_US)))
        )
        .select("user_id", "version", "value_cents", "valid_from_us")
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q162 — mergeable distinct sketches (incremental approx-distinct maintenance)
# ---------------------------------------------------------------------------


@query("q162_mergeable_distinct_sketches", no_oracle_reason="DataSketches HLL sketches are Spark-side only")
def q162_mergeable_distinct_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q151's incremental-MV discipline applied to APPROXIMATE
    distinct counts: per event type, build one DataSketches HLL
    sketch PER DAY (``hll_sketch_agg``), then answer the whole-range
    distinct-user question by UNIONING the stored daily sketches
    (``hll_union_agg``) — never rescanning the raw events. Both the
    union-of-daily estimate and the direct whole-range estimate must
    honor HLL's error contract vs the exact distinct (lgK=12 →
    RSE ≈ 1.04/√4096 ≈ 1.6%; the test pins ±3σ). The two estimates
    need NOT be bit-equal — DataSketches' union gadget and a directly
    built sketch can promote sparse→dense differently — which is
    exactly why the contract is error-bounded, not equality
    (``tests/test_analytics.py::test_q162_sketch_merge_invariant``).

    Output per event_type: the union-of-daily estimate, the
    direct whole-range estimate, the exact distinct count, and
    n_days (all BIGINT). Rows-only check: DuckDB's approx sketches
    are a different implementation — the invariant test is the
    correctness evidence (the q109/q119 rationale).

    Scale shape: daily sketches are the STORED artifact (a few KB per
    (day, type) row); the day's raw events are scanned once when the
    partition lands, and every later rollup — month, quarter, ad-hoc
    range — is a sketch-union over the tiny artifact table. This is
    how a 100 TB events table answers distinct-count dashboards
    without rescans.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        "user_id",
    )
    ev = maybe_checkpoint(ev)
    daily = ev.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est_union"),
        F.count("*").cast("long").alias("n_days"),
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
        .cast("long")
        .alias("est_direct"),
        F.count_distinct("user_id").cast("long").alias("exact_distinct"),
    )
    return (
        merged.join(direct, "event_type")
        .select("event_type", "est_union", "est_direct", "exact_distinct", "n_days")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q163 — temporal join: enrich facts with the SCD2 state in effect at event time
# ---------------------------------------------------------------------------

Q163_SQL = """
WITH chg AS (
  SELECT user_id, event_id, event_type, ts,
         epoch_us(ts) AS from_us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_cents,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_us
  FROM events
),
hist AS (
  SELECT user_id, value_cents, from_us, to_us,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY from_us, event_id) AS version
  FROM chg WHERE event_type <> 'error'
),
facts AS (
  SELECT event_id, user_id, epoch_us(ts) AS at_us
  FROM events WHERE event_type = 'purchase'
)
SELECT f.event_id, f.user_id,
       CAST(h.version AS BIGINT) AS version,
       h.value_cents AS state_cents
FROM facts f
LEFT JOIN hist h
  ON h.user_id = f.user_id
 AND h.from_us <= f.at_us
 AND (h.to_us IS NULL OR h.to_us > f.at_us)
ORDER BY f.event_id
"""


@query("q163_scd2_temporal_join", Q163_SQL)
def q163_scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consumer side of SCD2 — the Kimball temporal join: every
    purchase fact is enriched with the dimension version IN EFFECT at
    its event time (``valid_from <= ts < valid_to``). A fact landing
    while the entity was deleted (its interval closed by a delete
    marker) gets NULL state — exactly what a correct history join
    must produce, and what a naive latest-value join silently gets
    wrong. Composes the shared ``_scd2_history`` lineage (a purchase
    is itself a change record, so it sees its own version — [from, to)
    semantics make the boundary deterministic).

    Scale shape: ONE hash join on the entity key; the interval
    predicate filters inside the join (history rows per entity are
    version-count-sized, so the per-key fan-out is bounded). Against
    a STORED history table this is the q29 as-of shape with explicit
    validity intervals.
    """
    h = _scd2_history(spark, sf_dir).select(
        "user_id",
        "version",
        F.col("value_cents").alias("state_cents"),
        "valid_from_us",
        "valid_to_us",
    )
    f = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("event_id", "user_id", F.unix_micros("ts").alias("at_us"))
    return (
        f.join(
            h,
            (f["user_id"] == h["user_id"])
            & (h["valid_from_us"] <= f["at_us"])
            & (h["valid_to_us"].isNull() | (h["valid_to_us"] > f["at_us"])),
            "left",
        )
        .select(
            "event_id",
            f["user_id"].alias("user_id"),
            "version",
            "state_cents",
        )
        .orderBy("event_id")
    )
