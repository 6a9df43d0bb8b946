"""Event-time windowing queries — the oracle-checkable batch twins of
streaming/windows.py.

Each builder in streaming/windows.py produces the identical plan on a
batch or streaming DataFrame; registering the batch twin here puts the
window semantics under the DuckDB oracle, while the streaming path
(watermarks, state, late data) is exercised by the test-suite's
file-source + memory-sink replays.

Window-boundary surface rule: starts/ends formatted as
'yyyy-MM-dd HH:mm:ss' strings — DuckDB strftime twin — so the hash
can't flake on timestamp-type canonicalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.plans.registry import query
from ml_with_spark_streaming_spark.sources.batch import load_table
from ml_with_spark_streaming_spark.streaming.joins import (
    dedup_within_watermark,
    interval_join,
)
from ml_with_spark_streaming_spark.streaming.windows import (
    session_windows,
    sliding_user_activity,
    tumbling_counts,
)

_FMT = "yyyy-MM-dd HH:mm:ss"


def _fmt(col: str, alias: str) -> F.Column:
    return F.date_format(col, _FMT).alias(alias)


# ---------------------------------------------------------------------------
# Tumbling window (60 min) per event type
# ---------------------------------------------------------------------------

Q60_SQL = """
SELECT
  strftime(time_bucket(INTERVAL '60 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  strftime(time_bucket(INTERVAL '60 minutes', ts) + INTERVAL '60 minutes', '%Y-%m-%d %H:%M:%S') AS window_end,
  event_type,
  COUNT(*) AS n,
  ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2, 3
ORDER BY 1, 3
"""


@query("q60_tumbling_counts", Q60_SQL)
def q60_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = tumbling_counts(e, minutes=60)
    return w.select(
        _fmt("window_start", "window_start"),
        _fmt("window_end", "window_end"),
        "event_type",
        "n",
        "sum_value",
    ).orderBy("window_start", "event_type")


# ---------------------------------------------------------------------------
# Sliding window (30 min length, 10 min slide), exact distinct users
# ---------------------------------------------------------------------------

Q61_SQL = """
WITH hit AS (
  SELECT e.*,
         time_bucket(INTERVAL '10 minutes', e.ts) - k.k * INTERVAL '10 minutes' AS window_start
  FROM events e
  CROSS JOIN (SELECT unnest([0, 1, 2]) AS k) k
)
SELECT
  strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
  strftime(window_start + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS window_end,
  COUNT(DISTINCT user_id) AS n_users,
  COUNT(*) AS n
FROM hit
GROUP BY 1, 2
ORDER BY 1
"""


@query("q61_sliding_user_activity", Q61_SQL)
def q61_sliding_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = sliding_user_activity(e, length_minutes=30, slide_minutes=10, exact=True)
    return w.select(
        _fmt("window_start", "window_start"),
        _fmt("window_end", "window_end"),
        "n_users",
        "n",
    ).orderBy("window_start")


# ---------------------------------------------------------------------------
# Session windows (5 min gap) per user — gaps-and-islands SQL twin
# ---------------------------------------------------------------------------

Q62_SQL = """
WITH seq AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL '5 minutes' THEN 1 ELSE 0 END AS brk
  FROM events
),
sess AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
  FROM seq
)
SELECT
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
  strftime(MAX(ts) + INTERVAL '5 minutes', '%Y-%m-%d %H:%M:%S') AS session_end,
  user_id,
  COUNT(*) AS n_events,
  ROUND(SUM(value), 2) AS sum_value
FROM sess
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


@query("q62_session_windows", Q62_SQL)
def q62_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = session_windows(e, gap_minutes=5)
    return w.select(
        _fmt("session_start", "session_start"),
        _fmt("session_end", "session_end"),
        "user_id",
        "n_events",
        "sum_value",
    ).orderBy("user_id", "session_start")


# ---------------------------------------------------------------------------
# Running per-user totals — batch twin of the applyInPandasWithState op
# ---------------------------------------------------------------------------

Q63_SQL = """
SELECT user_id,
       ROUND(SUM(value), 2) AS total,
       COUNT(*) AS n,
       SUM(value) > 1000.0 AS alert
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@query("q63_running_user_totals", Q63_SQL)
def q63_running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch semantics of streaming/windows.py::running_user_totals —
    after a full replay the stateful op's final emission per user
    equals this plain aggregation (asserted in tests)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.round(F.sum("value"), 2).alias("total"),
            F.count("*").alias("n"),
            (F.sum("value") > 1000.0).alias("alert"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Stream-stream interval join — batch twin (click → purchase attribution)
# ---------------------------------------------------------------------------

Q77_SQL = """
SELECT
  c.event_id AS l_event_id,
  p.event_id AS r_event_id,
  c.user_id  AS l_key,
  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS l_ts_s,
  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS r_ts_s,
  ROUND(p.value, 2) AS r_value
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts < c.ts + INTERVAL '30 minutes'
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
ORDER BY l_event_id, r_event_id
"""


@query("q77_interval_join_attribution", Q77_SQL)
def q77_interval_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/joins.py::interval_join — purchases
    attributed to any click by the same user in the preceding 30 min.
    The identical plan runs as a watermarked stream-stream join (the
    reference has no joins at all, SURVEY.md §2.5); the time bound is
    what lets Spark GC join state at scale."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click")
    purchases = e.filter(F.col("event_type") == "purchase")
    j = interval_join(clicks, purchases, within_minutes=30)
    return j.select(
        "l_event_id",
        "r_event_id",
        "l_key",
        F.date_format("l_ts", _FMT).alias("l_ts_s"),
        F.date_format("r_ts", _FMT).alias("r_ts_s"),
        F.round("r_value", 2).alias("r_value"),
    ).orderBy("l_event_id", "r_event_id")


# ---------------------------------------------------------------------------
# Streaming dedup — batch twin (at-least-once replay repaired to exactly-once)
# ---------------------------------------------------------------------------

Q78_SQL = """
WITH dup AS (
  SELECT * FROM events
  UNION ALL
  SELECT * FROM events WHERE event_id % 7 = 0
),
ded AS (
  SELECT DISTINCT * FROM dup
)
SELECT event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM ded
GROUP BY event_type
ORDER BY event_type
"""


@query("q78_dedup_replayed_events", Q78_SQL)
def q78_dedup_replayed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/joins.py::dedup_within_watermark — an
    at-least-once source replays ~1/7 of events; dedup by event_id
    restores exactly-once counts (duplicate rows are full-row
    identical, so DISTINCT * is a valid oracle for key-dedup)."""
    e = load_table(spark, sf_dir, "events")
    replayed = e.unionAll(e.filter(F.col("event_id") % 7 == 0))
    ded = dedup_within_watermark(replayed)
    return (
        ded.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("event_type")
    )
