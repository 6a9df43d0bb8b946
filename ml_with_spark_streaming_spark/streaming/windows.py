"""Event-time windowed aggregations with watermarks, plus a custom
stateful operator.

The reference has NO event-time notion — only the 5 s processing-time
batch boundary (SURVEY.md §1.2). These are the §2.5 extension surface:
fully-declarative tumbling/sliding/session windows over the `events`
schema (event_id, ts, user_id, event_type, value, props), late data
bounded by ``withWatermark``, and ``applyInPandasWithState`` for the
one shape Spark's built-ins can't express (per-key running state with
custom emission logic).

Each builder works on a batch OR streaming DataFrame with the same
plan — the batch twin is what the DuckDB oracle checks
(plans/events_streaming.py); the streaming path is covered by the
file-source + memory-sink tests.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def tumbling_counts(events: DataFrame, minutes: int = 60, watermark: str = "10 minutes") -> DataFrame:
    """Per-event-type counts + value sums in tumbling windows."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_user_activity(
    events: DataFrame,
    length_minutes: int = 30,
    slide_minutes: int = 10,
    watermark: str = "10 minutes",
    exact: bool = False,
) -> DataFrame:
    """Distinct-user counts in sliding windows.

    Streaming default is approx_count_distinct (exact distinct would
    hold every user id in window state); the batch/oracle twin passes
    ``exact=True`` — HLL sketches differ between engines, exact counts
    don't."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    users = (
        F.count_distinct(F.col("user_id")) if exact else F.approx_count_distinct("user_id")
    ).alias("n_users")
    return (
        src.groupBy(F.window("ts", f"{length_minutes} minutes", f"{slide_minutes} minutes").alias("w"))
        .agg(users, F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_users",
            "n",
        )
    )


def session_windows(events: DataFrame, gap_minutes: int = 5, watermark: str = "10 minutes") -> DataFrame:
    """Per-user sessions: a session extends while consecutive events
    are < gap apart (Spark's native session_window)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", f"{gap_minutes} minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: per-user running totals with threshold alerts
# ---------------------------------------------------------------------------

ALERT_SCHEMA = "user_id long, total double, n long, alert boolean"
_STATE_SCHEMA = "total double, n long"


def _running_total_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState body: accumulate per-user value totals,
    emit one row per batch with an alert flag when the running total
    crosses 1000. State is (total, n) — O(1) per key."""
    total, n = state.get if state.exists else (0.0, 0)
    for pdf in pdfs:
        total += float(pdf["value"].fillna(0.0).sum())
        n += int(len(pdf))
    state.update((total, n))
    yield pd.DataFrame(
        {"user_id": [key[0]], "total": [round(total, 2)], "n": [n], "alert": [total > 1000.0]}
    )


def running_user_totals(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """The genuinely-custom stateful op (SURVEY.md §2.5 'stateful
    streaming ops'): per-user running aggregate with custom emission.
    Streaming-only (batch equivalent is a plain groupBy — that twin is
    the oracle check)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy("user_id").applyInPandasWithState(
        _running_total_fn,
        outputStructType=ALERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
