"""Stream-stream joins and streaming deduplication.

The reference has no joins at all (SURVEY.md §2.5) and its at-least-
once socket ingestion silently double-trains on replayed payloads.
These are the Structured Streaming answers:

* **stream-stream interval join** — both sides watermarked, the join
  condition carries an event-time bound so Spark can evict join state
  once the watermark passes the bound (unbounded state otherwise).
* **streaming dedup** — ``dropDuplicatesWithinWatermark`` keeps one
  row per key among duplicates whose event times fall inside the
  watermark delay; state for a key is dropped once the watermark
  passes its event time (bounded state, unlike ``dropDuplicates`` on
  a stream which keeps every key forever).

Each builder produces the same logical plan on a batch DataFrame, so
the DuckDB oracle checks the join/dedup semantics (plans/
events_streaming.py q77/q78) while the streaming tests replay
micro-batches and compare against the batch twin.

Scale posture: the interval join shuffles both sides by ``user_id``
(co-partitioned state store); state per key is bounded by the
watermark delay + interval width. Dedup state is one (key, ts) entry
per key inside the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within_minutes: int = 30,
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join ``right`` rows to ``left`` rows with the same ``key`` where
    ``right.ts`` lands in ``[left.ts, left.ts + within_minutes)``.

    On streaming inputs both sides get watermarks and the time bound
    lets Spark GC join state. ``how`` may be ``inner``/``left_outer``/
    ``right_outer``/``full_outer`` (outer rows emit once the watermark
    proves no match can still arrive).
    """
    l = left.withWatermark("ts", watermark) if left.isStreaming else left
    r = right.withWatermark("ts", watermark) if right.isStreaming else right
    l = l.select(
        F.col(key).alias("l_key"),
        F.col("event_id").alias("l_event_id"),
        F.col("ts").alias("l_ts"),
        F.col("value").alias("l_value"),
    )
    r = r.select(
        F.col(key).alias("r_key"),
        F.col("event_id").alias("r_event_id"),
        F.col("ts").alias("r_ts"),
        F.col("value").alias("r_value"),
    )
    cond = (
        (l["l_key"] == r["r_key"])
        & (r["r_ts"] >= l["l_ts"])
        & (r["r_ts"] < l["l_ts"] + F.expr(f"INTERVAL {within_minutes} MINUTES"))
    )
    return l.join(r, cond, how)


def dedup_within_watermark(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = "10 minutes",
) -> DataFrame:
    """Keep one row per key (at-least-once → exactly-once repair).

    Streaming: ``dropDuplicatesWithinWatermark`` — duplicates arriving
    within the watermark delay of the kept row are suppressed; key
    state is evicted when the watermark passes, so a duplicate older
    than the watermark horizon would NOT be caught (that is the
    bounded-state contract). Batch: plain ``dropDuplicates`` (whole-
    input dedup — the streaming result converges to this when all
    duplicates arrive inside the horizon, which the tests assert).
    """
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(keys))
    return events.dropDuplicates(list(keys))
