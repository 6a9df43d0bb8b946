"""Streaming CDC materialization: q154's SCD Type-2 changelog apply
(``plans/analytics.py::q154_scd2_history``) maintained INCREMENTALLY
from a micro-batch stream of change events — the streaming half of
``MERGE INTO`` with history retention.

Per micro-batch, only the AFFECTED entities' open rows are touched:

1. project the batch to change records (``error`` = DELETE marker,
   anything else = UPSERT of ``value`` — q154's convention);
2. pull the affected users' OPEN rows (``is_current = 1``) and their
   stored max version from the state table (a batch-key semi join);
3. replay the open row as a seed change in front of the batch's
   changes and run q154's window logic over that tiny union: the seed
   row closes at the first new change, deletes close intervals
   without opening one, upserts continue the version numbering from
   the stored max;
4. rewrite state = untouched rows + the re-derived affected rows.

The invariant (pinned by ``tests/test_scd2_stream.py``): after any
number of micro-batches, the state table EQUALS q154 recomputed over
the union of all events seen — refresh(state, delta) == recompute(all),
the q151 MV discipline applied to a versioned dimension.

Ordering contract: change feeds must be per-key append-ordered across
batches (every CDC log — Debezium, binlog, WAL — delivers this).
Late rows (from_us earlier than the entity's open row) would require
history rewrite; they are counted per batch in ``history`` as
``late_rows`` and REJECTED rather than silently misapplied.

Scale shape: per batch the work is one batch-sized distinct, two
broadcast-semi-joins against state, a window over (affected users x
their open row + batch changes), and a state rewrite. In this module
the rewrite is a full parquet overwrite (test-sized state); at 100 TB
the state table is bucketed by entity key and the rewrite is a
partition-overwrite / MERGE INTO touching only affected buckets —
the per-batch read stays index-sized either way.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ml_with_spark_streaming_spark.streaming.foreach import attach_foreach_batch

_STATE_SCHEMA = (
    "user_id long, version long, value_cents long, "
    "valid_from_us long, valid_to_us long, is_current int"
)


def changes_from_events(batch_df: DataFrame) -> DataFrame:
    """Project raw events to q154's change-record form."""
    return batch_df.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("from_us"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("value_cents"),
        (F.col("event_type") == "error").cast("int").alias("is_delete"),
    )


@dataclass
class StreamingScd2:
    """Maintain an SCD2 dimension table under a stream of change
    events, q154-equivalently."""

    state_dir: str
    history: list[dict] = field(default_factory=list)

    def _read_state(self, spark: SparkSession) -> DataFrame:
        path = os.path.join(self.state_dir, "scd2")
        if os.path.isdir(path):
            return spark.read.schema(_STATE_SCHEMA).parquet(path)
        return spark.createDataFrame([], _STATE_SCHEMA)

    def _write_state(self, df: DataFrame) -> None:
        path = os.path.join(self.state_dir, "scd2")
        tmp = path + "_next"
        df.write.mode("overwrite").parquet(tmp)
        spark = df.sparkSession
        final = spark.read.schema(_STATE_SCHEMA).parquet(tmp)
        final.write.mode("overwrite").parquet(path)

    def snapshot(self, spark: SparkSession) -> DataFrame:
        """The current SCD2 table (all versions)."""
        return self._read_state(spark)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        chg = changes_from_events(batch_df).localCheckpoint(eager=True)
        n_in = chg.count()
        if n_in == 0:
            self.history.append({"batch_id": batch_id, "n_changes": 0, "late_rows": 0})
            return

        state = self._read_state(spark).localCheckpoint(eager=True)
        affected = chg.select("user_id").distinct()

        open_rows = state.filter(F.col("is_current") == 1).join(
            F.broadcast(affected), "user_id", "semi"
        )
        maxv = (
            state.join(F.broadcast(affected), "user_id", "semi")
            .groupBy("user_id")
            .agg(F.max("version").alias("base_version"))
        )

        # ordering contract: no batch change may precede the open row
        late = (
            chg.join(
                open_rows.select("user_id", "valid_from_us"), "user_id"
            )
            .filter(F.col("from_us") < F.col("valid_from_us"))
            .count()
        )
        if late:
            self.history.append(
                {"batch_id": batch_id, "n_changes": n_in, "late_rows": late}
            )
            raise ValueError(
                f"batch {batch_id}: {late} change rows precede an entity's open "
                "row — CDC feeds must be per-key append-ordered"
            )

        # seed = the open row replayed as a change (event_id -1 sorts
        # before any real event on a from_us tie, matching the original
        # order since event ids are append-ordered)
        seed = open_rows.select(
            "user_id",
            F.lit(-1).cast("long").alias("event_id"),
            F.col("valid_from_us").alias("from_us"),
            "value_cents",
            F.lit(0).alias("is_delete"),
            F.col("version").alias("seed_version"),
        )
        uni = chg.withColumn("seed_version", F.lit(None).cast("long")).unionByName(seed)

        w_all = W.partitionBy("user_id").orderBy("from_us", "event_id")
        led = uni.withColumn("to_us", F.lead("from_us").over(w_all))
        ups = led.filter(F.col("is_delete") == 0)
        renum = (
            ups.join(F.broadcast(maxv), "user_id", "left")
            .withColumn(
                "new_rank",
                F.row_number().over(
                    W.partitionBy("user_id")
                    .orderBy("from_us", "event_id")
                ),
            )
            .withColumn(
                "version",
                F.when(F.col("seed_version").isNotNull(), F.col("seed_version"))
                .otherwise(
                    F.coalesce("base_version", F.lit(0))
                    # rank among NEW upserts only: subtract the seed row
                    # when one precedes (it always ranks first if present)
                    + F.col("new_rank")
                    - F.max(
                        F.when(F.col("seed_version").isNotNull(), 1).otherwise(0)
                    ).over(W.partitionBy("user_id"))
                ),
            )
        )
        rebuilt = renum.select(
            "user_id",
            F.col("version").cast("long"),
            "value_cents",
            F.col("from_us").alias("valid_from_us"),
            F.col("to_us").alias("valid_to_us"),
            F.isnull("to_us").cast("int").alias("is_current"),
        )

        untouched = state.join(F.broadcast(affected), "user_id", "anti").unionByName(
            # closed rows of affected users stay as-is; only their open
            # row was re-derived above
            state.join(F.broadcast(affected), "user_id", "semi").filter(
                F.col("is_current") == 0
            )
        )
        self._write_state(untouched.unionByName(rebuilt))
        self.history.append(
            {"batch_id": batch_id, "n_changes": n_in, "late_rows": 0}
        )

    def attach(
        self,
        stream_df: DataFrame,
        checkpoint: str | None = None,
        available_now: bool = False,
        trigger_seconds: int = 5,
    ) -> StreamingQuery:
        return attach_foreach_batch(
            stream_df,
            self.process_batch,
            checkpoint=checkpoint,
            trigger_seconds=trigger_seconds,
            available_now=available_now,
        )


@dataclass
class StreamingTemporalEnricher:
    """The consumer side of the maintained SCD2 state: each micro-batch
    of FACTS is enriched with the dimension version in effect at its
    event time (q163's interval join, run against the maintainer's
    stored history instead of a recomputed one). Facts landing in a
    deleted window get NULL state.

    Correctness contract (pinned by ``tests/test_scd2_stream.py``):
    after the maintainer has applied all changes up to time T, a fact
    batch with timestamps <= T enriches IDENTICALLY to q163 recomputed
    over the full changelog — the stored history IS the recompute
    (the maintainer's invariant), so the join inherits it.

    Scale shape per batch: one entity-keyed hash join between the
    batch and the affected slice of the history (semi-join pruned);
    the interval predicate filters inside the join.
    """

    scd2: StreamingScd2
    history: list[dict] = field(default_factory=list)
    on_enriched: object = None

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        facts = batch_df.select(
            "event_id", "user_id", F.unix_micros("ts").alias("at_us")
        )
        hist = self.scd2.snapshot(spark)
        # prune history to the batch's entities before the join
        hist = hist.join(
            F.broadcast(facts.select("user_id").distinct()), "user_id", "semi"
        )
        enriched = facts.join(
            hist,
            (facts["user_id"] == hist["user_id"])
            & (hist["valid_from_us"] <= facts["at_us"])
            & (hist["valid_to_us"].isNull() | (hist["valid_to_us"] > facts["at_us"])),
            "left",
        ).select(
            "event_id",
            facts["user_id"].alias("user_id"),
            "version",
            F.col("value_cents").alias("state_cents"),
        )
        enriched = enriched.localCheckpoint(eager=True)
        n = enriched.count()
        n_matched = enriched.filter(F.col("version").isNotNull()).count()
        self.history.append(
            {"batch_id": batch_id, "n_facts": int(n), "n_matched": int(n_matched)}
        )
        if self.on_enriched is not None:
            self.on_enriched(enriched, batch_id)

    def attach(
        self,
        stream_df: DataFrame,
        checkpoint: str | None = None,
        available_now: bool = False,
        trigger_seconds: int = 5,
    ) -> StreamingQuery:
        return attach_foreach_batch(
            stream_df,
            self.process_batch,
            checkpoint=checkpoint,
            trigger_seconds=trigger_seconds,
            available_now=available_now,
        )
