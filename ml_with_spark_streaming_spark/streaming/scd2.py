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
Late rows (from_us earlier than the entity's LAST KNOWN change time —
``max(coalesce(valid_to_us, valid_from_us))`` over ALL its state rows,
so fully-closed/deleted histories are guarded too, not just open rows)
would require history rewrite; they are counted per batch in
``history`` as ``late_rows`` and REJECTED rather than silently
misapplied.

State layout (the production shape, not a test shortcut): state is
HASH-BUCKETED by entity key — ``bucket = pmod(hash(user_id), B)`` —
and stored as versioned per-bucket parquet directories plus one small
``MANIFEST.json`` mapping each bucket to the version directory holding
its current rows:

    state_dir/MANIFEST.json            {"buckets": B,
                                        "last_batch_id": N,
                                        "paths": {"0": "v00000003", ...}}
    state_dir/v00000003/bucket=0/...   (parquet, bucket col is storage-only)

Per micro-batch only the AFFECTED buckets are read and rewritten: new
bucket contents land in a fresh ``v{batch_id}`` directory, then the
manifest is swapped in atomically (``os.replace``). This gives three
properties the naive overwrite lacks:

* **O(affected) writes** — untouched buckets' files are literally not
  touched (mtime-pinned by ``tests/test_scd2_stream.py``);
* **crash safety** — a crash mid-write leaves the old manifest (and
  therefore the old state) fully intact; the replayed batch simply
  overwrites the orphaned version directory;
* **idempotent replay** — ``last_batch_id`` is committed with the
  manifest, so foreachBatch's at-least-once redelivery of an
  already-applied batch is a recorded no-op instead of a double apply.

Superseded version directories are vacuumed after each manifest commit.

Scale shape: per batch the work is one batch-sized distinct, two
broadcast-semi-joins against the affected buckets, a window over
(affected users x their open row + batch changes), and a rewrite of
the affected buckets only — reads AND writes stay index-sized.
"""

from __future__ import annotations

import json
import os
import re
import shutil
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


# 8+ digits: f"v{batch_id:08d}" WIDENS past 99,999,999 batches — the
# match must widen with it or vacuum would silently leak those dirs
_VDIR_RE = re.compile(r"^v\d{8,}$")


@dataclass
class StreamingScd2:
    """Maintain an SCD2 dimension table under a stream of change
    events, q154-equivalently. ``buckets`` sets the entity-key hash
    bucketing width of the persisted state (1 = single bucket; the
    manifest/versioning machinery is identical either way)."""

    state_dir: str
    buckets: int = 1
    history: list[dict] = field(default_factory=list)

    # -- manifest ----------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.state_dir, "MANIFEST.json")

    def _load_manifest(self) -> dict:
        try:
            with open(self._manifest_path(), encoding="utf-8") as fh:
                manifest = json.load(fh)
        except FileNotFoundError:
            return {"buckets": self.buckets, "last_batch_id": -1, "paths": {}}
        # the bucketing width is a property of the PERSISTED layout, not
        # of the maintainer object: a restart configured with a different
        # `buckets` would compute different bucket ids than the stored
        # files and silently miss entities' rows (treating them as new —
        # forked history). Adopt the committed value and say so.
        persisted = int(manifest.get("buckets", self.buckets))
        if manifest.get("paths") and persisted != self.buckets:
            self.buckets = persisted
        return manifest

    def _commit_manifest(self, manifest: dict) -> None:
        """Atomic swap: tmp file + ``os.replace`` in the same dir, so a
        crash anywhere before the replace leaves the old state live."""
        os.makedirs(self.state_dir, exist_ok=True)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self._manifest_path())

    def _vacuum(self, manifest: dict) -> None:
        """Drop version dirs no bucket references any more. Safe to
        crash mid-vacuum: orphans are retried on the next batch."""
        live = set(manifest["paths"].values())
        try:
            entries = os.listdir(self.state_dir)
        except FileNotFoundError:
            return
        for d in entries:
            if _VDIR_RE.match(d) and d not in live:
                shutil.rmtree(os.path.join(self.state_dir, d), ignore_errors=True)

    @property
    def last_applied_batch_id(self) -> int:
        return int(self._load_manifest()["last_batch_id"])

    # -- state I/O ---------------------------------------------------
    def _bucket_expr(self, col: str = "user_id"):
        return F.pmod(F.hash(F.col(col).cast("long")), F.lit(self.buckets)).cast("int")

    def _read_state(
        self, spark: SparkSession, manifest: dict, bucket_ids=None
    ) -> DataFrame:
        paths = [
            os.path.join(self.state_dir, vname, f"bucket={b}")
            for b, vname in manifest["paths"].items()
            if bucket_ids is None or int(b) in bucket_ids
        ]
        if not paths:
            return spark.createDataFrame([], _STATE_SCHEMA)
        return spark.read.schema(_STATE_SCHEMA).parquet(*paths)

    def _write_buckets(
        self, df: DataFrame, manifest: dict, batch_id: int, affected_buckets
    ) -> None:
        """New contents for the affected buckets land in a fresh
        ``v{batch_id}`` dir (partitioned by bucket); then the manifest
        pointers for exactly those buckets move — untouched buckets'
        files are never rewritten."""
        vname = f"v{batch_id:08d}"
        vdir = os.path.join(self.state_dir, vname)
        df.withColumn("bucket", self._bucket_expr()).write.partitionBy(
            "bucket"
        ).mode("overwrite").parquet(vdir)
        for b in affected_buckets:
            if os.path.isdir(os.path.join(vdir, f"bucket={b}")):
                manifest["paths"][str(b)] = vname
            else:  # bucket emptied (e.g. only a never-seen user's delete)
                manifest["paths"].pop(str(b), None)

    def snapshot(self, spark: SparkSession, eager: bool = False) -> DataFrame:
        """The current SCD2 table (all versions, all buckets).

        The default return is LAZY: it references the version dirs the
        manifest points at *now*, and a later ``process_batch`` may
        vacuum those dirs — collect it (or pass ``eager=True`` for a
        ``localCheckpoint``) before applying the next batch if the
        snapshot must outlive it."""
        df = self._read_state(spark, self._load_manifest())
        return df.localCheckpoint(eager=True) if eager else df

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        manifest = self._load_manifest()
        if batch_id <= int(manifest["last_batch_id"]):
            # at-least-once replay of an already-committed batch:
            # recorded no-op, never a double apply
            self.history.append(
                {"batch_id": batch_id, "n_changes": 0, "late_rows": 0, "skipped": True}
            )
            return
        chg = changes_from_events(batch_df).localCheckpoint(eager=True)
        n_in = chg.count()
        if n_in == 0:
            # still advance the high-water mark so a replay of this
            # empty batch is recognized
            manifest["last_batch_id"] = batch_id
            self._commit_manifest(manifest)
            self.history.append({"batch_id": batch_id, "n_changes": 0, "late_rows": 0})
            return

        affected_buckets = sorted(
            r[0]
            for r in chg.select(self._bucket_expr().alias("b")).distinct().collect()  # bounded-collect: distinct buckets of one batch (<= n_buckets)
        )
        state = self._read_state(
            spark, manifest, bucket_ids=set(affected_buckets)
        ).localCheckpoint(eager=True)
        affected = chg.select("user_id").distinct()

        open_rows = state.filter(F.col("is_current") == 1).join(
            F.broadcast(affected), "user_id", "semi"
        )
        maxv = (
            state.join(F.broadcast(affected), "user_id", "semi")
            .groupBy("user_id")
            .agg(F.max("version").alias("base_version"))
        )

        # ordering contract: no batch change may precede the entity's
        # LAST KNOWN change time over ALL its rows — for an open entity
        # that is its open row's valid_from_us, for a fully-closed
        # (deleted) one the delete instant (max valid_to_us); checking
        # only open rows would silently accept late rows for deleted
        # entities and diverge from the q154 recompute
        last_known = (
            state.join(F.broadcast(affected), "user_id", "semi")
            .groupBy("user_id")
            .agg(
                F.max(F.coalesce("valid_to_us", "valid_from_us")).alias("last_us")
            )
        )
        late = (
            chg.join(last_known, "user_id")
            .filter(F.col("from_us") < F.col("last_us"))
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

        # new contents of the AFFECTED buckets only: other entities that
        # happen to share a bucket ride along unchanged; closed rows of
        # affected users stay as-is (only their open row was re-derived)
        untouched = state.join(F.broadcast(affected), "user_id", "anti").unionByName(
            state.join(F.broadcast(affected), "user_id", "semi").filter(
                F.col("is_current") == 0
            )
        )
        self._write_buckets(
            untouched.unionByName(rebuilt), manifest, batch_id, affected_buckets
        )
        manifest["last_batch_id"] = batch_id
        self._commit_manifest(manifest)
        self._vacuum(manifest)
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
