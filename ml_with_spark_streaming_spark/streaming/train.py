"""foreachBatch incremental-training loop (Entry point A semantics).

Reference lifecycle per 5 s micro-batch (PAC/passiveAgressiveModel.py:
36-137): DataFrame-ize → clean → tokenize → stopwords → stem →
HashingTF → label-index → collect → train_test_split(0.2, seed 42) →
partial_fit → predict → metrics → CSV append + best-F1 checkpoint.

Engine version: identical per-batch semantics, but every data-sized
step is a DataFrame op (see ml/incremental.py) and nothing except
O(num_features) state reaches the driver. Differences (deliberate,
SURVEY.md §7): deterministic label map, randomSplit instead of
sklearn's collected-array split, quarantine instead of blanket except,
empty-batch guard instead of schema-inference crash.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ml_with_spark_streaming_spark.streaming.foreach import attach_foreach_batch

from ml_with_spark_streaming_spark.functions.features import label_expr
from ml_with_spark_streaming_spark.functions.metrics import binary_metrics_from_cells
from ml_with_spark_streaming_spark.functions.text import (
    clean_text_expr,
    remove_stopwords_expr,
    stem_tokens_udf,
    tokens_expr,
)
from ml_with_spark_streaming_spark.ml.incremental import hashed_features
from ml_with_spark_streaming_spark.ml.registry import ModelRegistry
from ml_with_spark_streaming_spark.streaming.wire import parse_wire

_METRICS_KEYS = [
    "batch_id", "f1", "maxf1", "acc", "precision", "recall",
    "batchsize", "rmse", "agreement", "quarantined",
]


def prepare_batch(
    df: DataFrame, stem: bool = True, num_features: int = 2500
) -> DataFrame:
    """clean → tokenize → stopwords → (stem) → hashed TF triple table
    with columns (row_id, target, _holdout, fi, cnt).

    row_id is unique per row (monotonically_increasing_id); _holdout is
    a CONTENT hash of the text — the 80:20 split must not depend on
    partition layout the way seeded randomSplit does, or held-out
    metrics become irreproducible across runs (reference D3's seeded
    split on a collected array had the same order-dependence bug)."""
    base = (
        df.filter(F.col("tweet").isNotNull())
        .withColumn("target", label_expr("label"))
        .filter(F.col("target").isNotNull())
        .withColumn("row_id", F.monotonically_increasing_id())
        .withColumn("_holdout", F.pmod(F.hash("tweet"), F.lit(5)) == 0)
        .withColumn("toks", remove_stopwords_expr(tokens_expr(clean_text_expr("tweet"))))
    )
    if stem:
        base = base.withColumn("toks", stem_tokens_udf(F.col("toks")))
    return hashed_features(base, "toks", "row_id", num_features, extra_cols=("target", "_holdout"))


def prepare_parsed(
    parsed: DataFrame, stem: bool = True, num_features: int = 2500
) -> DataFrame:
    """The full featurization over a parse_wire output, quarantine
    included, as ONE linear lineage (single scan, no union): quarantined
    rows ride through hashed_features as zero-token docs flagged
    ``_q=true`` (their explode_outer emits the fi=-1 sentinel row), so
    the feature table carries everything ``process_batch`` needs —
    train/test features, labels, AND the quarantine counts — and the
    whole batch pipeline runs in exactly two Spark jobs: the
    model-update aggregation and one combined
    scoring+confusion+quarantine-count aggregation. (The round-3 shape
    spent a third job on parse stats, and a unioned quarantine branch
    re-scanned the batch input.)"""
    base = (
        parsed.withColumn("_q", F.col("error").isNotNull())
        .withColumn("target", F.when(~F.col("_q"), label_expr("label")))
        .filter(F.col("_q") | (F.col("tweet").isNotNull() & F.col("target").isNotNull()))
        .withColumn("row_id", F.monotonically_increasing_id())
        .withColumn("_holdout", (~F.col("_q")) & (F.pmod(F.hash("tweet"), F.lit(5)) == 0))
        .withColumn(
            "toks",
            F.when(F.col("_q"), F.array().cast("array<string>")).otherwise(
                remove_stopwords_expr(tokens_expr(clean_text_expr("tweet")))
            ),
        )
    )
    if stem:
        base = base.withColumn("toks", stem_tokens_udf(F.col("toks")))
    return hashed_features(
        base,
        "toks",
        "row_id",
        num_features,
        extra_cols=("target", "_holdout", "_q"),
        doc_markers=True,
    )


@dataclass
class StreamingTrainer:
    """Drives one incremental learner from a line stream.

    ``model`` is any of the ml/incremental learners (duck-typed:
    update/predict/get_state/set_state). Supervised models split each
    batch ~80:20 on a content hash (reference D3's seeded split,
    made layout-independent) and report held-out metrics; KMeans
    trains on the full batch and reports the permutation-invariant
    agreement (SURVEY.md §3 B fix).
    """

    model: object
    registry: ModelRegistry
    key: str
    stem: bool = True
    supervised: bool = True
    num_features: int = 2500
    # Shuffle width for the per-micro-batch jobs. A 5 s trigger's batch
    # is bounded by arrival rate, so its aggregations are tiny relative
    # to the session-level shuffle width (sized for the big batch
    # queries): at the session default of 32 the per-batch fixed cost
    # was dominated by empty-task scheduling and AQE replanning —
    # measured p50 per batch at payload 1000: 32-way+AQE 1.21 s,
    # 4-way no-AQE 0.70 s. When set, process_batch pins
    # spark.sql.shuffle.partitions to this value and disables AQE for
    # the duration of the batch (restored in finally; note the confs
    # are session-scoped, so concurrent foreground queries sharing the
    # session would briefly see them). None = leave session settings
    # (use on a shared cluster or with very large triggers).
    batch_shuffle_partitions: int | None = 4
    history: list[dict] = field(default_factory=list)
    best_f1: float = 0.0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch body — also callable directly on any batch
        DataFrame of (label, tweet) for tests.

        Exactly TWO Spark jobs per non-empty batch (the round-3 shape
        was three — a parse-stats job, the update aggregation, and the
        predict+metrics job cost ~2.5 s fixed at payload 1000):

        1. the model-update aggregation, which also materializes the
           cached feature table (parse → clean → stem → explode run
           once here);
        2. ONE scoring pass over the full cached table whose confusion
           groups — keyed by (target, prediction, _holdout, _q) — yield
           the held-out metrics, the batch-size, the quarantine count,
           AND the empty-batch guard (zero groups ⇒ empty batch, no
           metrics row, matching the old early-return semantics).

        Scoring train rows too costs one cached-scan of the 80% side
        but saves a whole job's scheduling + a join + two shuffles; a
        batch whose every row is malformed still writes its metrics row
        (batchsize 0, quarantined n) exactly as before. The one
        behavior delta vs round 3: a batch containing ONLY
        null-label/null-text rows (dropped by P2, not quarantined) now
        writes no metrics row instead of an all-zero row — such rows
        were never counted in any metric anyway."""
        spark = batch_df.sparkSession
        saved_confs: dict[str, str] = {}
        if self.batch_shuffle_partitions:
            for k, v in {
                "spark.sql.shuffle.partitions": str(self.batch_shuffle_partitions),
                "spark.sql.adaptive.enabled": "false",
            }.items():
                saved_confs[k] = spark.conf.get(k)
                spark.conf.set(k, v)
        if "value" in batch_df.columns:
            parsed = parse_wire(batch_df)
        else:
            parsed = batch_df.select(
                "label", "tweet", F.lit(None).cast("string").alias("error")
            )
        feats = prepare_parsed(parsed, stem=self.stem, num_features=self.num_features)
        feats = feats.persist()
        try:
            ok = F.col("_q") == F.lit(False)
            if self.supervised:
                self.model.update(feats.filter(ok & ~F.col("_holdout")), doc_markers=True)
            else:
                self.model.update(feats.filter(ok), doc_markers=True)
            pred = self.model.predict(
                feats, extra_cols=("target", "_holdout", "_q"), assume_unique=True
            )
            groups = (
                pred.groupBy("target", "prediction", "_holdout", "_q")
                .agg(F.count("*").alias("n"))
                .collect()  # bounded-collect: confusion-matrix cells (classes^2 x 2 x quality)
            )
            if not groups:  # reference crashes then swallows; we guard
                return
            # malformed records are COUNTED into the metrics row, not
            # silently discarded (SURVEY.md §5: quarantine, don't drop)
            n_quarantined = sum(r["n"] for r in groups if r["_q"])
            if self.supervised:
                cells: dict[tuple[float, float], int] = {}
                for r in groups:
                    if not r["_q"] and r["_holdout"]:
                        key = (float(r["target"]), float(r["prediction"]))
                        cells[key] = cells.get(key, 0) + r["n"]
                m = binary_metrics_from_cells(cells)
                row = {"batch_id": batch_id, "batchsize": m.n, **m.as_row()}
                f1 = m.f1
            else:
                n_ok = sum(r["n"] for r in groups if not r["_q"])
                same = sum(
                    r["n"]
                    for r in groups
                    if not r["_q"] and r["target"] == r["prediction"]
                )
                f1 = max(same / n_ok, 1.0 - same / n_ok) if n_ok else 0.0
                row = {"batch_id": batch_id, "batchsize": n_ok, "agreement": f1}
            self.best_f1 = max(self.best_f1, f1)
            row["maxf1"] = self.best_f1
            row["quarantined"] = n_quarantined
            self.history.append(row)
            self.registry.save(self.key, self.model.get_state(), meta=row)
            self.registry.save_if_best(self.key, self.model.get_state(), f1, meta=row)
            self._append_metrics(row)
        finally:
            feats.unpersist()
            for k, v in saved_confs.items():
                spark.conf.set(k, v)

    def _append_metrics(self, row: dict) -> None:
        """S6 mapping: append-only per-batch metrics record (CSV, same
        column intent as the reference's *_stats_<bs>.csv)."""
        path = os.path.join(self.registry.root, f"{self.key}_stats.csv")
        new = not os.path.exists(path)
        with open(path, "a") as f:
            if new:
                f.write(",".join(_METRICS_KEYS) + "\n")
            f.write(",".join(str(row.get(k, "")) for k in _METRICS_KEYS) + "\n")

    def attach(
        self,
        lines: DataFrame,
        trigger_seconds: int = 5,
        checkpoint: str | None = None,
        available_now: bool = False,
    ) -> StreamingQuery:
        """Start the stream: 5 s processing-time trigger (reference
        StreamingContext(sc, 5)), or ``available_now=True`` for a
        one-shot catch-up replay that processes everything currently
        available in rate-limited batches and then terminates — the
        backfill/cron-retrain mode the DStream design had no answer
        for."""
        return attach_foreach_batch(
            lines, self.process_batch, checkpoint, trigger_seconds, available_now
        )
