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

from ml_with_spark_streaming_spark.functions.features import label_expr
from ml_with_spark_streaming_spark.functions.metrics import binary_metrics, clustering_agreement
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
    history: list[dict] = field(default_factory=list)
    best_f1: float = 0.0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch body — also callable directly on any batch
        DataFrame of (label, tweet) for tests."""
        parsed = None
        if "value" in batch_df.columns:
            # parse ONCE into a persisted table; a single aggregation
            # yields BOTH the empty-batch guard and the quarantine
            # count (the previous isEmpty + quarantine.count pair cost
            # two extra Spark jobs ≈ 1.1 s of the ~3.4 s per-batch
            # fixed overhead at payload 1000)
            parsed = parse_wire(batch_df).persist()
            stats = parsed.agg(
                F.count("*").alias("n"),
                F.sum(F.col("error").isNotNull().cast("long")).alias("nq"),
            ).head()
            if stats["n"] == 0:  # reference crashes then swallows; we guard
                parsed.unpersist()
                return
            # malformed records are COUNTED into the metrics row, not
            # silently discarded (SURVEY.md §5: quarantine, don't drop)
            n_quarantined = int(stats["nq"] or 0)
            clean = parsed.filter(F.col("error").isNull()).select("label", "tweet")
        else:
            if batch_df.isEmpty():
                return
            clean, n_quarantined = batch_df, 0
        feats = prepare_batch(clean, stem=self.stem, num_features=self.num_features)
        feats = feats.persist()
        try:
            if self.supervised:
                train, test = self._split(feats)
                self.model.update(train)
                pred = self.model.predict(test).join(
                    test.select("row_id", "target").distinct(), "row_id"
                )
                m = binary_metrics(pred)
                row = {"batch_id": batch_id, "batchsize": m.n, **m.as_row()}
                f1 = m.f1
            else:
                self.model.update(feats)
                pred = self.model.predict(feats).join(
                    feats.select("row_id", "target").distinct(), "row_id"
                )
                f1 = clustering_agreement(pred)
                row = {"batch_id": batch_id, "batchsize": pred.count(), "agreement": f1}
            self.best_f1 = max(self.best_f1, f1)
            row["maxf1"] = self.best_f1
            row["quarantined"] = n_quarantined
            self.history.append(row)
            self.registry.save(self.key, self.model.get_state(), meta=row)
            self.registry.save_if_best(self.key, self.model.get_state(), f1, meta=row)
            self._append_metrics(row)
        finally:
            feats.unpersist()
            if parsed is not None:
                parsed.unpersist()

    def _split(self, feats: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Deterministic ~80:20 on the content-hash column (replaces
        the reference's order-dependent seeded train_test_split, D3)."""
        return feats.filter(~F.col("_holdout")), feats.filter(F.col("_holdout"))

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
        writer = lines.writeStream.foreachBatch(self.process_batch).outputMode("update")
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        return writer.start()
