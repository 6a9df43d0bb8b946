"""Frozen-model streaming inference (Entry point C, `TESTING .py`).

Reference: loads ``PAC_3000.pkl`` once per batch (TESTING .py:76),
predicts, prints metrics, persists nothing. Engine: load the
checkpoint ONCE at attach time (the reference's per-batch reload is a
bug-shaped inefficiency), transform each micro-batch declaratively,
emit per-batch metrics to the console and an in-memory history.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ml_with_spark_streaming_spark.streaming.foreach import attach_foreach_batch

from ml_with_spark_streaming_spark.functions.metrics import binary_metrics
from ml_with_spark_streaming_spark.ml.registry import ModelRegistry
from ml_with_spark_streaming_spark.streaming.train import prepare_batch
from ml_with_spark_streaming_spark.streaming.wire import parse_wire, split_quarantine


@dataclass
class StreamingScorer:
    model: object
    stem: bool = False  # TESTING .py hashes unstemmed tokens (TESTING .py:60)
    num_features: int = 2500
    history: list[dict] = field(default_factory=list)

    @classmethod
    def from_registry(cls, model: object, registry: ModelRegistry, key: str, best: bool = True, **kw) -> "StreamingScorer":
        state = registry.load(key, best=best) or registry.load(key, best=False)
        if state is None:
            raise FileNotFoundError(f"no checkpoint for key {key!r} in {registry.root}")
        model.set_state(state)
        return cls(model=model, **kw)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        clean, quarantine = (
            split_quarantine(parse_wire(batch_df)) if "value" in batch_df.columns else (batch_df, None)
        )
        # persist: row_id comes from monotonically_increasing_id, so the
        # two sides of the prediction↔target join MUST evaluate the same
        # materialization or ids could diverge (train.py does the same)
        feats = prepare_batch(clean, stem=self.stem, num_features=self.num_features).persist()
        try:
            pred = self.model.predict(feats).join(
                feats.select("row_id", "target").distinct(), "row_id"
            )
            m = binary_metrics(pred)
            row = {"batch_id": batch_id, "batchsize": m.n, **m.as_row()}
            if quarantine is not None:
                row["quarantined"] = quarantine.count()
            self.history.append(row)
        finally:
            feats.unpersist()

    def attach(
        self, lines: DataFrame, trigger_seconds: int = 5, console: bool = False
    ) -> StreamingQuery:
        """``console=True`` additionally prints each scored batch's
        metrics (S9 mapping — the reference's df.show / print(cm))."""
        def _body(batch_df: DataFrame, batch_id: int) -> None:
            self.process_batch(batch_df, batch_id)
            if console and self.history:
                print(f"[score batch {batch_id}] {self.history[-1]}")

        return attach_foreach_batch(lines, _body, trigger_seconds=trigger_seconds)
